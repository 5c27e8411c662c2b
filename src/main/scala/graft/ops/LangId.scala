package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trained multilingual language identification — Cavnar & Trenkle
  * 1994 ("N-Gram-Based Text Categorization"), THE published method the
  * fastText-lid family descends from: per-language character-n-gram
  * frequency PROFILES (top-K grams ranked by count), classification by
  * the rank OUT-OF-PLACE distance between the document's profile and
  * each language's.
  *
  * Chosen over the hashed-logreg machinery ([[Classifier]]) for one
  * engine-portability reason: every quantity here is an INTEGER (gram
  * counts, ranks, |Δrank| sums), so training AND inference replay
  * bit-for-bit in any SQL engine — no float log-prob whose last ulp
  * could diverge between JVM `Math.log` and a C library. Ranking ties
  * break on the gram string ascending; prediction ties on the language
  * code ascending.
  *
  * Scale shape: a profile is ≤ |langs|·K rows and BROADCASTS; the
  * corpus-side cost is one explode→count per document (linear in
  * characters, map-side combinable), a per-document top-K ranking
  * (shuffle keyed by doc id), and a bounded ×|langs| multiplier on the
  * K-capped profile rows — never on the raw grams. Training is the
  * same shape over the (tiny, committed) labeled corpus.
  */
object LangId {

  /** Profile depth (the paper uses 300). */
  val DefaultK = 300

  /** Normalized char 1/2/3-grams: lowercase, whitespace collapsed —
    * the mixed-order gram set of the paper (padded-word 1-5 grams
    * simplified to raw-text 1-3 grams; the space char inside 2/3-grams
    * carries the word-boundary signal).
    */
  def grams(text: Column): Column = {
    val t = lower(regexp_replace(trim(text), "\\s+", " "))
    concat(TextAnalysis.charGrams(t, 1), TextAnalysis.charGrams(t, 2),
      TextAnalysis.charGrams(t, 3))
  }

  /** The committed labeled training corpus: JSONL of
    * `{"lang": …, "text": …}` rows.
    */
  def readTraining(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path).select(col("lang"), col("text"))

  /** Train per-language profiles: `(lang, gram, rank)` with rank the
    * 1-based frequency position (count desc, gram asc), capped at `k`.
    */
  def trainProfiles(labeled: DataFrame, langCol: String, textCol: String,
                    k: Int = DefaultK): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("cnt").desc, col("gram"))
    labeled
      .select(col(langCol).as("lang"), explode(grams(col(textCol))).as("gram"))
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("lang"), col("gram"), col("rank"))
  }

  /** Classify documents against trained `profiles`: per document the
    * predicted language and its out-of-place distance
    * `Σ_gram |rank_doc − rank_lang|` (missing gram → `k` penalty),
    * argmin with language-code tie-break. Output
    * `(idCol, lang_pred, dist)`.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               profiles: DataFrame, k: Int = DefaultK): DataFrame = {
    val dw = Window.partitionBy(col("__id"))
      .orderBy(col("cnt").desc, col("gram"))
    val docProfile = docs
      .select(col(idCol).as("__id"), explode(grams(col(textCol))).as("gram"))
      .groupBy(col("__id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("drank", row_number().over(dw))
      .filter(col("drank") <= k)
      .select(col("__id"), col("gram"), col("drank"))
    val langs = profiles.select(col("lang")).distinct()
    val dist = docProfile
      .crossJoin(broadcast(langs)) // bounded ×|langs| multiplier
      .join(broadcast(profiles), Seq("lang", "gram"), "left")
      .groupBy(col("__id"), col("lang"))
      .agg(sum(when(col("rank").isNotNull, abs(col("drank") - col("rank")))
        .otherwise(lit(k))).as("dist"))
    val best = Window.partitionBy(col("__id"))
      .orderBy(col("dist"), col("lang"))
    dist
      .withColumn("__rk", row_number().over(best))
      .filter(col("__rk") === 1)
      .select(col("__id").as(idCol), col("lang").as("lang_pred"),
        col("dist").cast("long").as("dist"))
  }
}
