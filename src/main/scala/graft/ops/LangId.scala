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

  /** Collect trained profiles into the literal map [[classifyMapSide]]
    * embeds — bounded by construction (≤ |langs|·K rows).
    */
  def collectProfiles(profiles: DataFrame): Map[String, Map[String, Int]] =
    profiles.select(col("lang"), col("gram"), col("rank").cast("int"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) =>
        l -> rows.map(r => r.getString(1) -> r.getInt(2)).toMap }

  /** Shuffle-FREE classification — the serving/streaming path (the
    * [[Classifier.scoreMapSide]] treatment): the collected profiles
    * ride the plan and each row is one bounded kernel (gram count →
    * top-K rank → per-language out-of-place distance), no explode, no
    * aggregation, no exchange — safe in Structured Streaming append
    * mode. Agrees with [[classify]] EXACTLY (integer method): grams
    * iterate by CODE POINT and rank ties compare in code-point order,
    * matching Spark's `substr`/string-ordering semantics, spec-pinned
    * on accented multilingual text. Documents with no grams (empty or
    * all-whitespace text) produce no row — the same contract as
    * [[classify]], whose explode drops them.
    */
  def classifyMapSide(docs: DataFrame, idCol: String, textCol: String,
                      profileMap: Map[String, Map[String, Int]],
                      k: Int = DefaultK): DataFrame = {
    val langs = profileMap.keys.toSeq.sorted(CpOrdering)
    val kernel = udf((text: String) => {
      val ranked = profileOf(text, k) // the SAME kernel classify explodes
      if (ranked.isEmpty) null // no grams → no row, agreeing with classify
      else {
        var bestLang: String = null
        var bestDist = Long.MaxValue
        langs.foreach { l =>
          val prof = profileMap(l)
          var d = 0L
          var r = 0
          while (r < ranked.length) {
            val (g, drank) = ranked(r)
            d += (prof.get(g) match {
              case Some(pr) => math.abs(drank - pr).toLong
              case None => k.toLong
            })
            r += 1
          }
          if (d < bestDist) { bestDist = d; bestLang = l } // langs sorted: ties keep first
        }
        (bestLang, bestDist)
      }
    })
    docs.select(col(idCol), kernel(col(textCol)).as("__r"))
      .filter(col("__r").isNotNull)
      .select(col(idCol), col("__r._1").as("lang_pred"),
        col("__r._2").as("dist"))
  }

  /** [[classifyMapSide]] with the runner-up and margin — the shuffle-free
    * twin of [[classifyTop2]], agreeing with it EXACTLY (all-integer
    * distances; the sort key is (dist, lang) with lang compared in
    * code-point order, matching `array_sort` over `struct(dist, lang)`
    * under Spark's binary string ordering — spec-pinned). Output
    * `(idCol, lang_pred, dist, runner_up, margin)`; with a single
    * trained language runner_up/margin are null, as in the relational
    * slice. Documents with no grams produce no row.
    */
  def classifyMapSideTop2(docs: DataFrame, idCol: String, textCol: String,
                          profileMap: Map[String, Map[String, Int]],
                          k: Int = DefaultK): DataFrame = {
    val langs = profileMap.keys.toSeq.sorted(CpOrdering)
    val kernel = udf((text: String) => {
      val ranked = profileOf(text, k)
      if (ranked.isEmpty) None
      else {
        // (dist, lang) for every language, then the two smallest under
        // the (dist, code-point lang) order classifyTop2's array_sort uses
        var b1l: String = null; var b1d = Long.MaxValue
        var b2l: String = null; var b2d = Long.MaxValue
        langs.foreach { l =>
          val prof = profileMap(l)
          var d = 0L
          var r = 0
          while (r < ranked.length) {
            val (g, drank) = ranked(r)
            d += (prof.get(g) match {
              case Some(pr) => math.abs(drank - pr).toLong
              case None => k.toLong
            })
            r += 1
          }
          // strict <: langs iterate in sorted order, so ties keep the
          // code-point-smaller language — array_sort's struct order
          if (d < b1d) { b2l = b1l; b2d = b1d; b1l = l; b1d = d }
          else if (d < b2d) { b2l = l; b2d = d }
        }
        Some((b1l, b1d, Option(b2l), if (b2l == null) None else Some(b2d - b1d)))
      }
    })
    docs.select(col(idCol), kernel(col(textCol)).as("__r"))
      .filter(col("__r").isNotNull)
      .select(col(idCol), col("__r._1").as("lang_pred"),
        col("__r._2").as("dist"), col("__r._3").as("runner_up"),
        col("__r._4").as("margin"))
  }

  /** [[cpCompare]] as an Ordering — the map-side kernels iterate langs
    * in THIS order so their tie-breaks match `array_sort`'s binary
    * UTF8String order unconditionally (Scala's default String ordering
    * is UTF-16, which diverges for supplementary characters).
    */
  private object CpOrdering extends Ordering[String] {
    def compare(a: String, b: String): Int = cpCompare(a, b)
  }

  /** Code-point-order string comparison — Spark's binary UTF8String
    * ordering, which Java's UTF-16 `compareTo` diverges from for
    * supplementary characters.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** The document's top-`k` profile: `(gram, drank)` pairs ranked by
    * (count desc, gram asc in code-point order) — one bounded
    * imperative kernel per document, matching the SQL-replayable
    * semantics exactly (code-point gram iteration ≡ Spark `substr`;
    * code-point tie order ≡ Spark string ordering). A kernel, not
    * column HOFs: the composed array-expression form re-evaluates its
    * `array_sort` subtree per lambda ELEMENT (Column composition
    * clones subtrees — measured as a hang, not a slowdown, at sf0.01),
    * the same interpreted-HOF cliff the sequential-fold kernel
    * replaced (SCALE.md round 11).
    */
  private[ops] def profileOf(text: String, k: Int): Array[(String, Int)] = {
    // Space-only edge strip: Spark `trim` and the DuckDB replay oracle
    // strip ASCII ' ' only, whereas Java String.trim strips every char
    // <= U+0020 (\t/\n/\r) — a leading tab must yield the SAME edge
    // grams here as in the column path (grams()) and the SQL replay.
    val raw = Option(text).getOrElse("")
    var s = 0
    var e = raw.length
    while (s < e && raw.charAt(s) == ' ') s += 1
    while (e > s && raw.charAt(e - 1) == ' ') e -= 1
    val norm = raw.substring(s, e)
      .replaceAll("\\s+", " ").toLowerCase
    val cps = norm.codePoints().toArray
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    var n = 1
    while (n <= 3) {
      var i = 0
      while (i + n <= cps.length) {
        val g = new String(cps, i, n)
        counts(g) = counts.getOrElse(g, 0) + 1
        i += 1
      }
      n += 1
    }
    counts.toArray
      .sortWith { case ((g1, c1), (g2, c2)) =>
        if (c1 != c2) c1 > c2 else cpCompare(g1, g2) < 0 }
      .take(k)
      .zipWithIndex.map { case ((g, _), i) => (g, i + 1) }
  }

  /** Classify documents against trained `profiles`: per document the
    * predicted language and its out-of-place distance
    * `Σ_gram |rank_doc − rank_lang|` (missing gram → `k` penalty),
    * argmin with language-code tie-break. Output
    * `(idCol, lang_pred, dist)`. Documents with no grams (empty text)
    * produce no row.
    *
    * Plan shape (the 100 TB stance): the doc profile builds INSIDE the
    * row ([[profileOf]] — narrow map, no per-doc shuffle, no rank
    * window); the gram match is an inner join against the BROADCAST
    * profiles (a gram joins only the languages that rank it —
    * |Δrank| < k per hit, so any hit language strictly beats every
    * zero-hit language and a per-gram ×|langs| blowup never exists); a
    * doc-sized seed row per (doc, language) carries the `k·G_doc`
    * no-hit floor. Two map-side-combinable aggregations total —
    * `(doc, lang)` then the `min(struct(dist, lang))` argmin — and
    * zero windows.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
               profiles: DataFrame, k: Int = DefaultK): DataFrame =
    languageDistances(docs, idCol, textCol, profiles, k)
      .groupBy(col("__id"))
      .agg(min(struct(col("dist"), col("lang"))).as("__b"))
      .select(col("__id").as(idCol), col("__b.lang").as("lang_pred"),
        col("__b.dist").cast("long").as("dist"))

  /** [[classify]] plus a CONFIDENCE signal: the runner-up language and
    * the distance margin to it — the routing number a corpus pipeline
    * thresholds to mark documents "und" (close margins mean mixed or
    * out-of-model text). Same distance relation, one
    * `collect_list`-of-|langs| per doc (bounded) sorted in-row.
    */
  def classifyTop2(docs: DataFrame, idCol: String, textCol: String,
                   profiles: DataFrame, k: Int = DefaultK): DataFrame =
    languageDistances(docs, idCol, textCol, profiles, k)
      .groupBy(col("__id"))
      .agg(slice(array_sort(collect_list(struct(col("dist"), col("lang")))),
        1, 2).as("__t"))
      .select(col("__id").as(idCol),
        col("__t")(0)("lang").as("lang_pred"),
        col("__t")(0)("dist").cast("long").as("dist"),
        col("__t")(1)("lang").as("runner_up"),
        (col("__t")(1)("dist") - col("__t")(0)("dist")).cast("long")
          .as("margin"))

  /** The shared `(doc, lang, dist)` relation behind [[classify]] and
    * [[classifyTop2]] — see [[classify]]'s plan-shape contract.
    */
  private def languageDistances(docs: DataFrame, idCol: String,
                                textCol: String, profiles: DataFrame,
                                k: Int): DataFrame = {
    val prof = udf((text: String) => profileOf(text, k))
    val base = docs
      .select(col(idCol).as("__id"), prof(col(textCol)).as("__p"))
      .withColumn("__ng", size(col("__p")).cast("long"))
      .filter(col("__ng") > 0)
    val exploded = base
      .select(col("__id"), col("__ng"), explode(col("__p")).as("__g"))
      .select(col("__id"), col("__ng"),
        col("__g._2").as("drank"), col("__g._1").as("gram"))
    val contribs = exploded
      .join(broadcast(profiles), Seq("gram")) // inner: matched langs only
      .select(col("__id"), col("lang"), col("__ng"),
        abs(col("drank") - col("rank")).cast("long").as("__delta"),
        lit(1L).as("__hit"))
    val langs = profiles.select(col("lang")).distinct()
    val seed = base.select(col("__id"), col("__ng"))
      .crossJoin(broadcast(langs)) // one row per (doc, lang) — doc-sized
      .select(col("__id"), col("lang"), col("__ng"),
        lit(0L).as("__delta"), lit(0L).as("__hit"))
    contribs.unionByName(seed)
      .groupBy(col("__id"), col("lang"))
      .agg(max(col("__ng")).as("__ng"), sum(col("__hit")).as("__nhit"),
        sum(col("__delta")).as("__shit"))
      .select(col("__id"), col("lang"),
        (col("__shit") + (col("__ng") - col("__nhit")) * k).as("dist"))
  }
}
