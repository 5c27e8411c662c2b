package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The evaluation pipeline (SURVEY.md §3.3): run every test-set question
  * through an answer function, judge each answer, and aggregate
  * correctness — as DataFrames instead of the reference's pickled report
  * blob (`src/server/utils/testbed.py:300-352`).
  */
object Testbed {

  /** QA record shape (FIXTURES.md §5; reference JSONL fields at
    * `src/client/content/testbed.py:165-212`).
    */
  case class QaRecord(question: String, reference_answer: String,
                      reference_context: String, topic: String)

  /** Read a JSONL/JSON test set (S10 normalization: the reference accepts
    * object, array, or line-delimited — spark.read.json covers
    * line-delimited natively; multiLine handles arrays).
    */
  def readTestset(spark: SparkSession, path: String, multiLine: Boolean = false): DataFrame = {
    val raw = spark.read.option("multiLine", multiLine).json(path)
    // metadata (and metadata.topic) may be absent entirely — an
    // unconditional col("metadata.topic") would fail analysis.
    val topic = raw.schema.find(_.name == "metadata").map(_.dataType) match {
      case Some(st: org.apache.spark.sql.types.StructType) if st.fieldNames.contains("topic") =>
        coalesce(col("metadata.topic"), lit("Others"))
      case _ => lit("Others")
    }
    raw.select(col("question"), col("reference_answer"), col("reference_context"),
      topic.as("topic"))
  }

  /** Question generator for [[generateTestset]] — the pluggable seam where
    * the reference drives giskard's LLM-backed simple/complex question
    * generators (`src/server/utils/testbed.py:283-291`). The interface is
    * column-level so a deterministic generator stays a pure Catalyst plan
    * (codegen'd, no UDF); an LLM-backed implementation would return a
    * UDF-backed column calling its client instead.
    */
  trait QaGenerator extends Serializable {
    /** `kind` is "simple" or "complex" (giskard's two generator classes). */
    def question(chunk: Column, kind: Column): Column
    def referenceAnswer(chunk: Column, kind: Column): Column
  }

  /** Deterministic default generator: a "simple" question asks about the
    * chunk's first 5 tokens, a "complex" one asks to explain its first 8;
    * the reference answer is the chunk itself (in giskard's QATestset the
    * KB chunk is likewise the ground truth the judge scores against).
    */
  object LeadQaGenerator extends QaGenerator {
    private def lead(chunk: Column, k: Int): Column =
      concat_ws(" ", slice(split(trim(chunk), "\\s+"), 1, k))
    def question(chunk: Column, kind: Column): Column =
      when(kind === "complex", concat(lit("Explain the context of: "), lead(chunk, 8)))
        .otherwise(concat(lit("What is mentioned about "), lead(chunk, 5), lit("?")))
    def referenceAnswer(chunk: Column, kind: Column): Column = chunk
  }

  /** §3.3 producer half: generate an n-question QA test set from a
    * knowledge base of text chunks (the reference's `build_knowledge_base`
    * → `generate_testset` flow, `testbed.py:247-297`; the KB side is the
    * sentence-split corpus — [[Split.sentences]] mirrors its
    * SentenceSplitter(chunk_size=2048)).
    *
    * Chunk selection is deterministic and scale-safe: chunks rank by
    * content hash (md5 — stable across engines, runs, and partitionings)
    * and the global top-n plans as TakeOrderedAndProject, so only n rows
    * per partition reach the merge — never a full sort of the KB. Kinds
    * alternate simple/complex by rank parity, matching the reference's
    * round-robin over its generator list. Output is the
    * [[QaRecord]] shape that [[readTestset]]/[[upsertTestset]] consume.
    */
  def generateTestset(kb: DataFrame, textCol: String, n: Int,
                      topicCol: Option[String] = None,
                      generator: QaGenerator = LeadQaGenerator): DataFrame = {
    val topic = topicCol.map(col).getOrElse(lit("Others"))
    val sampled = kb
      .filter(length(trim(col(textCol))) > 0)
      .select(md5(col(textCol).cast("binary")).as("__key"),
        col(textCol).as("__chunk"), topic.as("topic"))
      .orderBy(col("__key"), col("topic")).limit(n)
    // the window input is the already-sampled n rows — a bounded sort;
    // topic tiebreak keeps identical texts under different topics
    // deterministic
    val kind = when(
      pmod(row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1)).orderBy(col("__key"), col("topic"))), lit(2)) === 1,
      lit("simple")).otherwise(lit("complex"))
    sampled
      .withColumn("__kind", kind)
      .select(
        generator.question(col("__chunk"), col("__kind")).as("question"),
        generator.referenceAnswer(col("__chunk"), col("__kind")).as("reference_answer"),
        col("__chunk").as("reference_context"),
        col("topic"))
  }

  /** JSONL testset sink in the reference's upload shape
    * (`src/client/content/testbed.py:165-212`) — the exact fields
    * [[readTestset]] re-hydrates, topic nested under `metadata`.
    */
  def writeTestset(qa: DataFrame, path: String): Unit =
    qa.select(col("question"), col("reference_answer"), col("reference_context"),
        struct(col("topic").as("topic")).as("metadata"))
      .write.mode("overwrite").json(path)

  /** Evaluate: answer every question (a distributed map — each executor
    * runs the answer function on its partition), judge, and return the
    * per-question report `(question, topic, answer, correct)`.
    *
    * `answerFn` runs inside executors, so it MUST be a pure local
    * function — it cannot touch a SparkSession or call [[Chat.answer]]
    * (nested Spark jobs are forbidden). For retrieval-grounded answers
    * use [[Chat.answerBatch]] ([[evaluateRag]] wires it up): one
    * distributed similarity join answers the whole set.
    */
  def evaluate(qa: DataFrame, answerFn: String => String,
               judge: (String, String) => Boolean): DataFrame = {
    val ansUdf = udf(answerFn)
    val judgeUdf = udf(judge)
    qa.withColumn("answer", ansUdf(col("question")))
      .withColumn("correct", judgeUdf(col("answer"), col("reference_answer")))
      .select(col("question"), col("topic"), col("answer"), col("correct"))
  }

  /** Batch RAG evaluation — the distributed counterpart of [[evaluate]]:
    * the whole test set is answered by ONE [[Chat.answerBatch]] similarity
    * join (corpus scanned once), then judged. Returns the same
    * per-question report shape as [[evaluate]].
    */
  def evaluateRag(qa: DataFrame, store: DataFrame, idCol: String, textCol: String,
                  embCol: String, embedder: graft.embed.Embedder,
                  model: Chat.ChatModel = Chat.TemplateModel,
                  grader: Chat.Grader = Chat.OverlapGrader,
                  topK: Int = 4,
                  judge: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
                    org.apache.spark.sql.Column = keywordJudgeCol,
                  index: Option[(Ivf.IvfModel, Int)] = None,
                  searchType: Chat.SearchType = Chat.SearchType.Similarity): DataFrame = {
    val withId = qa.withColumn("__qid", xxhash64(col("question")))
    // the evaluation answers through the same dispatch the serving path
    // uses (the reference evaluates under the client's RAG settings,
    // search_type included)
    val answered = Chat.answerBatch(
      withId.select(col("__qid"), col("question")).dropDuplicates("__qid"),
      "__qid", "question", store, idCol, textCol, embCol,
      embedder, model, grader, topK = topK, index = index,
      searchType = searchType)
    withId.join(answered.select(col("__qid"), col("answer")), Seq("__qid"))
      .withColumn("correct", judge(col("answer"), col("reference_answer")))
      .select(col("question"), col("topic"), col("answer"), col("correct"))
  }

  /** A2: overall correctness mean. */
  def overall(report: DataFrame): DataFrame =
    report.agg(
      count(lit(1)).as("n"),
      avg(col("correct").cast("int")).as("correctness"))

  /** A3: correctness by topic. */
  def byTopic(report: DataFrame): DataFrame =
    report.groupBy(col("topic"))
      .agg(count(lit(1)).as("n"), avg(col("correct").cast("int")).as("correctness"))
      .orderBy(col("topic"))

  /** A4: failed questions. */
  def failures(report: DataFrame): DataFrame =
    report.filter(!col("correct"))

  /** Ranking-quality panel for a retrieval run — recall@k, precision@k,
    * reciprocal rank, nDCG@k, and AP@k per query, the standard IR
    * metrics a RAG deployment tracks across retriever changes (the
    * reference's testbed judges final ANSWERS; this judges the
    * RETRIEVAL stage itself against labeled relevant documents, which
    * is what makes an embedding/index/fusion change measurable before
    * any LLM is involved).
    *
    * `run` carries one row per (query, retrieved doc) with a 1-based
    * rank — exactly the shape [[Similarity.similarityJoin]] /
    * [[Ivf.searchBatch]] emit; rows past rank `k` are ignored. `qrels`
    * carries binary relevance as (query, doc) pairs; duplicates
    * collapse. EVERY query appearing in either input emits a row: one
    * in the run but absent from `qrels` scores 0 everywhere (n_rel =
    * 0); one in `qrels` whose retriever returned nothing — or nothing
    * within `k` — emits an all-zero row rather than vanishing (a
    * retriever change that starts failing queries outright must DRAG
    * the macro averages down, not inflate them by shrinking the
    * denominator; trec_eval averages over qrels queries for the same
    * reason).
    *
    * Definitions (binary relevance): DCG@k = Σ_{hits} 1/log2(rank+1),
    * IDCG@k = Σ_{i=1..min(n_rel,k)} 1/log2(i+1), AP@k =
    * (Σ_{i-th hit at rank r} i/r) / min(n_rel, k), RR = 1/first hit
    * rank.
    *
    * Scale: both inputs reduce to id/rank triples before any exchange —
    * no text or embedding payloads move. The plan is one semi-join of
    * the k-bounded run against the qrels (SHUFFLE_HASH: the run side is
    * ≤ k rows per query, never worth sorting), one bounded rank window
    * (≤ k rows per query partition), and two per-query hash aggs. IDCG
    * is a closed-form fold over `sequence(1, min(n_rel, k))` — no join
    * against a numbers table. Doubles are left unrounded; callers round
    * for cross-engine comparison.
    */
  def rankingMetrics(run: DataFrame, qrels: DataFrame,
                     queryIdCol: String, docIdCol: String, rankCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val kL = lit(k.toLong)
    val kept = run
      .select(col(queryIdCol).as("__q"), col(docIdCol).as("__d"),
        col(rankCol).cast("long").as("__r"))
      .filter(col("__r") >= 1 && col("__r") <= kL)
    val rel = qrels.select(col(queryIdCol).as("__q"), col(docIdCol).as("__d"))
      .dropDuplicates("__q", "__d")
    val nRel = rel.groupBy(col("__q")).agg(count(lit(1)).as("n_rel"))
    // hits in rank order; __h = how many relevant docs appear at ranks
    // <= this hit's rank (the precision-at-hit numerator AP needs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__q")).orderBy(col("__r"))
    val hits = kept.join(rel.hint("SHUFFLE_HASH"), Seq("__q", "__d"), "left_semi")
      .withColumn("__h", row_number().over(w))
    val hitAgg = hits.groupBy(col("__q")).agg(
      count(lit(1)).as("hits"),
      min(col("__r")).as("__first"),
      sum(lit(1.0) / log2(col("__r") + lit(1))).as("__dcg"),
      sum(col("__h").cast("double") / col("__r")).as("__apn"))
    val idcg = when(col("n_rel") === 0, lit(0.0)).otherwise(
      aggregate(sequence(lit(1L), least(col("n_rel"), kL)), lit(0.0),
        (acc, i) => acc + lit(1.0) / log2(i.cast("double") + lit(1.0))))
    // report base: queries from the FULL (unfiltered) run ∪ the qrels —
    // a query whose hits all landed past k, or whose retriever returned
    // nothing, still emits its (all-zero) row
    val allQueries = run.select(col(queryIdCol).as("__q"))
      .union(rel.select(col("__q"))).distinct()
    allQueries
      .join(nRel.hint("SHUFFLE_HASH"), Seq("__q"), "left")
      .join(hitAgg.hint("SHUFFLE_HASH"), Seq("__q"), "left")
      .na.fill(0L, Seq("n_rel", "hits"))
      .withColumn("__idcg", idcg)
      .select(
        col("__q").as(queryIdCol),
        col("n_rel"),
        col("hits"),
        (col("hits").cast("double") / lit(k.toDouble)).as("precision_k"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(col("hits").cast("double") / col("n_rel")).as("recall_k"),
        when(col("__first").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("__first")).as("rr"),
        when(col("__idcg") === 0.0, lit(0.0))
          .otherwise(coalesce(col("__dcg"), lit(0.0)) / col("__idcg")).as("ndcg"),
        when(col("n_rel") === 0, lit(0.0))
          .otherwise(coalesce(col("__apn"), lit(0.0)) /
            least(col("n_rel"), kL).cast("double")).as("ap"))
  }

  /** Sentence-level BLEU-N (Papineni et al. 2002) per candidate/
    * reference pair — the generation-quality metric the evaluation
    * pipeline reports alongside judged correctness. Unsmoothed: any
    * zero modified precision (or an empty candidate) scores 0, so the
    * number is exactly the textbook definition and exactly replayable.
    *
    * BLEU = BP · exp(Σ_{n=1..N} ln p_n / N), with p_n = clipped n-gram
    * matches / candidate n-gram count and BP = min(1, e^(1 − r/c)).
    * Tokenization is [[TextAnalysis.tokens]] (empty tokens dropped).
    *
    * Returns `(idCol, n_cand, n_ref, p1..pN, bleu)` — one row per input
    * pair, including degenerate ones.
    *
    * Scale: both sides explode to (id, order, gram) counts; the clip is
    * one left join keyed (id, order, gram) — candidate grams never
    * leave their id's partition chain, reference text is never carried
    * past its gram counts. Everything downstream is id-keyed aggs.
    */
  def bleu(pairs: DataFrame, idCol: String, candCol: String, refCol: String,
           maxN: Int = 2): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1 (got $maxN)")
    // null text tokenizes as empty (not null): a NULL side must still
    // report its gram/token counts as 0 on the "one row per pair"
    // contract — size(NULL) would otherwise null the count columns
    def toks(c: Column): Column =
      filter(TextAnalysis.tokens(coalesce(c, lit(""))), t => length(t) > 0)
    val base = pairs.select(col(idCol), toks(col(candCol)).as("__cw"),
      toks(col(refCol)).as("__rw"))
    def grams(wcol: String): DataFrame = (1 to maxN).map { n =>
      base.select(col(idCol),
          explode(TextAnalysis.wordGrams(col(wcol), n)).as("gram"))
        .select(col(idCol), lit(n).as("__n"), col("gram"))
    }.reduce(_ union _).groupBy(col(idCol), col("__n"), col("gram"))
      .agg(count(lit(1)).as("__c"))
    val cand = grams("__cw")
    val ref = grams("__rw").withColumnRenamed("__c", "__r")
    val clipped = cand
      .join(ref.hint("SHUFFLE_HASH"), Seq(idCol, "__n", "gram"), "left")
      .groupBy(col(idCol), col("__n"))
      .agg(sum(least(col("__c"), coalesce(col("__r"), lit(0L)))).as("__clip"),
        sum(col("__c")).as("__tot"))
    val pAggs = (1 to maxN).map { n =>
      max(when(col("__n") === n,
        col("__clip").cast("double") / col("__tot"))).as(s"p$n")
    }
    val perN = clipped.groupBy(col(idCol)).agg(pAggs.head, pAggs.tail: _*)
    val lens = base.select(col(idCol),
      size(col("__cw")).cast("long").as("n_cand"),
      size(col("__rw")).cast("long").as("n_ref"))
    val pCols = (1 to maxN).map(n => col(s"p$n"))
    val anyZero = pCols.map(p => coalesce(p, lit(0.0)) === 0.0).reduce(_ || _)
    val bp = when(col("n_cand") >= col("n_ref"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("n_ref").cast("double") / col("n_cand")))
    val geo = exp(pCols.map(p => log(p)).reduce(_ + _) / lit(maxN.toDouble))
    lens.join(perN.hint("SHUFFLE_HASH"), Seq(idCol), "left")
      .withColumn("bleu",
        when(col("n_cand") === 0 || anyZero, lit(0.0)).otherwise(bp * geo))
      .select(col(idCol) +: col("n_cand") +: col("n_ref") +:
        pCols.map(p => coalesce(p, lit(0.0)).as(p.toString)) :+ col("bleu"): _*)
  }

  /** ROUGE-N (Lin 2004) per candidate/reference pair: clipped n-gram
    * overlap as RECALL against the reference (the summarization-eval
    * complement of [[bleu]]'s precision view), plus the precision and
    * F1 the modern toolkits report. One fixed order `n` per call —
    * `(idCol, n_cand_grams, n_ref_grams, overlap, precision, recall,
    * f1)`, one row per input pair; degenerate sides (doc shorter than
    * n) score 0. Same [[TextAnalysis.wordGrams]] gram definition and
    * (id, gram)-keyed clip join as [[bleu]] — payloads never move past
    * their gram counts.
    */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String, refCol: String,
             n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1 (got $n)")
    // null text tokenizes as empty (not null): a NULL side must still
    // report its gram/token counts as 0 on the "one row per pair"
    // contract — size(NULL) would otherwise null the count columns
    def toks(c: Column): Column =
      filter(TextAnalysis.tokens(coalesce(c, lit(""))), t => length(t) > 0)
    val base = pairs.select(col(idCol), toks(col(candCol)).as("__cw"),
      toks(col(refCol)).as("__rw"))
    def counts(wcol: String, cname: String): DataFrame =
      base.select(col(idCol),
          explode(TextAnalysis.wordGrams(col(wcol), n)).as("gram"))
        .groupBy(col(idCol), col("gram")).agg(count(lit(1)).as(cname))
    val overlap = counts("__cw", "__c")
      .join(counts("__rw", "__r").hint("SHUFFLE_HASH"), Seq(idCol, "gram"), "left")
      .groupBy(col(idCol))
      .agg(sum(least(col("__c"), coalesce(col("__r"), lit(0L)))).as("overlap"),
        sum(col("__c")).as("__ctot"))
    val refTot = counts("__rw", "__r").groupBy(col(idCol))
      .agg(sum(col("__r")).as("__rtot"))
    val p = when(col("n_cand_grams") === 0, lit(0.0))
      .otherwise(col("overlap").cast("double") / col("n_cand_grams"))
    val r = when(col("n_ref_grams") === 0, lit(0.0))
      .otherwise(col("overlap").cast("double") / col("n_ref_grams"))
    base.select(col(idCol))
      .join(overlap.hint("SHUFFLE_HASH"), Seq(idCol), "left")
      .join(refTot.hint("SHUFFLE_HASH"), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__ctot"), lit(0L)).as("n_cand_grams"),
        coalesce(col("__rtot"), lit(0L)).as("n_ref_grams"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .withColumn("precision", p)
      .withColumn("recall", r)
      .withColumn("f1", when(p + r === 0.0, lit(0.0))
        .otherwise(lit(2.0) * p * r / (p + r)))
  }

  /** ROUGE-L (Lin 2004) per candidate/reference pair via BIT-PARALLEL
    * LCS (Allison & Dix 1986): the reference's first `maxRef` (≤ 60)
    * tokens become one 64-bit match mask per distinct token
    * (`bit_or(1L << pos)`), and the whole LCS DP row collapses to a
    * single BIGINT folded over the candidate tokens in order —
    * `x = M[c] | r; r = x & ~(x − ((r << 1) | 1))`; LCS = popcount(r).
    * No UDF, no O(n·m) cell relation: the fold is one `aggregate()`
    * expression per row, and the oracle replays it verbatim with
    * `list_reduce` (two's-complement subtraction is mod-2⁶⁴ in both
    * engines, and the trailing `& x` confines every bit below 2⁶⁰, so
    * the negative intermediates are portable). `maxRef` ≤ 60 keeps
    * `r << 1` inside the signed-long range under ANSI arithmetic.
    *
    * Returns `(idCol, n_cand_tokens, n_ref_tokens, lcs, precision,
    * recall, f1)` — recall against the (truncated) reference,
    * precision against the full candidate, F1 as in [[rougeN]]; null/
    * empty sides report zeros on the one-row-per-pair contract.
    */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String, refCol: String,
             maxRef: Int = 60): DataFrame = {
    require(maxRef >= 1 && maxRef <= 60,
      s"maxRef must be in [1, 60] to fit the bit-parallel row (got $maxRef)")
    def toks(c: Column): Column =
      filter(TextAnalysis.tokens(coalesce(c, lit(""))), t => length(t) > 0)
    val base = pairs.select(col(idCol), toks(col(candCol)).as("__cw"),
        slice(toks(col(refCol)), 1, maxRef).as("__rw"))
      .localCheckpoint()
    val refMasks = base
      .select(col(idCol), posexplode(col("__rw")).as(Seq("__pos", "__tok")))
      .groupBy(col(idCol), col("__tok"))
      .agg(expr("bit_or(shiftleft(1L, __pos))").as("__m"))
    val folded = base
      .select(col(idCol), posexplode(col("__cw")).as(Seq("__ord", "__tok")))
      .join(refMasks.hint("SHUFFLE_HASH"), Seq(idCol, "__tok"), "left")
      .groupBy(col(idCol))
      .agg(org.apache.spark.sql.functions.transform(
        sort_array(collect_list(struct(col("__ord"),
          coalesce(col("__m"), lit(0L)).as("__mm")))),
        s => s.getField("__mm")).as("__masks"))
      .select(col(idCol), bit_count(aggregate(col("__masks"), lit(0L),
        (r, m) => {
          val x = m.bitwiseOR(r)
          x.bitwiseAND(bitwise_not(x - (shiftleft(r, 1).bitwiseOR(lit(1L)))))
        })).cast("long").as("lcs"))
    val p = when(col("n_cand_tokens") === 0, lit(0.0))
      .otherwise(col("lcs").cast("double") / col("n_cand_tokens"))
    val r = when(col("n_ref_tokens") === 0, lit(0.0))
      .otherwise(col("lcs").cast("double") / col("n_ref_tokens"))
    base.select(col(idCol), size(col("__cw")).cast("long").as("n_cand_tokens"),
        size(col("__rw")).cast("long").as("n_ref_tokens"))
      .join(folded.hint("SHUFFLE_HASH"), Seq(idCol), "left")
      .select(col(idCol), col("n_cand_tokens"), col("n_ref_tokens"),
        coalesce(col("lcs"), lit(0L)).as("lcs"))
      .withColumn("precision", p)
      .withColumn("recall", r)
      .withColumn("f1", when(p + r === 0.0, lit(0.0))
        .otherwise(lit(2.0) * p * r / (p + r)))
  }

  /** chrF-style character n-gram F-score (Popović 2015) per candidate/
    * reference pair: whitespace is stripped entirely (the chrF
    * convention — char grams measure subword overlap, not spacing),
    * then for each order n = 1..`maxN`: P_n = clipped matches /
    * candidate grams, R_n likewise against the reference, F_n =
    * (1+β²)·P·R / (β²·P + R) (zero when there is no overlap), and
    * chrF = Σ F_n / maxN — a deterministic documented form (toolkit
    * implementations differ in their epsilon/skip conventions; this one
    * replays exactly relationally). β = 2 weights recall double, the
    * standard chrF2.
    *
    * Returns `(idCol, n_cand_chars, n_ref_chars, chrf)`. Same
    * (id, order, gram)-keyed clip join shape as [[bleu]]/[[rougeN]].
    */
  def chrF(pairs: DataFrame, idCol: String, candCol: String, refCol: String,
           maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1 (got $maxN)")
    require(beta > 0, s"beta must be > 0 (got $beta)")
    // explicit class, not \s+: Java's \s includes U+000B (vertical tab),
    // RE2's (the oracle engine's) does not — the NormalizeText convention
    def strip(c: Column): Column = regexp_replace(c, "[\\t\\n\\f\\r ]+", "")
    val base = pairs.select(col(idCol), strip(col(candCol)).as("__cs"),
      strip(col(refCol)).as("__rs"))
    def counts(scol: String, cname: String): DataFrame = (1 to maxN).map { n =>
      base.select(col(idCol), lit(n).as("__n"),
        explode(TextAnalysis.charGrams(col(scol), n)).as("gram"))
    }.reduce(_ union _)
      .groupBy(col(idCol), col("__n"), col("gram")).agg(count(lit(1)).as(cname))
    val ref = counts("__rs", "__r")
    val perOrder = counts("__cs", "__c")
      .join(ref.hint("SHUFFLE_HASH"), Seq(idCol, "__n", "gram"), "left")
      .groupBy(col(idCol), col("__n"))
      .agg(sum(least(col("__c"), coalesce(col("__r"), lit(0L)))).as("__clip"),
        sum(col("__c")).as("__ctot"))
      .join(ref.groupBy(col(idCol), col("__n")).agg(sum(col("__r")).as("__rtot"))
        .hint("SHUFFLE_HASH"), Seq(idCol, "__n"), "left")
    val p = col("__clip").cast("double") / col("__ctot")
    val r = col("__clip").cast("double") / col("__rtot")
    val b2 = beta * beta
    val f = when(col("__clip") === 0L || col("__rtot").isNull, lit(0.0))
      .otherwise(lit(1.0 + b2) * p * r / (lit(b2) * p + r))
    val scored = perOrder
      .withColumn("__f", f)
      .groupBy(col(idCol))
      .agg((sum(col("__f")) / lit(maxN.toDouble)).as("chrf"))
    base.select(col(idCol),
        length(col("__cs")).cast("long").as("n_cand_chars"),
        length(col("__rs")).cast("long").as("n_ref_chars"))
      .join(scored.hint("SHUFFLE_HASH"), Seq(idCol), "left")
      .withColumn("chrf", coalesce(col("chrf"), lit(0.0)))
  }

  /** Macro-averaged summary of [[rankingMetrics]] — one row: mean of
    * each metric over the run's queries (every query weighs the same
    * regardless of its n_rel, the standard macro convention).
    */
  def rankingSummary(metrics: DataFrame): DataFrame =
    metrics.agg(
      count(lit(1)).as("n_queries"),
      avg(col("precision_k")).as("mean_precision"),
      avg(col("recall_k")).as("mean_recall"),
      avg(col("rr")).as("mrr"),
      avg(col("ndcg")).as("mean_ndcg"),
      avg(col("ap")).as("map"))

  /** Deterministic judge stand-in: correct iff the answer contains the
    * reference answer's first token (the reference's LLM judge is mocked
    * the same way in its tests).
    */
  def keywordJudge(answer: String, reference: String): Boolean = {
    val key = reference.split("\\s+").headOption.getOrElse("")
    key.nonEmpty && answer.toLowerCase.contains(key.toLowerCase)
  }

  /** [[keywordJudge]] as a Catalyst column — the deterministic default
    * stays inside whole-stage codegen instead of paying a per-row UDF;
    * the column-function seam still accepts a custom judge (an LLM judge
    * wraps its call in `udf` and plugs in here). Exact [[keywordJudge]]
    * parity: first whitespace token of the reference, case-insensitive
    * containment, empty key (or null inputs) → false.
    */
  def keywordJudgeCol(answer: org.apache.spark.sql.Column,
                      reference: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val key = element_at(split(reference, "\\s+"), 1)
    coalesce(length(key) > 0 && contains(lower(answer), lower(key)), lit(false))
  }

  /** S18 testset upsert: idempotent overwrite keyed on the testset id —
    * the Spark shape of the reference's PL/SQL lookup/update/delete-
    * children/insert loop (`src/server/utils/testbed.py:155-203`).
    *
    * The table is `partitionBy(tid)` and the write uses *dynamic*
    * partition overwrite, so only the `tid=<tid>` directory is rewritten:
    * O(|incoming|) I/O regardless of table size, other testsets' files
    * untouched, and no read-all/staging/copy-back phase (which was
    * O(table) per upsert and lost the table if interrupted between its
    * two writes).
    */
  def upsertTestset(spark: SparkSession, tablePath: String, tid: String,
                    name: String, qa: DataFrame): Unit =
    // dynamic overwrite only touches partitions PRESENT in the data: an
    // empty incoming set would silently keep the tid's old rows, so the
    // upsert-as-replace contract needs the explicit partition drop there
    if (qa.isEmpty) deleteTestset(spark, tablePath, tid)
    else qa.withColumn("name", lit(name))
      .withColumn("created", current_timestamp())
      .withColumn("tid", lit(tid))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("tid")
      .parquet(tablePath)

  /** S19 evaluation sink: append one evaluation row plus its per-question
    * report rows (a real table, not a pickled blob). Both tables are
    * `partitionBy(tid)` so a testset's whole evaluation history is one
    * directory — [[deleteTestset]]'s cascade is a directory drop, and
    * [[listEvaluations]] prunes to one partition.
    */
  def appendEvaluation(spark: SparkSession, evalPath: String, reportPath: String,
                       tid: String, report: DataFrame,
                       eid: String = java.util.UUID.randomUUID().toString): String = {
    import spark.implicits._
    // the correctness mean is observed on the report write itself (the
    // Ingest.ingest Observation pattern), so the report plan — under
    // evaluateRag a full similarity join + generation — executes exactly
    // once; a separate overall() action would run it twice. An empty
    // report records correctness 0.0 over n=0.
    val obs = new org.apache.spark.sql.Observation()
    report.withColumn("eid", lit(eid)).withColumn("tid", lit(tid))
      .observe(obs, count(lit(1)).as("n"), sum(col("correct").cast("int")).as("ok"))
      .write.mode("append").partitionBy("tid").parquet(reportPath)
    val n = obs.get("n").asInstanceOf[Long]
    val ok = Option(obs.get("ok")).map(_.asInstanceOf[Long]).getOrElse(0L)
    val correctness = if (n == 0) 0.0 else ok.toDouble / n
    Seq((eid, correctness)).toDF("eid", "correctness")
      .withColumn("evaluated", current_timestamp())
      .withColumn("tid", lit(tid))
      .write.mode("append").partitionBy("tid").parquet(evalPath)
    eid
  }

  /** Evaluations listing for one testset, newest first — the reference's
    * `get_evaluations` surface (`src/server/utils/testbed.py:131,328`,
    * `ORDER BY evaluated DESC`). The tid filter is partition pruning on
    * the [[appendEvaluation]] layout; eid tiebreak keeps the order total.
    */
  def listEvaluations(spark: SparkSession, evalPath: String, tid: String): DataFrame =
    spark.read.parquet(evalPath)
      .filter(col("tid") === tid)
      .select(col("eid"), col("evaluated"), col("correctness"))
      .orderBy(col("evaluated").desc, col("eid"))

  /** P13 delete-by-key with cascade — the reference's PL/SQL
    * delete-children loop (`testbed.py:155-169`: delete a testset ⇒ its
    * QA rows, its evaluations, and their reports go too). On the
    * tid-partitioned layout every child set is exactly one partition
    * directory, so the cascade is three directory drops: O(deleted)
    * I/O, no read or rewrite of surviving testsets.
    */
  def deleteTestset(spark: SparkSession, tablePath: String, tid: String,
                    evalPath: Option[String] = None,
                    reportPath: Option[String] = None): Unit = {
    // partition VALUES are Hive-escaped in directory names (':' → '%3A'
    // etc.) — a raw s"tid=$tid" path would silently miss any tid with a
    // special character and no-op the cascade
    val dir = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .getPartitionPathString("tid", tid)
    (Seq(tablePath) ++ evalPath ++ reportPath)
      .foreach(base => graft.Fs.delete(spark, s"$base/$dir"))
  }

  /** Retrieval score calibration: bin the run's [0,1] relevance scores
    * and report per-bin empirical precision against the qrels — the
    * calibration curve that tells a RAG stack whether a 0.8 similarity
    * actually MEANS more than a 0.6 (and where to put a score
    * threshold). Returns `(bin, n_scored, n_relevant, precision_micros)` for
    * the occupied bins, bin b covering `[b/nBins, (b+1)/nBins)` with
    * the top edge closed.
    *
    * Cross-engine: binning floors the 6dp-ROUNDED relevance, so a bin
    * edge can never flip on last-ulp score divergence. The run is
    * k×|queries|-bounded, so everything here is driver-cheap; the qrels
    * join is SHUFFLE_HASH (qrels can be corpus-scale).
    */
  def scoreCalibration(run: DataFrame, qrels: DataFrame, qidCol: String,
                       docCol: String, scoreCol: String,
                       metric: String = "COSINE", nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2 (got $nBins)")
    val rel = round(Similarity.relevance(metric, col(scoreCol)), 6)
    run.select(col(qidCol), col(docCol), rel.as("__rel"))
      .join(qrels.select(col(qidCol), col(docCol)).distinct()
        .withColumn("__hit", lit(1L)).hint("SHUFFLE_HASH"),
        Seq(qidCol, docCol), "left")
      .withColumn("bin",
        least(floor(col("__rel") * nBins).cast("long"), lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_scored"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_relevant"))
      // per-bin precision is an exact integer ratio: pure-Long micros
      // (round-half-up), never round(double, n) on an exact ratio
      .withColumn("precision_micros",
        expr("CAST((2*1000000*n_relevant + n_scored) DIV (2*n_scored) AS BIGINT)"))
  }

  /** Character edit-distance evaluation (the CER/TER-style complement
    * of the n-gram metrics): per pair, the unit-cost Levenshtein
    * distance between candidate and reference plus the
    * reference-length-normalized rate (the number OCR/ASR-style
    * pipelines report). Distances are exact integers — Spark's and any
    * other engine's unit-cost `levenshtein` agree bit for bit — and the
    * rate is the exact integer ratio dist/max(len), published as
    * pure-Long micros. Null sides coalesce to empty (distance = other
    * side's length, the standard convention). Returns `(idCol,
    * n_cand_chars, n_ref_chars, edit_distance, edit_rate_micros)`; an
    * empty reference with an empty candidate rates 0, with a non-empty
    * one 10⁶-per-char normalized by the candidate (the max(len)
    * denominator convention, so the rate stays in [0, 10⁶]).
    *
    * Pure codegen'd projection — no joins, no shuffle.
    */
  def editDistance(pairs: DataFrame, idCol: String, candCol: String,
                   refCol: String): DataFrame = {
    val c = coalesce(col(candCol), lit(""))
    val r = coalesce(col(refCol), lit(""))
    val dist = levenshtein(c, r).cast("long")
    val denom = greatest(length(c), length(r)).cast("long")
    pairs.select(col(idCol),
        length(c).cast("long").as("n_cand_chars"),
        length(r).cast("long").as("n_ref_chars"),
        dist.as("edit_distance"),
        denom.as("__denom"))
      // dist/denom is an exact integer ratio: pure-Long micros
      // (round-half-up), never round(double, n) on an exact ratio
      .withColumn("edit_rate_micros", expr("IF(__denom = 0, 0L, " +
        "CAST((2*1000000*edit_distance + __denom) DIV (2*__denom) AS BIGINT))"))
      .drop("__denom")
  }

  /** Deterministic subsampling bootstrap for a per-row metric: `b`
    * replicates, each the rows whose md5 hash point for that replicate
    * falls under `sampleFrac` (the [[Sampling.hashSplit]] portability
    * contract — membership is per-(key, replicate) deterministic, so
    * any engine regenerates the identical replicate sets). Returns
    * `(replicate, n_rows, mean_value)`, one row per replicate — the
    * spread across replicates is the confidence interval an eval report
    * should carry instead of a bare point estimate.
    *
    * Scale shape: the replicate fan-out is a map-side b× explode
    * filtered in the same stage, collapsing straight into a b-key hash
    * agg (partial map-side, tiny exchange). No row carries more than
    * its value past the filter.
    */
  def bootstrapCi(results: DataFrame, idCol: String, valueCol: String,
                  b: Int = 20, sampleFrac: Double = 0.8,
                  seed: String = "ci0"): DataFrame = {
    require(b >= 2, s"need >= 2 replicates (got $b)")
    require(sampleFrac > 0 && sampleFrac <= 1, s"sampleFrac in (0,1] (got $sampleFrac)")
    val threshold = Sampling.hexThreshold(sampleFrac)
    results
      .select(col(idCol), col(valueCol))
      .crossJoin(results.sparkSession.range(1, b + 1).select(col("id").as("replicate")))
      .filter(substring(md5(concat(lit(seed + ":"), col("replicate"),
        lit(":"), col(idCol).cast("string")).cast("binary")), 1, 8) < threshold)
      .groupBy(col("replicate"))
      .agg(count(lit(1)).as("n_rows"),
        // Tables.micros, not round(avg, 6): the mean of an
        // integer-valued metric is an exact rational, where round is
        // tie- and engine-build-sensitive; floor(x·10⁶ + ½) is two
        // IEEE ops on the same double — identical everywhere
        graft.Tables.micros(avg(col(valueCol))).as("mean_value_micros"))
  }

  /** RLHF/DPO preference-pair construction from scored generations —
    * the step between the evaluation sink and preference training: per
    * prompt, the best-scored candidate becomes `chosen` and the
    * worst-scored `rejected` (score ties break on the answer string,
    * so the pair is deterministic), kept only when the margin clears
    * `minMargin` (equal-score pairs carry no preference signal and are
    * dropped at the default 0). ONE map-side-combinable aggregation —
    * `max(struct(score, answer))` / `min(struct(score, answer))` —
    * never a self-join of candidates; margin rounded to 6 decimals
    * (the cross-engine float convention).
    */
  def preferencePairs(scored: DataFrame, qidCol: String, answerCol: String,
                      scoreCol: String, minMargin: Double = 0.0): DataFrame = {
    scored
      .groupBy(col(qidCol))
      .agg(
        max(struct(col(scoreCol).as("s"), col(answerCol).as("a"))).as("__c"),
        min(struct(col(scoreCol).as("s"), col(answerCol).as("a"))).as("__r"),
        count(lit(1)).as("n_candidates"))
      .filter(col("__c.s") - col("__r.s") > minMargin)
      .select(col(qidCol), col("__c.a").as("chosen"), col("__r.a").as("rejected"),
        // generation scores are transcendental-derived model outputs:
        // round(6) is the score convention, not an exact-ratio round
        round(col("__c.s") - col("__r.s"), 6).as("margin"),
        col("n_candidates"))
  }
}
