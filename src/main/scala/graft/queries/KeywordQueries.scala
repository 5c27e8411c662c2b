package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.ops.{Keyword, Similarity}

/** Lexical retrieval + hybrid-fusion parity queries. The BM25 formula is
  * evaluated in the same operation order in both engines; scores are
  * rounded to 6 decimals and BOTH engines rank on the rounded value with
  * an id tiebreak (see [[Keyword.bm25]] — raw-double ranking would leave
  * the top-k cut vulnerable to last-ulp cross-engine divergence).
  */
object KeywordQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Terms = Seq("spark", "vector", "merge", "window")
  private val K1 = 1.2
  private val B = 0.75

  /** One lexical index per corpus directory per JVM: the QUERY entry must
    * measure what the operator claims (bucket-pruned postings, no corpus
    * touch), not the one-time build it amortizes — a per-invocation build
    * made the indexed path look slower than the scan it exists to beat.
    * The BUILD cost is measured by its own entry (`lexical_index_build`).
    */
  private val idxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def cachedIndex(s: SparkSession, d: String): String =
    idxCache.computeIfAbsent(d, _ => {
      val idx = java.nio.file.Files.createTempDirectory("lexidx-session").toString
      Keyword.buildLexicalIndex(graft.Tables.documents(s, d), "doc_id", "text", idx)
      idx
    })

  // same one-build-per-corpus-per-JVM rule for the positional sidecar
  private val posIdxCache = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def cachedPosIndex(s: SparkSession, d: String): String =
    posIdxCache.computeIfAbsent(d, _ => {
      val idx = java.nio.file.Files.createTempDirectory("posidx-session").toString
      Keyword.buildPositionalIndex(graft.Tables.documents(s, d), "doc_id", "text", idx)
      idx
    })

  /** Materialize the session-cached lexical + positional indexes for
    * `d` — bench setup, same rationale as
    * [[VectorSearch.prewarmStores]]: the BUILD is measured by its own
    * entries (`lexical_index_build`), so it must not contaminate the
    * first measured serve of the indexed queries.
    */
  def prewarmIndexes(s: SparkSession, d: String): Unit = {
    cachedIndex(s, d): Unit
    cachedPosIndex(s, d): Unit
  }

  // the build entry overwrites ONE fixed dir per corpus PER PROCESS
  // (build is mode("overwrite")), so repeated bench runs measure a fresh
  // build without accumulating temp dirs — and the pid keeps concurrent
  // drivers (bench racing verify) off each other's postings, exactly the
  // store_time_travel treatment: a shared dir let another JVM's overwrite
  // race this one's read and flake the hash
  private def buildDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-lexidx-" +
      s"${Integer.toHexString(d.hashCode)}-${java.lang.ProcessHandle.current().pid()}"

  /** The BM25 CTE pipeline in DuckDB SQL, mirroring [[Keyword.bm25]]
    * term by term. Constants are interpolated from the SAME Scala
    * doubles the Spark plan uses — shortest-round-trip printing parses
    * back to the identical IEEE value in DuckDB.
    */
  private def bm25Sql(where: String, limit: Int): String = {
    val termList = Terms.map(t => s"'$t'").mkString(", ")
    s"""base AS (
       |  SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS dl,
       |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
       |      t -> t IN ($termList)) AS qw
       |  FROM documents $where),
       |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM base),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf FROM (
       |    SELECT doc_id, dl, unnest(qw) AS term FROM base)
       |  GROUP BY doc_id, dl, term),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |kw AS (
       |  SELECT doc_id, round(sum(
       |      ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * ${K1 + 1.0}) /
       |      (tf + $K1 * (1.0 - $B + $B * dl / (sumdl::DOUBLE / n)))
       |    ), 6) AS bm25
       |  FROM tf JOIN df USING (term), stats
       |  GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT $limit)""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    // BM25 top-20 for a fixed query over the documents corpus.
    "bm25_topk" -> ((s, d) => {
      import s.implicits._
      Keyword.bm25(documents(s, d), "doc_id", "text", Terms, K1, B, topK = 20)
        .orderBy($"bm25".desc, $"doc_id")
    }),

    // Same ranking through the materialized inverted index — built once
    // per session (cachedIndex), so this entry measures the QUERY path
    // the operator claims: bucket-pruned postings with dl on the posting,
    // zero corpus touch. Must match bm25_topk's oracle exactly (the index
    // is a layout change, never a semantics change).
    "bm25_indexed_topk" -> ((s, d) => {
      import s.implicits._
      Keyword.bm25Indexed(s, cachedIndex(s, d), Terms, K1, B, topK = 20, idName = "doc_id")
        .orderBy($"bm25".desc, $"doc_id")
    }),

    // The one-time index BUILD, measured on its own: full tokenize +
    // explode into bucket-partitioned postings. Output is the index's
    // summary statistics — corpus-derived and deterministic, so the
    // oracle recomputes them relationally from the documents table.
    "lexical_index_build" -> ((s, d) => {
      import s.implicits._
      val dir = buildDir(d)
      Keyword.buildLexicalIndex(documents(s, d), "doc_id", "text", dir)
      val stats = graft.Fs.readString(s, s"$dir/_stats").trim.split(" ")
      s.read.parquet(s"$dir/postings")
        .agg(count(lit(1)).as("n_postings"),
          count_distinct($"term").as("n_terms"))
        .select($"n_postings", $"n_terms",
          lit(stats(0).toLong).as("n_docs"), lit(stats(1).toLong).as("sum_dl"))
        .orderBy($"n_postings")
    }),

    // Incremental index maintenance, end to end: half the corpus into a
    // versioned store + full build, the other half appended, then
    // appendToLexicalIndexForStore folds ONLY the appended rows in
    // (O(new docs), the lexical analog of Ivf.appendAssigned). Serving
    // the maintained index must be bit-for-bit the full-corpus ranking —
    // the oracle is bm25_topk's full-corpus CTE, so the hash pins
    // incremental ≡ rebuild. Store + index are rebuilt fresh per
    // invocation (this entry MEASURES the maintenance sequence).
    "lexical_index_incremental" -> ((s, d) => {
      import s.implicits._
      val root = buildDir(d) + "-incr"
      graft.Fs.delete(s, root)
      val store = s"$root/store"
      val idx = s"$root/idx"
      val docs = documents(s, d).select($"doc_id", $"text")
      graft.ops.VersionedStore.append(s, store, docs.filter($"doc_id" % 2 === 0))
      Keyword.buildLexicalIndexForStore(s, store, "doc_id", "text", idx)
      graft.ops.VersionedStore.append(s, store, docs.filter($"doc_id" % 2 =!= 0))
      Keyword.appendToLexicalIndexForStore(s, store, "doc_id", "text", idx)
      Keyword.bm25Indexed(s, idx, Terms, K1, B, topK = 20, idName = "doc_id",
          store = Some(store))
        .orderBy($"bm25".desc, $"doc_id")
    }),

    // Hybrid search: BM25 leg + cosine-kNN leg (vec_id ≡ doc_id in the
    // test data), fused by reciprocal rank — the retrieval shape a
    // production RAG stack runs. Both legs top-50, fusion top-10.
    "hybrid_rrf_fusion" -> ((s, d) => {
      import s.implicits._
      val qv = embeddings(s, d).filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0).toArray
      val vecRank = Similarity.knn(
          embeddings(s, d).filter($"vec_id" =!= 0).select($"vec_id", $"embedding"),
          "embedding", qv, k = 50)
        .withColumn("rank", row_number().over(Window.partitionBy(lit(1)).orderBy($"score".desc, $"vec_id")))
        .select($"vec_id".as("doc_id"), $"rank")
      val kwRank = Keyword.bm25(
          documents(s, d).filter($"doc_id" =!= 0), "doc_id", "text", Terms, K1, B, topK = 50)
        .withColumn("rank", row_number().over(Window.partitionBy(lit(1)).orderBy($"bm25".desc, $"doc_id")))
        .select($"doc_id", $"rank")
      Keyword.rrfFuse(Seq(vecRank, kwRank), "doc_id", "rank", c = 60, topK = 10)
        .orderBy($"rrf_micros".desc, $"doc_id")
    }),

    // Weighted hybrid (relative-score fusion): both legs min-max
    // normalized within their top-50, blended 0.7 vector / 0.3 lexical
    // — the tunable-alpha hybrid RRF deliberately isn't. Normalization
    // runs on the 6dp-rounded leg scores; ranked on the rounded blend.
    "hybrid_alpha_fusion" -> ((s, d) => {
      import s.implicits._
      val qv = embeddings(s, d).filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0).toArray
      val vecLeg = Similarity.knn(
          embeddings(s, d).filter($"vec_id" =!= 0).select($"vec_id", $"embedding"),
          "embedding", qv, k = 50)
        .select($"vec_id".as("doc_id"), $"score")
      val kwLeg = Keyword.bm25(
          documents(s, d).filter($"doc_id" =!= 0), "doc_id", "text",
          Terms, K1, B, topK = 50)
        .select($"doc_id", $"bm25".as("score"))
      Keyword.relativeScoreFuse(Seq((vecLeg, 0.7), (kwLeg, 0.3)),
          "doc_id", "score", topK = 10)
        .orderBy($"fused".desc, $"doc_id")
    }),

    // Pseudo-relevance-feedback expansion: initial BM25 → top-5
    // feedback docs → Rocchio term selection (feedback tf × smooth
    // corpus idf, 3 new terms) → BM25 re-run with the expanded query.
    // The oracle replays the whole loop with the term set as a
    // RELATION (no literals for the learned terms).
    "prf_bm25_expanded" -> ((s, d) => {
      import s.implicits._
      val docs = documents(s, d)
      val expanded = Keyword.prfExpandTerms(docs, "doc_id", "text", Terms,
        fbDocs = 5, expandTerms = 3, K1, B)
      Keyword.bm25(docs, "doc_id", "text", expanded, K1, B, topK = 20)
        .orderBy($"bm25".desc, $"doc_id")
    }),

    // The same PRF loop served entirely from the maintained lexical
    // index: pruned postings for the initial ranking, the narrow
    // postings table (never corpus text) for candidate mining, pruned
    // postings again for the expanded ranking. Shares the scan path's
    // oracle — identical expansion, identical final ranking.
    "prf_indexed_expanded" -> ((s, d) => {
      import s.implicits._
      val idx = cachedIndex(s, d)
      val expanded = Keyword.prfExpandTermsIndexed(s, idx, Terms,
        fbDocs = 5, expandTerms = 3, K1, B)
      Keyword.bm25Indexed(s, idx, expanded, K1, B, topK = 20, idName = "doc_id")
        .orderBy($"bm25".desc, $"doc_id")
    }),

    // Per-document TF-IDF keyword extraction (sklearn smooth idf): the
    // oracle replays tokenization, tf, df, N, and the identical
    // arithmetic; ranks carry the result, the 6-dp rounding only
    // touches the reported score.
    "tfidf_top_terms" -> ((s, d) => {
      import s.implicits._
      Keyword.tfidfTopTerms(documents(s, d), "doc_id", "text", k = 5)
        .select($"doc_id", $"rank", $"term", $"tf", $"df",
          round($"score", 6).as("score"))
        .orderBy($"doc_id", $"rank")
    }),

    // Search-within-results: documents containing the exact phrase,
    // ranked by BM25 over the phrase-matching SUBSET (the filtered-
    // collection semantics: N/avgdl/df describe what the user is
    // searching). Both green legs composed; the phrase filter is a
    // semi-join of bounded match ids into the scoring scan.
    "phrase_filtered_bm25" -> ((s, d) => {
      import s.implicits._
      val docs = documents(s, d)
      val matches = Keyword.phraseSearch(docs, "doc_id", "text",
        Seq("fast", "merge")).select($"doc_id")
      Keyword.bm25(docs.join(matches, Seq("doc_id"), "left_semi"),
          "doc_id", "text", Terms, K1, B, topK = 10)
        .orderBy($"bm25".desc, $"doc_id")
    }),

    // Positional-index-served phrase search: same answers as the scan
    // path (the shared oracle pins it), but the legs read ONLY the
    // phrase terms' bucket-pruned postings — no corpus text IO.
    "phrase_search_indexed" -> ((s, d) => {
      import s.implicits._
      val idx = cachedPosIndex(s, d)
      Keyword.phraseSearchIndexed(s, idx, Seq("fast", "merge"))
        .withColumn("phrase", lit("fast merge"))
        .unionByName(
          Keyword.phraseSearchIndexed(s, idx, Seq("hash", "join", "key"))
            .withColumn("phrase", lit("hash join key")))
        .select($"phrase", $"id".as("doc_id"), $"n_matches", $"first_pos")
        .orderBy($"phrase", $"doc_id")
    }),

    // Positional exact-phrase search — the capability the bag-of-words
    // sidecar can't serve: a bigram and a trigram phrase, each matched
    // through the one-shuffle leg-agreement plan (no self-join chain).
    "phrase_search_positional" -> ((s, d) => {
      import s.implicits._
      val docs = documents(s, d)
      Keyword.phraseSearch(docs, "doc_id", "text", Seq("fast", "merge"))
        .withColumn("phrase", lit("fast merge"))
        .unionByName(
          Keyword.phraseSearch(docs, "doc_id", "text", Seq("hash", "join", "key"))
            .withColumn("phrase", lit("hash join key")))
        .select($"phrase", $"doc_id", $"n_matches", $"first_pos")
        .orderBy($"phrase", $"doc_id")
    }),
  )

  /** The PRF loop replayed relationally — shared by the scan-path and
    * index-path query entries (identical expansion, identical final
    * ranking). The learned term set is a RELATION (expt/terms CTEs),
    * never literals.
    *
    * The kw0/final CTEs rank on the ROUNDED score with an id tiebreak —
    * deliberately matching the engine: [[Keyword.bm25]] (and
    * `bm25Indexed`) order by `round(sum, 6)` then id (Keyword.scala:92,
    * 446), so a raw-score near-tie rounds to equality and resolves by
    * id identically in both engines. Ranking on the unrounded sum here
    * would REINTRODUCE the last-ulp cross-engine cut this convention
    * exists to remove.
    */
  private lazy val prfOracle: String = {
    val termList = Terms.map(t => s"'$t'").mkString(", ")
    val score = s"""ln(1.0 + (st.n - df + 0.5) / (df + 0.5)) * (tf * ${K1 + 1.0}) /
       |      (tf + $K1 * (1.0 - $B + $B * dl.dl / (st.sumdl::DOUBLE / st.n)))""".stripMargin
    s"""WITH base AS (SELECT doc_id,
         |    regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
         |tok AS (SELECT doc_id, unnest(w) AS term FROM base),
         |dl AS (SELECT doc_id, len(w) AS dl FROM base),
         |st AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM dl),
         |tf0 AS (SELECT doc_id, term, count(*) AS tf FROM tok
         |  WHERE term IN ($termList) GROUP BY doc_id, term),
         |df0 AS (SELECT term, count(*) AS df FROM tf0 GROUP BY term),
         |kw0 AS (SELECT tf0.doc_id, round(sum(
         |      $score
         |    ), 6) AS bm25
         |  FROM tf0 JOIN df0 USING (term)
         |  JOIN dl ON dl.doc_id = tf0.doc_id, st
         |  GROUP BY tf0.doc_id ORDER BY bm25 DESC, tf0.doc_id LIMIT 5),
         |ctf AS (SELECT term, count(*) AS ftf FROM tok
         |  WHERE doc_id IN (SELECT doc_id FROM kw0) AND term <> ''
         |  GROUP BY term),
         |cdf AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
         |  WHERE term <> '' GROUP BY term),
         |cand AS (SELECT c.term,
         |    c.ftf * (ln((CAST(1.0 AS DOUBLE) + st.n) /
         |             (CAST(1.0 AS DOUBLE) + d.df)) + CAST(1.0 AS DOUBLE)) AS sc
         |  FROM ctf c JOIN cdf d USING (term), st
         |  WHERE c.term NOT IN ($termList)),
         |expt AS (SELECT term FROM cand ORDER BY sc DESC, term LIMIT 3),
         |terms AS (SELECT term FROM expt
         |  UNION ALL SELECT unnest([$termList]) AS term),
         |tf1 AS (SELECT tok.doc_id, tok.term, count(*) AS tf
         |  FROM tok JOIN terms USING (term) GROUP BY tok.doc_id, tok.term),
         |df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY term)
         |SELECT doc_id, bm25 FROM (
         |  SELECT tf1.doc_id, round(sum(
         |      $score
         |    ), 6) AS bm25
         |  FROM tf1 JOIN df1 USING (term)
         |  JOIN dl ON dl.doc_id = tf1.doc_id, st
         |  GROUP BY tf1.doc_id ORDER BY bm25 DESC, tf1.doc_id LIMIT 20)
         |ORDER BY bm25 DESC, doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "bm25_topk" ->
      s"""WITH ${bm25Sql(where = "", limit = 20)}
         |SELECT doc_id, bm25 FROM kw ORDER BY bm25 DESC, doc_id""".stripMargin,
    "bm25_indexed_topk" ->
      s"""WITH ${bm25Sql(where = "", limit = 20)}
         |SELECT doc_id, bm25 FROM kw ORDER BY bm25 DESC, doc_id""".stripMargin,
    // incremental maintenance must serve the FULL-corpus ranking —
    // sharing bm25_topk's oracle pins incremental ≡ rebuild by hash
    "lexical_index_incremental" ->
      s"""WITH ${bm25Sql(where = "", limit = 20)}
         |SELECT doc_id, bm25 FROM kw ORDER BY bm25 DESC, doc_id""".stripMargin,
    "lexical_index_build" ->
      """WITH tf AS (
        |  SELECT term, doc_id FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |    FROM documents)
        |  GROUP BY term, doc_id)
        |SELECT count(*) AS n_postings, count(DISTINCT term) AS n_terms,
        |  (SELECT count(*) FROM documents) AS n_docs,
        |  (SELECT sum(len(regexp_split_to_array(trim(text), '\s+')))::BIGINT
        |   FROM documents) AS sum_dl
        |FROM tf ORDER BY n_postings""".stripMargin,
    "hybrid_rrf_fusion" ->
      s"""WITH ${bm25Sql(where = "WHERE doc_id <> 0", limit = 50)},
         |kwr AS (
         |  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
         |  FROM kw),
         |vecr AS (
         |  SELECT doc_id, rank FROM (
         |    SELECT vec_id AS doc_id, row_number() OVER (
         |      ORDER BY list_cosine_similarity(embedding::DOUBLE[],
         |        (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) DESC,
         |      vec_id) AS rank
         |    FROM embeddings WHERE vec_id <> 0)
         |  WHERE rank <= 50),
         |u AS (
         |  SELECT doc_id, 1.0 / (60 + rank) AS c FROM kwr
         |  UNION ALL
         |  SELECT doc_id, 1.0 / (60 + rank) AS c FROM vecr)
         |SELECT doc_id,
         |  CAST(floor(sum(c) * 1000000 + 0.5) AS BIGINT) AS rrf_micros FROM u
         |GROUP BY doc_id ORDER BY rrf_micros DESC, doc_id LIMIT 10""".stripMargin,
    // min-max over each leg's rounded top-50 scores, 0.7/0.3 blend,
    // rounded-rank cut — normalization and blend replayed term for term
    "hybrid_alpha_fusion" ->
      s"""WITH ${bm25Sql(where = "WHERE doc_id <> 0", limit = 50)},
         |kmm AS (SELECT min(bm25) AS mn, max(bm25) AS mx FROM kw),
         |vecn AS (
         |  SELECT doc_id, round(s, 6) AS s FROM (
         |    SELECT vec_id AS doc_id, list_cosine_similarity(
         |        embedding::DOUBLE[],
         |        (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) AS s
         |    FROM embeddings WHERE vec_id <> 0
         |    ORDER BY s DESC, vec_id LIMIT 50)),
         |vmm AS (SELECT min(s) AS mn, max(s) AS mx FROM vecn),
         |u AS (
         |  SELECT doc_id, 0.7 * CASE WHEN vmm.mx = vmm.mn THEN 1.0
         |    ELSE (s - vmm.mn) / (vmm.mx - vmm.mn) END AS c FROM vecn, vmm
         |  UNION ALL
         |  SELECT doc_id, 0.3 * CASE WHEN kmm.mx = kmm.mn THEN 1.0
         |    ELSE (bm25 - kmm.mn) / (kmm.mx - kmm.mn) END FROM kw, kmm)
         |SELECT doc_id, round(sum(c), 6) AS fused FROM u
         |GROUP BY doc_id ORDER BY fused DESC, doc_id LIMIT 10""".stripMargin,
    "prf_bm25_expanded" -> prfOracle,
    // the index is a layout change, never a semantics change — the
    // indexed PRF path must hash-match the identical relational replay
    "prf_indexed_expanded" -> prfOracle,
    "tfidf_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |       WHERE term <> '' GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |        tf.tf * (ln((CAST(1.0 AS DOUBLE) + n.n) /
        |                    (CAST(1.0 AS DOUBLE) + dfq.df)) +
        |                 CAST(1.0 AS DOUBLE)) AS score
        |      FROM tf JOIN dfq USING (term), n),
        |r AS (SELECT s.*, row_number() OVER (
        |        PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM s)
        |SELECT doc_id, rank, term, tf, df, round(score, 6) AS score
        |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,
    // the phrase filter as a CTE feeding bm25Sql's WHERE — subset
    // stats, identical scoring arithmetic
    "phrase_filtered_bm25" ->
      s"""WITH pm AS (SELECT doc_id FROM (
         |    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
         |    FROM documents)
         |  WHERE len(list_filter(range(1, len(w)),
         |          i -> w[i] = 'fast' AND w[i+1] = 'merge')) > 0),
         |${bm25Sql(where = "WHERE doc_id IN (SELECT doc_id FROM pm)", limit = 10)}
         |SELECT doc_id, bm25 FROM kw ORDER BY bm25 DESC, doc_id""".stripMargin,
    // the indexed path must serve the FULL corpus phrase answers —
    // sharing the scan path's oracle pins indexed ≡ scan by hash
    "phrase_search_indexed" ->
      """WITH base AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |m1 AS (SELECT 'fast merge' AS phrase, doc_id,
        |    list_filter(range(1, len(w)),
        |      i -> w[i] = 'fast' AND w[i+1] = 'merge') AS starts FROM base),
        |m2 AS (SELECT 'hash join key' AS phrase, doc_id,
        |    list_filter(range(1, len(w) - 1),
        |      i -> w[i] = 'hash' AND w[i+1] = 'join' AND w[i+2] = 'key') AS starts
        |  FROM base),
        |u AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
        |SELECT phrase, doc_id, len(starts)::BIGINT AS n_matches,
        |  (list_min(starts) - 1)::BIGINT AS first_pos
        |FROM u WHERE len(starts) > 0 ORDER BY phrase, doc_id""".stripMargin,
    // phrase occurrences recomputed by direct positional scan over the
    // token arrays (1-based list indexing; the engine's first_pos is
    // 0-based, hence the -1)
    "phrase_search_positional" ->
      """WITH base AS (SELECT doc_id,
        |    regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
        |m1 AS (SELECT 'fast merge' AS phrase, doc_id,
        |    list_filter(range(1, len(w)),
        |      i -> w[i] = 'fast' AND w[i+1] = 'merge') AS starts FROM base),
        |m2 AS (SELECT 'hash join key' AS phrase, doc_id,
        |    list_filter(range(1, len(w) - 1),
        |      i -> w[i] = 'hash' AND w[i+1] = 'join' AND w[i+2] = 'key') AS starts
        |  FROM base),
        |u AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2)
        |SELECT phrase, doc_id, len(starts)::BIGINT AS n_matches,
        |  (list_min(starts) - 1)::BIGINT AS first_pos
        |FROM u WHERE len(starts) > 0 ORDER BY phrase, doc_id""".stripMargin,
  )
}
