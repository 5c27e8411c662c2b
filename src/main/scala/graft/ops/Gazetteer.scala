package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern dictionary matching at corpus scale — the gazetteer /
  * banned-phrase / PII-term scan of a training-data pipeline, built on
  * the Aho–Corasick automaton (Aho & Corasick 1975): ONE left-to-right
  * pass over each document finds every occurrence of every dictionary
  * term, so the per-document cost is O(chars + matches) and does NOT
  * grow with the dictionary. That is the scale lever over the
  * per-term approach ([[TextAnalysis.blocklistGate]]'s token-set
  * membership is fine for dozens of words; a 10k-phrase gazetteer
  * through per-term regex/LIKE pays O(terms) per document — the
  * automaton pays it once, at build time, on the driver).
  *
  * The automaton is built once from the bounded dictionary (gazetteers
  * are vocabulary-sized by nature) and ships to executors by closure
  * broadcast, exactly like a tokenizer vocab. The per-row traversal is
  * a documented per-bounded-row imperative kernel (the packing-fold /
  * codec rule) — an automaton has no codegen'd expression form.
  *
  * Match semantics (pinned for the oracle): case-sensitive substring
  * occurrences, ALL of them including overlapping and nested ones (the
  * automaton's dict-suffix links emit every term ending at every
  * position). Counts and first match offsets replay in SQL as
  * per-position substring equality — O(chars × terms) for the oracle,
  * which is the whole point of not shipping that plan.
  */
object Gazetteer {

  /** Immutable Aho–Corasick automaton over `terms`. Transitions are
    * per-node SORTED char arrays walked by binary search — primitive
    * array probes, no boxing, no hashing, nothing allocated per
    * character. (An earlier build used `Map[Char, Int]` per node; at
    * 100 TB of characters the box-and-hash constant dominated the
    * scan, so the hot representation is dense.)
    */
  final class Automaton private (
      val terms: Array[String],
      gotoChars: Array[Array[Char]],
      gotoTargets: Array[Array[Int]],
      fail: Array[Int],
      emits: Array[Array[Int]]) extends Serializable {

    /** Target of the goto edge labelled `c` out of node `s`, or -1:
      * binary search over the node's sorted edge labels (gazetteer
      * nodes have few out-edges, so the search is 1-5 probes).
      */
    private def step(s: Int, c: Char): Int = {
      val cs = gotoChars(s)
      var lo = 0
      var hi = cs.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mc = cs(mid)
        if (mc == c) return gotoTargets(s)(mid)
        else if (mc < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** Hit terms only, in first-hit order: `(term index, count, first
      * 0-based start offset)` — one left-to-right pass, and the result
      * assembly is O(matches), NOT O(|terms|): with a 10k-phrase
      * gazetteer over short documents, per-row |terms|-sized arrays
      * would dominate the scan ~100:1.
      *
      * Offsets are UTF-16 code-unit positions (`String.charAt`
      * indexing) — identical to codepoint positions for BMP-only text
      * (the committed corpora are ASCII); a supplementary-plane char
      * before a match would shift them versus a codepoint-indexing
      * engine (the cross-engine traps list).
      */
    def scanHits(text: String): Seq[(Int, Long, Int)] = {
      val hits = scala.collection.mutable.LinkedHashMap.empty[Int, (Long, Int)]
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var next = step(s, c)
        while (s != 0 && next < 0) { s = fail(s); next = step(s, c) }
        s = if (next >= 0) next else 0
        val out = emits(s)
        var j = 0
        while (j < out.length) {
          val t = out(j)
          val start = i - terms(t).length + 1
          hits.get(t) match {
            case Some((n, first)) => hits.update(t, (n + 1L, first))
            case None => hits.update(t, (1L, start))
          }
          j += 1
        }
        i += 1
      }
      hits.iterator.map { case (t, (n, first)) => (t, n, first) }.toSeq
    }

    /** Dense per-term (count, first-offset-or-−1) arrays — the
      * test-friendly view over [[scanHits]]; O(|terms|) by shape, so
      * use scanHits on serving paths.
      */
    def scan(text: String): (Array[Long], Array[Int]) = {
      val counts = new Array[Long](terms.length)
      val firsts = Array.fill(terms.length)(-1)
      scanHits(text).foreach { case (t, n, first) =>
        counts(t) = n; firsts(t) = first
      }
      (counts, firsts)
    }
  }

  object Automaton {
    /** Classic construction: trie + BFS failure links; each node's emit
      * set is its own terms plus its fail target's (dict-suffix
      * closure), so every occurrence is reported.
      */
    def apply(terms: Seq[String]): Automaton = {
      require(terms.nonEmpty, "dictionary must not be empty")
      require(terms.forall(_.nonEmpty), "dictionary terms must be non-empty")
      require(terms.distinct.length == terms.length,
        "dictionary terms must be distinct (duplicate counts would double)")
      val ts = terms.toArray
      val gotoB = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
      val emitB = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      ts.zipWithIndex.foreach { case (t, ti) =>
        var s = 0
        t.foreach { c =>
          s = gotoB(s).getOrElseUpdate(c, {
            gotoB += scala.collection.mutable.Map.empty[Char, Int]
            emitB += scala.collection.mutable.ArrayBuffer.empty[Int]
            gotoB.length - 1
          })
        }
        emitB(s) += ti
      }
      val n = gotoB.length
      val fail = new Array[Int](n)
      val queue = scala.collection.mutable.Queue.empty[Int]
      gotoB(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val r = queue.dequeue()
        gotoB(r).foreach { case (c, s) =>
          queue += s
          var f = fail(r)
          while (f != 0 && !gotoB(f).contains(c)) f = fail(f)
          fail(s) = if (gotoB(f).contains(c) && gotoB(f)(c) != s) gotoB(f)(c) else 0
          emitB(s) ++= emitB(fail(s)) // dict-suffix closure
        }
      }
      val gotoChars = new Array[Array[Char]](n)
      val gotoTargets = new Array[Array[Int]](n)
      var node = 0
      while (node < n) {
        val edges = gotoB(node).toArray.sortBy(_._1)
        gotoChars(node) = edges.map(_._1)
        gotoTargets(node) = edges.map(_._2)
        node += 1
      }
      new Automaton(ts, gotoChars, gotoTargets, fail,
        emitB.map(_.toArray).toArray)
    }
  }

  /** Per-(doc, term) match report: `(idCol, term, n_matches, first_pos)`
    * for terms with at least one occurrence (`first_pos` 0-based).
    * One narrow projection + explode — the corpus never shuffles to be
    * matched; callers aggregate downstream as usual.
    */
  def matchCounts(df: DataFrame, idCol: String, textCol: String,
                  terms: Seq[String]): DataFrame = {
    val auto = Automaton(terms)
    val scan = udf((text: String) =>
      auto.scanHits(Option(text).getOrElse(""))
        .map { case (t, n, first) => (auto.terms(t), n, first) })
    df.select(col(idCol), explode(scan(col(textCol))).as("__m"))
      .select(col(idCol), col("__m._1").as("term"),
        col("__m._2").as("n_matches"),
        col("__m._3").cast("long").as("first_pos"))
  }
}
