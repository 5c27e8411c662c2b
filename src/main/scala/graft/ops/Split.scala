package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text splitters — the reference's signature segmentation operators
  * (SURVEY.md §2.7; `src/server/utils/embedding.py:92-153`).
  *
  * [[fixedWindow]] is the stride-based splitter (SQL-expressible, so it is
  * the oracle-checked variant); [[recursive]] re-expresses the
  * RecursiveCharacterTextSplitter semantics: split on
  * paragraph → line → word boundaries until pieces fit `size`, then pack
  * greedily with `overlap` carry-over and a recorded start index
  * (`add_start_index`, reference `embedding.py:118-124`). Both are pure
  * functions of the text — property-testable with no Spark involved —
  * and surface as a `flatMap`-shaped DataFrame operator ([[chunkDocs]]).
  */
object Split {

  /** One chunk: 0-based index, char start offset in the source, text. */
  case class TextChunk(idx: Int, start: Int, text: String)

  /** Chunks of `size` chars every `stride` chars; trailing partial kept. */
  def fixedWindow(text: String, size: Int, stride: Int): Seq[TextChunk] = {
    require(size > 0 && stride > 0)
    if (text == null || text.isEmpty) Seq.empty
    else (0 until text.length by stride).zipWithIndex.map { case (off, i) =>
      TextChunk(i, off, text.substring(off, math.min(off + size, text.length)))
    }
  }

  /** Recursive boundary splitter. Pieces are built by splitting on the
    * first separator that makes every piece fit `size` (descending
    * priority `seps`, hard char cut as last resort; separators stay with
    * the preceding piece so offsets are exact). Pieces then pack greedily
    * into chunks of at most `size` chars, and each next chunk re-starts
    * at the latest piece boundary within `overlap` chars of the previous
    * chunk's end.
    *
    * Invariants (property-tested): chunk length <= size whenever the text
    * is splittable at that granularity; `start` is the true offset of the
    * chunk in `text`; consecutive chunks advance by at least one piece.
    */
  def recursive(text: String, size: Int, overlap: Int,
                seps: Seq[String] = Seq("\n\n", "\n", " ")): Seq[TextChunk] = {
    require(size > 0 && overlap >= 0 && overlap < size)
    if (text == null || text.isEmpty) return Seq.empty

    def atomize(start: Int, end: Int, sepIdx: Int): Vector[(Int, Int)] = {
      if (end - start <= size) Vector((start, end))
      else if (sepIdx >= seps.length)
        (start until end by size).map(i => (i, math.min(i + size, end))).toVector
      else {
        val sep = seps(sepIdx)
        val pieces = Vector.newBuilder[(Int, Int)]
        var cur = start
        var i = text.indexOf(sep, start)
        while (i >= 0 && i + sep.length <= end) {
          pieces += ((cur, i + sep.length)); cur = i + sep.length
          i = text.indexOf(sep, cur)
        }
        if (cur < end) pieces += ((cur, end))
        val ps = pieces.result()
        if (ps.length <= 1) atomize(start, end, sepIdx + 1)
        else ps.flatMap { case (s, e) =>
          if (e - s <= size) Vector((s, e)) else atomize(s, e, sepIdx + 1)
        }
      }
    }

    val atoms = atomize(0, text.length, 0)
    val out = Seq.newBuilder[TextChunk]
    var i = 0
    var idx = 0
    while (i < atoms.length) {
      var j = i
      var end = atoms(i)._2
      while (j + 1 < atoms.length && atoms(j + 1)._2 - atoms(i)._1 <= size) {
        j += 1; end = atoms(j)._2
      }
      out += TextChunk(idx, atoms(i)._1, text.substring(atoms(i)._1, end))
      idx += 1
      if (j + 1 >= atoms.length) i = atoms.length
      else {
        var k = j + 1
        while (k - 1 > i && end - atoms(k - 1)._1 <= overlap) k -= 1
        i = k
      }
    }
    out.result()
  }

  /** Splitter as a DataFrame operator: one input row → N chunk rows with
    * the reference's metadata-id scheme (`{id}_{idx+1}`, 1-based —
    * `embedding.py:86`). The splitter closure runs per-row inside the
    * executors (flatMap shape via explode).
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                splitter: String => Seq[TextChunk]): DataFrame = {
    val splitUdf = udf(splitter)
    df.withColumn("__chunk", explode(splitUdf(col(textCol))))
      .select(
        col(idCol),
        col("__chunk.idx").cast("long").as("chunk_idx"),
        col("__chunk.start").cast("long").as("chunk_start"),
        col("__chunk.text").as("chunk_text"),
        concat(col(idCol).cast("string"), lit("_"), (col("__chunk.idx") + 1).cast("string")).as("chunk_id"))
  }

  /** Content-derived chunk key for idempotent merges (the reference keys
    * its merge on a content-derived ID, `embedding.py:264-266`).
    */
  def contentKey(chunkText: Column): Column = md5(chunkText.cast("binary"))

  /** Sentence-boundary chunking — the testbed's KB splitter shape
    * (llama-index SentenceSplitter(chunk_size=2048),
    * `src/server/utils/testbed.py:241-243`): the recursive splitter with
    * sentence-first separators.
    */
  def sentences(text: String, size: Int = 2048, overlap: Int = 0): Seq[TextChunk] =
    recursive(text, size, overlap, Seq(". ", "! ", "? ", "\n", " "))

  /** Pluggable tokenizer for token-counted splitting (the length function
    * of the reference's tiktoken mode, `embedding.py:108-116`).
    */
  trait Tokenizer extends Serializable {
    def tokenize(text: String): Seq[String]
    def count(text: String): Int = tokenize(text).length
  }

  /** Whitespace tokens — the coarse stand-in [[tokenWindows]] uses. */
  object WhitespaceTokenizer extends Tokenizer {
    def tokenize(text: String): Seq[String] =
      text.trim.split("\\s+").filter(_.nonEmpty).toSeq
  }

  /** Deterministic byte-pair tokenizer over a fixed tiny merge table —
    * real BPE inference (repeatedly merge the highest-priority adjacent
    * symbol pair) with a hand-fixed vocabulary of frequent English pairs
    * standing in for a learned one, so token counts are subword-shaped
    * (≥ words, ≤ characters) and bit-deterministic with no model file.
    */
  object BpeTokenizer extends Tokenizer {
    // order = merge priority (highest first), the shape of a BPE ranks file
    private val merges = Seq(
      "t" -> "h", "th" -> "e", "i" -> "n", "e" -> "r", "a" -> "n", "r" -> "e",
      "o" -> "n", "a" -> "t", "e" -> "n", "n" -> "d", "t" -> "i", "e" -> "s",
      "o" -> "r", "a" -> "r", "te" -> "r", "a" -> "l", "s" -> "t", "in" -> "g",
      "o" -> "u", "q" -> "u", "c" -> "h", "e" -> "d", "o" -> "f", "i" -> "s")
    private val rank: Map[(String, String), Int] = merges.zipWithIndex.toMap
    def tokenize(text: String): Seq[String] =
      WhitespaceTokenizer.tokenize(text).flatMap(bpeWord)
    private[graft] def bpeWord(w: String): Seq[String] = {
      var syms = w.map(_.toString).toVector
      var done = syms.length <= 1
      while (!done) {
        val best = syms.indices.dropRight(1)
          .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
          .minOption
        best match {
          case Some((_, i)) => syms = syms.patch(i, Seq(syms(i) + syms(i + 1)), 2)
          case None         => done = true
        }
        if (syms.length <= 1) done = true
      }
      syms
    }
  }

  /** Token-*measured* chunking through a pluggable [[Tokenizer]]: pack
    * whole whitespace words greedily while the chunk's tokenizer count
    * stays ≤ `maxTokens`, then restart the next chunk carrying back up to
    * `overlapTokens` tokens' worth of trailing words — the honest version
    * of the reference's `CharacterTextSplitter.from_tiktoken_encoder`
    * (split on separators, measure in tokens). A single word whose own
    * token count exceeds `maxTokens` is emitted alone (as the reference's
    * splitter emits oversized pieces). `start` is the exact char offset.
    */
  def tokenPack(text: String, maxTokens: Int, overlapTokens: Int = 0,
                tokenizer: Tokenizer = BpeTokenizer): Seq[TextChunk] = {
    require(maxTokens > 0 && overlapTokens >= 0 && overlapTokens < maxTokens)
    if (text == null || text.isEmpty) return Seq.empty
    val m = java.util.regex.Pattern.compile("\\S+").matcher(text)
    val words = scala.collection.mutable.ArrayBuffer[(Int, String)]()
    while (m.find()) words += ((m.start(), m.group()))
    if (words.isEmpty) return Seq.empty
    val costs = words.map { case (_, w) => math.max(1, tokenizer.count(w)) }
    val out = Seq.newBuilder[TextChunk]
    var i = 0
    var idx = 0
    while (i < words.length) {
      var j = i
      var tok = costs(i)
      while (j + 1 < words.length && tok + costs(j + 1) <= maxTokens) { j += 1; tok += costs(j) }
      val start = words(i)._1
      val end = words(j)._1 + words(j)._2.length
      out += TextChunk(idx, start, text.substring(start, end))
      idx += 1
      if (j + 1 >= words.length) i = words.length
      else {
        var k = j + 1
        var carry = 0
        // admit trailing words while the carried token budget holds; the
        // admitted word after the decrement is costs(k), not costs(k-1)
        while (k - 1 > i && carry + costs(k - 1) <= overlapTokens) { k -= 1; carry += costs(k) }
        i = k
      }
    }
    out.result()
  }

  /** Token-counted chunking (the reference's
    * `CharacterTextSplitter.from_tiktoken_encoder` mode,
    * `embedding.py:108-116`, with whitespace tokens standing in for the
    * tokenizer — [[tokenPack]] is the subword-measured variant): windows
    * of `maxTokens` tokens advancing by `maxTokens - overlapTokens`.
    * `start` is the 0-based token offset.
    */
  def tokenWindows(text: String, maxTokens: Int, overlapTokens: Int = 0): Seq[TextChunk] = {
    require(maxTokens > 0 && overlapTokens >= 0 && overlapTokens < maxTokens)
    val toks = text.trim.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) Seq.empty
    else {
      val stride = maxTokens - overlapTokens
      (0 until toks.length by stride).zipWithIndex.map { case (off, i) =>
        TextChunk(i, off, toks.slice(off, math.min(off + maxTokens, toks.length)).mkString(" "))
      }
    }
  }

  /** Chunk consolidation — the splitters' inverse half: greedily merge a
    * document's ADJACENT small chunks (in `ordCol` order) into groups of
    * at most `targetChars` constituent characters, starting a new group
    * when the next chunk would overflow it. Over-sized single chunks get
    * a group of their own (never split — splitting is the splitters'
    * job). The RAG consolidation step for fragmented sources: tiny
    * sentence/section chunks merged back to context-sized units before
    * embedding, preserving order. Returns `(docCol, group, text,
    * n_chunks, n_chars)` — `group` 1-based per doc, `text` the chunks
    * joined with `sep`, `n_chars` the constituent-length sum (separators
    * excluded, so the grouping invariant is checkable from the output).
    *
    * Greedy packing is inherently sequential per document, so this is
    * one `flatMapGroups` over doc-keyed groups (documents are bounded —
    * the legitimate per-group imperative case): one exchange on the doc
    * key, O(chunks) work, nothing corpus-sized in memory.
    */
  def coalesceChunks(chunks: DataFrame, docCol: String, ordCol: String,
                     textCol: String, targetChars: Int,
                     sep: String = "\n\n"): DataFrame = {
    require(targetChars >= 1, s"targetChars must be >= 1 (got $targetChars)")
    // doc/ord ids stay their ORIGINAL types (string/UUID doc ids are
    // first-class, as in every other generic-id operator here): group
    // with groupBy on the untouched doc column, order by sort_array over
    // (ord, text) structs — deterministic for any orderable ord type —
    // and run the greedy pack imperatively over the per-doc array (docs
    // are bounded, so the collected list is too).
    val packUdf = udf { (texts: Seq[String]) =>
      val out = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
      var grp = 1L
      var cum = 0L
      var cnt = 0L
      var buf = scala.collection.mutable.ArrayBuffer[String]()
      def flush(): Unit = if (cnt > 0) {
        out += ((grp, buf.mkString(sep), cnt, cum))
        grp += 1; cum = 0L; cnt = 0L; buf = scala.collection.mutable.ArrayBuffer[String]()
      }
      texts.foreach { t =>
        if (cnt > 0 && cum + t.length > targetChars) flush()
        buf += t; cum += t.length; cnt += 1
      }
      flush()
      out
    }
    chunks
      .groupBy(col(docCol))
      .agg(sort_array(collect_list(struct(
        col(ordCol).as("o"), coalesce(col(textCol), lit("")).as("t"))))
        .as("__sorted"))
      .select(col(docCol),
        explode(packUdf(transform(col("__sorted"), s => s.getField("t"))))
          .as("__g"))
      .select(col(docCol), col("__g._1").as("group"), col("__g._2").as("text"),
        col("__g._3").as("n_chunks"), col("__g._4").as("n_chars"))
  }
}
