package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String



/** 64-bit SimHash over a token array: per token a 64-bit hash votes +1/-1
  * on each bit position; the fingerprint sets the bits with positive vote.
  * Near-identical documents differ in a few bits (small Hamming distance),
  * so near-dup detection becomes a cheap integer-distance comparison —
  * the classic web-scale dedup fingerprint.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.get(i, StringType).asInstanceOf[UTF8String].toString
        val h = SimHash64.hash64(tok)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pass distinct word n-grams: `STRING -> ARRAY<STRING>` in one
  * imperative scan — replaces the `split`/`sequence`/`transform`/`slice`/
  * `array_distinct` composition whose interpreted evaluation dominated the
  * dedup operators. Tokenization replicates Spark's `split(text, "\\s+")`
  * exactly (Java regex split with limit -1): a leading whitespace run
  * yields a leading empty token and a trailing run a trailing empty token
  * — property-tested equal to the native composition.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {
  require(n > 0)
  override def prettyName: String = "word_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires STRING, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = WordNGrams.splitWs(text)
    if (toks.length < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    val sb = new java.lang.StringBuilder()
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString): Unit
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordNGrams {
  /** Exactly the regex `\s` class (NOT Character.isWhitespace, which is
    * a wider Unicode set).
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Java `text.split("\\s+", -1)`-equivalent whitespace tokenizer. */
  def splitWs(text: String): Array[String] = {
    if (text.isEmpty) return Array("")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val len = text.length
    var tokenStart = 0
    while (i < len) {
      if (isWs(text.charAt(i))) {
        out += text.substring(tokenStart, i)
        while (i < len && isWs(text.charAt(i))) i += 1
        tokenStart = i
      } else i += 1
    }
    out += text.substring(tokenStart, len)
    out.toArray
  }

  def wordNGrams(text: Column, n: Int): Column =
    ColumnShim.column(WordNGrams(ColumnShim.expression(text), n))
}

/** Single-pass MinHash banding: from a shingle array straight to the LSH
  * band-key array. One imperative pass computes all `numHashes` seeded
  * minima, then renders each band of `numHashes/bands` signature values
  * as its comma-joined decimal string (the band's bucket key — INJECTIVE
  * in the signature slice, so band-bucket collisions between different
  * signatures cannot exist by construction).
  *
  * The hash family is ENGINE-PORTABLE by design (the [[SimHash64.hash64]]
  * / SRP-plane discipline extended to MinHash): per hash function `j`,
  *
  *   h_j(s) = (a_j · x(s) + b_j) mod P,   P = 2³¹ − 1 (Mersenne prime)
  *   x(s)   = u64(md5(s)[0:8]) mod P
  *   a_j    = 1 + u64(md5("minhash-a:" + j)[0:8]) mod (P − 1)
  *   b_j    = u64(md5("minhash-b:" + j)[0:8]) mod P
  *
  * Every operand is < 2³¹, so a_j·x + b_j < 2⁶³ — plain BIGINT
  * arithmetic with NO u64 overflow wrap, which is exactly what DuckDB
  * (whose checked UBIGINT multiply refuses to wrap) can replay: the
  * oracle regenerates signatures, band keys, and candidate pairs
  * bit-for-bit from `md5()` + integer ops. This is what turned
  * `dedup_minhash_lsh` from rows-only into hash-checked; the murmur-fmix
  * mixing it replaces was unportable precisely because it relied on
  * wrapping u64 multiplies.
  *
  * Still one imperative pass (the `transform`/`array_min` composition is
  * interpreted and re-evaluated per reference after projection collapse
  * — measured 15× slower at sf0.1); the per-shingle cost is unchanged
  * (one md5 + numHashes mod-muls).
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires ARRAY<STRING>, got ${other.catalogString}")
  }
  private val as: Array[Long] = Array.tabulate(numHashes)(MinHashBands.aParam)
  private val bs: Array[Long] = Array.tabulate(numHashes)(MinHashBands.bParam)
  override protected def nullSafeEval(input: Any): Any = {
    val P = MinHashBands.P
    val arr = input.asInstanceOf[ArrayData]
    // sentinel P is outside the hash range [0, P) — an empty shingle set
    // yields the all-P signature (callers drop shingle-less docs before
    // banding; the sentinel keeps the encoding total regardless)
    val sig = Array.fill(numHashes)(P)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = java.lang.Long.remainderUnsigned(
          SimHash64.hash64(arr.get(i, StringType).asInstanceOf[UTF8String].toString), P)
        var j = 0
        while (j < numHashes) {
          val h = (as(j) * x + bs(j)) % P
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    val r = numHashes / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val sb = new java.lang.StringBuilder(r * 11)
      var k = 0
      while (k < r) {
        if (k > 0) sb.append(',')
        sb.append(sig(b * r + k))
        k += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashBands {
  /** The Mersenne prime 2³¹ − 1 — the universal-hash modulus. */
  val P: Long = 2147483647L
  /** Multiplier of hash function `j`, in [1, P−1] — md5-derived, so any
    * SQL engine recomputes it as
    * `1 + ('0x'||substr(md5('minhash-a:'||j),1,16))::UBIGINT % (P−1)`.
    */
  def aParam(j: Int): Long =
    1L + java.lang.Long.remainderUnsigned(SimHash64.hash64(s"minhash-a:$j"), P - 1)
  /** Offset of hash function `j`, in [0, P−1] — md5-derived likewise. */
  def bParam(j: Int): Long =
    java.lang.Long.remainderUnsigned(SimHash64.hash64(s"minhash-b:$j"), P)
  def minhashBands(shingles: Column, numHashes: Int, bands: Int): Column =
    ColumnShim.column(MinHashBands(ColumnShim.expression(shingles), numHashes, bands))
}

object SimHash64 {
  private val mdPool = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Deterministic ENGINE-PORTABLE 64-bit token hash: the first 8 bytes
    * of md5(utf8(token)), big-endian — i.e. the integer any SQL engine
    * spells `('0x' || substr(md5(tok), 1, 16))::UBIGINT`. Chosen over a
    * murmur mix precisely for that portability: it makes the SimHash
    * fingerprint (and every pair set derived from it) recomputable
    * bit-for-bit by the DuckDB oracle, turning the whole SimHash family
    * from rows-only into hash-checked. md5 per token costs ~2× a murmur
    * in the (CodegenFallback, already interpreter-bound) fingerprint
    * pass — invisible next to the banding join it feeds.
    */
  def hash64(tok: String): Long = {
    val md = mdPool.get()
    md.reset()
    val d = md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d, 0, 8).getLong
  }

  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))

  /** [[hash64]] as a scalar Column over a STRING — the one ENGINE-
    * PORTABLE 64-bit hash primitive (md5 first 8 bytes, big-endian,
    * two's-complement signed) every sketch here derives from.
    */
  def md5Prefix64(text: Column): Column =
    ColumnShim.column(Md5Prefix64(ColumnShim.expression(text)))

  /** Hamming distance between two 64-bit fingerprints as a Column. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
}

/** Scalar [[SimHash64.hash64]]: the first 8 bytes of md5(utf8(text)) as
  * a signed 64-bit integer — the u64 any SQL engine spells
  * `('0x' || substr(md5(x), 1, 16))::UBIGINT`, reinterpreted as two's
  * complement. The single portable hash primitive behind SimHash,
  * MinHash, SRP, and the HLL registers.
  */
case class Md5Prefix64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "md5_prefix64"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix64 requires STRING, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hash64(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Canonical text normalization for training corpora: Unicode NFC
  * composition (é as one codepoint however the source encoded it),
  * SIMPLE per-codepoint lowercase (`Character.toLowerCase` — the
  * locale-free 1:1 mapping utf8proc/DuckDB `lower()` also applies, so
  * İ→i and Σ→σ with no full/contextual mappings on either side), and
  * whitespace-run collapse to single spaces with ends trimmed. The
  * collapsed class is EXPLICITLY `[\t\n\f\r ]` — RE2's `\s` (Java's
  * `\s` additionally matches U+000B; the oracle therefore spells the
  * class out rather than writing `\s`). One imperative pass after NFC;
  * DuckDB expresses the same `STRING -> STRING` shape as
  * `trim(regexp_replace(lower(nfc_normalize(x)), '[\t\n\f\r ]+', ' ',
  * 'g'))`, which is what makes the query oracle-checkable cross-engine.
  */
case class NormalizeText(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "normalize_text"
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires STRING, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    var pendingSpace = false
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      // the explicit [\t\n\f\r ] class — NOT \s (the engines disagree
      // on U+000B); Unicode spaces like U+00A0 deliberately stay
      val ws = cp == ' ' || cp == '\t' || cp == '\n' ||
        cp == '\f' || cp == '\r'
      if (ws) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        // simple codepoint mapping = DuckDB/utf8proc lower() semantics
        sb.appendCodePoint(Character.toLowerCase(cp))
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object NormalizeText {
  def normalizeText(text: Column): Column =
    ColumnShim.column(NormalizeText(ColumnShim.expression(text)))
}

/** Single-pass word n-grams WITH duplicates: `ARRAY<STRING> ->
  * ARRAY<STRING>` — the non-deduping twin of [[WordNGrams]] for the
  * counting operators (BLEU/chrF modified precision, n-gram LMs,
  * distinct-n diversity ratios), where gram MULTIPLICITY is the
  * statistic. Replicates the
  * `transform(sequence(1, size-(n-1)), i => array_join(slice(toks, i, n), " "))`
  * composition exactly — including `array_join`'s null handling (a null
  * element is skipped along with its separator) — but in one imperative
  * scan: the HOF composition is interpreted (CodegenFallback lambdas,
  * re-evaluated per element) and measured as the dominant job of the
  * gram-counting queries at sf0.1 (round-18 opt). Callers guard
  * `size(toks) >= n` (and the null array) outside, as
  * [[graft.ops.TextAnalysis.wordGrams]] always has.
  */
case class WordNGramsAll(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {
  require(n > 0)
  override def prettyName: String = "word_ngrams_all"
  // containsNull = true to match the transform/array_join composition's
  // element nullability — downstream schemas must not change
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams_all requires ARRAY<STRING>, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null
        else arr.get(i, StringType).asInstanceOf[UTF8String]
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var j = 0
      var first = true
      while (j < n) {
        val t = toks(i + j)
        if (t != null) { // array_join skips nulls AND their separators
          if (!first) sb.append(' ')
          sb.append(t.toString)
          first = false
        }
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object WordNGramsAll {
  def wordNGramsAll(toks: Column, n: Int): Column =
    ColumnShim.column(WordNGramsAll(ColumnShim.expression(toks), n))
}

/** Single-pass character n-grams WITH duplicates: `STRING ->
  * ARRAY<STRING>` — replaces the
  * `transform(sequence(1, length-(n-1)), i => substr(s, i, n))`
  * composition (interpreted HOF — see [[WordNGramsAll]]) with one
  * imperative code-point scan. Windows are code-point windows, exactly
  * as Spark's `length`/`substr` count characters, supplementary
  * characters included. Callers guard `length(s) >= n` outside.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {
  require(n > 0)
  override def prettyName: String = "char_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_ngrams requires STRING, got ${other.catalogString}")
  }
  override protected def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    if (cps.length < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cps.length - n + 1)
    var i = 0
    while (i <= cps.length - n) {
      out(i) = UTF8String.fromString(new String(cps, i, n))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CharNGrams {
  def charNGrams(s: Column, n: Int): Column =
    ColumnShim.column(CharNGrams(ColumnShim.expression(s), n))
}
