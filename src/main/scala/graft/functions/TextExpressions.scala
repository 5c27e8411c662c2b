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
  * band-hash array. One imperative pass computes all `numHashes` seeded
  * minima (seed-mixed 64-bit murmur finalizer), then folds each band of
  * `numHashes/bands` signature values into one hash.
  *
  * This replaces the equivalent `transform`/`array_min` composition: the
  * higher-order functions are interpreted and get re-evaluated per
  * reference after projection collapse, turning O(shingles·hashes) into
  * O(shingles·hashes²) — measured 15× slower at sf0.1.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  override def prettyName: String = "minhash_bands"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands requires ARRAY<STRING>, got ${other.catalogString}")
  }
  private val seeds: Array[Long] =
    Array.tabulate(numHashes)(j => MinHashBands.fmix64(0x9e3779b97f4a7c15L * (j + 1)))
  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = SimHash64.hash64(arr.get(i, StringType).asInstanceOf[UTF8String].toString)
        var j = 0
        while (j < numHashes) {
          val h = MinHashBands.fmix64(base ^ seeds(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    val r = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L + b
      var k = 0
      while (k < r) { h = MinHashBands.fmix64(h ^ sig(b * r + k)); k += 1 }
      out(b) = h
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashBands {
  /** Murmur3 64-bit finalizer — the standard avalanche mix. */
  def fmix64(k0: Long): Long = {
    var h = k0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }
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

  /** Hamming distance between two 64-bit fingerprints as a Column. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
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
