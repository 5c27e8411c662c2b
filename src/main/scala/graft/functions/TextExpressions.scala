package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.hashing.MurmurHash3

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

object SimHash64 {
  /** Deterministic 64-bit token hash from two seeded 32-bit murmurs. */
  def hash64(tok: String): Long =
    (MurmurHash3.stringHash(tok, 0x9747b28c).toLong << 32) |
      (MurmurHash3.stringHash(tok, 0x85ebca6b).toLong & 0xffffffffL)

  def simhash64(tokens: Column): Column =
    ColumnShim.column(SimHash64(ColumnShim.expression(tokens)))

  /** Hamming distance between two 64-bit fingerprints as a Column. */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
}
