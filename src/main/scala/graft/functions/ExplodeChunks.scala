package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Split

/** SQL-exposed chunking as a Catalyst `Generator` (SURVEY.md §7.3's
  * optional `explode_chunks`): one text row → N chunk rows, usable as
  *
  * {{{
  *   SELECT doc_id, c.chunk_idx, c.chunk_start, c.chunk_text
  *   FROM docs LATERAL VIEW explode_chunks(text, 200, 150) c
  * }}}
  *
  * `mode` 'fixed' uses the stride window splitter, 'recursive' the
  * boundary splitter (stride is the overlap there). Registered by
  * [[ExplodeChunks.register]].
  */
case class ExplodeChunks(text: Expression, size: Expression, stride: Expression,
                         mode: String = "fixed")
    extends Generator with CodegenFallback {
  override def children: Seq[Expression] = Seq(text, size, stride)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("chunk_start", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  // size/stride are foldable, so their values are checked here at
  // analysis time: non-null, positive, and within Int range (a BIGINT
  // literal above Int.MaxValue would otherwise silently wrap via
  // intValue(), chunking with the wrong size).
  override def checkInputDataTypes(): TypeCheckResult =
    if (!(text.dataType == StringType &&
        Seq(size.dataType, stride.dataType).forall(t => t == IntegerType || t == LongType) &&
        size.foldable && stride.foldable))
      TypeCheckResult.TypeCheckFailure(
        "explode_chunks(text STRING, size INT literal, stride INT literal)")
    else (size.eval(), stride.eval()) match {
      case (null, _) | (_, null) =>
        TypeCheckResult.TypeCheckFailure("explode_chunks: size/stride must be non-null literals")
      case (s: Number, st: Number)
          if s.longValue() < 1 || s.longValue() > Int.MaxValue ||
             st.longValue() < 1 || st.longValue() > Int.MaxValue =>
        TypeCheckResult.TypeCheckFailure(
          s"explode_chunks: size/stride must be in [1, ${Int.MaxValue}], " +
            s"got (${s.longValue()}, ${st.longValue()})")
      // recursive mode's stride is the overlap, which Split.recursive
      // requires < size — fail analysis, not one exception per row
      case (s: Number, st: Number) if mode == "recursive" && st.longValue() >= s.longValue() =>
        TypeCheckResult.TypeCheckFailure(
          s"explode_chunks_recursive: overlap (stride) must be < size, " +
            s"got (size=${s.longValue()}, overlap=${st.longValue()})")
      case _ => TypeCheckResult.TypeCheckSuccess
    }

  @transient private lazy val sizeV: Int =
    size.eval().asInstanceOf[Number].intValue()
  @transient private lazy val strideV: Int =
    stride.eval().asInstanceOf[Number].intValue()

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Iterator.empty
    else {
      val chunks = mode match {
        case "recursive" => Split.recursive(t.asInstanceOf[UTF8String].toString, sizeV, strideV)
        case _           => Split.fixedWindow(t.asInstanceOf[UTF8String].toString, sizeV, strideV)
      }
      chunks.iterator.map(c =>
        InternalRow(c.idx, c.start, UTF8String.fromString(c.text)))
    }
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(text = cs(0), size = cs(1), stride = cs(2))
}

object ExplodeChunks {
  /** Register `explode_chunks` (fixed) and `explode_chunks_recursive`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def arity3(name: String)(es: Seq[Expression]): Seq[Expression] = {
      require(es.length == 3, s"$name requires exactly 3 arguments, got ${es.length}")
      es
    }
    reg.createOrReplaceTempFunction("explode_chunks",
      es => { val a = arity3("explode_chunks")(es); ExplodeChunks(a(0), a(1), a(2), "fixed") },
      "built-in")
    reg.createOrReplaceTempFunction("explode_chunks_recursive",
      es => { val a = arity3("explode_chunks_recursive")(es)
        ExplodeChunks(a(0), a(1), a(2), "recursive") },
      "built-in")
  }
}
