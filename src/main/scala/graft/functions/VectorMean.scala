package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Per-element mean of an `ARRAY<FLOAT>` column as ONE aggregate
  * expression — the dim-scalable replacement for a `dim`-wide fan-out of
  * `avg(col[i])` expressions (one aggregate per element strains the
  * planner and falls out of codegen at production embedding dims of
  * 1,024-4,096; this buffer is a single `2·dim`-double array whatever
  * the dim).
  *
  * Semantics are BIT-IDENTICAL to the fan-out it replaces (spec'd in
  * IvfFitSpec): per element, `sum(double(x_i)) / count(non-null x_i)` —
  * null elements and short arrays skip both the sum and the count for
  * their positions (exactly `avg`'s per-element null-skipping on ragged
  * arrays), a NULL array contributes nothing, and a position with no
  * contributions evaluates to NULL. Partial aggregation runs map-side,
  * so the shuffle carries one `(2·dim doubles)` buffer per group per
  * partition — the same k×dim volume as the fan-out, with O(1)
  * expressions.
  */
case class VectorMean(child: Expression, dim: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {
  require(dim >= 1, s"dim must be >= 1 (got $dim)")

  override def prettyName: String = "vector_mean"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_mean requires ARRAY<FLOAT>, got ${other.catalogString}")
  }

  // buffer layout: [0, dim) element sums, [dim, 2*dim) element counts
  override def createAggregationBuffer(): Array[Double] = new Array[Double](2 * dim)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), dim)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          buf(i) += arr.getFloat(i).toDouble
          buf(dim + i) += 1.0
        }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 2 * dim) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      out(i) = if (buf(dim + i) > 0.0) java.lang.Double.valueOf(buf(i) / buf(dim + i)) else null
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorMean =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorMean =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorMean =
    copy(child = c)
}

object VectorMean {
  def vectorMean(v: Column, dim: Int): Column =
    ColumnShim.column(VectorMean(ColumnShim.expression(v), dim)
      .toAggregateExpression())
}
