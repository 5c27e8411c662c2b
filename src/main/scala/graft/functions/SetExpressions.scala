package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Set-similarity kernels over SORTED string arrays.
  *
  * The dedup verify step computes jaccard for hundreds of thousands of
  * candidate pairs; the built-in composition
  * `size(array_intersect(a,b)) / size(array_union(a,b))` allocates two
  * hash sets and two result arrays per row. A single merge scan over
  * pre-sorted arrays computes the identical value with zero allocation —
  * `array_sort` uses UTF8String's binary ordering, the same comparator
  * this scan uses, so sortedness is preserved end to end.
  */
object SetKernels {
  /** Jaccard |A∩B| / |A∪B| of two sorted, de-duplicated UTF8String
    * arrays. Empty∩empty yields NaN (a total function — the ANSI
    * built-in composition would throw DIVIDE_BY_ZERO there); callers
    * filter `>= t`, which drops NaN.
    */
  def jaccardSorted(x: ArrayData, y: ArrayData): Double = {
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (nx + ny - inter)
  }
}

/** `jaccard_sorted(a, b)`: exact Jaccard similarity of two sorted
  * de-duplicated ARRAY<STRING> columns via [[SetKernels.jaccardSorted]].
  * Codegen emits a static kernel call, so the expression stays inside
  * whole-stage codegen with no per-row allocation.
  */
case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "jaccard_sorted"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<STRING> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetKernels.jaccardSorted($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object SetFunctions {
  /** Column API for [[JaccardSorted]] — both inputs MUST be sorted
    * (e.g. `array_sort(...)`) and de-duplicated.
    */
  def jaccardSorted(a: Column, b: Column): Column =
    ColumnShim.column(JaccardSorted(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Register `jaccard_sorted` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sorted", es => {
        // report wrong arity with a clear analysis-time message, not an
        // IndexOutOfBounds from inside the builder
        require(es.length == 2,
          s"jaccard_sorted requires exactly 2 arguments, got ${es.length}")
        JaccardSorted(es(0), es(1))
      }, "built-in")
}
