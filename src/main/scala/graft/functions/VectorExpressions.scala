package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Interpreted float-vector kernels shared by eval and tests.
  *
  * Distance semantics mirror the reference's vector-store metrics
  * (`COSINE | EUCLIDEAN_DISTANCE | DOT_PRODUCT`, reference
  * `src/common/schema.py:18`; searched via OracleVS at
  * `src/server/agents/chatbot.py:183`), re-expressed as codegen'd
  * Catalyst expressions over `ARRAY<FLOAT>` columns. Accumulation is
  * in double precision regardless of the float storage type so results
  * are stable and oracle-checkable.
  */
object VectorKernels {
  def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble; val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var i = 0
    while (i < n) { d += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    d
  }
  def euclidean(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble; s += d * d; i += 1
    }
    math.sqrt(s)
  }
}

/** Base for binary `ARRAY<FLOAT> -> DOUBLE` vector expressions.
  *
  * Null handling: a null ARRAY input yields null (BinaryExpression's
  * null-safe contract); null *elements* inside the arrays are read as
  * 0.0f (primitive access) — embeddings produced by this engine
  * (UnsafeArrayData from primitive float[]) never contain null elements,
  * and external stores should be ingested with `containsNull = false`.
  */
abstract class BinaryVectorExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** Cosine similarity (not distance): dot(x,y)/sqrt(|x|^2*|y|^2); 0.0 for a zero vector. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "cosine_similarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n) = (ctx.freshName("i"), ctx.freshName("n"))
      val (dot, nx, ny) = (ctx.freshName("dot"), ctx.freshName("nx"), ctx.freshName("ny"))
      val (xv, yv) = (ctx.freshName("xv"), ctx.freshName("yv"))
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $dot = 0.0, $nx = 0.0, $ny = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        double $xv = $a.getFloat($i); double $yv = $b.getFloat($i);
        $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
      }
      ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotProductF(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "dot_product"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, d) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("d"))
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $d = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        $d += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
      }
      ${ev.value} = $d;
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class EuclideanDistance(left: Expression, right: Expression) extends BinaryVectorExpression {
  override def prettyName: String = "euclidean_distance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.euclidean(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, s, d) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("d"))
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      double $s = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        double $d = ((double) $a.getFloat($i)) - ((double) $b.getFloat($i));
        $s += $d * $d;
      }
      ${ev.value} = java.lang.Math.sqrt($s);
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-level API for the vector expressions (no registry needed). */
object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarity(ColumnShim.expression(a), ColumnShim.expression(b)))
  def dotProduct(a: Column, b: Column): Column =
    ColumnShim.column(DotProductF(ColumnShim.expression(a), ColumnShim.expression(b)))
  def euclidean(a: Column, b: Column): Column =
    ColumnShim.column(EuclideanDistance(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Score column for a metric name, mirroring the reference's metric enum. */
  def score(metric: String)(a: Column, b: Column): Column = metric match {
    case "COSINE"             => cosineSim(a, b)
    case "DOT_PRODUCT"        => dotProduct(a, b)
    case "EUCLIDEAN_DISTANCE" => euclidean(a, b)
    case other                => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** Register SQL names so the operators are usable from spark.sql too. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity", es => CosineSimilarity(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product_f", es => DotProductF(es.head, es(1)), "built-in")
    reg.createOrReplaceTempFunction("euclidean_distance", es => EuclideanDistance(es.head, es(1)), "built-in")
  }
}
