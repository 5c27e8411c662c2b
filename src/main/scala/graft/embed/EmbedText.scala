package graft.embed

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** V1 batch embedding as a Catalyst expression: `STRING -> ARRAY<FLOAT>`
  * through a pluggable [[Embedder]] (the reference embeds in batches of 500
  * through provider clients, `src/server/utils/embedding.py:306-338`; its
  * tests swap in a deterministic mock, `tests/server/test_endpoints_embed.py:98-112`).
  *
  * CodegenFallback is deliberate: the hashing/model call dominates, and a
  * per-row virtual call costs nothing relative to it. Output uses
  * UnsafeArrayData to avoid boxing the float vector.
  */
case class EmbedText(child: Expression, embedder: Embedder)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "embed_text"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(embedder.embed(input.toString))
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object EmbedText {
  /** Column API: `embedText($"text", HashEmbedder(64))`. */
  def embedText(c: Column, embedder: Embedder): Column =
    ColumnShim.column(EmbedText(ColumnShim.expression(c), embedder))
}
