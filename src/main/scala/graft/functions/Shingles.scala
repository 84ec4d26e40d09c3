package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram shingling of a token array: element i is
  * `tokens[i..i+n-1]` joined with single spaces; empty array when the doc
  * has fewer than n tokens; null in → null out.
  *
  * Why native: the composable form —
  * `transform(sequence(1, size-n+1), i -> array_join(slice(toks, i, n)))`
  * — interprets three nested lambdas per SHINGLE (sequence element →
  * slice allocation → join), outside whole-stage codegen. Shingling sits
  * under every MinHash/Jaccard/decontamination pipeline, so at corpus
  * scale those interpreted allocations are a measurable fraction of the
  * scan. This expression emits the windows in one pass; each shingle is
  * one `UTF8String.concatWs` (which skips null elements exactly like
  * `array_join` without a null replacement — tokenizers never produce
  * null tokens, but the twin must agree on adversarial arrays too).
  *
  * Spec-pinned byte-identical to the HOF twin
  * ([[graft.operators.Dedup.shinglesHof]]); the DuckDB oracles replay the
  * same `array_to_string(w[i:i+n-1], ' ')` arithmetic.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles requires array<string> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Shingles.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles {

  private val Space = UTF8String.fromString(" ")

  /** Static seam shared by eval and codegen (identical arithmetic). */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val t = arr.numElements()
    if (t < n) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](t - n + 1)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i <= t - n) {
      var j = 0
      while (j < n) {
        window(j) = arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, window: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def shingles(toks: Column, n: Int): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(toks), n))
}
