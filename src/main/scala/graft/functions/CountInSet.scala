package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements that belong to a fixed (driver-known) word
  * set — the stopword-hit counter under language ID and quality scoring.
  *
  * The composable form — `size(filter(toks, t -> t.isInCollection(ws)))`
  * — interprets a lambda per TOKEN per WORD LIST outside whole-stage
  * codegen; language ID runs five lists over every document, so the
  * curation pipelines pay ~5·tokens interpreted calls per doc at their
  * very first gate. This expression is one hash-set probe per token,
  * inside codegen.
  *
  * Identical semantics to the twin ([[graft.operators.TextAnalysis
  * .stopwordCountHof]], spec-pinned): null ARRAY → null (the HOF chain
  * null-propagates); null ELEMENTS are not counted (`isInCollection`
  * yields null → the filter lambda is not-true); count is a LongType
  * (the twin casts its int size).
  */
case class CountInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"count_in_set requires array<string> input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  // the probe set, built once per expression instance (not per row);
  // java.util.HashSet keyed on UTF8String (its hashCode/equals are
  // byte-wise, matching string equality semantics for the ASCII lists)
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      CountInSet.count(input.asInstanceOf[ArrayData], set))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set,
      classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CountInSet.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CountInSet {

  /** Static seam shared by eval and codegen (identical arithmetic). */
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null && set.contains(t)) c += 1
      i += 1
    }
    c
  }

  /** Column-API entry point. */
  def countInSet(toks: Column, words: Seq[String]): Column =
    ColumnBridge.column(CountInSet(ColumnBridge.expression(toks), words))
}
