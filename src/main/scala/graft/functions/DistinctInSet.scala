package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of DISTINCT members of a fixed (driver-known) word set that
  * appear in the array — the required-stopword presence probe of the
  * Gopher gate ([[graft.operators.TextAnalysis.withGopherQuality]]).
  *
  * The composable form — a per-word `array_contains` fold — scans the
  * token array once PER SET MEMBER: fine for the default 7-word list,
  * linear-in-list-size waste for the longer required-word lists real
  * gates use. This expression is ONE pass over the tokens: each token
  * probes a word→bit-index hash map and sets its bit in a bitmask;
  * the result is the popcount. [[CountInSet]] is the occurrence
  * counter (how many tokens are in the set); this is the presence
  * counter (how many set members have at least one token).
  *
  * Identical semantics to the twin ([[graft.operators.TextAnalysis
  * .stopHitsFold]], spec-pinned): null ARRAY → null (callers coalesce,
  * the Gopher convention); null ELEMENTS probe nothing (the fold's
  * `array_contains` never finds a word AT a null element); duplicate
  * `words` entries count once (the fold distincts them; the map keys
  * them once).
  */
case class DistinctInSet(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"distinct_in_set requires array<string> input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  // word → bit index, built once per expression instance (not per row);
  // sorted-distinct so the index assignment never depends on caller
  // list order (UTF8String hashCode/equals are byte-wise)
  @transient private lazy val idx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](words.size * 2)
    words.distinct.sorted.zipWithIndex.foreach { case (w, i) =>
      m.put(UTF8String.fromString(w), Integer.valueOf(i))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      DistinctInSet.count(input.asInstanceOf[ArrayData], idx))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("wordIdx", idx,
      classOf[java.util.HashMap[UTF8String, Integer]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DistinctInSet.count($c, $idxRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctInSet {

  /** Static seam shared by eval and codegen (identical arithmetic). */
  def count(arr: ArrayData,
      idx: java.util.HashMap[UTF8String, Integer]): Long = {
    val mask = new Array[Long]((idx.size + 63) >> 6)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val b = idx.get(t)
        if (b != null) mask(b.intValue >> 6) |= 1L << (b.intValue & 63)
      }
      i += 1
    }
    var c = 0L
    var j = 0
    while (j < mask.length) {
      c += java.lang.Long.bitCount(mask(j))
      j += 1
    }
    c
  }

  /** Column-API entry point. */
  def distinctInSet(toks: Column, words: Seq[String]): Column =
    ColumnBridge.column(DistinctInSet(ColumnBridge.expression(toks), words))
}
