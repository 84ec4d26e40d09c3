package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted per-character counts of a string — the input table of the
  * char-entropy quality signal, as one in-row pass.
  *
  * The relational form ([[graft.operators.TextAnalysis
  * .withCharEntropyViaExplode]]) explodes to one row per CHARACTER and
  * runs two keyed aggregations — the heaviest possible shuffle shape (a
  * 100 TB corpus exchanges 100 TB of single-char rows twice) for what is
  * a per-document fold. This expression produces the identical
  * `sort_array(collect_list(struct(ch, cnt)))` value directly; the
  * entropy FORMULA stays in Spark SQL on top of it, so the IEEE
  * log2/fold arithmetic is literally the same expression tree as the
  * twin's and bit-compatibility is structural, not reimplemented.
  *
  * Exact `split(text, '')` semantics (twin-verified): Spark splits per
  * CODE POINT (surrogate pairs stay whole — Java regex semantics), no
  * trailing empty, and the empty string yields one empty-string element.
  * `sort_array`'s binary-ascending struct order over single-code-point
  * strings equals numeric code point order (UTF-8 byte order is code
  * point order), so the tally emits in ascending code point. ASCII text
  * (numBytes == numChars) takes a 128-bucket array fast path. Null in →
  * null out (the twin's explode drops the row; the wrapper filters,
  * keeping the forms row-identical).
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_counts requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ch", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any =
    CharCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharCounts {

  private val Empty = UTF8String.fromString("")

  /** Static seam shared by eval and codegen (identical arithmetic). */
  def compute(s: UTF8String): ArrayData = {
    val nBytes = s.numBytes()
    if (nBytes == 0) {
      // split("", "") = [""] — one empty-string "character", count 1
      return new GenericArrayData(Array[AnyRef](
        new GenericInternalRow(Array[Any](Empty, 1L))))
    }
    if (s.numChars() == nBytes) computeAscii(s.getBytes)
    else computeUnicode(s.toString)
  }

  private def computeAscii(bytes: Array[Byte]): ArrayData = {
    val counts = new Array[Long](128)
    var i = 0
    while (i < bytes.length) {
      counts(bytes(i) & 0x7f) += 1
      i += 1
    }
    var distinct = 0
    i = 0
    while (i < 128) {
      if (counts(i) > 0) distinct += 1
      i += 1
    }
    val out = new Array[AnyRef](distinct)
    var o = 0
    i = 0
    while (i < 128) {
      if (counts(i) > 0) {
        out(o) = new GenericInternalRow(Array[Any](
          UTF8String.fromBytes(Array(i.toByte)), counts(i)))
        o += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  private def computeUnicode(str: String): ArrayData = {
    // TreeMap keyed on code point: ascending code point order == the
    // twin's binary sort_array order over single-code-point strings
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Long](1))
      slot(0) += 1
      i += Character.charCount(cp)
    }
    val out = new Array[AnyRef](counts.size)
    var o = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(o) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(new String(Character.toChars(e.getKey))),
        e.getValue()(0)))
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def charCounts(text: Column): Column =
    ColumnBridge.column(CharCounts(ColumnBridge.expression(text)))
}
