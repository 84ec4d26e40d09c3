package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column.
  *
  * Spark's built-in function surface has no Unicode normalizer (SURVEY §2.4
  * X5 text canonicalization), and visually-identical text that differs only
  * in composition form (é as U+00E9 vs e + U+0301) defeats hash-based
  * dedup — the exact failure canonical decomposition exists to fix. The
  * preference order (compose > native Expression > UDF) lands on a native
  * expression: there is nothing to compose from, and the body is a single
  * `java.text.Normalizer.normalize` call that codegen inlines as one static
  * call — no lambda interpretation, stays inside whole-stage codegen.
  *
  * The DuckDB oracle mirrors this 1:1 with `nfc_normalize()`, so
  * normalized fingerprints stay engine-bit-identical.
  *
  * The UTF8String → java.lang.String round-trip per row is inherent (ICU
  * normalization needs UTF-16); the fast path for already-NFC ASCII corpora
  * is `Normalizer.isNormalized`, which scans without allocating.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    UTF8String.fromString(NfcNormalize.nfc(s.toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.NfcNormalize.nfc($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object NfcNormalize {
  /** Static seam shared by eval and codegen (identical arithmetic). */
  def nfc(s: String): String =
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)

  /** Column-API entry point. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
