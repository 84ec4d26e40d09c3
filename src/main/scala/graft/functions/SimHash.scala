package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native one-pass SimHash signature of a token array.
  *
  * The composable form ([[graft.operators.Dedup.simhashViaVotes]]) explodes
  * to one row per token and aggregates `bits` separate ±1 vote sums — a
  * full shuffle of the tokenized corpus plus 32 when-branches per token
  * row. At 100 TB that exchange IS the cost of the operator, and it exists
  * only because the per-doc fold was expressed relationally. This
  * expression does the identical arithmetic in one pass over the array —
  * MD5 per token, ±1 votes, sign threshold — turning signature computation
  * into a pure scan projection: no explode, no exchange, no aggregation.
  * The banding/bucketing stages that FOLLOW the signature still shuffle
  * (they genuinely need to meet across docs); this removes the shuffle
  * that didn't.
  *
  * Bit-compatibility with the vote-aggregation form and the DuckDB oracle
  * (q26/q58 replay the exploded votes in SQL):
  *  - per token, the hash is the UNSIGNED value of the first 4 bytes of
  *    `md5(token)` — exactly `conv(substring(md5(tok), 1, 8), 16, 10)`;
  *  - votes are integer sums (order-independent), bit b of the signature
  *    set iff its vote sum is strictly positive — `when(v > 0, 1L << b)`;
  *  - a null token element votes −1 on every bit, matching
  *    `when(shiftright(null, b) === 1, ...).otherwise(-1)` where the null
  *    comparison is not-true (tokenizers never produce null elements, but
  *    the twin must agree on adversarial input too);
  *  - bits above 32 vote −1 always (the 32-bit hash has no such bit),
  *    matching `shiftright(h, b)` = 0 there.
  *
  * Null handling: a null ARRAY returns null (the relational twin drops
  * the row at its explode — [[graft.operators.Dedup.simhash]] filters
  * null arrays to keep the two forms row-identical). An EMPTY array
  * yields signature 0 (all votes 0, none positive); the twin has no row
  * to vote with either, and whitespace tokenization never produces an
  * empty array, so the case is unreachable from text.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<string> input, got ${t.sql}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      SimHash.compute(input.asInstanceOf[ArrayData], bits))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash {

  // MessageDigest is stateful; one per thread, reset by digest() itself
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Static seam shared by eval and codegen (identical arithmetic). */
  def compute(arr: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val digest = md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      if (tok == null) {
        // twin semantics: null hash → every when() is not-true → all −1
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        val d = digest.digest(tok.getBytes)
        // unsigned first 4 bytes == conv(substring(md5, 1, 8), 16, 10)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var b = 0
        while (b < bits) {
          // bits ≥ 32 shift past the hash → 0 → vote −1, like the twin
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column-API entry point. */
  def simhash(toks: Column, bits: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(toks), bits))
}
