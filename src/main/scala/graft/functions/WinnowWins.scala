package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing window-minima of a document's k-gram hashes, in ONE pass per
  * row (SURVEY §2.4 X5 fingerprinting).
  *
  * Semantics are EXACTLY the composable HOF pipeline it replaces (and the
  * DuckDB oracle replays): gram i = first 8 hex chars of
  * `md5(utf8(substr(text, i, k)))` (character-based substring), output j =
  * lexicographic min of grams[j .. j+w-1]; fewer than k chars → empty,
  * fewer than w grams → empty.
  *
  * Why native: the HOF form evaluates two interpreted lambdas per
  * character position — `transform(sequence(...), i -> substr(md5(...)))`
  * then `transform(..., i -> array_min(slice(grams, i, w)))` — which
  * measured ~6–50 s for 5 000 × 300-char docs at sf0.1 (half the whole
  * bench). Here: one substring + one MD5 per position and an O(L)
  * monotonic-deque sliding minimum, ~µs per document. `CodegenFallback`
  * costs one interpreted call per ROW (not per char), irrelevant next to
  * the per-row work; the surrounding projection stays codegen'd.
  */
case class WinnowWins(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k > 0 && w > 0, "k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_wins requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    // codepoint-based (not UTF-16-unit) substrings, matching Spark/DuckDB
    // substr/length semantics: supplementary-plane chars (emoji, astral
    // CJK) count as ONE position, so gram boundaries and the n<k gate
    // agree with the HOF form and the oracle even off the BMP
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val nGrams = n - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val grams = new Array[String](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      val digest = md.digest(new String(cps, i, k).getBytes("UTF-8"))
      // first 8 hex chars = first 4 digest bytes
      val hex = new Array[Char](8)
      var b = 0
      while (b < 4) {
        hex(2 * b) = hexDigits((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(digest(b) & 0xf)
        b += 1
      }
      grams(i) = new String(hex)
      i += 1
    }
    // sliding minimum via monotonic deque of indices (front = current min);
    // hex is ASCII so String ordering == UTF8String binary ordering
    val out = new Array[Any](nGrams - w + 1)
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // exclusive
    i = 0
    while (i < nGrams) {
      // drop candidates ≥ the incoming gram (keep strictly smaller: the
      // LEFTMOST minimal value wins ties, same as array_min)
      while (tail > head && grams(deque(tail - 1)) >= grams(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = UTF8String.fromString(grams(deque(head)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowWins {
  /** Column-API entry point. */
  def wins(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowWins(ColumnBridge.expression(text), k, w))
}
