package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-subsequence length of two token arrays — the core of
  * ROUGE-L (Lin 2004): unlike n-gram overlap it rewards IN-ORDER
  * agreement at any gap, the summarization-eval property BLEU's
  * contiguous n-grams cannot see (SURVEY §2.4 X5 eval family, the
  * q222 BLEU sibling).
  *
  * Why native: the LCS recurrence `dp[i][j] = max(dp[i-1][j],
  * dp[i][j-1], dp[i-1][j-1] + eq)` is inherently sequential in BOTH
  * dimensions — a higher-order-function composition re-evaluates the
  * row prefix per cell (the DupNgramRatio inlining trap), and the
  * [[graft.operators.Metrics.lcsHof]] reference form exists only as
  * the spec-pinned semantics twin. Two-row rolling DP, O(n·m) time,
  * O(m) space; `CodegenFallback` costs one interpreted call per row,
  * irrelevant next to the per-row DP itself. Null array → null;
  * either side empty → 0. Token equality is exact binary
  * (UTF8String); normalize upstream. */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lcs_length requires two array<string>, got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    def toks(x: Any): Array[UTF8String] = {
      val ad = x.asInstanceOf[ArrayData]
      Array.tabulate(ad.numElements())(i =>
        if (ad.isNullAt(i)) null else ad.getUTF8String(i))
    }
    java.lang.Integer.valueOf(LcsLength.lcs(toks(l), toks(r)))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsLength {

  /** Two-row rolling LCS; a null token equals nothing (not even
    * another null — SQL equality semantics). */
  private[graft] def lcs(a: Array[UTF8String],
      b: Array[UTF8String]): Int = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return 0
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      var j = 1
      val ai = a(i - 1)
      while (j <= m) {
        val eq = ai != null && b(j - 1) != null && ai.equals(b(j - 1))
        val diag = prev(j - 1) + (if (eq) 1 else 0)
        val up = prev(j)
        val leftv = cur(j - 1)
        cur(j) = math.max(diag, math.max(up, leftv))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m)
  }

  /** Column-API entry point; null on null inputs (callers coalesce). */
  def of(a: Column, b: Column): Column =
    ColumnBridge.column(LcsLength(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
