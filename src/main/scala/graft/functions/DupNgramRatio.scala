package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fraction of whitespace-token n-gram occurrences repeating an earlier
  * occurrence, in ONE pass per row (SURVEY §2.4 X5 repetition gate).
  *
  * Semantics are EXACTLY the composable form it replaces (and the DuckDB
  * oracle replays): tokens = regex-split of the trimmed text on `\s+`,
  * grams = n consecutive tokens space-joined (injective — tokens cannot
  * contain whitespace), ratio = (total − distinct) / total as the same
  * two-int double division; fewer than n tokens → 0.0.
  *
  * Why native: the composable form (split → transform/slice shingles →
  * array_distinct) is fine as a projection, but as a FILTER —
  * the curation pipeline's gate — predicate pushdown substitutes the
  * staged aliases back into one expression, and the inlined `split`
  * re-evaluates per transform element (O(n²)/row, the round-1 inlining
  * trap resurfacing through pushdown): the gated pipeline measured
  * 13.3 s vs 5.6 s ungated at sf0.1. A single self-contained expression
  * is substitution-proof. `CodegenFallback` costs one interpreted call
  * per ROW, irrelevant next to the per-row tokenization.
  */
case class DupNgramRatio(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 2, "n must be >= 2 (unigram 'repetition' is vocabulary)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dup_ngram_ratio requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any = {
    // same tokenization as TextAnalysis.tokens = split(trim(text), "\s+"):
    // SQL trim strips ONLY ASCII spaces (UTF8String.trim — NOT Java
    // String.trim, which also eats \t/\n/\r and would drop the empty
    // edge token the HOF/oracle forms produce), and Spark's StringSplit
    // delegates to java.util.regex with limit -1, so String.split(regex,
    // -1) over the space-trimmed string is semantics-equal (including
    // the [""] result for empty input)
    val toks = input.asInstanceOf[UTF8String].trim.toString
      .split("\\s+", -1)
    val total = toks.length - n + 1
    if (total <= 0) return java.lang.Double.valueOf(0.0)
    val seen = new java.util.HashSet[String](total * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    var distinct = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      if (seen.add(sb.toString)) distinct += 1
      i += 1
    }
    java.lang.Double.valueOf((total - distinct).toDouble / total.toDouble)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DupNgramRatio {
  /** Column-API entry point; null text yields null (callers coalesce). */
  def ratio(text: Column, n: Int): Column =
    ColumnBridge.column(DupNgramRatio(ColumnBridge.expression(text), n))
}
