package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity (Winkler 1990) — the record-linkage verifier
  * for SHORT near-identical strings (names, titles) where Levenshtein's
  * unit costs over-penalize transpositions and shingle Jaccard is too
  * coarse (SURVEY §2.4 X5 record linkage, the q157 sibling).
  *
  * EXACTLY the definition DuckDB's `jaro_winkler_similarity`
  * implements (empirically pinned against it on 5000 random pairs plus
  * the classic Winkler examples — zero mismatches): greedy matching
  * within a `max(|a|,|b|)/2 − 1` window, transpositions = the
  * out-of-order match count halved by INTEGER division (the
  * RapidFuzz-family convention — the textbook's fractional t/2 differs
  * on odd counts, e.g. 'hot gear': 0.5675 vs textbook 0.5397),
  * `jaro = (m/|a| + m/|b| + (m−t)/m)/3`; the Winkler boost
  * `jaro + ℓ·0.1·(1−jaro)` (common prefix ℓ ≤ 4) applies only when
  * jaro > 0.7. EITHER side empty → 0.0 (including both — again the
  * DuckDB convention, not the both-empty→1 textbook variant). Operates
  * on Unicode code points (byte-vs-codepoint indexing only diverges
  * off-ASCII; pin oracles on ASCII fixtures).
  *
  * Why native: Spark ships `levenshtein` but no Jaro-Winkler, and the
  * two-pass matching loop is inherently iterative — inexpressible as a
  * higher-order-function composition without quadratic re-evaluation
  * (the DupNgramRatio inlining trap). `CodegenFallback` costs one
  * interpreted call per row, irrelevant next to the per-row O(|a|·w)
  * matching itself. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jaro_winkler requires two strings, got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString.codePoints().toArray
    val b = r.asInstanceOf[UTF8String].toString.codePoints().toArray
    java.lang.Double.valueOf(JaroWinkler.similarity(a, b))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  private[graft] def similarity(a: Array[Int], b: Array[Int])
      : Double = {
    val la = a.length; val lb = b.length
    if (la == 0 || lb == 0) return 0.0 // incl. both empty (DuckDB)
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a(i) == b(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched characters out of relative order, halved
    // by INTEGER division (t / 2, not t / 2.0 — the DuckDB convention)
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mm = m.toDouble
    val jaro = (mm / la + mm / lb + (mm - (t / 2)) / mm) / 3.0
    if (jaro <= 0.7) jaro
    else {
      var prefix = 0
      val maxP = math.min(4, math.min(la, lb))
      while (prefix < maxP && a(prefix) == b(prefix)) prefix += 1
      jaro + prefix * 0.1 * (1.0 - jaro)
    }
  }

  /** Column-API entry point; null on null inputs (callers coalesce). */
  def sim(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinkler(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
}
