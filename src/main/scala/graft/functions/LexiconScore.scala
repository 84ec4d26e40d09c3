package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Σ weight(token) over a fixed driver-known term→weight lexicon — the
  * linear layer of a fastText-style shallow text classifier (bias and
  * mean-pooling compose outside; see
  * [[graft.operators.TextAnalysis.withLexiconQuality]]).
  *
  * The composable form folds an interpreted lambda with a map probe per
  * TOKEN (see [[graft.operators.TextAnalysis.lexiconScoreHof]], the
  * spec-pinned twin); quality classification runs over every document of
  * a corpus, so this is the same hot-first-gate shape as
  * [[CountInSet]] — one hash probe per token, inside codegen.
  *
  * Semantics: null ARRAY → null; null ELEMENTS and lexicon misses
  * contribute 0.0; accumulation is double in ARRAY ORDER, bit-identical
  * to the twin's in-order fold and the oracle's in-order list_sum
  * (skipping a miss equals adding its 0.0 — IEEE `x + 0.0 == x` for
  * every x the fold can produce, since no weight sum is -0.0).
  */
case class LexiconScore(child: Expression, terms: Seq[String],
    weights: Seq[Double]) extends UnaryExpression {
  require(terms.length == weights.length,
    s"lexicon_score: ${terms.length} terms vs ${weights.length} weights")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lexicon_score requires array<string> input, got ${t.sql}")
  }

  override def dataType: DataType = DoubleType

  // the probe map, built once per expression instance (not per row);
  // UTF8String keys hash/compare byte-wise, matching string equality
  @transient private lazy val map: java.util.HashMap[UTF8String, java.lang.Double] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Double](
      terms.size * 2)
    terms.iterator.zip(weights.iterator).foreach { case (t, w) =>
      m.put(UTF8String.fromString(t), java.lang.Double.valueOf(w))
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(
      LexiconScore.score(input.asInstanceOf[ArrayData], map))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("lexicon", map,
      classOf[java.util.HashMap[UTF8String, java.lang.Double]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LexiconScore.score($c, $mapRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LexiconScore {

  /** Static seam shared by eval and codegen (identical arithmetic). */
  def score(arr: ArrayData,
      map: java.util.HashMap[UTF8String, java.lang.Double]): Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val w = map.get(t)
        if (w != null) s += w.doubleValue()
      }
      i += 1
    }
    s
  }

  /** Column-API entry point. */
  def lexiconScore(toks: Column, lexicon: Seq[(String, Double)]): Column =
    ColumnBridge.column(LexiconScore(ColumnBridge.expression(toks),
      lexicon.map(_._1), lexicon.map(_._2)))
}
