package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** All m×k PQ squared-L2 distances of a float vector against literal
  * codebooks, in ONE pass per row (SURVEY §2.4 X3 product quantization).
  *
  * Semantics are EXACTLY the composable column form it replaces (and the
  * DuckDB oracle replays): entry mi·k + ki = Σ_j (v[mi·subDim+j] −
  * cb[mi][ki][j])², accumulated in double in component order — the same
  * IEEE sequence, so results are bit-identical.
  *
  * Why native: the composable form is m·k separate 2·subDim-term
  * expression trees (4·16·16 ≈ 4096 nodes with the codebook inlined as
  * literals) — too wide for effective codegen, measured 8.8 s for the
  * sf0.1 ADC query where this loop costs ~1 µs/row. `CodegenFallback`
  * costs one interpreted call per ROW, irrelevant next to the per-row
  * arithmetic; the surrounding projection stays codegen'd.
  */
case class PqDists(child: Expression, cb: Seq[Double], m: Int, k: Int,
    subDim: Int) extends UnaryExpression with CodegenFallback {

  require(m > 0 && k > 0 && subDim > 0, "m, k, subDim must be positive")
  require(cb.length == m * k * subDim,
    s"codebook length ${cb.length} != m*k*subDim (${m * k * subDim})")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_dists requires an array<float> input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // a too-short vector yields null (below), independent of child nullability
  override def nullable: Boolean = true

  private val flat: Array[Double] = cb.toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // UnsafeArrayData.getFloat is unchecked — a vector shorter than
    // m*subDim would silently read garbage. The composable form's
    // element_at past the end yields null, so match that: null out,
    // never wrong-but-plausible distances.
    if (v.numElements() < m * subDim) return null
    val out = new Array[Any](m * k)
    var mi = 0
    while (mi < m) {
      val base = mi * subDim
      var ki = 0
      while (ki < k) {
        val cbase = (mi * k + ki) * subDim
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          val x = v.getFloat(base + j).toDouble - flat(cbase + j)
          acc += x * x
          j += 1
        }
        out(mi * k + ki) = java.lang.Double.valueOf(acc)
        ki += 1
      }
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqDists {
  /** Column-API entry point; `cbs` indexed [subspace][codeword][component]. */
  def dists(vec: Column, cbs: Array[Array[Array[Double]]]): Column = {
    val m = cbs.length
    val k = cbs.head.length
    val subDim = cbs.head.head.length
    PqDistsColumn(vec, cbs.flatten.flatten.toIndexedSeq, m, k, subDim)
  }

  private def PqDistsColumn(vec: Column, flat: Seq[Double], m: Int, k: Int,
      subDim: Int): Column =
    ColumnBridge.column(
      PqDists(ColumnBridge.expression(vec), flat, m, k, subDim))
}
