package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — the canonical operator Spark's built-in
  * join surface lacks. Composed from existing operators per the preference
  * order (SURVEY §2.4): union the two sides, sort within each key by time
  * with right rows ordered before left rows at equal timestamps (`>=`
  * semantics), and carry the latest right row forward with
  * `last(_, ignoreNulls)` over a running window.
  *
  * Scale shape: ONE shuffle on the join key plus a per-partition sort —
  * the same cost as a sort-merge join, with no per-row range probing. The
  * carried payload travels as a single struct column.
  */
object AsOfJoin {

  /** For each left row, attach the right row with the greatest
    * `rightTs <= leftTs` within the same `key` group (inner semantics:
    * left rows with no prior right row are dropped). Output columns:
    * `left` (struct of all left columns), `right` (struct of all right
    * columns of the matched row).
    *
    * @param tiebreak numeric column in `right` ordering simultaneous
    *   right rows (latest wins); pass a unique id for determinism
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tiebreak: String): DataFrame = {
    val lU = left.select(col(key).as("__k"),
      col(leftTs).cast("long").as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      struct(left.columns.map(left(_)).toIndexedSeq: _*).as("__l"),
      lit(null).cast(right.schema).as("__r"))
    val rU = right.select(col(key).as("__k"),
      col(rightTs).cast("long").as("__t"), lit(0).as("__side"),
      col(tiebreak).cast("long").as("__tb"),
      lit(null).cast(left.schema).as("__l"),
      struct(right.columns.map(right(_)).toIndexedSeq: _*).as("__r"))
    // right rows order before left at the same timestamp => '>=' semantics
    val w = Window.partitionBy("__k")
      .orderBy(asc("__t"), asc("__side"), asc_nulls_first("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lU.unionByName(rU)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__match").isNotNull)
      .select(col("__l").as("left"), col("__match").as("right"))
  }

  /** Linear interpolation of an irregular observation series onto an
    * explicit grid — the time-series resample [[asofJoin]]'s
    * last-value semantics cannot express (as-of carries the PREVIOUS
    * value forward; interpolation also looks at the NEXT one). For
    * each grid row (key, t):
    *
    *  - an observation exactly at `t` (the latest by `tiebreak` among
    *    ties) is returned as-is;
    *  - between two observations, `v = v_prev + (v_next − v_prev) ·
    *    (t − t_prev)/(t_next − t_prev)` — one float expression with a
    *    fixed evaluation order, so a SQL oracle replays every bit;
    *  - before the first / after the last observation: null (no
    *    extrapolation — the q167 forward-fill is the carry variant).
    *
    * Same scale shape as [[asofJoin]]: union both sides, ONE exchange
    * on the key, per-partition sort, two running `IGNORE NULLS` window
    * passes (prev and next). Null observation values are excluded
    * upstream of the windows. Output: `key`, `t`, `v`. */
  def interpolateAt(obs: DataFrame, grid: DataFrame, key: String,
      tsCol: String, valCol: String, tiebreak: String,
      gridTs: String): DataFrame = {
    val oU = obs.filter(col(valCol).isNotNull)
      .select(col(key).as("__k"), col(tsCol).cast("long").as("__t"),
        lit(0).as("__side"), col(tiebreak).cast("long").as("__tb"),
        col(valCol).cast("double").as("__v"))
    val gU = grid.select(col(key).as("__k"),
      col(gridTs).cast("long").as("__t"), lit(1).as("__side"),
      lit(null).cast("long").as("__tb"),
      lit(null).cast("double").as("__v"))
    val order = Seq(asc("__t"), asc("__side"), asc_nulls_first("__tb"))
    val wPrev = Window.partitionBy("__k").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the "next observation" pass runs as a REVERSED running window:
    // Spark executes an UNBOUNDED FOLLOWING frame by rescanning
    // current→end for every row — O(n²) per partition (observed 26×
    // slower at sf0.1) — while the reversed UNBOUNDED PRECEDING frame
    // is the one-pass running form. first-over-following ≡
    // last-over-preceding under the reversed total order.
    val wNext = Window.partitionBy("__k")
      .orderBy(desc("__t"), desc("__side"), desc_nulls_last("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val obsT = when(col("__v").isNotNull, col("__t"))
    oU.unionByName(gU)
      .withColumn("__pv", last(col("__v"), ignoreNulls = true).over(wPrev))
      .withColumn("__pt", last(obsT, ignoreNulls = true).over(wPrev))
      .withColumn("__nv", last(col("__v"), ignoreNulls = true).over(wNext))
      .withColumn("__nt", last(obsT, ignoreNulls = true).over(wNext))
      .filter(col("__side") === 1)
      .select(col("__k").as(key), col("__t").as("t"),
        when(col("__pt") === col("__t"), col("__pv"))
          .when(col("__pt").isNotNull && col("__nt").isNotNull,
            col("__pv") + (col("__nv") - col("__pv")) *
              ((col("__t") - col("__pt")) / (col("__nt") - col("__pt"))))
          .as("v"))
  }
}
