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
}
