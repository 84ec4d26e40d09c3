package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic range (interval-containment) join — with [[AsOfJoin]], the
  * second join shape Spark's built-in equi-join surface lacks. Left
  * unaided, Catalyst plans `p BETWEEN lo AND hi` as a broadcast
  * nested-loop or cartesian product — quadratic, and a non-starter once
  * both sides are large. This operator rewrites containment as an
  * EQUI-join on a bucketized axis: each interval explodes to the
  * fixed-width buckets it overlaps, each point maps to its single
  * bucket, the sides meet in a hash/sort-merge join on the bucket id,
  * and the exact predicate filters the survivors.
  *
  * Scale shape: ONE shuffle per side, keyed on bucket; candidate volume
  * is bounded by per-bucket co-occupancy (pick `bucketWidth` near the
  * typical interval span so most intervals explode to ≤2 buckets). A
  * (point, interval) pair can only meet in the point's single bucket,
  * so the join emits no duplicates and needs no distinct. Intervals
  * wider than `maxBucketsPerRange` buckets fail LOUDLY at runtime
  * (raise_error) instead of silently amplifying the explode —
  * re-bucket with a wider `bucketWidth` instead.
  */
object RangeJoin {

  /** Exact floor division on longs (`floor(a / b)` without the double
    * rounding that loses integer precision above 2^52 — epoch-nanos
    * axes hit that). `a div b` truncates toward zero; adjust when the
    * signs disagree and the division is inexact. */
  private def floorDiv(a: String, b: Long): String =
    s"($a div $b) - (CASE WHEN $a % $b < 0 THEN 1 ELSE 0 END)"

  /** For each row of `points`, attach every row of `ranges` whose
    * half-open interval `[loCol, hiCol)` contains `points(pointCol)`
    * (inner semantics: unmatched rows on either side are dropped).
    * Output columns: `point` (struct of all point columns), `range`
    * (struct of all range columns) — the [[AsOfJoin]] convention.
    *
    * All three axis columns are cast to long (pass epoch-days /
    * epoch-millis / epoch-nanos — any integral axis). Rows with a null
    * point, a null bound, or an empty/inverted interval (`lo >= hi`)
    * contain nothing and match nothing; they are excluded, by the same
    * contract as SQL's `BETWEEN` with NULL operands.
    *
    * @param bucketWidth axis units per bucket; choose near the typical
    *   interval span so intervals explode to O(1) buckets
    * @param maxBucketsPerRange loud-failure cap on per-interval explode
    *   fan-out (an interval spanning millions of buckets is a
    *   mis-sized `bucketWidth`, not a workload)
    */
  def pointInRange(points: DataFrame, ranges: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Long,
      maxBucketsPerRange: Int = 256): DataFrame = {
    require(bucketWidth > 0, "pointInRange: bucketWidth must be positive")
    require(maxBucketsPerRange > 0,
      "pointInRange: maxBucketsPerRange must be positive")
    val p = points
      .select(struct(points.columns.map(points(_)).toIndexedSeq: _*)
        .as("point"), col(pointCol).cast("long").as("__p"))
      .filter(col("__p").isNotNull)
      .withColumn("__b", expr(floorDiv("__p", bucketWidth)))
    val r = ranges
      .select(struct(ranges.columns.map(ranges(_)).toIndexedSeq: _*)
        .as("range"), col(loCol).cast("long").as("__lo"),
        col(hiCol).cast("long").as("__hi"))
      .filter(col("__lo") < col("__hi")) // also drops null bounds
      .withColumn("__blo", expr(floorDiv("__lo", bucketWidth)))
      .withColumn("__bhi", expr(floorDiv(s"(__hi - 1)", bucketWidth)))
      .withColumn("__b", explode(when(
        col("__bhi") - col("__blo") >= lit(maxBucketsPerRange.toLong),
        raise_error(concat(
          lit(s"pointInRange: interval spans more than " +
            s"$maxBucketsPerRange buckets at bucketWidth=$bucketWidth " +
            "(lo="), col("__lo"), lit(", hi="), col("__hi"),
          lit("); widen bucketWidth or raise maxBucketsPerRange"))))
        .otherwise(sequence(col("__blo"), col("__bhi")))))
    p.join(r, "__b")
      .filter(col("__p") >= col("__lo") && col("__p") < col("__hi"))
      .select(col("point"), col("range"))
  }
}
