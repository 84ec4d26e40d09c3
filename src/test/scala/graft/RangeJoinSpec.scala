package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** [[graft.operators.RangeJoin]] — bucketized interval-containment join:
  * boundary semantics, bucket-crossing and negative axes, the null/empty
  * interval contract, the fan-out guard, and the no-nested-loop plan pin. */
class RangeJoinSpec extends TestBase {
  import spark.implicits._

  private def pts(vs: java.lang.Long*) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, Option(v).map(_.toLong)) }
      .toDF("pid", "p")
  private def rng(vs: (java.lang.Long, java.lang.Long)*) =
    vs.zipWithIndex.map { case ((lo, hi), i) =>
      (i.toLong, Option(lo).map(_.toLong), Option(hi).map(_.toLong))
    }.toDF("rid", "lo", "hi")

  private def pairs(points: org.apache.spark.sql.DataFrame,
      ranges: org.apache.spark.sql.DataFrame, w: Long,
      maxB: Int = 256): Set[(Long, Long)] =
    RangeJoin.pointInRange(points, ranges, "p", "lo", "hi", w, maxB)
      .select(col("point.pid"), col("range.rid")).as[(Long, Long)]
      .collect().toSet

  test("pointInRange: half-open [lo, hi) — lo matches, hi does not") {
    val got = pairs(pts(9L, 10L, 15L, 19L, 20L), rng((10L, 20L)), w = 7)
    assert(got == Set(1L -> 0L, 2L -> 0L, 3L -> 0L),
      s"expected exactly {10, 15, 19} in [10, 20), got $got")
  }

  test("pointInRange: matches survive bucket crossings and negative axes") {
    // width 10: the interval [-25, 5) spans buckets -3..0; points on both
    // sides of zero and exactly on bucket edges must all match.
    val got = pairs(pts(-25L, -20L, -1L, 0L, 4L, 5L),
      rng((-25L, 5L)), w = 10)
    assert(got == Set(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L),
      s"expected all but p=5 to match [-25, 5), got $got")
  }

  test("pointInRange: one output row per (point, interval) pair even when " +
    "the interval spans many buckets") {
    val out = RangeJoin.pointInRange(pts(50L), rng((0L, 100L)), "p", "lo",
      "hi", bucketWidth = 7)
    assert(out.count() == 1L, "a pair meets in exactly one bucket")
  }

  test("pointInRange: null points, null bounds, and empty/inverted " +
    "intervals match nothing") {
    val got = pairs(pts(5L, null), rng((0L, 10L), (null, 10L), (0L, null),
      (7L, 7L), (9L, 2L)), w = 4)
    assert(got == Set(0L -> 0L),
      s"only the non-null point in the one real interval, got $got")
  }

  test("pointInRange: interval wider than maxBucketsPerRange fails loudly") {
    val e = intercept[Exception] {
      pairs(pts(1L), rng((0L, 1000L)), w = 1, maxB = 16)
    }
    assert(e.getMessage != null &&
      e.getMessage.contains("pointInRange: interval spans more than"),
      s"expected the fan-out guard, got: ${e.getMessage}")
  }

  test("pointInRange: plans as an equi-join on the bucket — no nested " +
    "loop, no cartesian") {
    val big = spark.range(0, 5000).select(col("id").as("pid"),
      (col("id") * 3).as("p"))
    val ivs = spark.range(0, 2000).select(col("id").as("rid"),
      (col("id") * 7).as("lo"), (col("id") * 7 + 5).as("hi"))
    val out = RangeJoin.pointInRange(big, ivs, "p", "lo", "hi",
      bucketWidth = 8)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range join must be an equi-join on the bucket key:\n$plan")
    // cross-check the equi-plan against the direct theta-join semantics
    val direct = big.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select(col("pid"), col("rid")).as[(Long, Long)].collect().toSet
    val got = out.select(col("point.pid"), col("range.rid"))
      .as[(Long, Long)].collect().toSet
    assert(got == direct, s"equi-bucket plan diverges from theta join: " +
      s"${(got diff direct) ++ (direct diff got)}")
  }
}
