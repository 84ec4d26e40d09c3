package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** [[graft.operators.Sketches]] — the merge algebra (shard boundaries
  * never change the estimate), accuracy, determinism, and the persisted
  * incremental-update loop. */
class SketchesSpec extends TestBase {

  private def vals(n: Int, dup: Int) = {
    import spark.implicits._
    // each value appears `dup` times, scattered across partitions
    (0 until n * dup).map(i => ("g" + (i % 2), (i % n).toLong))
      .toDF("src", "v").repartition(9)
  }

  test("union of shard sketches == sketch of the union (exact equality)") {
    val d = vals(5000, 3)
    val s1 = Sketches.cardinalitySketch(
      d.filter(col("v") % 2 === 0), col("src"), col("v"))
    val s2 = Sketches.cardinalitySketch(
      d.filter(col("v") % 2 =!= 0), col("src"), col("v"))
    val merged = Sketches.estimate(Sketches.mergeSketches(s1, s2))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val whole = Sketches.estimate(
      Sketches.cardinalitySketch(d, col("src"), col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == whole, s"shard boundary changed the estimate")
  }

  test("estimate is deterministic under repartitioning and accurate") {
    val d = vals(20000, 2)
    def run(p: Int) = Sketches.estimate(
      Sketches.cardinalitySketch(d.repartition(p), col("src"), col("v")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run(3)
    assert(a == run(17), "estimate depends on partitioning")
    // 10k distinct per group; lgK=12 → ~1.6% typical error, 5% bound
    a.foreach { case (g, est) =>
      assert(math.abs(est - 10000L) <= 500, s"$g: $est off >5%")
    }
  }

  test("mergeSketches keeps one-sided groups") {
    import spark.implicits._
    val a = Sketches.cardinalitySketch(
      Seq(("x", 1L), ("x", 2L)).toDF("src", "v"), col("src"), col("v"))
    val b = Sketches.cardinalitySketch(
      Seq(("y", 9L)).toDF("src", "v"), col("src"), col("v"))
    val est = Sketches.estimate(Sketches.mergeSketches(a, b))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("x" -> 2L, "y" -> 1L))
  }

  test("persisted incremental loop: store + new shard, history unread") {
    import spark.implicits._
    val store = tmpDir().resolve("sketch-store").toString
    val day1 = (0L until 300L).map(("s", _)).toDF("src", "v")
    Sketches.cardinalitySketch(day1, col("src"), col("v"))
      .write.parquet(store)
    // day 2 overlaps half of day 1 and adds 100 new values
    val day2 = (150L until 550L).map(("s", _)).toDF("src", "v")
    val merged = Sketches.mergeSketches(
      spark.read.parquet(store),
      Sketches.cardinalitySketch(day2, col("src"), col("v")))
    val est = Sketches.estimate(merged).collect().head.getLong(1)
    // 550 distinct total; the union promotes out of sparse mode, so
    // allow the lgK=12 error bound rather than exact equality
    assert(math.abs(est - 550L) <= 28, s"incremental estimate: $est")
  }

  test("distinctAudit: exact counts with in-bound estimates") {
    val d = vals(1000, 4)
    val rows = Sketches.distinctAudit(d, col("src"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == 2)
    rows.foreach { case (g, n, ok) =>
      assert(n == 500L, s"$g exact: $n") // v%2 split by g parity
      assert(ok, s"$g estimate out of bound")
    }
  }

  test("lgK guard") {
    val e = intercept[IllegalArgumentException] {
      Sketches.cardinalitySketch(fixture, col("b"), col("a"), lgK = 30)
    }
    assert(e.getMessage.contains("lgK"))
  }

  test("countMin: never undercounts, exact when collision-free, " +
      "shard merge == whole-corpus build, unseen term estimates 0") {
    import spark.implicits._
    val terms = ((1 to 100).map(_ => "hot") ++
      (1 to 7).map(_ => "warm") ++ Seq("cold"))
    val d = terms.toDF("t").repartition(5)
    val exact = terms.groupBy(identity).map { case (k, v) => k -> v.size }
    // wide grid: 3 terms into 1024 cells per row — estimates exact
    val wide = Sketches.countMinBuild(d, col("t"), depth = 4,
      width = 1024)
    val est = Sketches.countMinEstimate(wide,
        Seq("hot", "warm", "cold", "never").toDF("t"), col("t"),
        depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") == 100L && est("warm") == 7L && est("cold") == 1L)
    assert(est("never") == 0L, "unseen term must estimate 0")
    // tight grid: estimates may rise, NEVER fall (CMS guarantee)
    val tight = Sketches.countMinBuild(d, col("t"), depth = 2, width = 16)
    Sketches.countMinEstimate(tight, d.distinct(), col("t"),
        depth = 2, width = 16)
      .collect().foreach { r =>
        assert(r.getLong(1) >= exact(r.getString(0)).toLong,
          s"undercount for ${r.getString(0)}")
      }
    // merge algebra: grids of two shards add cell-wise to the
    // whole-corpus grid
    val s1 = Sketches.countMinBuild(terms.take(60).toDF("t"), col("t"))
    val s2 = Sketches.countMinBuild(terms.drop(60).toDF("t"), col("t"))
    assertSameRows(Sketches.countMinMerge(s1, s2),
      Sketches.countMinBuild(d, col("t")))
    // build is deterministic under repartitioning
    assertSameRows(Sketches.countMinBuild(d.repartition(13), col("t")),
      Sketches.countMinBuild(d.coalesce(1), col("t")))
  }
}
