package graft

import org.apache.spark.sql.functions._

import graft.operators.FooterStats

/** [[graft.operators.FooterStats]] — footer-only row counts and zone
  * maps must agree with full scans, and the pruning report must match
  * what a range predicate can actually skip. */
class FooterStatsSpec extends TestBase {

  private val sf = "/root/testdata/sf0.001"

  test("totalRows from footers == scan count (single file)") {
    val got = FooterStats.totalRows(spark, s"$sf/lineitem.parquet")
      .collect().head.getLong(0)
    val want = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(got == want)
  }

  test("fileRowCounts over a multi-part dir sums to the scan count") {
    import spark.implicits._
    val dir = tmpDir().resolve("parts").toString
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("id", "k")
    df.repartition(5).write.parquet(dir)
    val rc = FooterStats.fileRowCounts(spark, dir).collect()
    assert(rc.length == 5)
    assert(rc.map(_.getLong(1)).sum == 1000L)
    assert(rc.forall(_.getLong(2) > 0L), "bytes must come from listing")
    assert(rc.forall(_.getInt(3) >= 1), "row_groups from the footer")
  }

  test("zoneMap: disjoint ranges on a range-partitioned layout + nulls") {
    import spark.implicits._
    val dir = tmpDir().resolve("zm").toString
    val df = (1L to 900L)
      .map(i => (i, if (i % 3 == 0) null else s"s$i"))
      .toDF("id", "s")
    df.repartitionByRange(3, col("id")).write.parquet(dir)
    val zm = FooterStats.zoneMap(spark, dir, Seq("id", "s")).collect()
    val idRows = zm.filter(_.getString(1) == "id")
      .map(r => (r.getString(2).toLong, r.getString(3).toLong))
      .sortBy(_._1)
    assert(idRows.length == 3)
    // ranges disjoint and ordered, covering 1..900
    assert(idRows.head._1 == 1L && idRows.last._2 == 900L)
    idRows.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"ranges overlap: $idRows")
    }
    val sNulls = zm.filter(_.getString(1) == "s").map(_.getLong(4)).sum
    assert(sNulls == 300L, s"null count from stats: $sNulls")
  }

  test("prunableFiles: narrow range keeps one file, conservative on " +
      "all-null stats") {
    import spark.implicits._
    val dir = tmpDir().resolve("pr").toString
    (1L to 900L).toDF("id")
      .repartitionByRange(3, col("id")).write.parquet(dir)
    val pr = FooterStats.prunableFiles(spark, dir, "id", 10.0, 20.0)
      .collect()
    assert(pr.count(!_.getBoolean(2)) == 1,
      s"exactly one file overlaps [10,20]: ${pr.mkString(", ")}")
    assert(pr.count(_.getBoolean(2)) == 2)
    // an all-null column has no min/max stats: never prunable
    val nd = tmpDir().resolve("nul").toString
    (1L to 10L).map(i => (i, null: java.lang.Long)).toDF("id", "v")
      .coalesce(1).write.parquet(nd)
    val prN = FooterStats.prunableFiles(spark, nd, "v", 0.0, 1.0)
      .collect()
    assert(prN.forall(!_.getBoolean(2)),
      "missing stats must be kept conservatively")
  }

  test("fileRowCounts recurses a partitioned key=value layout and " +
      "skips _SUCCESS markers") {
    import spark.implicits._
    val dir = tmpDir().resolve("bykey").toString
    (1L to 600L).map(i => (i, s"k${i % 3}")).toDF("id", "k")
      .write.partitionBy("k").parquet(dir)
    val rc = FooterStats.fileRowCounts(spark, dir).collect()
    assert(rc.map(_.getLong(1)).sum == 600L,
      s"partitioned tree must sum fully: ${rc.mkString(", ")}")
    assert(rc.forall(!_.getString(0).contains("_SUCCESS")))
    assert(rc.forall(_.getString(0).contains("k=")),
      "every counted file lives in a key= partition dir")
  }

  test("rangeLayoutReport: sharded write is disjoint, random write " +
      "overlaps, missing stats count as unhealthy") {
    import spark.implicits._
    val good = tmpDir().resolve("good").toString
    (1L to 900L).toDF("id")
      .repartitionByRange(3, col("id")).write.parquet(good)
    val g = FooterStats.rangeLayoutReport(spark, good, "id").collect()
    assert(g.length == 3 && g.forall(!_.getBoolean(3)),
      s"range layout must be clean: ${g.mkString(", ")}")
    val bad = tmpDir().resolve("bad").toString
    (1L to 900L).toDF("id").repartition(3).write.parquet(bad)
    val b = FooterStats.rangeLayoutReport(spark, bad, "id").collect()
    assert(b.exists(_.getBoolean(3)),
      "hash-scattered files must report overlap")
    val nul = tmpDir().resolve("nul").toString
    (1L to 10L).map(i => (i, null: java.lang.Long)).toDF("id", "v")
      .coalesce(1).write.parquet(nul)
    val n = FooterStats.rangeLayoutReport(spark, nul, "v").collect()
    assert(n.forall(_.getBoolean(3)), "statless files are never healthy")
  }

  test("empty input raises loudly") {
    val dir = tmpDir().toString
    val e = intercept[IllegalArgumentException] {
      FooterStats.fileRowCounts(spark, dir)
    }
    assert(e.getMessage.contains("no files"))
  }
}
