package graft

import org.apache.spark.sql.functions._

/** Mirrors the reference's SQLCollections lazy-query testitem
  * (`/root/reference/test/runtests.jl:88-113`, README lazy pipeline):
  * a Spark DataFrame IS the lazy collection — chained transforms build one
  * plan, a single action executes it. */
class LazyChainSpec extends TestBase {

  private def csvPath(): String = {
    val p = s"${tmpDir()}/tbl.csv"
    QuackIO.writeTable(fixture, p)
    p
  }

  test("count over lazy scan (L5)") {
    val sc = QuackIO.readCsv(spark, Seq(csvPath()))
    assert(sc.count() == 2)
  }

  test("collect matches eager read (L7)") {
    val p = csvPath()
    assertSameRows(QuackIO.readCsv(spark, Seq(p)),
      QuackIO.readCsv(spark, Seq(p)))
  }

  test("group-by key + per-group count (L6 golden)") {
    val sc = QuackIO.readCsv(spark, Seq(csvPath()))
    val got = sc.groupBy("b").agg(count(lit(1)).as("cnt"))
      .orderBy("b").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("x", 1L), ("yz", 1L)))
  }

  test("filter → map → first chain compiles to one plan (L2-L4, L9)") {
    val sc = QuackIO.readCsv(spark, Seq(csvPath()))
    val out = sc.filter(col("b").startsWith("y"))
      .select(col("a"), col("b"))
      .limit(1)
    val rows = out.collect()
    assert(rows.length == 1 && rows(0).getString(1) == "yz")
  }

  test("lazy multi-file scan (L8)") {
    val p = csvPath()
    val sc = QuackIO.readCsv(spark, Seq(p, p))
    assert(sc.count() == 4)
    assert(sc.filter(col("b") === "x").count() == 2)
  }

  test("schema available without executing a job (L1)") {
    val p = s"${tmpDir()}/t.parquet"
    QuackIO.writeTable(fixture, p)
    val sc = QuackIO.readParquet(spark, Seq(p))
    assert(sc.schema.fieldNames.toSeq == Seq("a", "b", "c"))
  }
}
