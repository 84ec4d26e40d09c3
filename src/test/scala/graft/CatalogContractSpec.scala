package graft

import org.apache.spark.sql.functions._

/** Contract sweep over EVERY catalog entry: the driver's correctness
  * differ sorts result rows by every column with pandas, which crashes
  * on array/map/struct cells (`unhashable type: numpy.ndarray`). Round 5
  * shipped that failure once (q74), round 6 twice more (q91, q92) — this
  * spec makes the contract a compile-area gate instead of tribal
  * knowledge: no catalog entry may output a nested top-level column.
  * Entries with genuinely array-shaped results unpivot via `posexplode`.
  */
class CatalogContractSpec extends TestBase {

  private val sf = "/root/testdata/sf0.001"

  test("no catalog entry outputs an array/map/struct column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val bad = Verify.differIncompatibleColumns(fn(spark, sf).schema)
        if (bad.nonEmpty) Seq(s"$name: ${bad.mkString(", ")}") else Nil
    }
    assert(offenders.isEmpty,
      s"differ-incompatible catalog entries:\n${offenders.mkString("\n")}")
  }

  test("the guard trips on a deliberately arrayed frame") {
    val df = spark.range(2).select(col("id"),
      array(lit(1), lit(2)).as("xs"),
      map(lit("k"), lit(1)).as("m"),
      struct(lit(1).as("a")).as("st"))
    assert(Verify.differIncompatibleColumns(df.schema) ==
      Seq("xs", "m", "st"))
    assert(Verify.differIncompatibleColumns(
      df.select("id").schema).isEmpty)
  }

  test("every catalog entry with an oracle is covered both ways") {
    // oracleSql keys ⊆ queries keys; entries without SQL are the
    // documented engine-specific set (sketches/serving shapes)
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle without query: ${(o -- q).toSeq.sorted}")
  }
}
