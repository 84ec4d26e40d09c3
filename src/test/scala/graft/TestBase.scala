package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + the reference's canonical 2×3 fixture
  * (`/root/reference/test/runtests.jl:10`): int64, string, nullable float. */
trait TestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestBase.spark

  /** `(a = [1, 2], b = ["x", "yz"], c = [1.0, missing])` */
  def fixture: DataFrame = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, "x", java.lang.Double.valueOf(1.0)),
      Row(2L, "yz", null)),
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", StringType, nullable = false),
      StructField("c", DoubleType, nullable = true))))

  def tmpDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-test-")

  def readLines(path: String): Seq[String] =
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))).asScala
      .toSeq

  /** Missing-aware row-set equality (order-insensitive), the reference's
    * `isequal` round-trip check. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      b.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema mismatch: ${a.schema} vs ${b.schema}")
    val ra = a.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val rb = b.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(ra.toSeq == rb.toSeq)
  }
}

object TestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
