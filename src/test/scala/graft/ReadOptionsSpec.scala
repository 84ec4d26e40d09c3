package graft

import org.apache.spark.sql.types._

/** Mirrors the reference's CSV-option testitem
  * (`/root/reference/test/runtests.jl:47-85`). */
class ReadOptionsSpec extends TestBase {

  private def writeFixtureCsv(): String = {
    val p = s"${tmpDir()}/tbl.csv"
    QuackIO.writeTable(fixture, p)
    p
  }

  test("wrong delimiter yields one mega-column named a,b,c (O1 negative)") {
    val p = writeFixtureCsv()
    val df = QuackIO.readCsv(spark, Seq(p), ReadOptions(delim = Some(";")))
    assert(df.schema.fieldNames.toSeq == Seq("a,b,c"))
    assert(df.count() == 2)
  }

  test("columns= declares types and casts on parse, incl. '1.0' -> int (O3)") {
    val p = writeFixtureCsv()
    val df = QuackIO.readCsv(spark, Seq(p), ReadOptions(
      columns = Seq("a" -> "float", "b" -> "varchar", "c" -> "int")))
    assert(df.schema.fields.map(_.dataType).toSeq ==
      Seq(DoubleType, StringType, LongType))
    val rows = df.collect().sortBy(_.getDouble(0))
    assert(rows(0).getDouble(0) == 1.0 && rows(0).getLong(2) == 1L)
    assert(rows(1).getDouble(0) == 2.0 && rows(1).isNullAt(2))
  }

  test("names= overrides positionally incl. adversarial names (O4)") {
    val p = writeFixtureCsv()
    val names = Seq("xx", "абв ' \"", "\\ 1")
    val df = QuackIO.readCsv(spark, Seq(p), ReadOptions(names = names))
    assert(df.schema.fieldNames.toSeq == names)
    assert(df.count() == 2)
  }

  test("auto_type_candidates downgrades disallowed types (O2)") {
    val p = writeFixtureCsv()
    val df = QuackIO.readCsv(spark, Seq(p),
      ReadOptions(autoTypeCandidates = Seq("int", "varchar")))
    // float column c outside the candidate set -> varchar
    assert(df.schema("c").dataType == StringType)
    assert(df.schema("a").dataType == LongType)
    val c = df.orderBy("a").collect().map(r => Option(r.getString(2)))
    assert(c.toSeq == Seq(Some("1.0"), None))
  }

  test("select projects, renames and preserves order incl. spaces (Q1)") {
    val p = writeFixtureCsv()
    val df = QuackIO.readCsv(spark, Seq(p), ReadOptions(
      select = Seq(Sel("b", Some("b 2")), Sel("a"))))
    assert(df.schema.fieldNames.toSeq == Seq("b 2", "a"))
  }

  test("limit caps rows after select (Q2)") {
    val p = writeFixtureCsv()
    val df = QuackIO.readCsv(spark, Seq(p), ReadOptions(
      select = Seq(Sel("a", Some("z"))), limit = Some(1)))
    assert(df.schema.fieldNames.toSeq == Seq("z"))
    assert(df.count() == 1)
  }

  test("multi-file read concatenates rows (S5)") {
    val p = writeFixtureCsv()
    val df = QuackIO.readCsv(spark, Seq(p, p))
    assert(df.count() == 4)
  }

  test("in-memory buffer source (S6)") {
    val df = QuackIO.readCsvString(spark, "a\n1\n2\n")
    assert(df.schema.fieldNames.toSeq == Seq("a"))
    assert(df.schema("a").dataType == LongType)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("readFile guesses format from extension (S4)") {
    val dir = tmpDir()
    val csv = s"$dir/t.csv"
    val pq = s"$dir/t.parquet"
    QuackIO.writeTable(fixture, csv)
    QuackIO.writeTable(fixture, pq)
    assertSameRows(QuackIO.readFile(spark, Seq(csv)), fixture)
    assertSameRows(QuackIO.readFile(spark, Seq(pq)), fixture)
  }

  test("readUrl downloads then scans (S7, file:// URL)") {
    val p = writeFixtureCsv()
    val url = java.nio.file.Paths.get(p).toUri.toString
    assertSameRows(QuackIO.readUrl(spark, url), fixture)
  }

  test("readFile guessing mode forbids format options (S4 guard)") {
    val p = writeFixtureCsv()
    intercept[IllegalArgumentException] {
      QuackIO.readFile(spark, Seq(p), None,
        ReadOptions(delim = Some(";")))
    }
    intercept[IllegalArgumentException] {
      QuackIO.readFile(spark, Seq(s"${tmpDir()}/unknown.xyz"))
    }
  }
}
