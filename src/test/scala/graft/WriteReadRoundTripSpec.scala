package graft

/** Mirrors the reference's write/read round-trip + golden-output testitems
  * (`/root/reference/test/runtests.jl:9-44` and `:47-64`). */
class WriteReadRoundTripSpec extends TestBase {

  test("CSV golden lines: header, NULL as empty, float as 1.0") {
    val dir = tmpDir()
    val p = s"$dir/tbl.csv"
    QuackIO.writeTable(fixture, p)
    assert(readLines(p) == Seq("a,b,c", "1,x,1.0", "2,yz,"))
  }

  test("CSV round-trip preserves values and widened types") {
    val dir = tmpDir()
    val p = s"$dir/tbl.csv"
    QuackIO.writeTable(fixture, p)
    assertSameRows(QuackIO.readCsv(spark, Seq(p)), fixture)
  }

  test("CSV delim=';' golden lines (K2)") {
    val dir = tmpDir()
    val p = s"$dir/tbl.csv"
    QuackIO.writeTable(fixture, p, WriteOptions(delim = Some(";")))
    assert(readLines(p) == Seq("a;b;c", "1;x;1.0", "2;yz;"))
    assertSameRows(
      QuackIO.readCsv(spark, Seq(p), ReadOptions(delim = Some(";"))), fixture)
  }

  test("CSV header=false golden lines (K3)") {
    val dir = tmpDir()
    val p = s"$dir/tbl.csv"
    QuackIO.writeTable(fixture, p, WriteOptions(header = Some(false)))
    assert(readLines(p) == Seq("1,x,1.0", "2,yz,"))
  }

  test("CSV force_quote quotes only listed columns, NULL stays bare (K4)") {
    val dir = tmpDir()
    val p = s"$dir/tbl.csv"
    QuackIO.writeTable(fixture, p,
      WriteOptions(forceQuote = Seq("a", "c")))
    assert(readLines(p) == Seq("a,b,c", "\"1\",x,\"1.0\"", "\"2\",yz,"))
  }

  test("CSV .gz extension writes gzip (K5)") {
    val dir = tmpDir()
    val p = s"$dir/tbl.csv.gz"
    QuackIO.writeTable(fixture, p)
    val head = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)).take(2)
    assert(head(0) == 0x1f.toByte && head(1) == 0x8b.toByte, "gzip magic")
    assertSameRows(QuackIO.readCsv(spark, Seq(p)), fixture)
  }

  test("parquet write: single file with PAR1 magic, round-trips (K7)") {
    val dir = tmpDir()
    val p = s"$dir/tbl.pq"
    QuackIO.writeTable(fixture, p)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    assert(new String(bytes.take(4)) == "PAR1")
    assert(new String(bytes.takeRight(4)) == "PAR1")
    assertSameRows(QuackIO.readParquet(spark, Seq(p)), fixture)
  }

  test("parquet compression=zstd accepted (K8)") {
    val dir = tmpDir()
    val p = s"$dir/tbl.parquet"
    QuackIO.writeTable(fixture, p,
      WriteOptions(compression = Some("zstd")))
    assertSameRows(QuackIO.readParquet(spark, Seq(p)), fixture)
  }

  test("NDJSON golden lines: one object per line, explicit null (K10)") {
    val dir = tmpDir()
    val p = s"$dir/tbl.json"
    QuackIO.writeTable(fixture, p)
    assert(readLines(p) ==
      Seq("""{"a":1,"b":"x","c":1.0}""", """{"a":2,"b":"yz","c":null}"""))
    assertSameRows(QuackIO.readJson(spark, Seq(p)), fixture)
  }

  test("uppercase format throws before creating the file (error contract)") {
    val dir = tmpDir()
    val p = s"$dir/tbl.csv"
    val e = intercept[IllegalArgumentException] {
      QuackIO.writeTable(fixture, p, WriteOptions(format = Some("Parquet")))
    }
    assert(e.getMessage.contains("lowercase"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
      "no file must be created on invalid format")
  }
}
