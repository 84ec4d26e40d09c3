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

  test("headerless numeric CSV is sniffed: first data row survives (S1)") {
    val p = s"${tmpDir()}/noheader.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "1,foo,2.5\n2,bar,3.5\n")
    val df = QuackIO.readCsv(spark, Seq(p))
    assert(df.count() == 2) // old hard default ate row 1 as a "header"
    // explicit override still wins over the sniffer
    assert(QuackIO.readCsv(spark, Seq(p),
      ReadOptions(header = Some(true))).count() == 1)
  }

  test("sniffer treats all-text first row as header; ISO dates as data") {
    val dir = tmpDir()
    val dated = s"$dir/dated.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dated),
      "2024-01-01,x\n2024-01-02,y\n")
    assert(QuackIO.readCsv(spark, Seq(dated)).count() == 2)
    val headed = s"$dir/headed.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(headed),
      "day,name\n2024-01-01,x\n")
    val df = QuackIO.readCsv(spark, Seq(headed))
    assert(df.schema.fieldNames.toSeq == Seq("day", "name"))
    assert(df.count() == 1)
  }

  test(".tsv write emits tabs and read round-trips with no options (S1)") {
    val p = s"${tmpDir()}/tbl.tsv"
    QuackIO.writeTable(fixture, p)
    // tab-delimited golden lines — NOT commas
    assert(readLines(p) == Seq("a\tb\tc", "1\tx\t1.0", "2\tyz\t"))
    assertSameRows(QuackIO.readFile(spark, Seq(p)), fixture)
    // explicit delim= still overrides the extension default
    val mega = QuackIO.readCsv(spark, Seq(p), ReadOptions(delim = Some(";")))
    assert(mega.schema.fieldNames.length == 1)
  }

  test(".tsv.gz write round-trips through extension-implied tab + gzip") {
    val p = s"${tmpDir()}/tbl.tsv.gz"
    QuackIO.writeTable(fixture, p)
    val head = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p)).take(2)
    assert(head(0) == 0x1f.toByte && head(1) == 0x8b.toByte) // gzip magic
    assertSameRows(QuackIO.readFile(spark, Seq(p)), fixture)
  }

  test("';'/'|' files read correctly with no options (delimiter sniffing)") {
    val dir = tmpDir()
    val semi = s"$dir/semi.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(semi),
      "a;b;c\n1;x;1.0\n2;yz;\n")
    val df = QuackIO.readCsv(spark, Seq(semi))
    assert(df.schema.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 2)
    val pipe = s"$dir/pipe.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(pipe),
      "1|foo|2.5\n2|bar|3.5\n") // headerless AND non-comma, both sniffed
    val pf = QuackIO.readCsv(spark, Seq(pipe))
    assert(pf.schema.fieldNames.length == 3)
    assert(pf.count() == 2)
  }

  test("delimiter sniffing ignores delimiters inside quoted fields") {
    val p = s"${tmpDir()}/quoted.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
      "name;\"note; with semis\"\nx;\"y;z\"\n")
    val df = QuackIO.readCsv(spark, Seq(p))
    assert(df.schema.fieldNames.length == 2)
  }

  test("nullstr / quote / escape kwargs map onto the CSV reader (O-pass)") {
    val dir = tmpDir()
    val na = s"$dir/na.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(na),
      "a,b\nNA,x\n1,NA\n")
    val df = QuackIO.readCsv(spark, Seq(na),
      ReadOptions(nullstr = Some("NA")))
    val rows = df.orderBy("b").collect()
    assert(rows(0).isNullAt(1) && rows(0).getLong(0) == 1L) // b=NA -> null
    assert(rows(1).isNullAt(0) && rows(1).getString(1) == "x")
    // custom quote char: fields wrapped in ' keep their embedded commas
    val qf = s"$dir/quoted.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(qf),
      "a,b\n'x,y',1\n'z',2\n")
    val qdf = QuackIO.readCsv(spark, Seq(qf),
      ReadOptions(quote = Some("'"), header = Some(true)))
    assert(qdf.orderBy("b").collect().map(_.getString(0)).toSeq ==
      Seq("x,y", "z"))
    // custom escape char: backslash-escaped quote stays literal
    val ef = s"$dir/escaped.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(ef),
      "a,b\n\"x\\\"y\",1\n")
    val edf = QuackIO.readCsv(spark, Seq(ef),
      ReadOptions(escape = Some("\\"), header = Some(true)))
    assert(edf.head().getString(0) == "x\"y")
  }

  test("write-side nullstr renders nulls as the token, round-trips back") {
    val p = s"${tmpDir()}/na_out.csv"
    QuackIO.writeTable(fixture, p, WriteOptions(nullstr = Some("NA")))
    assert(readLines(p) == Seq("a,b,c", "1,x,1.0", "2,yz,NA"))
    assertSameRows(QuackIO.readCsv(spark, Seq(p),
      ReadOptions(nullstr = Some("NA"))), fixture)
  }

  test("JSON buffer source (S6 beyond CSV)") {
    val df = QuackIO.readJsonString(spark,
      """{"a":1,"b":"x"}""" + "\n" + """{"a":2,"b":"y"}""" + "\n")
    assert(df.schema.fieldNames.sorted.toSeq == Seq("a", "b"))
    assert(df.collect().map(_.getAs[Long]("a")).sorted.toSeq == Seq(1L, 2L))
  }

  test("parquet-from-bytes buffer source (S6 beyond CSV)") {
    val p = s"${tmpDir()}/bytes.parquet"
    QuackIO.writeTable(fixture, p)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    assertSameRows(QuackIO.readParquetBytes(spark, bytes), fixture)
  }

  test("readParquetWithMetadata returns data + footer KV in one call (S2b)") {
    val p = s"${tmpDir()}/meta.parquet"
    QuackIO.writeTable(fixture, p,
      WriteOptions(kvMetadata = Map("source" -> "spec", "k 2" -> "v \"q\"")))
    val (df, kv) = QuackIO.readParquetWithMetadata(spark, Seq(p))
    assertSameRows(df, fixture)
    assert(kv == Map("source" -> "spec", "k 2" -> "v \"q\""))
  }

  test("registerTables makes a directory SQL-queryable (S8)") {
    val names = QuackIO.registerTables(spark, "/root/testdata/sf0.001")
    assert(names.contains("lineitem") && names.contains("documents"))
    val n = spark.sql(
      "SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .head().getLong(0)
    assert(n > 0)
  }

  test("registerTables respects an explicitly chosen nanosAsLong conf") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val dir = tmpDir()
    QuackIO.writeTable(fixture, s"$dir/plain.parquet")
    spark.conf.set(key, "false") // the user's explicit choice
    try {
      assert(QuackIO.registerTables(spark, dir.toString) == Seq("plain"))
      assert(spark.conf.get(key) == "false", "explicit choice must survive")
    } finally spark.conf.set(key, "true")
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

  test("readUrls concatenates multiple URLs in order (S7 vector-of-files)") {
    val p = writeFixtureCsv()
    val url = java.nio.file.Paths.get(p).toUri.toString
    val df = QuackIO.readUrls(spark, Seq(url, url))
    assert(df.schema.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 4)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 1L, 2L, 2L))
  }

  test("collectColumns pivots to named column vectors (columntable parity)") {
    // mirrors the reference's columntable round-trip (test/runtests.jl:18-20)
    val p = writeFixtureCsv()
    val cols = QuackIO.collectColumns(
      QuackIO.readCsv(spark, Seq(p)).orderBy("a"))
    assert(cols.keys.toSeq == Seq("a", "b", "c")) // schema order preserved
    assert(cols("a").toSeq == Seq(1L, 2L))
    assert(cols("b").toSeq == Seq("x", "yz"))
    assert(cols("c").toSeq == Seq(1.0, null)) // missing -> null slot
    // duplicate column names would silently collapse in a name-keyed
    // map — must refuse instead
    val dup = QuackIO.readCsv(spark, Seq(p))
    val err = intercept[IllegalArgumentException] {
      QuackIO.collectColumns(dup.select(dup("a"), dup("b").as("a")))
    }
    assert(err.getMessage.contains("distinct column names"))
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
