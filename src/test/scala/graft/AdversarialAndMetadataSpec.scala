package graft

/** Mirrors the reference's adversarial-filename testitem
  * (`test/runtests.jl:47-64`) and the metadata testitem (`:150-173`). */
class AdversarialAndMetadataSpec extends TestBase {

  test("filenames with spaces/quotes/backslashes round-trip (K11)") {
    val dir = tmpDir()
    val p = s"$dir/ \\ ''' abc '' def ' .csv"
    QuackIO.writeTable(fixture, p)
    assert(readLines(p) == Seq("a,b,c", "1,x,1.0", "2,yz,"))
    assertSameRows(QuackIO.readCsv(spark, Seq(p)), fixture)
  }

  test("column name with space renames via select pair (Q1 adversarial)") {
    val dir = tmpDir()
    val p = s"$dir/t.csv"
    val f = fixture
    val df = f.select(f("a").as("a b"))
    QuackIO.writeTable(df, p)
    val back = QuackIO.readCsv(spark, Seq(p),
      ReadOptions(select = Seq(Sel("a b", Some("c d")))))
    assert(back.schema.fieldNames.toSeq == Seq("c d"))
    assert(back.count() == 2)
  }

  test("parquet KV metadata round-trips incl. quotes in values (K9)") {
    val dir = tmpDir()
    val p = s"$dir/meta.parquet"
    val kv = Map("writer" -> "Quack'IO", "1" -> "2")
    QuackIO.writeTable(fixture, p,
      WriteOptions(kvMetadata = kv, compression = Some("zstd")))
    assert(ParquetMetadata.read(p) == kv)
    // data survives the footer rewrite
    assertSameRows(QuackIO.readParquet(spark, Seq(p)), fixture)
  }

  test("KV metadata on adversarial path (K9 + K11)") {
    val dir = tmpDir()
    val p = s"$dir/ quote' file .parquet"
    QuackIO.writeTable(fixture, p, WriteOptions(kvMetadata = Map("k" -> "v")))
    assert(ParquetMetadata.read(p) == Map("k" -> "v"))
  }

  test("metadata silently ignored for CSV format (K9 contract)") {
    val dir = tmpDir()
    val p = s"$dir/m.csv"
    QuackIO.writeTable(fixture, p,
      WriteOptions(kvMetadata = Map("writer" -> "w")))
    assert(readLines(p).head == "a,b,c")
  }

  test("attach merges without clobbering existing user keys") {
    val dir = tmpDir()
    val p = s"$dir/m2.parquet"
    QuackIO.writeTable(fixture, p, WriteOptions(kvMetadata = Map("a" -> "1")))
    ParquetMetadata.attach(p, Map("b" -> "2"))
    assert(ParquetMetadata.read(p) == Map("a" -> "1", "b" -> "2"))
  }

  test("writeTableDir attaches kvMetadata to EVERY part file") {
    import scala.jdk.CollectionConverters._
    val d = s"${tmpDir()}/sharded"
    val kv = Map("writer" -> "quackio", "run" -> "r6")
    // repartition(3) forces multiple part files; each must carry the KV
    QuackIO.writeTableDir(fixture.repartition(3), d,
      WriteOptions(format = Some("parquet"), kvMetadata = kv))
    val parts = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      .iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(parts.size > 1, s"expected multiple parts, got $parts")
    parts.foreach(p => assert(ParquetMetadata.read(p.toString) == kv,
      s"missing/incomplete KV on $p"))
    // data survives every footer rewrite, dir still reads as one table
    assertSameRows(QuackIO.readParquet(spark, Seq(d)), fixture)
    // and the dir path still ignores kvMetadata for non-parquet formats
    val c = s"${tmpDir()}/csvdir"
    QuackIO.writeTableDir(fixture, c,
      WriteOptions(format = Some("csv"), kvMetadata = kv))
    assert(QuackIO.readCsv(spark, Seq(c)).count() == 2)
  }

  test("writeTableDir + kvMetadata refuses a remote URI BEFORE writing " +
    "(the footer rewrite is local-only; a post-write throw would be " +
    "worse than the old silent ignore)") {
    val e = intercept[IllegalArgumentException] {
      QuackIO.writeTableDir(fixture, "s3a://bucket/out",
        WriteOptions(format = Some("parquet"),
          kvMetadata = Map("k" -> "v")))
    }
    assert(e.getMessage.contains("driver-local"))
    // no kvMetadata → no local-path requirement: the guard must not
    // reject remote URIs for plain dir writes (this fails on the
    // MISSING s3a filesystem, proving the write was attempted)
    intercept[Exception] {
      QuackIO.writeTableDir(fixture, "s3a://bucket/out",
        WriteOptions(format = Some("parquet")))
    }
  }

  test("writeTableDir + kvMetadata accepts a file: URI (driver-local, " +
    "the scheme Spark's local fs itself renders)") {
    import scala.jdk.CollectionConverters._
    val d = s"${tmpDir()}/fileuri"
    val kv = Map("k" -> "v")
    QuackIO.writeTableDir(fixture.repartition(2), s"file://$d",
      WriteOptions(format = Some("parquet"), kvMetadata = kv))
    val parts = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      .iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(parts.nonEmpty, s"no part files under $d")
    parts.foreach(p => assert(ParquetMetadata.read(p.toString) == kv,
      s"missing KV on $p"))
    assertSameRows(QuackIO.readParquet(spark, Seq(d)), fixture)
  }

  test("writeTableDir + kvMetadata: an UNENCODED file: URI with a space " +
    "falls back to textual scheme-stripping instead of a raw URI parse " +
    "error") {
    import scala.jdk.CollectionConverters._
    // java.net.URI.create("file:/...out dir") throws on the space; the
    // path is perfectly legal driver-local output and must still write
    // and carry footers end-to-end
    val d = s"${tmpDir()}/out dir"
    val kv = Map("k" -> "v")
    QuackIO.writeTableDir(fixture.repartition(2), s"file:$d",
      WriteOptions(format = Some("parquet"), kvMetadata = kv))
    val parts = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      .iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).toSeq
    assert(parts.nonEmpty, s"no part files under $d")
    parts.foreach(p => assert(ParquetMetadata.read(p.toString) == kv,
      s"missing KV on $p"))
    assertSameRows(QuackIO.readParquet(spark, Seq(d)), fixture)
  }
}
