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

  test("ORC round-trip: single-file writeTable, guessed readFile, dir form") {
    val dir = tmpDir()
    val p = s"$dir/tbl.orc"
    QuackIO.writeTable(fixture, p)
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(p)),
      "writeTable must produce ONE file at the exact path")
    assertSameRows(QuackIO.readOrc(spark, Seq(p)), fixture)
    assertSameRows(QuackIO.readFile(spark, Seq(p)), fixture) // guessed
    val d = s"$dir/tbl_dir.orc"
    QuackIO.writeTableDir(fixture, d,
      WriteOptions(compression = Some("zstd")))
    assertSameRows(QuackIO.readOrc(spark, Seq(d)), fixture)
  }

  test("writeShards: capped file sizes, per-file sort, disjoint ranges") {
    import org.apache.spark.sql.functions.col
    val dir = s"${tmpDir()}/shards"
    // write in scrambled order so the layout work is real
    val df = spark.range(1000).select(
      ((col("id") * 677) % 1000).as("key"), col("id").as("payload"))
    QuackIO.writeShards(df, dir, "key", shards = 4, maxRecordsPerFile = 100)

    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).toSeq
    assert(files.size >= 10, s"4 shards of 250 rows capped at 100 → ≥10 " +
      s"files, got ${files.size}")
    // per-file: cap respected and rows sorted by key
    val perFile = files.map { f =>
      val keys = spark.read.parquet(f.toString)
        .select("key").collect().map(_.getLong(0)).toSeq
      assert(keys.size <= 100, s"${f.getName} has ${keys.size} rows")
      assert(keys == keys.sorted, s"${f.getName} not sorted")
      f.getName -> (keys.min, keys.max)
    }
    // shards (partition id = the part-NNNNN prefix) cover disjoint ranges
    val byShard = perFile.groupBy(_._1.split("-")(1)).toSeq.sortBy(_._1)
      .map { case (sid, fs) =>
        sid -> (fs.map(_._2._1).min, fs.map(_._2._2).max) }
    assert(byShard.size == 4, s"expected 4 shards, got ${byShard.map(_._1)}")
    byShard.sliding(2).foreach {
      case Seq((_, (_, maxA)), (_, (minB, _))) =>
        assert(maxA <= minB, s"shard ranges overlap: $byShard")
      case _ => ()
    }
    // nothing lost or duplicated
    assert(spark.read.parquet(dir).count() == 1000L)
  }

  test("zValue interleaves bits and is a bijection on the grid") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    // 5 = 101, 3 = 011 → interleaved (a even, b odd) = 011011 = 27
    val one = spark.range(1)
      .select(QuackIO.zValue(lit(5L), lit(3L), 3).as("z"))
      .head().getLong(0)
    assert(one == 27L)
    val grid = spark.range(64).select((col("id") / 8).cast("long").as("a"),
      (col("id") % 8).cast("long").as("b"))
    val zs = grid.select(QuackIO.zValue(col("a"), col("b"), 3).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == 64 && zs.min == 0L && zs.max == 63L)
  }

  test("zValue round-trips: de-interleaving recovers both operands") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // deterministic pseudo-random 21-bit pairs, one distributed pass
    val n = 200
    val lim = 1L << 21
    val pairs = (0 until n).map { i =>
      (math.abs(i * 2654435761L) % lim, math.abs(i * 40503L + 7) % lim)
    }
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        QuackIO.zValue(col("a"), col("b"), 21).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      var (ra, rb) = (0L, 0L)
      for (i <- 0 until 21) {
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
      }
      assert(ra == a && rb == b, s"z=$z decoded to ($ra,$rb), not ($a,$b)")
    }
  }

  test("writeZOrdered prunes second-column filters where a 1-key sort can't") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir()
    val zdir = s"$base/zorder"
    val sdir = s"$base/asort"
    val grid = spark.range(64 * 64).select(
      (col("id") / 64).cast("long").as("a"),
      (col("id") % 64).cast("long").as("b"))
    QuackIO.writeZOrdered(grid, zdir, "a", "b",
      shards = 4, maxRecordsPerFile = 256, bits = 6)
    QuackIO.writeShards(grid, sdir, "a",
      shards = 4, maxRecordsPerFile = 256)

    // per-file b min/max — what parquet row-group stats pruning sees for
    // the selective b-only predicate b IN [8, 15]
    def touched(dir: String): (Int, Int) = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).toSeq
      val hit = files.count { f =>
        val bs = spark.read.parquet(f.toString)
          .agg(org.apache.spark.sql.functions.min("b"),
            org.apache.spark.sql.functions.max("b"))
          .head()
        bs.getLong(0) <= 15L && bs.getLong(1) >= 8L
      }
      (hit, files.size)
    }
    val (zHit, zAll) = touched(zdir)
    val (sHit, sAll) = touched(sdir)
    assert(zAll >= 16 && sAll >= 16, s"caps must split files: $zAll, $sAll")
    // the a-sorted layout leaves b unordered inside every file → every
    // file's b stats straddle [8, 15]; the z-layout keeps b locally
    // bounded, so most files prune away
    assert(sHit == sAll, s"1-key layout should touch all files: $sHit/$sAll")
    assert(zHit * 2 <= zAll + 2,
      s"z-layout should prune most files: touched $zHit of $zAll")
    assert(spark.read.parquet(zdir).count() == 4096L)
    assert(spark.read.parquet(zdir).columns.toSeq.sorted == Seq("a", "b"))
  }

  test("compactDir: many small files become few, rows survive exactly, " +
      "in-place compaction refused") {
    val src = s"${tmpDir()}/compact_src"
    val dst = s"${tmpDir()}/compact_dst"
    // many tiny files — the streaming-ingest small-files signature
    // (AQE may coalesce the 40 requested partitions; count what landed)
    spark.range(40).repartition(40)
      .write.mode("overwrite").parquet(src)
    val srcFiles = new java.io.File(src).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(srcFiles > 5, s"fixture produced only $srcFiles files")
    val (inFiles, outParts) = QuackIO.compactDir(spark, src, dst)
    assert(inFiles == srcFiles && outParts == 1)
    val outFiles = new java.io.File(dst).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles == 1, s"expected one compacted file, got $outFiles")
    assert(spark.read.parquet(dst).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq == (0L until 40L))
    // shuffle=true path also preserves rows
    val dst2 = s"${tmpDir()}/compact_dst2"
    QuackIO.compactDir(spark, src, dst2, shuffle = true)
    assert(spark.read.parquet(dst2).count() == 40)
    intercept[IllegalArgumentException](
      QuackIO.compactDir(spark, src, src))
    intercept[IllegalArgumentException](
      QuackIO.compactDir(spark, src, dst, targetFileBytes = 1024))
  }

  test("schemaDiff: added/removed/type_changed/unchanged, metadata-only") {
    import spark.implicits._
    val oldDf = Seq((1L, "a", 1.0)).toDF("id", "name", "score")
    val newDf = Seq((1L, 2, true)).toDF("id", "score", "flag")
    val d = QuackIO.schemaDiff(oldDf, newDf)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    assert(d("id") == (("unchanged", "bigint", "bigint")))
    assert(d("name") == (("removed", "string", null)))
    assert(d("score") == (("type_changed", "double", "int")))
    assert(d("flag") == (("added", null, "boolean")))
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

  test("unionWiden: drifted types widen losslessly (int→long, " +
      "float→double, mixed→double, any→string, decimal covering), " +
      "missing columns null-fill, unwidenable pairs raise by name") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val jan = Seq((1, 1.5f, 10L)).toDF("id", "score", "extra")
    val mar = Seq((2L, 2.5, "v2")).toDF("id", "score", "version")
    val u = QuackIO.unionWiden(jan, mar)
    assert(u.schema.map(f => f.name -> f.dataType.simpleString) ==
      Seq("id" -> "bigint", "score" -> "double", "extra" -> "bigint",
        "version" -> "string"))
    val rows = u.orderBy("id").collect()
    assert(rows(0).getLong(0) == 1L && rows(0).getDouble(1) == 1.5 &&
      rows(0).getLong(2) == 10L && rows(0).isNullAt(3))
    assert(rows(1).getLong(0) == 2L && rows(1).getDouble(1) == 2.5 &&
      rows(1).isNullAt(2) && rows(1).getString(3) == "v2")
    // drift INTO string: the universal supertype
    val s2 = QuackIO.unionWiden(Seq(7L).toDF("k"),
      Seq("seven").toDF("k")).orderBy("k").collect()
      .map(_.getString(0)).toSeq
    assert(s2 == Seq("7", "seven"))
    // decimals widen to the covering precision/scale
    val d1 = Seq(BigDecimal("12345678.99")).toDF("d")
      .select(col("d").cast("decimal(10,2)").as("d"))
    val d2 = Seq(BigDecimal("1.2345")).toDF("d")
      .select(col("d").cast("decimal(12,4)").as("d"))
    assert(QuackIO.unionWiden(d1, d2).schema.head.dataType.simpleString
      == "decimal(12,4)")
    // a covering type that cannot fit in precision 38 is NOT lossless:
    // raise, never silently drop whole digits
    val dWide = Seq(BigDecimal(1)).toDF("d")
      .select(col("d").cast("decimal(38,0)").as("d"))
    val dFrac = Seq(BigDecimal(1)).toDF("d")
      .select(col("d").cast("decimal(10,10)").as("d"))
    assert(intercept[IllegalArgumentException] {
      QuackIO.unionWiden(dWide, dFrac)
    }.getMessage.contains("'d'"))
    assert(intercept[IllegalArgumentException] {
      QuackIO.unionWiden(Seq(Seq(1)).toDF("x"), Seq(1).toDF("x"))
    }.getMessage.contains("'x'"))
    assert(intercept[IllegalArgumentException] {
      QuackIO.unionWiden(jan, mar, allowMissing = false)
    }.getMessage.contains("version"))
  }

  test("flattenStructs: nested structs lift to dotted-to-sep names, " +
      "arrays pass through, collisions raise by name") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val nested = Seq((1L, "hi", 2.5, Seq(7, 8))).toDF("id", "s", "v", "arr")
      .select(col("id"),
        struct(col("s").as("txt"),
          struct(col("v").as("x"), (col("v") * 2).as("y")).as("inner"))
          .as("meta"),
        col("arr"))
    val flat = QuackIO.flattenStructs(nested)
    assert(flat.columns.toSeq ==
      Seq("id", "meta_txt", "meta_inner_x", "meta_inner_y", "arr"))
    val r = flat.collect().head
    assert(r.getLong(0) == 1L && r.getString(1) == "hi" &&
      r.getDouble(2) == 2.5 && r.getDouble(3) == 5.0 &&
      r.getSeq[Int](4) == Seq(7, 8))
    // null struct → null leaves; array-of-struct passes through whole
    val withNull = Seq((1L, Some((2L, 3L))), (2L, None))
      .toDF("id", "p")
    val f2 = QuackIO.flattenStructs(withNull)
    assert(f2.columns.toSeq == Seq("id", "p__1", "p__2"))
    assert(f2.collect().map(r2 => r2.isNullAt(1)).toSeq ==
      Seq(false, true))
    // collision: a struct a{b} next to a literal a_b column
    val clash = Seq((1, 2)).toDF("x", "a_b")
      .select(struct(col("x").as("b")).as("a"), col("a_b"))
    val e2 = intercept[IllegalArgumentException] {
      QuackIO.flattenStructs(clash)
    }
    assert(e2.getMessage.contains("a_b"), e2.getMessage)
    // a different separator resolves it
    assert(QuackIO.flattenStructs(clash, sep = ".").columns.toSeq ==
      Seq("a.b", "a_b"))
  }
}
