package graft

import org.apache.spark.sql.functions._

/** Regenerates `fixtures/deflate_lengths.parquet` — the committed
  * oracle input for q271_compression_ratio (zlib is not
  * SQL-expressible, so the driver's DuckDB side reads PINNED deflate
  * lengths and recomputes only the ratio independently).
  *
  * Recipe (the out-of-band knowledge this main makes executable):
  * for every DISTINCT non-null non-empty `text` with `doc_id < 400`
  * at the three gate scales (sf0.001/sf0.01/sf0.1 — override via
  * args), pin `h = md5(utf8(text))` (lowercase hex) against
  * `deflated` = the byte length of a LEVEL-6 `java.util.zip.Deflater`
  * pass over the UTF-8 bytes (zlib wrapper included — the engine's
  * own codec; JVM zlib is deterministic for fixed input + level, and
  * the recorded python-zlib cross-check is byte-identical). Rows are
  * h-sorted for a reproducible file.
  *
  * Output path is `fixtures/deflate_lengths.parquet` RELATIVE TO THE
  * WORKING DIRECTORY (run from the repo root); the single-file write
  * rides [[QuackIO.writeTable]]. Prints a drift report against the
  * previous fixture when one exists. The `CorpusOpsSpec` fixture-sync
  * test re-derives every gate-scale text at sbt-test time, so a
  * regenerated testdata set that misses this main fails there, not at
  * the driver. */
object GenDeflateFixture {
  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
    val outPath = new java.io.File("fixtures/deflate_lengths.parquet")
      .getAbsolutePath
    val spark = GraftSession.builder("local[8]", "gen-deflate-fixture", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val texts = sfDirs.map { d =>
      spark.read.parquet(s"$d/documents.parquet")
        .filter(col("doc_id") < 400 && col("text").isNotNull &&
          col("text") =!= "")
        .select("text")
    }.reduce(_ unionByName _).distinct()
      .collect().map(_.getString(0)) // bounded: ≤400 texts per SF dir

    val deflater = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](1 << 16)
    def deflatedLen(text: String): Long = {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      deflater.reset(); deflater.setInput(bytes); deflater.finish()
      var n = 0L
      while (!deflater.finished()) n += deflater.deflate(buf)
      n
    }
    def md5hex(text: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString

    val rows = texts.map(t => (md5hex(t), deflatedLen(t))).sortBy(_._1)

    val prev = new java.io.File(outPath)
    if (prev.exists()) {
      val old = spark.read.parquet(outPath)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val changed = rows.count { case (h, n) => !old.get(h).contains(n) }
      val dropped = (old.keySet -- rows.map(_._1).toSet).size
      println(s"[gen-deflate-fixture] previous fixture: ${old.size} " +
        s"rows; changed-or-new $changed, dropped $dropped")
    }
    QuackIO.writeTable(rows.toSeq.toDF("h", "deflated"), outPath)
    println(s"[gen-deflate-fixture] wrote ${rows.length} rows -> $outPath")
    spark.stop()
  }
}
