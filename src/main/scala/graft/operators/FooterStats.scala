package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Metadata-only parquet statistics — answers from FOOTERS, never data
  * pages. At 100 TB a `count(*)` that scans is hours; the row counts
  * already sit in every file's footer, and reading a footer is one
  * ~KB-sized ranged read. Same story for min/max zone maps: they are
  * what the engine's own partition pruning consults, surfaced here as a
  * first-class layout-health diagnostic (is my Z-order / shard sort
  * actually giving disjoint ranges? what fraction of files does this
  * predicate prune?).
  *
  * Distribution model: the driver only LISTS the directory (the same
  * metadata operation query planning performs); the footer reads fan
  * out as a Spark job over the file list — 100k files = 100k ~KB reads
  * spread across the cluster, zero data-page I/O. The Hadoop conf
  * travels via [[SerializableConfiguration]] so credentials/FS settings
  * reach executors on any Hadoop-compatible store.
  *
  * The reference reaches the same numbers through DuckDB's
  * `parquet_metadata()`/`parquet_file_metadata()` table functions
  * (available to any `read_parquet` caller, `ref/src/QuackIO.jl:33`);
  * here they are driver-free distributed scans.
  */
object FooterStats {

  /** Files under `path` (a single parquet file, a directory of part
    * files, or a PARTITIONED tree of `key=value` subdirectories —
    * listing is recursive), with sizes. Hidden/metadata entries
    * (`_SUCCESS`, `.crc`, and anything under a `_`/`.`-prefixed
    * directory) are skipped — the same filter Spark's own listing
    * applies. */
  private def listParquet(spark: SparkSession, path: String)
      : Seq[(String, Long)] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    val base = st.getPath.toString
    val files =
      if (st.isDirectory) {
        val it = fs.listFiles(p, true)
        val buf = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
        while (it.hasNext) buf += it.next()
        buf.result()
      } else Seq(st)
    files
      .filter(_.isFile)
      .filter { f =>
        // every path component below the base must be visible
        val rel = f.getPath.toString.stripPrefix(base).stripPrefix("/")
        rel.split('/').forall(seg =>
          !seg.startsWith("_") && !seg.startsWith("."))
      }
      .map(f => (f.getPath.toString, f.getLen))
  }

  /** Per-file row counts and sizes, computed on executors from footers
    * alone. Columns: `file`, `rows`, `bytes`, `row_groups`. */
  def fileRowCounts(spark: SparkSession, path: String): DataFrame = {
    val files = listParquet(spark, path)
    require(files.nonEmpty, s"FooterStats: no files under $path")
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val ds: Dataset[(String, Long)] =
      spark.createDataset(files)(
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaLong))
    ds.repartition(math.min(files.size,
        spark.sessionState.conf.numShufflePartitions))
      .mapPartitions { it =>
        it.map { case (f, bytes) =>
          val in = HadoopInputFile.fromPath(new Path(f), conf.value)
          val reader = ParquetFileReader.open(in)
          try {
            val blocks = reader.getFooter.getBlocks.asScala
            (f, blocks.map(_.getRowCount).sum, bytes, blocks.size)
          } finally reader.close()
        }
      }
      .toDF("file", "rows", "bytes", "row_groups")
  }

  /** Total row count of a parquet table without touching a data page:
    * one footer read per file, summed. Column: `total_rows`. */
  def totalRows(spark: SparkSession, path: String): DataFrame =
    fileRowCounts(spark, path)
      .agg(sum(col("rows")).as("total_rows"))

  /** Per-(file, column) zone map from footer column-chunk statistics:
    * min/max rendered as strings (uniform schema across types — the
    * DIAGNOSTIC form; use [[prunableFiles]] for typed comparisons),
    * null count, and whether any chunk lacked statistics. Row-group
    * chunks aggregate per file (min of mins / max of maxes), matching
    * what file-level pruning can use. */
  def zoneMap(spark: SparkSession, path: String,
      columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "FooterStats.zoneMap: no columns requested")
    val files = listParquet(spark, path)
    require(files.nonEmpty, s"FooterStats: no files under $path")
    val conf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val want = columns.toSet
    import spark.implicits._
    spark.createDataset(files.map(_._1))(
        org.apache.spark.sql.Encoders.STRING)
      .repartition(math.min(files.size,
        spark.sessionState.conf.numShufflePartitions))
      .mapPartitions { it =>
        it.flatMap { f =>
          val in = HadoopInputFile.fromPath(new Path(f), conf.value)
          val reader = ParquetFileReader.open(in)
          try {
            val blocks = reader.getFooter.getBlocks.asScala.toSeq
            val byCol = blocks
              .flatMap(_.getColumns.asScala)
              .filter(c => want.contains(c.getPath.toDotString))
              .groupBy(_.getPath.toDotString)
            byCol.toSeq.sortBy(_._1).map { case (cn, chunks) =>
              val stats = chunks.map(_.getStatistics)
              val missing = stats.exists(s =>
                s == null || !s.hasNonNullValue)
              val mins: Seq[Any] =
                stats.filter(s => s != null && s.hasNonNullValue)
                  .map(_.genericGetMin)
              val maxs: Seq[Any] =
                stats.filter(s => s != null && s.hasNonNullValue)
                  .map(_.genericGetMax)
              val nulls = stats.filter(_ != null)
                .map(s => if (s.isNumNullsSet) s.getNumNulls else 0L).sum
              def render(vs: Seq[Any], takeMax: Boolean): String =
                if (vs.isEmpty) null
                else {
                  val c: Seq[Comparable[Any]] = vs.map {
                    case b: org.apache.parquet.io.api.Binary =>
                      b.toStringUsingUTF8.asInstanceOf[Comparable[Any]]
                    case o => o.asInstanceOf[Comparable[Any]]
                  }
                  val picked = c.reduce((a, b) =>
                    if ((a.compareTo(b) >= 0) == takeMax) a else b)
                  String.valueOf(picked)
                }
              (f, cn, render(mins, takeMax = false),
                render(maxs, takeMax = true), nulls, missing)
            }
          } finally reader.close()
        }
      }
      .toDF("file", "column", "min", "max", "nulls", "stats_missing")
  }

  /** Metadata-only LAYOUT VALIDATION: did a range-sharded / Z-ordered
    * write actually produce disjoint, prunable `column` ranges? Reads
    * only footers ([[zoneMap]]); returns one row per file ordered by
    * its min with `overlaps_prev` — a layout is healthy when every
    * row is false. The check a release pipeline runs on its shard
    * output before declaring the layout contract met (a silent sort
    * regression otherwise only shows up as slow pruning months
    * later). Files without stats count as overlapping (unprovable ≠
    * healthy). */
  def rangeLayoutReport(spark: SparkSession, path: String,
      column: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val zm = zoneMap(spark, path, Seq(column))
      .select(col("file"),
        col("min").cast("double").as("zmin"),
        col("max").cast("double").as("zmax"),
        col("stats_missing"))
    // per-file rows: tiny table (one row per file — at 100 TB that is
    // ~10^5–10^6 KB-sized rows, comfortably single-task), ordered on
    // `__`-staged copies so the bounded window is exempt from
    // UnpartitionedWindowGuard's fail mode (the `__pid` convention)
    val staged = zm.withColumn("__zmin", col("zmin"))
      .withColumn("__zfile", col("file"))
    val w = Window.orderBy(col("__zmin"), col("__zfile"))
    staged.withColumn("__prevMax", lag(col("zmax"), 1).over(w))
      .withColumn("overlaps_prev",
        col("stats_missing") || col("zmin").isNull ||
          coalesce(col("__prevMax") >= col("zmin"), lit(false)))
      .select(col("file"), col("zmin"), col("zmax"),
        col("overlaps_prev"))
  }

  /** Files whose footer statistics CANNOT rule out rows with
    * `column` in `[lo, hi]` — the file-level pruning set for a numeric
    * range predicate, plus the would-scan fraction. A file with any
    * chunk missing statistics is conservatively kept (exactly what the
    * engine's pruning does). Columns: `file`, `rows`, `prunable`. */
  def prunableFiles(spark: SparkSession, path: String, column: String,
      lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, s"FooterStats.prunableFiles: lo $lo > hi $hi")
    val zm = zoneMap(spark, path, Seq(column))
      .select(col("file"),
        col("min").cast("double").as("zmin"),
        col("max").cast("double").as("zmax"),
        col("stats_missing"))
    val rc = fileRowCounts(spark, path).select(col("file"), col("rows"))
    rc.join(zm, Seq("file"), "left")
      .withColumn("prunable",
        !col("stats_missing") && col("zmin").isNotNull &&
          (col("zmin") > lit(hi) || col("zmax") < lit(lo)))
      .withColumn("prunable", coalesce(col("prunable"), lit(false)))
      .select("file", "rows", "prunable")
  }
}
