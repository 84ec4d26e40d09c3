package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Column names whose type the driver's pandas differ cannot
    * canonicalize (it sorts rows by every column; ndarray/dict cells
    * raise `unhashable type`). Catalog entries must be fixed-width —
    * unpivot arrays with `posexplode` (the q74/q91/q92 lesson). Shared
    * with the spec that sweeps every catalog entry. */
  private[graft] def differIncompatibleColumns(
      schema: org.apache.spark.sql.types.StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
        || f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType]
        || f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
        f.name
    }.toSeq

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession carries the engine's scale posture (AQE, skew-join,
    // UTC, nanos-as-long) — Verify runs the same session the library
    // recommends, not bare defaults.
    val b0 = GraftSession
      .builder(s"local[$cpus]", "graft-verify", cpus.toInt)
      .config("spark.ui.enabled", "false")
    // guard drill: SPARK_GRAFT_GUARDS=fail (or warn) installs the
    // GraftExtensions guard rules and runs the FULL catalog under them
    // — both the analysis-time checks and the executed-plan
    // CartesianExecGuard fire, because Verify executes every entry
    val guards = sys.env.get("SPARK_GRAFT_GUARDS").filter(_.nonEmpty)
    val spark = guards
      .fold(b0)(_ => b0.withExtensions(new graft.plans.GraftExtensions()))
      .getOrCreate()
    guards.foreach { m =>
      Seq("unpartitionedWindow", "cartesianProduct", "unboundedFollowing")
        .foreach(k => spark.conf.set(s"spark.graft.guard.$k", m))
    }
    spark.sparkContext.setLogLevel("WARN")
    // durability drill (mirrors Soak): SPARK_GRAFT_CHECKPOINT_DIR
    // reroutes every Checkpoints.pin to reliable checkpoint() so the
    // FULL catalog's correctness can be gated on the durable path
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").foreach(d =>
      spark.conf.set(graft.operators.Checkpoints.ConfKey, d))
    new java.io.File(outDir).mkdirs()
    // builder-side iteration aid: SPARK_GRAFT_ONLY=q110_x,q123_y dumps
    // just those entries; unset (the driver) dumps the full catalog
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = differIncompatibleColumns(df.schema)
        if (bad.nonEmpty) throw new IllegalStateException(
          s"catalog entry '$name' outputs array/map/struct column(s) " +
            s"${bad.mkString(", ")} — the driver's differ cannot sort " +
            "them; unpivot to fixed-width rows (posexplode) instead")
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
