package graft

/** Dev harness: write the POST-EXECUTION physical plan for named catalog
  * queries to files — the runtime (post-AQE) evidence [[PlanDump]] cannot
  * produce. `PlanDump` prints `explain("formatted")` BEFORE execution, so
  * with AQE on it shows the initial plan (`isFinalPlan=false`): join
  * strategies the adaptive re-planner picks at runtime (e.g. the
  * SortMergeJoin → ShuffledHashJoin switch `preferSortMergeJoin=false`
  * enables on real shuffle sizes) are invisible there. This harness runs
  * each query through the noop sink first (Bench semantics), then dumps
  * `queryExecution.executedPlan` — the AdaptiveSparkPlan with
  * `isFinalPlan=true` and the actually-executed join nodes.
  *
  * Usage: `runMain graft.ExecPlanDump <outDir> <suffix> <q1,q2,...>`.
  * Files land at `<outDir>/<name>_<suffix>.txt`. Resolved against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), same session shape as Bench. */
object ExecPlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: ExecPlanDump <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, list) = args
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-execplandump",
        cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val txt = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"EXECPLANDUMP wrote $outDir/${name}_$suffix.txt " +
        s"(${txt.length} chars)")
    }
    spark.stop()
  }
}
