package graft

/** Dev harness: write `.explain("formatted")` for named catalog queries to
  * files — the optimization-round evidence trail (`plans/rNN/<q>_before.txt`
  * / `_after.txt`). Usage:
  * `runMain graft.PlanDump <outDir> <suffix> <q1,q2,...>`
  * Files land at `<outDir>/<name>_<suffix>.txt`. Plans are resolved against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) in the same session shape as Bench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, list) = args
    val names = list.split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-plandump", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), txt)
      println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt " +
        s"(${txt.length} chars)")
    }
    spark.stop()
  }
}
