package graft

/** Dev harness: time one named catalog query twice (cold + warm) in the
  * same session/config shape as Bench. `runMain graft.ProfileOne <name>`.
  *
  * Measures through the `noop` sink exactly like [[Bench]] — a bare
  * `.count()` lets Catalyst prune unreferenced projections and
  * under-measures projection-heavy queries, so ProfileOne numbers would
  * not be comparable to the bench they're meant to explain. */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q24_dedup_exact")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-profone", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    def run(): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime(); run()
    val t1 = System.nanoTime(); run()
    val t2 = System.nanoTime()
    println(f"PROFONE $name cold=${(t1 - t0) / 1e9}%.2f warm=${(t2 - t1) / 1e9}%.2f")
    spark.stop()
  }
}
