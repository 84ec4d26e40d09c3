package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time one named catalog query twice (cold + warm) in the
  * same session/config shape as Bench. `runMain graft.ProfileOne <name>`. */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q24_dedup_exact")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val t0 = System.nanoTime(); fn(spark, sfDir).count()
    val t1 = System.nanoTime(); fn(spark, sfDir).count()
    val t2 = System.nanoTime()
    println(f"PROFONE $name cold=${(t1 - t0) / 1e9}%.2f warm=${(t2 - t1) / 1e9}%.2f")
    spark.stop()
  }
}
