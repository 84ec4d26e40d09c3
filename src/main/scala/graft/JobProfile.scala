package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import scala.collection.mutable

/** Dev harness: run one catalog query through the noop sink (Bench
  * semantics) and print a per-job wall-time breakdown plus the
  * plan-construction and plan-to-first-job latency — separates driver
  * work (analysis/optimization/codegen) from executor work when a bench
  * number needs explaining. `runMain graft.JobProfile <name> [reps]`. */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q24_dedup_exact")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-jobprofile",
        cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = mutable.Map.empty[Int, (Long, String)]
    val done = mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description"))
            .getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.remove(j.jobId).foreach { case (t0, d) =>
          done += ((j.jobId, (System.nanoTime() - t0) / 1e9, d))
        }
    })
    val fn = SparkEntry.queries(name)
    for (r <- 1 to reps) {
      done.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain before reading `done`
      println(f"JOBPROFILE $name rep=$r construct=${(t1 - t0) / 1e9}%.2f " +
        f"action=${(t2 - t1) / 1e9}%.2f total=${(t2 - t0) / 1e9}%.2f " +
        f"jobs=${done.size} jobSecs=${done.map(_._2).sum}%.2f")
      done.sortBy(-_._2).take(12).foreach { case (id, s, d) =>
        println(f"  job $id%3d ${s}%6.2f s  $d")
      }
    }
    spark.stop()
  }
}
