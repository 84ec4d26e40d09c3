package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage pinning with a cluster-durable escape hatch.
  *
  * Iterative and chained-cumulative operators (Graph sweeps, the
  * Rank.globalRunningSum passes, ksTest/wasserstein1/bestThreshold/
  * kaplanMeier stage pins) MUST cut lineage per stage or the plan
  * doubles per iteration (the documented expression-doubling class).
  * `localCheckpoint(eager = true)` does that at executor-memory speed,
  * but it stores the blocks ONLY on the executors that computed them:
  * lose an executor and both the lineage and the data are gone — an
  * acceptable trade in `local[32]`, the wrong default story on a
  * 1000-executor cluster where preemption is routine.
  *
  * [[pin]] keeps the fast local path as the default and switches every
  * call site to a RELIABLE `checkpoint()` when the session sets
  *
  * {{{ spark.conf.set("graft.checkpoint.dir", "hdfs://…/ckpt") }}}
  *
  * (any Hadoop-visible URI — HDFS/S3A/local). The first reliable pin
  * installs the directory as the SparkContext checkpoint dir (unless
  * the caller already set one, which wins); every pinned stage then
  * survives executor loss at the cost of one write+read of the pinned
  * data per stage. Both paths are EAGER, so the barrier semantics the
  * operators rely on (checkpoint-before-reuse, exchange dedup) are
  * identical — only durability and speed differ. */
object Checkpoints {

  /** Session conf key: set to a durable directory URI to make every
    * [[pin]] a reliable `checkpoint()`; unset (default) pins with
    * executor-local `localCheckpoint`. */
  val ConfKey = "graft.checkpoint.dir"

  /** Eagerly pin `df`'s lineage: reliable `checkpoint()` into
    * `graft.checkpoint.dir` when that conf is set, executor-local
    * `localCheckpoint` otherwise. */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // respect a caller-installed checkpoint dir; install ours once
        // (setCheckpointDir mints a fresh UUID subdir per call)
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** `df.pinned` sugar for [[pin]] at the 48 operator call sites. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = pin(df)
  }
}
