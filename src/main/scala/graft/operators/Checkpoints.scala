package graft.operators

import org.apache.spark.internal.Logging
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

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
  * survives executor loss. Both paths are EAGER, so the barrier
  * semantics the operators rely on (checkpoint-before-reuse, exchange
  * dedup) are identical — only durability and speed differ.
  *
  * ==Reliable-path cost==
  * `Dataset.checkpoint(eager = true)` runs TWO jobs over the pinned
  * plan: the eager materialization, then the checkpoint-write job the
  * scheduler appends — i.e. compute-twice + write + read-back, not
  * "one write + read". [[pin]] neutralizes the second compute by
  * persisting the stage (MEMORY_AND_DISK) around the checkpoint call
  * when the caller hasn't already cached it: compute #1 fills the
  * cache, the write job re-reads blocks instead of re-running the
  * stage, and the transient cache is dropped before returning.
  * Caveat: the transient persist only helps when [[pin]] runs the
  * Dataset's FIRST action — a caller that already forced the same
  * Dataset object computes that earlier action un-cached and the pin
  * still computes once more to fill the cache (perf-only; results are
  * identical either way).
  *
  * ==Reliable-path file lifecycle==
  * Every reliable pin writes a permanent `rdd-N` directory under the
  * checkpoint dir; Spark never deletes one on its own unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
  * SparkContext-construction conf — [[graft.GraftSession]] sets it, so
  * sessions built there reclaim a pin's files once the pinned Dataset
  * is garbage-collected on the driver). That GC hook is asynchronous
  * and reference-driven, which is the wrong tool for ITERATIVE sweeps:
  * a 50-iteration pagerank holds every superseded generation's files
  * until the driver happens to collect, multiplying steady-state
  * footprint by iteration count. Iterative operators therefore pin
  * through a [[Chain]], which deletes a generation's files
  * DETERMINISTICALLY as soon as it is provably dead (two generations
  * behind the newest pin — see [[Chain]] for why not one). */
object Checkpoints extends Logging {

  /** Count of reclaim attempts that could not delete their target —
    * observable evidence of a DEGRADED lifecycle (each failure is also
    * logged): the Chain falls back to accumulate-until-cleaner for
    * that generation, which the Soak `ckpt_bytes` gate would otherwise
    * be the only thing to notice. */
  private[graft] val failedReclaims =
    new java.util.concurrent.atomic.AtomicLong

  /** Best-effort recursive delete of a superseded checkpoint
    * generation. Never throws — a failed delete degrades to the
    * pre-Chain accumulate-until-cleaner behavior, never to a failed
    * job — but it is NOT silent: failures log a warning and tick
    * [[failedReclaims]] (a delete that returns false against a
    * still-existing path counts too; `delete` on an already-gone path
    * is success, there is nothing left to reclaim). */
  private[graft] def reclaim(
      spark: org.apache.spark.sql.SparkSession, path: String): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.delete(p, true) || !fs.exists(p)) true
      else {
        failedReclaims.incrementAndGet()
        logWarning(s"Checkpoints.Chain: could not reclaim superseded " +
          s"checkpoint generation $path — lifecycle degrades to " +
          "accumulate-until-cleaner for this generation")
        false
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        failedReclaims.incrementAndGet()
        logWarning(s"Checkpoints.Chain: could not reclaim superseded " +
          s"checkpoint generation $path — lifecycle degrades to " +
          "accumulate-until-cleaner for this generation", e)
        false
    }

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
        // transient cache so the checkpoint-write job reads blocks
        // instead of recomputing the stage (see scaladoc); skipped when
        // the caller cached the frame — unpersisting here would clobber
        // their cache registration
        val weCache = df.storageLevel == StorageLevel.NONE
        if (weCache) df.persist(StorageLevel.MEMORY_AND_DISK)
        try df.checkpoint(eager = true)
        finally { if (weCache) df.unpersist(blocking = false) }
      case None => df.localCheckpoint(eager = true)
    }
  }

  /** The `rdd-N` checkpoint directory backing a [[pin]] result —
    * `Some` only on the reliable path (local checkpoints keep blocks,
    * not files). The pinned Dataset's plan is a single `LogicalRDD`
    * over the checkpointed rows. */
  private[graft] def checkpointFileOf(df: DataFrame): Option[String] =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.flatMap(_.getCheckpointFile)

  /** Generation-tracked pinning for ITERATIVE sweeps (pagerank, label
    * propagation, k-core peeling, BFS frontiers, hash-min/star
    * components): each `chain.pin` supersedes earlier ones, so their
    * reliable-checkpoint files are garbage — but not instantly. The
    * step that PRODUCES generation N reads generation N−1, and several
    * loops also probe N−1 AFTER N materializes (the convergence check
    * in Connected.components joins `next` against the previous
    * labels), so the youngest TWO generations stay live and everything
    * older is deleted as soon as a new pin lands. Net steady-state
    * footprint: ≤ 2 generations per chain instead of one per
    * iteration.
    *
    * CONTRACT (callers): the two-generation window is a LIVENESS
    * bound, not just a footprint bound — a loop must never re-execute
    * a frame pinned ≥2 `chain.pin` calls ago (its files are gone on
    * the reliable path; the default local-checkpoint path would mask
    * the bug because superseded blocks die lazily). Every current
    * call site reads at most the previous generation; the
    * full-catalog durability drill (`SPARK_GRAFT_CHECKPOINT_DIR`
    * through Verify) is the regression gate for that contract.
    *
    * On the default local-checkpoint path this is a plain [[pin]]
    * passthrough (superseded block sets are reclaimed by the
    * driver-GC-driven ContextCleaner, and they die with the job
    * anyway). Not thread-safe — one Chain per sweep loop, which is
    * how the operators use it. */
  final class Chain {
    private var kept: List[(DataFrame, String)] = Nil // newest first

    def pin(df: DataFrame): DataFrame = {
      val out = Checkpoints.pin(df)
      checkpointFileOf(out).foreach { f =>
        kept = (out -> f) :: kept
        val (live, dead) = kept.splitAt(2)
        dead.foreach { case (_, path) => delete(df, path) }
        kept = live
      }
      out
    }

    /** Reclaim every tracked generation except the newest (the one
      * backing the sweep's returned result). Call after the loop. */
    def release(): Unit = {
      kept.drop(1).foreach { case (df, path) => delete(df, path) }
      kept = kept.take(1)
    }

    private def delete(df: DataFrame, path: String): Unit = {
      // best-effort (never a failed job), but observable: see reclaim
      reclaim(df.sparkSession, path)
      ()
    }
  }

  /** `df.pinned` sugar for [[pin]] at the operator call sites. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pinned: DataFrame = pin(df)
  }
}
