package graft

import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, Graph}

/** [[graft.operators.Checkpoints]] — the conf-gated durability switch:
  * default pins stay executor-local (no checkpoint-dir traffic); setting
  * `graft.checkpoint.dir` reroutes the SAME call sites to reliable
  * `checkpoint()` files that survive executor loss, with identical
  * results. */
class CheckpointsSpec extends TestBase {

  private val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 3L))

  test("default path: localCheckpoint — results correct, no reliable " +
      "checkpoint dir is ever installed or written") {
    import spark.implicits._
    assert(spark.conf.getOption(Checkpoints.ConfKey).isEmpty)
    val before = spark.sparkContext.getCheckpointDir
    val r = Graph.pagerank(edges.toDF("s", "d"), "s", "d", iterations = 2)
    assert(r.count() == 4)
    assert(spark.sparkContext.getCheckpointDir == before,
      "default pin must not install a checkpoint dir")
  }

  test("graft.checkpoint.dir reroutes pins to RELIABLE checkpoints: " +
      "same results bit-for-bit, checkpoint files on disk") {
    import spark.implicits._
    val e = edges.toDF("s", "d")
    val local = Graph.pagerank(e, "s", "d", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dir = tmpDir()
    // fresh-session shape: this suite may run after others, so the
    // context-level checkpoint dir could already exist; remember it
    val prevDir = spark.sparkContext.getCheckpointDir
    spark.conf.set(Checkpoints.ConfKey, dir.toString)
    try {
      val reliable = Graph.pagerank(e, "s", "d", iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(reliable == local,
        "durability must not change values:\n" +
          s"local    $local\nreliable $reliable")
      // reliable checkpoints are real files under the conf'd dir
      // (unless a caller-installed dir already won — not the case here)
      if (prevDir.isEmpty) {
        def walk(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
          val s = java.nio.file.Files.walk(p)
          try scala.jdk.CollectionConverters
            .IteratorHasAsScala(s.iterator).asScala.toSeq
          finally s.close()
        }
        assert(walk(dir).exists(p =>
          p.getFileName.toString.startsWith("rdd-")),
          s"no rdd-* checkpoint data under $dir")
      }
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("reliable path drives a chained-cumulative operator end-to-end " +
      "(ksTest — one of the verdict-named pin families) with " +
      "identical results") {
    import spark.implicits._
    val a = (1 to 200).map(i => (i.toLong, (i % 37).toDouble))
      .toDF("id", "v")
    val b = (1 to 200).map(i => (i.toLong, (i % 23).toDouble))
      .toDF("id", "v")
    val local = graft.operators.Profiles.ksTest(a, b, "v")
      .collect().map(_.toSeq).toSeq
    spark.conf.set(Checkpoints.ConfKey, tmpDir().toString)
    try {
      val reliable = graft.operators.Profiles.ksTest(a, b, "v")
        .collect().map(_.toSeq).toSeq
      assert(reliable == local,
        s"ksTest diverged on the reliable path:\n$local\n$reliable")
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  private def rddDirs(cp: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(cp)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty[String]
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("rdd-")).toSet
  }

  test("Chain reclaims superseded reliable generations: at most two " +
      "live during a sweep, the previous one still READABLE after the " +
      "new pin (the convergence-probe contract), one after release") {
    spark.conf.set(Checkpoints.ConfKey, tmpDir().toString)
    try {
      // force the context checkpoint-dir install, then baseline count
      Checkpoints.pin(spark.range(2).toDF("x"))
      val cp = spark.sparkContext.getCheckpointDir.get
      val base = rddDirs(cp)
      val chain = new Checkpoints.Chain
      var df = chain.pin(spark.range(10).toDF("x"))
      val liveCounts = (1 to 5).map { _ =>
        val nxt = chain.pin(df.withColumn("x", col("x") + 1L))
        // generation N-1 outlives the pin of generation N — iterative
        // loops probe it for convergence AFTER the new pin lands
        assert(df.count() == 10L,
          "previous generation deleted too early")
        df = nxt
        (rddDirs(cp) -- base).size
      }
      assert(liveCounts.forall(_ <= 2), s"live per step: $liveCounts")
      assert(liveCounts.last == 2, s"live per step: $liveCounts")
      chain.release()
      assert((rddDirs(cp) -- base).size == 1,
        "release must keep exactly the newest generation")
      // ...and that survivor backs the returned frame
      assert(df.agg(sum(col("x"))).collect().head.getLong(0) == 95L)
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("an iterative operator's reliable footprint is ONE generation " +
      "at exit, not one per sweep (pagerank, 5 iterations)") {
    import spark.implicits._
    spark.conf.set(Checkpoints.ConfKey, tmpDir().toString)
    try {
      Checkpoints.pin(spark.range(2).toDF("x")) // install dir
      val cp = spark.sparkContext.getCheckpointDir.get
      val base = rddDirs(cp)
      val r = Graph.pagerank(edges.toDF("s", "d"), "s", "d",
        iterations = 5)
      assert(r.count() == 4) // readable AFTER the chain released
      assert((rddDirs(cp) -- base).size == 1,
        s"expected 1 surviving generation, got " +
          s"${(rddDirs(cp) -- base).size}")
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("reclaim failure path: never throws, logs-and-counts instead " +
      "of silently reverting to unbounded growth; success reclaims " +
      "and an already-gone path is success") {
    val before = Checkpoints.failedReclaims.get()
    // an unresolvable filesystem scheme: getFileSystem throws inside
    // reclaim — the failure MUST be swallowed (a dead delete can never
    // fail a job) but MUST be observable (counter + warning log)
    assert(!Checkpoints.reclaim(spark, "graft-bogus-scheme://x/rdd-1"))
    assert(Checkpoints.failedReclaims.get() == before + 1,
      "a failed reclaim must tick the failedReclaims counter")
    // success path: a real directory is deleted recursively
    val dir = tmpDir()
    val gen = dir.resolve("rdd-42")
    java.nio.file.Files.createDirectories(gen)
    java.nio.file.Files.writeString(gen.resolve("part-0"), "x")
    assert(Checkpoints.reclaim(spark, gen.toString))
    assert(!java.nio.file.Files.exists(gen))
    // already-gone path: nothing left to reclaim = success, no count
    assert(Checkpoints.reclaim(spark, gen.toString))
    assert(Checkpoints.failedReclaims.get() == before + 1)
  }

  test("pin is eager on both paths (the barrier the stage pins rely on)") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("x").filter(col("x") > 1L)
    val pinnedLocal = Checkpoints.pin(df)
    assert(pinnedLocal.count() == 2L)
    // pinned plans scan the materialized blocks (LogicalRDD), not the
    // original lineage — that truncation is the whole point of pin()
    val plan = pinnedLocal.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD"), plan)
  }
}
