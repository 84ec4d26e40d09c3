package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.Rank

/** [[graft.operators.Rank]] — the distributed global rank/ntile must be
  * bit-identical to the sequential single-window definition for every
  * partition count, ordering direction, and tie/null shape. */
class RankSpec extends TestBase {

  private def docs(n: Int) = {
    import spark.implicits._
    // deliberately skewed scores: 40% of rows share score 7 (the hot
    // key a naive range split must still rank correctly), plus nulls
    (0 until n).map { i =>
      val score: java.lang.Long =
        if (i % 10 < 4) 7L else if (i % 17 == 0) null else (i % 23).toLong
      (i.toLong, score)
    }.toDF("id", "score").repartition(7) // scrambled input partitioning
  }

  test("globalRank == ROW_NUMBER over a single window (asc, ties, nulls)") {
    val d = docs(500)
    val got = Rank.globalRank(d, Seq(col("score").asc, col("id").asc),
        "rk", partitions = 5)
      .select("id", "score", "rk")
    val want = d.withColumn("rk",
      row_number().over(Window.orderBy(col("score").asc, col("id").asc))
        .cast("long"))
    assertSameRows(got, want.select("id", "score", "rk"))
  }

  test("globalRank desc ordering matches the window form") {
    val d = docs(300)
    val got = Rank.globalRank(d, Seq(col("score").desc, col("id").desc),
        "rk", partitions = 4)
      .select("id", "rk")
    val want = d.withColumn("rk",
      row_number().over(Window.orderBy(col("score").desc, col("id").desc))
        .cast("long")).select("id", "rk")
    assertSameRows(got, want)
  }

  test("globalRank is partition-count independent") {
    val d = docs(200)
    val order = Seq(col("score").asc, col("id").asc)
    val base = Rank.globalRank(d, order, "rk", partitions = 1)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    for (p <- Seq(2, 3, 16, 64)) {
      val got = Rank.globalRank(d, order, "rk", partitions = p)
        .select("id", "rk").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == base, s"ranks changed at partitions=$p")
    }
  }

  test("globalNtile == NTILE over a single window, uneven split") {
    val d = docs(103) // 103 = 4*25 + 3: first 3 tiles get 26
    val order = Seq(col("score").asc, col("id").asc)
    val got = Rank.globalNtile(d, order, n = 4, "stage", partitions = 6)
      .select("id", "stage")
    val want = d.withColumn("stage",
      ntile(4).over(Window.orderBy(col("score").asc, col("id").asc)))
      .select("id", "stage")
    assertSameRows(got, want)
  }

  test("globalNtile edges: n=1, n=N, n>N") {
    import spark.implicits._
    val d = (1L to 10L).toDF("id")
    val order = Seq(col("id").asc)
    val all1 = Rank.globalNtile(d, order, 1, "stage", partitions = 3)
      .select("stage").distinct().collect().map(_.getInt(0)).toSeq
    assert(all1 == Seq(1))
    val eq = Rank.globalNtile(d, order, 10, "stage", partitions = 3)
      .orderBy("id").select("stage").collect().map(_.getInt(0)).toSeq
    assert(eq == (1 to 10))
    // n > N: NTILE assigns stage = rank (first N tiles get one row)
    val over = Rank.globalNtile(d, order, 25, "stage", partitions = 3)
      .orderBy("id").select("stage").collect().map(_.getInt(0)).toSeq
    assert(over == (1 to 10))
  }

  test("guard: clashing column names raise loudly") {
    import spark.implicits._
    val d = (1L to 3L).toDF("id").withColumn("__pid", lit(1))
    val e = intercept[IllegalArgumentException] {
      Rank.globalRank(d, Seq(col("id").asc))
    }
    assert(e.getMessage.contains("__pid"))
    val d2 = (1L to 3L).toDF("id").withColumn("stage", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      Rank.globalNtile(d2, Seq(col("id").asc), 2)
    }
    assert(e2.getMessage.contains("stage"))
  }

  test("equiDepthHistogram: quantile bins with exact NTILE sizes, " +
      "nulls and NaN excluded") {
    import spark.implicits._
    // heavy skew: 7 copies of 1.0 plus a tail — equal-width would put
    // everything in one bar; equi-depth must split 4/3/3
    val d = ((Seq.fill(7)(1.0) ++ Seq(5.0, 100.0, 1000.0))
      .zipWithIndex.map { case (v, i) => (i.toLong, Option(v)) } ++
      Seq((90L, Some(Double.NaN)), (91L, None)))
      .toDF("id", "v")
    val h = graft.operators.Profiles
      .equiDepthHistogram(d, "v", "id", buckets = 3)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))
    assert(h.map(_._4).toSeq == Seq(4L, 3L, 3L), s"got ${h.toSeq}")
    assert(h(0) == ((1, 1.0, 1.0, 4L)))
    assert(h(1) == ((2, 1.0, 1.0, 3L))) // the tie run fills bucket 2 too
    assert(h(2) == ((3, 5.0, 1000.0, 3L)))
  }

  test("exactQuantiles: matches the sequential type-7 definition, " +
      "edges and ties included") {
    import spark.implicits._
    val values = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0)
    val d = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v").repartition(4)
    def seqQuantile(p: Double): Double = {
      val s = values.sorted
      val h = 1.0 + (s.size - 1) * p
      val lo = s(math.floor(h).toInt - 1)
      val hi = s(math.ceil(h).toInt - 1)
      lo + (h - math.floor(h)) * (hi - lo)
    }
    val probs = Seq(0.0, 0.1, 0.25, 0.5, 0.77, 1.0)
    val got = graft.operators.Rank
      .exactQuantiles(d, "v", "id", probs, partitions = 3)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    probs.foreach { p =>
      assert(math.abs(got(p) - seqQuantile(p)) < 1e-9,
        s"p=$p: ${got(p)} vs ${seqQuantile(p)}")
    }
    // nulls/NaN excluded; single-row input degenerates to that value
    val one = Seq((1L, Some(42.0)), (2L, None),
      (3L, Some(Double.NaN))).toDF("id", "v")
    val q1 = graft.operators.Rank
      .exactQuantiles(one, "v", "id", Seq(0.5))
      .collect().head.getDouble(1)
    assert(q1 == 42.0)
  }

  private def keyedDocs(n: Int) = {
    import spark.implicits._
    // dominant key: 60% of rows land on "en" (the CCNet shape), plus a
    // null key group, a singleton key, null scores, and score ties
    (0 until n).map { i =>
      val key: String =
        if (i == 0) "singleton"
        else if (i % 13 == 0) null
        else if (i % 10 < 6) "en"
        else if (i % 10 < 8) "de" else "fr"
      val score: java.lang.Double =
        if (i % 17 == 0) null else (i % 41).toDouble / 7.0
      (i.toLong, key, score)
    }.toDF("id", "k", "score").repartition(7)
  }

  test("perKeyPercentRank == percent_rank over the per-key window " +
      "(bit-identical, incl. null keys/scores and a singleton key)") {
    val d = keyedDocs(600)
    // bucket count never changes the ranks — only the balance
    for (b <- Seq(2, 8, 64)) {
      val got = Rank.perKeyPercentRank(d, col("k"), col("id"),
          col("score"), "pct", buckets = b)
        .select("id", "k", "score", "pct")
      val want = d.withColumn("pct", percent_rank().over(
        Window.partitionBy(col("k"))
          .orderBy(col("score").asc_nulls_first, col("id").asc)))
      assertSameRows(got, want.select("id", "k", "score", "pct"))
    }
    // NaN scores sort greatest (Spark's ordering) — still bit-identical
    import spark.implicits._
    val dn = Seq((1L, "a", 1.0), (2L, "a", Double.NaN),
      (3L, "a", 2.0), (4L, "a", Double.NaN), (5L, "b", Double.NaN))
      .toDF("id", "k", "score")
    val gotN = Rank.perKeyPercentRank(dn, col("k"), col("id"),
      col("score"), "pct", buckets = 2).select("id", "pct")
    val wantN = dn.withColumn("pct", percent_rank().over(
      Window.partitionBy(col("k"))
        .orderBy(col("score").asc_nulls_first, col("id").asc)))
      .select("id", "pct")
    assertSameRows(gotN, wantN)
  }

  test("perKeyPercentRank: a giant un-splittable score tie raises " +
      "loudly instead of silently serializing one bucket") {
    import spark.implicits._
    val d = (1L to 50L).map(i => (i, "k", 5.0)).toDF("id", "k", "score")
    val e = intercept[Exception] {
      Rank.perKeyPercentRank(d, col("k"), col("id"), col("score"),
        buckets = 4, maxBucketRows = 10L).collect()
    }
    assert(e.getMessage.contains("maxBucketRows"), e.getMessage)
  }

  test("perKeyPercentRank matches Sampling.rankNormalize (guard off) " +
      "— the documented drop-in relationship") {
    val d = keyedDocs(400)
    val got = Rank.perKeyPercentRank(d, col("k"), col("id"), col("score"))
      .select("id", "pct")
    val want = graft.operators.Sampling.rankNormalize(d, col("k"),
        col("id"), col("score"), maxKeyRows = 0L)
      .select("id", "pct")
    assertSameRows(got, want)
  }

  test("perKeyPercentRank plan: every window is (key, bucket)- or " +
      "count-table-partitioned — no whole-key partition anywhere") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val d = keyedDocs(500)
    val r = Rank.perKeyPercentRank(d, col("k"), col("id"), col("score"),
      buckets = 8)
    r.collect()
    val wins = r.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    // the corpus window partitions by (key, __bkt) — the bucket splits
    // a dominant key; the offset windows ride the count table
    // (partitioned by the staged key over K·B aggregated rows). A
    // ROW_NUMBER window partitioned by the key ALONE would be the
    // one-task-per-language cliff this operator exists to avoid.
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"unpartitioned window:\n$w")
      val isRowNumber = w.windowExpressions.exists(
        _.collectFirst { case r: org.apache.spark.sql.catalyst
          .expressions.RowNumber => r }.nonEmpty)
      if (isRowNumber)
        assert(w.partitionSpec.size >= 2,
          s"corpus rank window missing the bucket split:\n$w")
    }
    val p = r.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"offsets join must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must never shuffle for a join:\n$p")
    assert(p.contains("partial_count"),
      s"bucket counts must partial-aggregate map-side:\n$p")
  }

  test("plan: one range exchange, no corpus-sized Window partition") {
    val d = docs(400)
    val ranked = Rank.globalRank(d,
      Seq(col("score").asc, col("id").asc), "rk", partitions = 8)
    ranked.collect() // finalize the adaptive plan
    // AQE prints Final + Initial sections; only the final plan ran
    val p = ranked.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // exactly one range shuffle of the corpus; the counts branch must
    // reuse it (AQE stage reuse), not re-shuffle
    val ranges = p.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") &&
        !l.contains("ReusedExchange"))
    assert(ranges == 1, s"expected one range exchange:\n$p")
    assert(p.contains("ReusedExchange"),
      s"counts branch must reuse the range exchange:\n$p")
    // the only Window is the cumulative-offset pass over the <=p-row
    // per-partition count table — never over the ranked corpus (no
    // window operates on the range-partitioned side)
    val windows = "\\bWindow\\b".r.findAllIn(p).length
    assert(windows <= 1, s"unexpected corpus window:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"offsets join must broadcast:\n$p")
  }

  test("globalRunningSum: weighted prefix sums equal the single-window " +
      "reference; ONE reused range exchange; the local window is " +
      "pid-partitioned, never one task") {
    import spark.implicits._
    val d = docs(400).withColumn("w", (col("id") % 7 + 1))
    val slim = d.select(col("score"), col("id"), col("w"))
    val rs = Rank.globalRunningSum(slim,
      Seq(col("score").asc, col("id").asc, col("w").asc), "w", "run",
      partitions = 8)
    rs.collect()
    val viaWin = slim.withColumn("run",
      sum("w").over(org.apache.spark.sql.expressions.Window
        .orderBy(col("score").asc, col("id").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .select("id", "run").as[(Long, Long)].collect().toMap
    val got = rs.select("id", "run").as[(Long, Long)].collect().toMap
    assert(got == viaWin, s"diff at: ${
      got.collect { case (k, v) if viaWin(k) != v => k }.take(5)}")
    val p = rs.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val ranges = p.linesIterator.count(l =>
      l.contains("Exchange rangepartitioning") &&
        !l.contains("ReusedExchange"))
    assert(ranges == 1, s"expected one range exchange:\n$p")
    assert(p.contains("ReusedExchange"),
      s"offsets branch must reuse the range exchange:\n$p")
    // the corpus-side window must be partitioned by __pid (bounded by
    // a range partition) — never an empty partitionSpec
    import org.apache.spark.sql.execution.window.WindowExec
    rs.queryExecution.executedPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
          !w.output.exists(_.name.startsWith("__poff")) =>
        assert(w.child.outputPartitioning.numPartitions <= 8,
          s"unpartitioned corpus window:\n$w")
    }
  }
}
