package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Drives the streaming surface synchronously: parquet drops into a dir
  * feed a file-source stream; memory sink collects; processAllAvailable
  * makes each "batch" deterministic. */
class StreamingSpec extends TestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed stats over a file stream (watermark + tumbling window)") {
    val dir = tmpDir().toString
    val batch1 = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(10), 2, "view", 3.0))
    batch1.toDF().write.mode("append").parquet(dir)

    val stream = EventStreams.readEventStream(spark, dir,
      batch1.toDF().schema)
    val q = EventStreams.windowedStats(stream, "15 minutes", "30 minutes")
      .writeStream.outputMode("complete").format("memory")
      .queryName("win_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()

    // second drop arrives, stream picks it up incrementally
    Seq(Event(4, ts(20), 2, "click", 4.0)).toDF()
      .write.mode("append").parquet(dir)
    val q2 = EventStreams.windowedStats(
        EventStreams.readEventStream(spark, dir, batch1.toDF().schema),
        "15 minutes", "30 minutes")
      .writeStream.outputMode("complete").format("memory")
      .queryName("win_out2").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable()
    q.stop(); q2.stop()

    val rows = spark.table("win_out2")
      .select("event_type", "n", "sum_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows.contains(("click", 2L, 3.0))) // 10:00 window
    assert(rows.contains(("click", 1L, 4.0))) // 10:15 window
    assert(rows.contains(("view", 1L, 3.0)))
  }

  test("stream-static enrichment joins a dimension per micro-batch") {
    val dir = tmpDir().toString
    Seq(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "view", 2.0))
      .toDF().write.mode("append").parquet(dir)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("uid", "tier")
    val q = EventStreams.enrich(
        EventStreams.readEventStream(spark, dir,
          Seq.empty[Event].toDF().schema),
        dim, "user_id", "uid")
      .writeStream.outputMode("append").format("memory")
      .queryName("enrich_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val tiers = spark.table("enrich_out").select("event_id", "tier")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tiers == Map(1L -> "gold", 2L -> "basic"))
  }

  test("streaming dedup keeps first sighting per fingerprint (X-stream)") {
    val dir = tmpDir().toString
    val ckpt = tmpDir().toString
    // fp "aaa" appears 3 times — once in a LATER batch of the SAME query,
    // so dropping it exercises cross-batch operator state (not a fresh
    // checkpoint re-reading everything)
    Seq(
      (1L, ts(0), "aaa"), (2L, ts(1), "aaa"), (3L, ts(2), "bbb")
    ).toDF("id", "ts", "fp").write.mode("append").parquet(dir)

    val schema = Seq((1L, ts(0), "x")).toDF("id", "ts", "fp").schema
    val q = EventStreams.streamingDedup(
        EventStreams.readEventStream(spark, dir, schema), "ts", "fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    val afterBatch1 = spark.table("dedup_out").count()
    assert(afterBatch1 == 2, s"batch 1 should emit aaa+bbb, got $afterBatch1")

    // second drop into the SAME running checkpointed query: the repeated
    // "aaa" (within the watermark delay) must be dropped by state carried
    // across micro-batches
    Seq((4L, ts(3), "aaa"), (5L, ts(4), "ccc"))
      .toDF("id", "ts", "fp").write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()

    val fps = spark.table("dedup_out").groupBy("fp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fps == Map("aaa" -> 1L, "bbb" -> 1L, "ccc" -> 1L),
      s"expected one survivor per fingerprint, got $fps")
  }

  test("stream-stream join matches within the time bound only (X-stream)") {
    val impDir = tmpDir().toString
    val clickDir = tmpDir().toString
    // user 1: click 5 min after impression (match); user 2: click 40 min
    // after (outside the 10-min bound); user 3: click with no impression
    Seq((10L, ts(0), 1L), (20L, ts(0), 2L))
      .toDF("imp_id", "its", "uid").write.mode("append").parquet(impDir)
    Seq((100L, ts(5), 1L), (200L, ts(40), 2L), (300L, ts(5), 3L))
      .toDF("click_id", "cts", "uid2").write.mode("append").parquet(clickDir)

    val impSchema = Seq((1L, ts(0), 1L)).toDF("imp_id", "its", "uid").schema
    val clickSchema =
      Seq((1L, ts(0), 1L)).toDF("click_id", "cts", "uid2").schema
    val joined = EventStreams.streamStreamJoin(
      EventStreams.readEventStream(spark, impDir, impSchema),
      EventStreams.readEventStream(spark, clickDir, clickSchema),
      "uid", "uid2", "its", "cts", withinMs = 10 * 60 * 1000)
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val pairs = spark.table("ssj_out").select("imp_id", "click_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(pairs == Set(10L -> 100L),
      s"only the within-bound same-user pair should match, got $pairs")
  }

  test("session_window sessionization merges within gap, splits on gap") {
    val dir = tmpDir().toString
    Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(2), 1, "view", 2.0),  // merges: 2 min < 30 min gap
      Event(3, ts(42), 1, "click", 4.0), // splits: 40 min > gap
      Event(4, ts(5), 2, "view", 8.0)
    ).toDF().write.mode("append").parquet(dir)
    val q = EventStreams.sessionizeWindowed(
        EventStreams.readEventStream(spark, dir,
          Seq.empty[Event].toDF().schema))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sw_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("sw_out")
      .select("user_id", "n_events", "sum_value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(sessions == Set((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)),
      s"got $sessions")
  }

  test("left-outer stream-stream join emits unmatched left after watermark") {
    val impDir = tmpDir().toString
    val clickDir = tmpDir().toString
    val ckpt = tmpDir().toString
    // user 1 clicks in-bound; user 2 never clicks -> must surface with a
    // null click once the watermark passes its match window
    Seq((10L, ts(0), 1L), (20L, ts(0), 2L))
      .toDF("imp_id", "its", "uid").write.mode("append").parquet(impDir)
    Seq((100L, ts(5), 1L))
      .toDF("click_id", "cts", "uid2").write.mode("append").parquet(clickDir)
    val impSchema = Seq((1L, ts(0), 1L)).toDF("imp_id", "its", "uid").schema
    val clickSchema =
      Seq((1L, ts(0), 1L)).toDF("click_id", "cts", "uid2").schema
    val joined = EventStreams.streamStreamJoin(
      EventStreams.readEventStream(spark, impDir, impSchema),
      EventStreams.readEventStream(spark, clickDir, clickSchema),
      "uid", "uid2", "its", "cts", withinMs = 10 * 60 * 1000,
      watermark = "1 minute", joinType = "left_outer")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("ssjo_out").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    // the global watermark is the MIN across inputs — later events must
    // land on BOTH sides to advance it past user 2's match window...
    Seq((900L, ts(30), 9L))
      .toDF("click_id", "cts", "uid2").write.mode("append").parquet(clickDir)
    Seq((910L, ts(30), 9L))
      .toDF("imp_id", "its", "uid").write.mode("append").parquet(impDir)
    q.processAllAvailable()
    // ...and one more micro-batch flushes the now-provably-unmatched row
    Seq((901L, ts(45), 9L))
      .toDF("click_id", "cts", "uid2").write.mode("append").parquet(clickDir)
    Seq((911L, ts(45), 9L))
      .toDF("imp_id", "its", "uid").write.mode("append").parquet(impDir)
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ssjo_out").select("imp_id", "click_id")
      .collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(rows.get(10L).contains(100L), s"matched pair missing: $rows")
    assert(rows.get(20L).contains(-1L),
      s"unmatched left row must emit null-padded: $rows")
  }

  test("streamed ANN serving: per-batch top-k against a static corpus") {
    val qDir = tmpDir().toString
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    // first drop: queries 0 and 100 arrive on the stream
    corpus.filter(col("vec_id").isin(0L, 100L))
      .write.mode("append").parquet(qDir)
    val results = new scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]
    val q = EventStreams.serveTopK(
        EventStreams.readEventStream(spark, qDir, corpus.schema),
        batch => graft.operators.Similarity.cosineTopK(
          batch, corpus, "vec_id", "embedding", k = 3)) {
        (scored, _) =>
          results.synchronized {
            results ++= scored.collect().map(r =>
              (r.getLong(0), r.getLong(1), r.getLong(3)))
          }
      }.start() // default trigger: stays live for the second drop
    q.processAllAvailable()
    // second drop arrives: another query, scored incrementally
    corpus.filter(col("vec_id") === 200L)
      .write.mode("append").parquet(qDir)
    q.processAllAvailable(); q.stop()
    val byQuery = results.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 100L, 200L), s"got ${byQuery.keySet}")
    byQuery.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L))
      assert(rows.forall(r => r._2 != r._1)) // no self-matches
    }
  }

  test("stateful sessionization closes sessions on gap (X-stream)") {
    val dir = tmpDir().toString
    // user 1: two sessions separated by a 40-minute gap within one batch
    Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(2), 1, "view", 1.0),
      Event(3, ts(42), 1, "click", 1.0),
      Event(4, ts(5), 2, "view", 1.0)
    ).toDF().write.mode("append").parquet(dir)

    val stream = EventStreams
      .readEventStream(spark, dir, Seq.empty[Event].toDF().schema)
      .as[Event]
    val sessions = EventStreams.sessionize(stream, gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("sess_out").start()
    q.processAllAvailable()
    q.stop()

    val closed = spark.table("sess_out")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // user 1's first session (2 events) closed by the 40-minute gap;
    // the second session and user 2's stay open in state
    assert(closed.contains((1L, 2L)))
  }

  test("streaming CUSUM: two-double state carries the fold across " +
      "micro-batches, alarms equal the batch operator's on the same " +
      "data") {
    import EventStreams.MetricPoint
    val dir = tmpDir().toString
    def pts(ps: (String, Long, Double)*) =
      ps.map(p => MetricPoint(p._1, p._2, p._3)).toDF()
    // batch 1: A climbs toward the threshold but does not cross
    pts(("A", 1L, 8.0), ("A", 2L, 9.0), ("B", 1L, 1.0))
      .coalesce(1).write.mode("append").parquet(dir)
    val stream = EventStreams
      .readEventStream(spark, dir, pts(("x", 1L, 1.0)).schema)
      .as[MetricPoint]
    val q = EventStreams
      .streamingCusum(stream, target = 5.0, slack = 0.0,
        threshold = 10.0)
      .writeStream.outputMode("append").format("memory")
      .queryName("cusum_out").start()
    q.processAllAvailable()
    assert(spark.table("cusum_out").count() == 0,
      "no alarm may fire before the threshold is crossed")
    // batch 2: A crosses (P carried at 7 from batch 1 → 11, 12);
    // B stays quiet
    pts(("A", 3L, 9.0), ("A", 4L, 6.0), ("B", 2L, 2.0))
      .coalesce(1).write.mode("append").parquet(dir)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("cusum_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == Set(("A", 3L, 11.0), ("A", 4L, 12.0)), streamed)
    // stream ≡ batch: the batch operator on ALL the data reports the
    // same first alarm, peak, and alarm count
    val batch = graft.operators.Checks.cusumAlarms(
        pts(("A", 1L, 8.0), ("A", 2L, 9.0), ("A", 3L, 9.0),
          ("A", 4L, 6.0), ("B", 1L, 1.0), ("B", 2L, 2.0)),
        "key", "seq", "value", 5.0, 0.0, 10.0)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2), r.getLong(3))).toSeq
    assert(batch == Seq(("A", 3L, 12.0, 2L)), batch)
  }

  test("streaming dedup against a static seen-index drops known content") {
    val dir = tmpDir().toString
    Seq((1L, "brand new doc"), (2L, "Already   Seen"), (3L, "also fresh"))
      .toDF("doc_id", "text").write.mode("append").parquet(dir)
    val seen = Seq((100L, "already seen")) // fingerprint-equal to doc 2
      .toDF("sid", "stext")
      .select(graft.operators.TextAnalysis.fingerprint(col("stext"))
        .as("fp"))

    val stream = spark.readStream
      .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
      .parquet(dir)
      .withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col("text")))
    val q = EventStreams.streamingDedupAgainst(stream, "fp", seen, "fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()

    // a later micro-batch is filtered by the same static index
    Seq((4L, "ALREADY SEEN"), (5L, "final fresh one"))
      .toDF("doc_id", "text").write.mode("append").parquet(dir)
    val q2 = EventStreams.streamingDedupAgainst(
        spark.readStream
          .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
          .parquet(dir)
          .withColumn("fp",
            graft.operators.TextAnalysis.fingerprint(col("text"))),
        "fp", seen, "fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("sdedup_out2").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable()
    q.stop(); q2.stop()

    assert(spark.table("sdedup_out").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L))
    assert(spark.table("sdedup_out2").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 3L, 5L))
  }

  test("streaming ingest curation: gates + seen-index dedup in one flow") {
    // the streaming face of Pipelines.curate's row-local stages: quality
    // gate (projection) -> dedup against the accumulated corpus (stream-
    // static anti join), end to end on a file stream
    val dir = tmpDir().toString
    Seq(
      (1L, "a fresh document with plenty of words inside it"),
      (2L, "too short"),                           // fails the gate
      (3L, "previously ingested content right here okay yes"), // seen
      (4L, "another novel document that satisfies every filter"))
      .toDF("doc_id", "text").write.mode("append").parquet(dir)
    val seen = Seq("previously   ingested CONTENT right here okay yes")
      .toDF("stext")
      .select(graft.operators.TextAnalysis.fingerprint(col("stext"))
        .as("fp"))

    val stream = spark.readStream
      .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
      .parquet(dir)
      .filter(graft.operators.TextAnalysis.tokenCount(col("text")) >= 5)
      .withColumn("fp",
        graft.operators.TextAnalysis.fingerprint(col("text")))
    val q = EventStreams.streamingDedupAgainst(stream, "fp", seen, "fp")
      .writeStream.outputMode("append").format("memory")
      .queryName("scurate_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    assert(spark.table("scurate_out").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 4L))
  }

  test("production ingest shape: gopher gate -> seen-index dedup -> " +
      "trained scoreInline as ONE micro-batch pipeline, across batches") {
    // every stage is stateless/stream-safe: the gate and the scorer are
    // row-local projections, the dedup a stream-static anti join — so
    // the whole curation chain runs inside each micro-batch with no
    // state store, which is the 100 TB ingest posture
    val dir = tmpDir().toString
    val pos = Seq.tabulate(20)(i =>
      (i.toLong, s"alpha beta gamma alpha the of beta gamma alpha a$i"))
      .toDF("doc_id", "text")
    val neg = Seq.tabulate(20)(i =>
      (100L + i, s"delta epsilon zeta delta the of epsilon zeta b$i"))
      .toDF("doc_id", "text")
    val model = graft.operators.QualityFilter.trainLda(
      pos, "doc_id", "text", neg, "doc_id", "text", numBuckets = 64)
    val seenText = "alpha beta gamma the of beta already ingested alpha"
    val seen = Seq(seenText).toDF("stext")
      .select(graft.operators.TextAnalysis.fingerprint(col("stext"))
        .as("fp"))

    def pipeline(): org.apache.spark.sql.DataFrame = {
      val stream = spark.readStream
        .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
        .parquet(dir)
      val gated = graft.operators.TextAnalysis
        .withGopherQuality(stream, "text", minTokens = 5, minStopHits = 2)
        .filter(col("gopher_pass"))
        .withColumn("fp",
          graft.operators.TextAnalysis.fingerprint(col("text")))
      val fresh = EventStreams.streamingDedupAgainst(gated, "fp",
        seen, "fp")
      graft.operators.QualityFilter
        .scoreInline(fresh, "doc_id", "text", model)
        .filter(col("prob") >= 0.5)
    }

    // batch 1: 1 passes all three stages; 2 fails the gate; 3 is a
    // (case-normalized) dup of the seen index; 4 scores below threshold
    Seq(
      (1L, "alpha beta gamma alpha the of beta gamma alpha fresh"),
      (2L, "the of"),
      (3L, "Alpha beta GAMMA the of beta already   ingested alpha"),
      (4L, "delta epsilon zeta delta the of epsilon zeta delta junk"))
      .toDF("doc_id", "text").write.mode("append").parquet(dir)
    val q1 = pipeline().writeStream.outputMode("append").format("memory")
      .queryName("ingest_out1").trigger(Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.table("ingest_out1").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L),
      "batch 1: expected only the fresh target-like doc")

    // batch 2: same verdicts replay for new arrivals — 5 passes, 6 dups
    // against the index again, 7 is target-unlike
    Seq(
      (5L, "alpha beta gamma alpha the of beta gamma alpha newest"),
      (6L, seenText.toUpperCase),
      (7L, "delta epsilon zeta delta the of epsilon zeta other words"))
      .toDF("doc_id", "text").write.mode("append").parquet(dir)
    val q2 = pipeline().writeStream.outputMode("append").format("memory")
      .queryName("ingest_out2").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("ingest_out2").select("doc_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 5L),
      "batch 2: expected exactly the two fresh target-like docs")
  }

  test("gopher gate composes on a stream (pure projection, no state)") {
    val dir = tmpDir().toString
    val passTxt = "the a " + (1 to 60).map(i => s"word$i").mkString(" ")
    Seq((1L, passTxt), (2L, "the a too short"))
      .toDF("doc_id", "text").write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
      .parquet(dir)
    val q = graft.operators.TextAnalysis
      .withGopherQuality(stream, "text", minTokens = 50)
      .filter(col("gopher_pass")).select("doc_id")
      .writeStream.outputMode("append").format("memory")
      .queryName("gopher_stream").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("gopher_stream").as[Long].collect().toSeq ==
      Seq(1L))
  }

  test("stateless corpus ops (sampling, redaction) compose on streams") {
    // Sampling and PII redaction are pure projections/filters, so the
    // same library calls run unchanged on a streaming DataFrame — the
    // batch/stream unification the Spark-first design buys.
    val dir = tmpDir().toString
    val rows = (0L until 40L).map(i => (i, s"doc $i mail a$i@b.co end"))
    rows.toDF("doc_id", "text").write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
      .parquet(dir)
    val sampled = graft.operators.Sampling.bernoulli(
      stream, col("doc_id"), bp = 5000)
    val redacted = sampled.withColumn("clean",
      graft.operators.TextAnalysis.redactPii(col("text")))
    val q = redacted.writeStream.outputMode("append").format("memory")
      .queryName("corpus_stream_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("corpus_stream_out")
      .select("doc_id", "clean").as[(Long, String)].collect()
    // same membership as the batch call on the same data
    val batchIds = graft.operators.Sampling.bernoulli(
        rows.toDF("doc_id", "text"), col("doc_id"), bp = 5000)
      .select("doc_id").as[Long].collect().toSet
    assert(got.map(_._1).toSet == batchIds)
    assert(got.nonEmpty && got.forall(!_._2.contains("@")))
  }

  test("denoising-pair generation composes on streams: spanCorrupt and " +
      "prefixLmSplit run per micro-batch, bit-identical to batch") {
    // both are zero-exchange projections (ScaleSpec-pinned), so the
    // same calls generate training pairs on a live ingest stream
    val dir = tmpDir().toString
    val rows = (0L until 20L).map(i =>
      (i, (1 to 60).map(j => s"w${i}_$j").mkString(" ")))
    rows.toDF("doc_id", "text").write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
      .parquet(dir)
    val q1 = graft.operators.TextAnalysis
      .spanCorrupt(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("span_stream_out").trigger(Trigger.AvailableNow()).start()
    val q2 = graft.operators.TextAnalysis
      .prefixLmSplit(stream, "doc_id", "text")
      .writeStream.outputMode("append").format("memory")
      .queryName("plm_stream_out").trigger(Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    val batchDf = rows.toDF("doc_id", "text")
    assert(spark.table("span_stream_out").collect().toSet ==
      graft.operators.TextAnalysis.spanCorrupt(batchDf, "doc_id", "text")
        .collect().toSet, "streamed spanCorrupt diverged from batch")
    assert(spark.table("plm_stream_out").collect().toSet ==
      graft.operators.TextAnalysis
        .prefixLmSplit(batchDf, "doc_id", "text")
        .collect().toSet, "streamed prefixLmSplit diverged from batch")
  }

  test("lexicon quality gate and int8 encoding compose on streams " +
    "(map-only ops; stats is a static broadcast side)") {
    val dir = tmpDir().toString
    val rows = (0L until 30L).map(i =>
      (i, if (i % 3 == 0) "fast fast merge" else "slow slow scan"))
    rows.toDF("doc_id", "text").write.mode("append").parquet(dir)
    val lex = Seq("fast" -> 1.0, "merge" -> 0.5, "slow" -> -1.0,
      "scan" -> -0.5)

    val stream = spark.readStream
      .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
      .parquet(dir)
    val gated = graft.operators.TextAnalysis
      .withLexiconQuality(stream, "text", lex)
      .filter(col("quality_p") > 0.5)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("lex_stream_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("lex_stream_out").select("doc_id")
      .as[Long].collect().toSet
    assert(kept == (0L until 30L).filter(_ % 3 == 0).toSet, s"kept $kept")

    // int8 encode on a stream: static 1-row stats broadcast per batch
    val vecsBatch = (0L until 10L).map(i =>
      (i, Seq(i.toFloat, (10 - i).toFloat))).toDF("id", "vec")
    val vdir = tmpDir().toString
    vecsBatch.write.mode("append").parquet(vdir)
    val stats = graft.operators.Quantize.int8Stats(vecsBatch, "vec")
    val vstream = spark.readStream.schema(vecsBatch.schema).parquet(vdir)
    val enc = graft.operators.Quantize.int8Encode(
      vstream, "id", "vec", stats)
    val q2 = enc.writeStream.outputMode("append").format("memory")
      .queryName("int8_stream_out").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val streamed = spark.table("int8_stream_out")
      .select("id", "codes").as[(Long, Seq[Int])].collect().toMap
    val batch = graft.operators.Quantize.int8Encode(
        vecsBatch, "id", "vec", stats)
      .select("id", "codes").as[(Long, Seq[Int])].collect().toMap
    assert(streamed == batch, "stream/batch int8 codes must be identical")
  }

  test("Bloom incremental dedup composes on streams (stateless filter, " +
    "no join state)") {
    // dedupAgainstBloom is a pure scan filter (the sketch ships as a
    // literal), so unlike the anti-join form it needs NO stream-static
    // join machinery and no state store — the zero-shuffle property
    // carries to streaming ingest unchanged.
    val dir = tmpDir().toString
    val rows = (0L until 30L).map(i =>
      (i, if (i < 10) s"known doc $i" else s"fresh doc $i"))
    rows.toDF("doc_id", "text").write.mode("append").parquet(dir)

    val seen = (0L until 10L).map(i => (i, s"known doc $i"))
      .toDF("doc_id", "text")
    val bloom = graft.operators.Dedup.seenBloomFilter(seen, "text",
      expectedItems = 100, fpp = 0.001)

    val stream = spark.readStream
      .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
      .parquet(dir)
    val fresh = graft.operators.Dedup.dedupAgainstBloom(stream, "text", bloom)
    val q = fresh.writeStream.outputMode("append").format("memory")
      .queryName("bloom_stream_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("bloom_stream_out")
      .select("doc_id").as[Long].collect().toSet
    assert(got == (10L until 30L).toSet,
      s"known docs must drop, fresh must survive; got $got")
  }

  test("native signatures stream: minhash/simhash are projections, so " +
    "signature computation runs per micro-batch with no state") {
    // the relational signature forms aggregated per doc and could not
    // run on an append stream without state; the native expressions are
    // scan projections, so incremental signature extraction (the feeder
    // of every incremental-dedup index) streams for free
    val dir = tmpDir().toString
    val rows = (1L to 20L).map(i => (i, s"tok$i alpha beta gamma delta"))
    rows.toDF("doc_id", "text").write.mode("append").parquet(dir)

    val stream = spark.readStream
      .schema(Seq.empty[(Long, String)].toDF("doc_id", "text").schema)
      .parquet(dir)
    val sigs = graft.operators.Dedup.minhashSignatures(
      stream, "doc_id", "text", k = 4)
    val withSim = graft.operators.Dedup.simhash(stream, "doc_id", "text")
    val q1 = sigs.writeStream.outputMode("append").format("memory")
      .queryName("mh_stream").trigger(Trigger.AvailableNow()).start()
    val q2 = withSim.writeStream.outputMode("append").format("memory")
      .queryName("sh_stream").trigger(Trigger.AvailableNow()).start()
    q1.processAllAvailable(); q1.stop()
    q2.processAllAvailable(); q2.stop()

    // batch parity: identical signatures from the same rows
    val batch = rows.toDF("doc_id", "text")
    assertSameRows(spark.table("mh_stream"),
      graft.operators.Dedup.minhashSignatures(batch, "doc_id", "text", 4))
    assertSameRows(spark.table("sh_stream"),
      graft.operators.Dedup.simhash(batch, "doc_id", "text"))
  }

  test("maxFilesPerTrigger bounds each micro-batch (backfill ingest knob)") {
    val dir = tmpDir().toString
    // three separate drops = three files (coalesce(1) each)
    (0 until 3).foreach { i =>
      Seq(Event(i.toLong, ts(i), 1, "click", i.toDouble)).toDF()
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val stream = EventStreams.readEventStream(spark, dir,
      Seq.empty[Event].toDF().schema, maxFilesPerTrigger = Some(1))
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("bounded_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    // one file per micro-batch: the 3-file backlog drains in 3 batches
    // of 1 row each, never one giant batch
    assert(spark.table("bounded_out").count() == 3)
    assert(batches.length == 3,
      s"expected 3 bounded batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows == 1))
    // knob validation is loud
    val e = intercept[IllegalArgumentException] {
      EventStreams.readEventStream(spark, dir,
        Seq.empty[Event].toDF().schema, maxFilesPerTrigger = Some(0))
    }
    assert(e.getMessage.contains("maxFilesPerTrigger"))
  }

  test("streaming ingest gate: Checks.passes routes micro-batches to " +
      "promote or quarantine (foreachBatch)") {
    import graft.operators.Checks
    import graft.operators.Checks.{MinRows, NotNull}
    val in = tmpDir().toString
    val promote = tmpDir().resolve("promote").toString
    val quarantine = tmpDir().resolve("quarantine").toString
    // two single-file drops: one clean, one with a null id
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(in)
    Seq((Some(4L), "d"), (None: Option[Long], "e")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(in)
    val suite = Seq(NotNull("id"), MinRows(1))
    val schema = Seq((1L, "x")).toDF("id", "v").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .writeStream.trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val dest = if (Checks.passes(batch, suite)) promote
          else quarantine
        batch.write.mode("append").parquet(dest)
      }
      .start()
    q.processAllAvailable(); q.stop()
    val ok = spark.read.parquet(promote).collect()
      .map(_.getLong(0)).toSet
    assert(ok == Set(1L, 2L, 3L), s"clean batch promoted: $ok")
    val bad = spark.read.parquet(quarantine).collect()
      .map(r => Option(if (r.isNullAt(0)) null else r.getLong(0)))
    assert(bad.toSet == Set(Some(4L), None),
      "the dirty batch lands whole in quarantine — rows are not " +
        "cherry-picked out of a failed drop")
  }

  test("streaming drift monitor: per-micro-batch chi-squared vs a static " +
      "reference; proportional batch scores zero, drifted batch alarms; " +
      "stream report equals the batch operator's") {
    val in = tmpDir().toString
    def langs(pairs: (String, Int)*) = pairs
      .flatMap { case (v, n) => Seq.fill(n)(v) }.toDF("lang")
    val ref = langs("a" -> 40, "b" -> 10)
    // drop 1 mirrors the reference proportions exactly; drop 2 is all-b
    langs("a" -> 8, "b" -> 2).coalesce(1).write.mode("append").parquet(in)
    val reports = new scala.collection.mutable.ArrayBuffer[
      (Long, Seq[(String, Double)])]
    val q = EventStreams.driftMonitor(
        EventStreams.readEventStream(spark, in, ref.schema), ref, "lang") {
        (report, id) =>
          reports.synchronized {
            reports += id -> report.collect()
              .map(r => (r.getString(0), r.getDouble(5))).toSeq
          }
      }.start()
    q.processAllAvailable()
    langs("b" -> 10).coalesce(1).write.mode("append").parquet(in)
    q.processAllAvailable(); q.stop()
    assert(reports.size == 2, reports)
    // a perfectly proportional batch has ZERO contribution everywhere
    assert(reports(0)._2.forall(_._2 == 0.0), reports(0))
    // the all-b batch alarms, and the streaming report is EXACTLY the
    // batch operator's on the same data (stream ≡ batch pin)
    val expected = graft.operators.Profiles
      .chiSquaredDrift(ref, langs("b" -> 10), "lang").collect()
      .map(r => (r.getString(0), r.getDouble(5))).toSeq
    assert(reports(1)._2 == expected, s"${reports(1)} vs $expected")
    assert(expected.map(_._2).sum > 5.0, "drifted batch must alarm")
  }

  test("streaming observation: per-micro-batch ingest metrics surface " +
      "in query progress without a second pass") {
    val in = tmpDir().toString
    Seq((Some(1L), "a"), (Some(2L), "b"), (Some(3L), "c"))
      .toDF("id", "v").coalesce(1).write.mode("append").parquet(in)
    Seq((Some(4L), "d"), (None: Option[Long], "e"))
      .toDF("id", "v").coalesce(1).write.mode("append").parquet(in)
    val schema = Seq((Some(1L), "x")).toDF("id", "v").schema
    import org.apache.spark.sql.functions.{count, lit, sum, when}
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
      .observe("gate", count(lit(1)).as("n"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("null_ids"))
      .writeStream.outputMode("append").format("memory")
      .queryName("obs_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    val metrics = q.recentProgress.toSeq
      .flatMap(p => Option(p.observedMetrics.get("gate")))
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("null_ids")))
    q.stop()
    // one metric row per micro-batch, zero extra scans — the numbers a
    // streaming ingest gate alerts on
    assert(metrics.toSet == Set((3L, 0L), (2L, 1L)), s"got $metrics")
  }

  test("streaming semantic decontamination: the stateless broadcast " +
      "sweep runs per micro-batch, parity with batch") {
    val dir = tmpDir().toString
    def emb(rows: (Long, Seq[Float])*) =
      rows.toSeq.toDF("id", "vec")
    // batch 1: one clean, one bench-identical; batch 2: one near-bench
    emb(1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.0f, 1.0f))
      .write.mode("append").parquet(dir)
    val bench = emb(100L -> Seq(0.0f, 1.0f)).select(col("vec"))
    val schema = emb(1L -> Seq(1.0f)).schema
    def run(name: String): Unit = {
      val q = graft.operators.Decontaminate.semanticOverlap(
          spark.readStream.schema(schema).parquet(dir), "id", "vec",
          bench, "vec", threshold = 0.95)
        .select("id", "max_sim", "flagged")
        .writeStream.outputMode("append").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    run("sem_s1")
    val r1 = spark.table("sem_s1").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(r1 == Map(1L -> false, 2L -> true))
    emb(3L -> Seq(0.05f, 0.999f)).write.mode("append").parquet(dir)
    run("sem_s2")
    val streamed = spark.table("sem_s2").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val batch = graft.operators.Decontaminate.semanticOverlap(
        emb(1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.0f, 1.0f),
          3L -> Seq(0.05f, 0.999f)), "id", "vec", bench, "vec", 0.95)
      .select("id", "max_sim", "flagged").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("streaming HLL cardinality: complete-mode sketch aggregation " +
      "across micro-batches ≡ batch sketch of the union") {
    import org.apache.spark.sql.functions.{hll_sketch_agg, lit}
    val dir = tmpDir().toString
    // drop 1: users 1..40 (two sources); drop 2 overlaps 21..60
    def docs(lo: Long, hi: Long) =
      (lo to hi).map(i => (i, if (i % 2 == 0) "web" else "books"))
        .toDF("doc_id", "source")
    docs(1, 40).write.mode("append").parquet(dir)
    val schema = docs(1, 1).schema
    def run(name: String): Unit = {
      val stream = spark.readStream.schema(schema).parquet(dir)
        .groupBy(col("source").as("group"))
        .agg(hll_sketch_agg(col("doc_id"), lit(12)).as("sketch"))
      val q = stream.writeStream.outputMode("complete").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    run("hll_s1")
    docs(21, 60).write.mode("append").parquet(dir)
    run("hll_s2")
    val est1 = graft.operators.Sketches.estimate(spark.table("hll_s1"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est1 == Map("web" -> 20L, "books" -> 20L))
    // after the second drop the streaming sketch must equal the batch
    // sketch over the DEDUPLICATED union — incremental ingest never
    // double-counts re-seen ids
    val est2 = graft.operators.Sketches.estimate(spark.table("hll_s2"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Sketches.estimate(
      graft.operators.Sketches.cardinalitySketch(
        docs(1, 40).unionByName(docs(21, 60)), col("source"),
        col("doc_id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est2 == batch, s"stream $est2 vs batch $batch")
    assert(est2 == Map("web" -> 30L, "books" -> 30L))
  }

  test("streaming Count-Min: complete-mode grid across micro-batches " +
      "≡ batch grid of the union (cell-wise, the md5 hashes are " +
      "engine/shard-stable)") {
    val dir = tmpDir().toString
    def toks(lo: Long, hi: Long) =
      (lo to hi).map(i => "t" + (i % 7)).toDF("tok")
    toks(1, 50).write.mode("append").parquet(dir)
    val schema = toks(1, 1).schema
    def run(name: String): Unit = {
      // the CMS build IS a (d, cell) count aggregation — it streams in
      // complete mode unchanged, no operator-specific state code
      val stream = graft.operators.Sketches.countMinBuild(
        spark.readStream.schema(schema).parquet(dir), col("tok"),
        depth = 3, width = 32)
      val q = stream.writeStream.outputMode("complete").format("memory")
        .queryName(name).trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    run("cms_s1")
    toks(51, 90).write.mode("append").parquet(dir)
    run("cms_s2")
    val batch = graft.operators.Sketches.countMinBuild(
      toks(1, 50).unionByName(toks(51, 90)), col("tok"),
      depth = 3, width = 32)
    assertSameRows(spark.table("cms_s2"), batch)
    // estimates from the streamed grid equal exact counts (no
    // collisions at this vocabulary size — 7 terms, 32 cells/row)
    val est = graft.operators.Sketches.countMinEstimate(
        spark.table("cms_s2"), toks(1, 7).select(col("tok")).distinct(),
        col("tok"), depth = 3, width = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = (1L to 90L).map(i => "t" + (i % 7))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(est == exact, s"est $est vs exact $exact")
  }
}
