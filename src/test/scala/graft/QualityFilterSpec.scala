package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityFilter
import scala.jdk.CollectionConverters._

/** [[graft.operators.QualityFilter]] — the trained quality head.
  * Fixtures plant two vocabularies so class separation is strong and
  * assertions can be categorical; the catalog entries (q115/q116)
  * cover the weak-signal regime against the DuckDB oracle. */
class QualityFilterSpec extends TestBase {

  import spark.implicits._

  // class A speaks {alpha..}, class B {delta..}; both share filler so
  // neither class is trivially disjoint in feature space
  private def classes = {
    val a = Seq.tabulate(20)(i =>
      (i.toLong, s"alpha beta gamma alpha the of beta gamma alpha a$i"))
    val b = Seq.tabulate(20)(i =>
      (100L + i, s"delta epsilon zeta delta the of epsilon zeta b$i"))
    (a.toDF("doc_id", "text"), b.toDF("doc_id", "text"))
  }

  test("trainLda separates planted classes; gate keeps exactly the " +
      "target-like docs") {
    val (pos, neg) = classes
    val model = QualityFilter.trainLda(pos, "doc_id", "text",
      neg, "doc_id", "text", numBuckets = 64)
    val all = pos.union(neg)
    val scored = QualityFilter.scoreWith(all, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored.size == 40)
    val posProbs = (0L until 20L).map(scored)
    val negProbs = (100L until 120L).map(scored)
    assert(posProbs.min > 0.5,
      s"a positive doc scored below ½: ${posProbs.min}")
    assert(negProbs.max < 0.5,
      s"a negative doc scored above ½: ${negProbs.max}")
    val kept = QualityFilter.classifierGate(all, "doc_id", "text", model)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (0L until 20L).toSet)
  }

  test("fused trainLdaAndScore ≡ trainLda + scoreWith bit-identically, " +
      "and the fused gate keeps the same rows (null predicate excluded " +
      "like the two-filter form)") {
    val (pos, neg) = classes
    // a null-source row must be excluded from fit AND score on both
    // paths (filter(!p) drops null predicates; so does the fused y)
    val all = pos.withColumn("source", lit("tgt"))
      .union(neg.withColumn("source", lit("crawl")))
      .union(Seq((999L, "alpha beta filler the of"))
        .toDF("doc_id", "text")
        .withColumn("source", lit(null: String)))
    val pred = col("source") === "tgt"
    val model = QualityFilter.trainLda(
      all.filter(pred), "doc_id", "text",
      all.filter(!pred), "doc_id", "text", numBuckets = 64)
    val twoPass = QualityFilter
      .scoreWith(all.filter(pred.isNotNull), "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    val fused = QualityFilter.trainLdaAndScore(all, "doc_id", "text",
        posPred = pred, numBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1)
    assert(fused.toSeq == twoPass.toSeq,
      "fused fit+score diverged from the two-pass form")
    assert(!fused.exists(_._1 == 999L),
      "null-predicate row leaked into the fused scores")
    val gateTwo = QualityFilter.classifierGate(all, "doc_id", "text",
      model).select("doc_id").collect().map(_.getLong(0)).toSet
    val gateFused = QualityFilter.trainLdaAndGate(all, "doc_id", "text",
        posPred = pred, numBuckets = 64)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the two-pass gate scores the null-source row too (σ̃ of whatever
    // its features say); the fused gate excludes it from scoring — the
    // comparison holds on the labelled rows
    assert(gateFused == (gateTwo - 999L),
      "fused gate kept a different labelled-row set")
  }

  test("trainLda is deterministic: repartitioned inputs fit the " +
      "bit-identical head") {
    val (pos, neg) = classes
    val m1 = QualityFilter.trainLda(pos, "doc_id", "text",
      neg, "doc_id", "text", numBuckets = 64)
    val m2 = QualityFilter.trainLda(pos.repartition(7), "doc_id", "text",
      neg.repartition(5), "doc_id", "text", numBuckets = 64)
    assert(m1.bias == m2.bias, "bias drifted with partitioning")
    assert(m1.weights.toSeq == m2.weights.toSeq,
      "weights drifted with partitioning")
  }

  test("gradient-descent train separates a strongly-split corpus and " +
      "sharpens with iterations") {
    val (pos, neg) = classes
    def sep(iters: Int): Double = {
      val m = QualityFilter.train(pos, "doc_id", "text",
        neg, "doc_id", "text", numBuckets = 64, iters = iters)
      val p = QualityFilter.scoreWith(pos.union(neg), "doc_id", "text", m)
        .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
      val mp = (0L until 20L).map(p).sum / 20
      val mn = (100L until 120L).map(p).sum / 20
      mp - mn
    }
    val s1 = sep(1); val s3 = sep(3)
    assert(s1 > 0, s"one GD step failed to separate: $s1")
    assert(s3 > s1, s"separation did not sharpen: iter1=$s1 iter3=$s3")
  }

  test("GD train is deterministic under repartitioning") {
    val (pos, neg) = classes
    val m1 = QualityFilter.train(pos, "doc_id", "text",
      neg, "doc_id", "text", numBuckets = 64, iters = 2)
    val m2 = QualityFilter.train(pos.repartition(9), "doc_id", "text",
      neg.repartition(3), "doc_id", "text", numBuckets = 64, iters = 2)
    assert(m1.bias == m2.bias && m1.weights.toSeq == m2.weights.toSeq,
      "GD trajectory drifted with partitioning")
  }

  test("saveModel/loadModel round-trips bit-exactly and serves " +
      "identical scores") {
    val (pos, neg) = classes
    val model = QualityFilter.trainLda(pos, "doc_id", "text",
      neg, "doc_id", "text", numBuckets = 64)
    val path = s"${tmpDir()}/qf_model.parquet"
    QualityFilter.saveModel(model, path)(spark)
    val loaded = QualityFilter.loadModel(spark, path)
    assert(loaded.bias == model.bias &&
      loaded.weights.toSeq == model.weights.toSeq &&
      loaded.numBuckets == model.numBuckets &&
      loaded.salt == model.salt)
    val all = pos.union(neg)
    val live = QualityFilter.scoreWith(all, "doc_id", "text", model)
      .orderBy("doc_id").collect().toSeq
    val served = QualityFilter.scoreWith(all, "doc_id", "text", loaded)
      .orderBy("doc_id").collect().toSeq
    assert(live == served, "loaded model served different scores")
  }

  test("cross-session serving: a fresh session loads the saved head " +
      "and scores bit-identically to the training session") {
    val (pos, neg) = classes
    val model = QualityFilter.trainLda(pos, "doc_id", "text",
      neg, "doc_id", "text", numBuckets = 64)
    val path = s"${tmpDir()}/qf_model_xsession.parquet"
    QualityFilter.saveModel(model, path)(spark)
    val live = QualityFilter.scoreWith(pos.union(neg), "doc_id", "text",
      model).orderBy("doc_id").collect().toSeq
    // a NEW session (fresh session state, no shared temp views/config)
    val s2 = spark.newSession()
    val loaded = QualityFilter.loadModel(s2, path)
    val all2 = s2.createDataFrame(pos.union(neg).collect().toList.asJava,
      pos.schema)
    val served = QualityFilter.scoreWith(all2, "doc_id", "text", loaded)
      .orderBy("doc_id").collect().toSeq
    assert(live == served,
      "cross-session served scores diverged from the training session")
  }

  test("loadModel refuses a parquet file without model metadata") {
    val path = s"${tmpDir()}/not_a_model.parquet"
    QuackIO.writeTable(Seq((1, 2.0)).toDF("bucket", "w"), path)
    val e = intercept[RuntimeException](QualityFilter.loadModel(spark, path))
    assert(e.getMessage.contains("graft.qf.numBuckets"))
  }

  test("null/empty-text docs yield no features and no scores") {
    val df = Seq((1L, "alpha beta"), (2L, ""), (3L, null.asInstanceOf[String]),
      (4L, "   ")).toDF("doc_id", "text")
    val feats = QualityFilter.docFeatures(df, "doc_id", "text", 64)
    assert(feats.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet == Set(1L))
    val (pos, neg) = classes
    val model = QualityFilter.trainLda(pos, "doc_id", "text",
      neg, "doc_id", "text", numBuckets = 64)
    assert(QualityFilter.scoreWith(df, "doc_id", "text", model)
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("tf features: per-doc values sum to 1 and are length-normalized") {
    val df = Seq((1L, "w w w"), (2L, "v v v v v v v v v v v v"))
      .toDF("doc_id", "text")
    val sums = QualityFilter.docFeatures(df, "doc_id", "text", 64)
      .groupBy("doc_id").agg(sum("x").as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(sums(1L) - 1.0) < 1e-12)
    assert(math.abs(sums(2L) - 1.0) < 1e-12)
  }

  test("loud contracts: bad hyperparameters and empty classes raise") {
    val (pos, neg) = classes
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    intercept[IllegalArgumentException](QualityFilter.train(pos,
      "doc_id", "text", neg, "doc_id", "text", iters = 0))
    intercept[IllegalArgumentException](QualityFilter.train(pos,
      "doc_id", "text", neg, "doc_id", "text", lr = 0.0))
    intercept[IllegalArgumentException](QualityFilter.train(pos,
      "doc_id", "text", neg, "doc_id", "text", l2 = -1.0))
    intercept[IllegalArgumentException](QualityFilter.trainLda(pos,
      "doc_id", "text", neg, "doc_id", "text", eps = 0.0))
    intercept[IllegalArgumentException](QualityFilter.trainLda(empty,
      "doc_id", "text", neg, "doc_id", "text"))
    intercept[IllegalArgumentException](QualityFilter.trainLda(pos,
      "doc_id", "text", empty, "doc_id", "text"))
    intercept[IllegalArgumentException](
      QualityFilter.docFeatures(pos, "doc_id", "text", 0))
  }

  test("native FeatureBuckets is bit-identical to the HOF twin on " +
      "adversarial inputs") {
    val texts = Seq(
      "alpha beta gamma", "  leading and trailing  ", "one",
      "", "   ", null.asInstanceOf[String],
      "tabs\tand\nnewlines\r\nmixed", "UPPER Case MiXeD",
      "unicode: héllo wörld ÉÀÇ", "emoji 🎉 mix 🎉🎉",
      "a b a b a", "x" * 500, ("w " * 300).trim,
      "punct. end! quest? \"quoted\" (paren)",
      "digits 123 456.789 1e-8")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (nb <- Seq(7, 256, 4096)) {
      val got = df.select(col("doc_id"),
        operators.Dsir.featureBuckets(col("text"), nb, "qf").as("n"),
        operators.Dsir.featureBucketsHof(col("text"), nb, "qf").as("h"))
        .collect()
      got.foreach { r =>
        val n = Option(r.getSeq[Long](1)).map(_.toList)
        val h = Option(r.getSeq[Long](2)).map(_.toList)
        assert(n == h, s"doc ${r.getLong(0)} nb=$nb: native $n vs twin $h")
      }
    }
  }

  test("scoreInline agrees with scoreWith to float accumulation and " +
      "plans zero exchanges") {
    val (pos, neg) = classes
    val model = QualityFilter.trainLda(pos, "doc_id", "text",
      neg, "doc_id", "text", numBuckets = 64)
    val all = pos.union(neg)
    val byGroup = QualityFilter.scoreWith(all, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val inline = QualityFilter.scoreInline(all, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(inline.keySet == byGroup.keySet)
    inline.foreach { case (id, (nf, lg, pr)) =>
      val (nf2, lg2, pr2) = byGroup(id)
      assert(nf == nf2, s"doc $id n_feats $nf vs $nf2")
      assert(math.abs(lg - lg2) < 1e-9, s"doc $id logit $lg vs $lg2")
      assert(math.abs(pr - pr2) < 1e-9, s"doc $id prob $pr vs $pr2")
    }
    val p = QualityFilter.scoreInline(all, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"inline scorer must be a pure projection:\n$p")
  }

  test("scoreInline composes on a streaming DataFrame (stateless " +
      "projection; scoreWith's groupBy cannot)") {
    val (pos, neg) = classes
    val model = QualityFilter.trainLda(pos, "doc_id", "text",
      neg, "doc_id", "text", numBuckets = 64)
    val dir = tmpDir().toString
    val all = pos.union(neg)
    all.write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(all.schema).parquet(dir)
    val q = QualityFilter.scoreInline(stream, "doc_id", "text", model)
      .writeStream.outputMode("append").format("memory")
      .queryName("qf_stream_scores")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("qf_stream_scores")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val batch = QualityFilter.scoreInline(all, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(streamed == batch, "stream and batch scores diverged")
  }

  test("curateWithClassifier: exact copies die before training, the " +
      "trained gate keeps exactly the target slice, schema survives") {
    val (pos, neg) = classes
    val tagged = pos.withColumn("source", lit("tgt"))
      .union(neg.withColumn("source", lit("oth")))
      .select("doc_id", "source", "text")
    // a verbatim copy of doc 0 under a fresh id — dedup must kill it
    // BEFORE the head trains, or its text would double its moments
    val withCopy = tagged.union(
      tagged.filter(col("doc_id") === 0L)
        .select(lit(999L).as("doc_id"), col("source"), col("text")))
    val kept = operators.Pipelines.curateWithClassifier(withCopy,
      "doc_id", "text", "source", Seq("tgt"),
      minTokens = 5, minStopHits = 2, numBuckets = 64)
    assert(kept.columns.toSeq ==
      Seq("doc_id", "source", "text", "n_tokens"))
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(999L), "the planted copy survived dedup")
    assert(ids == (0L until 20L).toSet,
      s"trained gate kept the wrong slice: $ids")
    intercept[IllegalArgumentException](
      operators.Pipelines.curateWithClassifier(withCopy, "doc_id",
        "text", "source", Seq.empty))
  }

  test("trainLda fits in ONE SQL execution: per-class doc counts ride " +
      "the moment aggregation as bucket -1 marker rows, no count scans") {
    val (pos, neg) = classes
    @volatile var execs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case _: org.apache.spark.sql.execution.ui
              .SparkListenerSQLExecutionStart => execs += 1
          case _ =>
        }
    }
    spark.sparkContext.addSparkListener(l)
    val model =
      try {
        val m = QualityFilter.trainLda(pos, "doc_id", "text",
          neg, "doc_id", "text", numBuckets = 64)
        // listener delivery is async: wait for the first event, then a
        // settle window so a straggling second execution would count
        val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
        while (execs < 1 && System.nanoTime < deadline) Thread.sleep(20)
        Thread.sleep(500)
        m
      } finally spark.sparkContext.removeSparkListener(l)
    assert(execs == 1,
      s"trainLda ran $execs SQL executions, expected exactly 1")
    // the folded counts feed the same fit: scores still separate the
    // classes the way the three-scan form did
    val scored = QualityFilter.scoreInline(
      pos.union(neg), "doc_id", "text", model)
    val byClass = scored.select(col("doc_id"), col("prob"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val (p, n) = byClass.partition(_._1 < 20L)
    assert(p.map(_._2).min > n.map(_._2).max,
      "trained head no longer separates the fixture classes")
  }

  test("curateWithClassifier stagingDir: staged and unstaged runs are " +
      "row-identical; the staged gate serves from the materialized table") {
    val (pos, neg) = classes
    val tagged = pos.withColumn("source", lit("tgt"))
      .union(neg.withColumn("source", lit("oth")))
      .select("doc_id", "source", "text")
    val dir = s"${tmpDir()}/cwc_staging"
    val unstaged = operators.Pipelines.curateWithClassifier(tagged,
      "doc_id", "text", "source", Seq("tgt"),
      minTokens = 5, minStopHits = 2, numBuckets = 64)
    val staged = operators.Pipelines.curateWithClassifier(tagged,
      "doc_id", "text", "source", Seq("tgt"),
      minTokens = 5, minStopHits = 2, numBuckets = 64,
      stagingDir = Some(dir))
    assert(staged.columns.toSeq == unstaged.columns.toSeq)
    assert(staged.collect().toSet == unstaged.collect().toSet,
      "staged and unstaged curation diverged")
    // the materialized table exists and the staged SERVING plan scans
    // it instead of recomputing the gopher gate + fingerprint shuffle:
    // no gopher columns and no dedup aggregation above the scan
    assert(new java.io.File(dir).listFiles().exists(
      _.getName.endsWith(".parquet")), "staging table not written")
    val p = staged.queryExecution.executedPlan.toString
    assert(p.contains("cwc_staging"),
      s"staged gate must read the materialized table:\n$p")
    assert(!p.contains("gopher_pass"),
      s"staged gate must not recompute the cleaning chain:\n$p")
  }

  test("plan shape: weights broadcast, the corpus never does; the gate " +
      "is a left-semi join; no Window in the feature pass") {
    val (pos, neg) = classes
    val model = QualityFilter.trainLda(pos, "doc_id", "text",
      neg, "doc_id", "text", numBuckets = 64)
    val all = pos.union(neg)
    val scorePlan = QualityFilter.scoreWith(all, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(scorePlan.contains("BroadcastHashJoin"),
      s"weights must broadcast:\n$scorePlan")
    assert(!scorePlan.contains("Window"),
      s"tf normalization must not plan a Window:\n$scorePlan")
    val gatePlan = QualityFilter.classifierGate(all, "doc_id", "text",
      model).queryExecution.executedPlan.toString
    assert(gatePlan.contains("LeftSemi"),
      s"gate must be a left-semi join:\n$gatePlan")
  }
}
