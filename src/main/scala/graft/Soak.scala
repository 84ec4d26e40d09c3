package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pipelines, Rank, Sampling}

/** Scale soak over the zero-storage [[graft.sources.SynthDocs]]
  * generator: run the scale primitives (line dedup, verified near-dup,
  * global rank, per-key percent rank) on a corpus 10–50× the bench
  * scale and prove TWO things the small-SF gates cannot:
  *
  *  1. wall-time scales roughly linearly (recorded in BASELINE.md per
  *     round — a primitive that falls over here gets flagged before a
  *     cluster does it);
  *  2. NO PLAN DRIFT: the physical plan's exchange count at the soak
  *     scale equals the count at 1/50th of it. A plan that picks up an
  *     extra shuffle, loses a broadcast to a size estimate, or stops
  *     reusing an exchange as inputs grow is exactly the regression
  *     class that only shows at scale — the soak fails loudly on it
  *     (exit 1), it does not just report.
  *
  * The corpus is adversarially shaped where it matters: `dedup_lines`
  * gets a planted hot line on 10% of docs (the partial-agg map-side
  * collapse must absorb it), `per_key_pct` gets a dominant key holding
  * HALF the corpus (the one-task window cliff the bucket decomposition
  * exists to kill). `verified_near_dups` runs on the raw generator text
  * (near-dup pipelines sit after exact dedup; a planted identical text
  * would measure the exact-dup guard, not the LSH path).
  *
  * `SPARK_GRAFT_SOAK_ROWS` (default 1M ≈ sf20-equivalent documents),
  * `SPARK_GRAFT_CPUS` (default 32). Prints ONE JSON line:
  * `{"rows":N,"ops":{name:{"secs":s,"exchanges":e,"exchanges_small":e2,
  * "drift":bool}},"drift":bool}`. */
object Soak {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_SOAK_ROWS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val smallRows = math.max(rows / 50, 10000L)
    val spark = GraftSession
      .builder(s"local[$cpus]", "graft-soak", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // soak the RELIABLE checkpoint path (graft.checkpoint.dir) when
    // asked — quantifies the durability trade at scale
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR").foreach(d =>
      spark.conf.set(graft.operators.Checkpoints.ConfKey, d))
    spark.range(16).repartition(4).count() // scheduler warm-up

    def corpus(n: Long): DataFrame =
      spark.read.format("synthdocs").option("rows", n.toString).load()

    /** Hot-line + dominant-key shaping (see scaladoc). */
    def shaped(n: Long): DataFrame = corpus(n)
      .withColumn("text",
        when(col("doc_id") % 10 === 0,
          lit("the quick shared boilerplate line appears everywhere\n" +
            "and a second shared line rides along"))
          .otherwise(col("text")))
      .withColumn("lang",
        when(col("doc_id") % 2 === 0, lit("en")).otherwise(col("source")))
      .withColumn("score",
        (abs(hash(col("text"))) % 100000).cast("double") / 7.0)

    val ops: Seq[(String, Long => DataFrame)] = Seq(
      "dedup_lines" -> ((n: Long) =>
        Dedup.dedupLines(shaped(n).select(col("doc_id"), col("text")),
          "doc_id", "text")),
      "verified_near_dups" -> ((n: Long) =>
        Dedup.verifiedNearDups(
          corpus(n).select(col("doc_id"), col("text")),
          "doc_id", "text", threshold = 0.8)),
      "global_rank" -> ((n: Long) =>
        Rank.globalRank(
          shaped(n).select(col("doc_id"), col("score")),
          Seq(col("score").asc, col("doc_id").asc), "rk")),
      "per_key_pct" -> ((n: Long) =>
        Rank.perKeyPercentRank(
          shaped(n).select(col("doc_id"), col("lang"), col("score")),
          col("lang"), col("doc_id"), col("score"))),
      "c4_line_dedup" -> ((n: Long) =>
        Dedup.dedupLinesC4(shaped(n).select(col("doc_id"), col("text")),
          "doc_id", "text", minLineChars = 10, minLineWords = 3)),
      "count_min" -> ((n: Long) =>
        graft.operators.Sketches.countMinBuild(
          corpus(n).select(explode(split(col("text"), " ")).as("tok")),
          col("tok"), depth = 4, width = 4096)),
      "auc" -> ((n: Long) =>
        graft.operators.Metrics.auc(
          shaped(n).select(col("doc_id"), col("score"),
            (col("doc_id") % 3 === 0).as("y")),
          col("score"), col("y"), col("doc_id"))),
      // round-11 additions: the categorical drift test (aggregation +
      // small-table join shape), PMI (bigram projection + two-level
      // aggregation + word-keyed joins + TakeOrdered), c-TF-IDF
      // (explode + WindowGroupLimit cut), t-closeness (the
      // dominant-key 'en' from shaped() stresses the quasi-id window)
      "chi_drift" -> ((n: Long) =>
        graft.operators.Profiles.chiSquaredDrift(
          shaped(n).select(col("lang")),
          shaped(n).filter(col("lang") =!= "en" ||
            col("doc_id") % 3 === 0).select(col("lang")), "lang")),
      "pmi" -> ((n: Long) =>
        graft.operators.Vocab.pmiCollocations(
          corpus(n).select(col("text")), "text",
          minCount = 5, topK = 50)),
      "ctfidf" -> ((n: Long) =>
        graft.operators.Vocab.cTfIdfTopTerms(
          corpus(n).select(col("source"), col("text")),
          "source", "text", k = 5)),
      "t_closeness" -> ((n: Long) =>
        graft.operators.Checks.tClosenessViolations(
          shaped(n).select(col("source"), col("lang")),
          Seq("source"), "lang", t = 0.05)),
      // round-12 additions: FS linkage (block-bounded join fan-out —
      // ~20 rows/block keeps pairs linear in n), leakage-free split
      // (LSH closure over the near-unique corpus), Adamic-Adar
      // co-occurrence (5-item baskets), Poisson bootstrap (the
      // replicate fan-out exploded under a rep-keyed aggregation)
      "linkage" -> ((n: Long) => {
        val blocks = math.max(n / 20, 1L)
        def side(pert: Boolean) = corpus(n).select(
          (if (pert) col("doc_id") + 100000000L else col("doc_id"))
            .as("id"),
          (col("doc_id") % blocks).as("blk"),
          (if (pert) when(col("doc_id") % 7 === 0,
            concat(col("source"), lit("X"))).otherwise(col("source"))
          else col("source")).as("f0"),
          ((col("doc_id") * (if (pert) 31L else 31L)) % 100).as("f1"))
        graft.operators.EntityResolution.linkage(
          side(pert = false), side(pert = true), "id", "id", "blk",
          "blk", Seq(
            graft.operators.EntityResolution.FieldRule("f0", "f0",
              6.0, -4.0),
            graft.operators.EntityResolution.FieldRule("f1", "f1",
              3.0, -2.0)),
          matchAt = 8.0, possibleAt = 4.0)
      }),
      "leakage_split" -> ((n: Long) =>
        Pipelines.leakageFreeSplit(
          corpus(n).select(col("doc_id"), col("text")),
          "doc_id", "text", evalBp = 1000)),
      "cooccurrence" -> ((n: Long) =>
        graft.operators.Graph.coOccurrence(
          corpus(n).select((col("doc_id") / 5).cast("long").as("g"),
            ((col("doc_id") * 2654435761L) % 10000).as("i")),
          "g", "i", minSupport = 2L)),
      "bootstrap_ci" -> ((n: Long) =>
        Sampling.poissonBootstrapCI(
          shaped(n).select(col("doc_id"), col("score")),
          "score", "doc_id", replicates = 16)),
      // round-12b additions: priority sampling (TakeOrdered heap —
      // zero exchanges at any n), memorization scan (1/1000 candidate
      // sample broadcast against the full corpus stream), label
      // propagation (graph size scales with n), conformal threshold
      // (range-decomposed order statistic), trimmed mean (dominant-key
      // 'en' stresses the bucket decomposition), KNN-Shapley (8
      // validation points against the full corpus — parallelism is
      // |valid| by contract, each partition |train|-sized)
      "priority_sample" -> ((n: Long) =>
        Sampling.prioritySample(
          shaped(n).select(col("doc_id"), col("score")),
          "doc_id", "score", k = 1000)),
      "memorization" -> ((n: Long) =>
        graft.operators.Decontaminate.memorizationScan(
          corpus(n).filter(col("doc_id") % 1000 === 0)
            .select(col("doc_id"), col("text")),
          corpus(n).select(col("doc_id"), col("text")),
          "doc_id", "text", n = 6)),
      "label_prop" -> ((n: Long) => {
        val m = math.max(n / 50, 100L)
        graft.operators.Graph.labelPropagation(
          corpus(n).select((col("doc_id") % m).as("s"),
            ((col("doc_id") * 7 + 11) % m).as("d")),
          "s", "d", sweeps = 2)
      }),
      "conformal" -> ((n: Long) =>
        graft.operators.Metrics.conformalThreshold(
          shaped(n).select(col("doc_id"), col("score")),
          "score", "doc_id", alpha = 0.1)),
      "trimmed_mean" -> ((n: Long) =>
        graft.operators.Profiles.trimmedMeanByKey(
          shaped(n).select(col("lang"), col("doc_id"), col("score")),
          "lang", "doc_id", "score", trimBp = 500)),
      "knn_shapley" -> ((n: Long) => {
        def vec(c: org.apache.spark.sql.Column) =
          transform(sequence(lit(1), lit(8)), i =>
            ((abs(hash(c * i)) % 1000).cast("double") / lit(1000.0))
              .cast("float"))
        def side(f: DataFrame) = f.select(col("doc_id"),
          vec(col("doc_id")).as("emb"), (col("doc_id") % 4).as("y"))
        graft.operators.Valuation.knnShapley(
          side(corpus(n).filter(col("doc_id") % 97 =!= 0)),
          side(corpus(n).filter(col("doc_id") < 8)),
          "doc_id", "emb", "y", k = 5)
      }),
      // round-12c additions: KS + Wasserstein drift (distinct-value
      // domain cumulatives — n_chars-like cardinality stays bounded as
      // the corpus grows, the range exchanges must not drift), edit-
      // distance join (deletion-neighborhood fan-out over the DISTINCT
      // value table — distinct prefixes grow sublinearly), HITS and
      // k-core (graph size scales with n, per-sweep plan must not
      // drift), sessionization (per-user windows under a power-user
      // key: doc_id % m gives every user ~50 events at any n)
      "ks_drift" -> ((n: Long) =>
        graft.operators.Profiles.ksTest(
          shaped(n).filter(col("lang") === "en"),
          shaped(n).filter(col("lang") =!= "en"), "score")),
      "wasserstein" -> ((n: Long) =>
        graft.operators.Profiles.wasserstein1(
          shaped(n).filter(col("lang") === "en"),
          shaped(n).filter(col("lang") =!= "en"), "score")),
      "edit_join" -> ((n: Long) =>
        Dedup.editDistanceJoin(
          corpus(n).select(substring(col("text"), 1, 12).as("t")),
          "t", maxDist = 1)),
      "hits" -> ((n: Long) => {
        val m = math.max(n / 50, 100L)
        graft.operators.Graph.hits(
          corpus(n).select((col("doc_id") % m).as("s"),
            ((col("doc_id") * 7 + 11) % m).as("d")),
          "s", "d", sweeps = 2)
      }),
      "kcore" -> ((n: Long) => {
        val m = math.max(n / 50, 100L)
        graft.operators.Graph.kCore(
          corpus(n).select((col("doc_id") % m).as("s"),
            ((col("doc_id") * 7 + 11) % m).as("d")),
          "s", "d", k = 2, sweeps = 2)
      }),
      "sessionize" -> ((n: Long) => {
        val users = math.max(n / 50, 100L)
        graft.operators.Funnel.sessionize(
          corpus(n).select((col("doc_id") % users).as("u"),
            (col("doc_id") * 1000000L).as("ts"), col("doc_id").as("eid")),
          "u", "ts", "eid", gapNanos = 50000000L)
      }),
      // round-12d additions: bestThreshold (checkpointed descending
      // cumulatives over the score domain), aucByKey (per-key window
      // over the (key, distinct score) table — 'en' holds half the
      // corpus but the score domain stays bounded), quantileNormalize
      // (exact per-key percent rank + pooled rank join — the
      // heaviest composition here, two rank decompositions and a
      // corpus-sized equi-join)
      "best_threshold" -> ((n: Long) =>
        graft.operators.Metrics.bestThreshold(
          shaped(n).select(col("doc_id"), col("score")),
          col("score"), col("doc_id") % 3 === 0)),
      "auc_by_key" -> ((n: Long) =>
        graft.operators.Metrics.aucByKey(
          shaped(n).select(col("lang"), col("doc_id"), col("score")),
          col("lang"), col("score"), col("doc_id") % 3 === 0)),
      "quantile_normalize" -> ((n: Long) =>
        graft.operators.Profiles.quantileNormalize(
          shaped(n).select(col("lang"), col("doc_id"), col("score")),
          "lang", "doc_id", "score")),
      // round-13 additions: freshness (ONE map-combined aggregation —
      // the whole audit), odds ratios (per-key 2×2 conditional-sum
      // cells), source-similarity (per-key top-k via the map-side
      // WindowGroupLimit + a k-bounded pair join; the dominant 'en'
      // key from shaped() stresses the top-k cut)
      "freshness" -> ((n: Long) =>
        graft.operators.Checks.freshness(
          shaped(n).select(col("lang"),
            (col("doc_id") * 1000000L).as("ts")),
          "lang", "ts", nowNanos = n * 1000000L + 1000L,
          staleAfterNanos = n * 500000L)),
      "odds_ratios" -> ((n: Long) =>
        graft.operators.Metrics.oddsRatios(
          shaped(n).select(col("lang"), col("doc_id"), col("score")),
          "lang", col("doc_id") % 2 === 0, col("score") > 7000.0)),
      "source_similarity" -> ((n: Long) =>
        graft.operators.Vocab.sourceSimilarity(
          corpus(n).select(col("source"), col("doc_id"), col("text")),
          "source", "doc_id", "text", k = 15)))

    /** Non-reused exchange count of the EXECUTED (final adaptive)
      * plan — the plan-drift fingerprint. */
    def exchanges(df: DataFrame): Int = {
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      p.linesIterator.count(l =>
        l.contains("Exchange ") && !l.contains("ReusedExchange"))
    }

    // builder-side iteration aid (mirrors Verify's SPARK_GRAFT_ONLY):
    // soak just the named ops, e.g. when pushing one family to 5M+.
    // Blank entries are dropped and an all-blank value is treated as
    // unset (a bare SPARK_GRAFT_SOAK_OPS= would otherwise yield
    // Set("") and silently soak NOTHING); unknown names fail loudly.
    val only = sys.env.get("SPARK_GRAFT_SOAK_OPS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names -- ops.map(_._1).toSet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_SOAK_OPS names unknown ops: " +
          s"${unknown.toSeq.sorted.mkString(", ")} — valid: " +
          ops.map(_._1).sorted.mkString(", "))
    }
    var drifted = false
    val parts = ops
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, build) =>
      val eSmall = exchanges(build(smallRows))
      System.gc()
      val t0 = System.nanoTime()
      val big = build(rows)
      val eBig = exchanges(big)
      val secs = (System.nanoTime() - t0) / 1e9
      val drift = eBig != eSmall
      drifted ||= drift
      s""""$name":{"secs":$secs,"exchanges":$eBig,""" +
        s""""exchanges_small":$eSmall,"drift":$drift}"""
    }
    // steady-state checkpoint footprint on the reliable path: with the
    // Chain lifecycle this should be bounded (≤2 generations per live
    // chain + released finals awaiting driver GC), not one rdd-* dir
    // per sweep per op — the number that used to grow unboundedly
    val ckptBytes = spark.sparkContext.getCheckpointDir.map { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }
    val ckptJson = ckptBytes.map(b => s""","ckpt_bytes":$b""").getOrElse("")
    println(s"""{"rows":$rows,"small_rows":$smallRows,"cpus":$cpus,""" +
      s""""ops":{${parts.mkString(",")}},"drift":$drifted$ckptJson}""")
    spark.stop()
    if (drifted) sys.exit(1)
  }
}
