package graft

import org.apache.spark.sql.functions._

/** Plan-shape assertions for the 100 TB posture: filters/projections must
  * reach the parquet scan, small dims must broadcast, partitioned layout
  * must prune, bucketed layout must join without an exchange. These guard
  * against regressions that stay invisible at test scale but dominate at
  * cluster scale. */
class ScaleSpec extends TestBase {

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q05 pushes the shipdate filter and prunes columns at the scan") {
    val p = plan(SparkEntry.queries("q05_agg_pricing")(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate"), s"filter not pushed:\n$p")
    // only the 7 needed columns are read, not all 11
    assert(p.contains("l_returnflag") && !p.contains("l_partkey"),
      s"column pruning missing:\n$p")
  }

  test("q09 uses a broadcast hash join for the part dimension") {
    val p = plan(SparkEntry.queries("q09_join_broadcast")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q02 prefix filter is pushed as StringStartsWith") {
    val p = plan(SparkEntry.queries("q02_filter_prefix")(spark, sf))
    assert(p.contains("StringStartsWith(c_mktsegment,B)"),
      s"startswith not pushed:\n$p")
  }

  test("whole-stage codegen covers the aggregation pipeline") {
    // AQE only shows codegen spans in the FINAL plan — execute first
    val df = SparkEntry.queries("q05_agg_pricing")(spark, sf)
    df.collect()
    val p = plan(df)
    // codegen stages render as "*(n) Operator" in the final plan string
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"),
      s"no codegen spans:\n$p")
  }

  test("partitionBy layout prunes partitions on read") {
    val dir = s"${tmpDir()}/events_parted"
    val df = spark.range(100).select(col("id"),
      (col("id") % 4).cast("string").as("bucket4"))
    QuackIO.writeTableDir(df, dir, WriteOptions(format = Some("parquet")),
      partitionBy = Seq("bucket4"))
    assert(new java.io.File(dir, "bucket4=0").exists)
    val read = QuackIO.readParquet(spark, Seq(dir))
      .filter(col("bucket4") === "1")
    val p = plan(read)
    assert(read.count() == 25)
    assert(p.contains("PartitionFilters: [isnotnull(bucket4"),
      s"partition pruning missing:\n$p")
  }

  test("corpus-statistics cuts are limit-aware: PMI top-K plans as " +
      "TakeOrdered (no global sort), c-TF-IDF per-key top-k plans as " +
      "WindowGroupLimit (map-side per-key top-k before the exchange)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val pmiPlan = plan(graft.operators.Vocab
      .pmiCollocations(docs, "text", minCount = 2, topK = 10))
    assert(pmiPlan.contains("TakeOrdered"),
      s"PMI topK must not global-sort:\n$pmiPlan")
    val ctPlan = plan(graft.operators.Vocab
      .cTfIdfTopTerms(docs, "source", "text", k = 3))
    assert(ctPlan.contains("WindowGroupLimit"),
      s"c-TF-IDF per-key cut must map-side limit:\n$ctPlan")
  }

  test("audit ops keep their exchange budgets: benford is one " +
      "aggregation + a 9-row spine, cusum rides ONE key exchange, " +
      "referential integrity never scans the parent twice") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.write.format("noop").mode("overwrite").save()
      plan(df).linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") &&
          !l.contains("ReusedExchange"))
    }
    // benford: ONE corpus aggregation (digit groupBy); spine/total
    // joins are broadcast/single-partition, not hash exchanges
    assert(exchanges(graft.operators.Checks
      .benford(li, "l_extendedprice", scale = 2)) <= 1)
    // cusum: both running frames AND the closing agg share one
    // key-partitioned exchange
    assert(exchanges(graft.operators.Checks.cusumAlarms(o,
      "o_orderpriority", "o_orderkey", "o_totalprice",
      100000.0, 0.0, 500000.0)) == 1)
    // referential integrity: ONE anti-join; parent side appears once
    val ri = graft.operators.Checks.referentialIntegrity(
      li, "l_orderkey", o, "o_orderkey")
    val p = plan(ri)
    assert("LeftAnti".r.findAllIn(p).size == 1, p)
  }

  test("bucketed tables join without an exchange on the bucket key") {
    val a = spark.range(1000).select(col("id"), (col("id") * 2).as("va"))
    val b = spark.range(1000).select(col("id"), (col("id") * 3).as("vb"))
    QuackIO.writeBucketedTable(a, "bkt_a", "parquet", Seq("id"), 4)
    QuackIO.writeBucketedTable(b, "bkt_b", "parquet", Seq("id"), 4)
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
    val p = plan(joined)
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$p")
    assert(joined.count() == 1000)
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
  }

  test("bucketed IVF index serving never exchanges the codes table") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < 4)
    graft.operators.AnnIndex.buildIvf(emb, "vec_id", "embedding",
      "annivf_scale", cents, "vec_id", "embedding", iters = 1,
      nBuckets = 4)
    val queries = emb.filter(col("vec_id") % 250 === 0)
    // disable auto-broadcast so the candidate join is a real SMJ — the
    // shape a 100 TB corpus with a LARGE query batch would take; the
    // bucketed codes side must still satisfy the join + gate-window
    // distribution without an Exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.operators.AnnIndex.queryIvf(spark, "annivf_scale",
        queries, "vec_id", "embedding", k = 5, probe = 2)
      val p = plan(df)
      val clusterExchanges =
        "Exchange hashpartitioning\\(cluster".r.findAllIn(p).length
      assert(clusterExchanges == 1,
        s"only the query side may shuffle on cluster — the bucketed codes" +
          s" scan must ride its layout:\n$p")
      assert(df.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("annivf_scale_codes", "annivf_scale_centroids",
        "annivf_scale_codebooks")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("q33 LSH near-dup scans embeddings ONCE and reuses one exchange") {
    val p = plan(SparkEntry.queries("q33_embed_neardup_lsh")(spark, sf))
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected exactly one embeddings scan, got $scans:\n$p")
    // the window's bucket shuffle is the only exchange before the pair
    // expansion (the groupBy reuses it: same key, no second Exchange)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1,
      s"expected one bucket exchange (window+groupBy fused), got $exchanges:\n$p")
  }

  test("q29 verified near-dups is join-free: set rides the LSH flow") {
    val p = plan(SparkEntry.queries("q29_neardup_verified")(spark, sf))
    // the planted-dup union reads the corpus twice by construction;
    // anything beyond that means the diamond (sets joined back) is back
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"expected <=2 corpus scans, got $scans:\n$p")
    assert(!p.contains("Join"), s"expected a join-free single flow:\n$p")
  }

  test("native-signature budgets: q25/q58 shuffle only at band buckets " +
    "and pair-dedup, q46 entropy never shuffles per character") {
    // the relational signature forms exchanged one row per shingle/token/
    // character; the native expressions moved that fold into the scan.
    // These budgets pin the exchange COUNT so a refactor reintroducing
    // the signature shuffle fails here, not on a 100 TB cluster.
    // q25 minhash LSH: bucket window+groupBy (fused, 1) + distinct (1)
    val p25 = plan(SparkEntry.queries("q25_dedup_minhash")(spark, sf))
    val e25 = "Exchange hashpartitioning".r.findAllIn(p25).length
    assert(e25 <= 2, s"q25 expected <=2 exchanges, got $e25:\n$p25")
    // q58 simhash banding: bucket window (1) + the r17 salted-cell
    // exchange — pinned REPARTITION_BY_NUM so the quadratic pair stage
    // can never be byte-coalesced onto one task (1) + dedup (1)
    val p58 = plan(SparkEntry.queries("q58_simhash_neardup")(spark, sf))
    val e58 = "Exchange hashpartitioning".r.findAllIn(p58).length
    assert(e58 <= 3, s"q58 expected <=3 exchanges, got $e58:\n$p58")
    assert(p58.contains("REPARTITION_BY_NUM"),
      s"q58 must pin the salted-cell exchange:\n$p58")
    // q46 char entropy: pure projection + the final orderBy only — no
    // hash exchange at all (the twin needed two)
    val p46 = plan(SparkEntry.queries("q46_char_entropy")(spark, sf))
    val e46 = "Exchange hashpartitioning".r.findAllIn(p46).length
    assert(e46 == 0, s"q46 expected zero hash exchanges, got $e46:\n$p46")
    // q147 cross-source fuzzy join: the verifiedNearDups single flow
    // over the side-tagged union — ZERO join operators (pairs expand
    // in-bucket), bucket window+groupBy (fused, 1) + pair dedup (1)
    val p147 = plan(SparkEntry.queries("q147_fuzzy_join")(spark, sf))
    assert(!p147.contains("SortMergeJoin") &&
      !p147.contains("BroadcastHashJoin") &&
      !p147.contains("ShuffledHashJoin"),
      s"q147 must not plan a join:\n$p147")
    val e147 = "Exchange hashpartitioning".r.findAllIn(p147).length
    assert(e147 <= 2, s"q147 expected <=2 exchanges, got $e147:\n$p147")
  }

  test("q140 footer count never scans a parquet data page") {
    // the plan must be a parallelized path list + footer reads — if a
    // parquet FileScan of lineitem appears, the metadata-only contract
    // broke and the 'count 100 TB in seconds' story with it
    val p = plan(SparkEntry.queries("q140_footer_count")(spark, sf))
    assert(!p.contains("FileScan parquet") &&
      !p.toLowerCase.contains("scan parquet"),
      s"q140 must not scan data files:\n$p")
  }

  test("q158/q159 codec transforms are pure map plans (final sort only)") {
    // resize/decimate are partition-parallel byte transforms: nothing
    // before the output orderBy may exchange
    for (q <- Seq("q158_bmp_resize", "q159_wav_decimate")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(hashEx == 0, s"$q expected zero hash exchanges:\n$p")
    }
  }

  test("q39 IVF broadcasts only the centroid set, never the corpus") {
    val p = plan(SparkEntry.queries("q39_ann_ivf")(spark, sf))
    // assignment = corpus × broadcast(centroids): each BroadcastExchange's
    // scan must carry the pushed centroid filter LessThan(vec_id,4) —
    // a broadcast without it would be a corpus-side broadcast
    val bSections = p.split("BroadcastExchange").drop(1)
    assert(bSections.nonEmpty, s"expected broadcast assignment:\n$p")
    bSections.foreach { s =>
      val scanPart = s.split("\n").find(_.contains("Scan parquet"))
      assert(scanPart.forall(_.contains("LessThan(vec_id,4)")),
        s"corpus-side broadcast detected:\n$p")
    }
  }

  test("q31 ANN gate windows the corpus pre-join with ONE bucket exchange") {
    val p = plan(SparkEntry.queries("q31_ann_lsh")(spark, sf))
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected query+corpus scans only, got $scans:\n$p")
    // the maxBucket gate (window count __cnt) must run on the corpus side
    // BEFORE the join, and its bucket shuffle must be the only one — the
    // join reuses it (same key); a second bucket exchange would mean the
    // gate forced a re-shuffle
    assert(p.contains("__cnt"), s"bucket-size gate missing from plan:\n$p")
    val bucketExch =
      "Exchange hashpartitioning\\(bucket".r.findAllIn(p).length
    assert(bucketExch == 1,
      s"expected one bucket exchange (gate+join fused), got $bucketExch:\n$p")
  }

  test("q55 k-means IVF broadcasts only centroid literals, never the corpus") {
    val p = plan(SparkEntry.queries("q55_ivf_kmeans")(spark, sf))
    // refined centroids are driver-side literals (KB): every broadcast
    // subtree must be a LocalTableScan, never a parquet corpus scan
    val bSections = p.split("BroadcastExchange").drop(1)
    assert(bSections.nonEmpty, s"expected broadcast assignment:\n$p")
    bSections.foreach { s =>
      val scanLine = s.split("\n").find(_.contains("Scan"))
      assert(scanLine.forall(_.contains("LocalTableScan")),
        s"corpus-side broadcast detected: ${scanLine.get}\n$p")
    }
  }

  test("q58 simhash banding is join-free within its planted-union budget") {
    val p = plan(SparkEntry.queries("q58_simhash_neardup")(spark, sf))
    // the planted near-dup union reads the corpus twice by construction;
    // candidates+verification must add NO joins and NO further scans
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 2, s"expected <=2 corpus scans, got $scans:\n$p")
    assert(!p.contains("Join"), s"expected a join-free banding flow:\n$p")
  }

  test("q59 PQ/ADC broadcasts the query tables, streams the coded corpus") {
    val p = plan(SparkEntry.queries("q59_pq_adc")(spark, sf))
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected query+corpus scans only, got $scans:\n$p")
    // every broadcast subtree must be the QUERY side (its scan carries
    // the pushed query filter); a corpus-side broadcast would ship the
    // full vector table instead of streaming codes
    val bSections = p.split("BroadcastExchange").drop(1)
    assert(bSections.nonEmpty, s"expected query-side broadcast:\n$p")
    bSections.foreach { s =>
      val scanLine = s.split("\n").find(_.contains("Scan parquet"))
      assert(scanLine.forall(_.contains("% 100")),
        s"corpus-side broadcast detected:\n$p")
    }
  }

  test("q42 curation pipeline stays within its inherent scan budget") {
    val p = plan(SparkEntry.queries("q42_curation_pipeline")(spark, sf))
    // planted-dup union = 2 scans; the survivors anti-join diamond = ×2.
    // More than 4 means a new recompute crept in.
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 4, s"expected <=4 scans, got $scans:\n$p")
  }

  test("q65 decontamination probes via broadcast; one corpus-count shuffle") {
    val p = plan(SparkEntry.queries("q65_decontaminate")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark probe must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus must not shuffle for the membership check:\n$p")
  }

  test("q71 incremental dedup ships fingerprints, not documents") {
    val p = plan(SparkEntry.queries("q71_incremental_dedup")(spark, sf))
    // the seen-side scan must prune to the text column that feeds the
    // fingerprint — reading all columns would ship whole documents
    val seenScans = p.linesIterator.filter(_.contains("Scan parquet")).toSeq
    assert(seenScans.nonEmpty)
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("source"), // documents has lang/source/n_chars cols
      s"seen side must not read non-fingerprint columns:\n$p")
  }

  test("q73 quantile gate: one broadcast cutoff, no corpus-wide sort") {
    val p = plan(SparkEntry.queries("q73_quantile_gate")(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"the 1-row cutoff must broadcast back over the corpus:\n$p")
    // exact percentile aggregates; it must NOT appear as a global Sort
    // of the corpus (the sort happens inside the aggregation buffer)
    val sorts = p.linesIterator.count(l =>
      l.contains("Sort ") && l.contains("global=true"))
    assert(sorts <= 1, s"unexpected corpus-wide sorts:\n$p") // final orderBy only
  }

  test("q74 label centroids: exchanges keyed on (label,pos) then label only") {
    val df = SparkEntry.queries("q74_label_centroids")(spark, sf)
    df.collect()
    val p = plan(df)
    // AQE final plan: hashpartitioning on label,pos and label (+ the
    // rangepartitioning of the final orderBy); nothing keyed on vec_id —
    // the corpus is never reshuffled by row identity
    assert(!p.contains("hashpartitioning(vec_id"),
      s"centroids must not shuffle by row id:\n$p")
    assert(p.contains("hashpartitioning(label"),
      s"expected label-keyed aggregation exchanges:\n$p")
  }

  test("q79 decon stage adds corpus+bench scans, not a pipeline recompute") {
    val p = plan(SparkEntry.queries("q79_curation_decon")(spark, sf))
    // q42's 4-scan budget + the raw-corpus contamination pass (2 scans —
    // the planted union) + the benchmark scan. Feeding the SURVIVORS to
    // Decontaminate instead recomputes the whole pipeline (9 scans).
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 7, s"expected <=7 scans, got $scans:\n$p")
  }

  test("GraftSession defaults pin the scale posture") {
    val c = GraftSession.defaultConfs(32)
    assert(c("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(c("spark.sql.shuffle.partitions") == "32")
    assert(c("spark.sql.files.maxPartitionBytes") == "134217728")
    assert(c("spark.sql.session.timeZone") == "UTC")
  }

  test("entry smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("single-file writeTable is the parity path; writeTableDir stays parallel") {
    val dir = s"${tmpDir()}/multi"
    val df = spark.range(0, 1000, 1, 8).toDF("id") // 8 partitions
    QuackIO.writeTableDir(df, dir, WriteOptions(format = Some("parquet")))
    val parts = new java.io.File(dir).listFiles
      .count(_.getName.startsWith("part-"))
    assert(parts == 8, s"expected 8 part files, got $parts")
  }

  test("lexicon quality classification is map-only: zero exchanges") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.operators.TextAnalysis.withLexiconQuality(
      d, "text", Seq("fast" -> 1.0, "slow" -> -1.0)))
    assert(!p.contains("Exchange"), s"expected a pure map plan:\n$p")
  }

  test("int8 quantization: the dim-keyed stats aggregation is the only " +
    "hash exchange; the 1-row stats broadcast to the encoder") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.operators.Quantize.int8Encode(emb, "vec_id",
      "embedding", graft.operators.Quantize.int8Stats(emb, "embedding")))
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"stats agg should be the only hash exchange:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"stats row must broadcast to the encoder, not shuffle it:\n$p")
  }

  test("random projection is map-only: zero exchanges") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.operators.Quantize.randomProject(emb, "embedding",
      graft.operators.Similarity.planeVectors(4, 64)))
    assert(!p.contains("Exchange"), s"expected a pure map plan:\n$p")
  }

  test("int8TopK serves from codes with broadcast queries: the hash " +
    "exchanges are the stats aggregations and the per-query rank only") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val stats = graft.operators.Quantize.int8Stats(emb, "embedding")
    val codes = graft.operators.Quantize.int8Encode(emb, "vec_id",
      "embedding", stats)
    val p = plan(graft.operators.Quantize.int8TopK(
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", codes,
      "vec_id", stats, k = 5))
    // stats subtree appears twice (encode + decode; persist it in
    // production) + the query_id rank window = 3; the CORPUS itself
    // never hash-shuffles
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 3, s"expected at most 3 hash exchanges, got $n:\n$p")
    assert(!p.contains("Exchange hashpartitioning(corpus_id"),
      s"corpus side must stream, not shuffle:\n$p")
  }

  test("Int8Index serving: precomputed stats remove the live path's " +
    "stats-agg exchanges — the per-query rank window is the only hash " +
    "exchange and the codes scan streams") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val dir = s"${tmpDir()}/int8idx_scale"
    graft.operators.Int8Index.build(emb, "vec_id", "embedding", dir)
    val p = plan(graft.operators.Int8Index.query(spark, dir,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5))
    // live int8TopK pays the stats aggregation (twice without reuse);
    // served from the index, stats are a 1-row parquet that broadcasts
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 1, s"expected only the per-query rank exchange, got $n:\n$p")
    assert(!p.contains("Exchange hashpartitioning(corpus_id"),
      s"codes side must stream, not shuffle:\n$p")
  }

  test("temperature mixture: source-keyed count exchanges only; rates " +
    "broadcast back to an unshuffled corpus filter") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"))
    val p = plan(graft.operators.Sampling.temperatureMixture(
      d, col("doc_id"), "source", targetDocs = 100))
    // the weights subtree feeds both Z and the rates (≤2 with reuse);
    // the corpus filter side itself never hash-shuffles
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 2, s"expected at most the count aggregations, got $n:\n$p")
    assert(p.contains("BroadcastExchange"), s"rates must broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning(doc_id"),
      s"corpus side must stream, not shuffle:\n$p")
  }

  test("apportionedSample: the corpus-side rank window partitions by " +
    "(key, bucket) — never a one-task-per-key window — and the corpus " +
    "crosses exactly one hash exchange") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      Window => LWindow}
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.operators.Sampling.apportionedSample(
      d.select(col("doc_id"), col("source")), col("source"),
      col("doc_id"), totalN = 50)
    val lp = out.queryExecution.optimizedPlan
    val wins = lp.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    // windows over the raw corpus (no Aggregate below them) must
    // partition by BOTH key and draw-bucket; key-only windows are
    // allowed solely over aggregated per-key/per-bucket count tables
    val corpusWins = wins.filter(
      _.child.collectFirst { case a: Aggregate => a }.isEmpty)
    assert(corpusWins.nonEmpty, s"expected the local-rank window:\n$lp")
    corpusWins.foreach(w => assert(w.partitionSpec.size == 2,
      s"corpus window must partition by (key, bucket):\n$lp"))
    val p = plan(out)
    // two (key,bucket) exchanges appear: the rank window's (full corpus
    // rows — the one allowed) and the bucket-count aggregation's, which
    // sits ABOVE a partial_count and therefore ships combined counts
    val kkExch = "Exchange hashpartitioning\\(__kk".r.findAllIn(p).length
    val combined =
      "Exchange hashpartitioning\\(__kk[^\\n]*\\n[^\\n]*partial_count".r
        .findAllIn(p).length
    assert(kkExch - combined == 1,
      s"corpus rows must cross exactly one exchange " +
        s"($kkExch total, $combined map-side-combined):\n$p")
    assert(p.contains("BroadcastExchange"),
      s"offset and quota tables must broadcast back:\n$p")
  }

  test("perKeyQuantileGateApprox is window-free: sketch aggregation + " +
    "broadcast cutoffs, no per-source sort anywhere") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.operators.Sampling.perKeyQuantileGateApprox(
      d.select(col("doc_id"), col("source"), col("n_chars")),
      col("source"), col("n_chars"), minPct = 0.75)
    val wins = out.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }
    assert(wins.isEmpty, s"approx gate must not plan a Window:\n" +
      out.queryExecution.optimizedPlan)
    val p = plan(out)
    assert(p.contains("BroadcastHashJoin"),
      s"per-key cutoffs must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the cutoff join:\n$p")
    assert(out.count() > 0)
  }

  test("planted-copy id offsets sit above the real id range at every " +
      "shipped scale factor (unique-id contracts never collide)") {
    // q24-family plants +1e6, q109/q117/q118 also +2e6: a real doc_id
    // >= 1e6 would collide with a synthetic id and row-multiply
    // through corpusDiff's and dedup's unique-id full-outer joins
    for (sfd <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val p = s"/root/testdata/$sfd/documents.parquet"
      if (new java.io.File(p).exists) {
        val mx = spark.read.parquet(p)
          .agg(max(col("doc_id"))).head.getLong(0)
        assert(mx < 1000000L,
          s"$sfd max doc_id $mx >= 1e6 — raise the planted offsets")
      }
    }
  }

  test("q110/q123 line dedup is window-free: winners come from a " +
      "partial-agg groupBy, so hot boilerplate lines collapse map-side") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (q <- Seq("q110_line_dedup", "q123_c4_line_dedup")) {
      val df = SparkEntry.queries(q)(spark, sf)
      // a Window partitioned by raw line text serializes exactly the
      // boilerplate lines this operator exists to kill (WindowExec
      // buffers each group on one task; AQE never splits windows)
      val wins = df.queryExecution.optimizedPlan.collect {
        case w: LWindow => w }
      assert(wins.isEmpty, s"$q must not plan a Window:\n" +
        df.queryExecution.optimizedPlan)
      val p = plan(df)
      // map-side combine is the skew absorber: the line-keyed exchange
      // must sit ABOVE a partial min aggregation
      assert(p.contains("partial_min"),
        s"$q line winners must partial-aggregate below the exchange:\n$p")
      // budget: line-keyed winner agg + id-keyed reassembly only
      val e = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(e <= 2, s"$q expected <=2 hash exchanges, got $e:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q winners need no join-back (the agg row IS the survivor):\n$p")
    }
  }

  test("q126 BM25: query dfs and corpus stats broadcast, the corpus " +
      "never does; the term filter sits below the first exchange") {
    val p = plan(SparkEntry.queries("q126_bm25_selection")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"per-term dfs must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus side must never shuffle for a join:\n$p")
    // the explode's query-term filter must run before the (doc, term)
    // aggregation shuffle: every term-IN Filter in the logical plan
    // sits with no Aggregate beneath it (i.e. on the scan/explode side
    // of the exchange, never re-filtering aggregated rows)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate => LAgg,
      Filter => LFilter}
    val opt = SparkEntry.queries("q126_bm25_selection")(spark, sf)
      .queryExecution.optimizedPlan
    val termFilters = opt.collect {
      case f: LFilter if f.condition.toString.contains("spark") =>
        f.child.collect { case a: LAgg => a }.isEmpty
    }
    assert(termFilters.nonEmpty, s"term filter missing:\n$opt")
    assert(termFilters.forall(identity),
      s"term filter must run below the aggregation exchange:\n$opt")
  }

  test("q127 span corruption is a pure projection: zero exchanges, " +
      "whole pipeline at the scan") {
    val df = graft.operators.TextAnalysis.spanCorrupt(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    val p = plan(df)
    assert(!p.contains("Exchange"),
      s"span corruption must not shuffle:\n$p")
    assert(df.count() > 0)
  }

  test("q131 paragraph dedup: the exact stage partial-aggregates (hot " +
      "paragraphs collapse map-side) and nothing goes cartesian") {
    val p = plan(SparkEntry.queries("q131_para_fuzzy_dedup")(spark, sf))
    assert(p.contains("partial_min"),
      s"exact rep stage must partial-aggregate below its exchange:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"paragraph dedup must never go quadratic:\n$p")
  }

  test("q132 UL2 mixture is three unioned projections: zero exchanges") {
    val df = graft.operators.Pipelines.denoisingMixture(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    val p = plan(df)
    assert(!p.contains("Exchange"),
      s"denoising mixture must not shuffle:\n$p")
    assert(df.count() > 0)
  }

  test("q155 CCNet buckets: no per-language Window — every planned " +
      "window rides the __-staged count table, ranks join by broadcast") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = SparkEntry.queries("q155_ccnet_buckets")(spark, sf)
    // the dominant language is half the corpus at 100×: a rank window
    // partitioned by lang ALONE serializes it on one task (AQE splits
    // skewed joins, never windows). perKeyPercentRank's corpus window
    // must carry the bucket split; its offset windows ride the K·B-row
    // count table
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"q155 unpartitioned window:\n$w")
      val isRowNumber = w.windowExpressions.exists(
        _.collectFirst { case r: org.apache.spark.sql.catalyst
          .expressions.RowNumber => r }.nonEmpty)
      if (isRowNumber)
        assert(w.partitionSpec.size >= 2,
          s"q155 rank window partitioned by the bare language:\n$w")
    }
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"rank offsets must broadcast:\n$p")
  }

  test("q89 range join: equi-join on the bucket key, no nested loop") {
    val p = plan(SparkEntry.queries("q89_range_join")(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"range join must meet in an equi-join:\n$p")
  }

  test("q121 contamination report: bench broadcasts, the verdict join " +
      "carries no text") {
    val p = plan(SparkEntry.queries("q121_contamination_report")(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark probe must broadcast:\n$p")
    // the only non-broadcast join is verdicts ⋈ (id, group) — if a
    // shuffle-join line mentions the text column, the rollup is
    // shuffling documents instead of ids
    val smjLines = p.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")).toSeq
    assert(smjLines.forall(!_.contains("text#")),
      s"verdict join must move ids+groups, not text:\n$p")
  }

  test("q122 corpus KL: divergence is a spine-sized aggregation — no " +
      "cartesian beyond the broadcast 1-row totals, text stays in scans") {
    val p = plan(SparkEntry.queries("q122_corpus_kl")(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"only broadcast 1-row totals may cross-join:\n$p")
    val joinLines = p.linesIterator.filter(_.contains("Join")).toSeq
    assert(joinLines.forall(!_.contains("text#")),
      s"corpus text leaked past the scan:\n$p")
  }

  test("round-12 linkage/mining budgets: q218 scores inside ONE join " +
      "(no post-join pair materialization, no cartesian), marginMining " +
      "broadcasts each brute-force pass ONCE, leakage split is a " +
      "projection over the component map, coOccurrence stays " +
      "basket-bounded with no cartesian") {
    def exec(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    val p218 = exec(SparkEntry.queries("q218_entity_resolution")(spark, sf))
    // the decision predicate rides the join itself: the block-product
    // pairs never materialize into a post-join Filter
    assert(p218.contains("Join") && !p218.contains("CartesianProduct"),
      p218)
    assert("Exchange hashpartitioning".r.findAllIn(p218).isEmpty,
      s"q218 must not hash-shuffle at broadcastable scale:\n$p218")

    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val mm = graft.operators.Similarity.marginMining(
      emb.filter(col("vec_id") % 2 === 0),
      emb.filter(col("vec_id") % 2 === 1), "vec_id", "embedding", 4, 1.0)
    val pm = exec(mm)
    // each direction's brute-force scoring appears ONCE (checkpointed
    // before its two consumers) — 4 BNL joins would mean the corpus
    // pair scoring runs twice per direction
    assert("BroadcastNestedLoopJoin".r.findAllIn(pm).size <= 2, pm)
    assert(!pm.contains("CartesianProduct"), pm)

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ls = graft.operators.Pipelines.leakageFreeSplit(
      docs, "doc_id", "text", 2000)
    val pl = exec(ls)
    // post-closure: one id-keyed join + the split projection — no
    // window, no sort, and the md5 draw is computed per GROUP row
    assert(!pl.contains("Window"), pl)
    assert("Exchange hashpartitioning".r.findAllIn(pl).size <= 2, pl)

    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val co = graft.operators.Graph.coOccurrence(
      li.select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", 2L)
    val pc = exec(co)
    assert(!pc.contains("CartesianProduct") &&
      !pc.contains("BroadcastNestedLoopJoin"), pc)
    assert("Exchange hashpartitioning".r.findAllIn(pc).size <= 7, pc)
  }

  test("round-12 eval/bootstrap budgets: poissonBootstrapCI fans out " +
      "replicates UNDER a rep-keyed aggregation (no window, no " +
      "cartesian), bleu aggregates gram counts map-combined (no window)") {
    def exec(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val pb = exec(graft.operators.Sampling.poissonBootstrapCI(
      o, "o_totalprice", "o_orderkey", replicates = 8))
    assert(!pb.contains("Window"), pb)
    assert(!pb.contains("CartesianProduct"), pb)
    // replicate means: ONE rep-keyed exchange; the percentile and the
    // whole-sample mean add their own single-row aggregations
    assert("Exchange hashpartitioning".r.findAllIn(pb).size <= 4, pb)
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("ref"),
        col("text").as("cand"))
    val bl = exec(graft.operators.Metrics.bleu(d, "doc_id", "cand",
      "ref", maxN = 2))
    assert(!bl.contains("Window") && !bl.contains("CartesianProduct"),
      bl)
  }

  test("round-12b scale posture: knnShapley broadcasts the validation " +
      "side only and windows by query; prioritySample plans a " +
      "TakeOrdered heap (no corpus sort); memorizationScan probes the " +
      "corpus against a broadcast (no corpus exchange); " +
      "labelPropagation and conformalThreshold keep their budgets") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWin}
    def exec(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    def hashEx(p: String): Int = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") &&
        !l.contains("ReusedExchange"))

    // knnShapley: the SMALL validation side broadcasts (one BNL join);
    // every window partitions by query_id — the corpus never sorts or
    // shuffles globally
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val ks = graft.operators.Valuation.knnShapley(
      emb.filter(col("vec_id") >= 4), emb.filter(col("vec_id") < 4),
      "vec_id", "embedding", "label", 3)
    val pk = exec(ks)
    assert(pk.contains("BroadcastNestedLoopJoin") &&
      !pk.contains("CartesianProduct"), pk)
    val unpartK = ks.queryExecution.optimizedPlan.collect {
      case w: LWin if w.partitionSpec.isEmpty => w
    }
    assert(unpartK.isEmpty, s"unpartitioned window in knnShapley:\n$pk")

    // prioritySample: corpus top-(k+1) is a per-partition heap merge,
    // NOT a global sort — and the only windows run on <= k+1 rows
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val ps = graft.operators.Sampling.prioritySample(
      o, "o_orderkey", "o_totalprice", k = 50)
    val pp = exec(ps)
    assert(pp.contains("TakeOrderedAndProject"),
      s"corpus top-k must plan a TakeOrdered heap:\n$pp")
    assert(hashEx(pp) == 0, s"prioritySample needs no hash exchange:\n$pp")

    // memorizationScan: the corpus side streams into a BROADCAST
    // semi-join — matched-gram distinct and everything after run on
    // candidate-sized frames
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ms = graft.operators.Decontaminate.memorizationScan(
      docs.filter(col("doc_id") % 17 === 0), docs, "doc_id", "text", 4)
    val pm2 = exec(ms)
    assert(pm2.contains("BroadcastHashJoin"), pm2)
    assert(!pm2.contains("CartesianProduct") &&
      !pm2.contains("BroadcastNestedLoopJoin"), pm2)
    assert(hashEx(pm2) <= 6, s"memorizationScan exchange budget:\n$pm2")

    // labelPropagation: each sweep is one label join + two keyed
    // aggregations over the checkpointed previous sweep — no window,
    // no cartesian, bounded exchanges
    val edges = docs.select((col("doc_id") % 53).as("s"),
      ((col("doc_id") * 7 + 11) % 53).as("d"))
    val lp = graft.operators.Graph.labelPropagation(edges, "s", "d", 2)
    val plp = exec(lp)
    assert(!plp.contains("Window") && !plp.contains("CartesianProduct"),
      plp)
    assert(hashEx(plp) <= 4, s"labelPropagation sweep budget:\n$plp")

    // conformalThreshold: rides the range-decomposed rank — the only
    // unpartitioned windows are globalRank's documented __pid-keyed
    // <=p-row offset passes
    val ct = graft.operators.Metrics.conformalThreshold(
      docs.select(col("doc_id"),
        (col("n_chars").cast("double") / lit(1000.0)).as("sc")),
      "sc", "doc_id", alpha = 0.1)
    val pct = exec(ct)
    val unpartC = ct.queryExecution.optimizedPlan.collect {
      case w: LWin if w.partitionSpec.isEmpty &&
          !w.orderSpec.flatMap(_.references).forall(
            _.name.startsWith("__pid")) => w
    }
    assert(unpartC.isEmpty, s"corpus window in conformal plan:\n$pct")
    assert(pct.contains("Exchange rangepartitioning"),
      s"conformal must range-decompose the rank:\n$pct")
  }

  test("round-12c scale posture: ksTest range-decomposes both running " +
      "sums; cramersV broadcasts marginals and totals (no cartesian); " +
      "hits and kCore sweeps stay window-free within budget; " +
      "editDistanceJoin blocks on one variant groupBy; " +
      "giniConcentration rides the range-decomposed rank") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWin}
    def exec(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    def hashEx(p: String): Int = p.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") &&
        !l.contains("ReusedExchange"))
    // corpus-sized windows are forbidden; globalRank/globalRunningSum's
    // documented <=p-row __pid offset windows are the one exception
    def corpusWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: LWin if w.partitionSpec.isEmpty &&
            !w.orderSpec.flatMap(_.references).forall(
              _.name.startsWith("__pid")) => w
      }

    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // ksTest: the distinct-value count table range-exchanges (twice —
    // one audited primitive per running sum), never a whole-table sort
    // on one task; totals broadcast
    val ks = graft.operators.Profiles.ksTest(
      docs.filter(col("lang") === "en"),
      docs.filter(col("lang") =!= "en"), "n_chars")
    val pks = exec(ks)
    assert(corpusWindows(ks).isEmpty,
      s"corpus-sized window in ksTest:\n$pks")
    assert(pks.contains("Exchange rangepartitioning"),
      s"ksTest must range-decompose the running sums:\n$pks")
    assert(!pks.contains("CartesianProduct"), pks)

    // cramersV: the r×c grid comes from a BROADCAST nested-loop of the
    // two |categories|-sized marginals — no cartesian, no window; the
    // corpus scans into keyed aggregations only
    val cv = graft.operators.Profiles.cramersV(docs, "source", "lang")
    val pcv = exec(cv)
    assert(!pcv.contains("CartesianProduct") && !pcv.contains("Window"),
      pcv)
    assert(pcv.contains("BroadcastNestedLoopJoin"), pcv)

    // hits: each half-sweep is one edge join + one map-side-combined
    // sum over the checkpointed previous sweep — no window, no
    // cartesian (localCheckpoint truncates lineage, so the executed
    // plan only ever shows one sweep's shape)
    val edges = docs.select((col("doc_id") % 53).as("s"),
      ((col("doc_id") * 7 + 11) % 53).as("d"))
    val ht = graft.operators.Graph.hits(edges, "s", "d", sweeps = 2)
    val pht = exec(ht)
    assert(!pht.contains("Window") && !pht.contains("CartesianProduct"),
      pht)
    assert(hashEx(pht) <= 5, s"hits sweep exchange budget:\n$pht")

    // kCore: one degree aggregation + two id-only semi-joins per sweep
    val kc = graft.operators.Graph.kCore(edges, "s", "d", k = 2,
      sweeps = 2)
    val pkc = exec(kc)
    assert(!pkc.contains("Window") && !pkc.contains("CartesianProduct"),
      pkc)
    assert(hashEx(pkc) <= 5, s"kCore sweep exchange budget:\n$pkc")

    // editDistanceJoin: one exchange carries the spill-safe bucket
    // gate (the only window, PARTITIONED by variant), the bucket
    // aggregation, and the streamed in-task pair expansion — never a
    // cartesian, never a self-join
    val phrases = docs.filter(col("text").isNotNull)
      .select(array_join(slice(split(col("text"), " "), 1, 3), " ")
        .as("phrase"))
    val ej = graft.operators.Dedup.editDistanceJoin(phrases, "phrase", 2)
    val pej = exec(ej)
    assert(!pej.contains("CartesianProduct") &&
      !pej.contains("BroadcastNestedLoopJoin"), pej)
    assert(corpusWindows(ej).isEmpty,
      s"unpartitioned window in editDistanceJoin:\n$pej")

    // giniConcentration: the per-key count table rides the
    // range-decomposed globalRank — no single-task window over keys
    val gi = graft.operators.Profiles.giniConcentration(docs, "lang")
    val pgi = exec(gi)
    assert(corpusWindows(gi).isEmpty,
      s"corpus window in giniConcentration:\n$pgi")
    assert(pgi.contains("Exchange rangepartitioning"),
      s"gini must range-decompose the key-count rank:\n$pgi")
  }

  test("round-12d scale posture: sessionize windows by user and never " +
      "joins; transitionMatrix broadcasts the totals; hhi is a pure " +
      "two-level aggregation; wasserstein1 range-decomposes with no " +
      "corpus window and no cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWin}
    def exec(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    def corpusWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: LWin if w.partitionSpec.isEmpty &&
            !w.orderSpec.flatMap(_.references).forall(
              _.name.startsWith("__pid")) => w
      }

    val ev = graft.Queries.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        col("ts").as("tsn"), col("event_type"))

    val se = graft.operators.Funnel.sessionize(
      ev, "user_id", "tsn", "event_id", gapNanos = 1000000000L)
    val pse = exec(se)
    assert(!pse.contains("Join"), s"sessionize must not join:\n$pse")
    assert(corpusWindows(se).isEmpty,
      s"unpartitioned window in sessionize:\n$pse")

    val tm = graft.operators.Funnel.transitionMatrix(
      ev, "user_id", "tsn", "event_id", "event_type")
    val ptm = exec(tm)
    assert(ptm.contains("BroadcastHashJoin") &&
      !ptm.contains("CartesianProduct") &&
      !ptm.contains("SortMergeJoin"), ptm)
    assert(corpusWindows(tm).isEmpty,
      s"unpartitioned window in transitionMatrix:\n$ptm")

    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val hh = graft.operators.Profiles.hhi(docs, "source")
    val phh = exec(hh)
    assert(!phh.contains("Join") && !phh.contains("Window"),
      s"hhi must be aggregation-only:\n$phh")

    // wasserstein1 checkpoints every cumulative stage (the plan-
    // doubling pin), so the final plan is only the self-join + fold
    // over the checkpointed domain table: tiny exchange budget, no
    // range exchange left to see, no cartesian, no corpus window
    val w1 = graft.operators.Profiles.wasserstein1(
      docs.filter(col("lang") === "en"),
      docs.filter(col("lang") =!= "en"), "n_chars")
    val pw1 = exec(w1)
    assert(corpusWindows(w1).isEmpty,
      s"corpus window in wasserstein1:\n$pw1")
    // 6 = totals fold + rank self-join (2 hash) + segment fold + two
    // 1-row broadcasts; anything above means a checkpoint stopped
    // pinning the upstream
    val exW = pw1.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("ReusedExchange"))
    assert(exW <= 6, s"wasserstein1 final-plan exchange budget:\n$pw1")
    assert(!pw1.contains("CartesianProduct"), pw1)
  }

  test("round-12e scale posture: bestThreshold pins its cumulative " +
      "stages; aucByKey windows only by key; quantileNormalize joins " +
      "the pooled ranks with no cartesian; bfsFrom hops are frontier " +
      "joins; extractUrls is a pure generator projection") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWin}
    def exec(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    def corpusWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: LWin if w.partitionSpec.isEmpty &&
            !w.orderSpec.flatMap(_.references).forall(
              _.name.startsWith("__pid")) => w
      }
    def hashEx(p: String): Int = p.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("ReusedExchange"))

    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // bestThreshold: checkpointed cumulatives (the wasserstein1
    // pin) — the final plan is folds + broadcasts over the pinned
    // domain table, no corpus window, no cartesian
    val bt = graft.operators.Metrics.bestThreshold(docs,
      col("n_chars"), col("n_chars") + col("doc_id") % 97 > 250)
    val pbt = exec(bt)
    assert(corpusWindows(bt).isEmpty, s"corpus window:\n$pbt")
    assert(!pbt.contains("CartesianProduct"), pbt)
    assert(hashEx(pbt) <= 8, s"bestThreshold exchange budget:\n$pbt")

    // aucByKey: every window PARTITIONS BY key; one keyed aggregation
    // chain, no joins at all
    val ak = graft.operators.Metrics.aucByKey(docs, col("lang"),
      col("n_chars"), col("n_chars") + col("doc_id") % 97 > 250)
    val pak = exec(ak)
    assert(corpusWindows(ak).isEmpty, s"corpus window in aucByKey:\n$pak")
    assert(!pak.contains("Join"), s"aucByKey must not join:\n$pak")

    // quantileNormalize: the pooled lookup is a rank-keyed equi-join
    // (checkpointed inputs bound the plan); no cartesian, and the only
    // unpartitioned windows are the globalRank __pid offset passes
    val qn = graft.operators.Profiles.quantileNormalize(docs,
      "source", "doc_id", "n_chars")
    val pqn = exec(qn)
    assert(corpusWindows(qn).isEmpty, s"corpus window:\n$pqn")
    assert(!pqn.contains("CartesianProduct"), pqn)

    // bfsFrom: each hop is one frontier equi-join + one min-agg over
    // the checkpointed previous distances — the executed plan shows
    // one hop's shape only
    import spark.implicits._
    val edges = docs.select((col("doc_id") % 53).as("s"),
      ((col("doc_id") * 7 + 11) % 53).as("d"))
    val bf = graft.operators.Graph.bfsFrom(edges, "s", "d",
      Seq(0L).toDF("seed"), "seed", maxHops = 2)
    val pbf = exec(bf)
    assert(!pbf.contains("Window") && !pbf.contains("CartesianProduct"),
      pbf)
    assert(hashEx(pbf) <= 3, s"bfsFrom hop exchange budget:\n$pbf")

    // extractUrls: generator + projection only — zero exchanges, no
    // window, no join
    val eu = graft.operators.Urls.extractUrls(
      docs.select(col("doc_id"), concat(col("text"),
        lit(" https://x.org/p")).as("text")), "doc_id", "text")
    val peu = exec(eu)
    assert(!peu.contains("Exchange") && !peu.contains("Join") &&
      !peu.contains("Window"), s"extractUrls must be a pure scan:\n$peu")
  }

  test("round-12f scale posture: kaplanMeier pins its three cumulative " +
      "stages; categoricalEntropy and shrunkRates are aggregation+join " +
      "shapes; codeScore and foldConfusables are pure projections; " +
      "vocabDrift windows only the k-row tops") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWin}
    def exec(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    def corpusWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: LWin if w.partitionSpec.isEmpty &&
            !w.orderSpec.flatMap(_.references).forall(
              _.name.startsWith("__")) => w
      }
    def hashEx(p: String): Int = p.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("ReusedExchange"))

    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // kaplanMeier: checkpoint-pinned cumulative stages — the final
    // plan is one running-sum pass over the pinned duration table
    val km = graft.operators.Funnel.kaplanMeier(
      docs.select((col("n_chars") % 40).as("dur"),
        (col("doc_id") % 3 === 0).as("ev")), "dur", "ev")
    val pkm = exec(km)
    assert(corpusWindows(km).isEmpty, s"corpus window:\n$pkm")
    // 6 = the final (un-checkpointed) running sum's two branches over
    // the pinned duration table: 2 range + offsets fold + pid hash +
    // broadcast-back; more means a checkpoint stopped pinning
    assert(hashEx(pkm) <= 6, s"kaplanMeier final-plan budget:\n$pkm")

    // categoricalEntropy: two keyed aggregations + one |keys|-sized
    // join — no window, no cartesian
    val ce = graft.operators.Profiles.categoricalEntropy(
      docs, "source", "lang")
    val pce = exec(ce)
    assert(!pce.contains("Window") && !pce.contains("CartesianProduct"),
      pce)

    // shrunkRates: one keyed aggregation + a broadcast 1-row total
    val sr = graft.operators.Profiles.shrunkRates(
      docs, "source", col("n_chars") > 250)
    val psr = exec(sr)
    assert(!psr.contains("Window") && !psr.contains("CartesianProduct") &&
      !psr.contains("SortMergeJoin"), psr)

    // codeScore / foldConfusables: pure scan projections
    val cs = graft.operators.TextAnalysis.codeScore(
      docs, "doc_id", "text")
    val pcs = exec(cs)
    assert(!pcs.contains("Exchange") && !pcs.contains("Join") &&
      !pcs.contains("Window"), s"codeScore must be a pure scan:\n$pcs")
    val fc = docs.select(graft.operators.TextAnalysis
      .foldConfusables(col("text")).as("f"))
    val pfc = exec(fc)
    assert(!pfc.contains("Exchange"), pfc)

    // vocabDrift: TakeOrdered top-k per side, windows only on the
    // already-limited k rows (the __-staged exemption), join <= 2k
    val vd = graft.operators.Vocab.vocabDrift(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", 20)
    val pvd = exec(vd)
    assert(pvd.contains("TakeOrderedAndProject"),
      s"vocabDrift tops must plan TakeOrdered heaps:\n$pvd")
    assert(corpusWindows(vd).isEmpty, pvd)
  }

  test("round-13 scale posture: freshness is ONE map-combined " +
      "aggregation; oddsRatios is one keyed 2x2 cell aggregation; " +
      "sourceSimilarity cuts per-key tops map-side (WindowGroupLimit) " +
      "and joins only the k-bounded survivors") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWin}
    def exec(df: org.apache.spark.sql.DataFrame): String = {
      df.write.format("noop").mode("overwrite").save()
      df.queryExecution.executedPlan.toString
    }
    def corpusWindows(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case w: LWin if w.partitionSpec.isEmpty => w
      }
    def hashEx(p: String): Int = p.linesIterator.count(l =>
      l.contains("Exchange ") && !l.contains("ReusedExchange"))

    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // freshness: the entire audit is one keyed aggregation — no
    // window, no join, exactly one exchange
    val fr = graft.operators.Checks.freshness(
      docs.select(col("source"), (col("doc_id") * 1000000L).as("ts")),
      "source", "ts", nowNanos = 1L << 60, staleAfterNanos = 1000000L)
    val pfr = exec(fr)
    assert(!pfr.contains("Window") && !pfr.contains("Join"), pfr)
    assert(hashEx(pfr) <= 1, s"freshness must be one aggregation:\n$pfr")

    // oddsRatios: one conditional-sum aggregation per key; the CI math
    // is a fixed-order projection of the four integer cells
    val or = graft.operators.Metrics.oddsRatios(
      docs.filter(col("n_chars").isNotNull),
      "lang", col("doc_id") % 2 === 0, col("n_chars") > 250)
    val por = exec(or)
    assert(!por.contains("Window") && !por.contains("Join"), por)
    assert(hashEx(por) <= 1, s"oddsRatios must be one aggregation:\n$por")

    // sourceSimilarity: the per-key top-k must plan the map-side
    // WindowGroupLimit (each task keeps k rows per key BEFORE the
    // exchange — the per-key-window cliff killer), the pair join runs
    // over k-bounded tops only, and nothing goes cartesian
    val ss = graft.operators.Vocab.sourceSimilarity(
      docs, "source", "doc_id", "text", k = 15)
    val pss = exec(ss)
    assert(pss.contains("WindowGroupLimit"),
      s"sourceSimilarity top-k must cut map-side:\n$pss")
    assert(!pss.contains("CartesianProduct"), pss)
    assert(corpusWindows(ss).isEmpty,
      s"unpartitioned window in sourceSimilarity:\n$pss")

    // bleu / chrF (round-13 rework): the pinned token/stripped table
    // feeds ONE tagged explode + ONE keyed aggregation per n — the
    // old two-aggregations-plus-shuffle-join-per-n shape is gone.
    // Measured budgets: bleu 10 exchanges + only the broadcast lens
    // join; chrF 12 exchanges, zero joins.
    val evalPairs = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").as("cand"),
        reverse(col("text")).as("ref"))
    val bl = graft.operators.Metrics.bleu(evalPairs, "doc_id",
      "cand", "ref")
    val pbl = exec(bl)
    assert(hashEx(pbl) <= 10, s"bleu exchange budget blown:\n$pbl")
    assert(!pbl.contains("SortMergeJoin") &&
      !pbl.contains("ShuffledHashJoin"),
      s"bleu must not shuffle-join gram tables:\n$pbl")
    val cf = graft.operators.Metrics.chrF(evalPairs, "doc_id",
      "cand", "ref")
    val pcf = exec(cf)
    assert(hashEx(pcf) <= 12, s"chrF exchange budget blown:\n$pcf")
    assert(!pcf.contains("SortMergeJoin") &&
      !pcf.contains("ShuffledHashJoin") && !pcf.contains("Join"),
      s"chrF must not join at all:\n$pcf")
  }
}
