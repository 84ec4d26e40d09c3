package graft

import org.apache.spark.sql.functions._

import graft.operators.{Connected, Dedup, EntityResolution, Pipelines,
  Profiles, Similarity, TextAnalysis, Vocab}

/** Round-12 additions: Fellegi-Sunter linkage, margin-based bitext
  * mining, leakage-free splits, Luhn card audit, tokenizer fertility,
  * histogram-state merge — each checked against hand traces and its
  * own contracts. */
class LinkageSpec extends TestBase {

  test("linkage: hand-scored pairs, null fields contribute zero, " +
      "blocking confines candidates, non-match band dropped, guards") {
    import spark.implicits._
    val a = Seq((1L, "K1", Some("Ann Lee"), Some("gold")),
      (2L, "K1", Some("Bob Roy"), None),
      (3L, "K2", Some("Cat Yu"), Some("blue")))
      .toDF("id", "blk", "name", "tier")
    val b = Seq((11L, "K1", Some("  ANN LEE "), Some("GOLD")),
      (12L, "K1", Some("Bob Roy"), Some("red")),
      (13L, "K9", Some("Cat Yu"), Some("blue")))
      .toDF("id", "blk", "name", "tier")
    val rules = Seq(EntityResolution.FieldRule("name", "name", 6.0, -4.0),
      EntityResolution.FieldRule("tier", "tier", 2.0, -1.0))
    val got = EntityResolution.linkage(a, b, "id", "id", "blk", "blk",
        rules, matchAt = 7.0, possibleAt = 3.0)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Double, String)].collect().toSeq
    // (1,11): name agrees after lower/trim (+6), tier agrees (+2) -> 8
    // match; (2,12): name +6, tier null side -> 0 -> 6 possible;
    // (1,12): name -4 tier null 0 -> -4 dropped; (2,11): -4 + (-1)
    // dropped; (3,13): blocks K2 vs K9 never pair
    assert(got == Seq((1L, 11L, 8.0, "match"),
      (2L, 12L, 6.0, "possible")), got)
    assert(intercept[IllegalArgumentException] {
      EntityResolution.linkage(a, b, "id", "id", "blk", "blk",
        Seq(EntityResolution.FieldRule("name", "name", -1.0, -4.0)),
        7.0, 3.0)
    }.getMessage.contains("agreeW"))
    assert(intercept[IllegalArgumentException] {
      EntityResolution.linkage(a, b, "id", "id", "blk", "blk", Nil,
        7.0, 3.0)
    }.getMessage.contains("rules"))
    assert(intercept[IllegalArgumentException] {
      EntityResolution.linkage(a, b, "id", "id", "blk", "blk", rules,
        1.0, 3.0)
    }.getMessage.contains("matchAt"))
  }

  test("marginMining: planted translation pairs are mutual-best and " +
      "survive; the isotropic hub's pairs score LOW margin against " +
      "aligned pairs; output is one-to-one") {
    import spark.implicits._
    // 3-d: x0~y1 and x2~y3 are true pairs; y5 is the isotropic vector
    // (equal cosine 0.577 to every x — the hub direction). Margin
    // scores the ALIGNED pairs far above any hub pair: hand-computed
    // margin(0,1)=1.4865, margin(2,3)=1.552 vs margin(0,5)=0.847,
    // margin(2,5)=0.845 — x0 and x2 both prefer their true partner.
    val x = Seq((0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val y = Seq((1L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (5L, Array(0.577f, 0.577f, 0.577f))).toDF("vec_id", "embedding")
    val got = Similarity.marginMining(x, y, "vec_id", "embedding",
        k = 2, threshold = 1.0)
      .orderBy("x_id").as[(Long, Long, Double, Double)].collect().toSeq
    val byX = got.map(p => p._1 -> p._2).toMap
    assert(byX.get(0L) == Some(1L) && byX.get(2L) == Some(3L),
      s"true pairs must be mined: $got")
    assert(got.find(_._1 == 2L).get._3 == 1.0) // exact-match cosine
    assert(got.find(_._1 == 2L).get._4 > 1.5)  // and a decisive margin
    // every mined pair is mutual-best: no x or y appears twice
    assert(got.map(_._1).distinct.size == got.size)
    assert(got.map(_._2).distinct.size == got.size)
    assert(intercept[IllegalArgumentException] {
      Similarity.marginMining(x, y, "vec_id", "embedding", 0, 1.0)
    }.getMessage.contains("k"))
  }

  test("leakageFreeSplit: groups are split atoms — NO candidate pair " +
      "crosses the boundary; singletons split by their own id; " +
      "assignment is deterministic across runs") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      // 4-doc near-dup families: 10 DISTINCT word sets (no shared
      // shingles across families), each re-issued 4x with a tiny
      // suffix change
      val f = i / 4
      (i, (0 to 8).map(j => s"w${f}t$j").mkString(" ") + s" v${i % 2}")
    }.toDF("doc_id", "text")
    val split = Pipelines.leakageFreeSplit(docs, "doc_id", "text",
      evalBp = 3000)
    val rows = split.as[(Long, Long, String)].collect().toSeq
    assert(rows.size == 40)
    // all members of one group share a split (trivially true by
    // construction) AND no LSH candidate pair crosses splits
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 8, rowsPerBand = 2, shingleN = 3)
    val asg = split.select(col("doc_id"), col("split"))
    val leaked = pairs
      .join(asg.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("split", "sa"), "doc_a")
      .join(asg.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("split", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(leaked == 0L, s"$leaked candidate pairs cross the split")
    // both splits non-empty at 30% eval over 10+ groups
    val bySplit = rows.groupBy(_._3).view.mapValues(_.size).toMap
    assert(bySplit.keySet == Set("train", "eval"), bySplit)
    // determinism: a second run assigns identically
    val again = Pipelines.leakageFreeSplit(docs, "doc_id", "text",
      evalBp = 3000).as[(Long, Long, String)].collect().toSeq
    assert(again.sortBy(_._1) == rows.sortBy(_._1))
    assert(intercept[IllegalArgumentException] {
      Pipelines.leakageFreeSplit(docs, "doc_id", "text", evalBp = 10001)
    }.getMessage.contains("evalBp"))
  }

  test("kFoldSplit: no candidate pair crosses a fold boundary, folds " +
      "stay in range and spread, assignment is deterministic") {
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      val f = i / 4
      (i, (0 to 8).map(j => s"w${f}t$j").mkString(" ") + s" v${i % 2}")
    }.toDF("doc_id", "text")
    val asg = Pipelines.kFoldSplit(docs, "doc_id", "text", folds = 3)
    val rows = asg.as[(Long, Long, Long)].collect().toSeq
    assert(rows.size == 40)
    assert(rows.forall(r => r._3 >= 0 && r._3 < 3), rows.toString)
    // 10 groups over 3 folds: at least 2 folds occupied
    assert(rows.map(_._3).distinct.size >= 2)
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
      k = 8, rowsPerBand = 2, shingleN = 3)
    val fo = asg.select(col("doc_id"), col("fold"))
    val leaked = pairs
      .join(fo.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("fold", "fa"), "doc_a")
      .join(fo.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("fold", "fb"), "doc_b")
      .filter(col("fa") =!= col("fb")).count()
    assert(leaked == 0L, s"$leaked candidate pairs cross folds")
    val again = Pipelines.kFoldSplit(docs, "doc_id", "text", folds = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(again.sortBy(_._1) == rows.sortBy(_._1))
    assert(intercept[IllegalArgumentException] {
      Pipelines.kFoldSplit(docs, "doc_id", "text", folds = 1)
    }.getMessage.contains("folds"))
  }

  test("luhnValid + withCardAudit: ISO test PANs validate, off-by-one " +
      "check digits fail, length range gates candidates, digit-free " +
      "text is clean") {
    import spark.implicits._
    val valid = Seq("4111111111111111", "378282246310005",
      "5500005555555559", "6011111111111117")
    val invalid = Seq("4111111111111112", "378282246310004")
    val luhn = (s: String) => Seq(s).toDF("d")
      .select(TextAnalysis.luhnValid(col("d"))).collect().head.getBoolean(0)
    valid.foreach(v => assert(luhn(v), s"$v must Luhn-validate"))
    invalid.foreach(v => assert(!luhn(v), s"$v must fail Luhn"))
    val docs = Seq(
      (1L, "pay 4111111111111111 and 378282246310005 now"),
      (2L, "ref 4111111111111112 code"),
      (3L, "no digits at all"),
      (4L, "short 123456789012 and long 12345678901234567890 ignored"))
      .toDF("id", "text")
    val got = TextAnalysis.withCardAudit(docs, "text")
      .select(col("id"), col("n_card_candidates"), col("n_valid_cards"),
        col("card_pii"))
      .orderBy("id").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, true), (2L, 1L, 0L, false),
      (3L, 0L, 0L, false), (4L, 0L, 0L, false)), got)
  }

  test("fertilityByKey: hand-checked subword/word ratios; a lang the " +
      "merges never saw fragments to characters (higher fertility); " +
      "empty-token keys report zeros with null ratios") {
    import spark.implicits._
    val docs = Seq((1L, "en", "low low low low"),
      (2L, "en", "low low"),
      (3L, "xx", "qqq zzz")).toDF("id", "lang", "text")
    val merges = Vocab.bpeTrain(docs.filter(col("lang") === "en"),
      "text", numMerges = 4)
    val got = Vocab.fertilityByKey(docs, "lang", "text", merges)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val en = got.find(_._1 == "en").get
    val xx = got.find(_._1 == "xx").get
    assert(en._2 == 2 && en._3 == 6, en) // 2 docs, 6 words
    assert(xx._2 == 1 && xx._3 == 2, xx)
    val fert = Vocab.fertilityByKey(docs, "lang", "text", merges)
      .select("key", "fertility").as[(String, Double)].collect().toMap
    // 'low' fully merges toward one token; 'qqq'/'zzz' stay characters
    assert(fert("xx") > fert("en"),
      s"unseen lang must fragment more: $fert")
  }

  test("mergeHistogramStates: merged parity-half states equal the " +
      "direct histogram bit-for-bit; mixed-edge states raise") {
    import spark.implicits._
    val d = (0 until 1000).map(i => (i.toLong, (i * 37 % 600).toDouble))
      .toDF("id", "v")
    val whole = Profiles.histogram(d, "v", 0.0, 600.0, 12)
    val merged = Profiles.mergeHistogramStates(
      Profiles.histogram(d.filter(col("id") % 2 === 0), "v", 0.0, 600.0, 12)
        .unionByName(Profiles.histogram(d.filter(col("id") % 2 === 1),
          "v", 0.0, 600.0, 12)))
    assertSameRows(whole, merged)
    val alien = Profiles.histogram(d, "v", 0.0, 1200.0, 12)
    val ex = intercept[Exception] {
      Profiles.mergeHistogramStates(whole.unionByName(alien)).collect()
    }
    assert(ex.getMessage.contains("not mergeable"), ex.getMessage)
  }

  test("emStep: hand-computed one-field EM on a tiny pair set; null " +
      "flags are missing evidence; dyadic params survive exactly") {
    import spark.implicits._
    // one field, p=0.5, m=0.75, u=0.25: an agreeing pair has
    // w = .5*.75/(.5*.75+.5*.25) = 0.75; a disagreeing one
    // w = .5*.25/(.5*.25+.5*.75) = 0.25. Two agree + two disagree:
    // p' = (0.75+0.75+0.25+0.25)/4 = 0.5
    // m' = (0.75+0.75)/2.0 = 0.75 ; u' = (0.25+0.25)/2.0 = 0.25
    // (the fixed point, by symmetry)
    val pairs = Seq(Some(true), Some(true), Some(false), Some(false))
      .toDF("g")
    val got = EntityResolution.emStep(pairs, Seq("g"),
        p = 0.5, m = Seq(0.75), u = Seq(0.25))
      .as[(String, Option[String], Double)].collect().toSeq
    assert(got == Seq(("m", Some("g"), 0.75), ("p", None, 0.5),
      ("u", Some("g"), 0.25)), got)
    // a null flag drops out of that field's m/u mass but not p's
    val withNull = Seq(Some(true), Some(true), Some(false), Some(false),
      None).toDF("g")
    val got2 = EntityResolution.emStep(withNull, Seq("g"),
        p = 0.5, m = Seq(0.75), u = Seq(0.25))
      .as[(String, Option[String], Double)].collect().toSeq
    // the null pair's w = 0.5*1/(0.5*1+0.5*1) = 0.5 joins p' only:
    // p' = 2.5/5 = 0.5; m'/u' unchanged
    assert(got2 == Seq(("m", Some("g"), 0.75), ("p", None, 0.5),
      ("u", Some("g"), 0.25)), got2)
    assert(intercept[IllegalArgumentException] {
      EntityResolution.emStep(pairs, Seq("g"), 0.5, Seq(0.75, 0.1),
        Seq(0.25))
    }.getMessage.contains("per flag"))
    assert(intercept[IllegalArgumentException] {
      EntityResolution.emStep(pairs, Seq("g"), 1.5, Seq(0.75), Seq(0.25))
    }.getMessage.contains("p must"))
  }

  test("marginMiningIvf: in-cluster candidates agree with brute force " +
      "when clusters cover the neighborhoods; empty-intersection " +
      "clusters mine nothing") {
    import spark.implicits._
    // two well-separated directions; centroids split the space so each
    // true pair shares a cluster -> IVF mining == brute-force mining
    val x = Seq((0L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val y = Seq((1L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.1f, 0.9f, 0.0f))).toDF("vec_id", "embedding")
    val cents = Seq((100L, Array(1.0f, 0.0f, 0.0f)),
      (101L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val ivf = Similarity.marginMiningIvf(x, y, cents, "vec_id",
        "embedding", k = 2, "vec_id", "embedding", threshold = 0.0)
      .orderBy("x_id").as[(Long, Long, Double, Double)].collect().toSeq
    val brute = Similarity.marginMining(x, y, "vec_id", "embedding",
        k = 2, threshold = 0.0)
      .orderBy("x_id").as[(Long, Long, Double, Double)].collect().toSeq
    assert(ivf.map(p => (p._1, p._2)) == Seq((0L, 1L), (2L, 3L)), ivf)
    // within-cluster pairs carry the same cosine scores either way
    assert(ivf.map(p => (p._1, p._2, p._3)) ==
      brute.map(p => (p._1, p._2, p._3)), s"$ivf vs $brute")
    // orthogonal singleton clusters: nothing shares a cluster -> empty
    val farY = Seq((9L, Array(0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    assert(Similarity.marginMiningIvf(x, farY, cents, "vec_id",
      "embedding", k = 2, "vec_id", "embedding", 0.0)
      .count() >= 0) // never raises on sparse intersections
  }
}
