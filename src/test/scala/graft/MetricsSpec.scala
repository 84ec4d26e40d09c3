package graft

import org.apache.spark.sql.functions._

import graft.operators.Metrics

/** [[graft.operators.Metrics]] — exact AUC must match the hand-computed
  * Mann–Whitney midrank definition (including tie half-credit and
  * degenerate inputs), calibration must reproduce hand-checked buckets. */
class MetricsSpec extends TestBase {
  import org.apache.spark.sql.DataFrame

  private def aucOf(rows: Seq[(Double, Boolean)]): (Option[Double], Long,
      Long) = {
    import spark.implicits._
    val d = rows.zipWithIndex
      .map { case ((s, y), i) => (i.toLong, s, y) }
      .toDF("id", "score", "y").repartition(5)
    val r = Metrics.auc(d, col("score"), col("y"), col("id"))
      .collect().head
    (if (r.isNullAt(0)) None else Some(r.getDouble(0)), r.getLong(1),
      r.getLong(2))
  }

  test("auc: perfect, random-ish, tie half-credit, degenerate") {
    // perfect separation
    assert(aucOf(Seq((0.9, true), (0.8, true), (0.2, false),
      (0.1, false))) == ((Some(1.0), 2L, 2L)))
    // total inversion
    assert(aucOf(Seq((0.1, true), (0.9, false)))._1.contains(0.0))
    // hand case with a cross-class tie: pos {0.5, 0.3}, neg {0.5, 0.1}
    // pairs: (0.5,0.5)=0.5, (0.5,0.1)=1, (0.3,0.5)=0, (0.3,0.1)=1
    // AUC = 2.5/4 = 0.625
    assert(aucOf(Seq((0.5, true), (0.3, true), (0.5, false),
      (0.1, false)))._1.contains(0.625))
    // all ties: exactly 0.5
    assert(aucOf(Seq((0.7, true), (0.7, false), (0.7, true),
      (0.7, false)))._1.contains(0.5))
    // degenerate: one class only → null auc, counts intact
    assert(aucOf(Seq((0.9, true), (0.8, true))) == ((None, 2L, 0L)))
    assert(aucOf(Seq.empty) == ((None, 0L, 0L)))
  }

  test("auc excludes null/NaN scores and null labels") {
    import spark.implicits._
    val d = Seq(
      (1L, Some(0.9), Some(true)), (2L, Some(0.1), Some(false)),
      (3L, None, Some(true)), (4L, Some(Double.NaN), Some(false)),
      (5L, Some(0.5), None)).toDF("id", "score", "y")
    val r = Metrics.auc(d, col("score"), col("y"), col("id"))
      .collect().head
    assert(r.getDouble(0) == 1.0 && r.getLong(1) == 1L &&
      r.getLong(2) == 1L)
  }

  test("calibrationReport + ece: hand-checked buckets, score-1 clamps " +
      "into the last bin, out-of-range and null rows excluded") {
    import spark.implicits._
    val d = Seq(
      (0.05, false), (0.09, false),          // bucket 0: mean .07, fp 0
      (0.95, true), (1.0, true),             // bucket 9 (1.0 clamps)
      (0.55, true), (0.55, false),           // bucket 5: fp 0.5
      (1.5, true), (-0.1, false)             // excluded
    ).toDF("score", "y")
    val rep = Metrics.calibrationReport(d, col("score"), col("y"),
      bins = 10)
    val rows = rep.collect().map(r => r.getInt(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(rows.keySet == Set(0, 5, 9))
    assert(rows(0) == ((2L, 0.07, 0.0, 0.07)))
    assert(rows(5) == ((2L, 0.55, 0.5, 0.05)))
    assert(rows(9) == ((2L, 0.975, 1.0, 0.025)))
    // ece = (2*0.07 + 2*0.05 + 2*0.025) / 6
    val e = Metrics.ece(rep).collect().head.getDouble(0)
    // ece is round-6 by contract
    assert(math.abs(e - (0.14 + 0.1 + 0.05) / 6) < 5e-7, e.toString)
  }

  test("auc plan: no corpus-sized window — rides the range-partitioned " +
      "rank, distinct-score aggregation partial-combines") {
    import spark.implicits._
    val d = (0 until 2000).map(i =>
      (i.toLong, (i % 17).toDouble / 17.0, i % 3 == 0))
      .toDF("id", "score", "y")
    val a = Metrics.auc(d, col("score"), col("y"), col("id"))
    a.collect()
    val p = a.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val unpart = a.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty &&
            !w.orderSpec.flatMap(_.references).forall(
              _.name.startsWith("__pid")) => w
    }
    // the only unpartitioned window is globalRank's <=p-row offset pass
    assert(unpart.isEmpty, s"corpus window in auc plan:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"per-score stats must partial-aggregate:\n$p")
  }

  test("classReport: hand-computed P/R/F1; never-predicted and " +
      "never-true classes get NULL (not 0) in the undefined metric; " +
      "null rows outside the matrix; confusion cells exact") {
    import spark.implicits._
    val d = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"),
      ("b", "b"), ("c", "a"), ("b", "d"), (null, "a"), ("a", null))
      .toDF("y", "pred")
    val cm = Metrics.confusionMatrix(d, "y", "pred")
      .as[(String, String, Long)].collect().toSeq
    assert(cm == Seq(("a", "a", 2L), ("a", "b", 1L), ("b", "b", 2L),
      ("b", "d", 1L), ("c", "a", 1L)), cm)
    val rep = Metrics.classReport(d, "y", "pred").collect().map { r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6)))
    }.toSeq
    assert(rep == Seq(
      ("a", 3L, 3L, 2L, Some(0.666667), Some(0.666667), Some(0.666667)),
      ("b", 3L, 3L, 2L, Some(0.666667), Some(0.666667), Some(0.666667)),
      // c was never predicted: precision undefined; recall a real 0
      ("c", 1L, 0L, 0L, None, Some(0.0), None),
      // d was never true: recall undefined; precision a real 0
      ("d", 0L, 1L, 0L, Some(0.0), None, None)), rep)
  }

  test("cohensKappa: the textbook 2×2 (po 0.7, pe 0.5, kappa 0.4); " +
      "perfect single-class agreement has no chance-corrected signal") {
    import spark.implicits._
    val d = (Seq.fill(20)(("yes", "yes")) ++ Seq.fill(15)(("no", "no")) ++
      Seq.fill(5)(("yes", "no")) ++ Seq.fill(10)(("no", "yes")))
      .toDF("r1", "r2")
    val r = Metrics.cohensKappa(d, "r1", "r2").collect().head
    assert((r.getLong(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3)) == (50L, 0.7, 0.5, 0.4))
    val one = Metrics.cohensKappa(
      Seq(("x", "x"), ("x", "x")).toDF("r1", "r2"), "r1", "r2")
      .collect().head
    assert(one.getDouble(1) == 1.0 && one.getDouble(2) == 1.0 &&
      one.isNullAt(3))
  }

  test("spearman: monotone maps score ±1 exactly, midrank ties match " +
      "the hand Pearson, constant column null, null/NaN excluded " +
      "pairwise") {
    import spark.implicits._
    val mono = (1 to 20).map(i => (i.toLong, i.toDouble, i * i * 1.0))
      .toDF("id", "x", "y")
    assert(Metrics.spearman(mono, "x", "y", "id").collect().head
      .getDouble(1) == 1.0)
    val anti = (1 to 20).map(i => (i.toLong, i.toDouble, -i * 3.0))
      .toDF("id", "x", "y")
    assert(Metrics.spearman(anti, "x", "y", "id").collect().head
      .getDouble(1) == -1.0)
    // ties: x [1,2,2,3] → midranks [1, 2.5, 2.5, 4]; y strictly rising
    val tied = Seq((1L, 1.0, 10.0), (2L, 2.0, 20.0), (3L, 2.0, 30.0),
      (4L, 3.0, 40.0)).toDF("id", "x", "y")
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val (ma, mb) = (a.sum / a.size, b.sum / b.size)
      val cov = a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum
      cov / math.sqrt(a.map(u => (u - ma) * (u - ma)).sum *
        b.map(v => (v - mb) * (v - mb)).sum)
    }
    val want = BigDecimal(pearson(Seq(1, 2.5, 2.5, 4), Seq(1, 2, 3, 4)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Metrics.spearman(tied, "x", "y", "id").collect().head
    assert(got.getLong(0) == 4L && got.getDouble(1) == want, got)
    // constant column: no ordering to correlate
    val const = (1 to 5).map(i => (i.toLong, 7.0, i.toDouble))
      .toDF("id", "x", "y")
    assert(Metrics.spearman(const, "x", "y", "id").collect().head
      .isNullAt(1))
    // null and NaN rows leave pairwise
    val withBad = mono.union(Seq((21L, Double.NaN, 1.0),
      (22L, 5.0, Double.NaN)).toDF("id", "x", "y"))
    val g2 = Metrics.spearman(withBad, "x", "y", "id").collect().head
    assert(g2.getLong(0) == 20L && g2.getDouble(1) == 1.0)
  }

  test("ndcgAtK: hand-computed DCG/IDCG, unjudged results gain 0, " +
      "perfect ordering scores 1, no-relevant queries stay null, " +
      "run-missed queries score dcg 0") {
    import spark.implicits._
    def l2(x: Double) = math.log(x) / math.log(2.0)
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    // q1 run: [c1 rel3, c2 unjudged, c3 rel1]; judged {c1:3, c3:1, c9:2}
    val results = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3),
      (2L, 9L, 1), (2L, 8L, 2), // q2: perfect order of its 2 judged
      (3L, 5L, 1)) // q3: judged pool has no rel>0
      .toDF("query_id", "corpus_id", "rank")
    val relevance = Seq((1L, 1L, 3.0), (1L, 3L, 1.0), (1L, 9L, 2.0),
      (2L, 9L, 2.0), (2L, 8L, 1.0), (3L, 5L, 0.0),
      (4L, 2L, 1.0)) // q4 judged but absent from the run
      .toDF("query_id", "corpus_id", "rel")
    val out = Metrics.ndcgAtK(results, relevance, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    val dcg1 = 7.0 / l2(2) + 0.0 + 1.0 / l2(4)
    val idcg1 = 7.0 / l2(2) + 3.0 / l2(3) + 1.0 / l2(4)
    assert(out(1L) == ((r6(dcg1), r6(idcg1), Some(r6(dcg1 / idcg1)))),
      out(1L))
    assert(out(2L)._3.contains(1.0), out(2L)) // ideal order → exactly 1
    assert(out(3L) == ((0.0, 0.0, None)), out(3L))
    val idcg4 = 1.0 / l2(2)
    assert(out(4L) == ((0.0, r6(idcg4), Some(0.0))), out(4L))
    assert(intercept[IllegalArgumentException] {
      Metrics.ndcgAtK(results, relevance, 0)
    }.getMessage.contains("k must be"))
  }

  test("bradleyTerry: two items at 3:1 hit the exact 0.75/0.25 fixed " +
      "point in one sweep; transitive chains order correctly; a " +
      "never-winner scores 0; self-pairs and nulls dropped") {
    import spark.implicits._
    val ab = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")) ++
      Seq(("A", "A"), (null, "B"))).toDF("winner", "loser")
    // MM from uniform: d = 4/2 = 2; A: 3/2, B: 1/2 → 0.75 / 0.25 —
    // already the fixed point, so ANY sweep count lands there exactly
    for (s <- Seq(1, 7)) {
      val r = Metrics.bradleyTerry(ab, "winner", "loser", sweeps = s)
        .as[(String, Double)].collect().toSeq
      assert(r == Seq(("A", 0.75), ("B", 0.25)), s"sweeps=$s: $r")
    }
    // A beats B beats C (B also beats C so B > C despite losing to A)
    val chain = (Seq.fill(4)(("A", "B")) ++ Seq.fill(4)(("B", "C")) ++
      Seq(("B", "A"), ("C", "B"))).toDF("winner", "loser")
    val got = Metrics.bradleyTerry(chain, "winner", "loser")
      .as[(String, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("A", "B", "C"), got)
    assert(got.map(_._2).sum > 0.999999 && got.map(_._2).sum < 1.000001)
    // C never wins at all → exact 0, no NaN poisoning the others
    val shut = (Seq.fill(2)(("A", "C")) ++ Seq.fill(2)(("B", "C")) ++
      Seq(("A", "B"), ("B", "A"))).toDF("winner", "loser")
    val s2 = Metrics.bradleyTerry(shut, "winner", "loser")
      .as[(String, Double)].collect().toMap
    assert(s2("C") == 0.0 && s2("A") == s2("B") && s2("A") > 0.4, s2)
    assert(intercept[IllegalArgumentException] {
      Metrics.bradleyTerry(ab, "winner", "loser", sweeps = 0)
    }.getMessage.contains("sweeps"))
  }

  test("mrr: first-relevant rank per query, misses score 0, judged-only " +
      "queries included, k gates the window") {
    import spark.implicits._
    // q1: relevant at ranks 3 and 7 -> rr = 1/3; q2: relevant only at
    // rank 12 (outside k=10) -> 0; q3: never retrieved -> 0;
    // q4: hit at rank 1 -> 1.0
    val run = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (1L, 13L, 7L), (2L, 20L, 12L), (4L, 40L, 1L))
      .toDF("query_id", "corpus_id", "rank")
    val rel = Seq((1L, 12L), (1L, 13L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("query_id", "corpus_id")
    val got = graft.operators.Metrics.mrr(run, rel, k = 10)
      .as[(Long, Option[Long], Double)].collect().toSeq
    assert(got == Seq((1L, Some(3L), 0.333333), (2L, None, 0.0),
      (3L, None, 0.0), (4L, Some(1L), 1.0)), got)
    // duplicate judgments must not double-count
    val got2 = graft.operators.Metrics.mrr(run, rel.union(rel), k = 10)
      .as[(Long, Option[Long], Double)].collect().toSeq
    assert(got2 == got)
    assert(intercept[IllegalArgumentException] {
      graft.operators.Metrics.mrr(run, rel, k = 0)
    }.getMessage.contains("k"))
  }

  test("bleu: hand-computed clipped precisions, clipping caps repeats, " +
      "brevity penalty fires on short candidates, zero p_n -> null bleu") {
    import spark.implicits._
    // cand 'the the the cat' vs ref 'the cat sat down': p1 = clip(the)=1
    // + cat 1 -> 2/4; bigrams cand: 'the the'x2,'the cat' -> clip 0+1 =
    // 1/3; trigram 'the the the','the the cat' -> 0/2 -> bleu null
    val one = Seq((1L, "the the the cat", "the cat sat down"))
      .toDF("id", "cand", "ref")
    val r1 = graft.operators.Metrics.bleu(one, "id", "cand", "ref")
      .collect().head
    assert(r1.getAs[Long]("c_len") == 4 && r1.getAs[Long]("r_len") == 4)
    assert(r1.getAs[Double]("p1") == 0.5, r1)
    assert(r1.getAs[Double]("p2") == 0.333333, r1)
    assert(r1.getAs[Double]("p3") == 0.0, r1)
    assert(r1.isNullAt(r1.fieldIndex("bleu")), r1)
    assert(r1.getAs[Double]("bp") == 1.0, r1)
    // identical pair -> every precision 1, bleu = 1
    val same = Seq((1L, "a b c d e", "a b c d e")).toDF("id", "cand", "ref")
    val r2 = graft.operators.Metrics.bleu(same, "id", "cand", "ref")
      .collect().head
    assert((1 to 4).forall(n => r2.getAs[Double](s"p$n") == 1.0), r2)
    assert(r2.getAs[Double]("bleu") == 1.0, r2)
    // short candidate: 4 of 8 ref tokens kept verbatim -> bp = e^(1-2)
    val short = Seq((1L, "a b c d", "a b c d e f g h"))
      .toDF("id", "cand", "ref")
    val r3 = graft.operators.Metrics.bleu(short, "id", "cand", "ref")
      .collect().head
    assert(math.abs(r3.getAs[Double]("bp") - math.exp(-1.0)) < 1e-6, r3)
    assert((1 to 4).forall(n => r3.getAs[Double](s"p$n") == 1.0), r3)
    assert(math.abs(r3.getAs[Double]("bleu") - math.exp(-1.0)) < 1e-6, r3)
    // corpus form: counts pool across pairs before the ratio (NOT a
    // mean of per-pair scores)
    val corp = Seq((1L, "a b", "a b"), (2L, "x y", "p q"))
      .toDF("id", "cand", "ref")
    val r4 = graft.operators.Metrics.bleu(corp, "id", "cand", "ref")
      .collect().head
    assert(r4.getAs[Double]("p1") == 0.5, r4)
  }

  test("bleuTokens == bleu and chrFStripped == chrF: the tokens-in/" +
      "stripped-in cores are bit-identical to their text façades " +
      "(the cold-head fast path must not change a single value)") {
    import spark.implicits._
    import graft.operators.{Metrics, TextAnalysis}
    val pairs = Seq(
      (1L, "the the the cat", "the cat sat down"),
      (2L, "A quick Brown fox", "a quick brown fox jumps"),
      (3L, "", "nonempty ref here"),
      (4L, "lone", "lone"))
      .toDF("id", "cand", "ref")
    val viaText = Metrics.bleu(pairs, "id", "cand", "ref")
      .collect().map(_.toSeq).toSeq
    val toks = pairs.select(col("id"),
      TextAnalysis.tokens(col("cand")).as("ct"),
      TextAnalysis.tokens(col("ref")).as("rt"))
    val viaTokens = Metrics.bleuTokens(toks, "id", "ct", "rt")
      .collect().map(_.toSeq).toSeq
    assert(viaText == viaTokens, s"\n$viaText\n$viaTokens")
    val viaTextC = Metrics.chrF(pairs, "id", "cand", "ref", maxN = 3)
      .collect().map(_.toSeq).toSeq
    // whitespace-free inputs (the documented chrFStripped contract);
    // built with the pure strip — NOT via tokens(), which also
    // lowercases and would legitimately change char-gram counts
    val strippedIn = pairs.select(col("id"),
      regexp_replace(col("cand"), "\\s+", "").as("cs"),
      regexp_replace(col("ref"), "\\s+", "").as("rs"))
    val viaStripped = Metrics.chrFStripped(strippedIn, "id", "cs", "rs",
      maxN = 3).collect().map(_.toSeq).toSeq
    assert(viaTextC == viaStripped, s"\n$viaTextC\n$viaStripped")
  }

  test("rougeL + LcsLength: hand-checked LCS cases, native == HOF twin " +
      "on 200 random pairs, empty/null contracts, F1 null when no " +
      "overlap") {
    import spark.implicits._
    import graft.functions.LcsLength
    def lcsOf(a: Seq[String], b: Seq[String]): Int =
      Seq((a, b)).toDF("a", "b")
        .select(LcsLength.of(col("a"), col("b"))).collect().head.getInt(0)
    assert(lcsOf(Seq("a","b","c","d","e"), Seq("a","x","c","y","e")) == 3)
    assert(lcsOf(Seq("x"), Seq("y")) == 0)
    assert(lcsOf(Seq("a","b"), Seq("a","b")) == 2)
    assert(lcsOf(Seq("b","a","c"), Seq("a","b","c")) == 2)
    assert(lcsOf(Seq.empty, Seq("a")) == 0)
    // native == composable HOF twin over 200 seeded random pairs
    val rnd = new scala.util.Random(77)
    val vocab = Seq("a","b","c","d","e")
    val pairs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(9))(vocab(rnd.nextInt(5))),
        Seq.fill(rnd.nextInt(9))(vocab(rnd.nextInt(5))))
    }.toDF("id", "a", "b")
    val mismatch = pairs.select(
        LcsLength.of(col("a"), col("b")).as("nat"),
        graft.operators.Metrics.lcsHof(col("a"), col("b")).as("hof"))
      .filter(col("nat") =!= col("hof")).count()
    assert(mismatch == 0L, s"$mismatch native-vs-HOF disagreements")
    // null array -> null
    val nr = Seq((Option.empty[Seq[String]], Option(Seq("a"))))
      .toDF("a", "b").select(LcsLength.of(col("a"), col("b"))).collect()
    assert(nr.head.isNullAt(0))
    // rougeL report: hand case
    val d = Seq((1L, "a b c d", "a x c y"), (2L, "q", "z"))
      .toDF("id", "cand", "ref")
    val got = graft.operators.Metrics.rougeL(d, "id", "cand", "ref")
      .orderBy("id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("lcs") == 2 && r1.getAs[Double]("p") == 0.5 &&
      r1.getAs[Double]("r") == 0.5 && r1.getAs[Double]("f1") == 0.5, r1)
    assert(got(1).isNullAt(got(1).fieldIndex("f1")), got(1).toString)
  }

  test("chrF: hand case (whitespace removed, clipped char n-grams, " +
      "macro-averaged P/R, beta=2) and the empty-side null") {
    import spark.implicits._
    // cand 'abcd' vs ref 'abce' after whitespace strip:
    // n=1 matches a,b,c → 3/4; n=2 matches ab,bc → 2/3
    // P = R = (3/4 + 2/3)/2 = 0.7083̅; F2 = 5PR/(4P+R) = P
    val d = Seq((1L, "ab cd", "ab ce")).toDF("id", "cand", "ref")
    val r = Metrics.chrF(d, "id", "cand", "ref", maxN = 2).collect().head
    assert(r.getAs[Double]("chr_p") == 0.708333 &&
      r.getAs[Double]("chr_r") == 0.708333 &&
      r.getAs[Double]("chrf") == 0.708333, r.toString)
    // disjoint pair: zero matches everywhere → P = R = 0 → chrf null
    val z = Seq((1L, "aa", "bb")).toDF("id", "cand", "ref")
    val rz = Metrics.chrF(z, "id", "cand", "ref", maxN = 2).collect().head
    assert(rz.getAs[Double]("chr_p") == 0.0 && rz.isNullAt(
      rz.fieldIndex("chrf")), rz.toString)
    // clipping: repeated cand char credits at most the ref count
    // cand 'aaa' vs ref 'ab': n=1 match min(3,1)=1 → p1=1/3, r1=1/2
    val c = Seq((1L, "aaa", "ab")).toDF("id", "cand", "ref")
    val rc = Metrics.chrF(c, "id", "cand", "ref", maxN = 1).collect().head
    assert(rc.getAs[Double]("chr_p") == 0.333333 &&
      rc.getAs[Double]("chr_r") == 0.5, rc.toString)
  }

  test("fleissKappa: hand 2-rater case, single-category null, and the " +
      "unbalanced-panel refusal") {
    import spark.implicits._
    // i1: A,A  i2: A,B → P̄ = 0.5; shares 0.75/0.25 → Pe = 0.625
    // κ = (0.5 − 0.625)/0.375 = −1/3
    val d = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "B"))
      .toDF("item", "cat")
    val r = Metrics.fleissKappa(d, "item", "cat", nRaters = 2)
      .collect().head
    assert(r.getAs[Long]("n_items") == 2 &&
      r.getAs[Double]("p_bar") == 0.5 &&
      r.getAs[Double]("p_e") == 0.625 &&
      r.getAs[Double]("kappa") == -0.333333, r.toString)
    // one category only → P_e = 1 → κ null (loud, not 0)
    val one = Seq((1L, "A"), (1L, "A"), (2L, "A"), (2L, "A"))
      .toDF("item", "cat")
    val ro = Metrics.fleissKappa(one, "item", "cat", 2).collect().head
    assert(ro.isNullAt(ro.fieldIndex("kappa")) &&
      ro.getAs[Double]("p_bar") == 1.0, ro.toString)
    // an item with a missing rating must refuse, not mis-normalize
    val bad = Seq((1L, "A"), (1L, "B"), (2L, "A")).toDF("item", "cat")
    val e = intercept[Exception] {
      Metrics.fleissKappa(bad, "item", "cat", 2).collect()
    }
    assert(e.getMessage.contains("fleissKappa") ||
      e.getCause != null, e.getMessage)
  }

  test("permutationTest: zero-mean symmetric deltas give p = 1, a " +
      "uniform strong signal gives the add-one floor, and the draw " +
      "is salt-keyed deterministic") {
    import spark.implicits._
    // deltas +x and −x: obs mean 0 → every replicate is ≥-extreme
    val sym = Seq((1L, 2.0, 1.0), (2L, 1.0, 2.0)).toDF("id", "a", "b")
    val rs = Metrics.permutationTest(sym, "id", "a", "b",
      replicates = 16).collect().head
    assert(rs.getAs[Double]("obs_diff") == 0.0 &&
      rs.getAs[Long]("n_extreme") == 16 &&
      rs.getAs[Double]("p_value") == 1.0, rs.toString)
    // 100 identical +1 deltas: a replicate ties |obs| only if all 100
    // md5 draws agree in sign (~2⁻⁹⁹ per replicate) → the add-one
    // floor 1/(R+1)
    val strong = (1 to 100).map(i => (i.toLong, 2.0, 1.0))
      .toDF("id", "a", "b")
    val rp = Metrics.permutationTest(strong, "id", "a", "b",
      replicates = 64).collect().head
    assert(rp.getAs[Double]("obs_diff") == 1.0 &&
      rp.getAs[Long]("n_extreme") == 0 &&
      rp.getAs[Double]("p_value") == 0.015385, rp.toString)
    // deterministic: same salt → identical row; repartition-invariant
    val rp2 = Metrics.permutationTest(strong.repartition(7), "id", "a",
      "b", replicates = 64).collect().head
    assert(rp.toString == rp2.toString)
    // null-side pairs are excluded
    val withNull = Seq((1L, Some(2.0), Some(1.0)),
      (2L, None, Some(1.0)), (3L, Some(1.0), None))
      .toDF("id", "a", "b")
    assert(Metrics.permutationTest(withNull, "id", "a", "b",
      replicates = 8).collect().head.getAs[Long]("n") == 1)
  }

  test("conformalThreshold: the exact order statistic (not an " +
      "interpolated percentile), the small-n null, and guards") {
    import spark.implicits._
    // scores 1..10, α = 0.25: k = ⌈11·0.75⌉ = 9 → q̂ = 9, coverage 0.9
    val d = (1 to 10).map(i => (i.toLong, i.toDouble))
      .toDF("id", "score").repartition(4)
    val r = Metrics.conformalThreshold(d, "score", "id", alpha = 0.25)
      .collect().head
    assert(r.getAs[Long]("n") == 10 && r.getAs[Long]("k") == 9 &&
      r.getAs[Double]("qhat") == 9.0 &&
      r.getAs[Double]("coverage") == 0.9, r.toString)
    // duplicate scores: k falls inside a tie run, q̂ is still the value
    val ties = Seq(1.0, 2.0, 2.0, 2.0, 5.0).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "score")
    val rt = Metrics.conformalThreshold(ties, "score", "id", 0.4)
      .collect().head // k = ⌈6·0.6⌉ = 4 → 4th smallest = 2.0
    assert(rt.getAs[Long]("k") == 4 && rt.getAs[Double]("qhat") == 2.0 &&
      rt.getAs[Double]("coverage") == 0.8, rt.toString)
    // k > n: threshold null, coverage 1.0 — keep everything, loudly
    val tiny = Seq((1L, 0.5), (2L, 0.7)).toDF("id", "score")
    val rn = Metrics.conformalThreshold(tiny, "score", "id", 0.1)
      .collect().head
    assert(rn.isNullAt(rn.fieldIndex("qhat")) &&
      rn.getAs[Double]("coverage") == 1.0, rn.toString)
    assert(intercept[IllegalArgumentException] {
      Metrics.conformalThreshold(tiny, "score", "id", 0.0)
    }.getMessage.contains("alpha"))
  }

  test("oddsRatios: hand-computed 2x2, the null effect sits at " +
      "log-OR 0 with a CI straddling it, zero cells take Haldane +0.5") {
    import spark.implicits._
    // key E: a=2 b=1 c=1 d=2 -> OR 4, log 1.386294; balanced key N:
    // a=b=c=d=2 -> log 0; key Z has a zero cell -> corrected cells
    val rows =
      Seq.fill(2)(("E", true, true)) ++ Seq(("E", true, false)) ++
      Seq(("E", false, true)) ++ Seq.fill(2)(("E", false, false)) ++
      (for (g <- Seq(true, false); y <- Seq(true, false);
            _ <- 1 to 2) yield ("N", g, y)) ++
      Seq(("Z", true, true), ("Z", false, true), ("Z", false, false))
    val d = rows.toDF("k", "g", "y")
    val got = Metrics.oddsRatios(d, "k", col("g"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap
    val e = got("E")
    assert(e.getAs[Long]("g1_pos") == 2 && e.getAs[Long]("g0_neg") == 2)
    assert(e.getAs[Double]("log_or") ==
      BigDecimal(math.log(4.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, e.toString)
    val n = got("N")
    assert(n.getAs[Double]("log_or") == 0.0 &&
      n.getAs[Double]("lo95") < 0.0 && n.getAs[Double]("hi95") > 0.0,
      n.toString)
    val z = got("Z")
    // cells (1,0,1,1) -> corrected (1.5,.5,1.5,1.5): OR = 3
    assert(z.getAs[Long]("g1_neg") == 0)
    assert(z.getAs[Double]("log_or") ==
      BigDecimal(math.log(1.5 * 1.5 / (0.5 * 1.5))).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, z.toString)
  }

  test("aucByKey: perfect / inverted / tied keys score 1, 0, 0.5; " +
      "degenerate keys report null; the distinct-score guard raises") {
    import spark.implicits._
    val d = Seq(
      ("A", 1.0, false), ("A", 2.0, true), ("A", 3.0, true),  // AUC 1
      ("B", 1.0, true), ("B", 2.0, false),                    // AUC 0
      ("C", 1.0, false), ("C", 1.0, true),                    // tie: 0.5
      ("D", 1.0, true), ("D", 2.0, true))                     // no negs
      .toDF("k", "s", "y").repartition(3)
    val got = Metrics.aucByKey(d, col("k"), col("s"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("A") == ((2L, 1L, Some(1.0))), got("A").toString)
    assert(got("B") == ((1L, 1L, Some(0.0))))
    assert(got("C") == ((1L, 1L, Some(0.5))))
    assert(got("D") == ((2L, 0L, None)))
    val ex = intercept[Exception] {
      Metrics.aucByKey(d, col("k"), col("s"), col("y"),
        maxKeyScores = 1L).collect()
    }
    assert(ex.getMessage.contains("distinct scores"), ex.getMessage)
  }

  test("bestThreshold: hand-swept F1 argmax, equal-F1 ties break to " +
      "the HIGHEST threshold, no positives raises by name") {
    import spark.implicits._
    // t=0.6 wins: TP3 FP1 FN0 -> F1 6/7
    val d = Seq((0.9, true), (0.8, true), (0.7, false), (0.6, true),
      (0.5, false)).toDF("s", "y").repartition(3)
    val r = Metrics.bestThreshold(d, col("s"), col("y")).collect().head
    assert(r.getAs[Double]("threshold") == 0.6 &&
      r.getAs[Long]("tp") == 3 && r.getAs[Long]("fp") == 1 &&
      r.getAs[Long]("fn") == 0 && r.getAs[Long]("tn") == 1 &&
      r.getAs[Double]("precision") == 0.75 &&
      r.getAs[Double]("recall") == 1.0 &&
      r.getAs[Double]("f1") == 0.857143, r.toString)
    // F1(t=5) = 2/(2+0+1) and F1(t=2) = 4/(4+2+0): both exactly 2/3
    // -> the higher threshold wins the tie
    val tie = Seq((5.0, true), (4.0, false), (3.0, false), (2.0, true),
      (1.0, false)).toDF("s", "y")
    val rt = Metrics.bestThreshold(tie, col("s"), col("y"))
      .collect().head
    assert(rt.getAs[Double]("threshold") == 5.0 &&
      rt.getAs[Long]("tp") == 1 && rt.getAs[Long]("fp") == 0,
      rt.toString)
    val ex = intercept[Exception] {
      Metrics.bestThreshold(
        Seq((1.0, false)).toDF("s", "y"), col("s"), col("y")).collect()
    }
    assert(ex.getMessage.contains("bestThreshold"), ex.getMessage)
  }
}
