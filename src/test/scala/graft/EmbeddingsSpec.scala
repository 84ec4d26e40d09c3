package graft

import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** [[graft.operators.Embeddings]] — verdict precedence over planted
  * pathologies, the gate/report forms, per-dim moments vs hand math,
  * and the standardize round trip. */
class EmbeddingsSpec extends TestBase {

  // 20 norm-5 inliers so a z=3 bound is reachable (max z over n valid
  // norms is √(n−1)), then one pathology of each kind
  private def vecs = {
    import spark.implicits._
    val inliers = (1L to 20L).map(i => (i, Some(Seq(3.0f, 4.0f))))
    (inliers ++ Seq(
      (21L, None),                              // missing
      (22L, Some(Seq(1.0f))),                   // bad_dim
      (23L, Some(Seq(Float.NaN, 1.0f))),        // nonfinite
      (24L, Some(Seq(Float.PositiveInfinity, 0.0f))), // nonfinite
      (25L, Some(Seq(0.0f, 0.0f))),             // zero_norm
      (26L, Some(Seq(300.0f, 400.0f)))))        // norm 500: outlier
      .toDF("id", "vec")
  }

  test("withVectorVerdict: precedence over planted pathologies") {
    val got = Embeddings.withVectorVerdict(vecs, "vec", dim = 2)
      .select("id", "verdict").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((1L to 20L).forall(got(_) == "ok"))
    assert(got(21L) == "missing" && got(22L) == "bad_dim" &&
      got(23L) == "nonfinite" && got(24L) == "nonfinite" &&
      got(25L) == "zero_norm" && got(26L) == "norm_outlier")
  }

  test("gate keeps only ok rows; report counts every verdict") {
    val kept = Embeddings.vectorQualityGate(vecs, "vec", dim = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == (1L to 20L).toSet)
    val rep = Embeddings.vectorQualityReport(vecs, "vec", dim = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("ok" -> 20L, "missing" -> 1L, "bad_dim" -> 1L,
      "nonfinite" -> 2L, "zero_norm" -> 1L, "norm_outlier" -> 1L))
  }

  test("dimMoments: hand-checked population moments") {
    import spark.implicits._
    val d = Seq(Seq(1.0f, 10.0f), Seq(3.0f, 10.0f), Seq(5.0f, 10.0f))
      .toDF("vec")
    val got = Embeddings.dimMoments(d, "vec").collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(0)._1 == 3.0 &&
      math.abs(got(0)._2 - math.sqrt(8.0 / 3)) < 1e-12)
    assert(got(1) == ((10.0, 0.0))) // constant dim: std 0
  }

  test("standardize: output moments are (0, 1); constant dims center") {
    import spark.implicits._
    val d = (1 to 40).map(i => Seq(i.toFloat, 7.0f)).toDF("vec")
    val m = Embeddings.dimMoments(d, "vec")
    val std = Embeddings.standardize(d, "vec", m)
    val check = Embeddings.dimMoments(std, "std_vec").collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(check(0)._1) < 1e-12 &&
      math.abs(check(0)._2 - 1.0) < 1e-12)
    assert(check(1) == ((0.0, 0.0))) // constant dim centered, not blown up
  }

  test("standardize plan: zero-exchange projection over the corpus") {
    import spark.implicits._
    val d = (1 to 20).map(i => Seq(i.toFloat, 2.0f)).toDF("vec")
    val m = Embeddings.dimMoments(d, "vec").cache()
    m.count()
    val std = Embeddings.standardize(d, "vec", m)
    std.collect()
    val p = std.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the corpus is the join's STREAMED side and must feed it straight
    // from its scan — no exchange on that branch (the packed moments
    // side may aggregate however it likes; it is two rows)
    val lines = p.linesIterator.toSeq
    val ji = lines.indexWhere(_.contains("BroadcastNestedLoopJoin"))
    assert(ji >= 0, s"moments must broadcast-join:\n$p")
    val corpusBranch = lines(ji + 1)
    assert(corpusBranch.trim.startsWith(":-") &&
      corpusBranch.contains("Scan") &&
      !corpusBranch.contains("Exchange"),
      s"corpus must not shuffle into the join:\n$p")
  }

  test("robustVectorGate: median/MAD survives contamination that " +
      "masks the moment z-gate") {
    import spark.implicits._
    // 39% contamination at ×100: the z-gate's own σ inflates to ~245,
    // z(500) ≈ 1.2 → everything passes (masked); median/MAD is blind
    // to the minority and drops every outlier
    val d = ((1L to 20L).map(i => (i, Seq(3.0f, 4.0f))) ++
      (21L to 33L).map(i => (i, Seq(300.0f, 400.0f))))
      .toDF("id", "vec")
    val zVerdicts = Embeddings.withVectorVerdict(d, "vec", dim = 2)
      .filter(col("verdict") === "norm_outlier").count()
    assert(zVerdicts == 0, "the moment gate must be masked here")
    val robust = Embeddings.robustVectorGate(d, "vec", dim = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(robust == (1L to 20L).toSet, s"got $robust")
    // non-degenerate MAD: spread inliers keep, far outlier drops
    val d2 = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(3.3f, 4.4f)),
      (3L, Seq(2.7f, 3.6f)), (4L, Seq(300.0f, 400.0f)))
      .toDF("id", "vec")
    val kept2 = Embeddings.robustVectorGate(d2, "vec", dim = 2, k = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L, 2L, 3L), s"got $kept2")
    // structural rejects are excluded before the bounds
    val d3 = d.unionByName(
      Seq((90L, null.asInstanceOf[Seq[Float]])).toDF("id", "vec"))
    assert(Embeddings.robustVectorGate(d3, "vec", dim = 2)
      .filter(col("id") === 90L).count() == 0)
  }

  test("robustVectorGate: empty frame back when nothing survives the " +
      "structural filter (the sibling gates' empty-input contract)") {
    import spark.implicits._
    // every row malformed: wrong dim, null, NaN component
    val d = Seq((1L, Seq(1.0f)), (2L, null.asInstanceOf[Seq[Float]]),
      (3L, Seq(Float.NaN, 2.0f))).toDF("id", "vec")
    val out = Embeddings.robustVectorGate(d, "vec", dim = 2)
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "vec"))
    // fully empty input too
    val empty = Seq.empty[(Long, Seq[Float])].toDF("id", "vec")
    assert(Embeddings.robustVectorGate(empty, "vec", dim = 2)
      .count() == 0)
  }

  test("covarianceMatrix + pca: planted 2-D subspace in 4-D recovered " +
      "exactly — axes, eigenvalues, projection variances") {
    import spark.implicits._
    val s2 = math.sqrt(2.0)
    // v = a·(1,1,0,0)/√2 + b·(0,0,1,−1)/√2; a ∈ {−3,−1,1,3} (var 5),
    // b ∈ {−1,1} (var 1) — full factorial, exact moments
    val pts = for (a <- Seq(-3.0, -1.0, 1.0, 3.0); b <- Seq(-1.0, 1.0))
      yield (a, b)
    val d = pts.zipWithIndex.map { case ((a, b), i) =>
      (i.toLong, Seq((a / s2).toFloat, (a / s2).toFloat,
        (b / s2).toFloat, (-b / s2).toFloat))
    }.toDF("id", "vec").repartition(3)
    // hand-checked covariance cells: var(v0) = var(a)/2 = 2.5,
    // cov(v0,v1) = 2.5, cov(v2,v3) = −0.5, cross-block = 0
    val cov = Embeddings.covarianceMatrix(d, "vec", dim = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    assert(cov((0, 0)) == 2.5 && cov((0, 1)) == 2.5)
    assert(cov((2, 2)) == 0.5 && cov((2, 3)) == -0.5)
    assert(cov((0, 2)) == 0.0 && cov((1, 3)) == 0.0)
    val (comps, eig) = Embeddings.pca(d, "vec", dim = 4, k = 4)
    assert(math.abs(eig(0) - 5.0) < 1e-6 &&
      math.abs(eig(1) - 1.0) < 1e-6, eig.toSeq.toString)
    assert(math.abs(eig(2)) < 1e-6 && math.abs(eig(3)) < 1e-6)
    val inv = 1.0 / s2
    assert(comps(0).zip(Seq(inv, inv, 0.0, 0.0))
      .forall { case (x, y) => math.abs(x - y) < 1e-6 },
      comps(0).toSeq.toString)
    assert(math.abs(math.abs(comps(1)(2)) - inv) < 1e-6 &&
      math.abs(comps(1)(0)) < 1e-6)
    // orthonormality of the returned axes
    for (i <- 0 until 4; j <- i until 4) {
      val dot = comps(i).zip(comps(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-6)
    }
    // projection variance onto axis c == eigenvalue c (population)
    val proj = Embeddings.pcaProject(d, "vec", comps.take(2))
      .select(col("pca")).collect().map(_.getSeq[Double](0))
    for (c <- 0 until 2) {
      val xs = proj.map(_(c))
      val mu = xs.sum / xs.length
      val vr = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(vr - eig(c)) < 1e-6, s"axis $c var $vr")
    }
    // malformed vectors are excluded, not fatal
    val dirty = d.unionByName(Seq((99L, Seq(1.0f)))
      .toDF("id", "vec"))
    assert(Embeddings.covarianceMatrix(dirty, "vec", 4).count() == 10L)
  }

  test("covarianceMatrix: quantized long capacity is ENFORCED — " +
      "n·max|term| past Long.MaxValue raises instead of wrapping") {
    import spark.implicits._
    // |x·y|·1e12 ≈ 9e18 per term: one row fits a long, two rows'
    // worth of sum capacity does not — the guard must raise, not
    // return a silently-wrapped covariance
    val big = Seq((1L, Seq(3000.0f, 3000.0f)),
      (2L, Seq(3000.0f, 3000.0f))).toDF("id", "vec")
    val e = intercept[Exception] {
      Embeddings.covarianceMatrix(big, "vec", dim = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("long capacity")
        || m.toLowerCase.contains("overflow")), msgs(e).mkString(" | "))
    // well under capacity: same data scaled down is fine
    val ok = Seq((1L, Seq(0.3f, 0.3f)), (2L, Seq(0.3f, 0.3f)))
      .toDF("id", "vec")
    assert(Embeddings.covarianceMatrix(ok, "vec", dim = 2)
      .collect().forall(r => r.getDouble(2) == 0.0))
    // n = 1 with ONE saturating term: the n-scaled bound alone cannot
    // see per-term floor() saturation (n = 1 ≤ MaxValue/term for any
    // term), so the per-term 2^62 ceiling must raise instead of
    // returning a clamped covariance
    val single = Seq((1L, Seq(3000.0f, 3000.0f))).toDF("id", "vec")
    val e1 = intercept[Exception] {
      Embeddings.covarianceMatrix(single, "vec", dim = 2).collect()
    }
    assert(msgs(e1).exists(_.contains("long capacity")),
      msgs(e1).mkString(" | "))
  }

  test("guards: column clashes raise") {
    import spark.implicits._
    val d = Seq((1L, Seq(1.0f))).toDF("id", "vec")
      .withColumn("verdict", lit("x"))
    assert(intercept[IllegalArgumentException] {
      Embeddings.withVectorVerdict(d, "vec", 1)
    }.getMessage.contains("verdict"))
  }

  test("embeddingJsDivergence: identical corpora score 0 everywhere, " +
      "disjoint occupancy sums to ln 2, zero-share clusters contribute " +
      "one-sided mass, empty side raises") {
    import spark.implicits._
    import graft.operators.Embeddings
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val xs = Seq((10L, Array(0.9f, 0.1f)), (11L, Array(0.8f, 0.2f)),
      (12L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    val same = Embeddings.embeddingJsDivergence(xs, xs, cents,
      "vec_id", "embedding", "vec_id", "embedding").collect()
    assert(same.forall(_.getAs[Double]("js_term") == 0.0), same.toSeq)
    // disjoint: a lives in cluster 0 only, b in cluster 1 only ->
    // JS = ln 2 total (0.5*ln2 per occupied cluster)
    val a = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val b = Seq((2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val dj = Embeddings.embeddingJsDivergence(a, b, cents,
      "vec_id", "embedding", "vec_id", "embedding")
      .agg(org.apache.spark.sql.functions.sum("js_term")).collect()
      .head.getDouble(0)
    assert(math.abs(dj - math.log(2.0)) < 1e-5, dj)
    val ex = intercept[Exception] {
      Embeddings.embeddingJsDivergence(a,
        b.filter(col("vec_id") < 0), cents,
        "vec_id", "embedding", "vec_id", "embedding").collect()
    }
    assert(ex.getMessage.contains("no vectors"), ex.getMessage)
  }
}
