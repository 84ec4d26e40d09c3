package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** [[graft.operators.Graph]] — the distributed PageRank must match a
  * sequential reference implementation exactly (same simplified-dangling
  * semantics), ignore multi-edges/self-loops, and stay stable under
  * partitioning. */
class GraphSpec extends TestBase {

  /** Sequential reference: r0 = 1/N; r' = (1-d)/N + d·Σ r/deg over
    * the distinct non-loop edge set. */
  private def seqPagerank(edges: Seq[(Long, Long)], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val verts = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = verts.size
    val deg = e.groupBy(_._1).map { case (s, xs) => s -> xs.size }
    var r = verts.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = e.groupBy(_._2).map { case (t, xs) =>
        t -> xs.map(x => r(x._1) / deg(x._1)).sum
      }
      r = verts.map(v => v -> ((1.0 - d) / n + d * in.getOrElse(v, 0.0)))
        .toMap
    }
    r
  }

  private val handEdges: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    // 4 is dangling-adjacent: out-edge only, no in-edges

  test("pagerank matches the sequential reference on a hand graph") {
    import spark.implicits._
    val edges = handEdges.toDF("s", "t")
    val got = Graph.pagerank(edges, "s", "t", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = seqPagerank(handEdges, 3)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-12, s"vertex $v: $r vs ${want(v)}")
    }
    // sanity: 3 has the most in-links and must outrank everyone
    assert(got(3L) == got.values.max)
  }

  test("multi-edges and self-loops are ignored") {
    import spark.implicits._
    val noisy = (handEdges ++ handEdges ++ Seq((1L, 1L), (3L, 3L)))
      .toDF("s", "t")
    val got = Graph.pagerank(noisy, "s", "t", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = seqPagerank(handEdges, 3)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-12)
    }
  }

  test("pure sink keeps only the teleport share; partitioning-stable") {
    import spark.implicits._
    // star into 9: every spoke ranks (1-d)/N, the hub collects
    val star = (1L to 8L).map(i => (i, 9L))
    for (p <- Seq(1, 7)) {
      val got = Graph.pagerank(star.toDF("s", "t").repartition(p),
        "s", "t", iterations = 2)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = seqPagerank(star, 2)
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-12, s"p=$p vertex $v")
      }
      assert(got(9L) == got.values.max)
    }
  }

  test("outDegrees over distinct non-loop edges") {
    import spark.implicits._
    val got = Graph.outDegrees(
      (handEdges ++ Seq((1L, 2L), (2L, 2L))).toDF("s", "t"), "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("triangleCount: hand graphs, direction/dup/loop normalization, " +
      "hub skew, partitioning-stable") {
    import spark.implicits._
    def tri(edges: Seq[(Long, Long)]): Long =
      Graph.triangleCount(edges.toDF("s", "t"), "s", "t")
        .collect().head.getLong(0)
    // K4 has C(4,3) = 4 triangles; direction and duplicates must not
    // change the count, self-loops must not add any
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(tri(k4) == 4L)
    assert(tri(k4 ++ k4.map(_.swap) ++ Seq((1L, 1L), (3L, 3L))) == 4L)
    // a path has none; one chord closes exactly one
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == 0L)
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L))) == 1L)
    // hub: a star has no triangles; star + one rim edge has exactly 1 —
    // the degree orientation points rim→hub, so the hub's fan-out
    // never explodes the wedge join
    val star = (1L to 40L).map(i => (0L, i))
    assert(tri(star) == 0L)
    assert(tri(star :+ (7L, 9L)) == 1L)
    // reference count on a modular graph vs a brute-force triple loop
    val mod = (0L until 120L).flatMap(i =>
      Seq((i % 13, (i * 5 + 2) % 13), (i % 13, (i * 7 + 4) % 13)))
    val canon = mod.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val es = canon.toSet
    val vs = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    var brute = 0L
    for (a <- vs; b <- vs if b > a; c <- vs if c > b)
      if (es((a, b)) && es((b, c)) && es((a, c))) brute += 1
    assert(tri(mod) == brute, s"expected $brute")
    assert(Graph.triangleCount(mod.toDF("s", "t").repartition(11),
      "s", "t").collect().head.getLong(0) == brute)
  }

  test("guards: iterations and damping validated") {
    import spark.implicits._
    val e = handEdges.toDF("s", "t")
    assert(intercept[IllegalArgumentException] {
      Graph.pagerank(e, "s", "t", iterations = 0)
    }.getMessage.contains("iterations"))
    assert(intercept[IllegalArgumentException] {
      Graph.pagerank(e, "s", "t", iterations = 1, damping = 1.0)
    }.getMessage.contains("damping"))
  }

  test("coOccurrence: hand-checked AA weights (1/ln deg per shared " +
      "group), support filter, duplicate rows collapse, singleton " +
      "groups contribute nothing") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // g1 = {a,b} (deg 2), g2 = {a,b,c} (deg 3), g3 = {a} (singleton),
    // g4 = {b,c} (deg 2); duplicate (g1,a) row must not inflate
    val rows = Seq(("g1","a"),("g1","a"),("g1","b"),("g2","a"),
      ("g2","b"),("g2","c"),("g3","a"),("g4","b"),("g4","c"))
      .toDF("g", "i")
    val got = Graph.coOccurrence(rows, "g", "i", minSupport = 1L)
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Double)].collect().toSeq
    val w2 = 1.0 / math.log(2.0)
    val w3 = 1.0 / math.log(3.0)
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-6
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Seq(("a","b",2L), ("a","c",1L), ("b","c",2L)), got)
    assert(close(got(0)._4, w2 + w3) && close(got(1)._4, w3) &&
      close(got(2)._4, w3 + w2), got)
    // support >= 2 drops the (a,c) pair
    assert(Graph.coOccurrence(rows, "g", "i", minSupport = 2L)
      .count() == 2)
    assert(intercept[IllegalArgumentException] {
      Graph.coOccurrence(rows, "g", "i", minSupport = 0L)
    }.getMessage.contains("minSupport"))
  }

  test("labelPropagation: barbell graph splits into its two triangles " +
      "(hand-traced synchronous sweeps, smallest-label ties)") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6}, bridge 3–4; with duplicate and
    // reversed edges plus a self-loop thrown in for normalization
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L), (2L, 1L), (1L, 2L), (5L, 5L))
      .toDF("s", "d").repartition(5)
    val got = Graph.labelPropagation(edges, "s", "d", sweeps = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand trace (synchronous, min-label tie): after sweep 3 the left
    // triangle holds label 1, the right holds label 3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), got.toString)
    // one sweep of a single edge: both endpoints adopt the other's
    // label (synchronous schedule — they SWAP, not converge)
    val pair = Seq((7L, 9L)).toDF("s", "d")
    val g1 = Graph.labelPropagation(pair, "s", "d", sweeps = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g1 == Map(7L -> 9L, 9L -> 7L), g1.toString)
    assert(intercept[IllegalArgumentException] {
      Graph.labelPropagation(pair, "s", "d", sweeps = 0)
    }.getMessage.contains("sweeps"))
    // non-numeric vertex ids must raise loudly — the argmax tie-break
    // negates the label, and string→double casting would otherwise
    // return silent null labels for every vertex
    val strEdges = Seq(("a", "b"), ("b", "c")).toDF("s", "d")
    assert(intercept[IllegalArgumentException] {
      Graph.labelPropagation(strEdges, "s", "d", sweeps = 1)
    }.getMessage.contains("numeric"))
  }

  test("kCore: the pendant peels off a triangle at k=2, k=3 empties " +
      "it, normalization holds") {
    import spark.implicits._
    // triangle {1,2,3} + pendant 4–1, with dup/reversed noise
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (2L, 1L),
      (1L, 1L)).toDF("s", "d").repartition(3)
    val got = Graph.kCore(e, "s", "d", k = 2, sweeps = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), got.toString)
    // k = 3: nothing survives the first peel's cascade
    assert(Graph.kCore(e, "s", "d", k = 3, sweeps = 2).count() == 0L)
    assert(intercept[IllegalArgumentException] {
      Graph.kCore(e, "s", "d", k = 0, sweeps = 1)
    }.getMessage.contains("k"))
  }

  test("assortativity: a star scores exactly −1, a regular graph has " +
      "no correlation to measure (null)") {
    import spark.implicits._
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val rs = Graph.assortativity(star, "s", "d").collect().head
    assert(rs.getAs[Long]("m_edges") == 3 &&
      rs.getAs[Double]("assortativity") == -1.0, rs.toString)
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val rt = Graph.assortativity(tri, "s", "d").collect().head
    assert(rt.getAs[Long]("m_edges") == 3 &&
      rt.isNullAt(rt.fieldIndex("assortativity")), rt.toString)
  }

  test("bfsFrom: min hops win on a chain, cycles terminate, multiple " +
      "seeds expand together, unreached vertices stay absent") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    def seeds(ids: Long*) = ids.toDF("seed")
    val got = Graph.bfsFrom(chain, "s", "d", seeds(1L), "seed", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L), got.toString)
    // two seeds: 4 reaches 5 at hop 1; 3 still found from 1 at hop 2
    val multi = Graph.bfsFrom(chain, "s", "d", seeds(1L, 4L), "seed", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 0L,
      5L -> 1L), multi.toString)
    // a 2-cycle terminates and keeps the first-visit hop
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val gc = Graph.bfsFrom(cyc, "s", "d", seeds(1L), "seed", 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gc == Map(1L -> 0L, 2L -> 1L), gc.toString)
    assert(intercept[IllegalArgumentException] {
      Graph.bfsFrom(chain, "s", "d", seeds(1L), "seed", 0)
    }.getMessage.contains("maxHops"))
  }

  test("hits: hand-unrolled integer sweeps, self-loops and dup edges " +
      "normalize away, sweep bounds enforced") {
    import spark.implicits._
    // 1 -> {3, 4}, 2 -> 3, plus a self-loop and a duplicate edge
    val e = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 2L), (1L, 3L))
      .toDF("s", "d")
    def scores(sweeps: Int): Map[Long, (Long, Long)] =
      Graph.hits(e, "s", "d", sweeps).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // sweep 1: auth = in-sums of all-ones hubs; hub = out-sums of those
    assert(scores(1) == Map(1L -> (3L, 0L), 2L -> (2L, 0L),
      3L -> (0L, 2L), 4L -> (0L, 1L)), scores(1).toString)
    // sweep 2: a2(3)=h1(1)+h1(2)=5, a2(4)=h1(1)=3, h2(1)=8, h2(2)=5
    assert(scores(2) == Map(1L -> (8L, 0L), 2L -> (5L, 0L),
      3L -> (0L, 5L), 4L -> (0L, 3L)), scores(2).toString)
    assert(intercept[IllegalArgumentException] {
      Graph.hits(e, "s", "d", sweeps = 0)
    }.getMessage.contains("sweeps"))
    assert(intercept[IllegalArgumentException] {
      Graph.hits(e, "s", "d", sweeps = 9)
    }.getMessage.contains("sweeps"))
  }
}
