package graft.operators

import graft.operators.Checkpoints.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics over edge lists — the crawl-frontier /
  * domain-authority primitive (Common-Crawl-style link ranks feed URL
  * quality filters; the reference's engine has no iterative surface,
  * so this extends the catalog the way a pre-training crawl pipeline
  * needs). Dup-cluster labeling lives in [[Connected]]; this file is
  * the weighted-propagation side.
  *
  * Scale shape: the edge table is materialized ONCE, hash-partitioned
  * by `src` (the join side every iteration probes), and reused across
  * all iterations; each iteration then moves (a) the |V|-sized rank
  * table to the edge partitioning and (b) the contribution pairs into
  * a `dst`-keyed partial aggregation — both AQE-planned shuffles,
  * with map-side combine absorbing high-in-degree hubs (the skewed
  * keys a link graph always has). Ranks localCheckpoint every
  * iteration: iterative lineage otherwise grows a plan whose codegen
  * alone dwarfs the job. */
object Graph {

  /** PageRank (Brin & Page 1998, the damped simplified form):
    *
    *   r_0(v)     = 1/N
    *   r_{t+1}(v) = (1-d)/N + d·Σ_{u→v} r_t(u)/outdeg(u)
    *
    * over the DISTINCT edge set (multi-edges collapse; self-loops
    * dropped). Dangling mass (nodes with no out-edges) is NOT
    * redistributed — the classic simplified variant; totals then sum
    * below 1, which ranking use-cases never notice (documented, and
    * exactly replayable in plain SQL, which keeps the oracle honest).
    *
    * Fixed `iterations` (crawl-rank practice: a handful of sweeps
    * stabilize the ordering long before convergence); ranks rounded
    * only by the caller — full doubles returned.
    *
    * Input: `edges` with `srcCol`/`dstCol`. Output: (id, rank). */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"Graph.pagerank: iterations >= 1 required")
    require(damping > 0 && damping < 1,
      s"Graph.pagerank: damping in (0,1) required, got $damping")
    val spark = edges.sparkSession
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // vertex spine: every id that appears on either side
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = verts.count() // also materializes the edge cache's parent
    require(n > 0, "Graph.pagerank: empty graph")
    val deg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("__deg"))
    var ranks = verts.withColumn("rank", lit(1.0 / n))
    val ckpt = new Checkpoints.Chain // reclaims superseded sweep files
    for (_ <- 1 to iterations) {
      // per-source emission rate, staged under fresh names so the
      // edge join condition can never be self-lineage-ambiguous
      val rates = ranks
        .join(deg, Seq("id")) // inner: danglers emit nothing
        .select(col("id").as("__rid"),
          (col("rank") / col("__deg")).as("__rate"))
      val contribs = e.join(rates, col("src") === col("__rid"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("__rate")).as("__in"))
      ranks = ckpt.pin(verts
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank")))
        // cut iterative lineage, stay distributed
    }
    ckpt.release()
    e.unpersist()
    verts.unpersist()
    ranks
  }

  /** Out-degree per vertex over the distinct non-loop edge set —
    * the companion diagnostic (dangling nodes absent, as in
    * [[pagerank]]'s propagation). */
  def outDegrees(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame =
    edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_degree"))

  /** Synchronous label-propagation communities (Raghavan et al. 2007,
    * the deterministic fixed-sweep variant) — the cheap community
    * detector a crawl pipeline runs where [[Connected]] is too coarse
    * (connected components merge everything touching; LPA splits a
    * component along its dense cores — mirror clusters, link farms,
    * topic pockets). Over the UNDIRECTED simple graph induced by
    * `edges` (direction/duplicates/self-loops normalized away):
    * every vertex starts as its own label, and each sweep every
    * vertex adopts the most frequent label among its neighbors —
    * ties to the SMALLEST label, updates all-at-once from the
    * previous sweep's labels (the synchronous schedule; the
    * asynchronous variant is order-dependent and unreplayable).
    * Integer labels and counts end-to-end: bit-exact on any engine,
    * no float anywhere.
    *
    * Scale shape: [[pagerank]]'s exactly — the symmetric adjacency
    * materializes ONCE, hash-partitioned on the neighbor key each
    * sweep's label join probes, and per-(vertex, label) counts
    * aggregate map-side before the argmax fold (one `max(struct)` per
    * vertex — no window). Labels localCheckpoint per sweep to cut
    * iterative lineage. High-degree hubs land as many (v, label)
    * partials, not one task.
    *
    * Output: (id, label) — label is the smallest-id exemplar of the
    * community the vertex converged into after `sweeps`. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      sweeps: Int): DataFrame = {
    require(sweeps >= 1, s"Graph.labelPropagation: sweeps >= 1 required")
    val dir = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
    // the argmax tie-break below negates the label; on a non-numeric
    // id that unary minus silently casts string->double and every
    // label comes back null — raise loudly instead of emitting garbage
    dir.schema.fields.foreach { f =>
      require(f.dataType.isInstanceOf[
          org.apache.spark.sql.types.NumericType],
        s"Graph.labelPropagation: vertex ids must be numeric, got " +
          s"${f.dataType.simpleString} for '${if (f.name == "a") srcCol
            else dstCol}' — map string ids to a dense numeric id " +
          "first (e.g. xxhash64 or a dictionary join)")
    }
    val adj = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = adj.select(col("a").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = verts.withColumn("label", col("id"))
    val ckpt = new Checkpoints.Chain
    for (_ <- 1 to sweeps) {
      val nbr = adj.join(labels.select(col("id").as("__nid"),
          col("label").as("__nl")), col("b") === col("__nid"))
        .groupBy(col("a").as("id"), col("__nl").as("__l"))
        .agg(count(lit(1)).as("__c"))
      // argmax: most frequent neighbor label, ties to the smallest —
      // max(struct(count, -label)) keeps it one aggregation, no window
      labels = ckpt.pin(nbr.groupBy("id")
        .agg(max(struct(col("__c"), (-col("__l")).as("__neg")))
          .as("__top"))
        .select(col("id"), (-col("__top.__neg")).as("label")))
    }
    ckpt.release()
    adj.unpersist()
    verts.unpersist()
    labels
  }

  /** Fixed-sweep k-core peeling (Seidman 1983; the BZ/peeling family)
    * — the density skeleton a link-farm/community audit keeps after
    * [[triangleCount]] says "dense somewhere": repeatedly delete
    * vertices of degree < k (each `sweeps` pass recomputes degrees
    * over the SURVIVING subgraph and drops below-k vertices
    * all-at-once — the synchronous schedule, deterministic and
    * oracle-replayable; full convergence takes ≤ diameter-ish sweeps,
    * callers wanting the fixpoint raise `sweeps` until the spec-pinned
    * stability holds). Over the undirected simple graph (direction/
    * dups/self-loops normalized). Integer degrees end-to-end.
    *
    * Scale shape: [[pagerank]]'s — the symmetric adjacency
    * materializes once and each sweep is one degree aggregation
    * (map-combined) + two semi-joins that ship ids only; edges
    * localCheckpoint per sweep to cut iterative lineage.
    *
    * Output: surviving `(id, degree)` — degree within the final
    * surviving subgraph. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      sweeps: Int): DataFrame = {
    require(k >= 1, s"Graph.kCore: k must be >= 1, got $k")
    require(sweeps >= 1, s"Graph.kCore: sweeps must be >= 1")
    val dir = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
    var adj = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ckpt = new Checkpoints.Chain
    for (_ <- 1 to sweeps) {
      val keep = adj.groupBy(col("a").as("id"))
        .agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select("id")
      val pruned = ckpt.pin(adj
        .join(keep.select(col("id").as("__ka")),
          col("a") === col("__ka"), "left_semi")
        .join(keep.select(col("id").as("__kb")),
          col("b") === col("__kb"), "left_semi"))
      adj.unpersist()
      adj = pruned.persist(StorageLevel.MEMORY_AND_DISK)
    }
    ckpt.release()
    val out = adj.groupBy(col("a").as("id"))
      .agg(count(lit(1)).cast("long").as("degree"))
    out
  }

  /** Degree assortativity (Newman 2002, the degree-variant Pearson r
    * over edges) — one number for "do hubs link to hubs?": positive
    * for social-ish graphs, negative for hub-and-spoke link farms and
    * crawler traps, a cheap structural fingerprint next to
    * [[triangleCount]]. Over the undirected simple graph, each edge
    * contributing its endpoint-degree pair symmetrically:
    * `r = (S_jk/M − (S_j/M)²) / (S_jj/M − (S_j/M)²)` with
    * `S_jk = Σ j·k`, `S_j = Σ ½(j+k)`, `S_jj = Σ ½(j²+k²)` — all
    * INTEGER sums over edges (halves cancel by summing both
    * orientations), so the only float math is the final fixed-order
    * expression. Null when the variance is 0 (a regular graph — no
    * correlation to measure).
    *
    * Scale: one degree aggregation + one broadcast-or-hash join of
    * degrees onto edges + one global fold. No windows, no iteration.
    *
    * Output one row: `m_edges, assortativity`. */
  def assortativity(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val dir = edges
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
    val sym = dir.union(dir.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    val deg = sym.groupBy(col("a").as("__id"))
      .agg(count(lit(1)).as("__deg"))
    // both orientations ride `sym`, so Σ(j+k)/2 and Σ(j²+k²)/2 become
    // plain Σ j and Σ j² over oriented edge-endpoints — integer-exact
    val joined = sym
      .join(deg.select(col("__id").as("__ia"), col("__deg").as("__ja")),
        col("a") === col("__ia"))
      .join(deg.select(col("__id").as("__ib"), col("__deg").as("__jb")),
        col("b") === col("__ib"))
    val sums = joined.agg(count(lit(1)).as("__m2"),
      sum(col("__ja") * col("__jb")).as("__sjk"),
      sum(col("__ja")).as("__sj"),
      sum(col("__ja") * col("__ja")).as("__sjj"))
    val m = col("__m2").cast("double")
    val mean = col("__sj").cast("double") / m
    val num = col("__sjk").cast("double") / m - mean * mean
    val den = col("__sjj").cast("double") / m - mean * mean
    sums.select((col("__m2") / 2).cast("long").as("m_edges"),
      when(den =!= 0.0, round(num / den, 6)).as("assortativity"))
  }

  /** EXACT triangle count over the undirected simple graph induced by
    * `edges` (direction, duplicates, and self-loops are normalized
    * away) — the graph-health/community-density primitive (e.g.
    * link-farm detection over a crawl's domain graph).
    *
    * DEGREE-ORIENTED enumeration (the standard worst-case-optimal
    * trick): every edge is oriented from its lower-(degree, id)
    * endpoint to the higher, so each triangle is generated by exactly
    * one wedge at its lowest-rank corner and — the scale point — the
    * oriented out-degree is O(√m)-bounded, which caps the wedge
    * self-join fan-out. A naive a<b orientation puts a celebrity hub's
    * ENTIRE neighborhood on one side and the wedge join goes quadratic
    * in its degree; degree orientation shears that hub into near-flat
    * fan-out. Joins are all equi-joins (hash-partitioned on vertex
    * ids); the closing-edge check is a left-semi join, which ships no
    * payload back.
    *
    * Returns one row: `triangles` (BIGINT). */
  def triangleCount(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // rank = (degree, id); ties fall back to the canonical a<b order
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b"))
          .as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a"))
          .as("v"),
        greatest(col("da"), col("db")).as("dv_rank"))
    // wedges at the lowest corner: unordered head pairs, ranked
    val x = oriented.select(col("u"), col("v").as("p"),
      col("dv_rank").as("dp"))
    val y = oriented.select(col("u"), col("v").as("q"),
      col("dv_rank").as("dq"))
    val wedges = x.join(y, "u")
      .filter(col("dp") < col("dq") ||
        (col("dp") === col("dq") && col("p") < col("q")))
      .select(col("p"), col("q"))
    // a closing edge {p, q} with rank(p) < rank(q) is oriented p→q
    wedges.join(oriented.select(col("u").as("p"), col("v").as("q")),
        Seq("p", "q"), "left_semi")
      .agg(count(lit(1)).as("triangles"))
  }

  /** Item co-occurrence with Adamic–Adar weighting (Adamic & Adar
    * 2003) — the market-basket / "frequently bought together" / link
    * prediction scorer over a bipartite (group, item) relation: for an
    * item pair, `n_groups` is the raw co-occurrence support and
    * `aa_score = Σ_{shared groups g} 1/ln(|g|)` discounts big groups
    * (two items sharing a 1000-item basket is weak evidence; sharing a
    * 2-item basket is strong — the same degree-discount intuition as
    * TF-IDF). Pairs below `minSupport` are dropped.
    *
    * Determinism: per-group weights quantize to longs
    * (`floor(1e12/ln(deg) + 0.5)`), so the pair sums are
    * association-order-exact; `ln` parity holds engine-to-engine
    * (the q76 unigram-logprob precedent). Long capacity bounds at
    * ~9·10⁶ shared groups per pair × 1e12 — raise by lowering the
    * quantization if a pair can co-occur more than that.
    *
    * Scale: ONE group-keyed self-join whose per-group fan-out is
    * deg·(deg−1)/2 — bounded by the BASKET size, never the item or
    * group count (the market-basket contract: a pathological
    * mega-group needs an upstream cap, the per-key-window surface
    * argument). Duplicate (group, item) rows collapse first; the pair
    * aggregation is map-side combined on (item_a, item_b). */
  def coOccurrence(df: DataFrame, groupCol: String, itemCol: String,
      minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1L,
      s"Graph.coOccurrence: minSupport must be >= 1, got $minSupport")
    val items = df
      .filter(col(groupCol).isNotNull && col(itemCol).isNotNull)
      .select(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .distinct()
    val deg = items.groupBy("__g").agg(count(lit(1)).as("__deg"))
    val withDeg = items.join(deg, "__g").filter(col("__deg") >= 2)
    withDeg.as("a")
      .join(withDeg.as("b"), col("a.__g") === col("b.__g") &&
        col("a.__i") < col("b.__i"))
      .select(col("a.__i").as("item_a"), col("b.__i").as("item_b"),
        floor(lit(1e12) / log(col("a.__deg").cast("double")) + lit(0.5))
          .as("__w"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_groups"),
        round(sum(col("__w")).cast("double") / lit(1e12), 6)
          .as("aa_score"))
      .filter(col("n_groups") >= minSupport)
  }

  /** Multi-source BFS over the DIRECTED edge set: minimum hop count
    * from any seed, up to `maxHops` — the seed-expansion primitive a
    * curation pipeline runs as a SET operation ("everything within 2
    * links of known spam", benchmark-contamination closure, crawl
    * frontier scheduling). The DataFrame twin of the Catalyst
    * `WITH RECURSIVE` surface (q165): recursive SQL re-derives every
    * path and multiplies rows through cycles, while this form carries
    * only the FRONTIER (vertices first reached at the previous hop)
    * into each sweep — on a cyclic link graph that is the difference
    * between |V| work per hop and exponential blowup.
    *
    * Scale shape: [[pagerank]]'s — distinct directed non-loop edges
    * materialize once, each hop is one frontier join + one
    * min-aggregation, distances localCheckpoint per hop (iterative
    * lineage). Integer hops; deterministic.
    *
    * Output: `(id, hops)` for every vertex reached within `maxHops`
    * (seeds at 0) — vertices never reached are absent, the caller
    * left-antis or left-joins as policy dictates. */
  def bfsFrom(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 32,
      s"Graph.bfsFrom: maxHops must be in [1, 32], got $maxHops")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ckpt = new Checkpoints.Chain
    var dist = ckpt.pin(seeds
      .select(col(seedCol).as("id")).filter(col("id").isNotNull)
      .distinct()
      .withColumn("hops", lit(0L)))
    for (h <- 1 to maxHops) {
      val frontier = dist.filter(col("hops") === (h - 1L))
        .select(col("id").as("__fid"))
      val reached = e.join(frontier, col("src") === col("__fid"))
        .select(col("dst").as("id"))
        .distinct()
        .withColumn("hops", lit(h.toLong))
      dist = ckpt.pin(dist.unionAll(reached)
        .groupBy("id").agg(min(col("hops")).as("hops")))
    }
    ckpt.release()
    e.unpersist()
    dist
  }

  /** HITS hubs & authorities (Kleinberg 1999) in the UNNORMALIZED
    * integer form — the crawl-side complement to [[pagerank]]: a good
    * hub links to many good authorities, a good authority is linked
    * from many good hubs. Classic HITS rescales each sweep by a
    * positive norm, which never changes the RANKING — it only keeps
    * floats bounded. Dropping it keeps every update a pure INTEGER
    * sum (all-ones init; auth then hub per sweep, hub reading the
    * sweep's NEW auth scores), so results replay bit-for-bit on any
    * engine and the oracle is plain unrolled SQL — the same
    * engine-parity reasoning as [[coOccurrence]]'s quantized weights,
    * with no quantization needed at all.
    *
    * Capacity: scores grow like (max degree)^(2·sweeps); with
    * longs that bounds deg^(2·sweeps) < 2^63 — e.g. 6 sweeps of a
    * deg-1000 graph. `sweeps` is capped at 8 and callers with hotter
    * hubs should rank on fewer sweeps (crawl practice: 2–3 sweeps
    * already stabilize the ordering).
    *
    * Scale shape: [[pagerank]]'s — distinct non-loop edges
    * materialize once, each half-sweep is one edge-keyed join plus a
    * map-side-combined sum; scores localCheckpoint per sweep to cut
    * iterative lineage.
    *
    * Output: (id, hub, auth) longs over the vertex spine; vertices
    * with no in-edges have auth 0 after sweep 1 (resp. hub 0). */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
      sweeps: Int): DataFrame = {
    require(sweeps >= 1 && sweeps <= 8,
      s"Graph.hits: sweeps must be in [1, 8], got $sweeps")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val verts = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var scores = verts
      .withColumn("hub", lit(1L)).withColumn("auth", lit(1L))
    val ckpt = new Checkpoints.Chain
    for (_ <- 1 to sweeps) {
      val auth = e
        .join(scores.select(col("id").as("__sid"), col("hub")),
          col("src") === col("__sid"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("hub")).as("__a"))
      val newAuth = verts
        .join(auth, Seq("id"), "left")
        .select(col("id"), coalesce(col("__a"), lit(0L)).as("auth"))
      val hub = e
        .join(newAuth.select(col("id").as("__aid"), col("auth")),
          col("dst") === col("__aid"))
        .groupBy(col("src").as("id"))
        .agg(sum(col("auth")).as("__h"))
      scores = ckpt.pin(verts
        .join(hub, Seq("id"), "left")
        .join(newAuth, Seq("id"))
        .select(col("id"), coalesce(col("__h"), lit(0L)).as("hub"),
          col("auth")))
    }
    ckpt.release()
    e.unpersist()
    verts.unpersist()
    scores
  }
}
