package graft.operators

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
      ranks = verts
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
        .localCheckpoint(true) // cut iterative lineage, stay distributed
    }
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
}
