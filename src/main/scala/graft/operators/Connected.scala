package graft.operators

import graft.operators.Checkpoints.PinOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a duplicate-pair edge list — the step a real
  * fuzzy-dedup pipeline runs AFTER LSH/verification: candidate pairs only
  * relate docs pairwise, but duplication is transitive (A≈B, B≈C ⇒ one
  * cluster), so keep-one-per-pair under-deletes. Components give every doc
  * a cluster id (= min doc id in its component); keep the canonical id,
  * drop the rest.
  *
  * Algorithm: hash-min label propagation. Every node starts labeled with
  * its own id; each round every node takes the min of its own and its
  * neighbors' labels; fixpoint = components. Rounds needed = graph
  * diameter, and near-dup clusters are shallow (dups of one source doc),
  * so convergence is a handful of rounds in practice.
  *
  * Scale posture (100 TB design point):
  *  - the edge list is ALREADY the reduced space — candidate pairs are a
  *    tiny fraction of the corpus (LSH's whole point), so the iteration
  *    runs on pairs, never on the corpus;
  *  - each round is one shuffle-on-id join + one groupBy(id) min — both
  *    map-side combinable, keyed the same way;
  *  - labels are `localCheckpoint`ed each round: the plan would otherwise
  *    grow linearly with rounds and re-analyze from the scan every time
  *    (lineage is truncated; on executor loss the round restarts from the
  *    last checkpoint, acceptable for a label frame that is one row per
  *    *paired* doc);
  *  - the driver-side convergence check (`isEmpty` on improved labels) is
  *    inherent to iterative fixpoints — same shape GraphX Pregel uses; it
  *    launches one tiny job per round, not a collect of data;
  *  - for adversarial diameters (long chains, which near-dup graphs don't
  *    produce) the O(log n)-round large-star/small-star variant is
  *    [[componentsStar]], same signature and contract.
  */
object Connected {

  /** Component label per node of the (undirected) edge list: every node
    * appearing in `edges` gets `comp` = min node id reachable from it.
    * Returns (id, comp). Throws if `maxIter` rounds don't reach fixpoint
    * (returning a half-propagated labeling would silently under-merge).
    */
  def components(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    // symmetric edge list, staged once and reused every round
    val sym = edges.select(col(aCol).cast("long").as("u"),
        col(bCol).cast("long").as("v"))
      .union(edges.select(col(bCol).cast("long").as("u"),
        col(aCol).cast("long").as("v")))
      .distinct()
      .pinned
    // chained generations: the convergence probe reads the PREVIOUS
    // labels after the new pin lands, which is exactly the
    // two-generation liveness the Chain retains
    val ckpt = new Checkpoints.Chain
    var labels = ckpt.pin(sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("comp")))
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // each node also receives its neighbors' current labels...
      val received = sym.select(col("u"), col("v").as("id"))
        .join(labels, "id")
        .select(col("u").as("id"), col("comp"))
      // ...and keeps the min of own + received. The node's OWN previous
      // label rides the aggregation as a third column (exactly one
      // non-null per id, so min() recovers it), which lets the
      // convergence count ride the pin's materialization job as an
      // observed metric — the former probe was a full shuffle join of
      // the two newest generations plus its own driver job per round.
      val combined = labels
          .select(col("id"), col("comp"), col("comp").as("own"))
        .union(received
          .select(col("id"), col("comp"), lit(null).cast("long").as("own")))
      val obs = org.apache.spark.sql.Observation()
      val next = ckpt.pin(combined
        .groupBy("id").agg(min("comp").as("comp"), min("own").as("own"))
        .observe(obs, coalesce(sum(when(col("comp") < col("own"), 1L)
          .otherwise(0L)), lit(0L)).as("improved")))
      // metrics publish on the SQLExecutionEnd event of the pin's eager
      // job; the listener bus is asynchronous, so poll briefly. If the
      // metric never lands (an engine that stops running checkpoints as
      // tracked executions), fall back to a filter over the PINNED
      // blocks — a tiny scan of materialized rows, never a recompute.
      val improved: Long = {
        var got: Option[Long] = None
        var waited = 0
        while (got.isEmpty && waited < 100) {
          got = org.apache.spark.sql.graftbridge.ObservationBridge
            .rowOrEmpty(obs).map(_.getLong(0))
          if (got.isEmpty) { Thread.sleep(20); waited += 1 }
        }
        got.getOrElse(
          next.filter(col("comp") < col("own")).count())
      }
      converged = improved == 0L
      labels = next.select(col("id"), col("comp"))
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    ckpt.release()
    labels
  }

  /** Component labels via alternating large-star/small-star contractions
    * [Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14] — same signature and output contract as [[components]], for
    * ADVERSARIAL diameters: hash-min needs diameter-many rounds (a
    * 10,000-link chain = 10,000 shuffles), star contraction converges in
    * O(log n) rounds on any shape. Near-dup graphs are shallow, so
    * hash-min stays the default; reach for this when a pair graph might
    * chain (e.g. sliding-window shingle overlaps).
    *
    * Each round rewrites the EDGE SET (canonical larger→smaller):
    *  - large-star: every node connects its strictly-larger neighbors to
    *    the minimum of its neighborhood (incl. itself);
    *  - small-star: every node connects its smaller-or-self neighbors to
    *    that minimum.
    * Fixpoint = disjoint stars centered on component minima; labels read
    * off as each node's single remaining neighbor. Same per-round
    * mechanics as [[components]]: shuffle-on-id aggregations,
    * localCheckpoint lineage truncation, driver-side convergence probe,
    * throw (never a silent under-merge) if `maxIter` rounds don't
    * converge. */
  def componentsStar(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25): DataFrame = {
    val canon = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct()
    val nodes = canon.select(col("u").as("id"))
      .union(canon.select(col("v").as("id"))).distinct()
      .pinned
    val ckpt = new Checkpoints.Chain
    var e = ckpt.pin(canon)
    var round = 0
    var converged = false
    while (!converged && round < maxIter) {
      // large-star: m(u) = min over u's neighborhood incl. u; each
      // strictly-larger neighbor re-attaches to m(u)
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mL = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val large = sym.filter(col("v") > col("u")).join(mL, "u")
        .filter(col("v") =!= col("m"))
        .select(greatest(col("v"), col("m")).as("u"),
          least(col("v"), col("m")).as("v"))
        .distinct()
      // small-star on the larger→smaller orientation: u's smaller
      // neighbors (and u itself) re-attach to their minimum
      val mS = large.groupBy("u").agg(min("v").as("m"))
      val small = large.join(mS, "u")
        .select(col("v"), col("m"))
        .union(mS.select(col("u").as("v"), col("m")))
        .filter(col("v") =!= col("m"))
        .select(greatest(col("v"), col("m")).as("u"),
          least(col("v"), col("m")).as("v"))
        .distinct()
      val small2 = ckpt.pin(small)
      converged = small2.exceptAll(e).isEmpty && e.exceptAll(small2).isEmpty
      e = small2
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star connected components did not converge in $maxIter rounds")
    ckpt.release()
    // stars: every non-center node has exactly one (u → center) edge
    val lab = e.groupBy("u").agg(min("v").as("comp"))
      .select(col("u").as("id"), col("comp"))
    nodes.join(lab, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Cluster assignment for a whole corpus: docs that appear in `pairs`
    * get their component's min id, all other docs are their own cluster.
    * `keepCanonical` view: `filter(col(idCol) === col("cluster"))` is the
    * post-dedup corpus. Returns `df` + `cluster`. */
  def clusters(df: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 25): DataFrame = {
    val comp = components(pairs, aCol, bCol, maxIter)
      .select(col("id").as(idCol), col("comp"))
    df.join(comp, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("comp"), col(idCol).cast("long")))
      .drop("comp")
  }
}
