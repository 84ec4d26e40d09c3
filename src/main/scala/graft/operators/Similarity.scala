package graft.operators

import graft.operators.Checkpoints.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.4 X3): brute-force cosine
  * top-k as the correctness baseline, and a sign-random-projection LSH
  * bucketing as the scale path.
  *
  * Scale posture: the brute-force path broadcasts only the (small) query
  * set against the corpus — a broadcast nested-loop join that scans the
  * corpus once, no shuffle of the big side. The LSH path reduces that scan
  * to an equi-join on bucket id (shuffle-on-bucket), which is the shape
  * that survives a 1000-executor corpus; plane projections are
  * MD5-derived constants so buckets are reproducible across engines.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double in
    * index order (deterministic fold — same order the oracle sums in).
    * Backed by the codegen'd [[graft.functions.DotProduct]] expression —
    * bit-identical to the composable HOF form (see [[dotHof]]) but without
    * per-element lambda interpretation. */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dotF(a, b)

  /** Composable built-in form of [[dot]], for non-float arrays or as a
    * reference implementation (bit-identical results). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each row of `queries` (small), the k
    * nearest `corpus` rows by cosine. Scores are rounded to 6 decimals
    * before ranking so ordering is reproducible; ties break on corpus id.
    * Returns (query_id, corpus_id, score, rank). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms are precomputed per side (n + m evaluations, not n × m)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    broadcastTopK(q, c, dot, k)
  }

  /** THE broadcast brute-force ranking shape — the single definition
    * [[cosineTopK]] and [[graft.operators.Quantize.int8TopK]] share, so
    * their scores/ranks stay recallAtK-comparable by construction
    * (round-6 scores, self-pairs excluded, corpus-id tiebreak). Inputs
    * are pre-normed sides `(query_id, qv, qn)` / `(corpus_id, cv, cn)`;
    * `dotFn` is the dot for the sides' element types ([[dot]] for float
    * arrays, [[dotHof]] for double). `pairKeep` is an extra pair-level
    * predicate over any columns the sides carry (extra input columns
    * are dropped from the output) — [[hardNegatives]] passes the
    * label-mismatch rule through it; a null/not-true predicate drops
    * the pair. */
  private[operators] def broadcastTopK(q: DataFrame, c: DataFrame,
      dotFn: (Column, Column) => Column, k: Int,
      pairKeep: Column = lit(true)): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("corpus_id"))
    scoredPairs(q, c, dotFn, pairKeep)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** [[broadcastTopK]]'s scored cross product without the ranking cut
    * — every (query, corpus) pair with its round-6 score. Split out so
    * [[marginMining]] can rank the SAME scored set from both ends
    * (per query AND per corpus) without a second pass that would
    * broadcast the corpus side. */
  private[operators] def scoredPairs(q: DataFrame, c: DataFrame,
      dotFn: (Column, Column) => Column,
      pairKeep: Column = lit(true)): DataFrame =
    // Fan.out: the |q|·|c| score sweep runs INSIDE the corpus scan
    // stage (broadcast join, no exchange), so an under-split corpus
    // serializes every dot product on one core — measured r16: the
    // single-row-group embeddings fixture ran q217's full scored set
    // single-task. No-op at production split counts.
    broadcast(q).crossJoin(Fan.out(c))
      .filter(col("query_id") =!= col("corpus_id") && pairKeep)
      .select(col("query_id"), col("corpus_id"),
        // a length mismatch between the sides would null the dot via
        // zip_with padding and silently sink the pair to the bottom of
        // every ranking — raise per-pair instead (two size() reads,
        // no join). A null vector still null-propagates: the condition
        // is not-true, so this adds no new failure for null sides.
        when(size(col("qv")) =!= size(col("cv")), raise_error(concat(
          lit("topK: ranking sides disagree on vector dimensionality (" +
            "query "), size(col("qv")).cast("string"), lit(" vs corpus "),
          size(col("cv")).cast("string"),
          lit(") — scores would silently null out; pad or filter " +
            "upstream"))))
        .otherwise(
          round(dotFn(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
          .as("score"))

  /** Hard-negative mining (X3, contrastive-training data prep): for
    * each anchor, the `k` most-cosine-similar corpus vectors whose
    * label DIFFERS from the anchor's — the negatives that sit closest
    * to the decision boundary, the standard mining pass for
    * embedding-model and reranker training pairs (the "hard negatives"
    * of the DPR / contrastive-learning literature; random negatives
    * are trivially separable and teach the model little).
    *
    * "Different label" is null-safe (`NOT (a <=> b)` — SQL
    * `IS DISTINCT FROM`): an unlabeled corpus row is a usable negative
    * for every labeled anchor (its label is not provably equal), and
    * two unlabeled rows never pair (not provably different). The
    * anchor itself is excluded as always.
    *
    * Output: (anchor_id, neg_id, score, rank). EXACTLY the
    * [[broadcastTopK]] ranking shape [[cosineTopK]] serves from —
    * same round-6 scores, same tiebreak — so `recallAtK` and the
    * two-stage re-rankers compose with it unchanged; only the
    * pair-keep rule differs. Anchors broadcast; the corpus side is
    * never shuffled. */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = anchors.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"),
      col(labelCol).as("__albl"))
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"),
      col(labelCol).as("__nlbl"))
    broadcastTopK(q, c, dot, k,
        pairKeep = !(col("__albl") <=> col("__nlbl")))
      .withColumnRenamed("query_id", "anchor_id")
      .withColumnRenamed("corpus_id", "neg_id")
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019, the LASER /
    * CCMatrix parallel-corpus miner): candidate translation pairs
    * between vector sets X and Y score by the RATIO margin
    * `margin(x, y) = cos(x, y) / ((avgTopK_Y(x) + avgTopK_X(y)) / 2)`
    * — raw cosine over the average cosine of each side's own k-NN
    * neighborhood, which cancels hubness (a vector that is close to
    * EVERYTHING mines nothing). A pair survives when it is the MUTUAL
    * margin-best (x's best y AND y's best x — the intersection
    * strategy of the paper) and its margin clears `threshold`.
    * Output: (x_id, y_id, score, margin) round-6, one row per mined
    * pair.
    *
    * Determinism: cosines are the [[cosineTopK]] round-6 scores; the
    * per-side k-NN averages sum QUANTIZED longs (`round(score·1e6)` —
    * the scores are already round-6, so the long is exact), making the
    * averages association-order-independent; the margin itself is one
    * fixed-order IEEE expression. Best-pair ties break on the partner
    * id ascending.
    *
    * Scale: two [[broadcastTopK]] passes (the smaller side should be
    * X — it broadcasts in pass 1 and is the corpus of pass 2), then
    * everything downstream is keyed joins and per-id aggregations over
    * the k·|X| + k·|Y| candidate rows, never |X|·|Y|. At 100 TB swap
    * the brute-force passes for [[ivfTopK]] candidates and keep the
    * margin/mutual logic unchanged — it only reads (query, corpus,
    * score) rows. Per-id windows run over the candidate set: k own
    * neighbors plus one row per OTHER-side top-k list the id appears
    * in — k·avg in aggregate, so a pathological hub (a vector in
    * everyone's top-k) bounds at the other side's count, never the
    * pair product. */
  def marginMining(x: DataFrame, y: DataFrame, idCol: String,
      vecCol: String, k: Int, threshold: Double): DataFrame = {
    require(k >= 1, s"marginMining: k must be >= 1, got $k")
    // BOTH directions rank the same X-broadcast scored set — a naive
    // cosineTopK(y, x) for the backward pass would broadcast Y, the
    // CORPUS side (X is the side the caller sized to broadcast; at
    // mining scale Y is the hundred-million-sentence pool). Each
    // ranking recomputes the cross product once — the same two passes
    // as two topK calls, with no big-side broadcast.
    val q = x.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = y.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    def run(rankKey: String, tieKey: String) = {
      val w = Window.partitionBy(rankKey)
        .orderBy(desc("score"), asc(tieKey))
      scoredPairs(q, c, dot)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
    }
    val fwd = run("query_id", "corpus_id")
    // backward run in cosineTopK(y, x)'s output shape: y is the query
    val bwd = run("corpus_id", "query_id")
      .select(col("corpus_id").as("query_id"),
        col("query_id").as("corpus_id"), col("score"))
    marginMiningFrom(fwd, bwd, threshold)
  }

  /** [[marginMining]] with IVF candidate generation — the 100 TB form
    * the brute-force scaladoc promises: both directions' k-NN lists
    * come from [[ivfTopK]] (cluster-bucketed, never |X|·|Y|), and the
    * margin/mutual logic is IDENTICAL by construction
    * ([[marginMiningFrom]] reads only (query, corpus, score) rows).
    * Mining quality degrades exactly as IVF recall does — raise
    * `probe` to recover candidates at cluster boundaries. */
  def marginMiningIvf(x: DataFrame, y: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int, centIdCol: String,
      centVecCol: String, threshold: Double, probe: Int = 1)
      : DataFrame = {
    require(k >= 1, s"marginMiningIvf: k must be >= 1, got $k")
    marginMiningFrom(
      ivfTopK(x, y, centroids, idCol, vecCol, k, centIdCol, centVecCol,
        probe = probe),
      ivfTopK(y, x, centroids, idCol, vecCol, k, centIdCol, centVecCol,
        probe = probe), threshold)
  }

  /** Margin + mutual-best selection over two precomputed ranked runs —
    * the candidate-generation-agnostic core of [[marginMining]] /
    * [[marginMiningIvf]]: `fwdRun` ranks each x's candidate ys,
    * `bwdRun` each y's candidate xs (both in the [[broadcastTopK]]
    * (query_id, corpus_id, score) shape). Each run feeds TWO consumers
    * (its side's k-NN average and the candidate union) — checkpointed
    * once, candidate-sized (the Connected.components small-frame
    * precedent). */
  def marginMiningFrom(fwdRun: DataFrame, bwdRun: DataFrame,
      threshold: Double): DataFrame = {
    val fwd = fwdRun
      .select(col("query_id").as("x_id"), col("corpus_id").as("y_id"),
        col("score"))
      .pinned
    val bwd = bwdRun
      .select(col("corpus_id").as("x_id"), col("query_id").as("y_id"),
        col("score"))
      .pinned
    def avgSide(pairs: DataFrame, side: String, out: String) = pairs
      .groupBy(col(side))
      .agg(((sum(round(col("score") * lit(1e6)).cast("long"))
        .cast("double") / lit(1e6)) /
        count(lit(1)).cast("double")).as(out))
    val ax = avgSide(fwd, "x_id", "ax")
    val ay = avgSide(bwd, "y_id", "ay")
    // candidates = union of both directions' pairs (dedup on the key):
    // a mutual best pair need not be in both top-k lists
    val cand = fwd.unionByName(bwd)
      .groupBy("x_id", "y_id").agg(max("score").as("score"))
      .join(ax, "x_id").join(ay, "y_id")
      .select(col("x_id"), col("y_id"), col("score"),
        // a margin is only meaningful over a POSITIVE-affinity
        // neighborhood: a zero denominator (all candidate cosines ≤ 0
        // after quantization) would raise under ANSI, and a negative
        // one would flip the ratio's sign and let junk pairs clear the
        // threshold — both get a null margin and drop at the filter
        when((col("ax") + col("ay")) / lit(2.0) > 0,
          round(col("score") / ((col("ax") + col("ay")) / lit(2.0)), 6))
          .as("margin"))
    val wx = Window.partitionBy("x_id")
      .orderBy(desc("margin"), asc("y_id"))
    val wy = Window.partitionBy("y_id")
      .orderBy(desc("margin"), asc("x_id"))
    cand
      .withColumn("__bx", row_number().over(wx))
      .withColumn("__by", row_number().over(wy))
      .filter(col("__bx") === 1 && col("__by") === 1 &&
        col("margin") >= threshold)
      .select("x_id", "y_id", "score", "margin")
  }

  /** Deterministic pseudo-random projection planes, computed driver-side:
    * plane p, dimension j (1-based) gets component
    * uint32(md5(p + "_" + j)[0,8)) / 2^32 - 0.5. The nPlanes × dim matrix
    * is tiny (a few KB) and ships to executors as literals — bucketing
    * then needs NO join and NO shuffle, just one projection over the
    * vectors. */
  def planeVectors(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes, dim) { (p, j0) =>
      val hex = md.digest(s"${p}_${j0 + 1}".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
    }
  }

  /** Sign-LSH bucket id for a vector column: bit p of the bucket = 1 iff
    * dot(vec, plane_p) > 0. Pure column expression — evaluated in a single
    * scan, no shuffle. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (row, p) =>
      val d = aggregate(
        zip_with(vec, typedlit(row.toSeq), (x, r) => x.cast("double") * r),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: only corpus vectors sharing the query's LSH bucket
    * are scored. One scan per side to bucket, one equi-join on bucket id —
    * the shape that replaces a full corpus scan per query at scale.
    *
    * `maxBucket` gates the CORPUS side: join cost per bucket is
    * |Q∩bucket| × |C∩bucket|, so a degenerate corpus bucket (thousands of
    * near-zero vectors all hashing together) expands quadratically when
    * the query set overlaps it. The gate is the same spill-safe window
    * count as [[nearDupPairsLsh]]'s — it runs BEFORE the join, shuffled on
    * bucket, and the join reuses that exchange. Dropped buckets are
    * observable via [[oversizedBuckets]] with the same `maxBucket`.
    * Returns (query_id, corpus_id, score, rank). */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 8, dim: Int = 64,
      maxBucket: Int = 100000): DataFrame = {
    val pl = planeVectors(nPlanes, dim)
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"), lshBucket(col(vecCol), pl).as("bucket"))
    val cb = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"), lshBucket(col(vecCol), pl).as("bucket"))
    val cbGated = cb
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("bucket")))
      .filter(col("__cnt") <= maxBucket).drop("__cnt")
    val scored = qb.join(cbGated, "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-style cluster assignment: every vector goes to its `probe`
    * nearest centroids (default 1) by cosine, ties on centroid id.
    * `centroids` is a SMALL (cent_id, vec) frame — broadcast, so
    * assignment is a broadcast-nested-loop over C centroids per row: the
    * standard IVF C×n assignment cost, no shuffle of the corpus. The
    * centroid set is caller-supplied ([[kmeansRefine]] produces one).
    * Returns df's (id, vec, norm) + `cluster` — `probe` rows per input
    * row when probe > 1. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      probe: Int = 1): DataFrame = {
    require(probe >= 1, "probe must be >= 1")
    val c = centroids.select(col(centIdCol).as("__cid"),
      col(centVecCol).as("__cv"), norm(col(centVecCol)).as("__cn"))
    val scored = df
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("nrm"))
      .crossJoin(broadcast(c))
      .select(col("id"), col("v"), col("nrm"), col("__cid"),
        round(dot(col("v"), col("__cv")) / (col("nrm") * col("__cn")), 6)
          .as("__cs"))
    val w = Window.partitionBy("id").orderBy(desc("__cs"), asc("__cid"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= probe)
      .select(col("id"), col("v"), col("nrm"), col("__cid").as("cluster"))
  }

  /** IVF approximate top-k (X3, the inverted-file counterpart of
    * [[annTopK]]): queries and corpus are both assigned to their nearest
    * centroid, and only same-cluster pairs are scored — an equi-join on
    * cluster id, the partition-pruning shape of a real IVF index. Recall
    * follows centroid quality and probe count (probe=1 here).
    *
    * `maxCluster` gates the CORPUS side against a degenerate centroid set
    * funneling the whole corpus into one cluster (join cost per cluster is
    * |Q∩cluster| × |C∩cluster|) — same spill-safe window-count shape as
    * [[annTopK]]'s gate; dropped clusters are observable via
    * [[oversizedClusters]].
    *
    * `probe` is the recall lever: each QUERY searches its `probe` nearest
    * clusters (corpus rows always live in exactly one), multiplying the
    * per-query candidate set without touching corpus layout — the
    * standard IVF nprobe knob. A query meets each corpus row at most
    * once, so no pair dedup is needed.
    * Returns (query_id, corpus_id, score, rank). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centIdCol: String, centVecCol: String,
      maxCluster: Int = 1000000, probe: Int = 1): DataFrame = {
    val qa = ivfAssign(queries, idCol, vecCol, centroids, centIdCol,
      centVecCol, probe).select(col("id").as("query_id"), col("v").as("qv"),
      col("nrm").as("qn"), col("cluster"))
    val ca = ivfAssign(corpus, idCol, vecCol, centroids, centIdCol,
      centVecCol).select(col("id").as("corpus_id"), col("v").as("cv"),
      col("nrm").as("cn"), col("cluster"))
    val caGated = ca
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("cluster")))
      .filter(col("__cnt") <= maxCluster).drop("__cnt")
    val scored = qa.join(caGated, "cluster")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Scale path for embedding near-dup: only pairs sharing a sign-LSH
    * bucket are scored. Recall trades off with `nPlanes` (more planes →
    * smaller buckets → fewer candidates).
    *
    * Single-pass plan (same shape as `Dedup.lshCandidates`): one scan
    * projects (id, vec, norm, bucket), ONE groupBy(bucket) collects each
    * bucket's rows sorted by id, and pairs expand in-bucket — versus a
    * bucket self-join, which would scan and re-bucket the corpus twice
    * (no exchange reuse across aliased subtrees) and expand degenerate
    * buckets unboundedly. `maxBucket` drops oversized buckets (e.g.
    * thousands of near-zero vectors landing in one bucket): those are
    * exact-dup territory, handled by `Dedup.exact` first in a real
    * pipeline. */
  def nearDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 8, dim: Int = 64,
      maxBucket: Int = 10000): DataFrame = {
    val pl = planeVectors(nPlanes, dim)
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nrm"), lshBucket(col(vecCol), pl).as("bucket"))
    // Size-gate BEFORE any bucket is materialized in an agg buffer: a
    // window count over the bucket partition is sort-based and SPILLS, so
    // a degenerate giant bucket streams through disk instead of OOMing one
    // executor's collect_list buffer. The window shuffles on bucket; the
    // groupBy below reuses that exchange (same key) — still ONE shuffle.
    val wb = Window.partitionBy("bucket")
    val gated = b.withColumn("cnt", count(lit(1)).over(wb))
      .filter(col("cnt") > 1 && col("cnt") <= maxBucket)
    // struct ordering is field-by-field and id is unique, so sort_array
    // orders each bucket by id — in-bucket (i < j) pairs give id_a < id_b
    val buckets = gated.groupBy("bucket")
      .agg(sort_array(collect_list(struct(col("id"), col("v"),
        col("nrm")))).as("rows"))
    buckets
      .select(explode(flatten(transform(col("rows"), (x, i) =>
        transform(slice(col("rows"), i + 2, size(col("rows"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        round(dot(col("p.a.v"), col("p.b.v"))
          / (col("p.a.nrm") * col("p.b.nrm")), 6).as("score"))
      // duplicate-id defense (the filter half of Dedup.lshCandidates'
      // defense): ids are documented unique, but a duplicated id puts
      // two identical rows in every bucket and the i<j expansion would
      // pair them (X, X). Unlike lshCandidates there is deliberately NO
      // distinct here — a pair sharing several buckets appears once per
      // shared bucket (the q33 oracle replays the same multiplicity);
      // dropDuplicates("id_a","id_b") downstream if unique edges are
      // needed, as semanticDedup does
      .filter(col("id_a") =!= col("id_b"))
      .filter(col("score") >= threshold)
  }

  /** Diagnostic companion to [[nearDupPairsLsh]]: the buckets its
    * `maxBucket` gate would DROP (bucket id + row count), so the recall
    * trade-off is observable instead of silent. Run it alongside the pair
    * query (same one-scan projection) when auditing a corpus; a non-empty
    * result means those ids should be routed through `Dedup.exact` first. */
  def oversizedBuckets(df: DataFrame, vecCol: String,
      nPlanes: Int = 8, dim: Int = 64, maxBucket: Int = 10000): DataFrame = {
    val pl = planeVectors(nPlanes, dim)
    df.select(lshBucket(col(vecCol), pl).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > maxBucket)
  }

  /** IVF centroid refinement: `iters` Lloyd iterations expressed as
    * DataFrame ops, so [[ivfTopK]] recall stops depending on caller-chosen
    * centroids (spherical k-means: cosine assignment + per-cluster mean;
    * cosine normalizes the un-normalized mean at use time).
    *
    * Per iteration: (1) assign every corpus vector to its nearest current
    * centroid — the [[ivfAssign]] broadcast shape, only the tiny centroid
    * set ships; (2) recompute each centroid as the element-wise mean of
    * its members via `posexplode` → groupBy(cluster, pos) — n×dim rows on
    * the shuffle, never a collect_list of whole vectors; (3) collect the
    * k×dim result (KB) to the driver for the next round's broadcast
    * literals. A centroid that loses all members keeps its previous
    * position.
    *
    * Determinism: the mean is computed as an EXACT decimal sum (order-
    * independent — float summation order varies run to run across
    * partitions) divided as double, cast back to float; with components
    * bounded by ±10^16−1 the decimal→double hop is exact, so centroids are
    * bit-stable and replayable in an oracle (same
    * `SUM(CAST(x AS DECIMAL(27,10)))::DOUBLE / COUNT(*)::DOUBLE` fold).
    * Returns a small (centIdCol, centVecCol) refined-centroid frame. */
  def kmeansRefine(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      iters: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var cents: Seq[(Long, Seq[Float])] = centroids
      .select(col(centIdCol).cast("long"), col(centVecCol).cast("array<float>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
      .sortBy(_._1)
    for (_ <- 1 to iters) {
      val centDf = cents.toDF("cid", "cv")
      val means = ivfAssign(df, idCol, vecCol, centDf, "cid", "cv")
        .select(col("cluster"),
          posexplode(col("v")).as(Seq("pos", "comp")))
        .groupBy("cluster", "pos")
        .agg((sum(col("comp").cast("decimal(27,10)")).cast("double") /
          count(lit(1)).cast("double")).cast("float").as("mu"))
        .groupBy("cluster")
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("mu")))),
          x => x.getField("mu")).as("cv"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      cents = cents.map { case (id, v) => (id, means.getOrElse(id, v)) }
    }
    cents.toDF(centIdCol, centVecCol)
  }

  /** Per-label embedding centroid (mean pooling): one row per label with
    * the element-wise mean vector and the member count — class
    * prototypes, cluster summaries, k-means initialization.
    *
    * Fully distributed, unlike [[kmeansRefine]] (whose centroid set is
    * driver-bound by design): posexplode → per-(label, dim) mean →
    * ordered re-assembly; two shuffles, keyed on (label, dim) then
    * label, no driver materialization, so labels can number in the
    * millions.
    *
    * The mean is a SORTED-FOLD in double (the q46 sorted-fold identity):
    * collect the group's components, sort, fold left from 0.0 — order-
    * independent across partitionings AND engine-bit-identical (every
    * engine performs the same IEEE addition sequence; decimal casts of
    * floats are NOT portable — Spark rounds the shortest decimal
    * representation where DuckDB rounds the binary value, so their last
    * ulps disagree). Per-group state is one float per member; for
    * billion-member labels trade exactness for a plain `sum(cast)` mean.
    */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String)
      : DataFrame =
    df.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "comp")))
      .groupBy("label", "pos")
      .agg(sort_array(collect_list(col("comp"))).as("__xs"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (aggregate(col("__xs"), lit(0.0), (a, x) => a + x.cast("double")) /
          col("n").cast("double")).cast("float").as("mu"),
        col("n"))
      .groupBy("label")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("mu")))),
        x => x.getField("mu")).as("centroid"),
        max(col("n")).as("n_vectors"), min(col("n")).as("__min_n"))
      // ragged vector lengths within a label would silently blend
      // different denominators per dimension (pos >= the shortest length
      // averages fewer members) — fail loudly instead. NULL/empty
      // embeddings contribute no rows at all (posexplode drops them) and
      // are excluded from both the mean and n_vectors by design.
      .select(col("label"), col("centroid"),
        when(col("__min_n") =!= col("n_vectors"), raise_error(concat(
          lit("labelCentroids: ragged embedding lengths within label "),
          col("label").cast("string"))))
          .otherwise(col("n_vectors")).as("n_vectors"))

  /** Recall@k of an approximate top-k result against the exact one — the
    * measurement that makes the probe/nPlanes/maxBucket trade-offs of
    * [[annTopK]]/[[ivfTopK]]/[[pqTopK]] tunable in production instead of
    * guessed (the observability companion to [[oversizedBuckets]]/
    * [[oversizedClusters]], which explain WHERE recall went).
    *
    * Both inputs use the engine's top-k shape (`query_id`, `corpus_id`,
    * `rank`, ...): `exact` from [[cosineTopK]] on a query SAMPLE (exact
    * truth over the full corpus is a per-query corpus scan — sample the
    * queries, not the corpus), `approx` from any approximate variant.
    * Per query: the fraction of the exact top-k the approximate search
    * found, counted by membership not rank agreement (rank permutations
    * within the top-k are not recall loss). Queries the approximate
    * search returned NOTHING for (e.g. their bucket was gated away)
    * score recall 0 rather than vanishing — those are exactly the rows
    * the diagnostic exists to surface.
    *
    * Scale shape: top-k results are k rows per query regardless of
    * corpus size, so both sides are query-keyed dwarf tables; one
    * semi-join + two aggregations, all keyed on query_id.
    * Output: (query_id, n_exact, n_hit, recall), one row per exact-side
    * query. */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = approx.filter(col("rank") <= k).select("query_id", "corpus_id")
    val e = exact.filter(col("rank") <= k).select("query_id", "corpus_id")
    val hits = e.join(a, Seq("query_id", "corpus_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    e.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact").cast("double")).as("recall"))
  }

  /** Diagnostic companion to [[ivfTopK]]: corpus clusters its `maxCluster`
    * gate would DROP (cluster id + row count) under the given centroid set,
    * so the recall trade-off is observable instead of silent. A non-empty
    * result means the centroids need refinement (see [[kmeansRefine]]) or
    * a higher `maxCluster`. */
  def oversizedClusters(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String,
      maxCluster: Int = 1000000): DataFrame =
    ivfAssign(corpus, idCol, vecCol, centroids, centIdCol, centVecCol)
      .groupBy("cluster").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > maxCluster)

  // ------------------------------------------------------ product quant

  /** PQ codebooks: `m` subspaces × `k` codewords × `subDim` components,
    * MD5-derived driver constants (same derivation family as
    * [[planeVectors]]): component j (1-based) of codeword ki in subspace
    * mi = uint32(md5("pq_mi_ki_j")[0,8)) / 2^32 − 0.5. A few KB — ships
    * to executors as literals, so encoding is a pure projection. Random
    * codebooks give working mechanics and a replayable oracle; per-
    * subspace k-means (same [[kmeansRefine]] shape on sliced vectors)
    * slots in for recall. */
  def pqCodebooks(m: Int = 4, k: Int = 16, subDim: Int = 16)
      : Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(m, k, subDim) { (mi, ki, j0) =>
      val hex = md.digest(s"pq_${mi}_${ki}_${j0 + 1}".getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
    }
  }

  /** Per-subspace distance-table columns `__s0..__s{m-1}` (each an array
    * of `k` distances in codeword order). One native
    * [[graft.functions.PqDists]] pass computes all m·k distances per row
    * (the composable form below builds a ~4096-node expression tree that
    * falls out of effective codegen — measured 8.8 s vs ~1 s for the
    * sf0.1 ADC query); the flat table is staged as an ATTRIBUTE and
    * sliced per subspace, so argmin/lookups never recompute it. */
  private[graft] def pqTables(df: DataFrame, idCol: String, vecCol: String,
      cbs: Array[Array[Array[Double]]]): DataFrame = {
    val k = cbs.head.length
    df.select(col(idCol).as("id"),
        graft.functions.PqDists.dists(col(vecCol), cbs).as("__d"))
      .select(col("id") +: cbs.indices.map(mi =>
        slice(col("__d"), mi * k + 1, k).as(s"__s$mi")).toIndexedSeq: _*)
  }

  /** Built-in-only reference form of [[pqTables]] (bit-identical output,
    * spec-pinned; kept as the semantics documentation the native
    * expression is checked against). */
  private[graft] def pqTablesHof(df: DataFrame, idCol: String,
      vecCol: String, cbs: Array[Array[Array[Double]]]): DataFrame = {
    def subDist(v: Column, mi: Int, cw: Array[Double]): Column =
      cw.zipWithIndex.map { case (c, j) =>
        val x = element_at(v, mi * cw.length + j + 1).cast("double") - lit(c)
        x * x
      }.reduce(_ + _)
    df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .select(col("id") +: cbs.zipWithIndex.map { case (cb, mi) =>
        array(cb.map(cw => subDist(col("__v"), mi, cw)).toIndexedSeq: _*)
          .as(s"__s$mi")
      }.toIndexedSeq: _*)
  }

  /** PQ encoding (X3, the compression half of IVF-PQ): each vector is
    * reduced to `m` codeword ids — `code_mi` = 1-based argmin of the
    * squared-L2 table (first position on ties, deterministic). THE scale
    * lever for ANN at 100 TB: downstream candidate scans carry `m` small
    * ints per row instead of `dim` floats (64 floats → 4 codes here), so
    * the re-scoring working set shrinks ~64× and the codes column fits
    * memory long after raw vectors don't. Returns (id, code0..code{m-1}).
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      cbs: Array[Array[Array[Double]]]): DataFrame =
    pqTables(df, idCol, vecCol, cbs)
      .select(col("id") +: cbs.indices.map { mi =>
        array_position(col(s"__s$mi"), array_min(col(s"__s$mi")))
          .cast("int").as(s"code$mi")
      }.toIndexedSeq: _*)

  /** Asymmetric-distance (ADC) approximate top-k over PQ codes: each
    * query keeps its FULL per-subspace distance tables (arrays of k
    * doubles, `m·k` values — KB per query), the corpus side carries only
    * its codes, and the approximate distance is `m` table lookups summed
    * in subspace order. Queries broadcast (small by contract, like
    * [[cosineTopK]]); the corpus is scanned once reading codes, never
    * vectors — compose with [[pqEncode]] output persisted as the
    * "index". Returns (query_id, corpus_id, adist, rank), distance
    * ascending. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int,
      cbs: Array[Array[Array[Double]]],
      excludeSelf: Boolean = true): DataFrame =
    adcTopK(
      pqQueryTables(queries, idCol, vecCol, cbs),
      pqEncode(corpus, idCol, vecCol, cbs)
        .withColumnRenamed("id", "corpus_id"),
      cbs.length, k, excludeSelf)

  /** ADC ranking over PRE-ENCODED corpus codes — the serving-time half
    * of [[pqTopK]], split out so a persisted code table (see
    * [[AnnIndex]]) can be queried without re-encoding the corpus:
    * `q` = (query_id, dt0..dt{m-1}) distance tables, `codes` =
    * (corpus_id, code0..code{m-1}). Queries broadcast; the codes scan
    * streams.
    *
    * `excludeSelf` drops pairs whose ids collide — right for the
    * dedup-style catalog queries where queries ARE corpus rows, wrong
    * for serving externally-generated query batches against a persisted
    * index, where an accidental id collision would silently drop a
    * corpus row ([[AnnIndex.query]] passes false). */
  private[graft] def adcTopK(q: DataFrame, codes: DataFrame, m: Int,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val approx = (0 until m)
      .map(mi => expr(s"element_at(dt$mi, code$mi)"))
      .reduce(_ + _)
    val paired = broadcast(q).crossJoin(codes)
    val scored = (if (excludeSelf)
        paired.filter(col("query_id") =!= col("corpus_id"))
      else paired)
      .select(col("query_id"), col("corpus_id"),
        round(approx, 6).as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(asc("adist"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Query-side distance tables keyed for [[adcTopK]]:
    * (query_id, dt0..dt{m-1}). */
  private[graft] def pqQueryTables(queries: DataFrame, idCol: String,
      vecCol: String, cbs: Array[Array[Array[Double]]]): DataFrame =
    pqTables(queries, idCol, vecCol, cbs)
      .select(col("id").as("query_id") +: cbs.indices.map(mi =>
        col(s"__s$mi").as(s"dt$mi")).toIndexedSeq: _*)

  /** Train PQ codebooks on the corpus (X3): per-subspace Lloyd
    * iterations — the [[kmeansRefine]] shape on sliced subvectors —
    * seeded from any codebook set (e.g. [[pqCodebooks]]'s MD5 constants).
    * Per iteration: encode under the current books (one [[PqDists]] pass
    * + argmin), then recompute each codeword as the element-wise mean of
    * its assigned subvectors via `posexplode` → groupBy(subspace,
    * codeword, component) — n·dim rows on the shuffle, decimal-exact
    * order-independent means (same determinism contract as
    * [[kmeansRefine]], so an oracle can replay the arithmetic). The
    * m·k·subDim result (KB) collects to the driver each round — it IS
    * the next round's literals. A codeword that loses all members keeps
    * its previous position. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
      seeds: Array[Array[Array[Double]]], iters: Int = 2)
      : Array[Array[Array[Double]]] = {
    val m = seeds.length
    val k = seeds.head.length
    val subDim = seeds.head.head.length
    var cbs = seeds
    for (_ <- 1 to iters) {
      val enc = pqEncode(df, idCol, vecCol, cbs)
      val vecs = df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      val codeOf = (1 until m).foldLeft(
        when(col("mi") === 0, col("code0"))) { (acc, mi) =>
        acc.when(col("mi") === mi, col(s"code$mi"))
      }
      val means = vecs.join(enc, "id")
        .select(col("id") +: (0 until m).map(mi => col(s"code$mi")) :+
          posexplode(col("__v")).as(Seq("pos", "x")): _*)
        .select((Seq(expr(s"pos div $subDim").cast("int").as("mi"),
          expr(s"(pos % $subDim) + 1").cast("int").as("jj"), col("x")) ++
          (0 until m).map(mi => col(s"code$mi"))): _*)
        .withColumn("code", codeOf)
        .groupBy("mi", "code", "jj")
        .agg((sum(col("x").cast("decimal(27,10)")).cast("double") /
          count(lit(1)).cast("double")).as("mu"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
        .toMap
      cbs = Array.tabulate(m, k, subDim) { (mi, ki, j0) =>
        means.getOrElse((mi, ki + 1, j0 + 1), cbs(mi)(ki)(j0))
      }
    }
    cbs
  }

  /** Total squared quantization error of `df` under codebooks `cbs`
    * (Σ over rows and subspaces of the min table entry) — the quantity
    * Lloyd training descends; exposed for training diagnostics/specs.
    * Decimal-exact sum so the number is run-stable. */
  def pqQuantizationError(df: DataFrame, idCol: String, vecCol: String,
      cbs: Array[Array[Array[Double]]]): Double =
    pqTables(df, idCol, vecCol, cbs)
      .select(cbs.indices.map(mi =>
        array_min(col(s"__s$mi")).as(s"e$mi")).toIndexedSeq: _*)
      .select(cbs.indices.map(mi =>
        sum(col(s"e$mi").cast("decimal(27,10)")).cast("double")
          .as(s"s$mi")).toIndexedSeq: _*)
      .head().toSeq.asInstanceOf[Seq[Double]].sum

  /** Two-stage ANN serving shape (X3): PQ/ADC proposes a `shortlist` of
    * candidates per query (cheap, approximate, codes-only corpus scan),
    * then ONLY those pairs are re-scored with exact cosine on raw
    * vectors and re-ranked. The expensive exact math runs on
    * |Q|·shortlist pairs, never |Q|·|C|; the vector fetch is one
    * equi-join on corpus id with the (small) candidate set broadcast, so
    * the corpus is scanned, never shuffled. Recall ≈ ADC recall at
    * `shortlist`, precision = exact. Returns
    * (query_id, corpus_id, score, rank), cosine descending. */
  def pqTopKReranked(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, cbs: Array[Array[Array[Double]]],
      shortlist: Int = 50): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    exactRerank(
      pqTopK(queries, corpus, idCol, vecCol, shortlist, cbs)
        .select(col("query_id"), col("corpus_id")),
      queries, corpus, idCol, vecCol, k)
  }

  /** The full serving composition (X3): IVF cluster pruning → PQ/ADC
    * shortlist → exact cosine re-rank. Every stage keeps its scale
    * shape: the corpus is pruned by cluster equi-join, scanned as codes
    * for the shortlist, and touched with real vectors only for the
    * |Q|·shortlist candidate pairs. */
  def ivfPqTopKReranked(queries: DataFrame, corpus: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, k: Int,
      centIdCol: String, centVecCol: String,
      cbs: Array[Array[Array[Double]]], probe: Int = 1,
      shortlist: Int = 50): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    exactRerank(
      ivfPqTopK(queries, corpus, centroids, idCol, vecCol, shortlist,
        centIdCol, centVecCol, cbs, probe)
        .select(col("query_id"), col("corpus_id")),
      queries, corpus, idCol, vecCol, k)
  }

  /** Shared exact-re-rank tail: score ONLY the shortlisted
    * (query_id, corpus_id) pairs with exact cosine on raw vectors and
    * re-rank. The candidate set (query-sized) broadcasts; the corpus is
    * scanned once for the vector fetch, never shuffled. */
  private[operators] def exactRerank(short: DataFrame, queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int)
      : DataFrame = {
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), norm(col(vecCol)).as("qn"))
    val cv = corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("cv"), norm(col(vecCol)).as("cn"))
    val cand = short.join(qv, "query_id") // both query-sized: stays small
    val scored = cv.join(broadcast(cand), "corpus_id")
      .select(col("query_id"), col("corpus_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Full IVF-PQ approximate top-k (X3): IVF cluster pruning composed
    * with PQ/ADC scoring — the architecture real billion-vector indexes
    * run. Both sides assign to centroids (queries fan to `probe`
    * clusters); the corpus carries only (cluster, codes); candidates are
    * the same-cluster pairs (equi-join on cluster — no corpus broadcast,
    * no cross join) scored by `m` ordered table lookups. The two scale
    * levers compose: candidate COUNT shrinks by the cluster fan-out,
    * candidate WIDTH shrinks from `dim` floats to `m` codes.
    * Returns (query_id, corpus_id, adist, rank), distance ascending. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centIdCol: String, centVecCol: String,
      cbs: Array[Array[Array[Double]]], probe: Int = 1,
      maxCluster: Int = 1000000): DataFrame = {
    val q = ivfQueryTables(queries, idCol, vecCol, centroids, centIdCol,
      centVecCol, cbs, probe)
    val ca = ivfAssign(corpus, idCol, vecCol, centroids, centIdCol,
      centVecCol).select(col("id"), col("cluster"))
    val ce = ca.join(pqEncode(corpus, idCol, vecCol, cbs), "id")
      .withColumnRenamed("id", "corpus_id")
    ivfAdcTopK(q, ce, cbs.length, k, excludeSelf = true, maxCluster)
  }

  /** Query-side IVF+ADC state: cluster fan-out (`probe` nearest
    * centroids) joined to per-subspace distance tables —
    * (query_id, cluster, dt0..dt{m-1}), `probe` rows per query. */
  private[graft] def ivfQueryTables(queries: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, centIdCol: String,
      centVecCol: String, cbs: Array[Array[Array[Double]]],
      probe: Int): DataFrame = {
    val qa = ivfAssign(queries, idCol, vecCol, centroids, centIdCol,
      centVecCol, probe).select(col("id"), col("cluster"))
    val qt = pqTables(queries, idCol, vecCol, cbs)
    qa.join(qt, "id")
      .select(col("id").as("query_id") +: col("cluster") +:
        cbs.indices.map(mi => col(s"__s$mi").as(s"dt$mi")).toIndexedSeq: _*)
  }

  /** Cluster-pruned ADC ranking over PRE-ENCODED, PRE-ASSIGNED corpus
    * codes — the serving-time half of [[ivfPqTopK]], split out so a
    * persisted (cluster, codes) table (see [[AnnIndex.buildIvf]]) can be
    * queried without re-assigning or re-encoding the corpus. `q` =
    * (query_id, cluster, dt0..dt{m-1}); `ce` = (corpus_id, cluster,
    * code0..code{m-1}). When `ce` scans a table bucketed on `cluster`,
    * BOTH the `maxCluster` gate's window and the candidate equi-join
    * ride the bucket layout — the corpus side never exchanges. */
  private[graft] def ivfAdcTopK(q: DataFrame, ce: DataFrame, m: Int,
      k: Int, excludeSelf: Boolean = true,
      maxCluster: Int = 1000000): DataFrame = {
    val gated = ce
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy("cluster")))
      .filter(col("__cnt") <= maxCluster).drop("__cnt")
    val approx = (0 until m)
      .map(mi => expr(s"element_at(dt$mi, code$mi)"))
      .reduce(_ + _)
    val paired = q.join(gated, "cluster")
    val scored = (if (excludeSelf)
        paired.filter(col("query_id") =!= col("corpus_id"))
      else paired)
      .select(col("query_id"), col("corpus_id"),
        round(approx, 6).as("adist"))
    val w = Window.partitionBy("query_id")
      .orderBy(asc("adist"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** X2 embedding near-dup: all pairs above a cosine threshold within a
    * (pre-bucketed or subset) DataFrame. Pairs are emitted once (a < b).
    *
    * This is the library's ONE cartesian primitive — O(n²) pairs, every
    * partition of one side replicated against the other. It exists for
    * small pre-bucketed subsets only (the correctness baseline the LSH
    * path is validated against), so the cartesian must be acknowledged
    * explicitly: calls without `assumeSmall = true` throw and point at
    * [[nearDupPairsLsh]], the one-scan bucket-gated form that survives a
    * full corpus. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, assumeSmall: Boolean = false): DataFrame = {
    require(assumeSmall,
      "nearDupPairs is a cartesian (all-pairs) primitive intended for " +
        "SMALL pre-bucketed subsets; pass assumeSmall = true to " +
        "acknowledge, or use nearDupPairsLsh for a full corpus")
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    // __cartesian_optin: the assumeSmall acknowledgment, made visible
    // to the analysis-time CartesianProductGuard (the one sanctioned
    // all-pairs shape passes `fail` mode; unacknowledged cartesians
    // still trip it) — projected away right after the join. The
    // broadcast() hint carries the SAME acknowledgment to the
    // executed-plan CartesianExecGuard (column pruning strips the
    // unreferenced stamp before planning; Join.hint is structural and
    // survives), and is the better plan outright for the small-subset
    // contract: the left side stays in place, the right replicates
    // once per executor instead of once per partition pair.
    val b = broadcast(
      df.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
        norm(col(vecCol)).as("nb"), lit(true).as("__cartesian_optin")))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          .as("score"))
      .filter(col("score") >= threshold)
  }

  /** X2/X3 semantic dedup (the SemDeDup move): drop all but one
    * representative of every group of embedding-near-duplicate documents.
    * Composition, per the prefer-composition order — every stage already
    * exists and carries its own scale pins:
    *
    *   1. candidate pairs from the bucket-gated LSH path
    *      ([[nearDupPairsLsh]]: one corpus scan, one exchange, cosine ≥
    *      `threshold` verified in-bucket);
    *   2. transitive closure over the PAIR graph only
    *      ([[Connected.components]] — iterations touch pairs, never the
    *      corpus);
    *   3. the member whose id equals its cluster label (= the cluster's
    *      min id) survives; vectors in no pair keep themselves.
    *
    * Returns the surviving rows of `df` with original columns. The final
    * join ships (id, cluster) pairs — bytes per duplicate, not vectors.
    * Known LSH caveat inherited from stage 1: near-dup pairs split
    * across every band bucket (probability falls geometrically with
    * `nPlanes`) are missed; raise recall with fewer planes or the
    * [[nearDupPairs]] exact baseline on small subsets.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 8, dim: Int = 64,
      maxBucket: Int = 10000): DataFrame = {
    Seq("__sd_id", "__sd_comp").foreach(c => require(
      !df.columns.contains(c),
      s"semanticDedup: input already has a '$c' column; rename it " +
        "(it collides with the internal cluster join)"))
    // ids must be integer-valued (the keepBest guard, for the same
    // reason): Connected.components casts ids to long, and a string/UUID
    // id would either throw an opaque CAST error (ANSI on) or null out
    // silently (ANSI off) — the null path would return the input
    // UNCHANGED, quietly retaining every duplicate
    locally {
      import org.apache.spark.sql.types.{ByteType, DecimalType,
        IntegerType, LongType, ShortType}
      // case-insensitive fallback like keepBest's guard: col() resolves
      // case-insensitively under the default spark.sql.caseSensitive
      val t = df.schema.fields.find(_.name == idCol)
        .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(idCol)))
        .getOrElse(throw new IllegalArgumentException(
          s"semanticDedup: column '$idCol' not found")).dataType
      val ok = t match {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType => d.scale == 0
        case _ => false
      }
      require(ok, s"semanticDedup requires an integer-valued id column; " +
        s"'$idCol' is ${t.simpleString}")
    }
    // unique edges: a pair sharing several buckets (or duplicated ids)
    // repeats in nearDupPairsLsh's output; the closure only needs each
    // edge once
    val pairs = nearDupPairsLsh(df, idCol, vecCol, threshold, nPlanes,
      dim, maxBucket).select("id_a", "id_b").dropDuplicates()
    val clusters = Connected.components(pairs, "id_a", "id_b")
      .select(col("id").as("__sd_id"), col("comp").as("__sd_comp"))
    df.join(clusters, df(idCol) === col("__sd_id"), "left")
      .filter(col("__sd_comp").isNull || col("__sd_comp") === df(idCol))
      .drop("__sd_id", "__sd_comp")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — THE
    * hybrid-retrieval combiner: merge two ranked SHORTLISTS (e.g.
    * [[graft.operators.Vocab.bm25TopK]] lexical + [[cosineTopK]]
    * dense) into one ranking by
    * `rrf(d) = Σ_list 1/(kRrf + rank_list(d))`. Rank-based, so the
    * lists' score scales never need calibrating — why RRF is the
    * production default for hybrid search. A doc absent from one list
    * contributes 0 for it (null rank columns preserved in the output
    * for provenance); ids must be UNIQUE within each list.
    *
    * Fully engine-exact, no rounding: each term is one IEEE division
    * and the two-term sum has a fixed evaluation order — a SQL oracle
    * reproduces every bit. Ties (same rrf) break on id.
    *
    * SHORTLIST contract, stated loudly: inputs are top-k lists (both
    * sides of a fusion are ≤ thousands of rows by construction — the
    * k of the rankers), so the full-outer join and the final
    * unpartitioned rank window are single-task by design. Do NOT feed
    * corpus-sized frames: rank whole corpora with the rankers
    * themselves, fuse only their heads. */
  def rrfFuse(a: DataFrame, idColA: String, rankColA: String,
      b: DataFrame, idColB: String, rankColB: String,
      kRrf: Int = 60): DataFrame = {
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val aa = a.select(col(idColA).as("doc_id"),
      col(rankColA).cast("long").as("rank_a"))
    val bb = b.select(col(idColB).as("doc_id"),
      col(rankColB).cast("long").as("rank_b"))
    aa.join(bb, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) /
          (lit(kRrf).cast("double") + col("rank_a").cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) /
          (lit(kRrf).cast("double") + col("rank_b").cast("double")),
          lit(0.0)))
      // the rank window orders on `__`-staged copies: the shortlist
      // contract makes it provably bounded, and the staging marks it
      // exempt from UnpartitionedWindowGuard's fail mode (the `__pid`
      // convention — see graft.plans.GraftExtensions)
      .withColumn("__rrf", col("rrf"))
      .withColumn("__fid", col("doc_id"))
      .withColumn("fused_rank", row_number().over(
        Window.orderBy(col("__rrf").desc, col("__fid"))).cast("long"))
      .drop("__rrf", "__fid")
  }

  /** Simplified-silhouette cluster quality (Hruschka et al. 2004's
    * centroid form of Rousseeuw 1987) — the "was this k any good?"
    * report for [[kmeansRefine]]/[[ivfAssign]] codebooks: per vector,
    * cohesion `a` = cosine distance to its OWN (nearest) centroid,
    * separation `b` = distance to the nearest OTHER centroid, and
    * `s = (b − a)/max(a, b)` (0 when both distances are 0); rolled up
    * per cluster. The full-pairwise silhouette is O(n²) — the
    * centroid form is the one that exists at corpus scale (O(n·C),
    * one broadcast sweep, corpus never exchanges for scoring; the
    * only shuffle is the per-cluster rollup).
    *
    * Parity: distances derive from the repo-standard round-6 cosines;
    * per-row s quantizes to a 1e-6 long BEFORE the per-cluster mean
    * (sum-of-doubles association order differs across engines;
    * integer sums cannot). Per-row top-2 centroids come from a
    * C-bounded sorted collect (C = |centroids|, a codebook — KB-sized
    * by contract), not a window.
    *
    * Output: (cluster, n, mean_silhouette), one row per non-empty
    * cluster. Null vectors are excluded. */
  def clusterQuality(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, centIdCol: String, centVecCol: String)
      : DataFrame = {
    val c = centroids.select(col(centIdCol).as("__cid"),
      col(centVecCol).as("__cv"), norm(col(centVecCol)).as("__cn"))
    // the per-row top-2 sort negates the centroid id as a tie-break;
    // a non-numeric id would cast string->double and surface as null
    // clusters — raise loudly instead
    require(c.schema("__cid").dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType],
      s"Similarity.clusterQuality: centroid ids must be numeric, got " +
        s"${c.schema("__cid").dataType.simpleString} for '$centIdCol'")
    val scored = df
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        norm(col(vecCol)).as("__n"))
      .crossJoin(broadcast(c))
      .select(col("__id"), col("__cid"),
        round(dot(col("__v"), col("__cv")) / (col("__n") * col("__cn")),
          6).as("__cs"))
    // per vector: the two best (cos desc, cid asc) centroids — a
    // C-bounded sorted collect per row, no window
    val top2 = scored.groupBy("__id")
      .agg(slice(sort_array(collect_list(
        struct(col("__cs"), (-col("__cid")).as("__neg"))), asc = false),
        1, 2).as("__t"), count(lit(1)).as("__c"))
      .select(
        when(col("__c") < 2, raise_error(lit(
          "clusterQuality: need at least 2 centroids")))
          .otherwise(-col("__t")(0)("__neg")).as("cluster"),
        (lit(1.0) - col("__t")(0)("__cs")).as("__a"),
        (lit(1.0) - col("__t")(1)("__cs")).as("__b"))
    val s = when(greatest(col("__a"), col("__b")) === 0.0, lit(0.0))
      .otherwise((col("__b") - col("__a")) /
        greatest(col("__a"), col("__b")))
    top2
      .select(col("cluster"),
        floor(s * lit(1e6) + lit(0.5)).cast("long").as("__sq"))
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        round(sum("__sq").cast("double") / count(lit(1)).cast("double")
          / lit(1e6), 6).as("mean_silhouette"))
  }
}
