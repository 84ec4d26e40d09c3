package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scalable GLOBAL rank / ntile — the distributed answer to
  * `row_number().over(Window.orderBy(...))`, which Spark plans as a
  * SINGLE task holding the whole corpus (an unpartitioned window has
  * one partition). The reference exposes global ordering through
  * DuckDB's ORDER BY + window pipeline (`ref/src/QuackIO.jl:64`
  * query surface); at 100 TB the single-window form is the difference
  * between a TeraSort and a one-executor OOM.
  *
  * Decomposition (the classic sampled-range-sort rank):
  *
  *   1. `repartitionByRange(p, order)` — Spark's RangePartitioner
  *      samples the sort key to build p balanced, ORDERED ranges
  *      (skew-resistant by construction; the explicit `p` pins the
  *      shuffle as REPARTITION_BY_NUM so AQE never renumbers the
  *      partitions between branches).
  *   2. `sortWithinPartitions(order)` + `monotonically_increasing_id`
  *      — mid packs (partition index << 33) | local position, so ONE
  *      codegen'd projection yields both the partition id and the
  *      0-based local rank with zero additional exchange and no
  *      Window over corpus rows (each partition must hold < 2^33 rows
  *      — ~8.6 B rows per partition, far past where you'd add
  *      partitions anyway).
  *   3. Per-partition counts ride a second branch off the SAME range
  *      exchange (ReuseExchange dedups it — plan-pinned in ScaleSpec);
  *      the cumulative offsets of the ≤p-row count table come from a
  *      single-partition window over p rows and broadcast back.
  *   4. global rank = offset(partition) + local rank + 1.
  *
  * Because ranges are disjoint and ordered, the result is EXACTLY
  * `ROW_NUMBER() OVER (ORDER BY order...)` no matter where the sampled
  * boundaries fall — boundary placement moves rows between partitions
  * but never changes `offset + local`. Determinism therefore needs a
  * TOTAL order: pass a unique tiebreaker (e.g. the id) as the last
  * sort column, else equal-key rows get an arbitrary (though valid)
  * permutation of their rank range.
  *
  * Null sort keys follow the `Column`'s declared null ordering (Spark
  * default: NULLS FIRST for asc — mind DuckDB's NULLS LAST default
  * when writing oracles).
  */
object Rank {

  private val LocalBits = 33
  private val LocalMask = (1L << LocalBits) - 1

  private def guard(df: DataFrame, cols: Seq[String]): Unit =
    cols.foreach(c => require(!df.columns.contains(c),
      s"Rank: input already has a '$c' column; rename it"))

  /** The decomposition's correctness rests on its two branches reusing
    * ONE physical range exchange: each `repartitionByRange` SAMPLES its
    * own boundaries, so two independently-planned exchanges may split
    * the corpus differently and the per-partition offsets would then be
    * joined against the wrong partition ids. Reuse requires the
    * branches to canonicalize identically, which holds exactly when
    * column pruning cannot diverge — i.e. when every input column is
    * part of the sort order (the counts branch prunes to the range
    * keys; a payload column pruned from one branch but not the other
    * breaks the match). This check enforces that SLIM contract loudly
    * (best-effort name scan over the order expressions) instead of
    * risking silently shifted ranks at scale. */
  private def requireSlim(df: DataFrame, order: Seq[Column],
      fn: String): Unit = {
    val os = order.map(_.toString).mkString(" || ")
    val missing = df.columns.filterNot { c =>
      java.util.regex.Pattern
        .compile("(?<![A-Za-z0-9_])" + java.util.regex.Pattern.quote(c) +
          "(?![A-Za-z0-9_])")
        .matcher(os).find()
    }
    require(missing.isEmpty,
      s"Rank.$fn requires a SLIM frame — every column must appear in " +
        s"the sort order, but [${missing.mkString(", ")}] do not " +
        s"(order: $os). Project to the order columns (with a unique " +
        "id), rank, then join the payload back by id; for per-key " +
        "percentiles over wide rows use perKeyPercentRank, which has " +
        "no such constraint.")
  }

  /** Appends `outCol` = 1-based global rank of each row under the
    * total order `order` (include a unique tiebreaker!). One
    * corpus-sized exchange (range), reused across both branches; the
    * offsets join broadcasts a ≤`partitions`-row table. */
  def globalRank(df: DataFrame, order: Seq[Column],
      outCol: String = "rank", partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "Rank.globalRank: empty sort order")
    requireSlim(df, order, "globalRank")
    guard(df, Seq("__mid", "__pid", "__lrn", "__poff", outCol))
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, order: _*)
    // counts branch: no sort needed — partition membership alone
    // decides the offsets. Partial agg ships ≤p rows per task.
    val pc = ranged
      .groupBy(spark_partition_id().as("__pid"))
      .agg(count(lit(1)).as("__pn"))
    val wOff = Window.orderBy(col("__pid")) // ≤p rows: single task is fine
    val off = pc
      .withColumn("__poff", sum(col("__pn")).over(wOff) - col("__pn"))
      .select(col("__pid"), col("__poff"))
    val local = ranged.sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), LocalBits).cast("int"))
      .withColumn("__lrn", col("__mid").bitwiseAND(lit(LocalMask)))
    local.join(broadcast(off), "__pid")
      .withColumn(outCol, col("__poff") + col("__lrn") + lit(1L))
      .drop("__mid", "__pid", "__lrn", "__poff")
  }

  /** Appends `outCol` = the INCLUSIVE running sum of `weightCol` under
    * the total order `order` — [[globalRank]] generalized from row
    * counts to weights (the token-budget primitive: "how many TOKENS
    * precede this doc in quality order"). Same decomposition and same
    * SLIM contract: the weight column must appear in the sort order's
    * expression list (append it after the unique tiebreaker, where it
    * can never influence the ordering) so the offsets branch and the
    * local branch prune identically and reuse ONE sampled range
    * exchange (spec-pinned). Local running sums ride a window
    * PARTITIONED by the range partition id — bounded by partition
    * size, never one task; Catalyst cannot see that rows already sit
    * in their pid, so this costs one pid-keyed hash exchange on top
    * of the reused range exchange (evenly distributed — a second
    * shuffle, not a cliff). Integer weights stay integer end to end
    * (engine-exact). */
  def globalRunningSum(df: DataFrame, order: Seq[Column],
      weightCol: String, outCol: String = "running",
      partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "Rank.globalRunningSum: empty sort order")
    requireSlim(df, order, "globalRunningSum")
    guard(df, Seq("__mid", "__pid", "__lrs", "__poff", outCol))
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(p, order: _*)
    val pc = ranged
      .groupBy(spark_partition_id().as("__pid"))
      .agg(sum(col(weightCol)).as("__pw"))
    val wOff = Window.orderBy(col("__pid")) // ≤p rows: single task fine
    val off = pc
      .withColumn("__poff", sum(col("__pw")).over(wOff) - col("__pw"))
      .select(col("__pid"), col("__poff"))
    val local = ranged.sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), LocalBits).cast("int"))
    val wLoc = Window.partitionBy(col("__pid")).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local
      .withColumn("__lrs", sum(col(weightCol)).over(wLoc))
      .join(broadcast(off), "__pid")
      .withColumn(outCol, col("__poff") + col("__lrs"))
      .drop("__mid", "__pid", "__lrs", "__poff")
  }

  /** Appends `outCol` = SQL `NTILE(n) OVER (ORDER BY order...)`: rows
    * split into n stages of near-equal size, the first `N mod n`
    * stages one row larger — bit-identical to the standard-SQL window
    * form, computed from [[globalRank]] plus a one-row total-count
    * table that broadcasts (group-less aggregates partial-combine to
    * one row per task before the exchange). The curriculum /
    * stage-assignment primitive: stage training data by difficulty
    * quantile without a global window. */
  def globalNtile(df: DataFrame, order: Seq[Column], n: Int,
      outCol: String = "stage", partitions: Int = 0): DataFrame = {
    require(n >= 1, s"Rank.globalNtile: n must be >= 1, got $n")
    guard(df, Seq("__rk", "__tot", outCol))
    guard(df, Seq("__q0", "__rem", "__cut"))
    val ranked = globalRank(df, order, outCol = "__rk",
      partitions = partitions)
    val totals = df.groupBy().agg(count(lit(1)).as("__tot"))
    // NTILE arithmetic: q0 = N div n, rem = N mod n; the first rem
    // tiles hold q0+1 rows. All-long `div` integer math — bit-exact
    // at any corpus size (no double intermediates). The greatest(q0,
    // 1) denominator is unreachable when q0 = 0 (every rank then
    // satisfies __rk <= cut) but keeps the dead branch safe under
    // ANSI division semantics.
    ranked.crossJoin(broadcast(totals))
      .withColumn("__q0", expr(s"__tot div ${n.toLong}L"))
      .withColumn("__rem", col("__tot") % lit(n.toLong))
      .withColumn("__cut", col("__rem") * (col("__q0") + lit(1L)))
      .withColumn(outCol,
        when(col("__rk") <= col("__cut"),
          expr("(__rk - 1) div (__q0 + 1) + 1"))
        .otherwise(
          expr("__rem + (__rk - __cut - 1) div greatest(__q0, 1L) + 1"))
        .cast("int"))
      .drop("__rk", "__tot", "__q0", "__rem", "__cut")
  }

  /** EXACT per-key percent_rank WITHOUT a per-key window — bit-identical
    * to `percent_rank().over(Window.partitionBy(key)
    * .orderBy(score.asc_nulls_first, id.asc))` (the
    * [[graft.operators.Sampling.rankNormalize]] contract, which
    * requires a unique `id` tiebreak so rank == row_number), built as a
    * (key, bucket) TWO-PHASE rank so a dominant key never serializes
    * one window task (the CCNet per-language rank at 100×, where the
    * top language is half the corpus and AQE splits skewed joins but
    * never windows):
    *
    *   1. per-key `percentile_approx` score cutoffs (one sketch
    *      aggregation, map-side combined) are collected — a bounded
    *      |keys|·buckets table, the codebook/centroid precedent — and
    *      re-emitted as a LocalRelation both downstream branches share.
    *      The cutoffs are EXPLICIT LITERAL VALUES, so bucket assignment
    *      is a deterministic pure projection and correctness can never
    *      depend on two branches sampling the same partition
    *      boundaries (approximation only moves rows between buckets,
    *      never changes their rank).
    *   2. `__bkt` = #cutoffs strictly below the score — order-aligned:
    *      every row of bucket b sorts before every row of bucket b+1,
    *      so per-key ranks decompose exactly. Null scores bucket −1
    *      (the window form's NULLS FIRST), NaN into the last bucket
    *      (Spark sorts NaN greatest).
    *   3. `row_number` within (key, bucket) — the corpus window, now
    *      over ~n_k/buckets-row groups instead of whole keys.
    *   4. a per-(key, bucket) count aggregation (tiny, partial-agg
    *      map-side) yields each bucket's rank offset and the key total
    *      through PARTITIONED windows; the KB-sized offset table
    *      broadcasts back and pct = (offset + local − 1)/(n − 1), the
    *      same long-cast double division `percent_rank` evaluates —
    *      engine-bit-identical; a single-row key gets 0.0.
    *
    * Contracts: `score` must be numeric (or date/timestamp) — cutoffs
    * ride a numeric sketch; bucketing casts to double, which is safe
    * because a cast collision only merges buckets, never splits an
    * order-tie across two. Null keys form one group (null-safe joins
    * throughout). A pathological (key, score) tie spanning more than
    * `maxBucketRows` rows (a constant-score key: cutoffs collapse and
    * one bucket takes everything) RAISES loudly instead of silently
    * serializing — jitter or pre-split such scores upstream.
    *
    * Scale shape: the corpus crosses ONE exchange (the (key, bucket)
    * window hash); the cutoff and count aggregations ship only
    * map-side-combined partials; offsets broadcast. The input is
    * SCANNED three times (cutoffs, counts, rank) — persist or
    * `localCheckpoint` it first when its lineage is expensive (a
    * trained-score chain), exactly like [[graft.operators.Embeddings
    * .robustVectorGate]]'s multi-pass contract. Built for FEW,
    * possibly ENORMOUS keys (languages, sources, shards) — for
    * high-cardinality keys (per-domain, per-user) the cutoff collect
    * outgrows the driver and `rankNormalize`'s plain per-key window is
    * already balanced: use that instead. */
  def perKeyPercentRank(df: DataFrame, key: Column, id: Column,
      score: Column, out: String = "pct", buckets: Int = 64,
      accuracy: Int = 1000, maxBucketRows: Long = 100000000L)
      : DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(accuracy >= 100, s"accuracy must be >= 100, got $accuracy")
    require(maxBucketRows > 0, s"maxBucketRows must be > 0")
    guard(df, Seq("__kk", "__ck", "__cuts", "__bkt", "__jk", "__jb",
      "__pn", "__poff", "__n", "__lrn", out))
    val spark = df.sparkSession
    val sd = score.cast("double")
    // probs 1/B .. (B-1)/B — approximate tercile/percentile fences;
    // only BALANCE depends on their quality, never the ranks
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val cutAgg = df.groupBy(key.as("__ck"))
      .agg(percentile_approx(
        when(isnan(sd), lit(null)).otherwise(sd),
        array(probs.map(lit): _*), lit(accuracy)).as("__cuts"))
    // bounded collect: |keys| rows × (buckets-1) doubles — re-emitted
    // as a LocalRelation so every consumer sees the SAME literal fences
    val cutRows = cutAgg.collect()
    val cutsLocal = spark.createDataFrame(
      java.util.Arrays.asList(cutRows: _*), cutAgg.schema)
    val staged = df.withColumn("__kk", key)
      .join(broadcast(cutsLocal), col("__kk") <=> col("__ck"), "left")
      .withColumn("__bkt",
        when(score.isNull, lit(-1))
          .when(isnan(sd), lit(buckets - 1))
          .otherwise(size(filter(coalesce(col("__cuts"),
            array().cast("array<double>")), c => c < sd))))
      .drop("__ck", "__cuts")
    // per-(key, bucket) sizes: partial-aggregates map-side, so the
    // exchange under it ships counts, not corpus rows
    val bc = staged
      .groupBy(col("__kk").as("__jk"), col("__bkt").as("__jb"))
      .agg(count(lit(1)).as("__pn"))
    val wOff = Window.partitionBy(col("__jk")).orderBy(col("__jb"))
    val wTot = Window.partitionBy(col("__jk"))
    val offs = bc
      .withColumn("__poff", sum(col("__pn")).over(wOff) - col("__pn"))
      .withColumn("__n", sum(col("__pn")).over(wTot))
      // the guard rides __poff (which feeds pct) so column pruning can
      // never optimize the check away
      .withColumn("__poff", when(col("__pn") > maxBucketRows, raise_error(
        concat(lit("perKeyPercentRank: bucket "), col("__jb").cast("string"),
          lit(" of key '"), col("__jk").cast("string"), lit("' holds "),
          col("__pn").cast("string"),
          lit(s" rows, above maxBucketRows=$maxBucketRows — a giant " +
            "score tie cannot be split by cutoffs; jitter or pre-split " +
            "it upstream"))).cast("long")).otherwise(col("__poff")))
      .select(col("__jk"), col("__jb"), col("__poff"), col("__n"))
    val wLocal = Window.partitionBy(col("__kk"), col("__bkt"))
      .orderBy(score.asc_nulls_first, id.asc)
    staged
      .withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offs),
        (col("__kk") <=> col("__jk")) && col("__bkt") === col("__jb"))
      .withColumn(out,
        when(col("__n") <= 1L, lit(0.0))
          .otherwise(
            (col("__poff") + col("__lrn") - lit(1L)).cast("double") /
              (col("__n") - lit(1L)).cast("double")))
      .drop("__kk", "__bkt", "__jk", "__jb", "__pn", "__poff", "__n",
        "__lrn")
  }

  /** EXACT global quantiles at 100 TB. Spark's own exact `percentile`
    * aggregate buffers every value of the group in executor memory
    * (a counted hash map — a global quantile is a global buffer), and
    * `approx_percentile` is approximate by construction. This is the
    * third way: [[globalRank]] the values (one range exchange, no
    * buffering), then only the ≤2·|probs| rows sitting at the
    * interpolation positions survive a filter and meet in a KB-sized
    * aggregation.
    *
    * Linear interpolation (type 7, the SQL `PERCENTILE_CONT` /
    * DuckDB `quantile_cont` definition): `h = 1 + (N−1)·p`, result =
    * `v⌊h⌋ + (h−⌊h⌋)·(v⌈h⌉ − v⌊h⌋)`. The value AT a rank position is
    * tie-permutation-independent, so results are deterministic for
    * any unique `idCol` tiebreak. Nulls and NaN are excluded (no
    * order); an empty input returns zero rows.
    *
    * Output: (p, q) — one row per requested probability, rounded to
    * 6 places (engines may interpolate with differently-ordered IEEE
    * ops; at double precision the discrepancy is orders of magnitude
    * below the 6th decimal). */
  def exactQuantiles(df: DataFrame, valueCol: String, idCol: String,
      probs: Seq[Double], partitions: Int = 0): DataFrame = {
    require(probs.nonEmpty, "Rank.exactQuantiles: no probabilities")
    probs.foreach(p => require(p >= 0 && p <= 1,
      s"Rank.exactQuantiles: p must be in [0,1], got $p"))
    val x = col(valueCol).cast("double")
    val staged = df.filter(x.isNotNull && !isnan(x))
      .select(x.as("__x"), col(idCol).as("__id"))
    val ranked = globalRank(staged,
      Seq(col("__x").asc, col("__id").asc), outCol = "__rk",
      partitions = partitions)
    val totals = staged.groupBy().agg(count(lit(1)).as("__tot"))
    val probsDf = ranked.sparkSession
      .createDataFrame(probs.map(Tuple1(_)))
      .toDF("p")
    ranked.crossJoin(broadcast(totals))
      .crossJoin(broadcast(probsDf))
      .withColumn("__h",
        lit(1.0) + (col("__tot") - 1).cast("double") * col("p"))
      // only the two straddling rows per probability survive
      .filter(col("__rk") === floor(col("__h")).cast("long") ||
        col("__rk") === ceil(col("__h")).cast("long"))
      .groupBy("p")
      .agg(
        max(when(col("__rk") === floor(col("__h")).cast("long"),
          col("__x"))).as("__vlo"),
        max(when(col("__rk") === ceil(col("__h")).cast("long"),
          col("__x"))).as("__vhi"),
        first(col("__h")).as("__hh"))
      .select(col("p"),
        round(col("__vlo") + (col("__hh") - floor(col("__hh"))) *
          (col("__vhi") - col("__vlo")), 6).as("q"))
  }
}
