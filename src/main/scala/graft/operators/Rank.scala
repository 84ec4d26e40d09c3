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

  /** Appends `outCol` = 1-based global rank of each row under the
    * total order `order` (include a unique tiebreaker!). One
    * corpus-sized exchange (range), reused across both branches; the
    * offsets join broadcasts a ≤`partitions`-row table. */
  def globalRank(df: DataFrame, order: Seq[Column],
      outCol: String = "rank", partitions: Int = 0): DataFrame = {
    require(order.nonEmpty, "Rank.globalRank: empty sort order")
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
