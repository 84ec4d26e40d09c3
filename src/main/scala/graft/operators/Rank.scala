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
}
