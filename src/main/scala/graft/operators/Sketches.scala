package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — incremental `COUNT(DISTINCT)` for a
  * corpus that arrives in shards. An exact distinct count re-shuffles
  * every historical shard on every update; a Datasketches HLL sketch
  * (Spark-native `hll_sketch_agg` family — codegen'd aggregates, no
  * UDFs) is a KB-sized binary that unions in microseconds, so the
  * store-and-merge loop is: sketch the new shard (one scan of NEW data
  * only), `hll_union` with the persisted sketch, write back. 100 TB of
  * history never re-reads.
  *
  * Estimates are DETERMINISTIC for a given input set (the sketch is a
  * pure fold — no sampling), and sketch-of-union ≡ union-of-sketches
  * at equal lgK (register-wise max), so shard boundaries never change
  * the answer — both spec-pinned. Relative error ≈ 1.04/√2^lgK
  * (~1.6% at the default lgK=12); very small sets sit in sparse mode
  * and estimate near-exactly (unions can promote out of sparse mode
  * earlier than single-shot sketches — same error bound either way).
  *
  * The reference reaches approximate distincts through DuckDB's
  * `approx_count_distinct` (same HLL family) — which cannot persist or
  * merge its state across calls; the sketch column is the scale story.
  */
object Sketches {

  /** Per-group HLL sketch of `value` — the persistable form. Columns:
    * `group`, `sketch` (binary). One group-keyed exchange of partial
    * sketches (KBs per group), never of rows. */
  def cardinalitySketch(df: DataFrame, group: Column, value: Column,
      lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 21, s"Sketches: lgK must be in [4,21], got $lgK")
    df.groupBy(group.as("group"))
      .agg(hll_sketch_agg(value, lit(lgK)).as("sketch"))
  }

  /** Merge two per-group sketch tables (e.g. the persisted store and a
    * new shard's sketches): groups present on either side survive,
    * shared groups union register-wise. Both sides are sketch-sized —
    * this never touches corpus rows. */
  def mergeSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("group"))
      .agg(hll_union_agg(col("sketch"), lit(true)).as("sketch"))

  /** Distinct-count estimates from a per-group sketch table. Columns:
    * `group`, `estimate`. */
  def estimate(sketches: DataFrame): DataFrame =
    sketches.select(col("group"),
      hll_sketch_estimate(col("sketch")).as("estimate"))

  /** One-pass audit row per group: the EXACT distinct count next to
    * whether the sketch estimate lands within `relErr` of it — the
    * oracle-checkable contract that the approximate path is safe to
    * serve. Columns: `group`, `n_exact`, `est_ok`. */
  def distinctAudit(df: DataFrame, group: Column, value: Column,
      lgK: Int = 12, relErr: Double = 0.05): DataFrame = {
    require(relErr > 0, s"Sketches: relErr must be positive, got $relErr")
    df.groupBy(group.as("group"))
      .agg(countDistinct(value).as("n_exact"),
        hll_sketch_estimate(hll_sketch_agg(value, lit(lgK))).as("__est"))
      .withColumn("est_ok",
        abs(col("__est") - col("n_exact")).cast("double") <=
          lit(relErr) * col("n_exact").cast("double"))
      .drop("__est")
  }
}
