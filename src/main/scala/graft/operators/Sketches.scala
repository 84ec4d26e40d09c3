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

  /** Count-Min sketch cell for row `d` of the grid — `md5(salt|d|term)
    * mod width`, the engine-portable hash the samplers use, so an
    * external system (or a SQL oracle) rebuilds the exact same grid. */
  private def cmsCell(term: Column, d: Column, width: Int,
      salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit("|"), d.cast("string"),
      lit("|"), term.cast("string"))), 1, 8), 16, 10).cast("long") %
      width

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable
    * FREQUENCY estimates, the heavy-hitter companion to the HLL
    * cardinality sketch: a `depth × width` integer grid where each of
    * `depth` hash rows increments one cell per occurrence. Estimates
    * only ever OVERcount (other terms colliding into the cell), by at
    * most `2·N/width` with probability `1 − 2^−depth` — size the width
    * to the tolerable overcount, never to the term count.
    *
    * Deterministic md5 row-hashes (no seed state), so grids built by
    * different engines/shards are cell-for-cell identical — merging
    * shards is cell-wise addition ([[countMinMerge]]), the same
    * store-and-merge loop as the HLL path: 100 TB of history never
    * re-reads.
    *
    * Build shape: one corpus scan; the depth-way row fan-out happens in
    * the explode UNDER the aggregation, and the (d, cell)-keyed groupBy
    * partial-aggregates map-side, so the exchange ships at most
    * `depth × width` count rows per task — never corpus rows. Null
    * terms are excluded (no hash). Columns: `d`, `cell`, `cnt` (absent
    * cells are zero). */
  def countMinBuild(df: DataFrame, term: Column, depth: Int = 4,
      width: Int = 1024, salt: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"Sketches: depth must be in [1,16], got $depth")
    require(width >= 16,
      s"Sketches: width must be >= 16, got $width")
    df.filter(term.isNotNull).select(term.as("__t"))
      .select(col("__t"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .groupBy(col("d"), cmsCell(col("__t"), col("d"), width, salt)
        .as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise addition of two grids built with the SAME (depth, width,
    * salt) — the shard-merge path. Sketch-sized on both sides. */
  def countMinMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("d"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Frequency estimates for `probes`' `term` column from a
    * [[countMinBuild]] grid: `min` over the term's `depth` cells
    * (missing cell ⇒ the term never occurred ⇒ 0). The grid
    * broadcasts (≤ depth·width rows); the probe side never shuffles
    * corpus data. Columns: `term`, `estimate`. */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame,
      term: Column, depth: Int = 4, width: Int = 1024,
      salt: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"Sketches: depth must be in [1,16], got $depth")
    probes.filter(term.isNotNull).select(term.as("term")).distinct()
      .select(col("term"),
        explode(sequence(lit(0), lit(depth - 1))).as("__d"))
      .withColumn("__cell",
        cmsCell(col("term"), col("__d"), width, salt))
      .join(broadcast(sketch),
        col("__d") === col("d") && col("__cell") === col("cell"),
        "left")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("estimate"))
  }
}
