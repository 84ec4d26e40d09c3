package graft.operators

import org.apache.spark.sql.DataFrame

/** Input-split fan-out ahead of CPU-dense per-row stages (broadcast
  * ranking sweeps, hash/regex projections, R-way replicate explodes).
  *
  * Spark pipelines a scan with everything up to the next exchange into
  * ONE stage, so when an input arrives under-split — a single parquet
  * row group yields exactly one non-empty scan task no matter what
  * `maxPartitionBytes` says — the whole per-row compute of that stage
  * serializes on one core. The fix is the round-robin repartition below,
  * fired ONLY when the scan yields fewer than half the cluster's slots:
  * at production split counts (thousands of row groups) the probe
  * no-ops plan-wise, and when it does fire it moves rows that are by
  * construction small (few splits ⇒ few hundred MB).
  *
  * The partition-count probe reads `df.rdd.getNumPartitions` — a
  * driver-side plan conversion, no job — NOT `inputFiles`: Spark splits
  * even a single (multi-row-group) file into ~defaultParallelism scan
  * partitions, and a file-count probe would bolt a full shuffle onto
  * every query at exactly the sizes where the scan is already parallel.
  *
  * Round-robin repartition is RESULT-SAFE here by the library's own
  * conventions: every cross-row float aggregation routes through
  * decimal/quantized-long sums (partition-order-independent) and every
  * ranking breaks ties deterministically, so only the physical row
  * placement changes. (`sortBeforeRepartition` stays on, so retried
  * tasks reproduce the same placement.) */
private[graft] object Fan {
  def out(df: DataFrame): DataFrame = {
    // streaming frames have no .rdd to probe (and micro-batch planning
    // re-splits per trigger anyway) — stream-composable operators
    // (semanticOverlap) must pass through untouched
    if (df.isStreaming) return df
    // the `.rdd` probe is only job-free for EXCHANGE-FREE plans: with
    // AQE on, Dataset.rdd on a plan containing shuffles materializes
    // every intermediate query stage eagerly at plan-construction time
    // (and the returned frame then re-executes them). Scan-shaped
    // inputs — projections/filters/generates over leaves, unions of
    // those — are the only frames this operator is FOR (an upstream
    // exchange already re-splits to the shuffle partition count), so
    // anything else passes through untouched.
    if (!scanShaped(df)) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // caveat: the probe counts SCAN partitions, not non-empty ones — a
    // single-row-group file that byte-range-splits into >= target/2
    // partitions still serializes on the one split that holds rows.
    // Fine for real parquet (row groups bound split usefulness) and for
    // the library's fixtures; don't reuse against pathological inputs.
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }

  /** True when the optimized plan cannot introduce an exchange: every
    * node is a leaf (parquet scan, pinned LogicalRDD, local relation)
    * or a narrow per-row operator over one. Conservative by
    * construction — an unlisted node type means "not scan-shaped". */
  private def scanShaped(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.optimizedPlan.collectFirst {
      case n if !(n.isInstanceOf[LeafNode] || n.isInstanceOf[Project] ||
        n.isInstanceOf[Filter] || n.isInstanceOf[Generate] ||
        n.isInstanceOf[Union] || n.isInstanceOf[Expand]) => n
    }.isEmpty
  }
}
