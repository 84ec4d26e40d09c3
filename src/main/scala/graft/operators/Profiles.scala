package graft.operators

import graft.operators.Checkpoints.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus profiling: the ANALYZE-style per-column summary every ingest
  * pipeline runs before trusting a new drop of data.
  *
  * One aggregation row computes every column's stats in a single scan
  * (count/nulls/distinct/min/max all map-side combinable), then the row
  * unpivots to one output row per column — no per-column scans, no
  * driver loops; the scan stays columnar and whole-stage codegen'd.
  * Values are rendered as strings so heterogeneous column types share
  * one output schema (the cross-engine-stable way: both engines CAST
  * the same typed value to VARCHAR).
  */
object Profiles {

  /** Returns (column, n_rows, n_nulls, n_distinct, min_val, max_val),
    * one row per profiled column, in `cols` order. */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** The 100 TB form of [[summarize]]: distinct counts via
    * `approx_count_distinct` (HyperLogLog++). Exact multi-column
    * DISTINCT aggregation plans an Expand — the input is replayed once
    * per profiled column (rows × columns on the shuffle) — while the
    * HLL sketch is one-pass, map-side combinable, and mergeable across
    * partitions, which is the only shape that profiles a 100 TB drop in
    * one scan. `rsd` is the target relative standard error (default
    * 0.05 like Spark's). No DuckDB oracle: sketch estimates are
    * engine-specific — the spec pins the estimate within tolerance of
    * exact instead. */
  def summarizeApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** MERGEABLE per-column profile state — the incremental form of
    * [[summarizeApprox]]: profile each snapshot/shard ONCE as it lands,
    * persist the KB-sized state, and fold states together instead of
    * ever rescanning old data (the ANALYZE-incrementally shape a
    * 100 TB lake needs; stats maintenance cost becomes O(new data)).
    *
    * State row per column: `column`, `n_rows`, `n_nulls`, `sketch`
    * (HLL registers — unions losslessly: no double counting across
    * overlapping states; a union-promoted sketch may ESTIMATE from a
    * different HLL mode than a directly-built one, so estimates agree
    * within sketch error, not bit-for-bit), `min_val`/`max_val` (the
    * ORIGINAL Spark string
    * renderings, compared numerically at merge time when `is_numeric`
    * — lexicographic string merge would order "9" > "10"), and
    * `is_numeric`. Values are sketched via their string rendering
    * (injective per column; Spark's HLL agg takes int/long/string/
    * binary only). One scan, one group-less aggregation, KB output. */
  def summarizeState(df: DataFrame, cols: Seq[String],
      lgK: Int = 12): DataFrame = {
    require(cols.nonEmpty, "at least one column required")
    val numeric = cols.map { c =>
      c -> df.schema(c).dataType.isInstanceOf[
        org.apache.spark.sql.types.NumericType]
    }.toMap
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        hll_sketch_agg(col(c).cast("string"), lit(lgK)).as(s"__sk_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"), col(s"__sk_$c").as("sketch"),
        col(s"__min_$c").as("min_val"), col(s"__max_$c").as("max_val"),
        lit(numeric(c)).as("is_numeric"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Fold any number of [[summarizeState]] outputs (unioned) into one
    * state: counts add, HLL registers union, min/max compare
    * numerically for numeric columns (`min_by`/`max_by` on the parsed
    * value — the stored strings stay the originals) and
    * lexicographically otherwise. Group key is the column name; the
    * whole operation touches only KB-sized state rows. */
  def mergeSummaryStates(states: DataFrame): DataFrame =
    states
      .groupBy(col("column"), col("is_numeric"))
      .agg(sum("n_rows").as("n_rows"), sum("n_nulls").as("n_nulls"),
        hll_union_agg(col("sketch"), lit(true)).as("sketch"),
        min_by(col("min_val"), col("min_val").try_cast("double"))
          .as("__nmin"),
        max_by(col("max_val"), col("max_val").try_cast("double"))
          .as("__nmax"),
        min(col("min_val")).as("__smin"), max(col("max_val")).as("__smax"))
      .select(col("column"), col("n_rows"), col("n_nulls"), col("sketch"),
        when(col("is_numeric"), col("__nmin")).otherwise(col("__smin"))
          .as("min_val"),
        when(col("is_numeric"), col("__nmax")).otherwise(col("__smax"))
          .as("max_val"),
        col("is_numeric"))

  /** [[summarizeApprox]]-shaped report from a (possibly merged) state:
    * `column`, `n_rows`, `n_nulls`, `n_distinct` (HLL estimate,
    * rounded to a count), `min_val`, `max_val`. */
  def summaryReport(state: DataFrame): DataFrame =
    state.select(col("column"), col("n_rows"), col("n_nulls"),
      round(hll_sketch_estimate(col("sketch"))).cast("long")
        .as("n_distinct"),
      col("min_val"), col("max_val"))
      .orderBy("column")

  /** Contiguous token packing (the pretraining-stream shape): documents
    * are packed into bins of `budget` tokens in id order WITHIN each of
    * `nShards` hash shards. Global greedy packing is inherently
    * sequential — per-shard packing is how it parallelizes at corpus
    * scale: the window runs per shard (one shuffle, `nShards`-way
    * parallel), and bin ids are (shard, bin) pairs. A doc that crosses
    * a bin boundary opens the next bin (assignment by exclusive running
    * total). */
  def packTokens(df: DataFrame, idCol: String, tokenCountCol: String,
      budget: Long, nShards: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shard = pmod(col(idCol), lit(nShards)).as("shard")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(tokenCountCol).as("__tok"), shard)
      .withColumn("__cum", sum(col("__tok")).over(w))
      .select(col(idCol), col("shard").cast("long").as("shard"),
        floor((col("__cum") - col("__tok")) / budget).as("bin"),
        col("__tok").cast("long").as("n_tokens"))
  }

  /** Heavy-hitter diagnostic for join/aggregation keys: the `k` most
    * frequent values of a key column with their counts and corpus
    * fraction — the measurement you take BEFORE picking a salt factor
    * for a skewed shuffle (q32's salted-aggregation path) or trusting
    * AQE's skew-join split. One aggregation (map-side combined) plus a
    * top-k sort of the distinct-key table, never the corpus.
    * Output: `key` (as string, null rendered distinct from "null" text
    * by Spark semantics), `n`, `fraction`. */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qn = "`" + keyCol.replace("`", "``") + "`"
    val counts = df.groupBy(col(qn).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    // total from the already-aggregated key table, NOT a second corpus
    // count: both branches share the identical scan→partial-agg exchange,
    // so ReuseExchange computes the corpus aggregation once (spec-pinned).
    val total = counts.agg(sum(col("n")).cast("double").as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("key"), col("n"),
        (col("n").cast("double") / col("__total")).as("fraction"))
      .orderBy(col("n").desc, col("key"))
      .limit(k)
  }

  /** Fixed-width histogram of a numeric column: ONE aggregation pass,
    * bin id computed row-locally (clamped to the edge bins, so outliers
    * land in the first/last bucket instead of vanishing), nulls AND NaNs
    * excluded (a NaN belongs to no bucket — and engines disagree on
    * where a clamped NaN would land: Spark's floor→long maps it to 0,
    * DuckDB's LEAST chain to the top bin). Requires a numeric column —
    * a non-numeric input errors loudly rather than cast-to-null-ing
    * every row into an empty histogram. The profiling companion to
    * [[summarize]] — distribution shape, not just min/max. Bins with no
    * rows are simply absent.
    * Output: `bin` (0-based), `bin_lo`/`bin_hi` (edges), `n`. */
  def histogram(df: DataFrame, colName: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val field = df.schema.fields.find(_.name == colName)
      .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(colName)))
      .getOrElse(throw new IllegalArgumentException(
        s"histogram: column '$colName' not found"))
    require(field.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"histogram requires a numeric column; '$colName' is " +
        field.dataType.simpleString)
    val width = (hi - lo) / bins
    val x = col("`" + field.name.replace("`", "``") + "`").cast("double")
    val bin = least(greatest(floor((x - lo) / width), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    df.filter(x.isNotNull && !isnan(x))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * width).as("bin_hi"),
        col("n"))
  }

  /** Per-key Wilson score interval for a pass rate (Wilson 1927) — the
    * "sort by lower bound" discipline for ranking keys by a proportion
    * when group sizes differ wildly (a source with 3/3 passing must NOT
    * outrank one with 980/1000 — the raw rate says it does, the Wilson
    * lower bound says otherwise; the standard fix for small-sample
    * rate rankings). One row per key: `n`, `k`, `rate`, `wilson_lo`,
    * `wilson_hi` (round-6), sorted by `wilson_lo` DESC — the ranking
    * order the interval exists for. Rows where `cond` is null count as
    * failures (not-true). Arithmetic is one fixed-order expression over
    * two integer aggregates + a hardware sqrt — engine-bit-identical.
    *
    * Scale: ONE keyed map-combined aggregation; the interval math runs
    * on the |keys|-row result. */
  def proportionBounds(df: DataFrame, keyCol: String, cond: Column,
      z: Double = 1.96): DataFrame = {
    require(z > 0, s"proportionBounds: z must be > 0, got $z")
    val agg = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        sum(when(cond, 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val half = (lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      z2 / (lit(4.0) * nD * nD))) / denom
    agg.select(col("key"), col("n"), col("k"),
        round(p, 6).as("rate"),
        round(center - half, 6).as("wilson_lo"),
        round(center + half, 6).as("wilson_hi"))
      .orderBy(col("wilson_lo").desc, col("key"))
  }

  /** Merge of [[histogram]] states — the incremental-ANALYZE companion
    * to [[mergeSummaryStates]] for DISTRIBUTION shape: profile each
    * snapshot/partition once, persist its KB-sized (bin, n) rows, and
    * fold states instead of rescanning history. Because the bins are
    * fixed-width with CALLER-pinned `[lo, hi)` edges (the [[psi]]
    * comparability argument), merging is exact integer addition — a
    * merged state is bit-identical to a direct [[histogram]] over the
    * concatenated data, which the merge spec pins. States built with
    * different edges must not merge; edges ride every row precisely so
    * this check needs no side channel, and a mixed-edge input raises.
    *
    * Scale: input is states (bins × snapshots rows, KB-sized), never
    * data; one |bins|-bounded aggregation. */
  def mergeHistogramStates(states: DataFrame): DataFrame = {
    val merged = states.groupBy("bin")
      .agg(min("bin_lo").as("bin_lo"), max("bin_lo").as("__lo2"),
        min("bin_hi").as("bin_hi"), max("bin_hi").as("__hi2"),
        sum("n").as("n"))
    merged.select(col("bin"),
        when(col("bin_lo") === col("__lo2") &&
          col("bin_hi") === col("__hi2"),
          lit(true)).otherwise(raise_error(concat(
            lit("mergeHistogramStates: bin "), col("bin").cast("string"),
            lit(" has conflicting edges across states — histograms "
              + "with different [lo, hi)/bins are not mergeable"))))
          .as("__edges_ok"),
        col("bin_lo"), col("bin_hi"), col("n"))
      .filter(col("__edges_ok"))
      .select("bin", "bin_lo", "bin_hi", "n")
  }

  /** Population Stability Index between two snapshots of a numeric
    * column — the standard drift alarm for a training-mix feature
    * (quality score, length, dup ratio) between crawls/builds:
    * `PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b)` with ε-floored shares so a
    * bin empty on one side stays finite (the conventional zero-share
    * substitution). Uses [[histogram]]'s fixed-width clamped binning
    * with CALLER-pinned `[lo, hi)` and bin count — fixed edges are what
    * make two snapshots comparable; deriving edges from either snapshot
    * would move the ruler with the drift it measures.
    *
    * Output: one row per bin, ALWAYS all `bins` of them — `(bin, n_a,
    * n_b, share_a, share_b, psi_term)`; sum `psi_term` for the headline
    * number (bins empty on both sides score exactly 0 after the shared
    * ε floor). The fixed spine is load-bearing for the empty-snapshot
    * contract: histograms of an empty snapshot have ZERO rows, so a
    * join of occupied bins would have nothing to evaluate the guard on
    * and a BOTH-empty comparison would silently read as "no drift" —
    * joining onto the literal bin spine guarantees the guard runs.
    * `psi_term` rounds to 6 (libm `ln`); shares are single exact
    * divisions. An EMPTY snapshot raises by name — its shares have no
    * meaning, and the ε floor would otherwise silently turn "no data"
    * into "maximal drift" (and Spark's null-skipping `greatest` would
    * mask the null total).
    *
    * Plan: each snapshot is scanned once into a bin-keyed count
    * aggregation; the spine join touches at most `bins` rows; totals
    * are broadcast 1-row aggregates. Nothing driver-side. */
  def psi(a: DataFrame, b: DataFrame, colName: String,
      lo: Double, hi: Double, bins: Int, eps: Double = 1e-6): DataFrame = {
    require(eps > 0 && eps < 1, s"eps must be in (0, 1), got $eps")
    val ha = histogram(a, colName, lo, hi, bins)
      .select(col("bin"), col("n").as("n_a"))
    val hb = histogram(b, colName, lo, hi, bins)
      .select(col("bin"), col("n").as("n_b"))
    val ta = ha.agg(sum(col("n_a")).as("__ta"))
    val tb = hb.agg(sum(col("n_b")).as("__tb"))
    def share(n: Column, total: Column, side: String): Column =
      when(total.isNull, raise_error(lit(
        s"psi: snapshot '$side' has no rows in [$lo, $hi) — its bin " +
          "shares are undefined and the eps floor would silently read " +
          "as maximal drift; check the snapshot and the bin range")))
        .otherwise(greatest(n.cast("double") / total.cast("double"),
          lit(eps)))
    a.sparkSession.range(bins).select(col("id").as("bin"))
      .join(ha, Seq("bin"), "left")
      .join(hb, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("bin"), col("n_a"), col("n_b"),
        share(col("n_a"), col("__ta"), "a").as("share_a"),
        share(col("n_b"), col("__tb"), "b").as("share_b"))
      .withColumn("psi_term", round(
        (col("share_a") - col("share_b")) *
          log(col("share_a") / col("share_b")), 6))
  }

  /** Pearson χ² homogeneity test between two snapshots of a CATEGORICAL
    * column — the drift check [[psi]]'s numeric bins can't express
    * (sources, languages, licenses, labels). One row per category with
    * both observed counts, both expected counts (row total × side total
    * / grand total) and the category's χ² contribution (both cells);
    * Σ contrib is the statistic on k−1 degrees of freedom. The
    * two-sample form keeps expecteds strictly positive for any category
    * present on EITHER side — a category that appears only in the new
    * snapshot (the classic silent-schema-drift bug) contributes its
    * full novelty instead of dividing by zero.
    *
    * Scale: one keyed aggregation per side (map-side combined) down to
    * category tables, a null-safe full outer join between those small
    * tables, totals broadcast as 1-row aggregates — the snapshots
    * themselves are never joined or re-scanned. Null categories count
    * as a category (a drifting null rate IS drift). Either side empty →
    * raise (the statistic is undefined; the [[psi]] guard precedent). */
  def chiSquaredDrift(ref: DataFrame, cur: DataFrame, colName: String)
      : DataFrame = {
    val r = ref.groupBy(col(colName).as("category"))
      .agg(count(lit(1)).as("n_ref"))
    val c = cur.groupBy(col(colName).as("category"))
      .agg(count(lit(1)).as("n_cur"))
    val j = r.join(c, r("category") <=> c("category"), "full_outer")
      .select(coalesce(r("category"), c("category")).as("category"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    def total(side: DataFrame, n: String, label: String): DataFrame =
      side.agg(coalesce(sum(col(n)),
        raise_error(lit(s"chiSquaredDrift: snapshot '$label' has no " +
          "rows — the statistic is undefined")).cast("long"))
        .as(s"__t$n"))
    def cell(obs: Column, exp: Column): Column =
      (obs.cast("double") - exp) * (obs.cast("double") - exp) / exp
    j.crossJoin(broadcast(total(r, "n_ref", "ref")))
      .crossJoin(broadcast(total(c, "n_cur", "cur")))
      .select(col("category"), col("n_ref"), col("n_cur"),
        ((col("n_ref") + col("n_cur")).cast("double") *
          col("__tn_ref") / (col("__tn_ref") + col("__tn_cur")))
          .as("__e_ref"),
        ((col("n_ref") + col("n_cur")).cast("double") *
          col("__tn_cur") / (col("__tn_ref") + col("__tn_cur")))
          .as("__e_cur"))
      .select(col("category"), col("n_ref"), col("n_cur"),
        round(col("__e_ref"), 6).as("exp_ref"),
        round(col("__e_cur"), 6).as("exp_cur"),
        round(cell(col("n_ref"), col("__e_ref")) +
          cell(col("n_cur"), col("__e_cur")), 6).as("contrib"))
      .orderBy(col("category").asc_nulls_first)
  }

  /** Corpus data card — the per-slice composition report every training
    * run publishes (Datasheets/Data Cards practice; the number tables
    * in the Pile/RedPajama/FineWeb papers): one row per cell of
    * `ROLLUP(dims)` — every prefix of the dimension list plus the
    * grand total, rollup cells carrying nulls in the rolled-up
    * columns — with document count, token sum, character sum, null-text
    * count, and mean tokens per doc.
    *
    * Exactness: counts and sums are integers; token sums accumulate as
    * longs (a 100 TB corpus is ~2.5e13 tokens, well inside int64);
    * `mean_tokens` is one double division rounded to 6. Null text
    * counts 0 tokens/chars and flags `n_null_text`.
    *
    * Scale shape: ONE aggregation — Spark expands rollup into grouping
    * sets inside a single exchange keyed on the grouping-set id +
    * dims, with map-side partial aggregation; no joins, no second
    * scan. */
  def dataCard(df: DataFrame, textCol: String, dims: Seq[String])
      : DataFrame = {
    require(dims.nonEmpty, "dataCard: at least one dimension required")
    val nTok = when(col(textCol).isNull, lit(0L))
      .otherwise(size(filter(TextAnalysis.tokens(col(textCol)),
        t => length(t) > 0)).cast("long"))
    df.select(dims.map(col) :+ nTok.as("__ntok") :+
        coalesce(length(col(textCol)).cast("long"), lit(0L)).as("__nch") :+
        when(col(textCol).isNull, 1L).otherwise(0L).as("__isnull"): _*)
      .rollup(dims.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__ntok")).as("n_tokens"),
        sum(col("__nch")).as("n_chars"),
        sum(col("__isnull")).as("n_null_text"),
        round(sum(col("__ntok")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_tokens"))
  }

  /** Materialized PACKED training sequences — [[packTokens]] assigns
    * bins; this emits the loader's actual input: per (shard, bin), the
    * member documents concatenated in id order with `sep` boundaries,
    * plus the doc-id list (the attention-reset / provenance sidecar a
    * packed-pretraining loader needs). Same greedy cumulative-budget
    * rule and the same shard-parallel window; each bin's collect is
    * BOUNDED by `budget` tokens (+ one overflowing doc), so the group
    * buffers stay loader-batch-sized no matter the corpus size.
    *
    * Null-text rows are DROPPED (a null contributes no tokens and
    * would otherwise poison its bin's concatenation — the dedup
    * family's null contract).
    *
    * Output: shard, bin, n_docs, n_tokens, doc_ids (id-ordered),
    * text (concatenated). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Long, nShards: Int = 8, sep: String = "\n\n")
      : DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.filter(col(textCol).isNotNull)
      .select(col(idCol), col(textCol),
        TextAnalysis.tokenCount(col(textCol)).as("__tok"),
        pmod(col(idCol), lit(nShards)).cast("long").as("shard"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .withColumn("bin",
        floor((col("__cum") - col("__tok")) / budget).cast("long"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(idCol)).as("doc_ids"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            s => s.getField(textCol)),
          sep).as("text"))
  }

  /** EQUI-DEPTH histogram: `buckets` bins of near-equal ROW count (the
    * first `N mod buckets` one row larger — exact NTILE semantics),
    * each reporting its value range and population. The quantile-sketch
    * alternative to [[histogram]]'s fixed edges when the distribution
    * is unknown or heavy-tailed — equal-width bins put 99% of a skewed
    * column in one bar; equal-depth bins ARE its quantiles.
    *
    * Built on [[Rank.globalNtile]] (`idCol` breaks ties, so bucket
    * membership is total-order deterministic): one range exchange for
    * the distributed rank, then one `bucket`-keyed aggregation of
    * (bucket, partial min/max/count) rows — no single-task window
    * anywhere. Null values are excluded (no rank order).
    *
    * Output: (bucket 1..buckets, lo, hi, n), bucket-ordered. */
  def equiDepthHistogram(df: DataFrame, colName: String, idCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val x = col(colName).cast("double")
    val staged = df.filter(x.isNotNull && !isnan(x))
      .select(x.as("__x"), col(idCol).as("__id"))
    Rank.globalNtile(staged,
        Seq(col("__x").asc, col("__id").asc), buckets, outCol = "bucket")
      .groupBy("bucket")
      .agg(min(col("__x")).as("lo"), max(col("__x")).as("hi"),
        count(lit(1)).as("n"))
      .orderBy("bucket")
  }

  /** Gini concentration of a key's row distribution (Gini 1912 via
    * the rank form of the Lorenz sum) — [[keySkew]]'s one-number
    * summary: 0 = perfectly balanced keys, →1 = one key holds
    * everything. THE pre-shuffle skew indicator to track per
    * snapshot: a rising Gini on (domain, shard, language) says the
    * salting/AQE knobs are about to matter before a straggler task
    * does. `G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)` over the per-key
    * counts xᵢ sorted ascending (count, key) — rank-form exact, all
    * INTEGER sums (the only float is the final division). Null with
    * fewer than 2 keys (no inequality to measure).
    *
    * Scale: one corpus aggregation to the |keys|-sized count table,
    * then [[graft.operators.Rank.globalRank]] over it (range
    * exchange, no single-task window — key tables at 100 TB are
    * domain-sized, i.e. big) and one fold. Null keys count as a key.
    *
    * Output one row: `n_keys, total, gini`. */
  def giniConcentration(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__x"))
    val ranked = Rank.globalRank(counts,
      Seq(col("__x").asc, col("__k").asc_nulls_first), outCol = "__i")
    val sums = ranked.agg(count(lit(1)).as("n_keys"),
      sum("__x").as("total"),
      sum(col("__i") * col("__x")).as("__ix"))
    sums.select(col("n_keys"), col("total"),
      when(col("n_keys") >= 2, round(
        (lit(2.0) * col("__ix").cast("double") -
          (col("n_keys") + 1).cast("double") *
            col("total").cast("double")) /
          (col("n_keys").cast("double") * col("total").cast("double")),
        6)).as("gini"))
  }

  /** Herfindahl–Hirschman concentration of a key's row distribution —
    * [[giniConcentration]]'s share-squared sibling (the antitrust
    * index, 1/k = perfectly balanced over k keys, 1 = one key holds
    * everything): `HHI = Σ (xᵢ/N)² = (Σ xᵢ²) / N²`, plus the
    * normalized form `(HHI − 1/k)/(1 − 1/k)` that is comparable
    * ACROSS snapshots with different key counts. Where Gini ranks
    * (and needs a global rank), HHI only SUMS — one keyed aggregation
    * and one fold, the cheapest concentration number there is; track
    * both and alert on either.
    *
    * Exactness: each xᵢ CASTS to DECIMAL(18,0) BEFORE squaring (a
    * long x² overflows past ~3·10⁹ rows per key; 18×18 multiplies
    * stay within the exact 37-digit width on every engine — the
    * LEAST-decimal memory) and Σ xᵢ² accumulates in decimal
    * (order-exact addition); the only float math is the final
    * fixed-order division — the decimal never reaches the wire (the
    * q05/dsum convention). Null keys count as a key. `hhi_norm` is
    * null with fewer than 2 keys (no inequality to measure).
    *
    * Output one row: `n_keys, total, hhi, hhi_norm` (round 6). */
  def hhi(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).cast("string").as("__k"))
      .agg(count(lit(1)).as("__x"))
    val folded = counts.agg(count(lit(1)).as("n_keys"),
      sum(col("__x")).as("total"),
      sum(col("__x").cast(DecimalType(18, 0)) *
        col("__x").cast(DecimalType(18, 0))).as("__sx2"))
    val n = col("total").cast("double")
    val h = col("__sx2").cast("double") / (n * n)
    val k = col("n_keys").cast("double")
    folded.select(col("n_keys"), col("total"),
      when(col("total") > 0L, round(h, 6)).as("hhi"),
      when(col("n_keys") >= 2L,
        round((h - lit(1.0) / k) / (lit(1.0) - lit(1.0) / k), 6))
        .as("hhi_norm"))
  }

  /** Per-key Shannon entropy of a categorical column — the diversity
    * number next to [[keySkew]]/[[giniConcentration]]: "how mixed are
    * this source's languages / this shard's labels?" in nats, 0 = one
    * category, ln(k) = uniform over k. A collapsing entropy on
    * (source → lang) is a feed going monolingual; a spiking one is a
    * mislabeled merge. NULL categories COUNT as a category (a
    * drifting null rate is signal — the [[chiSquaredDrift]]
    * convention).
    *
    * Exactness: each category's `(c/n)·ln(n/c)` term is one
    * fixed-order double expression QUANTIZED to a 1e-12 long (the
    * [[graft.operators.Graph.coOccurrence]] ln convention), so the
    * per-key sum is association-order-exact. One cell aggregation +
    * a key-total join (|keys|-sized, AQE-planned) + one keyed fold.
    * Output per key: `(key, n, n_cats, entropy)` (round 6). */
  def categoricalEntropy(df: DataFrame, keyCol: String, catCol: String)
      : DataFrame = {
    val cells = df
      .select(col(keyCol).cast("string").as("key"),
        col(catCol).cast("string").as("__c"))
      .groupBy("key", "__c").agg(count(lit(1)).as("__cn"))
    val totals = cells.groupBy("key")
      .agg(sum(col("__cn")).as("__n"), count(lit(1)).as("__k"))
    val term = floor(
      col("__cn").cast("double") / col("__n").cast("double") *
        log(col("__n").cast("double") / col("__cn").cast("double")) *
        lit(1e12) + lit(0.5))
    cells.join(totals, Seq("key"))
      .select(col("key"), col("__n"), col("__k"), term.as("__t"))
      .groupBy(col("key"))
      .agg(max(col("__n")).as("n"), max(col("__k")).as("n_cats"),
        round(sum(col("__t")).cast("double") / lit(1e12), 6)
          .as("entropy"))
  }

  /** Per-key PSI — [[psi]] sliced by language / source / shard, the
    * form a multilingual mix actually monitors (global PSI averages a
    * collapsing Thai distribution into noise): same CALLER-pinned
    * `[lo, hi)` ruler and clamped binning as [[histogram]], same
    * ε-floored shares, but one ROW PER KEY with the summed index.
    * Keys present in only ONE snapshot report a null `psi` with the
    * counts still populated (their shares are undefined; the ε floor
    * would silently read "key appeared" as "maximal drift" — report
    * the appearance through n_a/n_b instead, loudly).
    *
    * Exactness: per-(key, bin) terms are fixed-order double
    * expressions QUANTIZED to 1e-12 longs before the per-key sum
    * (unlike [[psi]], which emits per-bin rows and lets the caller
    * sum, this folds in-engine and must be association-order-exact).
    * Null values drop (as in [[histogram]]). Plan: one (key, bin)
    * aggregation per side, a keys×bins literal spine join, per-key
    * totals broadcast back, one keyed fold. */
  def psiByKey(a: DataFrame, b: DataFrame, keyCol: String,
      colName: String, lo: Double, hi: Double, bins: Int,
      eps: Double = 1e-6): DataFrame = {
    require(bins >= 1, s"psiByKey: bins must be >= 1, got $bins")
    require(hi > lo, s"psiByKey: need hi > lo, got [$lo, $hi)")
    require(eps > 0 && eps < 1, s"psiByKey: eps must be in (0, 1)")
    val width = (hi - lo) / bins
    def binned(df: DataFrame, cnt: String): DataFrame = {
      val x = col(colName).cast("double")
      val bin = least(greatest(floor((x - lo) / width), lit(0.0)),
        lit((bins - 1).toDouble)).cast("long")
      df.filter(x.isNotNull && !isnan(x))
        .select(col(keyCol).cast("string").as("key"), bin.as("__bin"))
        .groupBy("key", "__bin").agg(count(lit(1)).as(cnt))
    }
    val ha = binned(a, "__na")
    val hb = binned(b, "__nb")
    val keys = ha.select("key").unionAll(hb.select("key")).distinct()
    val spine = keys.crossJoin(
      broadcast(a.sparkSession.range(bins).select(col("id").as("__bin"))))
    val cells = spine
      .join(ha, Seq("key", "__bin"), "left")
      .join(hb, Seq("key", "__bin"), "left")
      .select(col("key"), col("__bin"),
        coalesce(col("__na"), lit(0L)).as("__na"),
        coalesce(col("__nb"), lit(0L)).as("__nb"))
    val totals = cells.groupBy("key")
      .agg(sum("__na").as("__ta"), sum("__nb").as("__tb"))
    def share(n: Column, tot: Column): Column =
      greatest(n.cast("double") / tot.cast("double"), lit(eps))
    val sa = share(col("__na"), col("__ta"))
    val sb = share(col("__nb"), col("__tb"))
    val termq = when(col("__ta") > 0L && col("__tb") > 0L,
      floor((sa - sb) * log(sa / sb) * lit(1e12) + lit(0.5)))
      .otherwise(lit(0L))
    cells.join(totals, Seq("key"))
      .select(col("key"), col("__ta"), col("__tb"), termq.as("__t"))
      .groupBy("key")
      .agg(max(col("__ta")).as("n_a"), max(col("__tb")).as("n_b"),
        when(max(col("__ta")) > 0L && max(col("__tb")) > 0L,
          round(sum(col("__t")).cast("double") / lit(1e12), 6))
          .as("psi"))
  }

  /** Cross-source QUANTILE NORMALIZATION — the batch-effect corrector
    * for scores that mean different things per source (classifier
    * calibrated on web text, run on code; length distributions that
    * differ by crawler): each row's value maps to the POOLED
    * distribution's value at the row's within-key percentile, so
    * "top 10% of its own source" means the same number everywhere
    * (the genomics quantile-normalization move, applied to mixture
    * scores). Per-key percentiles ride the exact balanced
    * [[graft.operators.Rank.perKeyPercentRank]] (no per-key window
    * cliff); the pooled lookup is `value at global rank
    * 1 + ⌊pct·(N−1) + 0.5⌋` via [[graft.operators.Rank.globalRank]]
    * and one rank-keyed join.
    *
    * Exactness: pct is the integer ratio (rank−1)/(n−1); the target
    * rank is one deterministic floor; the normalized value is a JOIN
    * result, not arithmetic — nothing to round. Input localCheckpoints
    * (the perKeyPercentRank three-scan contract + the pooled scan).
    *
    * Output: `(id, key, value, pct, normalized)`. */
  def quantileNormalize(df: DataFrame, keyCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val staged = df.select(col(keyCol).cast("string").as("__k"),
        col(idCol).as("__id"), col(valueCol).cast("double").as("__v"))
      .filter(col("__id").isNotNull && col("__v").isNotNull &&
        !isnan(col("__v")))
      .pinned
    val pct = Rank.perKeyPercentRank(staged, col("__k"), col("__id"),
      col("__v"), out = "__pct")
    val tot = staged.agg(count(lit(1)).as("__N"))
    val pooled = Rank.globalRank(
      staged.select(col("__v").as("__pv"), col("__id").as("__poolid")),
      Seq(col("__pv").asc, col("__poolid").asc), outCol = "__r")
      .select(col("__r"), col("__pv"))
    pct.crossJoin(broadcast(tot))
      .withColumn("__tr", floor(col("__pct") *
        (col("__N") - 1L).cast("double") + lit(0.5)).cast("long") + 1L)
      .join(pooled, col("__tr") === col("__r"))
      .select(col("__id").as("id"), col("__k").as("key"),
        col("__v").as("value"), col("__pct").as("pct"),
        col("__pv").as("normalized"))
  }

  /** Empirical-Bayes shrunk per-key success rates — the ranking
    * companion to [[proportionBounds]]: where Wilson reports an
    * interval, beta-binomial shrinkage reports a POINT estimate
    * pulled toward the global rate by `priorStrength` pseudo-counts
    * (`shrunk = (k + m·p₀)/(n + m)`, Morris 1983 parametric EB) — a
    * 2/2 domain stops outranking a 9 500/10 000 one, and mixture
    * recipes get one stable number per key instead of interval
    * gymnastics. Null `cond` counts as failure (the
    * [[proportionBounds]] convention: an unmeasurable success is not
    * a success).
    *
    * Exactness: per-key (n, k) are integers; p₀ and the shrunk rate
    * are fixed-order double expressions of integer aggregates
    * (round 6). One keyed aggregation + a broadcast 1-row total.
    * Output per key: `(key, n, k, rate, shrunk_rate)`. */
  def shrunkRates(df: DataFrame, keyCol: String, cond: Column,
      priorStrength: Double = 100.0): DataFrame = {
    require(priorStrength > 0.0,
      s"shrunkRates: priorStrength must be > 0, got $priorStrength")
    val base = df.select(col(keyCol).cast("string").as("key"),
      when(coalesce(cond.cast("boolean"), lit(false)), 1L)
        .otherwise(0L).as("__y"))
    val per = base.groupBy("key")
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("k"))
    val tot = per.agg(sum(col("n")).as("__tn"), sum(col("k")).as("__tk"))
    val p0 = col("__tk").cast("double") / col("__tn").cast("double")
    val m = lit(priorStrength)
    per.crossJoin(broadcast(tot))
      .select(col("key"), col("n"), col("k"),
        round(col("k").cast("double") / col("n").cast("double"), 6)
          .as("rate"),
        round((col("k").cast("double") + m * p0) /
          (col("n").cast("double") + m), 6).as("shrunk_rate"))
  }

  /** Vocabulary-richness report (the hapax/type-token battery of
    * classical corpus linguistics — Baayen 2001) — [[zipfFit]]'s
    * integer sibling: `types`, `tokens`, `hapax` (frequency-1 terms),
    * `dis` (frequency-2), the type-token ratio, and the hapax share
    * of the vocabulary. Natural corpora run ~40–60% hapax — a
    * collapsed hapax rate means template/boilerplate flooding, an
    * inflated one means encoding damage or ID-like token shatter
    * (each a different cleanup).
    *
    * One corpus-keyed term count (map-combined) folding to one row;
    * all integers until the two single-division ratios (round-6).
    * TTR is length-DEPENDENT — compare corpora at similar token
    * totals (the classical caveat, left to the caller). */
  def vocabRichness(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy("__t").agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("types"), sum("__c").as("tokens"),
        sum(when(col("__c") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("__c") === 2, 1L).otherwise(0L)).as("dis"))
      .select(col("types"), col("tokens"), col("hapax"), col("dis"),
        round(col("types").cast("double") / col("tokens").cast("double"),
          6).as("ttr"),
        round(col("hapax").cast("double") / col("types").cast("double"),
          6).as("hapax_rate"))

  /** Per-key trimmed mean (the robust-statistics workhorse — Tukey;
    * "average quality per source with the outliers cut off"): drop
    * each key's lowest and highest `trimBp` basis points by the
    * deterministic (value, id) order, mean what remains. The mean a
    * mixture recipe should consume when a source's score tail is
    * polluted (spam floods the bottom, mislabeled boilerplate the
    * top) — [[proportionBounds]] guards rates the same way.
    *
    * Rides [[graft.operators.Rank.perKeyPercentRank]] (the bucketed
    * two-phase exact rank — ONE corpus exchange, no per-key window),
    * then one keyed aggregation of `scale`-quantized longs: the mean
    * is a ratio of exact integers, engine-bit-identical. Built for
    * FEW, possibly enormous keys (sources, languages) — the
    * perKeyPercentRank contract.
    *
    * Keys whose rows are ALL trimmed (n ≤ 2·trim quantile mass, e.g.
    * single-row keys at any positive trim) report `n_kept = 0` and a
    * null mean — loud, not a fabricated value. Output: `(key, n,
    * n_kept, trimmed_mean)`. */
  def trimmedMeanByKey(df: DataFrame, keyCol: String, idCol: String,
      valueCol: String, trimBp: Int, scale: Int = 2): DataFrame = {
    require(trimBp >= 1 && trimBp <= 4999,
      s"trimmedMeanByKey: trimBp must be in [1, 4999], got $trimBp")
    require(scale >= 0 && scale <= 6,
      s"trimmedMeanByKey: scale must be in [0, 6], got $scale")
    val mult = math.pow(10.0, scale)
    val sd = col(valueCol).cast("double")
    val base = df
      .filter(col(idCol).isNotNull && sd.isNotNull && !isnan(sd))
      .select(col(keyCol).as("__key"), col(idCol).as("__vid"),
        sd.as("__v"))
    val t = trimBp.toDouble / 10000.0
    val kept = Rank.perKeyPercentRank(base, col("__key"), col("__vid"),
        col("__v"), out = "__pct")
      .filter(col("__pct") >= t && col("__pct") <= lit(1.0) - lit(t))
      .groupBy("__key")
      .agg(count(lit(1)).as("n_kept"),
        sum(floor(col("__v") * lit(mult) + lit(0.5)).cast("long"))
          .as("__s"))
    base.groupBy(col("__key")).agg(count(lit(1)).as("n"))
      .join(kept, Seq("__key"), "left")
      .select(col("__key").as("key"), col("n"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        round(col("__s").cast("double") / col("n_kept").cast("double") /
          lit(mult), 6).as("trimmed_mean"))
  }

  /** Zipf rank-frequency fit (Zipf 1949; Piantadosi 2014 review) —
    * the one-number corpus-health shape check: natural text follows
    * `freq ∝ rank^slope` with slope ≈ −1, so a log-log OLS slope far
    * from −1 (or a poor r²) flags template spam (flat head),
    * boilerplate floods (cliff), or encoding damage (shattered tail).
    * Fits `ln freq = slope·ln rank + intercept` over the `topN` most
    * frequent tokens (ties break on term).
    *
    * Scale: one corpus-keyed term count (map-combined — the
    * [[graft.operators.Vocab.vocabulary]] shuffle), then
    * `orderBy.limit(topN)` plans TakeOrderedAndProject (per-partition
    * heaps, no global sort); ranking and sums run on ≤topN rows.
    *
    * Parity: each ln quantizes to a 1e-6 long (a 1-ulp cross-engine
    * libm divergence flips a quantized value w.p. ~1e-10 — the
    * mixtureReweight discipline) and all OLS sums are LONG arithmetic
    * (Σxy ≲ 10¹⁶ at topN = 100 — far under overflow); slope/
    * intercept/r² are then fixed-order double expressions of those
    * longs. Output one row: `n_terms, slope, intercept, r2` (r2 null
    * when either variance is 0 — one term, or all-equal counts). */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 100)
      : DataFrame = {
    require(topN >= 2, s"zipfFit: topN must be >= 2, got $topN")
    val counts = df.filter(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy("__t").agg(count(lit(1)).as("__c"))
      .orderBy(desc("__c"), asc("__t"))
      .limit(topN)
    // ≤topN-row frame from here on; the rank window is topN-bounded
    val ranked = counts
      .withColumn("__pidZ", lit(1)) // guard-exempt: bounded by topN
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__pidZ").orderBy(desc("__c"), asc("__t")))
        .cast("long"))
    def q6(x: Column): Column =
      floor(x * lit(1e6) + lit(0.5)).cast("long")
    val xy = ranked.select(
      q6(log(col("__r").cast("double"))).as("__x"),
      q6(log(col("__c").cast("double"))).as("__y"))
    val sums = xy.agg(count(lit(1)).as("n"), sum("__x").as("sx"),
      sum("__y").as("sy"), sum(col("__x") * col("__y")).as("sxy"),
      sum(col("__x") * col("__x")).as("sxx"),
      sum(col("__y") * col("__y")).as("syy"))
    val covL = col("n") * col("sxy") - col("sx") * col("sy")
    val varxL = col("n") * col("sxx") - col("sx") * col("sx")
    val varyL = col("n") * col("syy") - col("sy") * col("sy")
    val slope = covL.cast("double") / varxL.cast("double")
    val intercept = (col("sy").cast("double") -
      slope * col("sx").cast("double")) / col("n").cast("double") /
      lit(1e6)
    sums.select(col("n").as("n_terms"),
      when(varxL =!= 0, round(slope, 6)).as("slope"),
      when(varxL =!= 0, round(intercept, 6)).as("intercept"),
      when(varxL =!= 0 && varyL =!= 0,
        round(covL.cast("double") * covL.cast("double") /
          (varxL.cast("double") * varyL.cast("double")), 6)).as("r2"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between snapshots `a` and
    * `b` of a numeric column — [[psi]]'s bin-free sibling: `D =
    * max_v |F_a(v) − F_b(v)|` over the OBSERVED values, the exact
    * supremum (empirical CDFs only move at observed points), no
    * binning decisions to pin. The drift alarm to use when no stable
    * `[lo, hi)` ruler exists yet (first snapshot of a new feature).
    *
    * Exactness: cumulative counts are INTEGER running sums via
    * [[graft.operators.Rank.globalRunningSum]] (range-decomposed — no
    * single-task window over the distinct-value table, which at
    * 100 TB is as big as the value domain); the only float math is
    * the per-value count/total division (single exact IEEE op) and
    * the final order-insensitive `max`. An EMPTY snapshot raises by
    * name, as in [[psi]] — a CDF over nothing is not "no drift".
    *
    * Plan: each snapshot scans once into a value-keyed count
    * aggregation, which then localCheckpoints EAGERLY (the pagerank
    * precedent): globalRunningSum evaluates its input in TWO branches
    * (offsets + local), so chaining two of them over live lineage
    * would replay the corpus scans 4× — the checkpoint pins the
    * corpus work to exactly one pass and each running sum to one
    * range exchange over the small domain table (soak-measured: 26
    * exchanges → single digits). Totals are broadcast 1-row
    * aggregates. Output: `(n_a, n_b, d_stat)`, d rounded to 6. */
  def ksTest(a: DataFrame, b: DataFrame, colName: String): DataFrame = {
    val va = a.select(col(colName).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val vb = b.select(col(colName).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val counts = va.select(col("__v"), lit(1L).as("__ca"), lit(0L).as("__cb"))
      .unionAll(vb.select(col("__v"), lit(0L).as("__ca"), lit(1L).as("__cb")))
      .groupBy("__v")
      .agg(sum("__ca").as("__ca"), sum("__cb").as("__cb"))
      .pinned
    val ordered = Seq(col("__v").asc, col("__ca").asc, col("__cb").asc)
    val runA = Rank.globalRunningSum(counts, ordered, "__ca", "__ra")
      .pinned
    val run = Rank.globalRunningSum(runA,
      ordered :+ col("__ra").asc, "__cb", "__rb")
    val totals = counts.agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
    def tot(c: Column, side: String): Column =
      when(c.isNull || c === 0L, raise_error(lit(
        s"ksTest: snapshot '$side' has no non-null rows in '$colName' " +
          "— an empty empirical CDF is undefined, not zero drift")))
        .otherwise(c)
    run.crossJoin(broadcast(totals))
      .select(col("__ra").cast("double") / tot(col("__na"), "a").cast("double")
          as "__fa",
        col("__rb").cast("double") / tot(col("__nb"), "b").cast("double")
          as "__fb",
        col("__na"), col("__nb"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        round(max(abs(col("__fa") - col("__fb"))), 6).as("d_stat"))
  }

  /** 1-D Wasserstein-1 (earth mover's) distance between snapshots of a
    * numeric column — [[ksTest]]'s integral sibling: `W₁ = ∫|F_a −
    * F_b| dv`, exactly `Σ_segments |F_a(vᵢ) − F_b(vᵢ)|·(vᵢ₊₁ − vᵢ)`
    * over consecutive observed values. Where KS reports the WORST
    * CDF gap (insensitive to how long it persists), W₁ reports the
    * total transport — the drift number that scales with how much
    * mass moved how far, the better alarm for slow meaning-shift in
    * a score distribution.
    *
    * Exactness: cumulative counts are INTEGER running sums (two
    * audited [[graft.operators.Rank.globalRunningSum]] passes, as in
    * [[ksTest]]); the segment index is a third const-1 running sum
    * (= a rank) so "next value" is a plain rank+1 self-join — no
    * unpartitioned LEAD over the value domain. Each segment's
    * |gap|·width is ONE fixed-order double expression QUANTIZED to a
    * long (`floor(t·1e6 + 0.5)` — capacity W₁ ≤ ~9·10¹² value units;
    * lower the quantization for wider domains), so the segment sum is
    * association-order-exact. Empty snapshots raise by name.
    *
    * Plan: one corpus scan per side into the value-keyed count table,
    * three range exchanges over that DOMAIN-sized table (each reuses
    * the audited primitive), one rank-keyed self-join, one fold. The
    * count table and EVERY running-sum output localCheckpoint eagerly
    * ([[ksTest]]'s reasoning, compounded: three chained two-branch
    * primitives plus a self-join would otherwise replay the corpus
    * scans 16× — soak-measured 109 exchanges / 65 s before the pin).
    * Output: `(n_a, n_b, w1)` (round 6). */
  def wasserstein1(a: DataFrame, b: DataFrame, colName: String)
      : DataFrame = {
    val va = a.select(col(colName).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val vb = b.select(col(colName).cast("double").as("__v"))
      .filter(col("__v").isNotNull && !isnan(col("__v")))
    val counts = va.select(col("__v"), lit(1L).as("__ca"), lit(0L).as("__cb"))
      .unionAll(vb.select(col("__v"), lit(0L).as("__ca"), lit(1L).as("__cb")))
      .groupBy("__v")
      .agg(sum("__ca").as("__ca"), sum("__cb").as("__cb"))
      .withColumn("__one", lit(1L))
      .pinned
    val o1 = Seq(col("__v").asc, col("__ca").asc, col("__cb").asc,
      col("__one").asc)
    val runA = Rank.globalRunningSum(counts, o1, "__ca", "__ra")
      .pinned
    val runB = Rank.globalRunningSum(runA, o1 :+ col("__ra").asc,
      "__cb", "__rb")
      .pinned
    val run = Rank.globalRunningSum(runB,
      o1 ++ Seq(col("__ra").asc, col("__rb").asc), "__one", "__i")
      .pinned
    val totals = counts.agg(sum("__ca").as("__na"), sum("__cb").as("__nb"))
    def tot(c: Column, side: String): Column =
      when(c.isNull || c === 0L, raise_error(lit(
        s"wasserstein1: snapshot '$side' has no non-null rows in " +
          s"'$colName' — an empty empirical CDF is undefined")))
        .otherwise(c)
    val nxt = run.select((col("__i") - 1L).as("__i"), col("__v").as("__vn"))
    val segs = run.join(nxt, "__i")
      .crossJoin(broadcast(totals))
      .select(floor(
        abs(col("__ra").cast("double") / col("__na").cast("double") -
          col("__rb").cast("double") / col("__nb").cast("double")) *
        (col("__vn") - col("__v")) * lit(1e6) + lit(0.5)).as("__t"))
    val w1 = segs.agg(
      round(coalesce(sum(col("__t")), lit(0L)).cast("double") / lit(1e6),
        6).as("w1"))
    // totals carry the raise: a single-distinct-value domain has zero
    // segments (W1 is genuinely 0 there), so the empty-side guard must
    // not depend on segments existing
    totals
      .select(tot(col("__na"), "a").as("n_a"),
        tot(col("__nb"), "b").as("n_b"))
      .crossJoin(broadcast(w1))
  }

  /** Cramér's V association between two categorical columns (Cramér
    * 1946) — "does source predict language?" as one number in [0, 1]:
    * `V = sqrt(χ² / (N·(min(r,c)−1)))` over the (a, b) contingency
    * table, 0 = independent, 1 = one determines the other. The
    * mix-design diagnostic next to [[keySkew]]: a high V between
    * `source` and `lang` (or shard and label) means stratifying on one
    * silently stratifies the other.
    *
    * Exactness: each cell's χ² term `(o − e)²/e` with `e = rᵢ·cⱼ/N`
    * is one fixed-order double expression per cell, then QUANTIZED to
    * longs (`floor(t·1e9 + 0.5)` — the [[graft.operators.Graph
    * .coOccurrence]] convention) so the cell sum is
    * association-order-exact on any engine. Capacity: χ² ≤ N·(m−1)
    * bounds the quantized sum at N ≈ 10⁹ per unit of V² — lower the
    * quantization for corpora past that. Null-category rows drop
    * (a missing label is [[summarize]]'s business, not association).
    * V is null when either side has < 2 categories (no association to
    * measure) — χ² is still reported (0 by construction there).
    *
    * Plan: one cell aggregation (map-side combined), then the FULL
    * r×c grid — the cross join of the two marginal tables — left-joins
    * the observed cells: a zero-observed cell still has e > 0 and its
    * (0 − e)²/e term is part of χ² (summing only observed cells
    * understates association exactly where it is strongest). Grid size
    * is r·c — categorical-scale by contract (languages × sources), not
    * corpus-scale. 1-row totals broadcast. No windows.
    * Output: `(n, categories_a, categories_b, chi2, cramers_v)`. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df
      .filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .select(col(aCol).cast("string").as("__a"),
        col(bCol).cast("string").as("__b"))
    val cells = base.groupBy("__a", "__b").agg(count(lit(1)).as("__o0"))
    val ra = base.groupBy("__a").agg(count(lit(1)).as("__ra"))
    val cb = base.groupBy("__b").agg(count(lit(1)).as("__cb"))
    val tot = base.agg(count(lit(1)).as("__n"),
      count_distinct(col("__a")).as("__ka"),
      count_distinct(col("__b")).as("__kb"))
    val e = col("__ra").cast("double") * col("__cb").cast("double") /
      col("__n").cast("double")
    val d = coalesce(col("__o0"), lit(0L)).cast("double") - e
    val term = floor(d * d / e * lit(1e9) + lit(0.5))
    val folded = ra.crossJoin(broadcast(cb))
      .join(cells, Seq("__a", "__b"), "left")
      .crossJoin(broadcast(tot))
      .agg(max(col("__n")).as("n"), max(col("__ka")).as("categories_a"),
        max(col("__kb")).as("categories_b"),
        sum(term).as("__chi9"))
    folded.select(
      coalesce(col("n"), lit(0L)).as("n"),
      coalesce(col("categories_a"), lit(0L)).as("categories_a"),
      coalesce(col("categories_b"), lit(0L)).as("categories_b"),
      round(coalesce(col("__chi9"), lit(0L)).cast("double") / lit(1e9), 6)
        .as("chi2"),
      when(col("categories_a") >= 2 && col("categories_b") >= 2,
        round(sqrt(col("__chi9").cast("double") / lit(1e9) /
          (col("n").cast("double") *
            (least(col("categories_a"), col("categories_b")) - lit(1L))
              .cast("double"))), 6)).as("cramers_v"))
  }
}
