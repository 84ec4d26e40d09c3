package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling (X5). `DataFrame.sample()` draws from a
  * partition-seeded RNG, so membership changes whenever the file layout,
  * split count, or cluster size changes — useless for reproducible
  * corpus construction. These samplers decide membership from a hash of
  * the row's own key (same family as [[TextAnalysis.splitBucket]]):
  * every engine, run, and cluster size keeps exactly the same rows, and
  * the decision is a pure projection — no shuffle, no RNG state, and
  * the filter sits directly on the scan.
  *
  * Rates are in basis points (1/10000) so the cut is integer-exact:
  * `bp = 2500` keeps a doc iff `md5(salt|key) mod 10000 < 2500` —
  * no float rounding at the boundary.
  *
  * NULL handling (deliberate, uniform across all three samplers): a row
  * with a NULL key is ALWAYS excluded — a null key has no hash, so it
  * has no reproducible draw; admitting it under any fixed rule would
  * put every null-key row on the same side of every cut, which is not a
  * sample. Callers sampling corpora with nullable ids should
  * `coalesce`/filter ids first. A NULL `weightBp` in [[weighted]] is
  * explicitly 0 bp (never kept); a NULL `stratum` in [[stratified]]
  * falls to `defaultBp` (a CASE branch on null is not-true).
  */
object Sampling {

  /** `md5(salt|key) mod 10000`, the uniform [0, 10000) draw.
    * NULL key → NULL draw → every comparison is not-true → excluded. */
  private[operators] def draw(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit("|"), key.cast("string"))),
      1, 8), 16, 10).cast("long") % 10000

  /** Uniform Bernoulli sample at `bp` basis points, keyed on `key`. */
  def bernoulli(df: DataFrame, key: Column, bp: Int,
      salt: String = "sample"): DataFrame = {
    require(bp >= 0 && bp <= 10000, s"bp must be in [0, 10000], got $bp")
    df.filter(draw(key, salt) < bp)
  }

  /** Weighted sample: per-ROW keep rate in basis points, from any column
    * expression (clamped to [0, 10000]). The quality-weighted resampling
    * move — upweight high-quality docs by keeping them at a higher rate —
    * with the same determinism guarantees as [[bernoulli]]: membership
    * depends only on (key, salt, weight), never on partitioning. */
  def weighted(df: DataFrame, key: Column, weightBp: Column,
      salt: String = "sample"): DataFrame =
    // coalesce, not null-propagate: a NULL weight means "never keep"
    // (0 bp) by contract, not "silently fall out of the filter"
    df.filter(draw(key, salt) <
      greatest(lit(0), least(lit(10000), coalesce(weightBp, lit(0)))))

  /** Stratified sample: per-stratum rates in basis points with a default
    * for unlisted strata. The rate lookup is a CASE chain over the
    * (small, driver-known) strata map — still a pure projection; the
    * sampled fraction of each stratum concentrates tightly around its
    * rate because draws are independent per key.
    *
    * This is the downsample-the-overrepresented-language/source move of
    * every corpus-mixing recipe, made reproducible.
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      ratesBp: Map[String, Int], defaultBp: Int,
      salt: String = "sample"): DataFrame = {
    require((defaultBp +: ratesBp.values.toSeq)
      .forall(v => v >= 0 && v <= 10000),
      "all rates must be in [0, 10000] basis points")
    // sorted for a deterministic CASE chain (Map order is not stable)
    val rate = ratesBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp): Column) {
      case (acc, (k, v)) => when(stratum === k, lit(v)).otherwise(acc)
    }
    df.filter(draw(key, salt) < rate)
  }

  /** Per-key quota cap: keep at most `n` rows per `key` — the
    * cap-docs-per-domain move that stops a handful of boilerplate-heavy
    * hosts from dominating a crawl corpus. Which rows survive is
    * deterministic: highest `score` first (NULLS LAST — an unscored doc
    * never beats a scored one), ties broken by `md5(salt|id)` so the
    * survivors are an unbiased fixed draw rather than
    * lowest-id-wins (which would systematically favor early crawl order).
    * Pass `score = lit(0)` for a pure hash-random cap.
    *
    * Plan: ROW_NUMBER over (key) ordered by (score DESC, hash) then
    * `rn <= n` — ONE shuffle keyed on `key`, and Spark ≥3.5 plans the
    * rank filter as a WindowGroupLimit: each map task keeps only its
    * local top-n per key BEFORE the exchange, so a million-doc host
    * ships ~n·tasks rows, not a million (spec-pinned in ScaleSpec).
    *
    * NULL keys form their own group (SQL window semantics) and are
    * capped together — "unknown domain" is itself a quota bucket.
    */
  def perKeyCap(df: DataFrame, key: Column, id: Column, n: Int,
      score: Column, salt: String = "cap"): DataFrame = {
    require(n > 0, s"per-key cap must be positive, got $n")
    require(!df.columns.contains("__rn"),
      "perKeyCap: input already has a '__rn' column; rename it " +
        "(it would be overwritten by the internal rank)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
      .orderBy(score.desc_nulls_last,
        md5(concat(lit(salt), lit("|"), id.cast("string"))))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Within-key percentile rank of a score — per-source score
    * normalization, the fix for gating on a GLOBAL score when raw
    * classifier/heuristic scores are not comparable across sources
    * (different length/style distributions over-prune some sources and
    * under-prune others; the per-source-percentile gate is the standard
    * curation move). `out` gets `percent_rank()` in [0, 1] within `key`,
    * ordered by (score ASC NULLS FIRST, id) — the id tiebreak makes
    * ranks unique, so the result is deterministic, and percent_rank is
    * a pure count ratio `(rank-1)/(n-1)` (no float summation), so it is
    * engine-bit-identical. Null scores take the LOWEST percentiles of
    * their key — but note a mostly-null key still ranks its null tail
    * arbitrarily high (80 nulls in 100 rows occupy percentiles up to
    * 79/99), so gate on scored rows only
    * ([[perKeyQuantileGate]] excludes them); a single-row key gets 0.0.
    *
    * Scale: ONE exchange keyed on `key` + a per-partition sort — the
    * per-source window shape ([[perKeyCap]]); a pathologically dominant
    * key serializes its own partition, which AQE skew handling does not
    * split for windows — cap such sources upstream. `maxKeyRows`
    * makes a key that slipped past the cap RAISE (with its name and
    * size) instead of silently serializing a multi-TB sort, and it
    * defaults ON at 10M rows — a composition that genuinely wants an
    * unbounded per-key window must say so with `maxKeyRows = 0`. The
    * guard is a count over the SAME key partitioning, so it adds no
    * exchange. This single-window form is the small-key DIAGNOSTIC:
    * for corpus-scale keys use [[graft.operators.Rank.perKeyPercentRank]]
    * (the bit-identical range-decomposed twin, no per-key window at
    * all); when the goal is gating rather than emitting ranks, route
    * through [[perKeyQuantileGateApprox]] (window-free) or the
    * GLOBAL-cutoff [[Pipelines.keepTopQuantile]]. */
  def rankNormalize(df: DataFrame, key: Column, id: Column, score: Column,
      out: String = "pct", maxKeyRows: Long = 10000000L): DataFrame = {
    require(maxKeyRows >= 0L,
      s"maxKeyRows must be >= 0 (0 disables the guard), got $maxKeyRows")
    require(!df.columns.contains(out),
      s"rankNormalize: df already has a '$out' column; rename it or " +
        "pass out=")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(key)
      .orderBy(score.asc_nulls_first, id.asc)
    val pct = percent_rank().over(w)
    if (maxKeyRows == 0L) df.withColumn(out, pct)
    else {
      val n = count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(key))
      df.withColumn(out, when(n > maxKeyRows, raise_error(concat(
        lit("rankNormalize: key '"), key.cast("string"), lit("' has "),
        n.cast("string"),
        lit(s" rows, above maxKeyRows=$maxKeyRows — a dominant key " +
          "serializes its own rank partition; cap or split it upstream"))))
        .otherwise(pct))
    }
  }

  /** Keep rows at or above the `minPct` within-key score percentile —
    * the per-source quality gate over [[rankNormalize]]. `minPct=0.75`
    * keeps each key's top quarter BY ITS OWN score distribution,
    * whatever the absolute scores are. Same plan shape (one keyed
    * exchange, the filter rides the window projection).
    *
    * NULL-scored rows are EXCLUDED before ranking and can never pass:
    * an unscored doc is unknown quality, not top quality — and ranking
    * nulls would also let a mostly-null key push its null tail above
    * the cutoff (80 nulls in 100 rows reach percentile 79/99) while
    * skewing the scored rows' own percentiles. */
  def perKeyQuantileGate(df: DataFrame, key: Column, id: Column,
      score: Column, minPct: Double): DataFrame = {
    require(minPct > 0.0 && minPct < 1.0,
      s"minPct must be in (0, 1), got $minPct")
    require(!df.columns.contains("__pct"),
      "perKeyQuantileGate: input already has a '__pct' column; rename it")
    rankNormalize(df.filter(score.isNotNull), key, id, score, "__pct")
      .filter(col("__pct") >= minPct).drop("__pct")
  }

  /** Window-free per-source quality gate — the 100-TB form of
    * [[perKeyQuantileGate]]. Instead of exact-ranking every key's
    * partition (one task per source — a multi-TB sort when a few
    * sources dominate), it measures each key's `minPct` score quantile
    * with `percentile_approx` (a mergeable sketch: the groupBy
    * partial-aggregates map-side, so the exchange carries sketches,
    * not rows), broadcasts the per-key cutoff table back, and keeps
    * rows with `score >= cutoff`. No Window node anywhere
    * (spec-pinned): one aggregation pass + one broadcast-joined
    * filtered scan, fully parallel within every key.
    *
    * Semantics vs the exact gate: both keep a top segment of each
    * key's score distribution; they can disagree only at the cutoff
    * boundary (percent_rank gates on `(rank-1)/(n-1)`, the sketch on
    * an inverse-CDF value, ± sketch error ~ n/accuracy ranks), and
    * ties AT the approximate cutoff are all kept — per-key kept
    * counts land within a boundary-tie band of exact (spec-pinned on
    * a multi-source fixture). NULL-scored rows are excluded (the
    * exact gate's contract); a NULL key is its own group and gates
    * against its own cutoff (null-safe join), matching SQL window
    * semantics in the exact form. */
  def perKeyQuantileGateApprox(df: DataFrame, key: Column, score: Column,
      minPct: Double, accuracy: Int = 10000): DataFrame = {
    require(minPct > 0.0 && minPct < 1.0,
      s"minPct must be in (0, 1), got $minPct")
    require(accuracy >= 100,
      s"accuracy must be >= 100 sketch buckets, got $accuracy")
    Seq("__gk", "__gkk", "__cut").foreach(c =>
      require(!df.columns.contains(c),
        s"perKeyQuantileGateApprox: input already has a '$c' column; " +
          "rename it"))
    val scored = df.filter(score.isNotNull)
    val cuts = scored.groupBy(key.as("__gk"))
      .agg(percentile_approx(score.cast("double"), lit(minPct),
        lit(accuracy)).as("__cut"))
    // key staged as a left-side column: `cuts` derives from `scored`
    // (self-lineage — the temperatureMixture convention); <=> keeps
    // the null-key group gating against its own cutoff
    scored.withColumn("__gkk", key)
      .join(broadcast(cuts), col("__gkk") <=> col("__gk"))
      .filter(score.cast("double") >= col("__cut"))
      .drop("__gkk", "__gk", "__cut")
  }

  /** Exact-count proportional sample: exactly `totalN` rows (when the
    * corpus has at least that many), apportioned across keys by the
    * largest-remainder method and drawn deterministically within each
    * key in hash order. [[bernoulli]]/[[weighted]] hit their target only
    * IN EXPECTATION; when the contract is "ship exactly 1M docs, source
    * proportions preserved", apportionment + per-key hash-rank is the
    * deterministic equivalent.
    *
    * `quota_k = floor(totalN·n_k/N)`, then +1 for the `totalN − Σ floor`
    * keys with the largest remainders (ties: key order). All quota
    * arithmetic is decimal-exact (no float), so membership is
    * engine-bit-identical. With `totalN ≤ N` every quota is feasible;
    * with `totalN > N` quotas cap at `n_k` and the whole corpus comes
    * back. Rows rank within their key by `md5(salt|id)` (id tiebreak) —
    * the partitioning-independent draw the other samplers use. Null
    * keys/ids are excluded (no reproducible draw — the samplers'
    * shared contract).
    *
    * Scale: one count aggregation keyed on `key`; quota derivation runs
    * a GLOBAL rank over the per-key table — one task over one row per
    * key, fine for source/domain cardinalities (use [[bernoulli]] for
    * per-URL keys). The corpus-side rank is a TWO-PHASE rank, not a
    * per-key window: rows bucket by the first `bucketChars` hex chars
    * of their own md5 draw (a PREFIX of the sort key, so bucket order
    * is draw order and the global per-key rank decomposes exactly),
    * rank locally within (key, bucket), and add the per-bucket offset
    * — a `16^bucketChars`-row-per-key count table broadcast back. A
    * dominant source therefore sorts as `16^bucketChars` independent
    * tasks instead of one; the corpus crosses ONE exchange (keyed on
    * (key, bucket)), the count/offset tables are KB-sized, and both
    * joins broadcast. Ranks are identical to the single-window form
    * for every `bucketChars` (spec-pinned), so membership never
    * depends on the knob; raise it when a single source exceeds what
    * `16^bucketChars` tasks can sort comfortably. */
  def apportionedSample(df: DataFrame, key: Column, id: Column,
      totalN: Long, salt: String = "apportion",
      bucketChars: Int = 2): DataFrame = {
    require(totalN > 0, s"totalN must be positive, got $totalN")
    require(bucketChars >= 1 && bucketChars <= 8,
      s"bucketChars must be in [1, 8], got $bucketChars")
    Seq("__rn", "__quota", "__k", "__kk", "__draw", "__bkt", "__lrn",
      "__ck", "__cb", "__bn", "__off").foreach(c =>
      require(!df.columns.contains(c),
        s"apportionedSample: df already has a '$c' column; rename it"))
    val kept = df.filter(key.isNotNull && id.isNotNull)
    val counts = kept.groupBy(key.as("__k")).agg(count(lit(1)).as("__n"))
    // all quota arithmetic rides windows over the (tiny) per-key table —
    // no self-referencing joins, one single-partition pass
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wTop = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col("__k").asc)
    val quotas = counts
      .withColumn("__tot", sum(col("__n")).over(wAll).cast("decimal(38,0)"))
      .withColumn("__prod",
        lit(totalN).cast("decimal(38,0)") * col("__n").cast("decimal(38,0)"))
      // pmod first, division second: Spark decimal division returns
      // decimal(38,6) rounded HALF_UP, so floor(__prod / __tot) would
      // round a quotient with fractional part >= 0.9999995 UP to base+1
      // (reachable once a corpus passes ~2M rows), producing a negative
      // remainder and a quota sum above totalN. pmod on decimal(38,0)
      // is exact, and dividing the exact multiple (__prod - __rem) is
      // never rounded (its fractional part is zero by construction)
      .withColumn("__rem", pmod(col("__prod"), col("__tot")).cast("long"))
      .withColumn("__base",
        ((col("__prod") - col("__rem").cast("decimal(38,0)")) / col("__tot"))
          .cast("long"))
      .withColumn("__sb", sum(col("__base")).over(wAll))
      .withColumn("__rk", row_number().over(wTop))
      .withColumn("__quota", least(
        col("__base") + when(col("__rk") <= lit(totalN) - col("__sb"),
          lit(1L)).otherwise(lit(0L)),
        col("__n")))
      .select(col("__k"), col("__quota"))
    // the key is STAGED as a left-side column before the joins: `quotas`
    // and `offsets` both derive from `kept`, and an unqualified `key`
    // expression in a self-lineage join condition is ambiguous-or-
    // wrong-side territory (the temperatureMixture convention, which
    // qualifies its join key)
    val staged = kept.withColumn("__kk", key)
      .withColumn("__draw",
        md5(concat(lit(salt), lit("|"), id.cast("string"))))
      .withColumn("__bkt", substring(col("__draw"), 1, bucketChars))
    // per-(key, bucket) sizes: at most 16^bucketChars rows per key, and
    // the groupBy partial-aggregates map-side, so the exchange under it
    // ships counts, not corpus rows
    val bcounts = staged
      .groupBy(col("__kk").as("__ck"), col("__bkt").as("__cb"))
      .agg(count(lit(1)).as("__bn"))
    // rank offset of each bucket = rows of the same key in LOWER
    // buckets; the bucket is a prefix of the draw, so lower-bucket rows
    // are exactly the lower-draw rows. Window over the tiny count table
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__ck")).orderBy(col("__cb"))
    val offsets = bcounts
      .withColumn("__off", sum(col("__bn")).over(wOff) - col("__bn"))
      .select(col("__ck"), col("__cb"), col("__off"))
    // local rank within (key, bucket): the only corpus-sized sort, and
    // it runs as 16^bucketChars independent tasks per key
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__kk"), col("__bkt"))
      .orderBy(col("__draw"), id.asc)
    staged.withColumn("__lrn", row_number().over(wLoc))
      .join(broadcast(offsets),
        col("__kk") === col("__ck") && col("__bkt") === col("__cb"))
      .withColumn("__rn", col("__off") + col("__lrn"))
      .join(broadcast(quotas), col("__kk") === col("__k"))
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota", "__k", "__kk", "__draw", "__bkt",
        "__lrn", "__ck", "__cb", "__off")
  }

  /** Corpus mixture: union several sources, each kept at its own rate (in
    * basis points, same determinism contract as [[bernoulli]]), with a
    * `source` tag column identifying provenance. The assemble-the-
    * training-mix step: 100% of curated books + 15% of web crawl + 40% of
    * code, as one reproducible plan.
    *
    * Columns are aligned by name across sources with nulls for columns a
    * source lacks ([[org.apache.spark.sql.Dataset.unionByName]]) — corpus
    * schemas rarely agree exactly. Each source's filter is a pure
    * projection on its own scan (no shuffle is introduced by the mix
    * itself), so at 100 TB this costs exactly the union of the
    * per-source sampled scans.
    */
  def mixture(sources: Seq[(String, DataFrame, Int)], key: String,
      salt: String = "mix"): DataFrame = {
    require(sources.nonEmpty, "mixture of zero sources")
    val tags = sources.map(_._1)
    require(tags.distinct.size == tags.size,
      s"mixture source tags must be distinct, got $tags")
    // withColumn would silently overwrite a caller's provenance column
    sources.foreach { case (tag, df, _) =>
      require(!df.columns.contains("source_tag"),
        s"mixture: source '$tag' already has a 'source_tag' column; " +
          "rename it (it would be overwritten by the mixture tag)")
    }
    sources.map { case (tag, df, bp) =>
      bernoulli(df, col(key), bp, s"$salt|$tag")
        .withColumn("source_tag", lit(tag))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Token-budget mixture: like [[mixture]], but each source's keep rate
    * is CALIBRATED so its sampled token count lands on `targetTokens` in
    * expectation — the way training mixes are actually specified ("300B
    * web tokens, 50B code tokens"), not in keep fractions someone
    * hand-derived from corpus sizes that drift between crawls.
    *
    * rate_bp = min(10000, round(target · 10000 / total_tokens)), where
    * `total_tokens` comes from a one-row aggregate cross-joined back as
    * a broadcast (the [[Pipelines.keepTopQuantile]] shape) — the rate
    * lives IN the plan, no driver-side action at plan-build time. Each
    * source therefore costs one counting scan plus one filtered scan;
    * at 100 TB, substitute persisted table statistics for the counting
    * scan by calling [[mixture]] with precomputed rates. A source whose
    * token total is 0 or NULL contributes nothing (its rate coalesces
    * to 0 via [[weighted]]'s null contract). Sampling is per-DOC, so
    * realized token counts concentrate around the target with relative
    * deviation ~1/√docs_kept.
    */
  def mixtureByBudget(sources: Seq[(String, DataFrame, Long)], key: String,
      tokensCol: String, salt: String = "mix"): DataFrame = {
    require(sources.nonEmpty, "mixture of zero sources")
    val tags = sources.map(_._1)
    require(tags.distinct.size == tags.size,
      s"mixtureByBudget source tags must be distinct, got $tags")
    sources.foreach { case (tag, df, target) =>
      require(target >= 0, s"negative token target for source '$tag'")
      require(!df.columns.contains("source_tag"),
        s"mixtureByBudget: source '$tag' already has a 'source_tag' " +
          "column; rename it")
      require(!df.columns.contains("__total"),
        s"mixtureByBudget: source '$tag' already has a '__total' " +
          "column; rename it")
    }
    sources.map { case (tag, df, target) =>
      val total = df.agg(
        sum(col(tokensCol)).cast("double").as("__total"))
      val rated = df.crossJoin(broadcast(total))
      // explicit zero/NaN-total guard: IEEE division by 0.0 is Infinity
      // and round(Infinity) stays Infinity, which weighted's clamp would
      // turn into keep-ALL — the opposite of the documented
      // contributes-nothing contract for an empty source. NaN needs its
      // own check: under Spark's total ordering NaN > 0.0 is TRUE and
      // least(10000, NaN) = 10000, so a single NaN token count would
      // likewise keep everything
      weighted(rated, col(key),
          when(col("__total") > 0d && !isnan(col("__total")),
            round(lit(target.toDouble) * 10000d / col("__total")))
            .otherwise(lit(0d)),
          s"$salt|$tag")
        .drop("__total")
        .withColumn("source_tag", lit(tag))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Temperature-controlled mixture rebalancing — the mT5/multilingual
    * sampling rule: a document from source s is kept with probability
    * proportional to n_s^(α-1), scaled so the whole mixture lands on
    * `targetDocs` in expectation. α = 1 keeps natural proportions;
    * α → 0 flattens toward per-source-uniform — the standard lever
    * against head-language/head-domain dominance in training mixes.
    *
    * rate_bp(s) = min(10⁴, round(targetDocs · 10⁴ · w_s / (Z · n_s)))
    * with w_s = n_s^α and Z = Σ w_s. Rates derive from ONE count
    * aggregation; Z folds over the per-source weights in SORTED source
    * order (order-independent AND engine-bit-identical — the
    * labelCentroids convention), and the tiny rate table broadcast-joins
    * back. Two corpus scans total (count + filtered), like
    * [[mixtureByBudget]]; substitute persisted stats for the counting
    * scan where available.
    *
    * α = 0.5 (the common default) routes through IEEE-exact `sqrt`, so
    * mixtures are cross-engine reproducible; other α go through `pow`,
    * which carries ~1-ulp engine variance — fine in production, not
    * oracle-exact. Null-source docs are excluded from BOTH the output
    * and the rate derivation (consistent with [[weighted]]'s
    * null-means-never-keep contract) — counting them would silently
    * deflate every real source's rate with weight from rows that can
    * never be kept, and a null group in the sorted Z fold would break
    * bit-identity (Spark sorts null structs first, SQL `ORDER BY`
    * defaults to nulls last).
    */
  def temperatureMixture(df: DataFrame, key: Column, sourceCol: String,
      targetDocs: Long, alpha: Double = 0.5, salt: String = "mix"):
      DataFrame = {
    require(targetDocs > 0, s"targetDocs must be positive: $targetDocs")
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1]: $alpha")
    Seq("__src", "__bp").foreach(c => require(!df.columns.contains(c),
      s"temperatureMixture: df already has a '$c' column; rename it"))
    val wCol = if (alpha == 0.5) sqrt(col("__n"))
      else if (alpha == 1.0) col("__n").cast("double")
      else pow(col("__n"), lit(alpha))
    val weights = df.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__n")).withColumn("__w", wCol)
    val z = weights.agg(aggregate(
      sort_array(collect_list(struct(col("__src"), col("__w")))),
      lit(0.0), (acc, x) => acc + x.getField("__w")).as("__z"))
    val rates = weights.crossJoin(broadcast(z))
      .select(col("__src"),
        least(lit(10000.0), round(lit(targetDocs) * lit(10000.0)
          * col("__w") / (col("__z") * col("__n")))).cast("long")
          .as("__bp"))
    val joined = df.join(broadcast(rates), df(sourceCol) === col("__src"))
    weighted(joined, key, col("__bp"), salt).drop("__src", "__bp")
  }

  /** Per-source epoch repeats — the other half of a training recipe:
    * where [[mixture]]/[[temperatureMixture]] DOWN-sample dominant
    * sources, high-quality small sources get UP-weighted by repeating
    * them N epochs (the "Wikipedia ×3" convention; repeats > ~4 hurt —
    * Muennighoff et al. 2023 — so rates are small integers). Every row
    * of a source with repeat `r` is emitted `r` times with `epoch` ∈
    * 0..r−1 tagging the copy: downstream shard-shuffling keys on
    * (id, epoch) so epochs land in different shards instead of
    * back-to-back. A source absent from `repeats` uses
    * `defaultRepeat`; rate 0 drops the source (recipe exclusion).
    *
    * Pure projection: `explode(sequence(...))` at the scan — no
    * shuffle, no join (the repeat table folds into a literal CASE
    * expression, never a table) — output size is exactly
    * `Σ_source r_s·n_s` by construction. */
  def repeatBySource(df: DataFrame, sourceCol: String,
      repeats: Map[String, Int], defaultRepeat: Int = 1): DataFrame = {
    require(!df.columns.contains("epoch"),
      "input already has an 'epoch' column — repeatBySource would " +
        "silently overwrite it; rename or drop it first")
    require(defaultRepeat >= 0,
      s"defaultRepeat must be >= 0, got $defaultRepeat")
    repeats.foreach { case (s, r) =>
      require(r >= 0, s"repeat for source '$s' must be >= 0, got $r") }
    val rate = repeats.foldLeft(lit(defaultRepeat)) {
      case (acc, (s, r)) => when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    // rate 0 → null sequence → explode drops the row (NOT
    // sequence(0,-1), which Spark helpfully counts DOWN to [0,-1])
    df.withColumn("epoch",
      explode(when(rate > 0,
        sequence(lit(0), rate.cast("int") - 1))))
  }

  /** Deterministic global shuffle key: `md5(salt|key)` as 32 lowercase
    * hex chars — sorting by it is the reproducible corpus permutation
    * training jobs need (every engine/run/cluster produces the SAME
    * order, where `orderBy(rand())` does not survive a retry). A pure
    * projection; compose with a range-partitioned sorted write
    * ([[graft.QuackIO.writeShards]]) so "shuffle the corpus" is one
    * total-order write, no extra pass. Include the epoch in `key` when
    * stacked on [[repeatBySource]] so a doc's copies scatter instead
    * of landing adjacent. */
  def withShuffleKey(df: DataFrame, key: Column,
      salt: String = "shuffle"): DataFrame = {
    require(!df.columns.contains("shuffle_key"),
      "input already has a 'shuffle_key' column — withShuffleKey would " +
        "silently overwrite it; rename or drop it first")
    df.withColumn("shuffle_key",
      md5(concat(lit(salt), lit("|"), key.cast("string"))))
  }

  /** One DoReMi-style multiplicative-weights step for a domain mixture
    * (Xie et al. 2023's Group-DRO update, the data-mixing loop that
    * re-tilts sampling weights toward domains the proxy model finds
    * HARD): `w'_d ∝ w_d · e^(η·excess_d)` with
    * `excess_d = max(0, loss_d − ref_d)`, renormalized, then smoothed
    * with uniform mass `w_new = (1−s)·w' + s/k` so no domain starves
    * to exactly 0 (the paper's mixing term). One row per domain:
    * `domain, excess, weight_new` (round-6).
    *
    * Determinism: the exponent argument and all products are
    * fixed-order IEEE; the normalization sums QUANTIZED numerators
    * (`floor(w·e^x·10⁶ + 0.5)` longs — a 1-ulp engine difference in
    * `exp` flips a quantized value with probability ~1e-10, versus
    * certainty for raw double sums in engine-varying order), so the
    * renormalized ratio is a ratio of integers. The 1e-6 numerator
    * quantization IS the operator's definition — document scale, not
    * hidden error.
    *
    * Scale: the input is the |domains|-row mixture table (KB-sized —
    * compute per-domain losses upstream with one aggregation); this is
    * arithmetic plus one total, never corpus work. */
  def mixtureReweight(df: DataFrame, domainCol: String,
      weightCol: String, lossCol: String, refLossCol: String,
      eta: Double, smoothing: Double = 0.0): DataFrame = {
    require(eta > 0, s"mixtureReweight: eta must be > 0, got $eta")
    require(smoothing >= 0 && smoothing < 1,
      s"mixtureReweight: smoothing must be in [0, 1), got $smoothing")
    val excess = greatest(
      col(lossCol).cast("double") - col(refLossCol).cast("double"),
      lit(0.0))
    val qnum = floor(col(weightCol).cast("double") *
      exp(lit(eta) * col("excess")) * lit(1e6) + lit(0.5))
    val staged = df.select(col(domainCol).as("domain"),
        col(weightCol), round(excess, 6).as("excess"))
      .select(col("domain"), col("excess"), qnum.as("__q"))
    val tot = staged.agg(sum("__q").as("__tot"),
      count(lit(1)).as("__k"))
    staged.crossJoin(broadcast(tot))
      .select(col("domain"), col("excess"),
        round(lit(1.0 - smoothing) *
          (col("__q").cast("double") / col("__tot").cast("double")) +
          lit(smoothing) / col("__k").cast("double"), 6)
          .as("weight_new"))
      .orderBy("domain")
  }

  /** Cumulative Poisson(1) probabilities P(X ≤ k), k = 0..7 — the
    * inverse-CDF thresholds of the bootstrap draw. Computed once,
    * embedded as identical literals in plans and oracles. */
  private[graft] val PoissonCum: Seq[Double] = {
    val pmf = (0 to 7).scanLeft(math.exp(-1.0)) {
      case (p, k) => p / (k + 1) }.take(8)
    pmf.scanLeft(0.0)(_ + _).tail
  }

  /** One-pass Poisson bootstrap CI for a column mean (the
    * multiplier/online bootstrap of Oza 2001 / Chamandy et al. 2012 —
    * THE way to bootstrap at data-parallel scale: resampling-with-
    * replacement needs the whole dataset per replicate, but
    * Binomial(N, 1/N) → Poisson(1) as N grows, so each row instead
    * draws an INDEPENDENT deterministic Poisson(1) weight per
    * replicate and every replicate is a weighted one-pass aggregate).
    * Weights come from `md5(salt + rep + "|" + id)` through the
    * Poisson(1) inverse CDF (capped at 8 — P(X > 8) ≈ 1e-6), so the
    * resample is reproducible across engines, runs, and cluster
    * sizes, the [[bernoulli]] discipline.
    *
    * Values are fixed-point at `scale` decimals (`floor(x·10^s + 0.5)`
    * — money at scale 2 is EXACT cents), so every replicate mean is a
    * ratio of two integer sums: association-order-exact, engine-bit-
    * identical. The CI is the [alpha/2, 1−alpha/2] type-7 interpolated
    * percentile over the `replicates` means — a bounded R-row
    * aggregation.
    *
    * Output one row: `n`, `est_mean` (full-sample), `ci_lo`, `ci_hi`
    * (round-6). Null values are excluded (they carry no mass).
    *
    * Scale: ONE scan with the R-way replicate fan-out exploded UNDER a
    * rep-keyed map-combined aggregation — the exchange ships R rows
    * per task; the percentile buffers R values. Long capacity: at
    * scale 2 and 8× max weight, ~10¹⁴ value-units of total mass per
    * replicate. */
  def poissonBootstrapCI(df: DataFrame, valueCol: String, idCol: String,
      replicates: Int = 32, alpha: Double = 0.05, scale: Int = 2,
      salt: String = "boot"): DataFrame = {
    require(replicates >= 4 && replicates <= 1024,
      s"poissonBootstrapCI: replicates must be in [4, 1024]")
    require(alpha > 0 && alpha < 1,
      s"poissonBootstrapCI: alpha must be in (0, 1), got $alpha")
    require(scale >= 0 && scale <= 6,
      s"poissonBootstrapCI: scale must be in [0, 6], got $scale")
    val mult = math.pow(10.0, scale)
    val cents = floor(col(valueCol).cast("double") * mult + lit(0.5))
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(idCol).as("__id"), cents.as("__v"))
    val whole = base.agg(count(lit(1)).as("n"),
      (sum("__v").cast("double") / count(lit(1)).cast("double") /
        lit(mult)).as("__est"))
    val u = draw32(concat(lit(salt), col("__rep").cast("string"),
      lit("|"), col("__id").cast("string")))
    // w reads the draw from its own column (a separate projection —
    // CollapseProject keeps a non-cheap multi-referenced producer), so
    // the md5 chain is evaluated ONCE per (row, rep) at the plan level
    // instead of riding inside all 8 threshold comparisons; Fan.out
    // spreads the R-way explode's hash work across the cluster when
    // the scan is under-split (single-task on the one-row-group
    // fixture; no-op at production split counts).
    val w = PoissonCum.map(c => when(col("__u") >= c, 1L).otherwise(0L))
      .reduce(_ + _)
    val means = Fan.out(base)
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__rep"))
      .select(col("__rep"), col("__v"), u.as("__u"))
      .select(col("__rep"), col("__v"), w.as("__w"))
      .groupBy("__rep")
      .agg((sum(col("__w") * col("__v")).cast("double") /
        sum(col("__w")).cast("double") / lit(mult)).as("__m"))
    val lo = alpha / 2.0
    val hi = 1.0 - alpha / 2.0
    means.agg(
        expr(s"percentile(__m, $lo)").as("__lo"),
        expr(s"percentile(__m, $hi)").as("__hi"))
      .crossJoin(broadcast(whole))
      .select(col("n"), round(col("__est"), 6).as("est_mean"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
  }

  /** EXACT-size weighted sample without replacement via priority
    * sampling (Duffield, Lund & Thorup, JACM 2007) — the
    * subset-sum-estimating counterpart of [[weighted]]: Bernoulli
    * keep-rates hit a size only in expectation, while training-recipe
    * manifests need EXACTLY k shards/docs with inclusion probability
    * ∝ weight and an unbiased total-weight estimator over what was
    * kept. Each row draws priority `q_i = w_i/u_i` (u_i uniform); the
    * k highest priorities are the sample, `τ` = the (k+1)-th priority,
    * and `est_weight = max(w_i, τ)` makes `Σ est` unbiased for the
    * population total (their Theorem 1).
    *
    * Determinism/parity: u_i is the md5-backed 32-bit draw (`+1` so
    * zero can't divide), weights quantize to `scale` decimals, and the
    * priority materializes as the INTEGER `w_q·2³² div u` — pure
    * BIGINT floor-division, bit-identical on any engine (the double
    * form would shed mantissa above 2⁵³). Ties break on id. Long
    * capacity: `w_q` up to ~4·10⁸ at the default scale before
    * `w_q·2³²` nears overflow — money-sized weights fit; re-scale
    * callers exceeding it.
    *
    * Rows with null/non-positive quantized weight or null id are
    * EXCLUDED (zero weight ⇒ zero inclusion probability; a silent
    * keep would bias the estimator). When the population has ≤ k
    * rows, τ is null and `est_weight = w` exactly (the sample is a
    * census).
    *
    * Scale: the ranking is `orderBy(...).limit(k+1)` — Spark plans
    * TakeOrderedAndProject (per-partition top-(k+1) heaps, one
    * K-sized driver merge), NOT a global sort: no corpus shuffle, no
    * window. The τ fold and estimator run on the (k+1)-row result.
    *
    * Output: the k sampled rows as (id, weight, priority_q,
    * est_weight), priority-descending. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "prio", scale: Int = 2): DataFrame = {
    require(k >= 1, s"prioritySample: k must be >= 1, got $k")
    require(scale >= 0 && scale <= 6,
      s"prioritySample: scale must be in [0, 6], got $scale")
    val mult = math.pow(10.0, scale)
    val base = df
      .filter(col(idCol).isNotNull && col(weightCol).isNotNull)
      .select(col(idCol).as("id"),
        col(weightCol).cast("double").as("__w"),
        floor(col(weightCol).cast("double") * lit(mult) + lit(0.5))
          .cast("long").as("__wq"),
        (conv(substring(md5(concat(lit(salt), lit("|"),
          col(idCol).cast("string"))), 1, 8), 16, 10).cast("long") +
          lit(1L)).as("__u"))
      .filter(col("__wq") > 0)
      .select(col("id"), col("__w"), col("__wq"),
        expr("__wq * 4294967296L div __u").as("priority_q"))
    val top = base
      .orderBy(desc("priority_q"), asc("id"))
      .limit(k + 1)
      // `__`-staged order columns: the rank window is bounded to
      // ≤ k+1 rows by the limit above — the staging-column convention
      // marks it exempt under UnpartitionedWindowGuard's fail mode
      .withColumn("__pq", col("priority_q")).withColumn("__sid", col("id"))
    // τ = the (k+1)-th priority if it exists — a (k+1)-row fold
    val withRn = top.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(desc("__pq"), asc("__sid"))))
    val tau = withRn.filter(col("__rn") === k + 1)
      .agg(max("priority_q").as("__tau"))
    withRn.filter(col("__rn") <= k)
      .crossJoin(broadcast(tau))
      .select(col("id"), col("__w").as("weight"), col("priority_q"),
        round(greatest(col("__w"),
          col("__tau").cast("double") / lit(mult)), 6).as("est_weight"))
      .orderBy(desc("priority_q"), asc("id"))
  }

  /** `md5(key)` first 8 hex chars as a uniform double in [0, 1) —
    * exact multiples of 2⁻³², so threshold comparisons are
    * deterministic on any engine. */
  private def draw32(key: Column): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long")
      .cast("double") / lit(4294967296.0)
}
