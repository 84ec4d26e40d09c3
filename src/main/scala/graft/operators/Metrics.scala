package graft.operators

import graft.operators.Checkpoints.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-eval metrics for the quality-classifier loop (SURVEY §2.4 X5:
  * a trained filter is only trustworthy with its discrimination and
  * calibration measured on the same engine that serves it). Both
  * metrics here are EXACT — no sampling, no sketch — and shaped for
  * 100 TB: the AUC's only corpus-sized movement is one range exchange,
  * calibration is a B-bucket aggregation. */
object Metrics {

  /** EXACT tie-corrected ROC AUC (Mann–Whitney midranks): the
    * probability a random positive outscores a random negative, ties
    * at half credit —
    * `AUC = (Σ_pos midrank − P(P+1)/2) / (P·N)`.
    *
    * Scale shape: the textbook SQL form (cumulative counts over
    * DISTINCT scores) windows over a table that, for continuous
    * scores, is corpus-sized — the unpartitioned-window cliff. This
    * form rides [[Rank.globalRank]] instead (one range exchange, no
    * corpus window): per-score midranks from a score-keyed min/max
    * rank aggregation (map-side combined), then one global fold. All
    * arithmetic is integer/decimal until the single final division —
    * `AUC = (Σ 2·midrank_pos − P(P+1)) / (2·P·N)` — so the result is
    * engine-bit-identical before its round.
    *
    * Nulls (score or label) are excluded; degenerate inputs (no
    * positives or no negatives) return a null auc with the counts
    * still populated. Output one row: `auc`, `n_pos`, `n_neg`. */
  def auc(df: DataFrame, score: Column, label: Column, id: Column)
      : DataFrame = {
    val staged = df
      .filter(score.isNotNull && label.isNotNull && id.isNotNull &&
        !isnan(score.cast("double")))
      .select(score.cast("double").as("__s"), id.as("__id"),
        label.cast("boolean").as("__y"))
    // the label rides as an INERT trailing sort key: __id is unique, so
    // it can never influence the order, and it satisfies globalRank's
    // slim contract (every column in the sort order) without a
    // payload join-back
    val ranked = Rank.globalRank(staged,
      Seq(col("__s").asc, col("__id").asc, col("__y").asc), "__rk")
    val perScore = ranked.groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__np"),
        min(col("__rk")).as("__lo"), max(col("__rk")).as("__hi"))
    perScore.agg(
        sum((col("__np") * (col("__lo") + col("__hi")))
          .cast("decimal(38,0)")).as("__sum2"),
        sum(col("__np")).cast("decimal(38,0)").as("__p"),
        sum(col("__n")).cast("decimal(38,0)").as("__t"))
      .select(
        when(col("__p") > 0 && col("__t") - col("__p") > 0, round(
          (col("__sum2") - col("__p") * (col("__p") + 1)).cast("double") /
            (lit(2).cast("decimal(38,0)") * col("__p") *
              (col("__t") - col("__p"))).cast("double"), 6)).as("auc"),
        coalesce(col("__p").cast("long"), lit(0L)).as("n_pos"),
        coalesce((col("__t") - col("__p")).cast("long"), lit(0L))
          .as("n_neg"))
  }

  /** Per-key odds ratios with Wald confidence bounds — the A/B
    * outcome readout ("does the new filter change the flag rate, per
    * language?") as one row per key: the 2×2 (group × outcome) cells
    * and the LOG odds ratio `ln(a·d / (b·c))` with its standard error
    * `sqrt(1/a + 1/b + 1/c + 1/d)` and the ±1.96·se bounds. LOG space
    * throughout — `exp` diverges by 1 ulp across engines (the q234
    * measurement) and a CI that contains 0 in log space is exactly a
    * CI containing 1 in ratio space. Zero cells take the
    * Haldane–Anscombe +0.5 on ALL FOUR cells (the standard finite
    * correction; raw integer cells ride along untouched).
    *
    * Exactness: one conditional-sum aggregation per key; every float
    * is a single fixed-order expression of the integer cells
    * (round 6). Output: `(key, g1_pos, g1_neg, g0_pos, g0_neg,
    * log_or, se, lo95, hi95)`. */
  def oddsRatios(df: DataFrame, keyCol: String, groupCol: Column,
      outcomeCol: Column): DataFrame = {
    val base = df
      .filter(groupCol.isNotNull && outcomeCol.isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        when(groupCol.cast("boolean"), 1L).otherwise(0L).as("__g"),
        when(outcomeCol.cast("boolean"), 1L).otherwise(0L).as("__y"))
    val cells = base.groupBy("key").agg(
      sum(col("__g") * col("__y")).as("g1_pos"),
      sum(col("__g") * (lit(1L) - col("__y"))).as("g1_neg"),
      sum((lit(1L) - col("__g")) * col("__y")).as("g0_pos"),
      sum((lit(1L) - col("__g")) * (lit(1L) - col("__y"))).as("g0_neg"))
    val any0 = col("g1_pos") === 0L || col("g1_neg") === 0L ||
      col("g0_pos") === 0L || col("g0_neg") === 0L
    def cell(c: Column): Column =
      when(any0, c.cast("double") + lit(0.5)).otherwise(c.cast("double"))
    val (a, b, c0, d0) = (cell(col("g1_pos")), cell(col("g1_neg")),
      cell(col("g0_pos")), cell(col("g0_neg")))
    val logOr = log(a * d0 / (b * c0))
    val se = sqrt(lit(1.0) / a + lit(1.0) / b + lit(1.0) / c0 +
      lit(1.0) / d0)
    cells.select(col("key"), col("g1_pos"), col("g1_neg"),
      col("g0_pos"), col("g0_neg"),
      round(logOr, 6).as("log_or"), round(se, 6).as("se"),
      round(logOr - lit(1.96) * se, 6).as("lo95"),
      round(logOr + lit(1.96) * se, 6).as("hi95"))
  }

  /** Per-key tie-corrected AUC — [[auc]] sliced by language / source /
    * shard: the eval that catches "ranks brilliantly on English,
    * coin-flips on Thai" before a global number averages it away.
    * Same exact midrank algebra as [[auc]]
    * (`(Σ 2·midrank_pos − P(P+1)) / (2·P·N)` per key, integer/decimal
    * until one final division), but ranks come from a per-key
    * cumulative over the (key, DISTINCT score) AGGREGATED table:
    * bounded by distinct scores per key, not rows per key (the q186
    * bounded-domain argument — quality scores are rounded/bucketed in
    * practice). A key whose distinct-score domain exceeds
    * `maxKeyScores` raises loudly BEFORE the window buffers it (the
    * rankNormalize guard posture): truly continuous scores on a
    * dominant key belong on the global [[auc]] or a quantized score.
    *
    * Output one row per key: `(key, n_pos, n_neg, auc)` — auc null
    * when the key lacks positives or negatives (degenerate, loud). */
  def aucByKey(df: DataFrame, key: Column, score: Column, label: Column,
      maxKeyScores: Long = 10000000L): DataFrame = {
    require(maxKeyScores > 0L, s"aucByKey: maxKeyScores must be > 0")
    val staged = df
      .filter(score.isNotNull && label.isNotNull &&
        !isnan(score.cast("double")))
      .select(key.cast("string").as("key"),
        score.cast("double").as("__s"),
        when(label.cast("boolean"), 1L).otherwise(0L).as("__y"))
    val g = staged.groupBy(col("key"), col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__np"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
    val w = wk.orderBy(col("__s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cum = g
      .withColumn("__dom", count(lit(1)).over(wk))
      .withColumn("__n", when(col("__dom") > maxKeyScores, raise_error(
        concat(lit("aucByKey: key '"), col("key"),
          lit(s"' has more than $maxKeyScores distinct scores — " +
            "quantize the score or use the global auc")))
        ).otherwise(col("__n")))
      .withColumn("__hi", sum(col("__n")).over(w))
      .withColumn("__lo", col("__hi") - col("__n") + 1L)
    cum.groupBy(col("key"))
      .agg(
        sum((col("__np") * (col("__lo") + col("__hi")))
          .cast("decimal(38,0)")).as("__sum2"),
        sum(col("__np")).cast("decimal(38,0)").as("__p"),
        sum(col("__n")).cast("decimal(38,0)").as("__t"))
      .select(col("key"),
        coalesce(col("__p").cast("long"), lit(0L)).as("n_pos"),
        coalesce((col("__t") - col("__p")).cast("long"), lit(0L))
          .as("n_neg"),
        when(col("__p") > 0 && col("__t") - col("__p") > 0, round(
          (col("__sum2") - col("__p") * (col("__p") + 1)).cast("double") /
            (lit(2).cast("decimal(38,0)") * col("__p") *
              (col("__t") - col("__p"))).cast("double"), 6)).as("auc"))
  }

  /** Calibration report: bucket predictions by confidence
    * (`⌊score·bins⌋`, clamped into the last bucket at score = 1) and
    * put each bucket's mean confidence next to its observed positive
    * rate — the reliability-diagram table, whose weighted |gap| sum is
    * ECE. One B-bucket aggregation; scores outside [0, 1] or null
    * score/label rows are excluded. Columns: `bucket`, `n`,
    * `mean_score`, `frac_pos`, `abs_gap` (each round-6; the mean rides
    * a decimal-exact sum so engines agree bit-for-bit). */
  def calibrationReport(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"Metrics: bins must be >= 2, got $bins")
    val s = score.cast("double")
    val staged = df
      .filter(s.isNotNull && label.isNotNull && s >= 0.0 && s <= 1.0)
      .select(least(floor(s * bins).cast("int"), lit(bins - 1))
          .as("bucket"),
        s.as("__s"), label.cast("boolean").as("__y"))
    staged.groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(sum(col("__s").cast("decimal(38,15)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_score"),
        round(sum(when(col("__y"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("frac_pos"))
      .withColumn("abs_gap",
        round(abs(col("mean_score") - col("frac_pos")), 6))
      .orderBy("bucket")
  }

  /** Expected Calibration Error over a [[calibrationReport]]:
    * `Σ (n_b/N)·|frac_pos − mean_score|`. One row: `ece` (round-6). */
  def ece(report: DataFrame): DataFrame =
    report.agg(round(
      sum(col("n").cast("double") * col("abs_gap")) /
        sum(col("n")).cast("double"), 6).as("ece"))

  /** Multiclass confusion matrix: one row per observed (label, pred)
    * cell with its count — the eval table behind [[classReport]] and
    * every error-analysis drill-down. Rows with a null label or
    * prediction are outside the matrix (score them with a null-rate
    * check, not an accuracy number). ONE keyed aggregation, map-side
    * combined; output is |classes|² at most. */
  def confusionMatrix(df: DataFrame, labelCol: String,
      predCol: String): DataFrame =
    df.filter(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "pred")

  /** Spearman rank correlation between two score columns — "does the
    * cheap quality score ORDER the corpus like the expensive one":
    * the validation a fast classifier needs against an LM-perplexity
    * reference before replacing it in a gate. ρ = Pearson correlation
    * of the two rank vectors, with ties receiving their standard
    * midranks (`(rank_min + rank_max)/2` per tied value — the
    * fractional-rank convention every stats package uses). Rows where
    * either score is null are excluded pairwise. One row: `n`, `rho`
    * (round-6; null when either column is constant — no ordering to
    * correlate).
    *
    * Scale: midranks per column = one keyed aggregation per distinct
    * value over [[Rank.globalRank]]'s range-decomposed ranks (the AUC
    * midrank machinery — no corpus-sized window anywhere), then one
    * `corr` aggregate. `idCol` must be unique (it pairs the two rank
    * vectors; a synthesized monotonic id would be nondeterministic
    * across the two ranking branches). NaN scores are excluded with
    * the nulls. */
  def spearman(df: DataFrame, xCol: String, yCol: String,
      idCol: String): DataFrame = {
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        !isnan(col(xCol).cast("double")) &&
        !isnan(col(yCol).cast("double")))
      .select(col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y"),
        col(idCol).as("__rid"))
    def midranks(valueCol: String, out: String): DataFrame = {
      val ranked = Rank.globalRank(
        base.select(col(valueCol), col("__rid")),
        Seq(col(valueCol).asc, col("__rid").asc), "__rk")
      val mids = ranked.groupBy(col(valueCol).as("__v"))
        .agg(((min("__rk") + max("__rk")).cast("double") / 2.0)
          .as(out))
      ranked.join(mids, ranked(valueCol) === mids("__v"))
        .select(col("__rid"), col(out))
    }
    val rx = midranks("__x", "__mrx")
    val ry = midranks("__y", "__mry")
    // closed-form Pearson from raw sums: ANSI corr() raises
    // DIVIDE_BY_ZERO on a zero-variance input instead of yielding null
    rx.join(ry, "__rid")
      .agg(count(lit(1)).cast("double").as("__n"),
        sum("__mrx").as("__sx"), sum("__mry").as("__sy"),
        sum(col("__mrx") * col("__mry")).as("__sxy"),
        sum(col("__mrx") * col("__mrx")).as("__sxx"),
        sum(col("__mry") * col("__mry")).as("__syy"))
      .select(col("__n").cast("long").as("n"),
        when((col("__n") * col("__sxx") - col("__sx") * col("__sx")) > 0
            && (col("__n") * col("__syy") - col("__sy") * col("__sy"))
              > 0,
          round((col("__n") * col("__sxy") - col("__sx") * col("__sy"))
            / sqrt((col("__n") * col("__sxx") -
                col("__sx") * col("__sx")) *
              (col("__n") * col("__syy") - col("__sy") * col("__sy"))),
            6)).as("rho"))
  }

  /** NDCG@k (Järvelin & Kekäläinen 2002) — the graded retrieval-eval
    * companion to [[Similarity.recallAtK]]: per query, the run's
    * discounted cumulative gain `Σ_{rank≤k} (2^rel − 1)/log2(rank+1)`
    * (unjudged results gain 0) over the IDEAL DCG from the top-k
    * relevance grades. One row per query seen on either side: `dcg`,
    * `idcg`, `ndcg` (round-6; null when the query has no relevant
    * docs — no silent 0/0=perfect), queries the run missed entirely
    * score dcg 0. Macro-mean is one `avg` over this report.
    *
    * Inputs: `results` (query_id, corpus_id, rank — the
    * [[Similarity.recallAtK]] run shape) and `relevance` (query_id,
    * corpus_id, rel ≥ 0 graded judgments). Scale: the run join is
    * keyed on (query, corpus); the ideal ranking windows per query
    * over the JUDGED pool only — bounded by judgments per query, which
    * is label-budget-sized by construction, never corpus-sized. */
  def ndcgAtK(results: DataFrame, relevance: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"ndcgAtK: k must be >= 1, got $k")
    val rel = relevance.select(col("query_id"), col("corpus_id"),
      col("rel").cast("double").as("rel"))
    val run = results.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "corpus_id"), "left")
      .select(col("query_id"),
        ((pow(lit(2.0), coalesce(col("rel"), lit(0.0))) - lit(1.0)) /
          log2(col("rank").cast("double") + lit(1.0))).as("__g"))
      .groupBy("query_id").agg(sum("__g").as("__dcg"))
    val wIdeal = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("rel").desc, col("corpus_id"))
    val ideal = rel.filter(col("rel") > 0)
      .withColumn("__r", row_number().over(wIdeal))
      .filter(col("__r") <= k)
      .select(col("query_id"),
        ((pow(lit(2.0), col("rel")) - lit(1.0)) /
          log2(col("__r").cast("double") + lit(1.0))).as("__g"))
      .groupBy("query_id").agg(sum("__g").as("__idcg"))
    run.join(ideal, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        round(coalesce(col("__dcg"), lit(0.0)), 6).as("dcg"),
        round(coalesce(col("__idcg"), lit(0.0)), 6).as("idcg"),
        when(coalesce(col("__idcg"), lit(0.0)) > 0,
          round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), 6))
          .as("ndcg"))
      .orderBy("query_id")
  }

  /** Cohen's kappa (Cohen 1960) between two categorical raters — the
    * chance-corrected agreement score every labeling pipeline reports
    * before trusting its annotations: κ = (p_o − p_e) / (1 − p_e) with
    * observed agreement p_o = Σ diag / N and chance agreement
    * p_e = Σ_c (row_c · col_c) / N². One row: `n`, `po`, `pe`, `kappa`
    * (each round-6; κ null when p_e = 1 — a single-class table has no
    * chance-corrected signal). Null-rated rows are outside the table.
    * Scale: the [[confusionMatrix]] aggregation, then arithmetic over
    * the |classes|²-sized cell table. */
  def cohensKappa(df: DataFrame, rater1Col: String,
      rater2Col: String): DataFrame = {
    val cells = df
      .filter(col(rater1Col).isNotNull && col(rater2Col).isNotNull)
      .groupBy(col(rater1Col).as("a"), col(rater2Col).as("b"))
      .agg(count(lit(1)).as("n"))
    val rows = cells.groupBy(col("a").as("c")).agg(sum("n").as("ra"))
    val cols = cells.groupBy(col("b").as("c")).agg(sum("n").as("cb"))
    val marg = rows.join(cols, Seq("c"), "full_outer")
      .select((coalesce(col("ra"), lit(0L)) *
        coalesce(col("cb"), lit(0L))).as("rc"))
      .agg(sum("rc").as("__sum_rc"))
    val agg = cells.agg(sum("n").as("__n"),
      sum(when(col("a") === col("b"), col("n")).otherwise(0L))
        .as("__diag"))
    val po = col("__diag").cast("double") / col("__n")
    val pe = col("__sum_rc").cast("double") /
      (col("__n").cast("double") * col("__n").cast("double"))
    agg.crossJoin(broadcast(marg))
      .select(col("__n").as("n"), round(po, 6).as("po"),
        round(pe, 6).as("pe"),
        when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6))
          .as("kappa"))
  }

  /** Bradley–Terry strength scores from pairwise preference outcomes
    * (Bradley & Terry 1952; MM updates per Hunter 2004) — the ranking
    * primitive behind preference-data curation: given (winner, loser)
    * comparison rows, estimate per-item strengths π with
    * `π_i ← W_i / Σ_j n_ij/(π_i + π_j)`, renormalized to Σπ = 1 each
    * sweep. Items that never win converge to 0 (they contribute no
    * NaN); self-pairs and null-sided rows are dropped.
    *
    * Scale: comparisons aggregate ONCE to per-item win counts and a
    * symmetric (i, j, matches) cell table — the only corpus-sized
    * work; each sweep is two small joins + one keyed aggregation over
    * cells, `localCheckpoint`ed per sweep so the plan never compounds
    * (the [[Graph.pagerank]] iteration discipline). Output: (item,
    * round-6 score), strongest first. */
  def bradleyTerry(pairs: DataFrame, winnerCol: String,
      loserCol: String, sweeps: Int = 10): DataFrame = {
    require(sweeps >= 1 && sweeps <= 100,
      s"bradleyTerry: sweeps must be in [1, 100], got $sweeps")
    val p = pairs.filter(col(winnerCol).isNotNull &&
      col(loserCol).isNotNull && col(winnerCol) =!= col(loserCol))
    val wins = p.groupBy(col(winnerCol).as("item"))
      .agg(count(lit(1)).as("w"))
    val sym = p.select(
        least(col(winnerCol), col(loserCol)).as("i"),
        greatest(col(winnerCol), col(loserCol)).as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("m"))
    val edges = sym.select(col("i").as("item"), col("j").as("opp"),
        col("m"))
      .union(sym.select(col("j").as("item"), col("i").as("opp"),
        col("m")))
      .pinned
    // per-sweep generations ride a Chain: superseded reliable
    // checkpoints are reclaimed two pins behind (the MM update reads
    // only the previous generation)
    val ckpt = new Checkpoints.Chain
    var pi = ckpt.pin(edges.select("item").distinct()
      .withColumn("pi", lit(1.0)))
    for (_ <- 1 to sweeps) {
      val d = edges.join(pi, "item")
        .join(pi.select(col("item").as("opp"), col("pi").as("pi_o")),
          "opp")
        .groupBy("item")
        .agg(sum(col("m").cast("double") / (col("pi") + col("pi_o")))
          .as("d"))
      val upd = d.join(wins, Seq("item"), "left")
        .select(col("item"),
          (coalesce(col("w"), lit(0L)).cast("double") / col("d"))
            .as("pi_raw"))
      pi = ckpt.pin(
        upd.crossJoin(broadcast(upd.agg(sum("pi_raw").as("__t"))))
          .select(col("item"), (col("pi_raw") / col("__t")).as("pi")))
    }
    ckpt.release()
    pi.select(col("item"), round(col("pi"), 6).as("score"))
      .orderBy(col("score").desc, col("item"))
  }

  /** Per-class precision / recall / F1 over a multiclass prediction
    * column — the standard eval report for the trained classifiers
    * this engine ships (lang-id, quality): for every class seen as a
    * label OR a prediction, `support` (true rows), `predicted`
    * (claimed rows), `tp`, and round-6 precision = tp/predicted,
    * recall = tp/support, f1 = harmonic mean — each null where its
    * denominator is zero (a class never predicted has no precision;
    * an f1 with p + r = 0 has no value), never a silent 0 that would
    * drag a macro average. Macro/micro averaging is one `avg`/`sum`
    * over this KB-sized report, left to the caller.
    *
    * Scale: one corpus aggregation to the confusion cells; support,
    * predicted and tp are aggregations/filters OF that small table;
    * the full-outer class join coalesces its key. */
  def classReport(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val cells = df
      .filter(col(labelCol).isNotNull && col(predCol).isNotNull)
      .groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
    val sup = cells.groupBy(col("label").as("clazz"))
      .agg(sum("n").as("support"))
    val prd = cells.groupBy(col("pred").as("clazz"))
      .agg(sum("n").as("predicted"))
    val tp = cells.filter(col("label") === col("pred"))
      .select(col("label").as("clazz"), col("n").as("tp"))
    val p = col("tp").cast("double") / col("predicted")
    val r = col("tp").cast("double") / col("support")
    sup.join(prd, Seq("clazz"), "full_outer")
      .join(tp, Seq("clazz"), "left")
      .select(col("clazz"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("predicted"), lit(0L)).as("predicted"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("clazz"), col("support"), col("predicted"), col("tp"),
        when(col("predicted") > 0, round(p, 6)).as("precision"),
        when(col("support") > 0, round(r, 6)).as("recall"),
        when(col("predicted") > 0 && col("support") > 0 && (p + r) > 0,
          round(lit(2.0) * p * r / (p + r), 6)).as("f1"))
      .orderBy("clazz")
  }

  /** MRR@k (mean reciprocal rank's per-query report) — the
    * first-relevant-hit retrieval metric that complements [[ndcgAtK]]
    * (graded gain) and `recallAtK` (set coverage): per query, the rank
    * of the FIRST relevant result within the top k and its reciprocal
    * `rr = 1/rank`; queries whose top-k holds no relevant doc score
    * rr = 0 with a null rank (they count against the mean — silently
    * dropping them is the classic MRR inflation). Queries appearing
    * only in `relevance` (the run missed them entirely) are included
    * at rr = 0. The corpus mean is one `avg(rr)` over this report.
    *
    * Inputs: `results` (query_id, corpus_id, rank) and `relevance`
    * (query_id, corpus_id) — binary judgments; for graded ones, gate
    * `rel >= grade` upstream. Scale: one keyed join plus a per-query
    * min — both map-combined aggregations, nothing corpus-windowed. */
  def mrr(results: DataFrame, relevance: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"mrr: k must be >= 1, got $k")
    val rel = relevance.select("query_id", "corpus_id").distinct()
    val hits = results.filter(col("rank") <= k)
      .join(rel, Seq("query_id", "corpus_id"))
      .groupBy("query_id").agg(min("rank").as("__first"))
    rel.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("__first").as("first_rel_rank"),
        round(coalesce(lit(1.0) / col("__first").cast("double"),
          lit(0.0)), 6).as("rr"))
      .orderBy("query_id")
  }

  /** Corpus BLEU (Papineni et al. 2002) over aligned
    * (candidate, reference) text pairs — the generation-eval staple:
    * modified n-gram precision `p_n = Σ_pairs clip_n / Σ_pairs cand_n`
    * for n = 1..4 (each candidate n-gram's count CLIPPED at the
    * reference's count for that n-gram), geometric mean via
    * `sqrt(sqrt(p1·p2·p3·p4))` (two hardware sqrts — no pow/exp
    * parity exposure), and the brevity penalty `min(1, e^(1 − r/c))`
    * on corpus token totals. One summary row: `c_len, r_len, p1..p4,
    * bp, bleu` (round-6; bleu null when any p_n is 0 — the standard
    * undefined-log case, reported loudly instead of smoothed).
    *
    * Tokenization is the repo-wide [[TextAnalysis.tokens]] split.
    * Counts are integers end-to-end; the only float math is the final
    * one-row expression, so results replay bit-for-bit on any engine
    * (the e^x branch only evaluates when c < r — callers needing
    * cross-engine hash parity on SHORT candidates accept libm-vs-JVM
    * exp drift below round-6, which is ~1 ulp).
    *
    * Scale: tokenization runs ONCE into a pinned (id, tokens, tokens)
    * table (eval sets are bounded by contract — the pin is token-array
    * sized, and it cuts both the 9 redundant tokenize passes and the
    * 8× cold Janino compile of the tokenizer forest); the per-n gram
    * explodes then scan the pinned arrays and aggregate map-combined
    * to 4 + 1 rows. No windows, no driver loops. */
  def bleu(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame =
    // Tokenize ONCE into the pinned (id, cand_tokens, ref_tokens)
    // table [[bleuTokens]] scans: the 2·maxN + 1 consumers read
    // materialized arrays instead of each re-running the regex
    // tokenizer over the raw text (9 tokenize passes → 2) AND each
    // cold plan compiles without the tokenizer expression forest
    // inlined (the 8.6–10.1 s cold vs 5 s warm head was Janino
    // re-compiling it 8×). Eval pairs are eval-set-sized by contract,
    // so materializing their token arrays is the cheap side of the
    // trade.
    bleuTokens(pairs.select(col(idCol).as("__bt_id"),
      TextAnalysis.tokens(col(candCol)).as("__bt_c"),
      TextAnalysis.tokens(col(refCol)).as("__bt_r")),
      "__bt_id", "__bt_c", "__bt_r", maxN)

  /** [[bleu]]'s tokens-in core: identical metric over pairs whose
    * candidate/reference are ALREADY token arrays (whitespace-free
    * strings — [[TextAnalysis.tokens]] output, or any upstream
    * tokenizer). Callers that materialize tokens anyway (synthetic
    * eval runs transforming reference tokens, pre-tokenized eval sets)
    * skip the text round-trip entirely: the text façade costs one
    * extra scan + pin of the pair set to tokenize, which at the
    * measured sf0.1 gate was most of bleu's 9.8 s cold head (two pins
    * + three tokenize passes → one pin, zero re-tokenizes). */
  def bleuTokens(pairs: DataFrame, idCol: String, candToksCol: String,
      refToksCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 4, s"bleu: maxN must be in [1,4]")
    // pin ONCE: every per-n consumer scans the materialized arrays
    val toks = Checkpoints.pin(pairs.select(col(idCol).as("__id"),
      col(candToksCol).cast("array<string>").as("__cw"),
      col(refToksCol).cast("array<string>").as("__rw")))
    // per-n scans, NOT a fused (pair, n, gram) single explode: the
    // fused form was MEASURED 2.8× slower at sf0.1 (5.0 → 14.0 s warm)
    // — the struct-generator explode re-evaluates the gram/slice
    // expression forest per flattened branch, the same interpreted-HOF
    // cost that sank the all-n distinct-n form; eight small
    // map-combined aggregations win over one big one here
    def grams(w: Column, n: Int): Column =
      when(size(w) >= n, transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " "))).otherwise(
        array(Seq.empty[Column]: _*).cast("array<string>"))
    // one row per (pair, n, gram) with candidate + reference counts —
    // clip = min of the two; totals sum per n. Both sides ride ONE
    // tagged explode per n (cand grams tagged 1, ref grams 0) into a
    // single (id, gram) aggregation: ref-only grams contribute 0 to
    // both clip (min(0, rn)) and tot (cn = 0), so the fold equals the
    // old cand⋈ref left join while planning one exchange instead of
    // two plus a shuffle join per n.
    val perN = (1 to maxN).map { n =>
      toks.select(col("__id"), explode(concat(
          transform(grams(col("__cw"), n),
            g => struct(g.as("g"), lit(1L).as("c"))),
          transform(grams(col("__rw"), n),
            g => struct(g.as("g"), lit(0L).as("c"))))).as("e"))
        .groupBy(col("__id"), col("e.g").as("g"))
        .agg(sum(col("e.c")).as("cn"),
          sum(lit(1L) - col("e.c")).as("rn"))
        .agg(sum(least(col("cn"), col("rn"))).as("clip"),
          sum("cn").as("tot"))
        .select(lit(n).as("n"), col("clip"), col("tot"))
    }.reduce(_ unionByName _)
    val lens = toks.agg(
      sum(size(col("__cw"))).as("c_len"),
      sum(size(col("__rw"))).as("r_len"))
    val ps = perN.groupBy().pivot("n", 1 to maxN).agg(
      first(when(col("tot") > 0,
        col("clip").cast("double") / col("tot").cast("double"))))
      .select((1 to maxN).map(n => col(n.toString).as(s"__p$n")): _*)
    val pProd = (1 to maxN).map(n => col(s"__p$n")).reduce(_ * _)
    val geo = maxN match {
      case 4 => sqrt(sqrt(pProd))
      case 2 => sqrt(pProd)
      case 1 => pProd
      case _ => pow(pProd, lit(1.0 / maxN))
    }
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("r_len").cast("double") /
        col("c_len").cast("double")))
    ps.crossJoin(broadcast(lens))
      .select((Seq(col("c_len"), col("r_len")) ++
        (1 to maxN).map(n => round(col(s"__p$n"), 6).as(s"p$n")) ++
        Seq(round(bp, 6).as("bp"),
          when((1 to maxN).map(n => col(s"__p$n") > 0)
            .reduce(_ && _), round(bp * geo, 6)).as("bleu"))): _*)
  }

  /** ROUGE-L per pair (Lin 2004) — the LCS-based generation-eval
    * companion to [[bleu]]: rewards IN-ORDER agreement at any gap,
    * which contiguous n-grams cannot see. Per (candidate, reference)
    * pair: `lcs`, precision `lcs/|cand|`, recall `lcs/|ref|`, and the
    * balanced F1 (null when both sides miss entirely — reported
    * loudly, not smoothed to 0/0 = 0). Tokenization is the repo-wide
    * [[TextAnalysis.tokens]] split.
    *
    * The LCS itself is the native [[graft.functions.LcsLength]]
    * two-row DP (O(n·m) per pair; the HOF reference twin [[lcsHof]]
    * is spec-pinned bit-identical) — cap token counts upstream for
    * pathological documents, the per-row-CPU contract every
    * fingerprint operator shares. One scan, one projection, no
    * shuffle beyond the caller's. */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    val staged = pairs.select(col(idCol),
      size(TextAnalysis.tokens(col(candCol))).as("n_cand"),
      size(TextAnalysis.tokens(col(refCol))).as("n_ref"),
      graft.functions.LcsLength.of(TextAnalysis.tokens(col(candCol)),
        TextAnalysis.tokens(col(refCol))).as("lcs"))
    val p = col("lcs").cast("double") / col("n_cand").cast("double")
    val r = col("lcs").cast("double") / col("n_ref").cast("double")
    staged.select(col(idCol), col("n_cand").cast("long").as("n_cand"),
      col("n_ref").cast("long").as("n_ref"),
      col("lcs").cast("long").as("lcs"),
      round(p, 6).as("p"), round(r, 6).as("r"),
      when(col("lcs") > 0,
        round(lit(2.0) * p * r / (p + r), 6)).as("f1"))
  }

  /** Corpus chrF (Popović 2015) over aligned (candidate, reference)
    * text pairs — the CHARACTER-level generation-eval companion to
    * [[bleu]]/[[rougeL]]: tokenization-free, so it credits morphology
    * and near-miss spellings word-level n-grams score zero. Whitespace
    * is removed (the chrF convention), then for each order n = 1..maxN
    * the corpus-pooled clipped character-n-gram matches are counted
    * exactly as [[bleu]] pools word n-grams: `match_n = Σ_pairs Σ_g
    * min(cnt_cand, cnt_ref)`. Macro averages over orders give
    * `chr_p = (1/N)·Σ p_n` and `chr_r = (1/N)·Σ r_n` (an order with an
    * empty side contributes 0 — the standard harsh convention), and
    * `chrf = (1+β²)·P·R/(β²·P+R)` with β = 2 by default (recall-heavy,
    * the published setting); null when the denominator is 0 — reported
    * loudly, not smoothed.
    *
    * Parity: counts are integers end-to-end; each p_n/r_n is a single
    * integer division and the order-average folds the ≤maxN terms in
    * FIXED n-ascending order as one projection expression, so the
    * result replays bit-for-bit on any engine before its round-6.
    *
    * Scale: pairs explode to (pair, char-gram, n) rows — bounded by
    * maxN·chars, the same fan-out every shingle operator rides — and
    * everything aggregates map-combined down to maxN partials and one
    * summary row. No windows, no driver loops. */
  def chrF(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 6, beta: Double = 2.0): DataFrame =
    // strip whitespace ONCE into the pinned table [[chrFStripped]]
    // scans ([[bleu]]'s shape: the 2·maxN consumers read materialized
    // strings instead of each re-running the regex, and cold plans
    // compile without it inlined)
    chrFStripped(pairs.select(col(idCol).as("__cf_id"),
      regexp_replace(col(candCol), "\\s+", "").as("__cf_c"),
      regexp_replace(col(refCol), "\\s+", "").as("__cf_r")),
      "__cf_id", "__cf_c", "__cf_r", maxN, beta)

  /** [[chrF]]'s stripped-in core: identical metric over pairs whose
    * candidate/reference strings are ALREADY whitespace-free (the
    * chrF convention — e.g. token arrays rejoined with an empty
    * separator). The caller asserts the no-whitespace contract:
    * residual whitespace would be counted as ordinary characters.
    * Callers that build the strings from materialized tokens skip the
    * strip-regex scan + the second pin the text façade pays (the
    * [[bleuTokens]] cold-head economics). */
  def chrFStripped(pairs: DataFrame, idCol: String,
      candStrippedCol: String, refStrippedCol: String,
      maxN: Int = 6, beta: Double = 2.0): DataFrame = {
    require(maxN >= 1, s"chrF: maxN must be >= 1, got $maxN")
    require(beta > 0, s"chrF: beta must be > 0, got $beta")
    val stripped = Checkpoints.pin(pairs.select(col(idCol).as("__id"),
      col(candStrippedCol).cast("string").as("__cs"),
      col(refStrippedCol).cast("string").as("__rs")))
    def grams(s: Column, n: Int): Column =
      when(length(s) >= n, transform(sequence(lit(1), length(s) - (n - 1)),
        i => s.substr(i, lit(n)))).otherwise(
        array(Seq.empty[Column]: _*).cast("array<string>"))
    // both sides ride ONE tagged explode per n into a single (id, gram)
    // aggregation — the tag-sum pair (cn, rn) over the key union IS the
    // old cand⋈ref FULL join's coalesced cells, at half the exchanges
    val perN = (1 to maxN).map { n =>
      stripped.select(col("__id"), explode(concat(
          transform(grams(col("__cs"), n),
            g => struct(g.as("g"), lit(1L).as("c"))),
          transform(grams(col("__rs"), n),
            g => struct(g.as("g"), lit(0L).as("c"))))).as("e"))
        .groupBy(col("__id"), col("e.g").as("g"))
        .agg(sum(col("e.c")).as("cn"),
          sum(lit(1L) - col("e.c")).as("rn"))
        .agg(sum(least(col("cn"), col("rn"))).as("m"),
          sum("cn").as("ct"), sum("rn").as("rt"))
        .select(lit(n).as("n"), col("m"), col("ct"), col("rt"))
    }.reduce(_ unionByName _)
    val wide = perN.groupBy().pivot("n", 1 to maxN).agg(
      first(struct(col("m"), col("ct"), col("rt"))))
    def pn(n: Int) = {
      val s = col(n.toString)
      when(s("ct") > 0, s("m").cast("double") / s("ct").cast("double"))
        .otherwise(lit(0.0))
    }
    def rn(n: Int) = {
      val s = col(n.toString)
      when(s("rt") > 0, s("m").cast("double") / s("rt").cast("double"))
        .otherwise(lit(0.0))
    }
    // fixed n-ascending fold — deterministic association order
    val p = (1 to maxN).map(pn).reduce(_ + _) / lit(maxN.toDouble)
    val r = (1 to maxN).map(rn).reduce(_ + _) / lit(maxN.toDouble)
    val b2 = lit(beta * beta)
    wide.select(lit(maxN).as("orders"), round(p, 6).as("chr_p"),
      round(r, 6).as("chr_r"),
      when(b2 * p + r > 0,
        round((lit(1.0) + b2) * p * r / (b2 * p + r), 6)).as("chrf"))
  }

  /** Fleiss' kappa (Fleiss 1971) — chance-corrected agreement for a
    * FIXED number of raters r per item, the multi-rater extension of
    * [[cohensKappa]] a labeling-pipeline QA report needs once more
    * than two annotators touch each document. From the long
    * (item, category) assignment table: per-item agreement
    * `P_i = (Σ_j n_ij² − r) / (r(r−1))`, overall `P̄`, chance
    * `P_e = Σ_j p_j²` over the pooled category shares, and
    * `κ = (P̄ − P_e)/(1 − P_e)` — null when `P_e = 1` (a single
    * category; loud, not 0). Items with an assignment count ≠ r are
    * REJECTED with a require (unbalanced panels need a different
    * estimator), so the operator cannot silently mis-normalize.
    *
    * Parity: `Σ_i Σ_j n_ij²` and the per-category totals are integer
    * aggregates; P̄ and P_e form as single divisions/fixed-order
    * expressions of those integers — engine-bit-identical before the
    * round-6. Scale: two keyed aggregations (item×category, then
    * category), both map-side combined; output is one row:
    * `n_items, n_raters, p_bar, p_e, kappa`. */
  def fleissKappa(assignments: DataFrame, itemCol: String,
      categoryCol: String, nRaters: Int): DataFrame = {
    require(nRaters >= 2, s"fleissKappa: need >= 2 raters, got $nRaters")
    val cell = assignments
      .filter(col(itemCol).isNotNull && col(categoryCol).isNotNull)
      .groupBy(col(itemCol).as("__i"), col(categoryCol).as("__j"))
      .agg(count(lit(1)).as("nij"))
    val perItem = cell.groupBy("__i")
      .agg(sum(col("nij") * col("nij")).as("sq"), sum("nij").as("tot"))
    val r = lit(nRaters.toLong)
    val agg = perItem.agg(count(lit(1)).as("n_items"),
      sum("sq").as("sumsq"),
      sum(when(col("tot") =!= r, 1L).otherwise(0L)).as("__bad"))
    val cat = cell.groupBy("__j").agg(sum("nij").as("cj"))
      .agg(sum(col("cj") * col("cj")).as("c2"), sum("cj").as("ctot"))
    val pBar = (col("sumsq").cast("double") -
        col("n_items").cast("double") * r.cast("double")) /
      (col("n_items").cast("double") * r.cast("double") *
        (r.cast("double") - lit(1.0)))
    val pE = col("c2").cast("double") /
      (col("ctot").cast("double") * col("ctot").cast("double"))
    // the guard rides the kept n_items column — a dropped check column
    // would be PRUNED by Catalyst and never fire
    agg.crossJoin(broadcast(cat))
      .select(
        when(col("__bad") > 0, raise_error(concat(lit(
            "fleissKappa: items with assignment count != nRaters: "),
            col("__bad").cast("string"))))
          .otherwise(col("n_items")).cast("long").as("n_items"),
        lit(nRaters).as("n_raters"),
        round(pBar, 6).as("p_bar"), round(pE, 6).as("p_e"),
        when(pE < 1.0, round((pBar - pE) / (lit(1.0) - pE), 6))
          .as("kappa"))
  }

  /** Distinct-n generation diversity (Li et al. 2016's distinct-1/
    * distinct-2) — the mode-collapse alarm for model samples: per
    * n-gram order, the corpus-pooled count of DISTINCT n-grams over
    * the total emitted, low ratios meaning the generator repeats
    * itself. The eval battery's diversity leg next to [[bleu]]
    * (fidelity) and [[chrF]].
    *
    * One tokenize fan-out per order; the distinct count is Spark's
    * two-phase partial-distinct aggregation (map-side dedup absorbs
    * the repeats that make the metric interesting) — no window, no
    * collect. Integers until the one division per order (round-6).
    * Output: `(n, n_total, n_distinct, distinct_ratio)`, one row per
    * order; an order with zero grams (all texts shorter than n)
    * reports a null ratio. */
  def distinctN(df: DataFrame, textCol: String, maxN: Int = 2)
      : DataFrame = {
    require(maxN >= 1 && maxN <= 6,
      s"distinctN: maxN must be in [1, 6], got $maxN")
    (1 to maxN).map { n =>
      val grams = df
        .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
        .select(explode(Dedup.shingles(
          TextAnalysis.tokens(col(textCol)), n)).as("__g"))
      grams.agg(count(lit(1)).as("n_total"),
          count_distinct(col("__g")).as("n_distinct"))
        .select(lit(n).as("n"), col("n_total"), col("n_distinct"),
          when(col("n_total") > 0,
            round(col("n_distinct").cast("double") /
              col("n_total").cast("double"), 6)).as("distinct_ratio"))
    }.reduce(_ unionByName _)
  }

  /** Split-conformal calibration threshold (Vovk et al. 2005; Lei et
    * al. 2018's split form) — "set the quality-gate cutoff so at most
    * α of good documents are wrongly dropped, GUARANTEED": from a
    * held-out calibration set of nonconformity scores, the threshold
    * is the ⌈(n+1)(1−α)⌉-th SMALLEST score — the exact finite-sample
    * order statistic, NOT an interpolated percentile (interpolation
    * voids the coverage guarantee the method exists for). Scores
    * s ≤ q̂ then cover ≥ 1−α of exchangeable future draws.
    *
    * Scale: the order statistic rides [[graft.operators.Rank
    * .globalRank]] (one range exchange, no corpus window, id
    * tiebreak); the empirical-coverage check is a second scan with
    * the 1-row threshold broadcast. When ⌈(n+1)(1−α)⌉ > n (tiny
    * calibration sets at small α) the threshold is null and coverage
    * reports 1.0 — "keep everything", loudly visible rather than an
    * extrapolated cutoff.
    *
    * Parity: k comes from one double multiply + ceil of exact
    * integers; the threshold is a score value the data carries;
    * coverage is a single integer ratio. Output one row:
    * `n, k, qhat, coverage`. */
  def conformalThreshold(df: DataFrame, scoreCol: String, idCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1,
      s"conformalThreshold: alpha must be in (0,1), got $alpha")
    val base = df
      .filter(col(scoreCol).isNotNull && col(idCol).isNotNull &&
        !isnan(col(scoreCol).cast("double")))
      .select(col(scoreCol).cast("double").as("__s"),
        col(idCol).as("__id"))
    val ranked = Rank.globalRank(base, Seq(col("__s").asc,
      col("__id").asc), outCol = "__r")
    val nRow = base.agg(count(lit(1)).as("n"))
    val kExpr = ceil((col("n").cast("double") + lit(1.0)) *
      lit(1.0 - alpha)).cast("long")
    val thr = ranked.crossJoin(broadcast(nRow))
      .filter(col("__r") === kExpr)
      .agg(max("__s").as("qhat"))
    base.crossJoin(broadcast(nRow.select(col("n"), kExpr.as("k"))))
      .crossJoin(broadcast(thr))
      .groupBy("n", "k", "qhat")
      .agg(sum(when(col("__s") <= col("qhat"), 1L).otherwise(0L))
        .as("__cov"))
      .select(col("n"), col("k"), col("qhat"),
        when(col("qhat").isNull, lit(1.0))
          .otherwise(round(col("__cov").cast("double") /
            col("n").cast("double"), 6)).as("coverage"))
  }

  /** Paired sign-flip permutation test (the randomization test of
    * Fisher 1935; Dror et al. 2018 for its NLP-eval use) — "is system
    * A actually better than system B, or is the mean delta luck?":
    * the significance companion to [[graft.operators.Sampling
    * .poissonBootstrapCI]]'s interval. Per paired item the delta
    * `a − b` is quantized to `scale` decimal digits
    * (`floor(d·10^scale + 0.5)`, integer-exact on any engine); under
    * H₀ the pair labels are exchangeable, so each of `replicates`
    * deterministic sign patterns (`md5(salt|rep|id)` parity — task-
    * retry-stable, no RNG state) flips each delta independently. The
    * two-sided p-value uses the add-one estimator
    * `(1 + #{|perm_mean| ≥ |obs_mean|}) / (R + 1)` (Phipson & Smyth
    * 2010 — never reports an impossible 0). Output one row:
    * `n, obs_diff, n_extreme, p_value`.
    *
    * Parity: replicate means are single divisions of exact long sums
    * (count is replicate-invariant, so comparing `|Σ±d_i|` as longs
    * would be equivalent; the division keeps the output readable) and
    * the `≥` compares doubles both engines derive identically.
    *
    * Scale: the deltas scan once, fan out ×R on integer rows, and
    * collapse map-combined to R partial sums — the
    * [[Sampling.poissonBootstrapCI]] shape. No windows, no corpus
    * materialization; R is the only growth knob. */
  def permutationTest(df: DataFrame, idCol: String, aCol: String,
      bCol: String, replicates: Int = 64, scale: Int = 6,
      salt: String = "perm"): DataFrame = {
    require(replicates >= 1, "permutationTest: replicates must be >= 1")
    require(scale >= 0 && scale <= 9, "permutationTest: scale in [0,9]")
    val m = math.pow(10.0, scale)
    val base = df.filter(col(idCol).isNotNull && col(aCol).isNotNull &&
        col(bCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"),
        floor((col(aCol).cast("double") - col(bCol).cast("double")) *
          lit(m) + lit(0.5)).cast("long").as("__d"))
    val obs = base.agg(count(lit(1)).as("n"), sum("__d").as("__s"))
    val flip = conv(substring(md5(concat(lit(salt),
      col("__rep").cast("string"), lit("|"), col("__id"))), 1, 8),
      16, 10).cast("long") % 2
    val reps = base
      .select(col("__id"), col("__d"),
        explode(sequence(lit(0), lit(replicates - 1))).as("__rep"))
      .select(col("__rep"),
        when(flip === 0, col("__d")).otherwise(-col("__d")).as("__sd"))
      .groupBy("__rep").agg(sum("__sd").as("__ps"))
    reps.crossJoin(broadcast(obs))
      .select(col("n"), col("__s"),
        when(abs(col("__ps").cast("double") / col("n").cast("double"))
          >= abs(col("__s").cast("double") / col("n").cast("double")),
          1L).otherwise(0L).as("__x"))
      .groupBy("n", "__s")
      .agg(sum("__x").as("n_extreme"))
      .select(col("n"),
        round(col("__s").cast("double") / col("n").cast("double") /
          lit(m), 6).as("obs_diff"),
        col("n_extreme"),
        round((lit(1.0) + col("n_extreme").cast("double")) /
          lit((replicates + 1).toDouble), 6).as("p_value"))
  }

  /** Composable reference form of [[graft.functions.LcsLength]] —
    * the DP row carried as an array accumulator through nested
    * `aggregate` folds. Semantics twin for specs; O(m) re-evaluation
    * per cell under codegen makes it the wrong hot-path form (the
    * DupNgramRatio inlining trap). */
  private[graft] def lcsHof(cw: Column, rw: Column): Column = {
    val zeros = transform(sequence(lit(0), size(rw)), _ => lit(0))
    val fin = aggregate(cw, zeros, (old, ct) =>
      aggregate(sequence(lit(1), size(rw)),
        slice(zeros, 1, 1),
        (acc, j) => concat(acc, array(greatest(
          element_at(old, j + 1),
          element_at(acc, size(acc)),
          element_at(old, j) +
            when(element_at(rw, j) === ct, 1).otherwise(0))))))
    when(size(cw) === 0 || size(rw) === 0, lit(0))
      .otherwise(element_at(fin, -1))
  }

  /** F1-optimal decision threshold — "where do I actually CUT?" after
    * [[auc]] says the scores rank well and [[calibrationReport]] says
    * the probabilities mean something: sweep EVERY observed score as a
    * candidate `predict positive when score ≥ t` threshold and return
    * the one maximizing F1, with the full confusion row at that point.
    * The quality-classifier gating decision
    * ([[graft.operators.Pipelines]] curation) made from exact counts
    * instead of a hand-picked 0.5.
    *
    * Exactness: per-threshold TP/FP are INTEGER cumulative counts
    * over the score-DESCENDING order (two audited
    * [[graft.operators.Rank.globalRunningSum]] passes over the
    * checkpointed per-score count table — the [[graft.operators
    * .Profiles.ksTest]] lineage-pinning pattern); F1 per candidate is
    * one fixed-order double expression QUANTIZED to a 1e-12 long, and
    * the argmax picks (max quantized F1, then HIGHEST threshold — the
    * conservative tie-break), so the winner is engine-exact. No
    * positive labels raises by name (F1 undefined, not zero).
    *
    * Output one row: `(threshold, tp, fp, fn, tn, precision, recall,
    * f1)` (floats round 6). */
  def bestThreshold(df: DataFrame, score: Column, label: Column)
      : DataFrame = {
    val base = df
      .filter(score.isNotNull && label.isNotNull &&
        !isnan(score.cast("double")))
      .select(score.cast("double").as("__v"),
        when(label.cast("boolean"), 1L).otherwise(0L).as("__y"))
    val counts = base.groupBy("__v")
      .agg(sum(col("__y")).as("__p"), sum(lit(1L) - col("__y")).as("__q"))
      .pinned
    val o1 = Seq(col("__v").desc, col("__p").asc, col("__q").asc)
    val ra = Rank.globalRunningSum(counts, o1, "__p", "__tp")
      .pinned
    val run = Rank.globalRunningSum(ra, o1 :+ col("__tp").asc,
      "__q", "__fp")
    val tot = counts.agg(sum("__p").as("__pt"), sum("__q").as("__nt"))
      .select(when(col("__pt").isNull || col("__pt") === 0L,
        raise_error(lit("bestThreshold: no positive labels — F1 is " +
          "undefined, not zero; check the label expression")))
        .otherwise(col("__pt")).as("__pt"),
        coalesce(col("__nt"), lit(0L)).as("__nt"))
    // cand is consumed THREE times (max, tie-break pick, final row) —
    // checkpoint it or each consumer replays the cumulative lineage
    // (pin-measured 28 exchanges without; ≤8 with)
    val cand = run.crossJoin(broadcast(tot))
      .select(col("__v"), col("__tp"), col("__fp"),
        (col("__pt") - col("__tp")).as("__fn"),
        (col("__nt") - col("__fp")).as("__tn"), col("__pt"))
      .withColumn("__f1q", floor(
        lit(2.0) * col("__tp").cast("double") /
          (lit(2L) * col("__tp") + col("__fp") + col("__fn"))
            .cast("double") * lit(1e12) + lit(0.5)))
      .pinned
    val best = cand.agg(max(col("__f1q")).as("__m"))
    val pick = cand.join(broadcast(best), col("__f1q") === col("__m"))
      .agg(max(col("__v")).as("__bv"))
    cand.join(broadcast(pick), col("__v") === col("__bv"))
      .select(col("__v").as("threshold"), col("__tp").as("tp"),
        col("__fp").as("fp"), col("__fn").as("fn"), col("__tn").as("tn"),
        round(col("__tp").cast("double") /
          (col("__tp") + col("__fp")).cast("double"), 6).as("precision"),
        round(col("__tp").cast("double") / col("__pt").cast("double"), 6)
          .as("recall"),
        round(lit(2.0) * col("__tp").cast("double") /
          (lit(2L) * col("__tp") + col("__fp") + col("__fn"))
            .cast("double"), 6).as("f1"))
  }
}
