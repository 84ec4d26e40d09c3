package graft.operators

import graft.operators.Checkpoints.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream (the view→click→purchase
  * question every product-analytics workload asks; the batch sibling of
  * the sessionization family).
  *
  * Semantics: per user, the GREEDY earliest completion — step 1's time
  * is the user's earliest step-1 event, step k's time is the earliest
  * step-k event STRICTLY after step k−1's time. Greedy-earliest is
  * optimal (an earlier step-k time can only widen the choices for step
  * k+1), so `reached` is the maximum number of funnel steps completable
  * in order. Ties at the same timestamp do NOT advance the funnel (the
  * next step must be strictly later — simultaneous view+click is not a
  * sequence).
  *
  * Output: `(user_id, reached, t_<step1>, …, t_<stepK>)` — step times
  * in the input's timestamp unit, null from the first uncompleted step
  * on (non-null columns are always a prefix). Every user appears, even
  * at `reached = 0`.
  *
  * Scale shape: ONE user-keyed exchange; each user's events buffer in
  * the sorted per-user fold (the [[graft.streaming.EventStreams]]
  * sessionization trade — bounded by per-user activity, not corpus
  * size; a pathological power-user key is the same skew surface
  * sessionization documents). The fold is O(events · steps) with an
  * O(steps) state array — no self-joins, no per-step corpus scans. */
object Funnel {

  def funnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must not be empty")
    require(steps.distinct.size == steps.size,
      "funnel: repeated step names would make the output columns " +
        s"ambiguous: $steps")
    val k = steps.size
    val sorted = df
      .groupBy(col(userCol).as("user_id"))
      .agg(sort_array(collect_list(struct(
        col(tsCol).cast("long").as("ts"),
        col(typeCol).as("et")))).as("__ev"))
    val init = array((0 until k).map(_ => lit(null).cast("bigint")): _*)
    val folded = sorted.withColumn("__t",
      aggregate(col("__ev"), init, (acc, e) => {
        val ts = e.getField("ts")
        val et = e.getField("et")
        def setAt(j: Int): Column =
          concat(slice(acc, 1, j), array(ts),
            slice(acc, j + 2, k - j - 1))
        // first fillable step wins (k−1 … 0 fold ⇒ step 0 outermost)
        (k - 1 to 0 by -1).foldLeft(acc) { (els, j) =>
          val prevOk =
            if (j == 0) lit(true)
            else element_at(acc, j).isNotNull && ts > element_at(acc, j)
          when(element_at(acc, j + 1).isNull && et === steps(j) && prevOk,
            setAt(j)).otherwise(els)
        }
      }))
    val stepCols = steps.zipWithIndex.map { case (s, i) =>
      element_at(col("__t"), i + 1).as(s"t_$s")
    }
    folded.select(
      col("user_id") +:
        size(filter(col("__t"), t => t.isNotNull)).cast("long")
          .as("reached") +:
        stepCols: _*)
  }

  /** Retention cohorts — the other classic event-analytics rollup: a
    * user's cohort is the period of their FIRST event (`ts div
    * periodLen`, any integral time unit), and each later active period
    * counts them at its offset. Output: `(cohort, period_offset,
    * n_users)` — offset 0 rows carry each cohort's size, so retention
    * rates are one self-division downstream.
    *
    * Scale shape: one user-keyed aggregation (map-side combined)
    * carrying `min(period)` + the DISTINCT active-period set — bounded
    * per user by the time span, never by event count — then one
    * (cohort, offset)-keyed count. No joins, no windows, no self-scan:
    * the naive cohort query (min-date table joined back to the events)
    * re-scans and shuffles the full event log a second time. */
  def retentionCohorts(df: DataFrame, userCol: String, tsCol: String,
      periodLen: Long): DataFrame = {
    require(periodLen >= 1, s"periodLen must be >= 1, got $periodLen")
    // integral `div`, NOT `/`: Column `/` is double division, and a
    // nanosecond epoch (~1.7e18) is far beyond double's 2^53 integer
    // range — the float round-trip would misassign period boundaries
    val qn = "`" + tsCol.replace("`", "``") + "`"
    val period = expr(s"CAST($qn AS BIGINT) div $periodLen").as("__p")
    df.select(col(userCol).as("user_id"), period)
      .groupBy("user_id")
      .agg(min(col("__p")).as("cohort"),
        collect_set(col("__p")).as("__days"))
      .select(col("cohort"), explode(col("__days")).as("__p"))
      .groupBy(col("cohort"),
        (col("__p") - col("cohort")).as("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** SCD-2 validity intervals from a change log: one row per (key,
    * state) observation becomes (key, state, valid_from, valid_to),
    * `valid_to` = the NEXT observation's timestamp (null for the
    * current state) — the slowly-changing-dimension table a change
    * stream compacts into, built with one key-partitioned `lead`
    * (per-key windows parallelize across keys; a key's history must
    * fit one task — the usual dimension-table shape, not the event
    * firehose). Ties on `tsCol` within a key are ordered by `stateCol`
    * so the result is deterministic; equal-timestamp states produce
    * zero-length intervals rather than silently dropping one.
    *
    * Output: key, state, valid_from, valid_to (all original types). */
  def scdIntervals(df: DataFrame, keyCol: String, stateCol: String,
      tsCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCol).orderBy(col(tsCol).asc, col(stateCol).asc)
    df.select(col(keyCol), col(stateCol), col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumnRenamed(tsCol, "valid_from")
  }

  /** Inactivity-gap sessionization — THE event-stream grouping
    * primitive (web analytics' "30-minute session", training-log run
    * segmentation): an event starts a new session when more than
    * `gapNanos` elapsed since the user's previous event. Returns one
    * row per SESSION: `(user_id, session_idx, start_ts, end_ts,
    * n_events)` with `session_idx` 1-based in time order.
    *
    * Exactness: timestamps are integer nanos end-to-end; the
    * session index is an integer running sum of boundary flags —
    * engine-exact under any association order. Ties on `tsCol` break
    * by `tieCol` (a unique event id), so the walk is total-ordered
    * and replayable.
    *
    * Scale: both windows partition BY USER — bounded by per-user
    * activity, never corpus-sized (the [[funnel]]/[[scdIntervals]]
    * contract; a pathological power-user needs an upstream cap). The
    * session aggregation reuses the same (user) keying, so AQE plans
    * one exchange for the windows and one map-side-combined agg. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapNanos: Long): DataFrame = {
    require(gapNanos > 0L,
      s"Funnel.sessionize: gapNanos must be > 0, got $gapNanos")
    // the window must reference the POST-projection names — the caller's
    // columns are gone once the frame narrows to (user_id, ts, __tie)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("__tie").asc)
    val flagged = df
      .select(col(userCol).as("user_id"), col(tsCol).cast("long").as("ts"),
        col(tieCol).as("__tie"))
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("ts") - col("__prev") > gapNanos, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        count(lit(1)).as("n_events"))
  }

  /** Kaplan–Meier survival estimate (Kaplan & Meier 1958) — retention
    * with CENSORING done right: [[retentionCohorts]] counts who came
    * back, but users still active at the observation cutoff are not
    * churned, and dropping them biases survival down. Input is one
    * row per subject: `durationCol` (time observed, any integer
    * unit) and `eventCol` (true = the event fired at that time;
    * false = censored — observation simply ended). Output one row per
    * distinct duration: `n_at_risk`, `d_events`, `censored`, and
    * `log_survival = Σ_{u ≤ t} ln(1 − d(u)/n(u))` — the log of the
    * product-limit estimator. Reported in LOG space deliberately:
    * `exp` diverges by 1 ulp across engines on ~0.2% of inputs (the
    * q234 measurement), while the quantized-ln sum is
    * association-order-exact; callers exp() locally for display.
    * Once some time has d = n (everyone at risk fails), survival IS
    * zero and `log_survival` is null from that point on (−∞ has no
    * finite log).
    *
    * Exactness + scale: per-duration counts (one corpus aggregation,
    * checkpointed), then three audited [[graft.operators.Rank
    * .globalRunningSum]] passes over the distinct-duration table
    * (cumulative observations → n_at_risk; cumulative quantized ln
    * terms → log survival; cumulative zero-survival flags), each
    * checkpointed — the [[graft.operators.Profiles.wasserstein1]]
    * lineage-pinning pattern. ln terms quantize at 1e-12 (the
    * coOccurrence convention). */
  def kaplanMeier(df: DataFrame, durationCol: String, eventCol: String)
      : DataFrame = {
    val base = df
      .select(col(durationCol).cast("long").as("__t"),
        when(col(eventCol).cast("boolean"), 1L).otherwise(0L).as("__e"))
      .filter(col("__t").isNotNull && col("__t") >= 0L)
    val counts = base.groupBy("__t")
      .agg(count(lit(1)).as("__m"), sum(col("__e")).as("__d"))
      .pinned
    val o1 = Seq(col("__t").asc, col("__m").asc, col("__d").asc)
    val run1 = Rank.globalRunningSum(counts, o1, "__m", "__cum")
      .pinned
    val tot = counts.agg(sum(col("__m")).as("__N"))
    val staged = run1.crossJoin(broadcast(tot))
      .withColumn("__n", col("__N") - (col("__cum") - col("__m")))
      .withColumn("__lnq", when(col("__d") < col("__n"), floor(
        log((col("__n") - col("__d")).cast("double") /
          col("__n").cast("double")) * lit(1e12) + lit(0.5)))
        .otherwise(lit(0L)))
      .withColumn("__zf",
        when(col("__d") === col("__n"), 1L).otherwise(0L))
      .select(col("__t"), col("__m"), col("__d"), col("__cum"),
        col("__n"), col("__lnq"), col("__zf"))
      .pinned
    val o2 = Seq(col("__t").asc, col("__m").asc, col("__d").asc,
      col("__cum").asc, col("__n").asc, col("__lnq").asc,
      col("__zf").asc)
    val run2 = Rank.globalRunningSum(staged, o2, "__lnq", "__lncum")
      .pinned
    val run3 = Rank.globalRunningSum(run2, o2 :+ col("__lncum").asc,
      "__zf", "__zcum")
    run3.select(col("__t").as("t"), col("__n").as("n_at_risk"),
      col("__d").as("d_events"), (col("__m") - col("__d")).as("censored"),
      when(col("__zcum") === 0L,
        round(col("__lncum").cast("double") / lit(1e12), 6))
        .as("log_survival"))
  }

  /** Log-rank test (Mantel 1966) — [[kaplanMeier]]'s comparison
    * companion: "do the two groups' survival curves differ?" as one
    * χ² statistic (1 df; ≳3.84 is the usual p<0.05 line — the CDF
    * lookup is the caller's table, not an engine op). At each pooled
    * event time, group 1's observed events are compared with the
    * hypergeometric expectation `E₁ = d·n₁/n` and variance
    * `V = d·(n₁/n)·(n₂/n)·(n−d)/(n−1)`;
    * `χ² = (Σ(d₁−E₁))² / ΣV`. The A/B-retention significance test
    * with censoring handled correctly — a [[retentionCohorts]] diff
    * can't say this.
    *
    * Exactness + scale: the per-time (m₁, d₁, m₂, d₂) table comes
    * from ONE pooled aggregation (checkpointed); the two at-risk
    * cumulatives are chained checkpointed [[graft.operators.Rank
    * .globalRunningSum]] passes (the [[kaplanMeier]] pattern); each
    * time's E₁ and V are fixed-order double expressions QUANTIZED to
    * 1e-9 longs, so the sums are association-order-exact. Times with
    * d = 0 contribute 0; V additionally needs n > 1 (its n−1
    * denominator), while E₁ is summed at EVERY event time so it stays
    * paired with the d₁ that observed_a counts (at n = 1, E₁ = d₁).
    * χ² is null when ΣV = 0 (no informative event times).
    *
    * Output one row: `(n_a, n_b, observed_a, expected_a, chi2)`. */
  def logrank(df: DataFrame, durationCol: String, eventCol: String,
      groupCol: String): DataFrame = {
    val base = df
      .select(col(durationCol).cast("long").as("__t"),
        when(col(eventCol).cast("boolean"), 1L).otherwise(0L).as("__e"),
        when(col(groupCol).cast("boolean"), 1L).otherwise(0L).as("__g"))
      .filter(col("__t").isNotNull && col("__t") >= 0L)
    val counts = base.groupBy("__t")
      .agg(sum(col("__g")).as("__m1"),
        sum(lit(1L) - col("__g")).as("__m2"),
        sum(col("__e") * col("__g")).as("__d1"),
        sum(col("__e") * (lit(1L) - col("__g"))).as("__d2"))
      .pinned
    val o1 = Seq(col("__t").asc, col("__m1").asc, col("__m2").asc,
      col("__d1").asc, col("__d2").asc)
    val run1 = Rank.globalRunningSum(counts, o1, "__m1", "__c1")
      .pinned
    val run2 = Rank.globalRunningSum(run1, o1 :+ col("__c1").asc,
      "__m2", "__c2")
    val tot = counts.agg(sum(col("__m1")).as("__N1"),
      sum(col("__m2")).as("__N2"))
    val staged = run2.crossJoin(broadcast(tot))
      .withColumn("__n1", col("__N1") - (col("__c1") - col("__m1")))
      .withColumn("__n2", col("__N2") - (col("__c2") - col("__m2")))
      .withColumn("__n", col("__n1") + col("__n2"))
      .withColumn("__d", col("__d1") + col("__d2"))
    val n1d = col("__n1").cast("double")
    val n2d = col("__n2").cast("double")
    val nd = col("__n").cast("double")
    val dd = col("__d").cast("double")
    // E₁ = d·n₁/n is well-defined at every event time (n ≥ 1 whenever
    // d > 0) and MUST be summed wherever observed_a sums d₁, or O and
    // E come unpaired: at an n = 1 event time E₁ = d₁ exactly, so
    // guarding E₁ behind n > 1 while still counting the event inflates
    // χ² (e.g. A=(1,ev),(2,ev) vs B=(1,ev) → 2 instead of 0.5). Only
    // the variance term carries the n > 1 guard — its n−1 denominator.
    val e1q = when(col("__d") > 0L,
      floor(dd * n1d / nd * lit(1e9) + lit(0.5))).otherwise(lit(0L))
    val vq = when(col("__n") > 1L && col("__d") > 0L,
      floor(dd * (n1d / nd) * (n2d / nd) *
        (nd - dd) / (nd - lit(1.0)) * lit(1e9) + lit(0.5)))
      .otherwise(lit(0L))
    staged
      .select(col("__N1"), col("__N2"), col("__d1"),
        e1q.as("__e1q"), vq.as("__vq"))
      .agg(max(col("__N1")).as("n_a"), max(col("__N2")).as("n_b"),
        sum(col("__d1")).as("observed_a"),
        sum(col("__e1q")).as("__se1"), sum(col("__vq")).as("__sv"))
      .select(col("n_a"), col("n_b"), col("observed_a"),
        round(col("__se1").cast("double") / lit(1e9), 6)
          .as("expected_a"),
        when(col("__sv") > 0L, round(
          (col("observed_a").cast("double") -
            col("__se1").cast("double") / lit(1e9)) *
          (col("observed_a").cast("double") -
            col("__se1").cast("double") / lit(1e9)) /
          (col("__sv").cast("double") / lit(1e9)), 6)).as("chi2"))
  }

  /** First-order Markov transition matrix over per-user event-type
    * sequences — "what follows what" (behavior modeling, anomaly
    * baselines, synthetic-trace generation): for each observed
    * (from, to) adjacent pair in a user's time-ordered walk,
    * `n` transitions and `p = n / Σ_to n` the row-normalized
    * probability. Transitions never cross users. Integer counts; `p`
    * is one exact division, rounded to 6.
    *
    * Scale: one per-user LEAD window (bounded by per-user activity,
    * the [[sessionize]] contract) into a map-side-combined pair
    * aggregation; the per-from totals table is |event types|-sized
    * and joins broadcast. */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__u")).orderBy(col("__ts").asc, col("__tie").asc)
    val pairs = df
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), col(typeCol).as("from_type"))
      .filter(col("__u").isNotNull && col("__ts").isNotNull &&
        col("from_type").isNotNull)
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type")
      .agg(sum(col("n")).as("__tot"))
    counts.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("__tot").cast("double"), 6)
          .as("p"))
  }
}
