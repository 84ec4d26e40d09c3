package graft.operators

import graft.operators.Checkpoints.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints — the ingest gate a pipeline
  * runs BEFORE training sees a new drop (the Deequ / great-expectations
  * primitive, rebuilt Spark-first): a constraint suite compiles to ONE
  * aggregation pass over the table, the KB-sized observation row fans
  * back out into a long-format report, and nothing is computed twice.
  *
  * Scale notes: every check is an aggregate expression riding the same
  * group-less aggregation (partial-combined map-side, one single-row
  * exchange). The exception is [[Unique]], whose exact COUNT(DISTINCT)
  * makes Spark plan an Expand over the distinct columns (k distinct
  * aggregates ⇒ k× row multiplication before the partial agg) — fine
  * for a handful of key columns, and [[UniqueApprox]] is the
  * sketch-based alternative when the column count grows. */
object Checks {

  sealed trait Constraint {
    /** Stable report key. */
    def label: String

    /** Column under check ("" for table-level). */
    def column: String
  }

  /** Fraction of non-null values must be ≥ `minFrac` (1.0 = no nulls
    * allowed). */
  final case class NotNull(col: String, minFrac: Double = 1.0)
      extends Constraint {
    val label = "not_null"; val column = col
  }

  /** Column values must be globally unique (exact distinct count ==
    * non-null count; nulls don't count as duplicates of each other). */
  final case class Unique(col: String) extends Constraint {
    val label = "unique"; val column = col
  }

  /** Unique up to HLL sketch error: estimate ≥ (1−`tol`)·count. The
    * mergeable form for wide key audits — no Expand. */
  final case class UniqueApprox(col: String, tol: Double = 0.05)
      extends Constraint {
    val label = "unique_approx"; val column = col
  }

  /** Fraction of non-null values inside [lo, hi] must be ≥ `minFrac`. */
  final case class InRange(col: String, lo: Double, hi: Double,
      minFrac: Double = 1.0) extends Constraint {
    val label = "in_range"; val column = col
  }

  /** Fraction of non-null values in `values` must be ≥ `minFrac`. */
  final case class AcceptedValues(col: String, values: Seq[String],
      minFrac: Double = 1.0) extends Constraint {
    val label = "accepted_values"; val column = col
  }

  /** Fraction of non-null values matching `regex` (full-match RLIKE
    * semantics are NOT implied — this is `rlike`, i.e. find-anywhere)
    * must be ≥ `minFrac`. */
  final case class MatchesRegex(col: String, regex: String,
      minFrac: Double = 1.0) extends Constraint {
    val label = "matches_regex"; val column = col
  }

  /** Table must have at least `n` rows. */
  final case class MinRows(n: Long) extends Constraint {
    val label = "min_rows"; val column = ""
  }

  /** Runs the suite in ONE aggregation pass. Report columns:
    * `check`, `column`, `observed` (the measured fraction/count as
    * double, rounded to 9 places for cross-engine stability),
    * `threshold`, `passed`. Rows ordered suite-order. */
  def run(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "Checks.run: empty constraint suite")
    val names = df.columns.toSet
    constraints.foreach {
      case c: Constraint if c.column.nonEmpty =>
        require(names.contains(c.column),
          s"Checks.run: no column '${c.column}' for ${c.label}")
      case _ => ()
    }
    def frac(pred: Column, base: Column): Column = {
      // avg over the base population; empty base → null → handled by
      // the pass rule (vacuously true, the SQL convention)
      val p = sum(when(base, when(pred, 1.0d).otherwise(0.0d)))
      val n = sum(when(base, 1.0d))
      p / n
    }
    // one aggregate expression (+ optional companions) per constraint
    val obs: Seq[(Constraint, Column, Column => Column)] =
      constraints.map {
        case c @ NotNull(cc, minFrac) =>
          (c, frac(col(cc).isNotNull, lit(true)),
            (o: Column) => coalesce(o >= lit(minFrac), lit(true)))
        case c @ Unique(cc) =>
          // observed = duplicate count (0 when unique)
          (c, count(col(cc)).cast("double") -
            countDistinct(col(cc)).cast("double"),
            (o: Column) => o === 0.0d)
        case c @ UniqueApprox(cc, tol) =>
          (c, hll_sketch_estimate(hll_sketch_agg(col(cc), lit(12)))
            .cast("double") / count(col(cc)).cast("double"),
            (o: Column) => coalesce(o >= lit(1.0 - tol), lit(true)))
        case c @ InRange(cc, lo, hi, minFrac) =>
          (c, frac(col(cc).cast("double").between(lo, hi),
            col(cc).isNotNull),
            (o: Column) => coalesce(o >= lit(minFrac), lit(true)))
        case c @ AcceptedValues(cc, vs, minFrac) =>
          (c, frac(col(cc).isin(vs: _*), col(cc).isNotNull),
            (o: Column) => coalesce(o >= lit(minFrac), lit(true)))
        case c @ MatchesRegex(cc, re, minFrac) =>
          (c, frac(col(cc).rlike(re), col(cc).isNotNull),
            (o: Column) => coalesce(o >= lit(minFrac), lit(true)))
        case c @ MinRows(n) =>
          (c, count(lit(1)).cast("double"),
            (o: Column) => o >= lit(n.toDouble))
      }
    val aggCols = obs.zipWithIndex.map { case ((_, a, _), i) =>
      a.as(s"__o$i")
    }
    val row = df.agg(aggCols.head, aggCols.tail: _*)
    val reportRows = obs.zipWithIndex.map { case ((c, _, pass), i) =>
      val o = round(col(s"__o$i"), 9)
      struct(
        lit(c.label).as("check"),
        lit(c.column).as("column"),
        o.as("observed"),
        lit(thresholdOf(c)).as("threshold"),
        pass(col(s"__o$i")).as("passed"))
    }
    row.select(explode(array(reportRows: _*)).as("r"))
      .select(col("r.check"), col("r.column"), col("r.observed"),
        col("r.threshold"), col("r.passed"))
  }

  private def thresholdOf(c: Constraint): Double = c match {
    case NotNull(_, f) => f
    case Unique(_) => 0.0
    case UniqueApprox(_, t) => 1.0 - t
    case InRange(_, _, _, f) => f
    case AcceptedValues(_, _, f) => f
    case MatchesRegex(_, _, f) => f
    case MinRows(n) => n.toDouble
  }

  /** True iff every constraint passed — the gate form for a
    * promote-or-quarantine ingest decision. */
  def passes(df: DataFrame, constraints: Seq[Constraint]): Boolean =
    run(df, constraints).agg(min(col("passed"))).collect()
      .head.getBoolean(0)

  /** ZERO-extra-scan checks: attaches the suite as `Dataset.observe`
    * metrics, so the observations ride whatever action the caller was
    * already running (a parquet write, a count, a downstream job) —
    * [[run]] costs a dedicated pass; this costs nothing. Returns the
    * instrumented frame plus the `Observation`; AFTER an action has
    * materialized the frame, [[reportFromObservation]] turns the
    * collected metrics into the same (check, column, observed,
    * threshold, passed) rows.
    *
    * [[Unique]] is rejected here: observation metrics cannot contain
    * distinct aggregates (Spark's `observe` contract) — use
    * [[UniqueApprox]]'s sketch, which is a plain aggregate. */
  def observed(df: DataFrame, constraints: Seq[Constraint],
      name: String = "graft_checks")
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(constraints.nonEmpty, "Checks.observed: empty suite")
    require(!constraints.exists(_.isInstanceOf[Unique]),
      "Checks.observed: observe metrics cannot contain distinct " +
        "aggregates — use UniqueApprox for uniqueness under observation")
    val obs = org.apache.spark.sql.Observation(name)
    val aggCols = observationAggs(df, constraints)
    (df.observe(obs, aggCols.head, aggCols.tail: _*), obs)
  }

  /** Builds the per-constraint metric expressions (shared layout with
    * [[observed]]/[[reportFromObservation]]: metric i is `__o{i}`,
    * sketch-typed metrics additionally resolve to their estimate). */
  private def observationAggs(df: DataFrame,
      constraints: Seq[Constraint]): Seq[Column] = {
    val names = df.columns.toSet
    constraints.foreach { c =>
      if (c.column.nonEmpty) require(names.contains(c.column),
        s"Checks: no column '${c.column}' for ${c.label}")
    }
    def frac(pred: Column, base: Column): Column = {
      val p = sum(when(base, when(pred, 1.0d).otherwise(0.0d)))
      val n = sum(when(base, 1.0d))
      p / n
    }
    constraints.zipWithIndex.map {
      case (NotNull(cc, _), i) =>
        frac(col(cc).isNotNull, lit(true)).as(s"__o$i")
      case (UniqueApprox(cc, _), i) =>
        (hll_sketch_estimate(hll_sketch_agg(col(cc), lit(12)))
          .cast("double") / count(col(cc)).cast("double")).as(s"__o$i")
      case (InRange(cc, lo, hi, _), i) =>
        frac(col(cc).cast("double").between(lo, hi), col(cc).isNotNull)
          .as(s"__o$i")
      case (AcceptedValues(cc, vs, _), i) =>
        frac(col(cc).isin(vs: _*), col(cc).isNotNull).as(s"__o$i")
      case (MatchesRegex(cc, re, _), i) =>
        frac(col(cc).rlike(re), col(cc).isNotNull).as(s"__o$i")
      case (MinRows(_), i) =>
        count(lit(1)).cast("double").as(s"__o$i")
      case (c, _) => throw new IllegalArgumentException(
        s"Checks.observed: unsupported constraint ${c.label}")
    }
  }

  /** Report row from driver-side observation metrics — same shape and
    * pass rules as [[run]]'s output, evaluated from the metric map the
    * action already produced. */
  def reportFromObservation(obs: org.apache.spark.sql.Observation,
      constraints: Seq[Constraint])
      : Seq[(String, String, Option[Double], Double, Boolean)] = {
    val m = obs.get
    constraints.zipWithIndex.map { case (c, i) =>
      val raw = m.get(s"__o$i").collect {
        case d: java.lang.Double => d.doubleValue()
        case l: java.lang.Long => l.doubleValue()
      }
      val passed = c match {
        case MinRows(n) => raw.exists(_ >= n.toDouble)
        case _: UniqueApprox | _: NotNull | _: InRange |
            _: AcceptedValues | _: MatchesRegex =>
          raw.forall(_ >= thresholdOf(c)) // empty base → vacuous pass
        case _: Unique => false // unreachable: rejected in observed()
      }
      (c.label, c.column,
        raw.map(v => BigDecimal(v).setScale(9,
          BigDecimal.RoundingMode.HALF_UP).toDouble),
        thresholdOf(c), passed)
    }
  }

  /** k-anonymity audit over a quasi-identifier tuple — the release
    * check a data-governance pass runs before publishing anything
    * row-level: every combination of `quasiIds` must describe at least
    * `k` rows, else those rows are re-identifiable by joining the
    * published columns against an outside table. Returns the VIOLATING
    * groups only (quasi-id columns + `n`), smallest first — an empty
    * result IS the pass; compose with `.isEmpty` as the gate, or
    * suppress/generalize the returned groups and re-audit (the
    * standard k-anonymization loop). Null quasi-id values form groups
    * like any other value (a null zip code still narrows a join).
    *
    * Scale: ONE keyed aggregation, map-side combined; the violating
    * set is at most (rows / 1) groups but in practice tiny — it is the
    * TAIL of the group-size distribution. */
  def kAnonymityViolations(df: DataFrame, quasiIds: Seq[String],
      k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "Checks.kAnonymity: no quasi-id columns")
    require(k >= 2, s"Checks.kAnonymity: k must be >= 2, got $k")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
      .orderBy(col("n").asc +: quasiIds.map(col(_).asc): _*)
  }

  /** l-diversity audit — k-anonymity's necessary companion: a group
    * can be k-large yet still leak when every member shares the same
    * SENSITIVE value (homogeneity attack — "all 50 patients in that
    * zip+age group have the same diagnosis"). Returns quasi-id groups
    * whose `sensitive` column carries fewer than `l` DISTINCT non-null
    * values, with `n` (group size) and `n_distinct`; empty = the
    * release is l-diverse. Same one-aggregation scale shape as the
    * k-audit (count_distinct partial-aggregates per group). */
  def lDiversityViolations(df: DataFrame, quasiIds: Seq[String],
      sensitive: String, l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "Checks.lDiversity: no quasi-id columns")
    require(!quasiIds.contains(sensitive),
      "Checks.lDiversity: the sensitive column cannot be a quasi-id")
    require(l >= 2, s"Checks.lDiversity: l must be >= 2, got $l")
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("n_distinct"))
      .filter(col("n_distinct") < l)
      .orderBy(col("n_distinct").asc +: col("n").asc +:
        quasiIds.map(col(_).asc): _*)
  }

  /** Gate form of [[kAnonymityViolations]]: keep only rows whose
    * quasi-id group has at least `k` members (suppression — the
    * simplest k-anonymization). One aggregation + a broadcast-size
    * semi-join ONLY when the violating set is small; the join key is
    * the quasi-id tuple. */
  def kAnonymize(df: DataFrame, quasiIds: Seq[String], k: Long)
      : DataFrame = {
    require(quasiIds.nonEmpty, "Checks.kAnonymize: no quasi-id columns")
    require(k >= 2, s"Checks.kAnonymize: k must be >= 2, got $k")
    val bad = kAnonymityViolations(df, quasiIds, k)
      .select(quasiIds.map(col): _*)
    // left_anti on the (small) violating set: null-safe on every
    // quasi-id so null-keyed groups suppress correctly too
    val cond = quasiIds.map(c => df(c) <=> bad(c)).reduce(_ && _)
    df.join(broadcast(bad), cond, "left_anti")
  }

  /** t-closeness audit — the third rung of the release-privacy ladder
    * (Li, Li & Venkatasubramanian 2007): a group can be k-large AND
    * l-diverse yet still leak when its sensitive-value DISTRIBUTION
    * differs sharply from the table's (skewness attack — "that zip+age
    * group is 90% positive where the corpus is 1%"). Flags quasi-id
    * groups whose total-variation distance from the GLOBAL sensitive
    * distribution exceeds `t`, with `n` (rows carrying a sensitive
    * value) and round-6 `distance`; empty = the release is t-close. Null sensitive values
    * are outside both distributions (the l-diversity convention), so
    * all-null-sensitive groups are vacuously close and absent.
    *
    * TVD folds to per-PRESENT-value terms only: for values absent from
    * a group, |0 − p| sums to 1 − Σ_present p_global, so
    * d = ½·(Σ_present |p_grp − p_glob| + 1 − Σ_present p_glob) and the
    * (group, value) table never needs the absent cross product.
    *
    * Scale: one keyed aggregation to (group, value) counts; the global
    * distribution is a SENSITIVE-CARDINALITY-sized aggregate of that
    * table, broadcast back (sensitive attributes are categorical —
    * diagnosis, status; a high-cardinality column is the wrong input
    * here and would make TVD ≈ 1 everywhere anyway); group totals ride
    * a window PARTITIONED by the quasi-ids, bounded per partition by
    * that same cardinality; the closing aggregation reuses the window's
    * hash distribution — two corpus exchanges total, nothing unbounded. */
  def tClosenessViolations(df: DataFrame, quasiIds: Seq[String],
      sensitive: String, t: Double): DataFrame = {
    require(quasiIds.nonEmpty, "Checks.tCloseness: no quasi-id columns")
    require(!quasiIds.contains(sensitive),
      "Checks.tCloseness: the sensitive column cannot be a quasi-id")
    require(t > 0.0 && t < 1.0,
      s"Checks.tCloseness: t must be in (0, 1), got $t")
    val qCols = quasiIds.map(col)
    val gv = df.filter(col(sensitive).isNotNull)
      .groupBy((qCols :+ col(sensitive)): _*)
      .agg(count(lit(1)).as("__n_gv"))
    val glob = gv.groupBy(col(sensitive)).agg(sum("__n_gv").as("__n_v"))
      .crossJoin(broadcast(
        gv.agg(sum("__n_gv").as("__n_tot"))))
      .select(col(sensitive),
        (col("__n_v").cast("double") / col("__n_tot")).as("__p_glob"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qCols: _*)
    gv.join(broadcast(glob), sensitive)
      .select((qCols :+ col("__n_gv") :+ col("__p_glob") :+
        sum("__n_gv").over(w).as("__n_g")): _*)
      .groupBy(qCols: _*)
      .agg(max("__n_g").as("n"),
        round((sum(abs(col("__n_gv").cast("double") / col("__n_g") -
            col("__p_glob"))) +
          lit(1.0) - sum("__p_glob")) * 0.5, 6).as("distance"))
      .filter(col("distance") > t)
      .orderBy(col("distance").desc +: col("n").asc +:
        quasiIds.map(col(_).asc): _*)
  }

  /** Referential-integrity audit — the foreign-key check a lake runs
    * between fact and dimension drops: one row with the child count,
    * DISTINCT orphan keys, orphan ROW count, and round-6 orphan row
    * rate (rows whose non-null key has no parent; null keys are not
    * references and are reported separately as `n_null_keys`). An
    * orphan rate of 0 IS the pass. Scale: one left-anti join keyed on
    * the child key (AQE-broadcast when the parent is small) feeding a
    * group-less aggregation + a 1-row child total — the parent is
    * never scanned twice. */
  def referentialIntegrity(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val totals = child.agg(count(lit(1)).as("n_child"),
      sum(when(col(childKey).isNull, 1L).otherwise(0L))
        .as("n_null_keys"))
    val orphans = child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as("__pk")),
        col(childKey) === col("__pk"), "left_anti")
      .agg(coalesce(countDistinct(col(childKey)), lit(0L))
          .as("n_orphan_keys"),
        count(lit(1)).as("n_orphan_rows"))
    totals.crossJoin(broadcast(orphans))
      .select(col("n_child"), col("n_null_keys"),
        col("n_orphan_keys"), col("n_orphan_rows"),
        round(col("n_orphan_rows").cast("double") /
          greatest(col("n_child") - col("n_null_keys"), lit(1L)), 6)
          .as("orphan_rate"))
  }

  /** Per-key monotonicity audit — the out-of-order-event check an
    * event-log ingest runs before anything windows on time: for each
    * key, count adjacent inversions (a row whose `orderCol` is
    * STRICTLY below its predecessor in `seqCol` order) and report only
    * keys with violations, worst first. Ties are not inversions
    * (equal timestamps are legal), and a pair with a null order value
    * on either side is not one either (null-propagating comparison) —
    * audit null rates with [[NotNull]]. One key-partitioned lag —
    * bounded per key by
    * that key's rows (the per-key-window surface every event operator
    * here shares; cap monster keys upstream). */
  def monotonicityViolations(df: DataFrame, keyCol: String,
      seqCol: String, orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(seqCol))
    df.select(col(keyCol), col(orderCol).as("__v"),
        lag(col(orderCol), 1).over(w).as("__prev"))
      .filter(col("__v") < col("__prev"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_inversions"))
      .orderBy(col("n_inversions").desc, col(keyCol))
  }

  /** One-sided upper CUSUM change-point alarm (Page 1954) — the
    * classic "did this metric drift upward" monitor, per key: with
    * `z_t = x_t − target − slack`, the textbook recursion
    * `S_t = max(0, S_{t−1} + z_t)` is sequential, but it folds to
    * window form: for prefix sums `P_t = Σ_{j≤t} z_j`,
    * `S_t = P_t − min(0, min_{j≤t} P_j)` — two RUNNING frames (sum and
    * min), no recursion, no UDAF. Reports one row per ALARMED key:
    * `first_alarm_seq` (earliest `seqCol` where S exceeds
    * `threshold`), `max_cusum` (round-6 peak), `n_alarms`; quiet keys
    * are absent. The z deviations are cast to decimal(38,6) BEFORE the
    * frames, so the running sums are integer-exact and
    * ASSOCIATION-ORDER-INDEPENDENT — engines that evaluate running
    * frames via segment trees (a different association order than a
    * sequential fold) still replay the values bit-for-bit; double
    * frames would not survive that reordering.
    *
    * Scale: ONE key-partitioned exchange; both frames and the closing
    * aggregation ride it. Per-key width is the key's row count — the
    * shared per-key-window surface (cap monster keys upstream).
    * `seqCol` must be unique per key or the fold order (and the
    * audit) is undefined. */
  def cusumAlarms(df: DataFrame, keyCol: String, seqCol: String,
      valueCol: String, target: Double, slack: Double,
      threshold: Double): DataFrame = {
    require(slack >= 0, s"Checks.cusum: slack must be >= 0, got $slack")
    require(threshold > 0,
      s"Checks.cusum: threshold must be > 0, got $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(seqCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val dec = "decimal(38,6)"
    val z = col(valueCol).cast(dec) -
      lit(BigDecimal.valueOf(target)).cast(dec) -
      lit(BigDecimal.valueOf(slack)).cast(dec)
    df.select(col(keyCol), col(seqCol), z.as("__z"))
      .select(col(keyCol), col(seqCol),
        sum("__z").over(w).cast(dec).as("__p"))
      .select(col(keyCol), col(seqCol),
        (col("__p") - least(min("__p").over(w),
          lit(BigDecimal.valueOf(0)).cast(dec))).as("__s"))
      .filter(col("__s") > lit(BigDecimal.valueOf(threshold)).cast(dec))
      .groupBy(col(keyCol))
      .agg(min(col(seqCol)).as("first_alarm_seq"),
        round(max(col("__s")), 6).cast("double").as("max_cusum"),
        count(lit(1)).as("n_alarms"))
      .orderBy(col(keyCol))
  }

  /** Benford first-digit audit — the classic fabricated-numbers check
    * (Benford 1938; standard in fraud/data-forensics): naturally
    * occurring multi-scale quantities put digit d first with
    * probability log10(1+1/d), and a synthetic or truncated feed
    * deviates loudly. One row per digit 1–9 (zero-count digits
    * included) with `n`, observed `share`, Benford `expected`, and
    * absolute `deviation` — mean deviation is the standard MAD
    * conformity score, left to the consumer so the report stays
    * fixed-width.
    *
    * The first significant digit comes from INTEGER arithmetic on
    * `round(x · 10^scale)` (e.g. scale=2 for money → exact cents), not
    * from string formatting — double→string rendering is
    * engine-specific (Spark flips to scientific notation at 1e7) while
    * `floor(v / 10^floor(log10(v)))` on an integral double is
    * engine-portable: both engines pin log10 of exact powers of ten
    * (JVM `Math.log10` documents it; libm rounds the exact value
    * correctly) and every other integer sits ≥ 4 ulps from an integer
    * log. Rows that are null or ≤ 0 after scaling carry no first digit
    * and are excluded; an all-excluded input raises (the share
    * denominator is undefined — the psi-guard precedent).
    *
    * Scale: a scan projection into a 9-ary groupBy — one map-side
    * combined aggregation, then the 9-row table joins a literal digit
    * spine; nothing else touches the data. */
  def benford(df: DataFrame, colName: String, scale: Int = 0)
      : DataFrame = {
    require(scale >= 0 && scale <= 9,
      s"Checks.benford: scale must be in [0, 9], got $scale")
    val v = round(col(colName).cast("double") * math.pow(10, scale))
      .cast("long")
    val digit = floor(v.cast("double") /
      pow(lit(10.0), floor(log10(v.cast("double"))))).cast("int")
    // materialize the ≤9-row digit table ONCE: the report references
    // it from both the spine join and the total, and Catalyst does not
    // reuse an exchange through a broadcast wrapper — without this the
    // corpus would be scanned twice
    val counts = df.filter(v.isNotNull && v > 0)
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .pinned
    val tot = counts.agg(coalesce(sum(col("n")),
      raise_error(lit("Checks.benford: no positive values in column '" +
        colName + "' — the digit distribution is undefined"))
        .cast("long")).as("__tot"))
    df.sparkSession.range(1, 10).select(col("id").cast("int").as("digit"))
      .join(broadcast(counts), Seq("digit"), "left") // ≤9-row side
      .crossJoin(broadcast(tot))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        round(coalesce(col("n"), lit(0L)).cast("double") /
          col("__tot"), 6).as("share"),
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6)
          .as("expected"),
        round(abs(coalesce(col("n"), lit(0L)).cast("double") /
          col("__tot") - log10(lit(1.0) + lit(1.0) / col("digit"))), 6)
          .as("deviation"))
      .orderBy("digit")
  }

  /** Per-key freshness audit — the ingest-health check every
    * continuously-fed table needs: when did each key (source, feed,
    * shard) LAST produce a row, how far behind `nowNanos` is it, and
    * is it past the staleness budget? A feed that silently stopped is
    * invisible to every content check in this file — only its absence
    * of new timestamps says so. `nowNanos` is an EXPLICIT argument,
    * never wall-clock-inside-the-plan: audits must replay bit-for-bit
    * (and a plan that embeds `now()` re-evaluates it per partition
    * attempt). Integer nanos end-to-end; one map-combined aggregation.
    *
    * Output per key: `(key, n, last_ts, lag, stale)`. */
  def freshness(df: DataFrame, keyCol: String, tsCol: String,
      nowNanos: Long, staleAfterNanos: Long): DataFrame = {
    require(staleAfterNanos > 0L,
      s"Checks.freshness: staleAfterNanos must be > 0")
    df.filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"),
        max(col(tsCol).cast("long")).as("last_ts"))
      .select(col("key"), col("n"), col("last_ts"),
        (lit(nowNanos) - col("last_ts")).as("lag"),
        (lit(nowNanos) - col("last_ts") > staleAfterNanos).as("stale"))
  }
}
