package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{SpecifiedWindowFrame, UnboundedFollowing, UnboundedPreceding, WindowExpression}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan, ResolvedHint, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{ColumnarRule, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Session-extension entry point (`SparkSessionExtensions`) — the
  * Catalyst plug-in surface for deployments that want the engine's
  * scale posture ENFORCED at analysis time, not discovered in a 3 a.m.
  * executor OOM. Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Currently injected: [[UnpartitionedWindowGuard]],
  * [[CartesianProductGuard]], [[ShrinkingFollowingFrameGuard]]
  * (analysis-time check rules) and [[CartesianExecGuard]] (the
  * executed-plan companion) — each conf-gated (off/warn/fail), all
  * off by default. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectCheckRule(session => new UnpartitionedWindowGuard(session))
    ext.injectCheckRule(session => new CartesianProductGuard(session))
    ext.injectCheckRule(session =>
      new ShrinkingFollowingFrameGuard(session))
    ext.injectColumnar(session => new CartesianExecGuard(session))
  }
}

/** Shared off/warn/fail conf plumbing for the analysis-time guards. */
private[plans] trait GuardMode extends Logging {
  def session: SparkSession
  def confKey: String
  protected def withMode(plan: LogicalPlan)(check: LogicalPlan => Option[String]): Unit = {
    val mode =
      try session.conf.get(confKey, "off")
      catch { case _: Exception => "off" }
    if (mode == "warn" || mode == "fail") {
      check(plan).foreach { msg =>
        if (mode == "fail") throw new SparkException(msg)
        else logWarning(msg)
      }
    }
  }
}

/** Analysis-time guardrail: a CARTESIAN join (`crossJoin`, or an inner
  * join declared with no condition) replicates every partition of one
  * side against the other — O(n·m) rows, the scale cliff Spark itself
  * only bounds with `spark.sql.crossJoin.enabled` (default on since
  * 3.0, so nothing stops it).
  *
  * Behavior per `spark.graft.guard.cartesianProduct`: `off` (default) /
  * `warn` / `fail`, the [[UnpartitionedWindowGuard]] contract.
  *
  * Two acknowledged-cartesian shapes pass the guard:
  *  - a `broadcast()` hint anywhere under either side — the engine's
  *    own bounded-side idiom (every library `crossJoin` site pairs a
  *    corpus with a broadcast 1-row aggregate / codebook / cutoff
  *    table), planned as a replicated nested loop, never a shuffle
  *    cartesian;
  *  - a `__cartesian_optin` column in either side's output — the
  *    explicit all-pairs acknowledgment
  *    [[graft.operators.Similarity.nearDupPairs]] stamps when the
  *    caller passed `assumeSmall = true` (the `__pid` staging-column
  *    convention: user data never carries `__`-prefixed names).
  *
  * Scope: this catches the DECLARED cartesian shape at analysis time.
  * One deliberate carve-out: an INNER join with no condition sitting
  * at the PLAN ROOT is skipped, because
  * `Dataset.join(right, usingColumns)` internally analyzes exactly
  * that throwaway shape to disambiguate the using columns (Spark's
  * own artifact, byte-identical to a user's bare `a.join(b)` plan —
  * flagging it would fail every `join(df, Seq("id"))` in existence).
  * A real condition-less inner join is caught the moment anything is
  * built on top of it (a select, a write, an aggregate — all re-run
  * the check with the join no longer at the root). The two shapes the
  * analyzed plan cannot see — a bare root-position inner join consumed
  * directly (`a.join(b).collect()`), and a CONDITIONED join whose
  * non-equi predicate degrades to `CartesianProductExec` /
  * `BroadcastNestedLoopJoinExec` at planning — are closed by the
  * executed-plan companion [[CartesianExecGuard]], injected alongside
  * this rule and gated by the SAME conf key. */
class CartesianProductGuard(val session: SparkSession)
    extends (LogicalPlan => Unit) with GuardMode {

  val confKey = "spark.graft.guard.cartesianProduct"

  /** The acknowledgment must sit AT the join side (unwrapping only
    * no-op unary nodes the DataFrame API inserts above a broadcast()
    * call) — a subtree-wide search would let any unrelated broadcast
    * join deep in the side's lineage silently sanction a corpus-scale
    * cartesian above it. */
  private def acknowledged(side: LogicalPlan): Boolean = {
    @annotation.tailrec
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case a: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias =>
        unwrap(a.child)
      case pr: org.apache.spark.sql.catalyst.plans.logical.Project
          // only column-preserving renames/reorders — a computing
          // projection is real work above the hint and keeps it scoped
          if pr.projectList.forall(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.Attribute]) =>
        unwrap(pr.child)
      case other => other
    }
    (unwrap(side) match {
      case ResolvedHint(_, hints) => hints.strategy.contains(BROADCAST)
      case _ => false
    }) || side.output.exists(_.name == "__cartesian_optin")
  }

  override def apply(plan: LogicalPlan): Unit = withMode(plan) { p =>
    p.collectFirst {
      case j @ Join(left, right, Cross | Inner, None, _)
          if ((j ne p) || j.joinType == Cross) &&
            !acknowledged(left) && !acknowledged(right) =>
        "Cartesian product detected (join with no condition): every " +
          "partition of one side replicates against the other — " +
          "O(n*m) rows. broadcast() the provably-small side, use " +
          "graft.operators.Similarity.nearDupPairsLsh for all-pairs " +
          "similarity, or acknowledge a genuinely bounded cartesian " +
          "with a __cartesian_optin column (nearDupPairs does this " +
          s"under assumeSmall = true). Set $confKey=off to allow. " +
          s"Plan:\n${j.simpleString(3)}"
    }
  }
}

/** Executed-plan companion to [[CartesianProductGuard]]: inspects
  * every physical (sub)plan at execution-preparation time — via the
  * columnar-rule hook, which Spark applies to the final plan and, under
  * AQE, to each query stage — and flags the two product shapes the
  * analysis-time rule cannot see:
  *
  *  - `CartesianProductExec` — a shuffle cartesian that reached
  *    planning, including the bare root-position `a.join(b)` consumed
  *    directly (never re-analyzed with the join off the root) and a
  *    non-equi inner join both of whose sides were too big to
  *    broadcast;
  *  - `BroadcastNestedLoopJoinExec` without an acknowledgment — the
  *    planner's fallback for non-equi / condition-less joins. The
  *    planner picks it for a SIZE-ESTIMATED small side too, but a size
  *    estimate is not a contract: at 100× the data the same query
  *    silently crosses the threshold and becomes a shuffle cartesian,
  *    so the guard requires the explicit `broadcast()` hint (the
  *    engine's provably-bounded-side idiom) rather than trusting
  *    planning-time stats.
  *
  * Acknowledgments, mirroring the analysis layer:
  *  - a `broadcast()` hint on either join side — read from the
  *    physical join's logical link (`Join.hint`, structural state that
  *    survives optimization and AQE re-planning, unlike the analysis
  *    layer's `ResolvedHint` wrapper which the optimizer folds away);
  *  - a `__cartesian_optin` column visible in either physical input —
  *    note column pruning removes an unreferenced opt-in stamp before
  *    planning, so library code pairs the stamp with a `broadcast()`
  *    hint ([[graft.operators.Similarity.nearDupPairs]] under
  *    `assumeSmall` does both); third-party callers should do the
  *    same or keep the column referenced through the join.
  *
  * Gated by the SAME `spark.graft.guard.cartesianProduct` conf as the
  * analysis rule (`off` default / `warn` / `fail`) — one posture
  * switch, two enforcement points. `fail` throws during preparation,
  * before the first task launches. */
class CartesianExecGuard(session: SparkSession) extends ColumnarRule
    with Logging {

  private val confKey = "spark.graft.guard.cartesianProduct"

  private def acknowledged(j: SparkPlan): Boolean = {
    val optin =
      j.children.exists(_.output.exists(_.name == "__cartesian_optin"))
    def hinted = j.logicalLink.exists {
      case jn: Join =>
        Seq(jn.hint.leftHint, jn.hint.rightHint).flatten
          .exists(_.strategy.contains(BROADCAST))
      case _ => false
    }
    optin || hinted
  }

  override def preColumnarTransitions: Rule[SparkPlan] =
    new Rule[SparkPlan] {
      override def apply(plan: SparkPlan): SparkPlan = {
        val mode =
          try session.conf.get(confKey, "off")
          catch { case _: Exception => "off" }
        if (mode == "warn" || mode == "fail") {
          plan.foreach {
            case j @ (_: CartesianProductExec |
                      _: BroadcastNestedLoopJoinExec)
                if !acknowledged(j) =>
              val msg = "Cartesian/nested-loop product in the " +
                s"EXECUTED plan (${j.nodeName}): every row of one " +
                "side meets every row of the other at runtime — the " +
                "shape the analysis-time guard cannot see (a bare " +
                "root-position inner join consumed directly, or a " +
                "non-equi condition degrading at planning). " +
                "broadcast() the provably-small side (the hint is " +
                "honored here through the join's logical link), or " +
                "keep a __cartesian_optin column visible in the " +
                s"join's inputs. Set $confKey=off to allow. Plan:\n" +
                j.simpleString(3)
              if (mode == "fail") throw new SparkException(msg)
              else logWarning(msg)
            case _ => ()
          }
        }
        plan
      }
    }
}

/** Analysis-time guardrail: a window frame that ends at `UNBOUNDED
  * FOLLOWING` without starting at `UNBOUNDED PRECEDING` (e.g.
  * `ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING`) is the known
  * O(n²) WindowExec trap — Spark's `UnboundedFollowingWindowFrame`
  * recomputes the aggregate FROM SCRATCH for every row because the
  * frame shrinks from the left, while every other frame updates
  * incrementally. On a 10⁶-row partition that is 10¹² aggregate steps
  * in one task.
  *
  * The whole-partition frame (`UNBOUNDED PRECEDING AND UNBOUNDED
  * FOLLOWING`) is computed once per group and passes; the running
  * frame passes. The fix the message names is the one the engine's own
  * operators use (AsOfJoin.interpolateAt): flip the ORDER BY direction
  * and rewrite the frame as `UNBOUNDED PRECEDING AND CURRENT ROW` —
  * same rows, incremental execution.
  *
  * Behavior per `spark.graft.guard.unboundedFollowing`: `off`
  * (default) / `warn` / `fail`. */
class ShrinkingFollowingFrameGuard(val session: SparkSession)
    extends (LogicalPlan => Unit) with GuardMode {

  val confKey = "spark.graft.guard.unboundedFollowing"

  override def apply(plan: LogicalPlan): Unit = withMode(plan) { p =>
    p.collectFirst {
      case w: Window if w.windowExpressions.exists(_.exists {
        case WindowExpression(_, spec) => spec.frameSpecification match {
          case SpecifiedWindowFrame(_, lower, UnboundedFollowing) =>
            lower != UnboundedPreceding
          case _ => false
        }
        case _ => false
      }) =>
        "Shrinking UNBOUNDED FOLLOWING window frame detected (" +
          s"${w.windowExpressions.map(_.name).mkString(", ")}): Spark " +
          "recomputes this frame's aggregate from scratch per row — " +
          "O(n^2) per partition. Reverse the ORDER BY and use ROWS " +
          "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW (same rows, " +
          "incremental execution — the AsOfJoin.interpolateAt " +
          s"pattern), or set $confKey=off to allow."
    }
  }
}

/** Analysis-time guardrail: an unpartitioned-but-ordered window
  * (`OVER (ORDER BY …)` with no `PARTITION BY`) plans as ONE task
  * holding every row — the canonical silent scale cliff (Spark itself
  * only warns at runtime, from inside the already-doomed stage).
  *
  * Behavior per `spark.graft.guard.unpartitionedWindow`:
  *  - `off`  (default): do nothing.
  *  - `warn`: log a warning at analysis time, naming the fix.
  *  - `fail`: reject the query at analysis time.
  *
  * The pointed-to fix is [[graft.operators.Rank]]: `globalRank` /
  * `globalNtile` / `exactQuantiles` compute the common global-window
  * answers from a range-partitioned decomposition instead. The guard
  * is deliberately conf-scoped rather than default-on: legitimate
  * tiny unpartitioned windows exist (cumulating a per-partition count
  * table, ranking a quota table) and a platform can scope the conf to
  * the jobs it gates. */
class UnpartitionedWindowGuard(session: SparkSession)
    extends (LogicalPlan => Unit) with Logging {

  private val ConfKey = "spark.graft.guard.unpartitionedWindow"

  /** The framework's own scale primitives (Rank.globalRank/globalNtile/
    * exactQuantiles, Sampling.apportionedSample quota derivation,
    * Similarity.rrfFuse, FooterStats.rangeLayoutReport) deliberately
    * cumulate PROVABLY BOUNDED tables — per-partition counts (≤ the
    * shuffle partition count), per-key quota rows, fused shortlists,
    * file listings — through a tiny unpartitioned window, and every
    * such window orders exclusively on `__`-prefixed staging columns
    * (the `__pid` convention). Exempting those keeps `fail` mode
    * usable: without it the guard would reject the very replacements
    * its own error message recommends. A corpus-scale window over real
    * data columns never carries the prefix, so the cliff the guard
    * exists for still trips it. */
  private def isFrameworkBounded(w: Window): Boolean =
    w.orderSpec.forall(so =>
      so.child.references.nonEmpty &&
        so.child.references.forall(_.name.startsWith("__")))

  override def apply(plan: LogicalPlan): Unit = {
    val mode =
      try session.conf.get(ConfKey, "off")
      catch { case _: Exception => "off" }
    if (mode == "warn" || mode == "fail") {
      plan.foreach {
        case w: Window
            if w.partitionSpec.isEmpty && w.orderSpec.nonEmpty &&
              !isFrameworkBounded(w) =>
          val msg = s"Unpartitioned ordered window detected (" +
            s"${w.windowExpressions.map(_.name).mkString(", ")}): " +
            "Spark will move EVERY row to one task. For global " +
            "rank/ntile/quantiles use graft.operators.Rank." +
            "globalRank/globalNtile/exactQuantiles (range-partitioned " +
            s"decomposition), or set $ConfKey=off to allow."
          if (mode == "fail") throw new SparkException(msg)
          else logWarning(msg)
        case _ => ()
      }
    }
  }
}
