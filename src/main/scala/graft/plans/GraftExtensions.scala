package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** Session-extension entry point (`SparkSessionExtensions`) — the
  * Catalyst plug-in surface for deployments that want the engine's
  * scale posture ENFORCED at analysis time, not discovered in a 3 a.m.
  * executor OOM. Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Currently injected: [[UnpartitionedWindowGuard]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectCheckRule(session => new UnpartitionedWindowGuard(session))
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
