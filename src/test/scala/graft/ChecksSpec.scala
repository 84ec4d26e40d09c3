package graft

import org.apache.spark.sql.functions._

import graft.operators.Checks
import graft.operators.Checks._

/** [[graft.operators.Checks]] — hand-checked observations and pass
  * verdicts, vacuous-truth edges, the one-pass plan shape, and the
  * gate form. */
class ChecksSpec extends TestBase {

  private def tbl = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("b"), Some(20.0)),
      (2L, Some("a"), Some(200.0)), // dup id, out-of-range v
      (4L, None, Some(30.0)),       // null s
      (5L, Some("zz"), None))       // unaccepted s, null v
      .toDF("id", "s", "v")
  }

  test("hand-checked observations and verdicts") {
    val rep = Checks.run(tbl, Seq(
      NotNull("s", minFrac = 0.9),
      Unique("id"),
      InRange("v", 0, 100),
      InRange("v", 0, 100, minFrac = 0.7),
      AcceptedValues("s", Seq("a", "b")),
      MatchesRegex("s", "^[ab]$", minFrac = 0.7),
      MinRows(3)))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getBoolean(4)))
    assert(rep(0) == (("not_null", "s", 0.8, false)))
    assert(rep(1) == (("unique", "id", 1.0, false))) // one duplicate
    assert(rep(2) == (("in_range", "v", 0.75, false)))
    assert(rep(3) == (("in_range", "v", 0.75, true)))
    assert(rep(4) == (("accepted_values", "s", 0.75, false)))
    assert(rep(5) == (("matches_regex", "s", 0.75, true)))
    assert(rep(6) == (("min_rows", "", 5.0, true)))
  }

  test("vacuous pass: all-null base population") {
    import spark.implicits._
    val d = Seq((1L, None: Option[Double]), (2L, None)).toDF("id", "v")
    val rep = Checks.run(d, Seq(InRange("v", 0, 1)))
      .collect().head
    assert(rep.isNullAt(2) && rep.getBoolean(4),
      "empty base must pass vacuously with null observed")
  }

  test("uniqueApprox: sketch ratio passes unique keys, fails heavy dups") {
    import spark.implicits._
    val uniq = (1L to 5000L).toDF("id")
    val rep1 = Checks.run(uniq, Seq(UniqueApprox("id")))
      .collect().head
    assert(rep1.getBoolean(4), s"unique keys must pass: $rep1")
    val dup = (1L to 5000L).map(i => i % 100).toDF("id")
    val rep2 = Checks.run(dup, Seq(UniqueApprox("id")))
      .collect().head
    assert(!rep2.getBoolean(4), s"50x dups must fail: $rep2")
  }

  test("one-pass plan: a non-distinct suite is a single aggregation, " +
      "no Expand") {
    val rep = Checks.run(tbl, Seq(
      NotNull("s"), InRange("v", 0, 100), MinRows(1)))
    rep.collect()
    val p = rep.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Expand"), s"no distinct → no Expand:\n$p")
    val exchanges = p.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges == 1, s"one single-row exchange expected:\n$p")
    // Unique adds the documented Expand
    val repU = Checks.run(tbl, Seq(Unique("id")))
    repU.collect()
    assert(repU.queryExecution.executedPlan.toString.contains("Expand")
      || repU.queryExecution.executedPlan.toString
        .contains("HashAggregate"), "distinct path planned")
  }

  test("observed checks ride an existing action: parity with run, " +
      "Unique rejected") {
    val suite = Seq(NotNull("s", minFrac = 0.9), InRange("v", 0, 100),
      AcceptedValues("s", Seq("a", "b")), MinRows(3),
      UniqueApprox("id"))
    val (inst, obs) = Checks.observed(tbl, suite)
    // the metrics ride THIS write — no dedicated checks pass runs
    inst.write.mode("overwrite")
      .parquet(tmpDir().resolve("observed-out").toString)
    val viaObs = Checks.reportFromObservation(obs, suite)
      .map(t => (t._1, t._2, t._3, t._5))
    val viaRun = Checks.run(tbl, suite).collect()
      .map(r => (r.getString(0), r.getString(1),
        Option(if (r.isNullAt(2)) null else r.getDouble(2))
          .map(_.asInstanceOf[Double]),
        r.getBoolean(4))).toSeq
    assert(viaObs == viaRun, s"$viaObs\nvs\n$viaRun")
    // exact Unique cannot ride observe (distinct aggregate)
    val e = intercept[IllegalArgumentException] {
      Checks.observed(tbl, Seq(Unique("id")))
    }
    assert(e.getMessage.contains("UniqueApprox"))
  }

  test("passes gate and loud guards") {
    assert(Checks.passes(tbl, Seq(MinRows(5), InRange("v", 0, 1000))))
    assert(!Checks.passes(tbl, Seq(Unique("id"))))
    assert(intercept[IllegalArgumentException] {
      Checks.run(tbl, Seq.empty)
    }.getMessage.contains("empty"))
    assert(intercept[IllegalArgumentException] {
      Checks.run(tbl, Seq(NotNull("nope")))
    }.getMessage.contains("nope"))
  }

  test("kAnonymity: violations are exactly the sub-k groups (nulls " +
      "group too); kAnonymize suppresses them and nothing else") {
    import spark.implicits._
    val d = Seq(
      ("z1", "a"), ("z1", "a"), ("z1", "a"), // (z1,a): 3 — safe at k=3
      ("z2", "b"), ("z2", "b"),              // (z2,b): 2 — violates
      ("z3", null),                          // (z3,null): 1 — violates
      (null, "c"), (null, "c"), (null, "c")  // (null,c): 3 — safe
    ).toDF("zip", "grp")
    val v = graft.operators.Checks
      .kAnonymityViolations(d, Seq("zip", "grp"), k = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(v.toSet == Set(("z3", null, 1L), ("z2", "b", 2L)), v.toSeq)
    val kept = graft.operators.Checks
      .kAnonymize(d, Seq("zip", "grp"), k = 3)
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
    assert(kept.length == 6)
    assert(kept.toSet == Set((Some("z1"), Some("a")), (None, Some("c"))))
    // empty violations == publishable
    assert(graft.operators.Checks.kAnonymityViolations(
      d.filter(col("zip") === "z1"), Seq("zip"), k = 3).count() == 0)
    // guards
    assert(intercept[IllegalArgumentException] {
      graft.operators.Checks.kAnonymityViolations(d, Seq.empty, 3)
    }.getMessage.contains("quasi-id"))
    assert(intercept[IllegalArgumentException] {
      graft.operators.Checks.kAnonymize(d, Seq("zip"), 1)
    }.getMessage.contains("k must be"))
  }

  test("lDiversity: homogeneous groups flagged even when k-large; " +
      "sensitive column cannot be a quasi-id") {
    import spark.implicits._
    val d = Seq(
      ("z1", "flu"), ("z1", "flu"), ("z1", "flu"), ("z1", "flu"),
      ("z2", "flu"), ("z2", "cold"), ("z2", "covid"),
      ("z3", "flu"), ("z3", null)).toDF("zip", "dx")
    val v = graft.operators.Checks
      .lDiversityViolations(d, Seq("zip"), "dx", l = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // z1 is 4-anonymous yet 1-diverse — the case k-anonymity misses;
    // z3's null does not count as a distinct sensitive value
    assert(v.toSet == Set(("z1", 4L, 1L), ("z3", 2L, 1L)), v.toSeq)
    assert(intercept[IllegalArgumentException] {
      graft.operators.Checks.lDiversityViolations(d, Seq("dx"), "dx", 2)
    }.getMessage.contains("cannot be a quasi-id"))
  }

  test("tCloseness: hand-computed TVD, ties order by n, nulls outside " +
      "both distributions, guards") {
    import spark.implicits._
    val d = Seq(
      ("z1", "flu"), ("z1", "flu"), ("z1", "flu"), ("z1", "flu"),
      ("z2", "flu"), ("z2", "flu"), ("z2", "cold"), ("z2", "cold"),
      ("z3", "flu"), ("z3", null)).toDF("zip", "dx")
    // global non-null: flu 7/9, cold 2/9
    // z1 {flu:1}: ½(|1−7/9| + 1−7/9) = 2/9;  z2 {½,½}: 0.277778
    // z3 {flu:1} over ONE non-null row: 2/9, n=1 (the null is outside)
    def run(t: Double) = graft.operators.Checks
      .tClosenessViolations(d, Seq("zip"), "dx", t)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(run(0.25).toSeq == Seq(("z2", 4L, 0.277778)))
    // tie at 2/9 between z1 and z3 → n asc puts z3 (n=1) first
    assert(run(0.2).toSeq == Seq(("z2", 4L, 0.277778),
      ("z3", 1L, 0.222222), ("z1", 4L, 0.222222)))
    // an all-null-sensitive group has no distribution: absent, and its
    // rows don't move the global denominator
    val withAllNull = d.union(Seq(("z4", null), ("z4", null))
      .toDF("zip", "dx"))
    assert(!graft.operators.Checks
      .tClosenessViolations(withAllNull, Seq("zip"), "dx", 0.2)
      .collect().map(_.getString(0)).contains("z4"))
    assert(intercept[IllegalArgumentException] {
      graft.operators.Checks.tClosenessViolations(d, Seq("dx"), "dx", 0.2)
    }.getMessage.contains("cannot be a quasi-id"))
    assert(intercept[IllegalArgumentException] {
      graft.operators.Checks.tClosenessViolations(d, Seq("zip"), "dx", 1.5)
    }.getMessage.contains("t must be"))
  }

  test("referentialIntegrity: orphan keys/rows/rate exact, null keys " +
      "reported separately, clean join scores zero") {
    import spark.implicits._
    val child = Seq(Option(1L), Option(1L), Option(2L), None,
      Option(9L), Option(9L), Option(9L)).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = graft.operators.Checks
      .referentialIntegrity(child, "fk", parent, "pk").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == (7L, 1L, 1L, 3L, 0.5))
    val clean = graft.operators.Checks.referentialIntegrity(
      Seq(1L, 2L).toDF("fk"), "fk", parent, "pk").collect().head
    assert(clean.getLong(2) == 0L && clean.getLong(3) == 0L &&
      clean.getDouble(4) == 0.0)
  }

  test("monotonicityViolations: strict inversions only — ties and " +
      "null-sided pairs are legal; worst key first") {
    import spark.implicits._
    val d = Seq(
      ("A", 1L, Some(10L)), ("A", 2L, Some(20L)), ("A", 3L, Some(15L)),
      ("A", 4L, Some(15L)), ("A", 5L, Some(30L)),
      ("B", 1L, Some(5L)), ("B", 2L, Some(5L)), ("B", 3L, Some(7L)),
      ("C", 1L, Some(9L)), ("C", 2L, None), ("C", 3L, Some(1L)),
      ("D", 1L, Some(3L)), ("D", 2L, Some(2L)), ("D", 3L, Some(1L)))
      .toDF("k", "seq", "ts")
    val out = graft.operators.Checks
      .monotonicityViolations(d, "k", "seq", "ts")
      .as[(String, Long)].collect().toSeq
    // A: one inversion (20→15); D: two (3→2→1); B sorted; C's dips
    // straddle a null and are not inversions
    assert(out == Seq(("D", 2L), ("A", 1L)), out)
  }

  test("cusumAlarms: window form equals the textbook recursion on a " +
      "hand trace; quiet keys absent; guards") {
    import spark.implicits._
    // A: values 5,0,0,12,1 @ target 3 slack 1 → z = 1,−4,−4,8,−3
    // recursion S = 1,0,0,8,5 (hand); threshold 4 alarms at seq 4,5
    val d = (Seq((1L, 5.0), (2L, 0.0), (3L, 0.0), (4L, 12.0),
        (5L, 1.0)).map { case (s2, v) => ("A", s2, v) } ++
      Seq(("B", 1L, 2.0), ("B", 2L, 3.0))).toDF("k", "seq", "v")
    val out = graft.operators.Checks
      .cusumAlarms(d, "k", "seq", "v", target = 3.0, slack = 1.0,
        threshold = 4.0)
      .as[(String, Long, Double, Long)].collect().toSeq
    assert(out == Seq(("A", 4L, 8.0, 2L)), out)
    assert(intercept[IllegalArgumentException] {
      graft.operators.Checks.cusumAlarms(d, "k", "seq", "v", 0, -1, 1)
    }.getMessage.contains("slack"))
    assert(intercept[IllegalArgumentException] {
      graft.operators.Checks.cusumAlarms(d, "k", "seq", "v", 0, 0, 0)
    }.getMessage.contains("threshold"))
  }

  test("benford: hand-checked digits, money scaling, exclusions, " +
      "all-excluded raises") {
    import spark.implicits._
    // round(x): 1→d1, 1.2→d1, 25→d2; 0.003/null/−5/0 carry no digit
    val d = Seq[java.lang.Double](1.0, 1.2, 25.0, 0.003, null, -5.0, 0.0)
      .toDF("v")
    val out = graft.operators.Checks.benford(d, "v")
      .as[(Int, Long, Double, Double, Double)].collect().toSeq
    assert(out.map(_._1) == (1 to 9))
    val byD = out.map(r => r._1 -> r).toMap
    assert(byD(1)._2 == 2L && byD(1)._3 == 0.666667)
    assert(byD(2)._2 == 1L && byD(2)._3 == 0.333333)
    assert((3 to 9).forall(byD(_)._2 == 0L))
    assert(byD(1)._4 == 0.30103) // log10(2), the Benford headline
    assert(byD(1)._5 == 0.365637) // |2/3 − log10 2|
    // money scale: cents make 0.05 a digit-5 value and 12.34 a digit-1
    val money = graft.operators.Checks
      .benford(Seq(12.34, 0.05).toDF("v"), "v", scale = 2)
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(money(1) == 1L && money(5) == 1L)
    assert(intercept[Exception] {
      graft.operators.Checks.benford(Seq(-1.0, 0.0).toDF("v"), "v")
        .collect()
    }.getMessage.contains("no positive values"))
  }
}
