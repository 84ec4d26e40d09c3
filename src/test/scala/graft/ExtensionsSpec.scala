package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.GraftExtensions

/** [[graft.plans.GraftExtensions]] — the analysis-time guard must fail
  * exactly the one-task window shape, leave partitioned windows and
  * `off` mode alone, and point at the Rank alternative. */
class ExtensionsSpec extends TestBase {

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark // force TestBase session + context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate() // same SparkContext, fresh session state
    try f(s2)
    finally {
      s2.conf.unset("spark.graft.guard.unpartitionedWindow")
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("fail mode rejects unpartitioned ordered windows at analysis, " +
      "names the Rank fix") {
    withExtSession { s2 =>
      s2.conf.set("spark.graft.guard.unpartitionedWindow", "fail")
      val e = intercept[Exception] {
        s2.range(10)
          .withColumn("r", row_number().over(Window.orderBy("id")))
          .collect()
      }
      assert(e.getMessage.contains("globalRank"), e.getMessage)
      assert(e.getMessage.contains("one task"), e.getMessage)
    }
  }

  test("fail mode leaves partitioned windows and plain queries alone") {
    withExtSession { s2 =>
      s2.conf.set("spark.graft.guard.unpartitionedWindow", "fail")
      val ok = s2.range(10).withColumn("g", col("id") % 2)
        .withColumn("r",
          row_number().over(Window.partitionBy("g").orderBy("id")))
        .collect()
      assert(ok.length == 10)
      assert(s2.range(5).agg(count(lit(1))).collect().head.getLong(0)
        == 5L)
    }
  }

  test("off (default) and warn modes do not reject") {
    withExtSession { s2 =>
      // default: off
      assert(s2.range(4)
        .withColumn("r", row_number().over(Window.orderBy("id")))
        .collect().length == 4)
      s2.conf.set("spark.graft.guard.unpartitionedWindow", "warn")
      assert(s2.range(4)
        .withColumn("r", row_number().over(Window.orderBy("id")))
        .collect().length == 4)
    }
  }

  test("fail mode admits the framework's own bounded windows — the " +
      "recommended fix must itself run under the guard") {
    withExtSession { s2 =>
      s2.conf.set("spark.graft.guard.unpartitionedWindow", "fail")
      import graft.operators.{Rank, Sampling, Similarity}
      val df = s2.range(100).toDF("id")
        .withColumn("v", (col("id") * 37 % 101).cast("double"))
      // globalRank's internal offset window orders on __pid — exempt
      val ranked = Rank.globalRank(df, Seq(col("v").asc, col("id").asc))
        .collect()
      assert(ranked.length == 100)
      // perKeyPercentRank: partitioned count-table windows only
      val pct = Rank.perKeyPercentRank(
        df.withColumn("k", col("id") % 3), col("k"), col("id"), col("v"))
        .collect()
      assert(pct.length == 100)
      // apportionedSample's quota rank orders on __rem/__k — exempt
      assert(Sampling.apportionedSample(
        df.withColumn("k", col("id") % 4), col("k"), col("id"), 20L)
        .count() == 20L)
      // rrfFuse's shortlist rank orders on __rrf/__fid — exempt
      val a = s2.range(5).toDF("doc_id").withColumn("ra", col("doc_id") + 1)
      val b = s2.range(5).toDF("doc_id").withColumn("rb", lit(6) - col("doc_id"))
      assert(Similarity.rrfFuse(a, "doc_id", "ra", b, "doc_id", "rb")
        .collect().length == 5)
      // ...while a genuine corpus-column window still trips it
      val e = intercept[Exception] {
        df.withColumn("r", row_number().over(Window.orderBy("v")))
          .collect()
      }
      assert(e.getMessage.contains("globalRank"), e.getMessage)
    }
  }

  test("the q155 CCNet composition ANALYZES under the fail-mode guard " +
      "— the round-11 headline: no unpartitioned window anywhere in it") {
    withExtSession { s2 =>
      s2.conf.set("spark.graft.guard.unpartitionedWindow", "fail")
      // the guard is an analysis-time check rule: building + analyzing
      // the frame is the assertion (collect would just re-run it)
      val df = SparkEntry.queries("q155_ccnet_buckets")(s2,
        "/root/testdata/sf0.001")
      assert(df.count() > 0)
    }
  }

  private def withGuards[A](mode: String)(f: SparkSession => A): A =
    withExtSession { s2 =>
      Seq("unpartitionedWindow", "cartesianProduct", "unboundedFollowing")
        .foreach(k => s2.conf.set(s"spark.graft.guard.$k", mode))
      try f(s2)
      finally Seq("unpartitionedWindow", "cartesianProduct",
        "unboundedFollowing")
        .foreach(k => s2.conf.unset(s"spark.graft.guard.$k"))
    }

  test("cartesian guard: fail rejects an unacknowledged crossJoin and " +
      "a COMPOSED condition-less inner join; warn does not") {
    withGuards("fail") { s2 =>
      val a = s2.range(10).toDF("x")
      val b = s2.range(10).toDF("y")
      val e = intercept[Exception] { a.crossJoin(b) }
      assert(e.getMessage.contains("Cartesian product"), e.getMessage)
      assert(e.getMessage.contains("broadcast"), e.getMessage)
      // a condition-less inner join is Spark's using-join
      // disambiguation shape AT THE ROOT (carved out), but anything
      // built on top re-checks with the join no longer at the root
      val bare = a.join(b) // root join: the documented carve-out
      val e2 = intercept[Exception] { bare.select(col("x")) }
      assert(e2.getMessage.contains("Cartesian product"), e2.getMessage)
    }
    withGuards("warn") { s2 =>
      assert(s2.range(3).toDF("x").crossJoin(s2.range(3).toDF("y"))
        .count() == 9L)
    }
  }

  test("cartesian guard admits the engine's acknowledged shapes: " +
      "broadcast()-hinted cross joins, nearDupPairs under assumeSmall, " +
      "and ordinary keyed joins") {
    withGuards("fail") { s2 =>
      import graft.operators.Similarity
      val a = s2.range(10).toDF("x")
      val one = s2.range(5).agg(count(lit(1)).as("n"))
      // the library's 1-row-aggregate idiom
      assert(a.crossJoin(broadcast(one)).count() == 10L)
      // the explicit all-pairs opt-in stamps __cartesian_optin
      val vecs = s2.range(6).select(col("id").as("vid"),
        array(col("id").cast("float"), lit(1.0f)).as("v"))
      assert(Similarity.nearDupPairs(vecs, "vid", "v",
        threshold = -1.0, assumeSmall = true).count() == 15L)
      // keyed joins (incl. using joins — the analyzer's throwaway
      // disambiguation plan must not trip the guard) are untouched
      assert(a.join(a.withColumnRenamed("x", "x2"),
        col("x") === col("x2")).count() == 10L)
      assert(s2.range(4).toDF("k").join(
        s2.range(4).toDF("k"), Seq("k")).count() == 4L)
    }
  }

  test("cartesian guard: a broadcast hint buried DEEP in a side's " +
      "lineage does NOT acknowledge a cartesian above it — the " +
      "round-14 wasserstein regression shape") {
    withGuards("fail") { s2 =>
      val big = s2.range(100).toDF("x")
      // one-row frame whose LINEAGE contains a broadcast join, but
      // which is not itself hinted at its root: before the scoping
      // fix this deep ResolvedHint silently sanctioned the cartesian
      val derived = s2.range(10).toDF("y")
        .crossJoin(broadcast(s2.range(3).agg(count(lit(1)).as("n"))))
        .agg(sum(col("y")).as("s"))
      val e = intercept[Exception] { big.crossJoin(derived) }
      assert(e.getMessage.contains("Cartesian product"), e.getMessage)
      // hinting the SAME frame at its root passes
      assert(big.crossJoin(broadcast(derived)).count() == 100L)
    }
  }

  /** Exceptions thrown by the executed-plan guard can surface wrapped
    * (execution-phase error classes) — search the whole cause chain. */
  private def chainMessages(e: Throwable): String = {
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
  }

  test("executed-plan guard closes the bare-root escape: a.join(b) " +
      "consumed directly trips at fail, runs at warn") {
    withGuards("fail") { s2 =>
      val a = s2.range(10).toDF("x")
      val b = s2.range(10).toDF("y")
      // the analysis carve-out admits the root-position shape; the
      // physical companion catches it the moment it is executed
      val e = intercept[Exception] { a.join(b).collect() }
      assert(chainMessages(e).contains("EXECUTED plan"), chainMessages(e))
      assert(chainMessages(e).contains("broadcast()"), chainMessages(e))
    }
    withGuards("warn") { s2 =>
      assert(s2.range(10).toDF("x").join(s2.range(10).toDF("y"))
        .collect().length == 100)
    }
  }

  test("executed-plan guard closes the non-equi degradation escape: " +
      "both BroadcastNestedLoopJoin and CartesianProduct shapes") {
    withGuards("fail") { s2 =>
      val a = s2.range(10).toDF("x")
      val b = s2.range(10).toDF("y")
      // tiny sides: the planner auto-broadcasts → BNLJ, still flagged
      // (a size ESTIMATE is not a boundedness contract)
      val e = intercept[Exception] {
        a.join(b, col("x") < col("y")).collect()
      }
      assert(chainMessages(e).contains("EXECUTED plan"), chainMessages(e))
      // broadcast disabled → the same query degrades to a shuffle
      // CartesianProductExec with a post-condition — also flagged
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val e2 = intercept[Exception] {
          a.join(b, col("x") < col("y")).collect()
        }
        assert(chainMessages(e2).contains("EXECUTED plan"),
          chainMessages(e2))
        // ... while an explicit broadcast() hint stays honored even
        // with auto-broadcast off (the hint rides Join.hint through
        // the logical link, not the size estimate)
        assert(a.join(broadcast(b), col("x") < col("y")).count() == 45L)
      } finally s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("executed-plan guard works with AQE disabled too — the " +
      "columnar-rule hook fires in both planning modes and the " +
      "logical-link hint read survives either path") {
    withGuards("fail") { s2 =>
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val a = s2.range(10).toDF("x")
        val b = s2.range(10).toDF("y")
        val e = intercept[Exception] { a.join(b).collect() }
        assert(chainMessages(e).contains("EXECUTED plan"),
          chainMessages(e))
        assert(a.crossJoin(broadcast(s2.range(3).agg(count(lit(1))
          .as("n")))).count() == 10L)
      } finally s2.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("executed-plan guard honors the engine's acknowledged shapes " +
      "end-to-end: hinted crossJoin, nearDupPairs under assumeSmall, " +
      "and keyed joins execute green at fail") {
    withGuards("fail") { s2 =>
      import graft.operators.Similarity
      val a = s2.range(50).toDF("x")
      assert(a.crossJoin(broadcast(s2.range(5).agg(count(lit(1))
        .as("n")))).count() == 50L)
      val vecs = s2.range(6).select(col("id").as("vid"),
        array(col("id").cast("float"), lit(1.0f)).as("v"))
      assert(Similarity.nearDupPairs(vecs, "vid", "v",
        threshold = -1.0, assumeSmall = true).count() == 15L)
      assert(a.join(a.withColumnRenamed("x", "x2"),
        col("x") === col("x2")).count() == 50L)
    }
  }

  test("unboundedFollowing guard: fail rejects the shrinking frame, " +
      "admits whole-partition and running frames, and names the " +
      "reverse-order fix") {
    withGuards("fail") { s2 =>
      val df = s2.range(20).withColumn("g", col("id") % 2)
      val shrinking = Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val e = intercept[Exception] {
        df.withColumn("s", sum("id").over(shrinking)).collect()
      }
      assert(e.getMessage.contains("UNBOUNDED FOLLOWING"), e.getMessage)
      assert(e.getMessage.contains("Reverse the ORDER BY"), e.getMessage)
      // whole-partition frame: computed once per group — fine
      val whole = Window.partitionBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      assert(df.withColumn("s", sum("id").over(whole))
        .collect().length == 20)
      // running frame: incremental — fine
      val running = Window.partitionBy("g").orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      assert(df.withColumn("s", sum("id").over(running))
        .collect().length == 20)
    }
  }

  test("the join-shape-heavy catalog entries EXECUTE green under the " +
      "guards at fail — every BroadcastNestedLoopJoin/cartesian the " +
      "library plans is acknowledged at the PHYSICAL layer too (the " +
      "full-catalog executed drill runs through Verify under " +
      "SPARK_GRAFT_GUARDS=fail; this is its in-suite regression pin)") {
    withGuards("fail") { s2 =>
      val dir = "/root/testdata/sf0.001"
      // the entries whose plans carry broadcast nested loops or
      // acknowledged cartesians (cosine top-k broadcast queries,
      // optin all-pairs, 1-row cutoff/stat cross joins, KNN valuation)
      val heavy = Seq("q28_embed_neardup", "q30_cosine_topk",
        "q238_knn_shapley", "q254_ks_test", "q255_cramers_v",
        "q261_wasserstein", "q264_best_threshold", "q184_covariance",
        "q217_margin_mining", "q143_pagerank")
      val failed = heavy.flatMap { name =>
        try {
          SparkEntry.queries(name)(s2, dir)
            .write.format("noop").mode("overwrite").save()
          None
        } catch { case e: Throwable =>
          Some(s"$name :: ${chainMessages(e).linesIterator
            .find(_.nonEmpty).getOrElse(e.toString).take(160)}")
        }
      }
      assert(failed.isEmpty,
        s"${failed.size} entries tripped a fail-mode guard at " +
          s"EXECUTION:\n${failed.mkString("\n")}")
    }
  }

  test("the FULL catalog analyzes under ALL THREE guards at fail — " +
      "no library operator plans an unpartitioned corpus window, an " +
      "unacknowledged cartesian, or a shrinking UNBOUNDED FOLLOWING " +
      "frame") {
    withGuards("fail") { s2 =>
      val dir = "/root/testdata/sf0.001"
      val failed = SparkEntry.queries.toSeq.sortBy(_._1)
        .flatMap { case (name, fn) =>
          try { fn(s2, dir); None }
          catch { case e: Throwable =>
            Some(s"$name :: ${Option(e.getMessage).getOrElse(e.toString)
              .linesIterator.next().take(120)}")
          }
        }
      assert(failed.isEmpty,
        s"${failed.size} catalog entries tripped a fail-mode guard:\n" +
          failed.mkString("\n"))
    }
  }

  test("a session without the extension is never affected") {
    spark.conf.set("spark.graft.guard.unpartitionedWindow", "fail")
    try {
      assert(spark.range(4)
        .withColumn("r", row_number().over(Window.orderBy("id")))
        .collect().length == 4)
    } finally {
      spark.conf.unset("spark.graft.guard.unpartitionedWindow")
    }
  }
}
