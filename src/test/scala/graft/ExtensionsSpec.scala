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
