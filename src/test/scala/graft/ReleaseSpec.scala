package graft

import org.apache.spark.sql.functions._

import graft.operators.{Checks, Pipelines}

/** [[graft.operators.Pipelines.releaseCorpus]] — the one-call release:
  * every stage prunes its class, the checks gate blocks a bad publish
  * with staging intact, and the sidecars land. */
class ReleaseSpec extends TestBase {
  import spark.implicits._

  // survivors need ≥50 tokens, stopwords, terminal punctuation (C4
  // line rule), and mid-range mean token length
  private def goodText(seed: Int): String =
    (1 to 60).map(i => s"word$seed$i").mkString(
      "the and for are this ", " ", " end.")

  private def corpus = {
    val base = Seq(
      (1L, goodText(1), "web"),
      (2L, goodText(2), "web"),
      (3L, goodText(2), "web"),          // exact dup of 2 → dropped
      (4L, goodText(4), "books"),
      (5L, "too short.", "web"))          // fails the gate
      .toDF("doc_id", "text", "source")
    base
  }

  private def bench =
    Seq((900L, goodText(4))).toDF("doc_id", "text") // contaminates 4

  test("releaseCorpus: stages prune, recipe fans out, sidecars land") {
    val staging = tmpDir().resolve("staging").toString
    val out = tmpDir().resolve("out").toString
    val sum = Pipelines.releaseCorpus(corpus, "doc_id", "text",
      "source", bench, "doc_id", "text", staging, out,
      repeats = Map("web" -> 2), shards = 2, maxRecordsPerFile = 10)
    // survivors: 1 and 2 (3 deduped, 4 decontaminated, 5 gated)
    assert(sum.nStaged == 2, s"staged ${sum.nStaged}")
    val stagedIds = spark.read.parquet(staging)
      .select("doc_id").as[Long].collect().toSet
    assert(stagedIds == Set(1L, 2L))
    // both survivors are web ×2 → 4 published rows
    assert(sum.nPublishedRows == 4, s"published ${sum.nPublishedRows}")
    assert(sum.nPublishedFiles >= 1)
    assert(sum.checks.forall(_._5))
    // sidecars exist and scans of the shard dir ignore them
    assert(spark.read.parquet(s"$out/_card").count() > 0)
    assert(spark.read.parquet(s"$out/_manifest").count() ==
      sum.nPublishedFiles)
    assert(spark.read.parquet(out).count() == 4,
      "shard scan sees data rows only, not sidecars")
    // published rows carry epoch + shuffle_key (the loader contract)
    val cols = spark.read.parquet(out).columns.toSet
    assert(cols.contains("epoch") && cols.contains("shuffle_key"))
  }

  test("releaseCorpus: a failing checks suite refuses to publish, " +
      "staging kept for forensics") {
    val staging = tmpDir().resolve("staging2").toString
    val out = tmpDir().resolve("out2").toString
    val e = intercept[IllegalArgumentException] {
      Pipelines.releaseCorpus(corpus, "doc_id", "text", "source",
        bench, "doc_id", "text", staging, out,
        checks = Seq(Checks.MinRows(1000000)))
    }
    assert(e.getMessage.contains("refusing to publish"), e.getMessage)
    assert(e.getMessage.contains("min_rows"))
    // staging survived; nothing published
    assert(spark.read.parquet(staging).count() == 2)
    assert(!new java.io.File(out).exists,
      "no output dir after an aborted release")
  }
}
