package graft

import org.apache.spark.sql.functions._

/** [[graft.sources.SynthDocs]] — the DSv2 generator source must be
  * deterministic, partition-count independent, prunable, and
  * SQL-replayable. */
class SynthDocsSpec extends TestBase {

  private def read(rows: Long, parts: Int = 0, seed: String = "synth") = {
    var r = spark.read.format("synthdocs").option("rows", rows.toString)
      .option("seed", seed)
    if (parts > 0) r = r.option("partitions", parts.toString)
    r.load()
  }

  test("deterministic content, exact row count, id-derived fields") {
    val df = read(100)
    assert(df.count() == 100)
    val r7 = df.filter(col("doc_id") === 7).collect().head
    assert(r7.getString(1) == "src7")
    val words = r7.getString(2).split(" ")
    assert(words.length == 3 + 7 % 4) // 2 + id%4 + 1 words
    assert(words(0) ==
      graft.sources.SynthDocs.md5Hex("synth|7|0").take(8))
    // a different seed changes text, never ids/sources
    val other = read(100, seed = "x").filter(col("doc_id") === 7)
      .collect().head
    assert(other.getString(1) == "src7" &&
      other.getString(2) != r7.getString(2))
  }

  test("partition-count independence: same table from 1, 5, 32 splits") {
    val base = read(211, parts = 1).orderBy("doc_id").collect().toSeq
    for (p <- Seq(5, 32)) {
      val got = read(211, parts = p).orderBy("doc_id").collect().toSeq
      assert(got == base, s"content changed at partitions=$p")
      assert(read(211, parts = p).rdd.getNumPartitions == p)
    }
  }

  test("column pruning reaches the generator (DSv2 pushdown)") {
    val pruned = read(50).select("doc_id")
    pruned.collect()
    val p = pruned.queryExecution.executedPlan.toString
    // the BatchScan's read schema must carry ONLY doc_id — text
    // generation (the expensive part) never runs
    assert(p.contains("doc_id") && !p.contains("text"),
      s"text must be pruned from the scan:\n$p")
    // count(*) prunes everything and still counts
    assert(read(123).count() == 123)
  }

  test("aggregate pushdown: count/min/max answer closed-form — a " +
      "2 B-row corpus counts in O(1), never generating a row") {
    val df = read(2000000000L)
    val a = df.agg(count(lit(1)).as("n"), min("doc_id").as("min_id"),
      max("doc_id").as("max_id"), count("text").as("n_text"))
    val row = a.collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) == (2000000000L, 0L, 1999999999L, 2000000000L))
    val p = a.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregates"),
      s"aggregation must reach the generator:\n$p")
    // Dataset.count() rides the same path
    assert(df.count() == 2000000000L)
  }

  test("aggregate pushdown declines what it cannot answer closed-form") {
    // sums, distinct counts and group-bys fall back to generate-then-
    // aggregate — and the fallback is still CORRECT
    val df = read(1000)
    val s = df.agg(sum("doc_id").as("s"), countDistinct("source").as("d"))
    assert(!s.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    val r = s.collect().head
    assert(r.getLong(0) == 999L * 1000 / 2 && r.getLong(1) == 20L)
    val g = df.groupBy("source").agg(count(lit(1)))
    assert(!g.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    assert(g.count() == 20)
    // pushed and unpushed agree on the pushable trio
    val both = df.agg(count(lit(1)), min("doc_id"), max("doc_id"))
      .collect().head
    assert((both.getLong(0), both.getLong(1), both.getLong(2)) ==
      (1000L, 0L, 999L))
  }

  test("limit and top-N pushdown: only the needed id sub-range " +
      "generates, content identical to the unpushed table") {
    val df = read(1000000000L)
    val lim = df.limit(5)
    assert(lim.queryExecution.executedPlan.toString.contains("ids [0, 5)"))
    // pushed rows are the SAME rows the full generator would emit
    assert(lim.collect().toSeq == read(5).collect().toSeq)
    val top = df.orderBy(col("doc_id").desc).limit(3)
    assert(top.queryExecution.executedPlan.toString
      .contains("ids [999999997, 1000000000)"))
    assert(top.collect().map(_.getLong(0)).toSeq ==
      Seq(999999999L, 999999998L, 999999997L))
    val asc = df.orderBy("doc_id").limit(2)
    assert(asc.queryExecution.executedPlan.toString.contains("ids [0, 2)"))
    assert(asc.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L))
    // a sort the id spine can't answer declines — full range, correct
    val dec = read(100).orderBy(col("source"), col("doc_id")).limit(1)
    assert(dec.queryExecution.executedPlan.toString
      .contains("ids [0, 100)"))
    assert(dec.collect().head.getLong(0) == 0L) // src0's smallest id
  }

  test("aggregate pushdown over zero rows: count 0, min/max NULL") {
    val r = read(0).agg(count(lit(1)).as("n"), min("doc_id").as("m"),
      max("doc_id").as("x")).collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("md5 word derivation matches Spark's own md5 (oracle contract)") {
    val viaSql = spark.range(1)
      .select(md5(lit("synth|42|0")).cast("string")).collect()
      .head.getString(0)
    assert(graft.sources.SynthDocs.md5Hex("synth|42|0") == viaSql)
  }

  test("filter pushdown: doc_id range predicates narrow the generated " +
      "sub-range; residuals keep aggregate pushdown honest; non-id " +
      "filters generate-then-filter") {
    import org.apache.spark.sql.functions._
    def loaded = spark.read.format("synthdocs")
      .option("rows", "10000").option("seed", "fp").load()
    val sliced = loaded
      .filter(col("doc_id") >= 9000L && col("doc_id") < 9050L)
    sliced.write.format("noop").mode("overwrite").save()
    val p = sliced.queryExecution.executedPlan.toString
    assert(p.contains("synthdocs ids [9000, 9050)"),
      s"range not pushed:\n$p")
    assert(sliced.count() == 50L)
    // equality and one-sided bounds
    val eq = loaded.filter(col("doc_id") === 7L)
    eq.write.format("noop").mode("overwrite").save()
    assert(eq.queryExecution.executedPlan.toString
      .contains("synthdocs ids [7, 8)"))
    // a filtered count must NOT be answered by the closed-form
    // aggregate path (residual filters block it)
    assert(loaded.filter(col("doc_id") < 10L).count() == 10L)
    assert(loaded.filter(col("source") === "src3").count() == 500L)
    // contradiction collapses to the empty range, zero rows
    assert(loaded.filter(col("doc_id") > 100L && col("doc_id") < 50L)
      .count() == 0L)
    // non-id predicates decline: full range scans, Spark filters
    val nonId = loaded.filter(col("source") === "src3")
    nonId.write.format("noop").mode("overwrite").save()
    assert(nonId.queryExecution.executedPlan.toString
      .contains("synthdocs ids [0, 10000)"))
  }
}
