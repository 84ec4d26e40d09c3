package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Decontaminate, Dedup, Pipelines, Sampling, Vocab}

/** Round-5 corpus operators: benchmark decontamination, deterministic
  * sampling, vocabulary/TF-IDF, incremental dedup, MinHash estimation. */
class CorpusOpsSpec extends TestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // ---------- C4 global line dedup -----------------------------------------

  test("dedupLines: a repeated line survives only at its first (id, pos); " +
    "short lines are exempt; hollow docs drop; partitioning-invariant") {
    val df = docs(
      1L -> "a common boilerplate line\nunique alpha text line one\nok",
      2L -> "a common boilerplate line\nunique beta text line two\nok",
      3L -> "a common boilerplate line")
    val out = Dedup.dedupLines(df, "doc_id", "text", minLineChars = 10)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // doc1 keeps all (first occurrence + short-exempt 'ok'); doc2 loses
    // only the boilerplate; doc3 WAS only boilerplate → dropped whole
    assert(out == Seq(
      1L -> "a common boilerplate line\nunique alpha text line one\nok",
      2L -> "unique beta text line two\nok"), s"got $out")
    // within-doc repeats collapse to the first too; short mid survives
    val self = docs(
      7L -> "duplicated inside doc\nmid\nduplicated inside doc")
    assert(Dedup.dedupLines(self, "doc_id", "text")
      .as[(Long, String)].collect().toSeq ==
      Seq(7L -> "duplicated inside doc\nmid"))
    // membership and rebuilt text ignore partitioning
    assert(Dedup.dedupLines(df.repartition(7), "doc_id", "text")
      .collect().toSet ==
      Dedup.dedupLines(df, "doc_id", "text").collect().toSet)
    // null text has no lines — dropped, never a null-text output row
    val withNull = df.union(Seq((9L, null.asInstanceOf[String]))
      .toDF("doc_id", "text"))
    assert(!Dedup.dedupLines(withNull, "doc_id", "text")
      .select("doc_id").as[Long].collect().contains(9L))
    intercept[IllegalArgumentException] {
      Dedup.dedupLines(df, "doc_id", "text", minLineChars = 0)
    }
  }

  test("dedupLinesC4: C4-failing lines delete everywhere, surviving " +
    "duplicates keep first occurrence only, short passers stay exempt") {
    val df = docs(
      // 'no terminal punct' fails C4 (no terminal mark) in BOTH docs;
      // the boilerplate sentence passes C4 and dedups to doc 1
      1L -> ("this boilerplate sentence repeats everywhere.\n" +
        "no terminal punct\nunique alpha line stays here.\nok now."),
      2L -> ("this boilerplate sentence repeats everywhere.\n" +
        "unique beta line stays put.\nok now."),
      // javascript mention fails C4 even with terminal punctuation
      3L -> "please enable javascript to continue.",
      // under-3-words line fails C4's word floor
      4L -> "two words.")
    val out = Dedup.dedupLinesC4(df, "doc_id", "text",
        minLineChars = 10, minLineWords = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // 'ok now.' is 2 tokens → C4-deleted despite terminal punctuation;
    // doc1 keeps boilerplate (first occurrence) + its unique line,
    // doc2 keeps only its unique line
    assert(out == Seq(
      1L -> ("this boilerplate sentence repeats everywhere.\n" +
        "unique alpha line stays here."),
      2L -> "unique beta line stays put."), s"got $out")
    // short C4-PASSING line is exempt from dedup: kept in both docs
    val short = docs(
      5L -> "a b c.\nlong unique sentence number five here.",
      6L -> "a b c.\nlong unique sentence number six here.")
    val kept = Dedup.dedupLinesC4(short, "doc_id", "text",
        minLineChars = 10, minLineWords = 3)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(kept == Seq(
      5L -> "a b c.\nlong unique sentence number five here.",
      6L -> "a b c.\nlong unique sentence number six here."), s"got $kept")
    // composition parity with the two-pass recipe (withC4Rules' line
    // filter, then dedupLines) on docs that keep ≥1 line. Hollow docs
    // differ BY CONTRACT: the fused op drops them; the two-pass keeps
    // an empty-string doc (withC4Rules emits c4_text='' and dedupLines
    // exempts the short '' line) — dropping is the C4 behavior.
    val parity = docs(
      10L -> ("this boilerplate sentence repeats everywhere.\n" +
        "no terminal punct\nunique alpha line stays here."),
      11L -> ("this boilerplate sentence repeats everywhere.\n" +
        "unique beta line stays put."))
    val c4Then = Dedup.dedupLines(
      graft.operators.TextAnalysis.withC4Rules(parity, "text")
        .select(col("doc_id"), col("c4_text").as("text")),
      "doc_id", "text", minLineChars = 10)
    assert(Dedup.dedupLinesC4(parity, "doc_id", "text").collect().toSet ==
      c4Then.collect().toSet)
  }

  test("dedupParagraphsFuzzy: near-identical blocks die at their later " +
      "(doc, pos); short paragraphs exempt; boilerplate-only docs drop") {
    val boiler = "subscribe to our newsletter for updates every single week"
    val boilerEdited =
      "subscribe to our newsletter for updates every single day"
    val df = docs(
      1L -> s"$boiler\n\nunique first document body paragraph here\n\nok",
      2L -> s"$boilerEdited\n\nanother unique body paragraph two\n\nok",
      3L -> boiler)
    val out = Dedup.dedupParagraphsFuzzy(df, "doc_id", "text",
        threshold = 0.5, minParaTokens = 5)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // doc1 keeps everything (first occurrence); doc2 loses only the
    // EDITED near-copy; doc3 was pure boilerplate → dropped whole;
    // the 1-token 'ok' paragraph is exempt everywhere
    assert(out == Seq(
      1L -> s"$boiler\n\nunique first document body paragraph here\n\nok",
      2L -> "another unique body paragraph two\n\nok"), s"got $out")
    // within-doc exact repeat collapses to its first position
    val self = docs(7L ->
      s"$boiler\n\nmiddle unique paragraph with several words\n\n$boiler")
    assert(Dedup.dedupParagraphsFuzzy(self, "doc_id", "text",
        threshold = 0.5).as[(Long, String)].collect().toSeq ==
      Seq(7L ->
        s"$boiler\n\nmiddle unique paragraph with several words"))
    // partitioning invariance
    assert(Dedup.dedupParagraphsFuzzy(df.repartition(7), "doc_id",
      "text", threshold = 0.5).collect().toSet ==
      Dedup.dedupParagraphsFuzzy(df, "doc_id", "text",
        threshold = 0.5).collect().toSet)
    // loud contracts: bad threshold; paragraph-count overflow raises
    intercept[IllegalArgumentException](
      Dedup.dedupParagraphsFuzzy(df, "doc_id", "text", threshold = 0.0))
    val boom = intercept[Exception](
      Dedup.dedupParagraphsFuzzy(df, "doc_id", "text",
        maxParasPerDoc = 2L).collect())
    assert(boom.getMessage.contains("maxParasPerDoc") ||
      Option(boom.getCause).exists(
        _.getMessage.contains("maxParasPerDoc")),
      s"wrong failure: ${boom.getMessage}")
  }

  test("denoisingMixture: one objective per doc, 2:1:1 routing, the " +
      "extreme slice masks more than the regular, deterministic") {
    val df = (0L until 120L).map(i =>
      (i, (1 to 80).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Pipelines.denoisingMixture(df, "doc_id", "text")
    val rows = out.collect()
    // exactly one pair per doc (every doc is long enough to split)
    assert(rows.length == 120)
    assert(rows.map(_.getLong(0)).distinct.length == 120)
    val byObj = rows.groupBy(_.getString(1)).view.mapValues(_.length)
    // 2:1:1 in expectation over 120 docs — loose deterministic band
    assert(byObj("r") > byObj("x") && byObj("r") > byObj("s"),
      s"routing off: $byObj")
    assert(Set("r", "x", "s") == byObj.keys.toSet)
    // the extreme objective masks a larger fraction: count sentinels
    def meanSentinels(obj: String) = {
      val rs = rows.filter(_.getString(1) == obj)
      rs.map(r => "<extra_id_".r.findAllIn(r.getString(2)).length)
        .sum.toDouble / rs.length
    }
    assert(meanSentinels("x") > meanSentinels("r"),
      "extreme denoiser must corrupt more than regular")
    // s-slice pairs rebuild the original
    rows.filter(_.getString(1) == "s").foreach { r =>
      val orig = df.filter(col("doc_id") === r.getLong(0))
        .head.getString(1)
      assert(r.getString(2) + " " + r.getString(3) == orig)
    }
    // deterministic under repartitioning
    assert(Pipelines.denoisingMixture(df.repartition(7), "doc_id",
      "text").collect().toSet == rows.toSet)
    intercept[IllegalArgumentException](
      Pipelines.denoisingMixture(df, "doc_id", "text",
        weights = Seq(1, 1)))
  }

  test("upsertLatest: higher version wins, new side wins ties, " +
      "untouched and added rows survive, schema drift refused") {
    val oldDf = Seq((1L, "one v1", 1L), (2L, "two v1", 1L),
      (3L, "three v2", 2L)).toDF("doc_id", "text", "ver")
    val newDf = Seq((1L, "one v2", 2L),     // update wins
      (3L, "three v2 recrawl", 2L),          // same ver: new side wins
      (4L, "four new", 1L))                  // addition
      .toDF("doc_id", "text", "ver")
    val out = Dedup.upsertLatest(oldDf, newDf, "doc_id", "ver")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out == Map(
      1L -> ("one v2", 2L), 2L -> ("two v1", 1L),
      3L -> ("three v2 recrawl", 2L), 4L -> ("four new", 1L)),
      s"got $out")
    // a STALE update (lower version than the accumulated row) loses
    val stale = Seq((3L, "three stale", 1L)).toDF("doc_id", "text", "ver")
    assert(Dedup.upsertLatest(oldDf, stale, "doc_id", "ver")
      .filter(col("doc_id") === 3L).head.getString(1) == "three v2")
    // one aggregation, no joins, partitioning-invariant
    val plan = Dedup.upsertLatest(oldDf, newDf, "doc_id", "ver")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"upsert must not join:\n$plan")
    assert(Dedup.upsertLatest(oldDf.repartition(5), newDf.repartition(3),
      "doc_id", "ver").collect().toSet ==
      Dedup.upsertLatest(oldDf, newDf, "doc_id", "ver").collect().toSet)
    intercept[IllegalArgumentException](Dedup.upsertLatest(
      oldDf, newDf.select("doc_id", "ver", "text"), "doc_id", "ver"))
  }

  // ---------- BM25 retrieval selection -------------------------------------

  test("bm25Scores matches the textbook formula exactly; rarity raises " +
      "idf; no-hit docs absent; topK is a TakeOrdered with id tie-break") {
    val df = docs(
      1L -> "spark spark spark filler words here",        // tf=3
      2L -> "spark rare filler words also here",          // both terms
      3L -> "rare filler text entirely different stuff",  // rare only
      4L -> "nothing relevant in this document whatsoever") // no hits
    val out = Vocab.bm25Scores(df, "doc_id", "text", Seq("spark", "rare"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // mirror the formula in plain Scala (N=4, dl=6 each, avgdl=6)
    def idf(dfc: Int) = math.log(1.0 + (4 - dfc + 0.5) / (dfc + 0.5)) /
      math.log(2.0)
    def w(tf: Long, dfc: Int, dl: Long) =
      idf(dfc) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 6.0))
    assert(out.keySet == Set(1L, 2L, 3L), "no-hit doc must be absent")
    assert(out(1L)._1 == 1L && math.abs(out(1L)._2 - w(3, 2, 6)) < 1e-6)
    assert(out(2L)._1 == 2L &&
      math.abs(out(2L)._2 - (w(1, 2, 6) + w(1, 2, 6))) < 1e-6)
    assert(out(3L)._1 == 1L && math.abs(out(3L)._2 - w(1, 2, 6)) < 1e-6)
    // rarity: same tf/dl, the 2-doc term out-scores the 3-doc term
    val rar = Vocab.bm25Scores(df, "doc_id", "text", Seq("rare"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val com = Vocab.bm25Scores(df, "doc_id", "text", Seq("filler"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rar(3L) > com(3L), "a 2-doc term must out-score a 3-doc term")
    // partitioning invariance (decimal term sums, not float fold order)
    assert(Vocab.bm25Scores(df.repartition(7), "doc_id", "text",
      Seq("spark", "rare")).collect().toSet ==
      Vocab.bm25Scores(df, "doc_id", "text",
        Seq("spark", "rare")).collect().toSet)
    // topK: ordered desc, ties break on id, TakeOrdered (no global sort)
    val top = Vocab.bm25TopK(df, "doc_id", "text", Seq("spark", "rare"),
      k = 2)
    val topRows = top.collect().map(_.getLong(0)).toSeq
    val ranked = out.toSeq.sortBy { case (id, (_, s)) => (-s, id) }
      .map(_._1).take(2)
    assert(topRows == ranked, s"topK $topRows != ranked $ranked")
    assert(top.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "global top-k must plan as TakeOrdered, not a full sort")
    intercept[IllegalArgumentException](
      Vocab.bm25Scores(df, "doc_id", "text", Seq.empty))
    intercept[IllegalArgumentException](
      Vocab.bm25TopK(df, "doc_id", "text", Seq("x"), k = 0))
  }

  // ---------- Decontaminate ------------------------------------------------

  test("decontamination overlap: exact copy 1.0, disjoint 0.0, short doc 0") {
    val bench = docs(900L -> "alpha beta gamma delta epsilon zeta")
    val corpus = docs(
      1L -> "alpha beta gamma delta epsilon zeta", // exact copy of bench
      2L -> "alpha beta gamma delta other words here entirely", // partial
      3L -> "one two three four five six seven", // disjoint
      4L -> "tiny doc") // shorter than one 5-shingle
    val out = Decontaminate.overlap(corpus, "doc_id", "text", bench, "text",
      shingleN = 5, flagAt = 0.5).orderBy("doc_id").collect()

    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(byId(1L) == ((2L, 2L, 1.0, true)))
    // doc 2 shares a 4-token prefix with the bench doc, but every one of
    // its 5-shingles contains at least one non-bench token — 5-gram
    // granularity correctly scores word-level overlap as zero
    assert(byId(2L)._2 == 0L && !byId(2L)._4)
    assert(byId(3L) == ((3L, 0L, 0.0, false)))
    assert(byId(4L) == ((0L, 0L, 0.0, false)))
  }

  test("decontamination gate keeps all original columns, drops flagged") {
    val bench = docs(900L -> "alpha beta gamma delta epsilon zeta")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "web"),
      (3L, "one two three four five six seven", "book"))
      .toDF("doc_id", "text", "source")
    val kept = Decontaminate.decontaminate(corpus, "doc_id", "text",
      bench, "text", shingleN = 5, flagAt = 0.5)
    assert(kept.columns.toSeq == Seq("doc_id", "text", "source"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("decontamination probe is a broadcast join — corpus never shuffles" +
    " for the membership check") {
    val bench = docs(900L -> "alpha beta gamma delta epsilon zeta")
    val corpus = docs(1L -> "alpha beta gamma delta epsilon zeta")
    val out = Decontaminate.overlap(corpus, "doc_id", "text", bench, "text")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus-side shuffle join crept in:\n$p")
  }

  // ---------- Sampling -----------------------------------------------------

  test("bernoulli sample: bp=0 keeps none, bp=10000 keeps all, rate ~ bp") {
    val ids = spark.range(10000).select(col("id"))
    assert(Sampling.bernoulli(ids.toDF(), col("id"), 0).count() == 0L)
    assert(Sampling.bernoulli(ids.toDF(), col("id"), 10000).count() == 10000L)
    val n = Sampling.bernoulli(ids.toDF(), col("id"), 2500).count()
    assert(n > 2200 && n < 2800, s"2500bp of 10000 drew $n")
  }

  test("sample membership is deterministic and repartition-invariant") {
    val base = spark.range(5000).toDF()
    val a = Sampling.bernoulli(base, col("id"), 3000)
      .select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.bernoulli(base.repartition(17), col("id"), 3000)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("samples are nested: bp=1000 sample is a subset of bp=5000") {
    val base = spark.range(5000).toDF()
    val small = Sampling.bernoulli(base, col("id"), 1000)
      .select("id").as[Long].collect().toSet
    val big = Sampling.bernoulli(base, col("id"), 5000)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(big))
  }

  test("stratified sampling applies per-stratum rates with default") {
    val df = spark.range(9000).select(col("id"),
      (when(col("id") % 3 === 0, "en")
        .when(col("id") % 3 === 1, "de").otherwise("fr")).as("lang"))
    val out = Sampling.stratified(df, col("id"), col("lang"),
      Map("en" -> 8000, "de" -> 1000), defaultBp = 0)
    val counts = out.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(!counts.contains("fr"), "default 0bp must drop the stratum")
    assert(counts("en") > 2200 && counts("en") < 2700, counts.toString)
    assert(counts("de") > 200 && counts("de") < 400, counts.toString)
  }

  test("stratified sample is a pure scan filter — no exchange in the plan") {
    val dir = s"${tmpDir()}/strat_docs"
    docs(1L -> "a", 2L -> "b").withColumn("lang", lit("en"))
      .write.parquet(dir)
    val out = Sampling.stratified(spark.read.parquet(dir),
      col("doc_id"), col("lang"), Map("en" -> 5000), defaultBp = 1000)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
  }

  // ---------- Vocab --------------------------------------------------------

  test("vocabulary counts collection and document frequency") {
    val corpus = docs(
      1L -> "the cat sat",
      2L -> "the the dog",
      3L -> "a dog ran")
    val v = Vocab.vocabulary(corpus, "doc_id", "text")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(v("the") == ((3L, 2L))) // 3 occurrences across 2 docs
    assert(v("dog") == ((2L, 2L)))
    assert(v("cat") == ((1L, 1L)))
    val fDf = Vocab.vocabulary(corpus, "doc_id", "text", minDf = 2)
      .select("term").as[String].collect().toSet
    assert(fDf == Set("the", "dog"))
  }

  test("tfIdfTopTerms ranks rare terms above common ones, ties on term") {
    // "zebra" appears once in doc 1 only; "the" appears once in every doc.
    // Equal tf within a doc, so idf decides; ties break lexicographically.
    val corpus = docs(
      1L -> "the zebra runs",
      2L -> "the dog barks",
      3L -> "the cat sits")
    val top = Vocab.tfIdfTopTerms(corpus, "doc_id", "text", k = 3,
      idf = Vocab.linearIdf)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("term", "score").as[(String, Double)].collect()
    assert(top.head._1 == "runs" || top.head._1 == "zebra")
    // runs/zebra both df=1 tf=1/3 → identical score, term tiebreak
    assert(top.map(_._1).toSeq == Seq("runs", "zebra", "the"))
    assert(top(0)._2 == top(1)._2 && top(1)._2 > top(2)._2)
    // score of a df=1 term in a 3-token doc over 3 docs: (1/3) * (3/1)
    assert(top(0)._2 == (1.0 / 3.0) * 3.0)
  }

  test("tfIdfTopTerms respects k and covers every doc") {
    val corpus = docs(
      1L -> "alpha beta gamma delta",
      2L -> "beta gamma",
      3L -> "gamma")
    val out = Vocab.tfIdfTopTerms(corpus, "doc_id", "text", k = 2)
    val byDoc = out.groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(byDoc(1L) == 2L && byDoc(2L) == 2L && byDoc(3L) == 1L)
  }

  // ---------- unigram LM quality score ------------------------------------

  test("unigramLogProb: hand-checked means over the corpus distribution") {
    // vocab: a->2, b->2, c->1, total 5
    val corpus = docs(1L -> "a a b", 2L -> "b c")
    val out = Vocab.unigramLogProb(corpus, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    // doc 1: every token has p = 2/5 → mean = log2(0.4)
    // doc 2: (log2(2/5) + log2(1/5)) / 2
    val l04 = math.log(0.4) / math.log(2.0)
    val l02 = math.log(0.2) / math.log(2.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out == Seq(
      (1L, 3L, r6(l04)),
      (2L, 2L, r6((l04 + l02) / 2.0))))
  }

  test("unigramLogProb is partitioning-invariant (sorted fold)") {
    val corpus = docs((0L until 60L).map(i =>
      i -> s"tok${i % 7} tok${i % 3} tok${i % 11} shared words here"): _*)
    def run(d: org.apache.spark.sql.DataFrame) =
      Vocab.unigramLogProb(d, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(run(corpus) == run(corpus.repartition(19)))
  }

  test("bigramLogProb: hand-checked add-0.5 smoothed conditionals; " +
    "sub-2-token docs absent") {
    // doc1 [a b a b]: (a,b)x2 (b,a)x1; doc2 [a b c]: (a,b) (b,c)
    // bf: (a,b)=3 (b,a)=1 (b,c)=1; wf: a=3 b=2; V=4 (a b c x)
    val corpus = docs(1L -> "a b a b", 2L -> "a b c", 3L -> "x")
    val out = Vocab.bigramLogProb(corpus, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val pAB = 3.5 / 5.0  // (3+.5)/(3+.5*4)
    val pBA = 1.5 / 4.0  // (1+.5)/(2+.5*4)
    val pBC = 1.5 / 4.0
    def l2(x: Double) = math.log(x) / math.log(2.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out == Seq(
      (1L, 3L, r6((2 * l2(pAB) + l2(pBA)) / 3.0)),
      (2L, 2L, r6((l2(pAB) + l2(pBC)) / 2.0))),
      s"got $out")
  }

  test("pmiCollocations: hand-checked PMI, minCount kills hapax pairs, " +
      "tie order and topK cut, null text excluded, guards") {
    // d1 [new york new york], d2 [in new york], d3 [a b a b a b]:
    // T=13 token slots, B=10 bigram slots
    // pairs: (new,york)=3 (york,new)=1 (in,new)=1 (a,b)=3 (b,a)=2
    val corpus = docs(1L -> "new york new york", 2L -> "in new york",
      3L -> "a b a b a b").union(docs(4L -> null))
    def l2(x: Double) = math.log(x) / math.log(2.0)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val pmi33 = r6(l2((3.0 / 10) / ((3.0 / 13) * (3.0 / 13))))
    val pmiBA = r6(l2((2.0 / 10) / ((3.0 / 13) * (3.0 / 13))))
    val all = Vocab.pmiCollocations(corpus, "text", minCount = 2,
      topK = 10).as[(String, String, Long, Double)].collect().toSeq
    // (a,b) and (new,york) tie on pmi → w1 breaks it; hapax pairs gone
    assert(all == Seq(("a", "b", 3L, pmi33),
      ("new", "york", 3L, pmi33), ("b", "a", 2L, pmiBA)), all)
    val cut = Vocab.pmiCollocations(corpus, "text", minCount = 2,
      topK = 2).as[(String, String, Long, Double)].collect().toSeq
    assert(cut == all.take(2))
    // without the floor, the hapax (in,new) pair ties the top PMI
    // (0.1·169/3 = 0.3·169/9) — the accidental-maximum failure mode
    // the knob exists for
    val noFloor = Vocab.pmiCollocations(corpus, "text", minCount = 1,
      topK = 10).as[(String, String, Long, Double)].collect()
    assert(noFloor(1) == (("in", "new", 1L, pmi33)), noFloor.toSeq)
    assert(intercept[IllegalArgumentException] {
      Vocab.pmiCollocations(corpus, "text", minCount = 0)
    }.getMessage.contains("minCount"))
    assert(intercept[IllegalArgumentException] {
      Vocab.pmiCollocations(corpus, "text", topK = 0)
    }.getMessage.contains("topK"))
  }

  test("cTfIdfTopTerms: the shared term scores 0, each key's private " +
      "term characterizes it; top-k cut and tie order; null key/text " +
      "excluded; guard") {
    import spark.implicits._
    // x appears in every key → idf ln(3/3) = 0; y/z/w are private
    val d = Seq(("A", "x x y"), ("B", "x z"), ("C", "x w"),
      (null, "noise"), ("A", null)).toDF("src", "text")
    def l3(f: Double) = math.rint(f * math.log(3.0) * 1e6) / 1e6
    val out = Vocab.cTfIdfTopTerms(d, "src", "text", k = 2)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("A", "y", 1L, l3(1.0 / 3)), ("A", "x", 2L, 0.0),
      ("B", "z", 1L, l3(0.5)), ("B", "x", 1L, 0.0),
      ("C", "w", 1L, l3(0.5)), ("C", "x", 1L, 0.0)), out)
    val top1 = Vocab.cTfIdfTopTerms(d, "src", "text", k = 1)
      .as[(String, String, Long, Double)].collect().map(r => r._1 -> r._2)
    assert(top1.toSeq == Seq("A" -> "y", "B" -> "z", "C" -> "w"))
    assert(intercept[IllegalArgumentException] {
      Vocab.cTfIdfTopTerms(d, "src", "text", k = 0)
    }.getMessage.contains("k must be"))
  }

  test("bigramLogProb: scrambled word order scores below the natural " +
    "order the corpus establishes (what a unigram model cannot see); " +
    "partitioning-invariant") {
    val natural = (1L to 10L).map(i => i -> "the cat sat on the mat")
    val corpus = docs(natural :+ (99L -> "mat the on sat cat the"): _*)
    val scores = Vocab.bigramLogProb(corpus, "doc_id", "text")
      .select("doc_id", "logprob").as[(Long, Double)].collect().toMap
    natural.foreach { case (i, _) =>
      assert(scores(99L) < scores(i),
        s"scramble must score below natural: $scores") }
    def run(d: org.apache.spark.sql.DataFrame) =
      Vocab.bigramLogProb(d, "doc_id", "text")
        .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(run(corpus) == run(corpus.repartition(13)))
    intercept[IllegalArgumentException] {
      Vocab.bigramLogProb(corpus, "doc_id", "text", alpha = 0.0)
    }
  }

  // ---------- exact-count apportioned sampling -----------------------------

  test("apportionedSample: exactly totalN rows with largest-remainder " +
    "quotas; partitioning-invariant membership") {
    val df = ((1L to 50L).map(i => ("s1", i)) ++
      (51L to 80L).map(i => ("s2", i)) ++
      (81L to 100L).map(i => ("s3", i))).toDF("source", "id")
    // exact proportions: 10 of 100 → 5 / 3 / 2, no remainders
    val even = Sampling.apportionedSample(df, col("source"), col("id"),
        totalN = 10)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(even == Map("s1" -> 5L, "s2" -> 3L, "s3" -> 2L), s"$even")
    // remainder case: 7 of 100 → bases 3/2/1 (Σ=6), remainders
    // 50/10/40 → the one top-up lands on s1
    val rem = Sampling.apportionedSample(df, col("source"), col("id"),
        totalN = 7)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(rem == Map("s1" -> 4L, "s2" -> 2L, "s3" -> 1L), s"$rem")
    // membership (not just counts) ignores partitioning
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.apportionedSample(d, col("source"), col("id"), 7)
        .select("id").as[Long].collect().toSet
    assert(ids(df) == ids(df.repartition(17)))
    // totalN beyond the corpus: quotas cap at n_k — everything comes back
    assert(Sampling.apportionedSample(df, col("source"), col("id"),
      totalN = 5000).count() == 100L)
    // null keys/ids have no reproducible draw — excluded
    val withNull = df.union(Seq((null.asInstanceOf[String], 999L))
      .toDF("source", "id"))
    assert(!Sampling.apportionedSample(withNull, col("source"), col("id"),
      totalN = 10).select("id").as[Long].collect().contains(999L))
    intercept[IllegalArgumentException] {
      Sampling.apportionedSample(df, col("source"), col("id"), 0)
    }
  }

  test("apportionedSample: two-phase bucketed rank is bit-identical to " +
    "the full per-key draw order (independent JVM md5 oracle) for every " +
    "bucketChars") {
    val df = ((1L to 50L).map(i => ("s1", i)) ++
      (51L to 80L).map(i => ("s2", i)) ++
      (81L to 100L).map(i => ("s3", i))).toDF("source", "id")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // totalN=10 apportions 5/3/2 (no remainders); within each key the
    // winners are the lowest (md5("apportion|id"), id) draws — computed
    // here WITHOUT Spark, so a rank-decomposition bug cannot hide
    val quotas = Map("s1" -> 5, "s2" -> 3, "s3" -> 2)
    val expected = Seq("s1" -> (1L to 50L), "s2" -> (51L to 80L),
      "s3" -> (81L to 100L)).flatMap { case (k, ids) =>
      ids.sortBy(i => (md5hex(s"apportion|$i"), i)).take(quotas(k))
    }.toSet
    Seq(1, 2, 4).foreach { bc =>
      val got = Sampling.apportionedSample(df, col("source"), col("id"),
          totalN = 10, bucketChars = bc)
        .select("id").as[Long].collect().toSet
      assert(got == expected, s"bucketChars=$bc: $got")
    }
  }

  test("apportionedSample: quota arithmetic is exact at the decimal " +
    "rounding threshold (a quotient fraction of 0.99999975 must floor " +
    "DOWN, and the kept count is exactly totalN)") {
    // 4M rows, keys sized so totalN·n_k/N has fractional part
    // 0.33333325 / 0.6666665 / tiny for a=1333333 / b=2666666 / c=1 —
    // and with totalN=3 the a/b quotients are 0.99999975 and 1.9999995:
    // both above decimal(38,6) HALF_UP's .9999995 rounding threshold,
    // so a floor over ROUNDED division would inflate both bases. pmod
    // arithmetic keeps bases 0/1/0 and awards the two top-ups by true
    // remainder (a: 3999999, b: 3999998) → quotas 1/2/0, Σ = totalN.
    val big = spark.range(0, 4000000L, 1, 32)
      .select(when(col("id") < 1333333L, "a")
        .when(col("id") < 3999999L, "b")
        .otherwise("c").as("source"), col("id"))
    val out = Sampling.apportionedSample(big, col("source"), col("id"),
        totalN = 3)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 1L, "b" -> 2L), s"quotas off: $out")
  }

  test("rankNormalize: maxKeyRows guard raises with the key's name and " +
    "size when a dominant key would serialize its rank partition") {
    val df = ((1L to 40L).map(i => ("huge", i, i)) ++
      (41L to 45L).map(i => ("ok", i, i))).toDF("source", "doc_id", "n")
    val guarded = Sampling.rankNormalize(df, col("source"), col("doc_id"),
      col("n"), maxKeyRows = 10L)
    val e = intercept[Exception] { guarded.collect() }
    assert(e.getMessage.contains("huge") &&
      e.getMessage.contains("maxKeyRows=10"), e.getMessage)
    // under the cap: identical output to the unguarded form
    val loose = Sampling.rankNormalize(df, col("source"), col("doc_id"),
        col("n"), maxKeyRows = 40L)
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    val free = Sampling.rankNormalize(df, col("source"), col("doc_id"),
        col("n"))
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    assert(loose == free)
    intercept[IllegalArgumentException] {
      Sampling.rankNormalize(df, col("source"), col("doc_id"), col("n"),
        maxKeyRows = -1L)
    }
  }

  test("perKeyQuantileGateApprox agrees with the exact gate within one " +
    "boundary row per key on a multi-source fixture, and both gates " +
    "keep a contiguous top segment") {
    // two sources with disjoint score ranges (the global-cutoff trap)
    // plus one with duplicated boundary scores
    val df = ((1L to 100L).map(i => ("s_lo", i, i)) ++
      (101L to 200L).map(i => ("s_hi", i, 10000 + i)) ++
      (201L to 240L).map(i => ("s_tie", i, i / 10))) // ties at boundary
      .toDF("source", "doc_id", "n")
    val exact = Sampling.perKeyQuantileGate(df, col("source"),
        col("doc_id"), col("n"), minPct = 0.75)
      .select("source", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val approx = Sampling.perKeyQuantileGateApprox(df, col("source"),
        col("n"), minPct = 0.75)
      .select("source", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val scores = df.as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(r => r._2 -> r._3).toMap }
    exact.keySet.foreach { k =>
      // both keep a top segment: min kept score >= max dropped score
      Seq(exact(k), approx(k)).foreach { kept =>
        val (inS, outS) = scores(k).partition { case (id, _) =>
          kept.contains(id) }
        assert(inS.values.min >= outS.values.max, s"$k not a top segment")
      }
      // sketch tolerance at this size: counts within boundary ties + 1
      val tieWidth = scores(k).values.toSeq
        .count(_ == scores(k).values.toSeq.sorted.apply(
          (scores(k).size * 0.75).toInt))
      assert(math.abs(exact(k).size - approx(k).size) <= tieWidth + 1,
        s"$k: exact=${exact(k).size} approx=${approx(k).size}")
    }
    // null-scored rows never pass the approx gate either
    val withNull = df.union(Seq(("s_lo", 999L, null.asInstanceOf[Long]))
      .toDF("source", "doc_id", "n").withColumn("n",
        when(col("doc_id") === 999L, lit(null)).otherwise(col("n"))))
    assert(!Sampling.perKeyQuantileGateApprox(withNull, col("source"),
        col("n"), 0.75)
      .select("doc_id").as[Long].collect().contains(999L))
    // a NULL key is its own group, gated against its own cutoff
    val nullKey = ((1L to 10L).map(i =>
      (null.asInstanceOf[String], i, i))).toDF("source", "doc_id", "n")
    val nk = Sampling.perKeyQuantileGateApprox(nullKey, col("source"),
      col("n"), 0.75).select("doc_id").as[Long].collect().toSet
    assert(nk.nonEmpty && nk.size <= 4 && nk.forall(_ >= 7L),
      s"null-key group must gate against its own cutoff: $nk")
    intercept[IllegalArgumentException] {
      Sampling.perKeyQuantileGateApprox(df, col("source"), col("n"), 1.5)
    }
  }

  // ---------- weighted sampling --------------------------------------------

  test("weighted sample: clamps, scales with weight, deterministic") {
    val df = spark.range(4000).select(col("id"),
      (col("id") % 2 * 10000).as("w")) // half weight-0, half weight-10000
    val kept = Sampling.weighted(df, col("id"), col("w"))
      .select("id").as[Long].collect()
    assert(kept.forall(_ % 2 == 1), "weight-0 rows must never be kept")
    assert(kept.length == 2000, "weight-10000 rows must always be kept")
    // negative weights clamp to 0 instead of corrupting the draw
    val neg = Sampling.weighted(df, col("id"), lit(-5) * col("id"))
    assert(neg.count() == 0L)
  }

  // ---------- incremental dedup -------------------------------------------

  test("dedupAgainst drops fingerprint matches, keeps the rest intact") {
    val seen = docs(10L -> "Hello   World", 11L -> "old news")
    val incoming = Seq(
      (1L, "hello world", "keeps-nothing"), // same fingerprint as seen 10
      (2L, "fresh content", "kept"),
      (3L, "fresh content", "kept-dup")) // incoming dups NOT collapsed here
      .toDF("doc_id", "text", "note")
    val out = Dedup.dedupAgainst(incoming, "text", seen, "text")
    assert(out.columns.toSeq == Seq("doc_id", "text", "note"))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L))
  }

  // ---------- quantile gate ------------------------------------------------

  test("keepTopTokenBudget: greedy fill to the token budget including " +
      "the crossing doc; best doc survives any budget; window-form " +
      "parity; partition invariance; guards") {
    import graft.operators.Pipelines
    // A 9→5tok, B 8→4, C 7→3, D 5→10; W=22, 50% budget=11:
    // A(starts 0) B(5) C(9) kept — C crosses and is included; D(12) out
    val d = Seq((1L, Some(9.0), 5L, "a"), (2L, Some(8.0), 4L, "b"),
      (3L, Some(7.0), 3L, "c"), (4L, Some(5.0), 10L, "d"),
      (5L, None: Option[Double], 2L, "nullscore"))
      .toDF("id", "score", "ntok", "payload")
    def kept(bp: Int) = Pipelines
      .keepTopTokenBudget(d, "id", "score", "ntok", bp)
      .select("id").as[Long].collect().toSet
    assert(kept(5000) == Set(1L, 2L, 3L))
    assert(kept(1) == Set(1L), "any positive budget keeps the best doc")
    assert(kept(9999) == Set(1L, 2L, 3L, 4L))
    // parity with the single-window reference over a bigger corpus
    val big = spark.range(500).select(col("id"),
      (col("id") * 37 % 101).cast("double").as("score"),
      (col("id") % 13 + 1).as("ntok"))
    val viaOp = Pipelines
      .keepTopTokenBudget(big, "id", "score", "ntok", 3000)
      .select("id").as[Long].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val tot = big.agg(sum("ntok")).collect().head.getLong(0)
    val viaWin = big.withColumn("run", sum("ntok").over(w))
      .filter((col("run") - col("ntok")) * 10000L < lit(3000L) * tot)
      .select("id").as[Long].collect().toSet
    assert(viaOp == viaWin,
      s"diff: ${(viaOp diff viaWin) ++ (viaWin diff viaOp)}")
    assert(Pipelines.keepTopTokenBudget(big.repartition(17), "id",
      "score", "ntok", 3000).select("id").as[Long].collect().toSet
      == viaOp)
    assert(intercept[IllegalArgumentException] {
      Pipelines.keepTopTokenBudget(d, "id", "score", "ntok", 0)
    }.getMessage.contains("keepBp"))
  }

  test("keepTopQuantile keeps the top quartile, exact and approx agree here") {
    val df = spark.range(100).select(col("id"), (col("id") * 7 % 100)
      .as("score"))
    val exact = graft.operators.Pipelines
      .keepTopQuantile(df, "score", 0.75, exact = true)
    // scores are 0..99 once each; p75 of 0..99 = 74.25 → keep >= 74.25
    assert(exact.count() == 25L)
    assert(exact.agg(min("score")).head().getLong(0) == 75L)
    val approx = graft.operators.Pipelines
      .keepTopQuantile(df, "score", 0.75)
    // percentile_approx returns a member value (74), not the
    // interpolated 74.25 — so the approximate gate admits one more row
    assert(approx.count() == 26L)
    // all original columns survive
    assert(exact.columns.toSeq == Seq("id", "score"))
  }

  // ---------- label centroids ---------------------------------------------

  test("labelCentroids: hand-checked means, member counts, dim order") {
    val df = Seq(
      (0, Seq(1.0f, 10.0f)),
      (0, Seq(3.0f, 30.0f)),
      (1, Seq(5.0f, -5.0f)))
      .toDF("label", "embedding")
    val out = graft.operators.Similarity
      .labelCentroids(df, "label", "embedding")
      .orderBy("label")
      .as[(Int, Seq[Float], Long)].collect()
    assert(out.toSeq == Seq(
      (0, Seq(2.0f, 20.0f), 2L),
      (1, Seq(5.0f, -5.0f), 1L)))
  }

  test("labelCentroids means are partitioning-invariant (sorted fold)") {
    val df = Seq.tabulate(97)(i =>
      (i % 3, Seq((i * 0.317f) % 1.0f, (i * 0.713f) % 1.0f)))
      .toDF("label", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) = graft.operators.Similarity
      .labelCentroids(d, "label", "embedding")
      .orderBy("label").as[(Int, Seq[Float], Long)].collect().toSeq
    assert(run(df) == run(df.repartition(13)))
  }

  // ---------- keep-best representative ------------------------------------

  test("keepBest keeps highest score (min id tie-break), singletons stay") {
    val docsDf = Seq(
      (1L, 10L), (2L, 99L), (3L, 99L), // cluster A: 2 and 3 tie on score
      (7L, 5L)) // never clustered → singleton
      .toDF("doc_id", "quality")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "comp")
    val out = Dedup.keepBest(docsDf, "doc_id", "quality",
        clusters, "id", "comp")
      .orderBy("cluster")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 99L, 3L), // cluster 1: doc 2 wins the tie over doc 3
      (7L, 7L, 5L, 1L))) // singleton keeps itself
  }

  // ---------- repeated passages -------------------------------------------

  test("repeatedPassages finds cross-doc windows, ignores in-doc repeats") {
    val corpus = docs(
      1L -> "the quick brown fox jumps",
      2L -> "said the quick brown fox yesterday",
      3L -> "the quick brown fox the quick brown fox", // in-doc repeat only
      4L -> "completely unrelated text here")
    val out = Dedup.repeatedPassages(corpus, "doc_id", "text",
        n = 4, minDocs = 2)
      .orderBy("passage_text")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // "the quick brown fox" appears in docs 1, 2, 3 (once each after the
    // per-doc distinct); no other 4-gram is shared
    assert(out.map(_._2) == Seq("the quick brown fox"))
    assert(out.head._3 == 3L && out.head._4 == 1L && out.head._5 == 3L)
  }

  test("curate with a benchmark drops contaminated survivors only") {
    val bench = docs(900L ->
      "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val corpus = docs(
      // clean doc: survives every gate (en stopwords, >=10 tokens)
      1L -> ("the cat and the dog are in the house with a bird " +
        "and the mouse is here too"),
      // contaminated: same gates pass, but text IS the benchmark + filler
      2L -> ("the alpha beta gamma delta epsilon zeta eta theta iota " +
        "kappa and the end is here with more of the filler"))
    val withB = graft.operators.Pipelines.curate(corpus, "doc_id", "text",
      benchmark = Some(bench), deconShingleN = 5, deconFlagAt = 0.2)
      .select("doc_id").as[Long].collect().toSeq
    val withoutB = graft.operators.Pipelines.curate(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(withoutB == Seq(1L, 2L), s"both docs pass the base gates: $withoutB")
    assert(withB == Seq(1L), s"benchmark stage must drop doc 2: $withB")
  }

  // ---------- histogram ----------------------------------------------------

  test("histogram bins with clamped outliers, null/NaN exclusion, edges") {
    val df = Seq[java.lang.Double](-5.0, 0.0, 9.9, 10.0, 25.0, 99.0, 150.0,
      Double.NaN, null).toDF("x")
    val h = graft.operators.Profiles.histogram(df, "x", 0.0, 100.0, 10)
      .orderBy("bin").as[(Long, Double, Double, Long)].collect().toSeq
    assert(h == Seq(
      (0L, 0.0, 10.0, 3L),   // -5 clamped in, 0.0, 9.9
      (1L, 10.0, 20.0, 1L),  // 10.0 sits on the boundary -> bin 1
      (2L, 20.0, 30.0, 1L),
      (9L, 90.0, 100.0, 2L))) // 99 + clamped 150; null AND NaN excluded
    // non-numeric input errors loudly instead of casting every row to
    // null and returning an empty histogram
    val e = intercept[IllegalArgumentException] {
      graft.operators.Profiles.histogram(
        docs(1L -> "words").toDF(), "text", 0.0, 10.0, 2)
    }
    assert(e.getMessage.contains("numeric"))
  }

  test("psi: identical snapshots score 0 per bin; moved mass shows up " +
    "large; one-side-empty bins floor at eps; empty snapshot raises") {
    import graft.operators.Profiles
    val a = spark.range(100)
      .select((col("id") % 10).cast("double").as("v"))
    val same = Profiles.psi(a, a, "v", 0.0, 10.0, 5)
      .select("bin", "psi_term").as[(Long, Double)].collect().toMap
    assert(same.size == 5 && same.values.forall(_ == 0.0), s"$same")
    // all of b's mass collapses into bin 0
    val b = spark.range(100).select(lit(0.5).as("v"))
    val drift = Profiles.psi(a, b, "v", 0.0, 10.0, 5)
      .select("bin", "n_a", "n_b", "share_b", "psi_term")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(drift(0L)._3 == 100L && drift(0L)._4 == 1.0)
    // bins 1-4 are empty on the b side: share floors at eps, terms
    // positive and large
    (1L to 4L).foreach { bin =>
      assert(drift(bin)._3 == 0L && drift(bin)._4 == 1e-6, s"$drift")
      assert(drift(bin)._5 > 1.0, s"moved-mass term too small: $drift")
    }
    assert(drift.values.map(_._5).sum > 4.0, "headline PSI must be large")
    // an empty snapshot must raise by name, not read as maximal drift
    val err = intercept[Exception] {
      Profiles.psi(a, b.filter(lit(false)), "v", 0.0, 10.0, 5).collect()
    }
    assert(err.getMessage.contains("no rows"), s"got: ${err.getMessage}")
    // BOTH-empty must also raise — with only occupied bins joined there
    // would be zero rows to evaluate the guard on and the alarm would
    // read "perfectly stable" on no data; the fixed bin spine fixes it
    val err2 = intercept[Exception] {
      Profiles.psi(a.filter(lit(false)), b.filter(lit(false)), "v",
        0.0, 10.0, 5).collect()
    }
    assert(err2.getMessage.contains("no rows"), s"got: ${err2.getMessage}")
  }

  test("chiSquaredDrift: hand-computed 2×2 contributions; new and null " +
      "categories contribute instead of dividing by zero; empty side " +
      "raises") {
    import graft.operators.Profiles
    def snap(pairs: (String, Int)*) = pairs
      .flatMap { case (v, n) => Seq.fill(n)(v) }.toDF("lang")
    // ref {a:30, b:10} vs cur {a:10, b:10}: N=60, e.g. category a has
    // row total 40 → e_ref = 40·40/60 = 26.667, contrib =
    // 3.333²/26.667 + 3.333²/13.333 = 1.25
    val out = Profiles.chiSquaredDrift(
        snap("a" -> 30, "b" -> 10), snap("a" -> 10, "b" -> 10), "lang")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(("a", 30L, 10L, 26.666667, 13.333333, 1.25),
      ("b", 10L, 10L, 13.333333, 6.666667, 2.5)), out)
    // a category only the NEW snapshot has (and a null category) both
    // get positive expecteds from the two-sample form
    val withNew = Profiles.chiSquaredDrift(snap("a" -> 30),
        snap("a" -> 30).union(Seq("c").toDF("lang"))
          .union(Seq[String](null).toDF("lang")), "lang")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    val byCat = withNew.map(r => Option(r._1).getOrElse("∅") -> r).toMap
    assert(byCat.keySet == Set("a", "c", "∅"))
    assert(byCat("c")._2 == 0L && byCat("c")._3 == 1L &&
      byCat("c")._6 > 0.0)
    assert(byCat("∅")._2 == 0L && byCat("∅")._3 == 1L)
    // ordering: nulls first, then category asc
    assert(withNew.head._1 == null)
    val err = intercept[Exception] {
      Profiles.chiSquaredDrift(snap("a" -> 1).filter(lit(false)),
        snap("a" -> 1), "lang").collect()
    }
    assert(err.getMessage.contains("no rows"), err.getMessage)
  }

  test("keySkew surfaces heavy hitters with exact fractions") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k")
    val out = graft.operators.Profiles.keySkew(df, "k", k = 2)
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("hot", 6L, 0.6), ("warm", 3L, 0.3)))
  }

  // ---------- review-hardening behaviors ----------------------------------

  test("null text scores as an empty doc, never a null verdict") {
    val bench = docs(9L -> "a b c d e f g h")
    val corpus = Seq((1L, "a b c d e f g h"), (2L, null))
      .toDF("doc_id", "text")
    val out = Decontaminate.overlap(corpus, "doc_id", "text", bench, "text",
        shingleN = 5, flagAt = 0.5)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).getLong(1) == 0L && out(1).getDouble(3) == 0.0 &&
      !out(1).getBoolean(4))
    // and the gate KEEPS the null-text doc (it is not contaminated)
    val kept = Decontaminate.decontaminate(corpus, "doc_id", "text",
      bench, "text", shingleN = 5, flagAt = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L), s"doc 1 is the benchmark copy; got $kept")
  }

  test("keepBest refuses non-integral id columns instead of null-merging") {
    val sdocs = Seq(("doc-1", 10L)).toDF("doc_id", "q")
    val sclusters = Seq(("doc-1", "doc-1")).toDF("id", "comp")
    val e = intercept[IllegalArgumentException] {
      Dedup.keepBest(sdocs, "doc_id", "q", sclusters, "id", "comp")
    }
    assert(e.getMessage.contains("integer-valued"))
  }

  test("labelCentroids raises on ragged vector lengths, excludes empties") {
    val ragged = Seq((0, Seq(1.0f)), (0, Seq(3.0f, 5.0f)))
      .toDF("label", "embedding")
    val err = intercept[Exception] {
      graft.operators.Similarity
        .labelCentroids(ragged, "label", "embedding").collect()
    }
    assert(err.getMessage.contains("ragged"))
    val withEmpty = Seq((0, Seq(2.0f, 4.0f)), (0, Seq.empty[Float]))
      .toDF("label", "embedding")
    val ok = graft.operators.Similarity
      .labelCentroids(withEmpty, "label", "embedding")
      .as[(Int, Seq[Float], Long)].collect().toSeq
    assert(ok == Seq((0, Seq(2.0f, 4.0f), 1L))) // empty excluded
  }

  test("keepTopQuantile escapes backticked column names") {
    val df = spark.range(100).select(col("id"), col("id").as("sc`ore"))
    val kept = graft.operators.Pipelines
      .keepTopQuantile(df, "sc`ore", 0.75, exact = true)
    assert(kept.count() == 25L)
  }

  // ---------- degenerate inputs -------------------------------------------

  test("corpus ops degrade cleanly on an empty corpus") {
    val empty = docs().select(col("doc_id"), col("text"))
    val bench = docs(1L -> "a b c d e f g h")
    assert(Decontaminate.overlap(empty, "doc_id", "text",
      bench, "text").count() == 0L)
    assert(Vocab.vocabulary(empty, "doc_id", "text").count() == 0L)
    assert(Vocab.tfIdfTopTerms(empty, "doc_id", "text", 3).count() == 0L)
    assert(Vocab.unigramLogProb(empty, "doc_id", "text").count() == 0L)
    assert(Dedup.repeatedPassages(empty, "doc_id", "text").count() == 0L)
    assert(Sampling.bernoulli(empty, col("doc_id"), 5000).count() == 0L)
    // quantile gate: the cutoff aggregate is NULL on empty input; the
    // >= comparison is then never true — empty out, no crash
    assert(graft.operators.Pipelines
      .keepTopQuantile(empty.withColumn("s", lit(1)), "s", 0.5)
      .count() == 0L)
    // empty benchmark: nothing can be contaminated
    val corpus = docs(1L -> "a b c d e f g h")
    val out = Decontaminate.overlap(corpus, "doc_id", "text",
      empty, "text").orderBy("doc_id").collect()
    assert(out.length == 1 && out.head.getLong(2) == 0L &&
      !out.head.getBoolean(4))
  }

  // ---------- MinHash estimate --------------------------------------------

  test("minhashEstimate: identical signatures 1.0, bounded, symmetric") {
    val k = 8
    val sigs = Dedup.minhashSignatures(
      docs(1L -> "one two three four five six",
        2L -> "one two three four five six",
        3L -> "seven eight nine ten eleven twelve"),
      "doc_id", "text", k = k, shingleN = 3)
    val a = sigs.select(col("doc_id").as("ia") +:
      (0 until k).map(i => col(s"m$i").as(s"a$i")): _*)
    val b = sigs.select(col("doc_id").as("ib") +:
      (0 until k).map(i => col(s"m$i").as(s"b$i")): _*)
    val est = a.crossJoin(b).select(col("ia"), col("ib"),
      Dedup.minhashEstimate((0 until k).map(i => col(s"a$i")),
        (0 until k).map(i => col(s"b$i"))).as("e"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(est((1L, 2L)) == 1.0) // identical docs
    assert(est((1L, 1L)) == 1.0)
    est.values.foreach(e => assert(e >= 0.0 && e <= 1.0))
    assert(est((1L, 3L)) == est((3L, 1L)))
    assert(est((1L, 3L)) < 1.0) // disjoint shingle sets
  }

  // ---------- round-6 hardening (ADVICE r5) --------------------------------

  test("sampling: null key always excluded, null weight means 0 bp") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(10000L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(10000L)),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[java.lang.Long]))
      .toDF("id", "w")
    // bernoulli at 100%: the null-key row still has no draw → excluded
    assert(Sampling.bernoulli(df, col("id"), 10000)
      .select("id").as[java.lang.Long].collect().toSet == Set(1L, 3L))
    // weighted: null weight is explicitly 0 bp (row 3 dropped), null key
    // excluded regardless of weight (row 2 dropped)
    assert(Sampling.weighted(df, col("id"), col("w"))
      .select("id").as[java.lang.Long].collect().toSet == Set(1L))
    // stratified: null stratum falls to defaultBp, not to null-verdict
    val s = Seq((1L, "en"), (2L, null.asInstanceOf[String])).toDF("id", "lang")
    assert(Sampling.stratified(s, col("id"), col("lang"),
      Map("en" -> 0), defaultBp = 10000)
      .select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("dedupAgainst refuses a caller-owned __fp column") {
    val seen = docs(10L -> "x")
    val incoming = docs(1L -> "y").withColumn("__fp", lit("caller-data"))
    val e = intercept[IllegalArgumentException] {
      Dedup.dedupAgainst(incoming, "text", seen, "text")
    }
    assert(e.getMessage.contains("__fp"))
  }

  test("dedupAgainst: null-text incoming rows are always kept") {
    val seen = Seq((10L, null.asInstanceOf[String]), (11L, "known"))
      .toDF("doc_id", "text")
    val incoming = Seq((1L, null.asInstanceOf[String]), (2L, "known"),
      (3L, "fresh")).toDF("doc_id", "text")
    val out = Dedup.dedupAgainst(incoming, "text", seen, "text")
      .select("doc_id").as[Long].collect().toSet
    // null fp never equi-matches even against seen's own null fp
    assert(out == Set(1L, 3L))
  }

  test("decontaminate gate agrees with overlap() for null-id docs") {
    val bench = docs(900L -> "alpha beta gamma delta epsilon zeta")
    val corpus = Seq(
      (java.lang.Long.valueOf(1L), "alpha beta gamma delta epsilon zeta"),
      (null.asInstanceOf[java.lang.Long], "one two three four five six"))
      .toDF("doc_id", "text")
    // overlap scores the null-id doc clean; the null-safe semi-join must
    // therefore KEEP it (a plain equi-join would drop it unconditionally)
    val kept = Decontaminate.decontaminate(corpus, "doc_id", "text",
      bench, "text", shingleN = 5, flagAt = 0.5)
      .select("doc_id").as[java.lang.Long].collect().toSet
    assert(kept == Set(null.asInstanceOf[java.lang.Long]))
  }

  test("keySkew computes the corpus aggregation once (exchange reuse)") {
    val dir = tmpDir()
    (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq("cold"))
      .toDF("k").write.parquet(dir.resolve("t").toString)
    val df = spark.read.parquet(dir.resolve("t").toString)
    val out = graft.operators.Profiles.keySkew(df, "k", k = 2)
    val rows = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq(("hot", 6L, 0.6), ("warm", 3L, 0.3)))
    // AQE's toString appends the pre-execution "Initial Plan" (which
    // legitimately shows two scans); judge only what actually ran
    val p = out.queryExecution.executedPlan.toString
    val finalP = p.split("== Initial Plan ==").head
    assert(finalP.contains("ReusedExchange"),
      s"total must reuse the key-table exchange:\n$p")
    val scans = "Scan parquet".r.findAllIn(finalP).length
    assert(scans == 1, s"total must not rescan the corpus; " +
      s"got $scans scans:\n$p")
  }

  // ---------- perKeyCap ----------------------------------------------------

  test("perKeyCap keeps at most n per key, highest score first") {
    val df = Seq(
      ("a.com", 1L, 0.9), ("a.com", 2L, 0.5), ("a.com", 3L, 0.7),
      ("b.com", 4L, 0.1))
      .toDF("domain", "doc_id", "score")
    val kept = Sampling.perKeyCap(df, col("domain"), col("doc_id"), 2,
        col("score"))
      .select("doc_id").as[Long].collect().toSet
    // a.com keeps its two best (1: 0.9, 3: 0.7); b.com keeps its only doc
    assert(kept == Set(1L, 3L, 4L))
  }

  test("perKeyCap: null scores lose to scored rows; null keys are their " +
    "own capped group; survivors are partition-invariant") {
    val df = Seq(
      ("a.com", 1L, Some(0.1)), ("a.com", 2L, None),
      (null.asInstanceOf[String], 3L, Some(1.0)),
      (null.asInstanceOf[String], 4L, Some(0.5)))
      .toDF("domain", "doc_id", "score")
    val kept = Sampling.perKeyCap(df, col("domain"), col("doc_id"), 1,
        col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L)) // scored beats null-scored; nulls grouped
    val keptRepart = Sampling.perKeyCap(df.repartition(7), col("domain"),
        col("doc_id"), 1, col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(keptRepart == kept)
  }

  test("rankNormalize: percent_rank within key with id tiebreak; null " +
    "scores take the lowest percentiles; single-row key gets 0; " +
    "partition-invariant") {
    val df = Seq(
      ("s1", 1L, Some(10L)), ("s1", 2L, Some(30L)), ("s1", 3L, Some(20L)),
      ("s1", 4L, None),
      ("s2", 5L, Some(999L))).toDF("source", "doc_id", "n")
    val pct = Sampling.rankNormalize(df, col("source"), col("doc_id"),
        col("n"))
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    // s1 order: null(4) < 10(1) < 20(3) < 30(2) → pct 0, 1/3, 2/3, 1
    assert(pct(4L) == 0.0 && pct(1L) == 1.0 / 3 && pct(3L) == 2.0 / 3 &&
      pct(2L) == 1.0, s"s1 percentiles: $pct")
    assert(pct(5L) == 0.0, "a single-row key must get 0, not NaN")
    // ties broken by id: equal scores still rank deterministically
    val tied = Seq(("s", 1L, 5L), ("s", 2L, 5L), ("s", 3L, 5L))
      .toDF("source", "doc_id", "n")
    val tp = Sampling.rankNormalize(tied, col("source"), col("doc_id"),
        col("n"))
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    assert(tp == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0), s"tied: $tp")
    val rp = Sampling.rankNormalize(df.repartition(7), col("source"),
        col("doc_id"), col("n"))
      .select("doc_id", "pct").as[(Long, Double)].collect().toMap
    assert(rp == pct, "percentiles must not depend on partitioning")
    intercept[IllegalArgumentException] {
      Sampling.rankNormalize(df.withColumn("pct", lit(1)), col("source"),
        col("doc_id"), col("n"))
    }
  }

  test("perKeyQuantileGate keeps each key's top fraction by its OWN " +
    "score distribution (where a global cutoff would drop one source " +
    "entirely)") {
    // s_long's scores all dwarf s_short's — a global top-half cutoff
    // would keep s_long only; the per-key gate keeps the top half of
    // EACH
    val df = ((1L to 10L).map(i => ("s_short", i, i)) ++
      (11L to 20L).map(i => ("s_long", i, 1000 + i)))
      .toDF("source", "doc_id", "n")
    val kept = Sampling.perKeyQuantileGate(df, col("source"),
        col("doc_id"), col("n"), minPct = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == ((6L to 10L) ++ (16L to 20L)).toSet, s"kept: $kept")
    // the gate column is internal: output schema is the input's
    assert(Sampling.perKeyQuantileGate(df, col("source"), col("doc_id"),
      col("n"), 0.5).columns.toSeq == df.columns.toSeq)
    intercept[IllegalArgumentException] {
      Sampling.perKeyQuantileGate(df, col("source"), col("doc_id"),
        col("n"), 1.5)
    }
  }

  test("perKeyQuantileGate: null-scored rows never pass, and do not " +
    "skew the scored rows' percentiles") {
    // 8 of 10 rows unscored: ranking nulls would push the null tail to
    // percentile 7/9 >= 0.5 (unscored docs shipped as 'top quality')
    // AND leave the two scored rows at 8/9 and 9/9 (both kept). With
    // nulls excluded the scored pair ranks 0/1 and 1/1 — only the
    // better one passes.
    val df = ((1L to 8L).map(i => ("s", i, null: java.lang.Long)) ++
      Seq(("s", 9L, 5L: java.lang.Long), ("s", 10L, 7L: java.lang.Long)))
      .toDF("source", "doc_id", "score")
    val kept = Sampling.perKeyQuantileGate(df, col("source"),
        col("doc_id"), col("score"), minPct = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L), s"kept: $kept")
  }

  test("perKeyCap plans a WindowGroupLimit: map-side top-n before the " +
    "exchange, so a million-doc host ships ~n rows per task") {
    val dir = tmpDir()
    (1L to 100L).map(i => ("host" + (i % 3), i))
      .toDF("domain", "doc_id")
      .write.parquet(dir.resolve("t").toString)
    val df = spark.read.parquet(dir.resolve("t").toString)
    val out = Sampling.perKeyCap(df, col("domain"), col("doc_id"), 5, lit(0))
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank filter must push a partial group limit below the exchange:\n$p")
  }

  // ---------- mixture ------------------------------------------------------

  test("mixture unions sources at per-source rates with provenance tags") {
    val web = (1L to 2000L).map(i => (i, s"web doc $i")).toDF("doc_id", "text")
    val books = (1L to 100L).map(i => (i, s"book $i", s"title $i"))
      .toDF("doc_id", "text", "title")
    val out = Sampling.mixture(Seq(
      ("web", web, 2500), ("books", books, 10000)), "doc_id")
    assert(out.columns.toSeq == Seq("doc_id", "text", "source_tag", "title"))
    val byTag = out.groupBy("source_tag").count()
      .as[(String, Long)].collect().toMap
    assert(byTag("books") == 100L) // 10000 bp = keep all
    assert(byTag("web") > 350 && byTag("web") < 650) // ~25% of 2000
    // a web row has null title (unionByName fills missing columns)
    assert(out.filter($"source_tag" === "web" && $"title".isNotNull)
      .count() == 0L)
  }

  test("mixture draws are independent per source (same key, different salt)") {
    val a = (1L to 1000L).map(i => (i, "x")).toDF("doc_id", "text")
    val out = Sampling.mixture(Seq(("a", a, 5000), ("b", a, 5000)), "doc_id")
    val keptA = out.filter($"source_tag" === "a")
      .select("doc_id").as[Long].collect().toSet
    val keptB = out.filter($"source_tag" === "b")
      .select("doc_id").as[Long].collect().toSet
    // identical rates over the identical table: same-salt draws would make
    // the two kept-sets equal; per-source salts decorrelate them
    assert(keptA != keptB)
    assert(!Sampling.mixture(Seq(("a", a, 10000)), "doc_id").columns
      .contains("__dup"))
    intercept[IllegalArgumentException] {
      Sampling.mixture(Seq(("a", a, 100), ("a", a, 200)), "doc_id")
    }
    intercept[IllegalArgumentException] {
      Sampling.mixture(
        Seq(("a", a.withColumn("source_tag", lit("x")), 100)), "doc_id")
    }
  }

  test("mixtureByBudget calibrates keep rates to token targets") {
    // source A: 1000 docs x 100 tokens = 100k total; target 25k -> 2500bp
    val a = (1L to 1000L).map(i => (i, 100L)).toDF("doc_id", "n_tok")
    // source B: 100 docs x 50 tokens = 5k total; target 50k -> capped 10000bp
    val b = (1L to 100L).map(i => (i, 50L)).toDF("doc_id", "n_tok")
    val out = Sampling.mixtureByBudget(
      Seq(("a", a, 25000L), ("b", b, 50000L)), "doc_id", "n_tok")
    val byTag = out.groupBy("source_tag")
      .agg(sum("n_tok").as("toks"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(byTag("b") == ((5000L, 100L))) // over-budget source keeps all
    // a's realized tokens concentrate around the 25k target (~±4 sigma)
    assert(byTag("a")._1 > 18000L && byTag("a")._1 < 32000L,
      s"expected ~25k tokens from a, got ${byTag("a")}")
    // calibrated rate == the equivalent hand-computed mixture() rate:
    // same salt, same bp -> identical membership, not just similar
    val handRated = Sampling.mixture(Seq(("a", a, 2500)), "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val calibrated = out.filter($"source_tag" === "a")
      .select("doc_id").as[Long].collect().toSet
    assert(calibrated == handRated)
    // an all-null/zero-token source contributes nothing (null contract)
    val z = Seq((1L, null.asInstanceOf[java.lang.Long]))
      .toDF("doc_id", "n_tok")
    assert(Sampling.mixtureByBudget(Seq(("z", z, 100L)), "doc_id", "n_tok")
      .count() == 0L)
    // zero-token total likewise: without the explicit guard, IEEE
    // division by 0.0 gives Infinity, round keeps it, and the clamp
    // would turn an empty source into keep-ALL
    val zeros = (1L to 50L).map(i => (i, 0L)).toDF("doc_id", "n_tok")
    assert(Sampling.mixtureByBudget(Seq(("zz", zeros, 100L)),
      "doc_id", "n_tok").count() == 0L)
    // NaN total: NaN > 0 is TRUE under Spark's total ordering and
    // least(10000, NaN) = 10000, so without the isnan guard one NaN
    // token count would keep the whole source
    val nans = Seq((1L, 1.0), (2L, Double.NaN)).toDF("doc_id", "n_tok")
    assert(Sampling.mixtureByBudget(Seq(("nn", nans, 100L)),
      "doc_id", "n_tok").count() == 0L)
  }

  test("nearDupAgainst drops batch docs banding with the seen signature " +
    "index, keeps fresh and sub-shingle docs") {
    val seen = docs(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "one two three four five six seven eight")
    val seenSigs = Dedup.minhashSignatures(seen, "doc_id", "text", 8)
    val incoming = docs(
      10L -> "alpha beta gamma delta epsilon zeta eta theta", // exact copy
      11L -> "alpha beta gamma delta epsilon zeta eta", // last token gone
      12L -> "totally different fresh document here entirely", // fresh
      13L -> "tiny doc") // sub-shingle — no signature, always kept
    val kept = Dedup.nearDupAgainst(incoming, "doc_id", "text", seenSigs)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(10L), "exact copy must band-collide and drop")
    assert(!kept.contains(11L),
      "near-copy sharing most shingles must band-collide and drop")
    assert(kept.contains(12L) && kept.contains(13L),
      s"fresh + sub-shingle docs must survive, got $kept")
    // shape guard: a frame that is not a signature index is rejected
    intercept[IllegalArgumentException] {
      Dedup.nearDupAgainst(incoming, "doc_id", "text", seen)
    }
  }

  // ---------- Bloom-filter incremental dedup -------------------------------

  test("dedupAgainstBloom drops seen docs, keeps fresh and null-text docs") {
    val seen = docs(1L -> "alpha beta", 2L -> "gamma delta")
    val incoming = Seq(
      (10L, "alpha beta"), // seen — must drop
      (11L, "fresh document here"), // fresh — must keep (fpp tiny at n=2)
      (12L, null.asInstanceOf[String])) // null text — always kept
      .toDF("doc_id", "text")
    val bloom = Dedup.seenBloomFilter(seen, "text", expectedItems = 100)
    val kept = Dedup.dedupAgainstBloom(incoming, "text", bloom)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 12L))
  }

  test("dedupAgainstBloom agrees with the exact anti-join (no false " +
    "negatives by construction; no false positives at this fpp/n)") {
    val seen = docs((1L to 200L).map(i => i -> s"seen doc number $i"): _*)
    val incoming = docs(
      ((1L to 100L).map(i => (1000 + i) -> s"seen doc number $i") ++
       (1L to 100L).map(i => (2000 + i) -> s"fresh doc number $i")): _*)
    val bloom = Dedup.seenBloomFilter(seen, "text", expectedItems = 1000,
      fpp = 0.001)
    val bloomKept = Dedup.dedupAgainstBloom(incoming, "text", bloom)
      .select("doc_id").as[Long].collect().toSet
    val exactKept = Dedup.dedupAgainst(incoming, "text", seen, "text")
      .select("doc_id").as[Long].collect().toSet
    // every bloom survivor is an exact survivor (bloom never keeps a dup)
    assert(bloomKept.subsetOf(exactKept))
    // at fpp=0.1% over 100 fresh docs, zero collisions is the overwhelming
    // expectation; equality here means no false positives either
    assert(bloomKept == exactKept)
  }

  test("dedupAgainstBloom fpp sweep: drop-rate bounded by exact drops + " +
    "fpp·n at fpp ∈ {0.1, 0.01, 0.001}; never keeps a dup at any fpp") {
    val seen = docs((1L to 1000L).map(i => i -> s"seen doc number $i"): _*)
    val nFresh = 2000
    val incoming = docs(
      ((1L to 500L).map(i => (10000 + i) -> s"seen doc number $i") ++
       (1L to nFresh.toLong).map(i =>
         (20000 + i) -> s"fresh doc number $i")): _*)
    val total = 500 + nFresh
    val exactKept = Dedup.dedupAgainst(incoming, "text", seen, "text")
      .select("doc_id").as[Long].collect().toSet
    val exactDrops = total - exactKept.size
    for (fpp <- Seq(0.1, 0.01, 0.001)) {
      val bloom = Dedup.seenBloomFilter(seen, "text",
        expectedItems = 1000, fpp = fpp)
      val kept = Dedup.dedupAgainstBloom(incoming, "text", bloom)
        .select("doc_id").as[Long].collect().toSet
      // no false negatives by construction: a bloom survivor is always
      // an exact survivor
      assert(kept.subsetOf(exactKept), s"fpp=$fpp kept a known dup")
      val drops = total - kept.size
      // false positives only inflate drops, bounded in expectation by
      // fpp·nFresh — allow 2× plus a small absolute floor for the tail
      val bound = exactDrops + 2 * fpp * nFresh + 10
      assert(drops >= exactDrops && drops <= bound,
        s"fpp=$fpp drops=$drops outside [$exactDrops, $bound]")
    }
  }

  test("dedupAgainstBloom filters at the scan — no shuffle in the plan") {
    val dir = tmpDir()
    docs((1L to 50L).map(i => i -> s"doc $i"): _*)
      .write.parquet(dir.resolve("in").toString)
    val incoming = spark.read.parquet(dir.resolve("in").toString)
    val bloom = Dedup.seenBloomFilter(docs(1L -> "doc 1"), "text", 10)
    val out = Dedup.dedupAgainstBloom(incoming, "text", bloom)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bloom path must be a pure scan filter, no exchange:\n$p")
    assert(!p.contains("Join"), s"bloom path must not join:\n$p")
  }

  // ---------- normalize ----------------------------------------------------

  test("mojibake: detection counts markers; repair undoes latin-1 and " +
      "cp1252 misdecodes; mixed-script and clean text untouched; " +
      "double-encoding needs one pass per layer") {
    import graft.operators.TextAnalysis
    // "café" read as latin-1 → "cafÃ©"; "don’t" read as
    // cp1252 → "donâ€™t"
    val rows = Seq(
      "cafÃ©",
      "donâ€™t",
      "plain ascii",
      "résumé", // genuine accents, no markers
      "中文 cafÃ©", // mixed script: decline
      null).toDF("text")
    val out = TextAnalysis.withMojibake(rows, "text")
      .select("mojibake_hits", "text_fixed").collect()
    assert(out(0).getInt(0) == 1 && out(0).getString(1) == "café")
    assert(out(1).getInt(0) == 1 &&
      out(1).getString(1) == "don’t")
    assert(out(2).getInt(0) == 0 && out(2).getString(1) == "plain ascii")
    assert(out(3).getInt(0) == 0 &&
      out(3).getString(1) == "résumé")
    // markers present but CJK fails the latin-1 round trip → untouched
    assert(out(4).getInt(0) == 1 &&
      out(4).getString(1) == "中文 cafÃ©")
    assert(out(5).isNullAt(0) && out(5).isNullAt(1))
    // doubly-misdecoded "é": latin-1(latin-1(utf8 é)) is
    // C3 83 C2 A9 misread as Ã, U+0083, Â, © — one layer per pass
    val twice = Seq("caf\u00C3\u0083\u00C2\u00A9").toDF("text")
    val once = TextAnalysis.withMojibake(twice, "text")
      .select("text_fixed").collect().head.getString(0)
    assert(once == "cafÃ©", once)
    val again = TextAnalysis.withMojibake(Seq(once).toDF("text"), "text")
      .select("text_fixed").collect().head.getString(0)
    assert(again == "café", again)
  }

  test("fleschKincaid: hand-computed grade, fragment floors at one " +
      "sentence, null/empty/whitespace → null") {
    import graft.operators.TextAnalysis
    val d = Seq("The cat sat. It ran fast!", "word", null, "", "   ")
      .toDF("text")
    val out = d.select(TextAnalysis.fleschKincaid(col("text"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // 6 words, 2 sentences, 6 vowel groups:
    // 0.39·3 + 11.8·1 − 15.59 = −2.62
    assert(out(0).contains(-2.62), out.toSeq)
    // one word, no terminator: S floors at 1; "word" has 1 vowel group
    // 0.39·1 + 11.8·1 − 15.59 = −3.4
    assert(out(1).contains(-3.4), out.toSeq)
    assert(out(2).isEmpty && out(3).isEmpty && out(4).isEmpty)
  }

  test("mojibake property sweep: repair INVERTS real latin-1 and " +
      "cp1252 misdecodes of 200 seeded random latin-1 texts, and is " +
      "idempotent on the repaired result") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(4321)
    // pool has no continuation-CLASS chars (U+0080-00BF / cp1252
    // high), so clean text can't contain accidental marker pairs —
    // the corruption itself still exercises both the latin-1 and
    // cp1252 repair paths through the misdecoded continuation bytes
    val pool = ("abcdefghij KLMNOP.!?,0123456789" +
      "éèüöàçÑ").toCharArray
    def randText() = (1 to (5 + rnd.nextInt(40)))
      .map(_ => pool(rnd.nextInt(pool.length))).mkString
    val cases = (1 to 200).map { i =>
      val clean = randText() + "é" // ≥1 marker guaranteed
      val charset = if (i % 2 == 0) "ISO-8859-1" else "windows-1252"
      (clean, new String(clean.getBytes("UTF-8"), charset))
    }
    import spark.implicits._
    val out = cases.toDF("clean", "corrupt")
      .select(col("clean"), col("corrupt"),
        TextAnalysis.fixMojibake(col("corrupt")).as("fixed"))
      .collect()
    out.foreach { r =>
      assert(r.getString(2) == r.getString(0),
        s"repair failed: corrupt=<${r.getString(1)}> " +
          s"fixed=<${r.getString(2)}> want=<${r.getString(0)}>")
    }
    // idempotence: the repaired text is clean, a second pass no-ops
    val again = out.map(_.getString(2)).toSeq.toDF("t")
      .select(TextAnalysis.fixMojibake(col("t"))).collect()
      .map(_.getString(0)).toSeq
    assert(again == out.map(_.getString(2)).toSeq)
  }

  test("normalize: NFC composition, casefold, whitespace collapse") {
    import graft.operators.TextAnalysis
    val decomposed = "Café   Menu\n\tWelcome " // e + combining acute
    val composed = "café menu welcome" // precomposed é, canonical form
    val df = Seq((1L, decomposed), (2L, "CAFÉ MENU WELCOME"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextAnalysis.normalize($"text").as("norm"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == composed)
    assert(out(2L) == composed)
    assert(out(3L) == null)
    // casefold off: case preserved, NFC + whitespace still applied
    val keepCase = df.filter($"doc_id" === 1L)
      .select(TextAnalysis.normalize($"text", casefold = false))
      .as[String].head()
    assert(keepCase == "Café Menu Welcome")
  }

  test("normalize makes composition/case/layout variants dedup together") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "Café  du   Parc"), // decomposed, extra spaces
      (2L, "café du parc"), // composed, lowercase
      (3L, "something else")).toDF("doc_id", "text")
    val normed = df.withColumn("text", TextAnalysis.normalize($"text"))
    val out = Dedup.exact(normed, "doc_id", "text").collect()
    assert(out.length == 2) // 1 and 2 collapse; raw text would give 3
    val dupRow = out.find(_.getLong(2) == 2L).get
    assert(dupRow.getLong(1) == 1L) // min-id representative
  }

  // ---------- lexicon quality classifier -----------------------------------

  test("lexiconScore: native expression is bit-identical to the HOF twin " +
    "on unicode, misses, duplicates, empties, and null arrays") {
    import graft.operators.TextAnalysis
    val lex = Seq("fast" -> 1.2, "slow" -> -1.4, "é" -> 0.25)
    val df = Seq(
      Tuple1(Seq("fast", "slow", "miss")),
      Tuple1(Seq("é", "é", "fast")),
      Tuple1(Seq.empty[String]),
      Tuple1(Seq("miss", "miss")),
      Tuple1(null: Seq[String])).toDF("toks")
    val out = df.select(
      TextAnalysis.lexiconScore(col("toks"), lex).as("n"),
      TextAnalysis.lexiconScoreHof(col("toks"), lex).as("h"))
    assert(out.filter(not(col("n") <=> col("h"))).count() == 0,
      s"native and HOF lexicon scores diverge: ${out.collect().toSeq}")
    val scores = out.select("n").as[Option[Double]].collect().toSeq
    assert(scores.contains(Some(1.2 + -1.4)), s"fast+slow+miss: $scores")
    assert(scores.contains(Some(0.0)) && scores.contains(None))
  }

  test("withLexiconQuality: mean-pooled sigmoid orders docs by lexicon " +
    "sentiment; null text propagates; existing column is rejected") {
    import graft.operators.TextAnalysis
    val lex = Seq("good" -> 2.0, "bad" -> -2.0)
    val df = Seq(
      (1L, "good good good"), (2L, "bad bad bad"),
      (3L, "good bad neutral"), (4L, null: String)).toDF("doc_id", "text")
    val p = TextAnalysis.withLexiconQuality(df, "text", lex, bias = 0.0)
      .select("doc_id", "quality_p").as[(Long, Option[Double])]
      .collect().toMap
    assert(p(1L).get > 0.5 && p(2L).get < 0.5, s"sentiment order: $p")
    assert(p(1L).get > p(3L).get && p(3L).get > p(2L).get, s"order: $p")
    assert(p.values.flatten.forall(v => v > 0.0 && v < 1.0))
    assert(p(4L).isEmpty, "null text must stay null, not score 0.5")
    intercept[IllegalArgumentException] {
      TextAnalysis.withLexiconQuality(
        TextAnalysis.withLexiconQuality(df, "text", lex), "text", lex)
    }
  }

  // ---------- temperature mixture ------------------------------------------

  test("temperatureMixture: α=1 reduces to the uniform natural-proportion " +
    "rate; α=0.5 rebalances toward small sources; null source dropped") {
    val df = (0L until 1000L).map(i =>
      (i, if (i < 100) "small" else "big")).toDF("doc_id", "source")
    // α = 1: every source keeps at the same T/N rate — identical to one
    // global bernoulli at round(10000·200/1000) = 2000 bp
    val nat = Sampling.temperatureMixture(df, col("doc_id"), "source",
      targetDocs = 200, alpha = 1.0, salt = "t").select("doc_id")
      .as[Long].collect().toSet
    val uni = Sampling.bernoulli(df, col("doc_id"), bp = 2000, salt = "t")
      .select("doc_id").as[Long].collect().toSet
    assert(nat == uni, "α=1 must keep natural proportions")
    // α = 0.5: w=(10,30), Z=40 → small rate 200·10/(40·100) = 50%,
    // big 200·30/(40·900) = 16.7% — deterministic draws land near these
    val bySrc = Sampling.temperatureMixture(df, col("doc_id"), "source",
        targetDocs = 200, alpha = 0.5, salt = "t")
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("small") > 30 && bySrc("small") < 70, s"$bySrc")
    assert(bySrc("big") > 110 && bySrc("big") < 190, s"$bySrc")
    // flattening: small's kept share rises far above its natural 10%
    assert(bySrc("small").toDouble / (bySrc("small") + bySrc("big")) > 0.2)
    val withNull = df.union(
      Seq((5000L, null: String)).toDF("doc_id", "source"))
    assert(!Sampling.temperatureMixture(withNull, col("doc_id"), "source",
        100, 0.5, "t")
      .select("doc_id").as[Long].collect().contains(5000L))
    // null-source rows must be excluded from the RATE DERIVATION too —
    // counting them would deflate every real source's rate with weight
    // from rows that can never be kept
    val natWithNull = Sampling.temperatureMixture(withNull, col("doc_id"),
        "source", targetDocs = 200, alpha = 1.0, salt = "t")
      .select("doc_id").as[Long].collect().toSet
    assert(natWithNull == uni,
      "a null-source row must not shift any real source's keep rate")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, col("doc_id"), "source", 100, 1.5)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df.withColumn("__bp", lit(1)),
        col("doc_id"), "source", 100)
    }
  }

  test("temperatureMixture pow-path properties (α=0.3): keep fractions " +
    "monotone-decreasing in source size, total ≈ targetDocs, and α→1 " +
    "converges to natural proportions") {
    // the pow path carries ~1-ulp libm variance so it has no bit-exact
    // oracle (Sampling scaladoc); these properties pin its behavior
    // without demanding bit-exactness
    val sizes = Seq("a" -> 200, "b" -> 400, "c" -> 800, "d" -> 1600)
    val df = sizes.flatMap { case (s, n) =>
      (0 until n).map(i => (s"$s$i", s)) }.toDF("doc_id", "source")
    def fracs(alpha: Double): Map[String, Double] = {
      val kept = Sampling.temperatureMixture(df, col("doc_id"), "source",
          targetDocs = 600, alpha = alpha, salt = "prop")
        .groupBy("source").count().as[(String, Long)].collect().toMap
      sizes.map { case (s, n) =>
        s -> kept.getOrElse(s, 0L).toDouble / n }.toMap
    }
    val f3 = fracs(0.3)
    // n^(α-1) is strictly decreasing in n for α<1: a bigger source must
    // keep a strictly smaller fraction (analytic rates at α=0.3:
    // 0.53 / 0.33 / 0.20 / 0.12 — gaps far above sampling noise)
    assert(f3("a") > f3("b") && f3("b") > f3("c") && f3("c") > f3("d"),
      s"keep fractions not monotone in source size: $f3")
    // Σ rate_s·n_s = targetDocs by construction; the deterministic
    // hash draw lands within sampling noise of it
    val total = sizes.map { case (s, n) => f3(s) * n }.sum
    assert(total > 510 && total < 690,
      s"kept total $total strays from targetDocs=600")
    // α→1 (still through pow): every source's rate approaches the
    // natural T/N = 20%
    val f99 = fracs(0.99)
    assert(f99.values.forall(v => math.abs(v - 0.2) < 0.05),
      s"α=0.99 should be near-natural: $f99")
    // flattening strength is monotone in α for the smallest source
    val f7 = fracs(0.7)
    assert(f3("a") > f7("a") && f7("a") > f99("a"),
      s"flattening not monotone in α: ${f3("a")} ${f7("a")} ${f99("a")}")
  }

  // ---------- DSIR importance resampling -----------------------------------

  test("dsir: target≡raw gives zero weights everywhere; n_feats counts " +
    "unigrams + bigrams; empty/null docs are absent") {
    import graft.operators.Dsir
    val df = docs(
      1L -> "the cat sat on the mat",
      2L -> "a dog ran through a field",
      3L -> "",
      5L -> "single")
      .union(Seq((4L, null: String)).toDF("doc_id", "text"))
    // both models fitted on the same corpus → identical smoothed
    // probabilities per bucket → llr is exactly 0.0 (same doubles)
    val w = Dsir.importanceWeights(df, "doc_id", "text", df, "text",
        numBuckets = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getDouble(2)))).toMap
    assert(w.keySet == Set(1L, 2L, 5L),
      s"empty and null docs must be absent: ${w.keySet}")
    // 6 tokens + 5 bigrams = 11; 1 token + 0 bigrams = 1
    assert(w(1L)._1 == 11L, s"doc 1 n_feats: ${w(1L)}")
    assert(w(5L)._1 == 1L, s"doc 5 n_feats: ${w(5L)}")
    assert(w.values.forall(_._2 == 0.0),
      s"target≡raw must weight every doc 0.0: $w")
  }

  test("dsir: target-like docs outrank off-target docs; weights are " +
    "repartition-invariant; dsirSample picks the target-like set") {
    import graft.operators.Dsir
    val target = docs(
      101L -> "the cat sat on the mat with the cat",
      102L -> "a cat and the mat and a cat sat")
    val raw = docs(
      1L -> "the cat sat on a mat",   // target vocabulary
      2L -> "cat on the mat sat down", // target vocabulary
      3L -> "zq7 xv9 qqj 42 17 zz9",  // disjoint gibberish
      4L -> "xv9 zq7 17 qqj zz9 42")  // disjoint gibberish
    val w = Dsir.importanceWeights(raw, "doc_id", "text", target, "text",
        numBuckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(Set(1L, 2L).forall(t => Set(3L, 4L).forall(g => w(t) > w(g))),
      s"target-vocabulary docs must outrank gibberish: $w")
    val re = Dsir.importanceWeights(raw.repartition(7), "doc_id", "text",
        target.repartition(3), "text", numBuckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(re == w, s"weights must be partitioning-invariant: $re vs $w")
    val picked = Dsir.dsirSample(raw, "doc_id", "text", target, "text",
        n = 2, numBuckets = 256)
      .collect().map(_.getLong(0)).toSet
    assert(picked == Set(1L, 2L), s"top-2 must be the target-like docs")
    intercept[IllegalArgumentException] {
      Dsir.dsirSample(raw, "doc_id", "text", target, "text", n = 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(raw, "doc_id", "text", target, "text",
        numBuckets = 0)
    }
  }

  test("dsir: gumbel selection is deterministic across runs and returns " +
    "n rows; the model table is exactly numBuckets rows") {
    import graft.operators.Dsir
    val target = docs(101L -> "the cat sat on the mat")
    val raw = docs((1L to 20L).map(i =>
      i -> (if (i % 2 == 0) s"the cat sat $i" else s"zz$i qq$i vv$i")): _*)
    val g1 = Dsir.dsirSample(raw, "doc_id", "text", target, "text",
      n = 5, numBuckets = 128, gumbel = true).collect().map(_.getLong(0))
    val g2 = Dsir.dsirSample(raw, "doc_id", "text", target, "text",
      n = 5, numBuckets = 128, gumbel = true).collect().map(_.getLong(0))
    assert(g1.toSeq == g2.toSeq, "gumbel draw must be deterministic")
    assert(g1.length == 5)
    val model = Dsir.importanceModel(raw, "text", target, "text",
      numBuckets = 128)
    assert(model.count() == 128L,
      "model must cover the full bucket spine (unseen buckets keep " +
        "their smoothed prior)")
    assert(model.filter(col("llr").isNull).count() == 0L)
  }

  // ---------- embedding compression (int8 + random projection) ------------

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("id", "vec")

  test("int8 quantization: codes bounded, constant dims at the zero " +
    "level, reconstruction within half a cell per dimension") {
    import graft.operators.Quantize
    val df = vecs(1L -> Seq(0.0f, 10f, -5f), 2L -> Seq(1.0f, 20f, -5f),
      3L -> Seq(0.25f, 15f, -5f))
    val stats = Quantize.int8Stats(df, "vec")
    val codes = Quantize.int8Encode(df, "id", "vec", stats)
    val cs = codes.select("id", "codes").as[(Long, Seq[Int])]
      .collect().toMap
    assert(cs.values.forall(_.forall(c => c >= -128 && c <= 127)))
    assert(cs.values.forall(_(2) == -128),
      s"constant dim must sit at the zero level (code -128): $cs")
    assert(cs(2L)(0) == 127 && cs(1L)(0) == -128,
      s"range endpoints must hit the edge levels: $cs")
    val err = Quantize.int8Decode(codes, "id", "codes", stats)
      .join(df, "id")
      .select(zip_with(col("vec").cast("array<double>"), col("recon"),
        (v, r) => abs(v - r)).as("e"))
      .select(explode(col("e")).as("e")).agg(max("e")).as[Double].head()
    // widest dim spans 10.0 → half a cell is 10/512
    assert(err <= 10.0 / 512 + 1e-12, s"reconstruction error $err")
  }

  test("int8Encode: sample-trained stats clamp out-of-range values to " +
    "edge levels; longer vectors than the stats fail loudly") {
    import graft.operators.Quantize
    val train = vecs(1L -> Seq(0.0f, 0.0f), 2L -> Seq(1.0f, 1.0f))
    val stats = Quantize.int8Stats(train, "vec")
    val out = Quantize.int8Encode(
      vecs(9L -> Seq(-5.0f, 7.0f)), "id", "vec", stats)
      .select("codes").as[Seq[Int]].head()
    assert(out == Seq(-128, 127), s"clamped codes: $out")
    val e = intercept[Exception] {
      Quantize.int8Encode(vecs(9L -> Seq(0.5f, 0.5f, 0.5f)), "id", "vec",
        stats).collect()
    }
    assert(e.getMessage.contains("exceeds the stats arrays"),
      s"expected the ragged-vector guard, got: ${e.getMessage}")
  }

  test("int8 guards: null vector elements fail loudly on encode; codes " +
    "longer than the stats fail loudly on decode; null vectors pass") {
    import graft.operators.Quantize
    val train = vecs(1L -> Seq(0.0f, 0.0f), 2L -> Seq(1.0f, 1.0f))
    val stats = Quantize.int8Stats(train, "vec")
    // least/greatest skip nulls, so without the guard a null element
    // would silently clamp to the TOP level (code 127)
    val withNullElem = Seq((9L, Seq[java.lang.Float](0.5f, null)))
      .toDF("id", "vec")
    val e1 = intercept[Exception] {
      Quantize.int8Encode(withNullElem, "id", "vec", stats).collect()
    }
    assert(e1.getMessage.contains("null element at dimension 2"),
      s"expected the null-element guard, got: ${e1.getMessage}")
    // whole-null vectors null-propagate instead
    val nullVec = Seq((9L, null: Seq[java.lang.Float])).toDF("id", "vec")
    assert(Quantize.int8Encode(nullVec, "id", "vec", stats)
      .filter(col("codes").isNull).count() == 1L)
    val longCodes = Seq((9L, Seq(0, 0, 0))).toDF("id", "codes")
    val e2 = intercept[Exception] {
      Quantize.int8Decode(longCodes, "id", "codes", stats).collect()
    }
    assert(e2.getMessage.contains("exceeds the stats arrays"),
      s"expected the decode ragged guard, got: ${e2.getMessage}")
  }

  test("int8Stats: an all-null dimension raises by name (its stats would " +
    "be null and the encoder would blame the wrong thing)") {
    import graft.operators.Quantize
    val allNull = Seq(
      (1L, Seq[java.lang.Float](0.5f, null)),
      (2L, Seq[java.lang.Float](1.0f, null))).toDF("id", "vec")
    val e = intercept[Exception] {
      Quantize.int8Stats(allNull, "vec").collect()
    }
    assert(e.getMessage.contains("no non-null values"),
      s"expected the all-null-dimension guard, got: ${e.getMessage}")
    // a dimension with SOME nulls still derives stats from the rest
    val mixed = Seq(
      (1L, Seq[java.lang.Float](0.0f, null)),
      (2L, Seq[java.lang.Float](1.0f, 2.0f))).toDF("id", "vec")
    val (los, his) = Quantize.int8Stats(mixed, "vec")
      .as[(Seq[Double], Seq[Double])].head()
    assert(los == Seq(0.0, 2.0) && his == Seq(1.0, 2.0),
      s"mixed-null stats: $los / $his")
  }

  test("int8TopK query-side contract: null vectors, null elements, and " +
    "length drift raise instead of silently sinking to rank-bottom") {
    import graft.operators.Quantize
    val df = vecs(1L -> Seq(0.0f, 1.0f), 2L -> Seq(1.0f, 0.0f),
      3L -> Seq(0.5f, 0.5f))
    val stats = Quantize.int8Stats(df, "vec")
    val codes = Quantize.int8Encode(df, "id", "vec", stats)
    def expectRaise(q: org.apache.spark.sql.DataFrame, frag: String):
        Unit = {
      val e = intercept[Exception] {
        Quantize.int8TopK(q, "id", "vec", codes, "id", stats, k = 2)
          .collect()
      }
      assert(e.getMessage.contains(frag), s"got: ${e.getMessage}")
    }
    expectRaise(Seq((9L, null: Seq[java.lang.Float])).toDF("id", "vec"),
      "null query vector")
    expectRaise(Seq((9L, Seq[java.lang.Float](0.5f, null)))
      .toDF("id", "vec"), "null element in a query")
    expectRaise(vecs(9L -> Seq(0.5f, 0.5f, 0.5f)),
      "disagree on vector dimensionality")
    // a clean query still serves the full k
    assert(Quantize.int8TopK(vecs(9L -> Seq(1.0f, 0.0f)), "id", "vec",
      codes, "id", stats, k = 2).count() == 2)
  }

  test("int8TopK: compressed-corpus search recovers the exact float " +
    "ranking on well-separated vectors; k guard") {
    import graft.operators.{Quantize, Similarity}
    // 20 deterministic 8-dim vectors spread on distinct directions
    val df = vecs((0 until 20).map { i =>
      i.toLong -> (0 until 8).map(d =>
        (math.sin(i * 1.7 + d) + 0.1 * d).toFloat).toSeq
    }: _*)
    val stats = Quantize.int8Stats(df, "vec")
    val codes = Quantize.int8Encode(df, "id", "vec", stats)
    val queries = df.filter(col("id") < 3)
    val approx = Quantize.int8TopK(queries, "id", "vec", codes, "id",
      stats, k = 5)
    val exact = Similarity.cosineTopK(queries, df, "id", "vec", k = 5)
    val minRecall = Similarity.recallAtK(approx, exact, 5)
      .agg(min("recall")).as[Double].head()
    assert(minRecall >= 0.8, s"int8 recall collapsed: $minRecall")
    // self-pairs excluded, ranks dense from 1
    val ranks = approx.groupBy("query_id")
      .agg(collect_list("rank").as("r")).select("r").as[Seq[Long]]
      .collect()
    assert(ranks.forall(_.sorted == (1L to 5L)), s"ranks: ${ranks.toSeq}")
    assert(approx.filter(col("query_id") === col("corpus_id")).count() == 0)
    intercept[IllegalArgumentException] {
      Quantize.int8TopK(queries, "id", "vec", codes, "id", stats, k = 0)
    }
  }

  test("int8TopKReranked: with a covering shortlist the exact re-rank " +
    "recovers the float top-k exactly; shortlist guard") {
    import graft.operators.{Quantize, Similarity}
    val df = vecs((0 until 20).map { i =>
      i.toLong -> (0 until 8).map(d =>
        (math.sin(i * 1.7 + d) + 0.1 * d).toFloat).toSeq
    }: _*)
    val stats = Quantize.int8Stats(df, "vec")
    val codes = Quantize.int8Encode(df, "id", "vec", stats)
    val queries = df.filter(col("id") < 3)
    // shortlist = full corpus ⇒ the re-rank IS the exact ranking
    val rr = Quantize.int8TopKReranked(queries, "id", "vec", codes, "id",
        stats, corpus = df, k = 5, shortlist = 19)
      .select("query_id", "corpus_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    val exact = Similarity.cosineTopK(queries, df, "id", "vec", k = 5)
      .select("query_id", "corpus_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(rr == exact,
      s"covering re-rank must equal the exact path: ${rr diff exact}")
    intercept[IllegalArgumentException] {
      Quantize.int8TopKReranked(queries, "id", "vec", codes, "id", stats,
        df, k = 5, shortlist = 3)
    }
  }

  test("randomProject: in-order double dots of the seeded plane family; " +
    "plane-shape guards") {
    import graft.operators.{Quantize, Similarity}
    val planes = Similarity.planeVectors(4, 3)
    val proj = Quantize.randomProject(vecs(1L -> Seq(1.0f, 0.5f, 2.0f)),
      "vec", planes).select("proj").as[Seq[Double]].head()
    val expect = planes.toSeq.map(p =>
      0.0 + 1.0 * p(0) + 0.5 * p(1) + 2.0 * p(2))
    assert(proj == expect, s"$proj vs $expect")
    intercept[IllegalArgumentException] {
      Quantize.randomProject(vecs(), "vec", Array.empty[Array[Double]])
    }
    intercept[IllegalArgumentException] {
      Quantize.randomProject(vecs(), "vec",
        Array(Array(1.0), Array(1.0, 2.0)))
    }
  }

  test("corpusDiff: added/removed/changed/unchanged by normalized " +
      "fingerprint; reflow is unchanged; nulls null-safe") {
    val old = Seq((1L, "alpha beta"), (2L, "keep me"), (3L, "to edit"),
      (4L, null.asInstanceOf[String]), (5L, "also null soon"))
      .toDF("doc_id", "text")
    val neu = Seq((2L, "  keep   ME "), (3L, "was edited"),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]),
      (9L, "brand new")).toDF("doc_id", "text")
    val got = Dedup.corpusDiff(old, neu, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "removed",      // only in old
      2L -> "unchanged",    // whitespace/case reflow — same fingerprint
      3L -> "changed",
      4L -> "unchanged",    // null <=> null
      5L -> "changed",      // text -> null
      9L -> "added"))
  }

  test("corpusDiff plan: text reduces to fingerprints at the scan — " +
      "no text column crosses the join") {
    val old = Seq((1L, "a")).toDF("doc_id", "text")
    val neu = Seq((1L, "b")).toDF("doc_id", "text")
    val p = Dedup.corpusDiff(old, neu, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val joinLine = p.linesIterator.find(_.contains("Join")).getOrElse("")
    assert(!joinLine.contains("text#"),
      s"raw text reached the join:\n$p")
  }

  test("repeatBySource: exact epoch fan-out, rate 0 drops, default " +
      "applies, guards raise") {
    val df = Seq((1L, "src0"), (2L, "src1"), (3L, "src2"), (4L, "srcX"))
      .toDF("doc_id", "source")
    val out = Sampling.repeatBySource(df, "source",
        Map("src0" -> 3, "src1" -> 2, "src2" -> 0))
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(out == Set((1L, 0), (1L, 1), (1L, 2), (2L, 0), (2L, 1),
      (4L, 0)))
    // defaultRepeat 0: only listed sources survive
    val only = Sampling.repeatBySource(df, "source", Map("src1" -> 1),
        defaultRepeat = 0)
      .collect().map(_.getLong(0)).toSeq
    assert(only == Seq(2L))
    intercept[IllegalArgumentException](
      Sampling.repeatBySource(df, "source", Map("s" -> -1)))
    intercept[IllegalArgumentException](
      Sampling.repeatBySource(df, "source", Map.empty,
        defaultRepeat = -2))
    // pure projection: no exchange, no join
    val p = Sampling.repeatBySource(df, "source", Map("src0" -> 2))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"repeat must stay a projection:\n$p")
  }

  test("klDivergence: zero against itself, positive for a shifted " +
      "corpus, deterministic under repartitioning") {
    import graft.operators.Dsir
    val a = Seq.tabulate(30)(i => (i.toLong, s"alpha beta gamma w$i"))
      .toDF("doc_id", "text")
    val b = Seq.tabulate(30)(i => (i.toLong, s"delta epsilon zeta w$i"))
      .toDF("doc_id", "text")
    val self = Dsir.klDivergence(a, "text", a, "text", numBuckets = 64)
      .head().getDouble(0)
    assert(self == 0.0, s"KL(p||p) must be 0, got $self")
    val cross = Dsir.klDivergence(a, "text", b, "text", numBuckets = 64)
      .head().getDouble(0)
    assert(cross > 0.1, s"shifted corpus should diverge, got $cross")
    val re = Dsir.klDivergence(a.repartition(7), "text",
      b.repartition(3), "text", numBuckets = 64).head().getDouble(0)
    assert(re == cross, "KL drifted with partitioning")
  }

  test("contaminationReport: per-group docs/flagged/fraction/mean " +
      "with zero-shingle docs counted clean") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j", "wiki"),   // shares the bench 5-grams
      (2L, "totally different words here now", "wiki"),
      (3L, "short", "web"),                  // < shingleN tokens → clean
      (4L, "other web page content words", "web"))
      .toDF("doc_id", "text", "source")
    val bench = Seq(Tuple1("a b c d e f g h i j")).toDF("text")
    val got = Decontaminate.contaminationReport(corpus, "doc_id",
        "text", "source", bench, "text", shingleN = 5, flagAt = 0.5)
      .orderBy("group").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("web", "wiki"))
    val wiki = got(1)
    assert(wiki.getLong(1) == 2 && wiki.getLong(2) == 1 &&
      wiki.getDouble(3) == 0.5,
      s"wiki row wrong: $wiki")
    val web = got(0)
    assert(web.getLong(1) == 2 && web.getLong(2) == 0 &&
      web.getDouble(3) == 0.0 && web.getDouble(4) == 0.0,
      s"web row wrong: $web")
  }

  test("materializeRecipe: sharded, per-file capped, sorted by the " +
      "deterministic shuffle key, epochs scattered, bytes reproducible") {
    val df = (0L until 60L).map(i =>
      (i, if (i % 2 == 0) "big" else "rare", s"doc $i")).toDF(
      "doc_id", "source", "text")
    val dir = s"${tmpDir()}/recipe"
    Pipelines.materializeRecipe(df, "doc_id", "source",
      Map("rare" -> 3), dir, shards = 4, maxRecordsPerFile = 30)
    val out = spark.read.parquet(dir)
    // 30 big ×1 + 30 rare ×3 = 120 rows; every (id, epoch) distinct
    assert(out.count() == 120)
    assert(out.select("doc_id", "epoch").distinct().count() == 120)
    // per-file cap holds and files are internally sorted by the key
    val files = out.select(input_file_name().as("f"), col("shuffle_key"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)))
    assert(files.values.forall(_.length <= 30), "maxRecordsPerFile violated")
    assert(files.values.forall(v => v.toSeq == v.toSeq.sorted),
      "file not sorted by shuffle_key")
    // a doc's epochs scatter: some repeated doc has copies in 2+ files
    val byDoc = out.filter(col("source") === "rare")
      .select(col("doc_id"), input_file_name().as("f"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet)
    assert(byDoc.values.exists(_.size > 1),
      "every doc's epochs landed in one file — copies not scattered")
    // reproducible: a second materialization yields the same rows per key
    val dir2 = s"${tmpDir()}/recipe2"
    Pipelines.materializeRecipe(df, "doc_id", "source",
      Map("rare" -> 3), dir2, shards = 4, maxRecordsPerFile = 30)
    val a = out.select("shuffle_key", "doc_id", "epoch")
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    val b = spark.read.parquet(dir2).select("shuffle_key", "doc_id", "epoch")
      .collect().map(_.toSeq).sortBy(_.mkString).toSeq
    assert(a == b, "recipe materialization not reproducible")
  }

  test("poissonBootstrapCI: weights are Poisson(1)-shaped and " +
      "deterministic, CI brackets the estimate and tightens with data, " +
      "constant data collapses the interval, guards") {
    import spark.implicits._
    import graft.operators.Sampling
    // constant column: every replicate mean is exactly the constant
    val const = (1L to 500L).map(i => (i, 42.25)).toDF("id", "v")
    val rc = Sampling.poissonBootstrapCI(const, "v", "id").collect().head
    assert(rc.getAs[Long]("n") == 500L)
    assert(rc.getAs[Double]("est_mean") == 42.25)
    assert(rc.getAs[Double]("ci_lo") == 42.25 &&
      rc.getAs[Double]("ci_hi") == 42.25, rc)
    // varied data: CI brackets the mean strictly; determinism across runs
    val varied = (1L to 2000L).map(i => (i, (i % 97).toDouble))
      .toDF("id", "v")
    val r1 = Sampling.poissonBootstrapCI(varied, "v", "id").collect().head
    val r2 = Sampling.poissonBootstrapCI(varied, "v", "id").collect().head
    assert(r1 == r2, "bootstrap must be deterministic")
    assert(r1.getAs[Double]("ci_lo") < r1.getAs[Double]("est_mean") &&
      r1.getAs[Double]("est_mean") < r1.getAs[Double]("ci_hi"), r1)
    // more data -> tighter interval (same distribution, 4x rows)
    val big = (1L to 8000L).map(i => (i, (i % 97).toDouble))
      .toDF("id", "v")
    val rb = Sampling.poissonBootstrapCI(big, "v", "id").collect().head
    assert(rb.getAs[Double]("ci_hi") - rb.getAs[Double]("ci_lo") <
      r1.getAs[Double]("ci_hi") - r1.getAs[Double]("ci_lo"), s"$r1 / $rb")
    // null values carry no mass
    val withNull = varied.union(Seq((9999L,
      null.asInstanceOf[java.lang.Double])).map(t => (t._1,
        Option.empty[Double])).toDF("id", "v"))
    assert(Sampling.poissonBootstrapCI(withNull, "v", "id")
      .collect().head.getAs[Long]("n") == 2000L)
    assert(intercept[IllegalArgumentException] {
      Sampling.poissonBootstrapCI(varied, "v", "id", replicates = 2)
    }.getMessage.contains("replicates"))
    assert(intercept[IllegalArgumentException] {
      Sampling.poissonBootstrapCI(varied, "v", "id", alpha = 0.0)
    }.getMessage.contains("alpha"))
    // the Poisson thresholds are the textbook cumulative e^-1/k! sums
    assert(math.abs(Sampling.PoissonCum.head - math.exp(-1.0)) == 0.0)
    assert(Sampling.PoissonCum.size == 8 &&
      Sampling.PoissonCum.last > 0.99998)
  }

  test("proportionBounds: hand-checked Wilson interval, small perfect " +
      "group ranks BELOW a large near-perfect one, null cond = failure") {
    import spark.implicits._
    import graft.operators.Profiles
    // srcA: 980/1000 pass; srcB: 3/3 pass — raw rate ranks B first,
    // the Wilson lower bound ranks A first (the whole point)
    val rows = (1 to 1000).map(i => ("A", i > 20)) ++
      (1 to 3).map(_ => ("B", true))
    val d = rows.toDF("src", "ok")
    val got = Profiles.proportionBounds(d, "src", col("ok"))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq("A", "B"), got)
    val a = got.head
    assert(a._2 == 1000 && a._3 == 980 && a._4 == 0.98)
    // Wilson at z=1.96, n=1000, p=0.98 (independently computed):
    // center 0.976253, half ~0.008944-0.009 band
    assert(math.abs(a._5 - 0.96931) < 1e-5 &&
      math.abs(a._6 - 0.987016) < 1e-5, a)
    val b = got(1)
    assert(b._4 == 1.0 && b._5 < 0.45, s"3/3 must have a weak bound: $b")
    // null cond counts as failure
    val withNull = (Seq(("C", Some(true)), ("C", None))).toDF("src", "ok")
    val c = Profiles.proportionBounds(withNull, "src", col("ok"))
      .collect().head
    assert(c.getAs[Long]("k") == 1L && c.getAs[Long]("n") == 2L)
    assert(intercept[IllegalArgumentException] {
      Profiles.proportionBounds(d, "src", col("ok"), z = 0.0)
    }.getMessage.contains("z"))
  }

  test("mixtureReweight: hard domains gain weight, easy keep-or-lose, " +
      "weights renormalize to 1, smoothing floors every domain, " +
      "zero-excess mixture is a fixed point up to quantization, guards") {
    import spark.implicits._
    import graft.operators.Sampling
    val mix = Seq(("a", 0.25, 3.0, 2.0), ("b", 0.25, 2.0, 2.0),
      ("c", 0.25, 1.0, 2.0), ("d", 0.25, 2.0, 2.0))
      .toDF("dom", "w", "loss", "ref")
    val byDom = Sampling.mixtureReweight(mix, "dom", "w", "loss", "ref",
        eta = 1.0, smoothing = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // only 'a' has excess (1.0): its weight grows by e/(e+3) vs 1/4
    assert(byDom("a") > 0.4 && byDom("a") < 0.5, byDom)
    assert(byDom("b") == byDom("c") && byDom("c") == byDom("d"))
    assert(math.abs(byDom.values.sum - 1.0) < 1e-5, byDom)
    // smoothing floors: s=0.2 guarantees >= 0.05 per domain
    val sm = Sampling.mixtureReweight(mix, "dom", "w", "loss", "ref",
        eta = 1.0, smoothing = 0.2)
      .collect().map(_.getDouble(2))
    assert(sm.forall(_ >= 0.05 - 1e-9), sm.toSeq)
    // all-zero excess: weights unchanged (up to the 1e-6 quantization)
    val fp = Sampling.mixtureReweight(
        mix.withColumn("loss", col("ref")), "dom", "w", "loss", "ref",
        eta = 1.0, smoothing = 0.0)
      .collect().map(_.getDouble(2))
    assert(fp.forall(w => math.abs(w - 0.25) < 1e-5), fp.toSeq)
    assert(intercept[IllegalArgumentException] {
      Sampling.mixtureReweight(mix, "dom", "w", "loss", "ref", 0.0)
    }.getMessage.contains("eta"))
    assert(intercept[IllegalArgumentException] {
      Sampling.mixtureReweight(mix, "dom", "w", "loss", "ref", 1.0, 1.0)
    }.getMessage.contains("smoothing"))
  }

  test("prioritySample: exactly k rows, repartition-invariant, census " +
      "below k, exclusions, and a sane total-weight estimate") {
    import spark.implicits._
    val pop = (1 to 200).map(i => (i.toLong, 1.0 + (i % 10)))
      .toDF("id", "w")
    val s1 = Sampling.prioritySample(pop, "id", "w", k = 20)
    val rows = s1.collect()
    assert(rows.length == 20)
    // deterministic under repartitioning (TakeOrdered is global)
    val s2 = Sampling.prioritySample(pop.repartition(13), "id", "w", 20)
      .collect()
    assert(rows.map(_.toString).toSeq == s2.map(_.toString).toSeq)
    // est_weight >= weight always (max(w, τ)) and the Duffield
    // estimator's total should land near the true total
    assert(rows.forall(r =>
      r.getAs[Double]("est_weight") >= r.getAs[Double]("weight")))
    val est = rows.map(_.getAs[Double]("est_weight")).sum
    val truth = (1 to 200).map(i => 1.0 + (i % 10)).sum
    assert(est > truth * 0.3 && est < truth * 3.0, s"est $est vs $truth")
    // census: population of 5 with k = 20 → all rows, est = w exactly
    val tiny = Seq((1L, 2.0), (2L, 3.0), (3L, 4.0), (4L, 5.0),
      (5L, 6.0)).toDF("id", "w")
    val c = Sampling.prioritySample(tiny, "id", "w", k = 20).collect()
    assert(c.length == 5 && c.forall(r =>
      r.getAs[Double]("est_weight") == r.getAs[Double]("weight")))
    // zero/negative/null weights and null ids carry no inclusion mass
    val mixed = Seq((1L, Some(5.0)), (2L, Some(0.0)), (3L, Some(-1.0)),
      (4L, None)).toDF("id", "w")
    val m = Sampling.prioritySample(mixed, "id", "w", k = 10).collect()
    assert(m.map(_.getLong(0)).toSeq == Seq(1L))
    assert(intercept[IllegalArgumentException] {
      Sampling.prioritySample(tiny, "id", "w", k = 0)
    }.getMessage.contains("k"))
  }

  test("memorizationScan: hand-checked rates and run lengths, full " +
      "copy scores 1.0, short candidates report a null rate") {
    import spark.implicits._
    val corpus = Seq((100L, "a b c d e f"), (101L, "p q r s"))
      .toDF("id", "text")
    val cands = Seq(
      (1L, "a b c d x f"),  // windows abc,bcd,cdx,dxf → 2/4, run 2
      (2L, "a b c d e f"),  // full copy → 3/3, run 3 → span 5
      (3L, "z z"),          // shorter than n → 0 windows, null rate
      (4L, "t u v w x y")). // nothing matches → 0.0, run 0
      toDF("id", "text")
    val got = Decontaminate.memorizationScan(cands, corpus, "id",
      "text", n = 3).orderBy("id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("n_windows") == 4 &&
      r1.getAs[Long]("n_matched") == 2 &&
      r1.getAs[Double]("mem_rate") == 0.5 &&
      r1.getAs[Long]("max_run") == 2 &&
      r1.getAs[Long]("max_span_tokens") == 4, r1.toString)
    val r2 = got(1)
    assert(r2.getAs[Double]("mem_rate") == 1.0 &&
      r2.getAs[Long]("max_span_tokens") == 6, r2.toString)
    val r3 = got(2)
    assert(r3.getAs[Long]("n_windows") == 0 &&
      r3.isNullAt(r3.fieldIndex("mem_rate")) &&
      r3.getAs[Long]("max_span_tokens") == 0, r3.toString)
    val r4 = got(3)
    assert(r4.getAs[Double]("mem_rate") == 0.0 &&
      r4.getAs[Long]("max_run") == 0, r4.toString)
  }

  test("zipfFit: an exact power law fits slope −1 with r² ≈ 1; " +
      "ties and guards behave") {
    import spark.implicits._
    import graft.operators.Profiles
    // freq(rank r) = 1024/r for r = 1..8 as one doc per token copy
    val rows = (1 to 8).flatMap(r =>
      Seq.fill(1024 / r)(s"t$r")).map(Tuple1(_)).toDF("text")
    val got = Profiles.zipfFit(rows, "text", topN = 8).collect().head
    assert(got.getAs[Long]("n_terms") == 8)
    val slope = got.getAs[Double]("slope")
    assert(slope > -1.01 && slope < -0.99, slope.toString)
    assert(got.getAs[Double]("r2") > 0.999, got.toString)
    // all-equal counts → zero x-variance is impossible (ranks vary)
    // but zero Y-variance must null r2 and keep slope 0
    val flat = Seq("a", "b", "c").map(Tuple1(_)).toDF("text")
    val gf = Profiles.zipfFit(flat, "text", topN = 3).collect().head
    assert(gf.getAs[Double]("slope") == 0.0 &&
      gf.isNullAt(gf.fieldIndex("r2")), gf.toString)
    assert(intercept[IllegalArgumentException] {
      Profiles.zipfFit(flat, "text", topN = 1)
    }.getMessage.contains("topN"))
  }

  test("readability: hand-counted Flesch components, min-1 floors, " +
      "empty text reports null") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val d = Seq(
      (1L, "The cat sat. It ran!"), // 5 words, 2 sentences, 5 syllables
      (2L, "xyz 7"),                // vowel-less words floor at 1 each
      (3L, "   "),                  // whitespace-only → 0 words
      (4L, "no punctuation here")). // sentences floors at 1
      toDF("doc_id", "text")
    val got = TextAnalysis.readability(d, "doc_id", "text")
      .orderBy("id").collect()
    val r1 = got(0)
    assert(r1.getAs[Long]("words") == 5 &&
      r1.getAs[Long]("sentences") == 2 &&
      r1.getAs[Long]("syllables") == 5, r1.toString)
    // 206.835 − 1.015·(5/2) − 84.6·(5/5) = 119.6975
    assert(r1.getAs[Double]("flesch") == 119.6975, r1.toString)
    assert(got(1).getAs[Long]("syllables") == 2, got(1).toString)
    assert(got(2).getAs[Long]("words") == 0 &&
      got(2).isNullAt(got(2).fieldIndex("flesch")), got(2).toString)
    assert(got(3).getAs[Long]("sentences") == 1, got(3).toString)
  }

  test("vocabRichness: hand-counted types/hapax battery") {
    import spark.implicits._
    import graft.operators.Profiles
    val d = Seq("a b a c", "b d").map(Tuple1(_)).toDF("text")
    val r = Profiles.vocabRichness(d, "text").collect().head
    assert(r.getAs[Long]("types") == 4 && r.getAs[Long]("tokens") == 6 &&
      r.getAs[Long]("hapax") == 2 && r.getAs[Long]("dis") == 2,
      r.toString)
    assert(r.getAs[Double]("ttr") == 0.666667 &&
      r.getAs[Double]("hapax_rate") == 0.5, r.toString)
  }

  test("trimmedMeanByKey: hand-trimmed tails, all-trimmed keys " +
      "report null, guards validate") {
    import spark.implicits._
    import graft.operators.Profiles
    val d = ((1 to 10).map(i => ("A", i.toLong, i.toDouble)) :+
      (("B", 99L, 7.0))).toDF("k", "id", "v")
    val got = Profiles.trimmedMeanByKey(d, "k", "id", "v",
      trimBp = 1000).orderBy("key").collect()
    // key A: pct = (rn−1)/9, keep rn 2..9 → mean(2..9) = 5.5
    val a = got(0)
    assert(a.getAs[Long]("n") == 10 && a.getAs[Long]("n_kept") == 8 &&
      a.getAs[Double]("trimmed_mean") == 5.5, a.toString)
    // key B: single row has pct 0 < 0.1 → everything trimmed → null
    val b = got(1)
    assert(b.getAs[Long]("n_kept") == 0 &&
      b.isNullAt(b.fieldIndex("trimmed_mean")), b.toString)
    assert(intercept[IllegalArgumentException] {
      Profiles.trimmedMeanByKey(d, "k", "id", "v", trimBp = 5000)
    }.getMessage.contains("trimBp"))
  }

  test("distinctN: hand-counted diversity ratios and the short-text " +
      "null order") {
    import spark.implicits._
    import graft.operators.Metrics
    val d = Seq("a b a", "a b").map(Tuple1(_)).toDF("text")
    val got = Metrics.distinctN(d, "text", maxN = 3).orderBy("n")
      .collect()
    assert(got(0).getAs[Long]("n_total") == 5 &&
      got(0).getAs[Long]("n_distinct") == 2 &&
      got(0).getAs[Double]("distinct_ratio") == 0.4, got(0).toString)
    assert(got(1).getAs[Long]("n_total") == 3 &&
      got(1).getAs[Long]("n_distinct") == 2 &&
      got(1).getAs[Double]("distinct_ratio") == 0.666667,
      got(1).toString)
    // n = 3: only "a b a" is long enough → 1 gram
    assert(got(2).getAs[Long]("n_total") == 1 &&
      got(2).getAs[Double]("distinct_ratio") == 1.0, got(2).toString)
    // every text shorter than n → zero grams, null ratio
    val short = Seq("x").map(Tuple1(_)).toDF("text")
    val gs = Metrics.distinctN(short, "text", maxN = 2).orderBy("n")
      .collect()
    assert(gs(1).getAs[Long]("n_total") == 0 &&
      gs(1).isNullAt(gs(1).fieldIndex("distinct_ratio")), gs(1).toString)
  }

  test("giniConcentration: balanced keys score 0, hand-computed skew, " +
      "single key null") {
    import spark.implicits._
    import graft.operators.Profiles
    val even = Seq("a", "a", "b", "b").map(Tuple1(_)).toDF("k")
    val re = Profiles.giniConcentration(even, "k").collect().head
    assert(re.getAs[Long]("n_keys") == 2 && re.getAs[Long]("total") == 4
      && re.getAs[Double]("gini") == 0.0, re.toString)
    // counts {a:1, b:9}: G = (2·(1+18) − 3·10)/(2·10) = 0.4
    val skew = (Seq("a") ++ Seq.fill(9)("b")).map(Tuple1(_)).toDF("k")
    val rsk = Profiles.giniConcentration(skew, "k").collect().head
    assert(rsk.getAs[Double]("gini") == 0.4, rsk.toString)
    val one = Seq("a", "a").map(Tuple1(_)).toDF("k")
    val ro = Profiles.giniConcentration(one, "k").collect().head
    assert(ro.isNullAt(ro.fieldIndex("gini")), ro.toString)
  }

  test("tokenLabelMi: a perfect label marker tops the ranking, an " +
      "everywhere-token scores exactly 0, minDf gates") {
    import spark.implicits._
    val docs = (1 to 20).map { i =>
      val y = i % 2 == 0
      val marker = if (y) "enword" else "deword"
      (i.toLong, s"common $marker filler$i", y)
    }.toDF("id", "text", "y")
    val got = graft.operators.Vocab.tokenLabelMi(docs, "id", "text",
      col("y"), minDf = 2L, topK = 10).collect()
    // fillers fall under minDf; common + the two markers survive
    assert(got.map(_.getAs[String]("term")).toSet ==
      Set("common", "enword", "deword"), got.mkString(";"))
    val byTerm = got.map(r => r.getAs[String]("term") -> r).toMap
    // a token present in EVERY doc carries zero information
    assert(byTerm("common").getAs[Double]("mi") == 0.0)
    // perfect markers carry exactly 1 bit
    assert(byTerm("enword").getAs[Double]("mi") == 1.0 &&
      byTerm("deword").getAs[Double]("mi") == 1.0, got.mkString(";"))
    assert(byTerm("enword").getAs[Long]("df") == 10 &&
      byTerm("enword").getAs[Long]("d1") == 10)
  }

  test("ksTest: hand-computed D on shifted samples, identical samples " +
      "score 0, an empty side raises by name") {
    import spark.implicits._
    import graft.operators.Profiles
    val a = Seq(1, 2, 3, 4).toDF("x")
    val b = Seq(3, 4, 5, 6).toDF("x")
    // F_a - F_b peaks at 0.5 on v in {2,3,4}
    val r = Profiles.ksTest(a, b, "x").collect().head
    assert(r.getAs[Long]("n_a") == 4 && r.getAs[Long]("n_b") == 4 &&
      r.getAs[Double]("d_stat") == 0.5, r.toString)
    val same = Profiles.ksTest(a, a, "x").collect().head
    assert(same.getAs[Double]("d_stat") == 0.0, same.toString)
    val empty = Seq.empty[Int].toDF("x")
    val ex = intercept[Exception] {
      Profiles.ksTest(a, empty, "x").collect()
    }
    assert(ex.getMessage.contains("ksTest"), ex.getMessage)
  }

  test("wasserstein1: unit shift transports exactly 1, identical " +
      "samples 0, single shared value 0 with real counts, empty raises") {
    import spark.implicits._
    import graft.operators.Profiles
    val a = Seq(0, 1).toDF("x")
    val b = Seq(1, 2).toDF("x")
    val r = Profiles.wasserstein1(a, b, "x").collect().head
    assert(r.getAs[Long]("n_a") == 2 && r.getAs[Long]("n_b") == 2 &&
      r.getAs[Double]("w1") == 1.0, r.toString)
    val same = Profiles.wasserstein1(a, a, "x").collect().head
    assert(same.getAs[Double]("w1") == 0.0, same.toString)
    // one shared distinct value: zero segments but genuine totals
    val s1 = Seq(5).toDF("x")
    val ro = Profiles.wasserstein1(s1, s1, "x").collect().head
    assert(ro.getAs[Long]("n_a") == 1 && ro.getAs[Long]("n_b") == 1 &&
      ro.getAs[Double]("w1") == 0.0, ro.toString)
    val ex = intercept[Exception] {
      Profiles.wasserstein1(a, Seq.empty[Int].toDF("x"), "x").collect()
    }
    assert(ex.getMessage.contains("wasserstein1"), ex.getMessage)
  }

  test("cramersV: perfect 2x2 association scores 1 including the " +
      "zero-observed cells, independence scores 0, one category null") {
    import spark.implicits._
    import graft.operators.Profiles
    // chi2 = 4 only if the two EMPTY cells contribute (0-1)^2/1 each
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"))
      .toDF("a", "b")
    val rp = Profiles.cramersV(perfect, "a", "b").collect().head
    assert(rp.getAs[Long]("n") == 4 && rp.getAs[Double]("chi2") == 4.0 &&
      rp.getAs[Double]("cramers_v") == 1.0, rp.toString)
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val ri = Profiles.cramersV(indep, "a", "b").collect().head
    assert(ri.getAs[Double]("chi2") == 0.0 &&
      ri.getAs[Double]("cramers_v") == 0.0, ri.toString)
    val mono = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val rm = Profiles.cramersV(mono, "a", "b").collect().head
    assert(rm.getAs[Long]("categories_a") == 1 &&
      rm.isNullAt(rm.fieldIndex("cramers_v")) &&
      rm.getAs[Double]("chi2") == 0.0, rm.toString)
  }

  test("scriptMixAudit: Cyrillic and Greek homoglyphs flag, pure " +
      "single-script tokens never do, empty text reports null ratio") {
    import spark.implicits._
    val docs = Seq(
      (1L, "pаypal is fine"),        // 'а' = U+0430: 1 of 3 mixed
      (2L, "plain ascii text"),       // clean
      (3L, "все на кириллице"),       // pure Cyrillic: no Latin, clean
      (4L, "mixΣd token"),            // Greek sigma inside Latin
      (5L, "   "))                    // no tokens
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .scriptMixAudit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) == ((3L, 1L, Some(0.333333))), got(1L).toString)
    assert(got(2L) == ((3L, 0L, Some(0.0))))
    assert(got(3L) == ((3L, 0L, Some(0.0))))
    assert(got(4L) == ((2L, 1L, Some(0.5))))
    assert(got(5L) == ((0L, 0L, None)), got(5L).toString)
  }

  test("codeScore: hand-counted ratios on a code snippet, prose " +
      "scores near zero, the score clamps at 1, empty text null") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val d = Seq(
      (1L, "if (x) {\n  y = 1;\n}"),
      (2L, "just some plain words here"),
      (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.codeScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val c = got(1L)
    assert(c.getAs[Double]("symbol_ratio") ==
      BigDecimal(6.0 / 19.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, c.toString)
    assert(c.getAs[Double]("indent_ratio") == 0.333333 &&
      c.getAs[Double]("semi_ratio") == 0.333333, c.toString)
    assert(c.getAs[Double]("kw_ratio") ==
      BigDecimal(1.0 / 7.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(c.getAs[Double]("code_score") == 1.0, c.toString)
    val p = got(2L)
    assert(p.getAs[Double]("symbol_ratio") == 0.0 &&
      p.getAs[Double]("code_score") == 0.0, p.toString)
    assert(got(3L).isNullAt(got(3L).fieldIndex("code_score")))
  }

  test("sourceSimilarity: identical vocabularies score 1, disjoint " +
      "pairs are absent, partial overlap is exact set arithmetic") {
    import spark.implicits._
    import graft.operators.Vocab
    val d = Seq(
      ("A", 1L, "x y z"), ("B", 2L, "x y z"),   // identical
      ("C", 3L, "x y q"),                       // 2 of 4 with A
      ("D", 4L, "p r s")).toDF("src", "id", "t")
    val got = Vocab.sourceSimilarity(d, "src", "id", "t", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(4), r.getDouble(5))).toMap
    assert(got(("A", "B")) == ((3L, 1.0)), got.toString)
    // A={x,y,z}, C={x,y,q}: shared 2, union 4
    assert(got(("A", "C")) == ((2L, 0.5)))
    assert(!got.contains(("A", "D")) && !got.contains(("C", "D")))
    // k = 1 keeps only each source's top term (all counts tie, so the
    // term tiebreak wins: A,B -> "x" but C -> "q") — only A-B pairs
    val k1 = Vocab.sourceSimilarity(d, "src", "id", "t", k = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(k1 == Set(("A", "B")), k1.toString)
  }

  test("vocabDrift: new/lost/common statuses with both counts and " +
      "ranks, k caps each side") {
    import spark.implicits._
    import graft.operators.Vocab
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "x z z")).toDF("doc_id", "text")
    val got = Vocab.vocabDrift(a, b, "doc_id", "text", k = 2)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(2)), Option(r.get(3)),
          Option(r.get(4)), Option(r.get(5)))).toMap
    assert(got("x") == (("common", Some(2L), Some(1L), Some(1L),
      Some(2L))), got.toString)
    assert(got("y") == (("lost", Some(1L), None, Some(2L), None)))
    assert(got("z") == (("new", None, Some(2L), None, Some(1L))))
    // k = 1 keeps only each side's top term
    val k1 = Vocab.vocabDrift(a, b, "doc_id", "text", k = 1)
      .collect().map(_.getString(0)).toSet
    assert(k1 == Set("x", "z"))
  }

  test("psiByKey: identical keys score 0, a shifted key spikes, " +
      "one-sided keys report null psi with counts intact") {
    import spark.implicits._
    import graft.operators.Profiles
    val a = Seq(("S", 5.0), ("S", 15.0), ("S", 5.0), ("S", 15.0),
      ("D", 5.0), ("D", 5.0), ("D", 15.0), ("D", 15.0),
      ("A", 5.0)).toDF("k", "v")
    val b = Seq(("S", 5.0), ("S", 15.0), ("S", 5.0), ("S", 15.0),
      ("D", 5.0), ("D", 5.0), ("D", 5.0), ("D", 5.0),
      ("B", 5.0)).toDF("k", "v")
    val got = Profiles.psiByKey(a, b, "k", "v",
      lo = 0.0, hi = 20.0, bins = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got("S")._3 == Some(0.0), got("S").toString)
    assert(got("D")._3.get > 0.5, got("D").toString)
    assert(got("A") == ((1L, 0L, None)), got("A").toString)
    assert(got("B") == ((0L, 1L, None)), got("B").toString)
  }

  test("freshness: a silently-stopped key flags stale, live keys " +
      "don't, the lag arithmetic is exact") {
    import spark.implicits._
    import graft.operators.Checks
    val ev = Seq(("live", 95L), ("live", 99L), ("dead", 40L),
      ("dead", 50L)).toDF("feed", "t")
    val got = Checks.freshness(ev, "feed", "t",
      nowNanos = 100L, staleAfterNanos = 20L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(got("live") == ((2L, 99L, 1L, false)), got.toString)
    assert(got("dead") == ((2L, 50L, 50L, true)))
    assert(intercept[IllegalArgumentException] {
      Checks.freshness(ev, "feed", "t", 100L, 0L)
    }.getMessage.contains("staleAfter"))
  }

  test("categoricalEntropy: uniform keys hit ln(k), single-category " +
      "keys hit 0, nulls count as a category") {
    import spark.implicits._
    import graft.operators.Profiles
    val d = Seq(("U", "a"), ("U", "b"), ("U", "c"), ("U", "d"),
      ("M", "x"), ("M", "x"),
      ("N", "y"), ("N", null))
      .toDF("k", "c")
    val got = Profiles.categoricalEntropy(d, "k", "c")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("U") == ((4L, 4L,
      BigDecimal(math.log(4.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)), got("U").toString)
    assert(got("M") == ((2L, 1L, 0.0)))
    // null is a real category: 2 cats at 50/50 -> ln 2
    assert(got("N") == ((2L, 2L,
      BigDecimal(math.log(2.0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)), got("N").toString)
  }

  test("quantileNormalize: hand-checked pooled mapping, a shifted " +
      "source lands on the pooled scale, pct is the exact ratio") {
    import spark.implicits._
    import graft.operators.Profiles
    // A = {10, 20, 30}, B = {1010, 1020, 1030}: same shape, shifted.
    // Pooled sorted: 10,20,30,1010,1020,1030 (N=6). B's median (pct
    // 0.5) maps to pooled rank 1+floor(0.5*5+0.5)=4 -> 1010; both
    // sources' min (pct 0) map to pooled min 10.
    val d = Seq(("A", 1L, 10.0), ("A", 2L, 20.0), ("A", 3L, 30.0),
      ("B", 4L, 1010.0), ("B", 5L, 1020.0), ("B", 6L, 1030.0))
      .toDF("k", "id", "v")
    val got = Profiles.quantileNormalize(d, "k", "id", "v")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) == ((0.0, 10.0)) && got(4L) == ((0.0, 10.0)),
      got.toString)
    assert(got(2L) == ((0.5, 1010.0)) && got(5L) == ((0.5, 1010.0)))
    assert(got(3L) == ((1.0, 1030.0)) && got(6L) == ((1.0, 1030.0)))
  }

  test("withCompressionRatio: repetition < prose < noise, " +
      "deterministic across partitionings, null and empty contracts") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val rep = "spam " * 200
    val prose = (1 to 100).map(i => s"w${i * 37 % 91}x$i").mkString(" ")
    val rng = new scala.util.Random(42)
    val noise = (1 to 500).map(_ => rng.nextPrintableChar()).mkString
    val d = Seq((1L, rep), (2L, prose), (3L, noise), (4L, null),
      (5L, "")).toDF("doc_id", "text")
    def run(parts: Int) = TextAnalysis
      .withCompressionRatio(d.repartition(parts), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val got = run(3)
    assert(got(1L)._2.get < got(2L)._2.get &&
      got(2L)._2.get < got(3L)._2.get, got.toString)
    assert(got(1L)._2.get < 0.1 && got(3L)._2.get > 0.5)
    assert(got(1L)._1.get == 1000L)
    assert(got(4L) == ((None, None)) && got(5L) == ((Some(0L), None)))
    assert(run(1) == got, "partitioning changed deflate output")
  }

  test("q271 deflate fixture stays in sync: every doc_id<400 text at " +
      "the gate scales resolves by md5 and the pinned length equals " +
      "this JVM's Deflater-6 output") {
    // fixtures/deflate_lengths.parquet IS q271's oracle input — if the
    // testdata regenerates or the JDK's zlib changes, this catches it
    // at sbt-test time instead of as a driver hash fail
    val fixture = spark.read
      .parquet("/root/repo/fixtures/deflate_lengths.parquet")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val deflater = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](1 << 16)
    def deflatedLen(text: String): Long = {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      deflater.reset(); deflater.setInput(bytes); deflater.finish()
      var n = 0L
      while (!deflater.finished()) n += deflater.deflate(buf)
      n
    }
    def md5hex(text: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
    var checked = 0
    // all THREE gate scales: the closing exact_check runs at sf0.1 too,
    // so a regenerated sf0.1 documents.parquet must fail HERE, not as
    // a driver hash FAIL (the bounded doc_id<400 slice keeps this cheap)
    for (sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val texts = spark.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 400 && col("text").isNotNull &&
          col("text") =!= "")
        .select("text").distinct().collect().map(_.getString(0))
      texts.foreach { t =>
        val h = md5hex(t)
        assert(fixture.contains(h),
          s"text missing from deflate fixture (md5 $h) — regenerate " +
            "fixtures/deflate_lengths.parquet")
        assert(fixture(h) == deflatedLen(t),
          s"pinned deflate length ${fixture(h)} != this JVM's " +
            s"${deflatedLen(t)} for md5 $h — zlib changed; regenerate")
        checked += 1
      }
    }
    assert(checked >= 1100, s"only $checked texts checked")
  }

  test("foldConfusables: homoglyph spoofs collapse onto their Latin " +
      "key, genuine Latin is untouched, the fold pairs with the audit") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "pаypal.com"),   // Cyrillic а
      (2L, "paypal.com"),   // genuine
      (3L, "mixΝu"))        // Greek capital Nu -> N
      .toDF("id", "t")
    val folded = docs
      .select(col("id"), TextAnalysis.foldConfusables(col("t")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(folded(1L) == "paypal.com" && folded(2L) == "paypal.com" &&
      folded(3L) == "mixNu", folded.toString)
    // the folded key collapses the spoof pair the audit flagged
    assert(folded(1L) == folded(2L))
  }

  test("shrunkRates: small perfect keys shrink BELOW large strong " +
      "ones, null cond is failure, hand-checked arithmetic, guards") {
    import spark.implicits._
    import graft.operators.Profiles
    // global: 12/22; A = 2/2 raw 1.0, B = 10/20 raw 0.5; m = 2
    val d = (Seq.fill(2)(("A", true)) ++ Seq.fill(10)(("B", true)) ++
      Seq.fill(10)(("B", false))).toDF("k", "y")
    val got = Profiles.shrunkRates(d, "k", col("y"), priorStrength = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val p0 = 12.0 / 22.0
    assert(got("A") == ((2L, 2L, 1.0,
      BigDecimal((2.0 + 2.0 * p0) / 4.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)),
      got("A").toString)
    assert(got("B")._4 == BigDecimal((10.0 + 2.0 * p0) / 22.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // A (2/2) no longer at 1.0; with a strong prior it approaches p0
    val strong = Profiles.shrunkRates(d, "k", col("y"), 1e6)
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(math.abs(strong("A") - strong("B")) < 0.001, strong.toString)
    // null cond = failure
    val withNull = Seq(("A", Some(true)), ("A", None))
      .toDF("k", "y")
    val rn = Profiles.shrunkRates(withNull, "k", col("y"), 1.0)
      .collect().head
    assert(rn.getAs[Long]("n") == 2 && rn.getAs[Long]("k") == 1)
    assert(intercept[IllegalArgumentException] {
      Profiles.shrunkRates(d, "k", col("y"), 0.0)
    }.getMessage.contains("priorStrength"))
  }

  test("hhi: hand-computed concentration, balanced keys floor at 1/k " +
      "(norm 0), single key peaks at 1 (norm null), empty all null") {
    import spark.implicits._
    import graft.operators.Profiles
    // counts {a:1, b:3}: HHI = (1 + 9)/16 = 0.625;
    // norm = (0.625 - 0.5)/0.5 = 0.25
    val skew = (Seq("a") ++ Seq.fill(3)("b")).map(Tuple1(_)).toDF("k")
    val rs = Profiles.hhi(skew, "k").collect().head
    assert(rs.getAs[Long]("n_keys") == 2 && rs.getAs[Long]("total") == 4
      && rs.getAs[Double]("hhi") == 0.625
      && rs.getAs[Double]("hhi_norm") == 0.25, rs.toString)
    val even = Seq("a", "a", "b", "b").map(Tuple1(_)).toDF("k")
    val re = Profiles.hhi(even, "k").collect().head
    assert(re.getAs[Double]("hhi") == 0.5 &&
      re.getAs[Double]("hhi_norm") == 0.0, re.toString)
    val one = Seq("a", "a").map(Tuple1(_)).toDF("k")
    val ro = Profiles.hhi(one, "k").collect().head
    assert(ro.getAs[Double]("hhi") == 1.0 &&
      ro.isNullAt(ro.fieldIndex("hhi_norm")), ro.toString)
    val empty = Seq.empty[String].map(Tuple1(_)).toDF("k")
    val rz = Profiles.hhi(empty, "k").collect().head
    assert(rz.getAs[Long]("n_keys") == 0 &&
      rz.isNullAt(rz.fieldIndex("hhi")) &&
      rz.isNullAt(rz.fieldIndex("hhi_norm")), rz.toString)
  }

  test("editDistanceJoin: exact pair set at d=1 and d=2, the shared-" +
      "variant-but-far counterexample stays out, dup inputs collapse, " +
      "hot buckets fail loud") {
    import spark.implicits._
    val vals = Seq("kitten", "sitten", "sittin", "apple", "kitten")
      .toDF("t")
    val d2 = Dedup.editDistanceJoin(vals, "t", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getInt(2))).toSet
    assert(d2 == Set(("kitten", "sitten", 1), ("sitten", "sittin", 1),
      ("kitten", "sittin", 2)), d2.toString)
    val d1 = Dedup.editDistanceJoin(vals, "t", maxDist = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(d1 == Set(("kitten", "sitten"), ("sitten", "sittin")))
    // "ab"/"ba" share deletion variant "a" but sit at distance 2
    val ab = Seq("ab", "ba").toDF("t")
    assert(Dedup.editDistanceJoin(ab, "t", maxDist = 1).count() == 0L)
    assert(Dedup.editDistanceJoin(ab, "t", maxDist = 2).count() == 1L)
    // single chars all share the "" variant: bucket of 3 > maxBucket=2
    val hot = Seq("a", "b", "c").toDF("t")
    val ex = intercept[Exception] {
      Dedup.editDistanceJoin(hot, "t", maxDist = 1, maxBucket = 2)
        .collect()
    }
    assert(ex.getMessage.contains("maxBucket"), ex.getMessage)
    assert(intercept[IllegalArgumentException] {
      Dedup.editDistanceJoin(vals, "t", maxDist = 3)
    }.getMessage.contains("maxDist"))
  }
}
