package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, Vocab}

/** Round-7 text-quality operators: Gopher-rules composite gate, OOV rate
  * against a driver vocabulary, HTML boilerplate strip. */
class TextQualitySpec extends TestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // ---------- T5 span corruption -------------------------------------------

  test("spanCorrupt: sentinels reconstruct the original exactly; mask " +
      "fraction tracks spanLen/startEvery; deterministic; null/empty safe") {
    val text = (1 to 400).map(i => s"w$i").mkString(" ")
    val df = docs(7L -> text, 8L -> "one two three")
    val out = TextAnalysis.spanCorrupt(df, "doc_id", "text",
        startEvery = 20, spanLen = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r7 = out(7L)
    val (nTok, nMask, nSpan) =
      (r7.getLong(1), r7.getLong(2), r7.getLong(3))
    assert(nTok == 400)
    // density: E[mask] ≈ 3/20 = 15%; loose band for hash variance
    assert(nMask >= 20 && nMask <= 120, s"mask count off: $nMask")
    assert(nSpan >= 1 && nSpan <= nMask)
    // RECONSTRUCTION: input with each <extra_id_k> replaced by target
    // span k must be the original token stream — nothing lost, nothing
    // duplicated, order preserved
    def spans(target: String): Map[Int, Seq[String]] = {
      val parts = target.split("<extra_id_").filter(_.nonEmpty)
      parts.map { p =>
        val k = p.takeWhile(_ != '>').toInt
        k -> p.dropWhile(_ != '>').drop(1).trim
          .split("\\s+").filter(_.nonEmpty).toSeq
      }.toMap
    }
    def reconstruct(input: String, target: String): Seq[String] = {
      val sp = spans(target)
      input.split("\\s+").filter(_.nonEmpty).toSeq.flatMap { t =>
        if (t.startsWith("<extra_id_"))
          sp(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Seq(t)
      }
    }
    assert(reconstruct(r7.getString(4), r7.getString(5)) ==
      text.split(" ").toSeq, "reconstruction mismatch")
    // sentinel numbering is 0..n_spans-1 in both texts
    assert((0 until nSpan.toInt).forall(k =>
      r7.getString(4).contains(s"<extra_id_$k>") &&
        r7.getString(5).contains(s"<extra_id_$k>")))
    // determinism incl. partitioning
    val again = TextAnalysis.spanCorrupt(df.repartition(5), "doc_id",
      "text", startEvery = 20, spanLen = 3).collect().toSet
    assert(again == TextAnalysis.spanCorrupt(df, "doc_id", "text",
      startEvery = 20, spanLen = 3).collect().toSet)
    // null text: null pair, zero counts; empty text: empty pair
    val edge = docs(1L -> "").union(
      Seq((2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val eo = TextAnalysis.spanCorrupt(edge, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(eo(2L).isNullAt(4) && eo(2L).isNullAt(5) &&
      eo(2L).getLong(1) == 0L)
    assert(eo(1L).getString(4) == "" && eo(1L).getLong(1) == 0L)
    intercept[IllegalArgumentException](
      TextAnalysis.spanCorrupt(df, "doc_id", "text", startEvery = 1))
    intercept[IllegalArgumentException](
      TextAnalysis.spanCorrupt(df, "doc_id", "text", spanLen = 0))
  }

  test("prefixLmSplit: prefix + target rebuild the original; split in " +
      "[minPrefix, n-1]; short docs absent; deterministic") {
    val text = (1 to 50).map(i => s"t$i").mkString(" ")
    val df = docs(3L -> text, 4L -> "solo", 5L -> "two tokens")
    val out = TextAnalysis.prefixLmSplit(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // 1-token doc cannot split; 2-token doc splits 1|1
    assert(out.keySet == Set(3L, 5L))
    assert(out(5L).getString(3) == "two" && out(5L).getString(4) == "tokens")
    val r3 = out(3L)
    val p = r3.getLong(2)
    assert(p >= 1 && p < 50 && r3.getLong(1) == 50)
    assert(r3.getString(3) + " " + r3.getString(4) == text,
      "prefix + target must rebuild the original token stream")
    assert(r3.getString(3).split(" ").length == p)
    // determinism under partitioning
    assert(TextAnalysis.prefixLmSplit(df.repartition(5), "doc_id", "text")
      .collect().toSet ==
      TextAnalysis.prefixLmSplit(df, "doc_id", "text").collect().toSet)
    // zero-exchange projection
    assert(!TextAnalysis.prefixLmSplit(df, "doc_id", "text")
      .queryExecution.executedPlan.toString.contains("Exchange"))
    intercept[IllegalArgumentException](
      TextAnalysis.prefixLmSplit(df, "doc_id", "text", minPrefix = 0))
  }

  test("withCharGrams + trainLda = trained character language ID: " +
      "grams are whitespace-free, separation on a planted bilingual " +
      "corpus, null/short contracts hold") {
    val cg = TextAnalysis.withCharGrams(docs(1L -> "der die"), "text",
      "cg", n = 3).select("cg").head.getString(0)
    assert(cg == "der er_ r_d _di die", s"got '$cg'")
    assert(!cg.split(" ").exists(_.contains("_ _")))
    // short + null contracts
    val edge = TextAnalysis.withCharGrams(
      docs(1L -> "ab").union(Seq((2L, null.asInstanceOf[String]))
        .toDF("doc_id", "text")), "text", "cg", n = 3)
      .collect().map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(edge(1L).contains("") && edge(2L).isEmpty)
    intercept[IllegalArgumentException](TextAnalysis.withCharGrams(
      docs(1L -> "x"), "text", "text"))
    // native CharGramText ≡ HOF twin on adversarial inputs (unicode,
    // astral plane, short, empty, single-char, whitespace runs)
    val adv = docs(
      1L -> "über die straße",
      2L -> "𝔘𝔫𝔦 𝔠𝔬𝔡𝔢",     // supplementary-plane letters
      3L -> "ab", 4L -> "", 5L -> "x",
      6L -> "a   b\t\nc").union(
      Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val nat = TextAnalysis.withCharGrams(adv, "text", "cg", 3)
      .select("doc_id", "cg").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val hof = TextAnalysis.withCharGramsHof(adv, "text", "cg", 3)
      .select("doc_id", "cg").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(nat == hof, s"native/HOF diverged:\n$nat\n$hof")
    // trained char lang-id: German-ish vs English-ish planted corpus
    val de = Seq.tabulate(15)(i =>
      (i.toLong, s"der hund und die katze ist nicht da nummer n$i"))
      .toDF("doc_id", "text")
    val en = Seq.tabulate(15)(i =>
      (100L + i, s"the dog and the cat is not here number n$i"))
      .toDF("doc_id", "text")
    val all = de.union(en)
    val cgAll = TextAnalysis.withCharGrams(all, "text", "cg_text", 3)
    val model = graft.operators.QualityFilter.trainLda(
      TextAnalysis.withCharGrams(de, "text", "cg_text", 3),
      "doc_id", "cg_text",
      TextAnalysis.withCharGrams(en, "text", "cg_text", 3),
      "doc_id", "cg_text", numBuckets = 128)
    val probs = graft.operators.QualityFilter
      .scoreWith(cgAll, "doc_id", "cg_text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val deP = (0L until 15L).map(probs)
    val enP = (100L until 115L).map(probs)
    assert(deP.min > 0.5, s"a German doc scored ${deP.min}")
    assert(enP.max < 0.5, s"an English doc scored ${enP.max}")
  }

  // ---------- Gopher rules -------------------------------------------------

  test("gopher line rules: bullet/ellipsis fractions over non-blank " +
    "lines; blank lines excluded; null text fails with 0 lines") {
    val df = docs(
      1L -> "- one\n- two\n- three", // all bulleted → fail
      2L -> "good line\n\n   \nanother good", // blanks excluded → 2 lines
      3L -> "starts fine...\nalso trails...\nplain", // 2/3 ellipsis → fail
      5L -> "• bullet\n* star\nnormal line here\nmore normal\nyet more")
      .union(spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(
          4L, null.asInstanceOf[String])),
        docs(1L -> "x").schema))
    val out = TextAnalysis.withGopherLineRules(df, "text")
      .select("doc_id", "n_lines", "bullet_frac", "ellipsis_frac",
        "line_rules_pass")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((3L, 1.0, 0.0, false)), s"bulleted: ${out(1L)}")
    assert(out(2L) == ((2L, 0.0, 0.0, true)), s"blanks: ${out(2L)}")
    assert(out(3L) == ((3L, 0.0, 2.0 / 3, false)),
      s"ellipsis: ${out(3L)}")
    assert(out(4L) == ((0L, 0.0, 0.0, false)), s"null: ${out(4L)}")
    assert(out(5L) == ((5L, 0.4, 0.0, true)), s"mixed: ${out(5L)}")
    intercept[IllegalArgumentException] {
      TextAnalysis.withGopherLineRules(docs(1L -> "x"), "text",
        maxBulletFrac = 0.0)
    }
  }

  test("gopher line rules plan is a pure projection: zero exchanges") {
    val p = TextAnalysis.withGopherLineRules(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"expected a map-only plan:\n$p")
  }

  test("gopher gate: passing doc, short doc, no-stopword doc, symbol doc") {
    val passing = (1 to 60).map(i => s"word$i").mkString(
      "the quick a ", " ", "") // 63 tokens, has 'the' and 'a'
    val noStop = (1 to 60).map(i => s"word$i").mkString(" ") // no stopwords
    val symbols = "the a " + (1 to 60).map(_ => "###").mkString(" ")
    val df = TextAnalysis.withGopherQuality(
      docs(1L -> passing, 2L -> "the a tiny doc", 3L -> noStop,
        4L -> symbols),
      "text", minTokens = 50, maxTokens = 100000)
    val byId = df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("stop_hits"),
        r.getAs[Double]("alpha_frac"), r.getAs[Boolean]("gopher_pass"))).toMap
    assert(byId(1L)._1 == 63L && byId(1L)._2 == 2L && byId(1L)._4,
      s"doc 1 should pass: ${byId(1L)}")
    assert(!byId(2L)._4, "short doc must fail the token floor")
    assert(byId(3L)._2 == 0L && !byId(3L)._4,
      "doc without required stopwords must fail")
    // 60 of 62 tokens are pure symbols -> alpha_frac far below 0.8
    assert(byId(4L)._3 < 0.1 && !byId(4L)._4,
      s"symbol doc must fail alpha_frac: ${byId(4L)}")
  }

  test("gopher gate: mean token length bounds and null text") {
    val short = (1 to 60).map(_ => "a b c").mkString(" ") // mean len 1
    val df = TextAnalysis.withGopherQuality(
      docs(1L -> short).union(Seq((2L, null: String))
        .toDF("doc_id", "text")),
      "text", minTokens = 50)
    val byId = df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tokens"), r.getAs[Double]("mean_tok_len"),
        r.getAs[Boolean]("gopher_pass"))).toMap
    assert(byId(1L)._2 == 1.0 && !byId(1L)._3,
      "1-char tokens must fail the mean-length floor")
    assert(byId(2L) == ((0L, 0.0, false)),
      "null text scores zeros and fails")
  }

  test("gopher gate refuses an unreachable stopword threshold") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.withGopherQuality(docs(1L -> "x"), "text",
        minStopHits = 3, requiredStop = Seq("the", "a", "the"))
    }
    assert(e.getMessage.contains("can never be met"), e.getMessage)
  }

  test("gopher gate is a pure projection — no exchange in the plan") {
    val df = TextAnalysis.withGopherQuality(
      docs(1L -> "the a few words here"), "text")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"expected scan-only plan:\n$p")
  }

  // ---------- C4 document rules --------------------------------------------

  test("c4 rules: line filter (terminal punct, min words, javascript), " +
    "sentence count, lorem/brace flags, null text") {
    val df = docs(
      // one line, three sentences, all words fine → passes at min 3
      1L -> "alpha beta gamma. delta epsilon zeta. eta theta iota.",
      // unpunctuated and short lines drop; the good line survives
      2L -> "no terminal punct here\nhi.\nkeep this full line.",
      // javascript mention kills the line even with punct + words
      3L -> "please enable JavaScript to continue.\nreal content stays here.",
      // lorem ipsum fails the page even though lines are fine
      5L -> "lorem ipsum dolor sit amet. more filler text here.",
      // curly brace → code page
      6L -> "function of x equals y. see below { return 1; }")
      .union(Seq((4L, null: String)).toDF("doc_id", "text"))
    val out = TextAnalysis.withC4Rules(df, "text", minSentences = 3)
      .select("doc_id", "c4_text", "n_sentences", "has_lorem",
        "has_brace", "c4_pass")
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((Some(
      "alpha beta gamma. delta epsilon zeta. eta theta iota."),
      3L, false, false, true)), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((Some("keep this full line."), 1L, false, false,
      false)), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((Some("real content stays here."), 1L, false,
      false, false)), s"doc 3: ${out(3L)}")
    assert(out(4L) == ((None, 0L, false, false, false)),
      s"null doc: ${out(4L)}")
    assert(out(5L)._3 && !out(5L)._5, s"lorem page must fail: ${out(5L)}")
    assert(out(6L)._4 && !out(6L)._5, s"brace page must fail: ${out(6L)}")
    intercept[IllegalArgumentException] {
      TextAnalysis.withC4Rules(df, "text", minLineWords = 0)
    }
  }

  test("c4 rules: a quote-terminated line is kept; sentence runs " +
    "('end...') count once") {
    val out = TextAnalysis.withC4Rules(docs(
        1L -> "he said \"stop right there\"\nand then it ended...",
        2L -> "one two three... four five six.\nseven eight nine"),
      "text", minSentences = 1)
      .select("doc_id", "c4_text", "n_sentences", "c4_pass").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    // line 1 ends in '"' → kept; line 2 ends in '.' (of "...") → kept
    assert(out(1L)._1 ==
      "he said \"stop right there\"\nand then it ended...")
    // the trailing "..." is the ONLY [.!?]+ run and it ends the text,
    // so the split yields one non-empty field = 1 sentence — the quote
    // terminator keeps the line but does not count as a sentence mark
    assert(out(1L)._2 == 1L && out(1L)._3, s"doc 1: ${out(1L)}")
    // unterminated trailing line dropped; "..." and "." are 2 runs
    assert(out(2L) == (("one two three... four five six.", 2L, true)),
      s"doc 2: ${out(2L)}")
  }

  test("c4 rules plan is a pure projection: zero exchanges") {
    val p = TextAnalysis.withC4Rules(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"expected a map-only plan:\n$p")
  }

  // ---------- OOV rate -----------------------------------------------------

  test("oov rate: hand-checked counts, null text, empty-vocab refusal") {
    val df = Vocab.withOovRate(
      docs(1L -> "a b c c", 2L -> "a a a a")
        .union(Seq((3L, null: String)).toDF("doc_id", "text")),
      "text", vocab = Seq("a", "b"))
    val byId = df.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Double]("oov_rate"))).toMap
    assert(byId(1L) == ((4L, 2L, 0.5)))
    assert(byId(2L) == ((4L, 0L, 0.0)))
    assert(byId(3L) == ((0L, 0L, 0.0)), "null text has no OOV mass")
    intercept[IllegalArgumentException] {
      Vocab.withOovRate(docs(1L -> "x"), "text", vocab = Seq.empty)
    }
  }

  test("topTerms: frequency order with deterministic term tie-break") {
    // freq: b=3, a=2, c=2, d=1 -> top-3 cutoff tie (a,c both 2) resolves
    // lexicographically, d never enters
    val terms = Vocab.topTerms(
      docs(1L -> "b b a c", 2L -> "b a c d"), "doc_id", "text", n = 3)
    assert(terms == Seq("b", "a", "c"), s"got $terms")
  }

  test("oov scoring is a zero-join scan projection") {
    val df = Vocab.withOovRate(docs(1L -> "a b"), "text", Seq("a"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"expected scan-only plan:\n$p")
  }

  // ---------- HTML strip ---------------------------------------------------

  test("stripHtml: script/style/comment blocks, tags, entities, order") {
    val html = "<html><head><SCRIPT src=\"x.js\">var a = 1 < 2;</SCRIPT>" +
      "<style>p\n{ color: red; }</style></head><body>" +
      "<!-- multi\nline comment --><p class=\"x\">Tom &amp; Jerry</p>" +
      "<br/>say &quot;hi&quot; &#39;there&#39; &lt;3</body></html>"
    val out = docs(1L -> html)
      .select(TextAnalysis.stripHtml(col("text")).as("t"))
      .as[String].head()
    assert(out == "Tom & Jerry say \"hi\" 'there' <3", s"got: '$out'")
  }

  test("stripHtml decodes &amp; LAST — no double decode") {
    // '&amp;lt;' must become the literal text '&lt;', never '<'
    val out = docs(1L -> "x &amp;lt; y")
      .select(TextAnalysis.stripHtml(col("text")).as("t"))
      .as[String].head()
    assert(out == "x &lt; y", s"got: '$out'")
  }

  test("stripHtml round-trips wrapped text and collapses whitespace") {
    val text = "some   real\ttext with  runs"
    val out = docs(1L -> s"<div><p>$text</p>\n<hr/></div>")
      .select(TextAnalysis.stripHtml(col("text")).as("t"))
      .as[String].head()
    assert(out == "some real text with runs", s"got: '$out'")
  }
}
