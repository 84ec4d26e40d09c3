package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Dedup, Quantize, Similarity}

/** Round-7 operators: repeated-span removal (exact substring dedup),
  * fuzzy MinHash decontamination, prefix-dimension two-stage serving. */
class FuzzyAndServingSpec extends TestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  // ---------- removeRepeatedSpans ------------------------------------------

  test("repeated spans: shared gram stripped, rest kept in order") {
    val out = Dedup.removeRepeatedSpans(docs(
        1L -> "a b c d e",
        2L -> "x a b c y",
        3L -> "p q r s t"),
      "doc_id", "text", n = 3, minDocs = 2)
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
        r.getAs[String]("clean_text"))).toMap
    // "a b c" occurs in docs 1 and 2 -> its 3 positions vanish from both
    assert(byId(1L) == ((5L, 3L, "d e")), s"got ${byId(1L)}")
    assert(byId(2L) == ((5L, 3L, "x y")), s"got ${byId(2L)}")
    assert(byId(3L) == ((5L, 0L, "p q r s t")), "untouched doc intact")
  }

  test("repeated spans: full strip to empty, null text, short doc") {
    val out = Dedup.removeRepeatedSpans(
      docs(1L -> "a b c", 2L -> "a b c", 3L -> "t u")
        .union(Seq((4L, null: String)).toDF("doc_id", "text")),
      "doc_id", "text", n = 3, minDocs = 2)
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
        r.getAs[String]("clean_text"))).toMap
    assert(byId(1L) == ((3L, 3L, "")), "exact dup strips to empty string")
    assert(byId(2L) == ((3L, 3L, "")))
    assert(byId(3L) == ((2L, 0L, "t u")), "sub-gram doc untouched")
    assert(byId(4L) == ((0L, 0L, null)), "null text passes through null")
  }

  test("repeated spans: IN-doc repetition alone does not trigger") {
    val out = Dedup.removeRepeatedSpans(
      docs(1L -> "a b c a b c", 2L -> "z z z z"),
      "doc_id", "text", n = 3, minDocs = 2)
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Long]("n_removed")).toMap
    assert(byId(1L) == 0L, "df counts DISTINCT docs, not occurrences")
    assert(byId(2L) == 0L)
  }

  test("repeated spans: corpus text never enters an exchange") {
    val out = Dedup.removeRepeatedSpans(
      docs(1L -> "a b c d", 2L -> "a b c e"), "doc_id", "text",
      n = 3, minDocs = 2)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // every Exchange's output carries grams, ids, or positions — the
    // reassembly join reads __toks from the post-shuffle SCAN side
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    assert(!exchanges.exists(_.contains("__toks")),
      s"token arrays must not shuffle:\n$plan")
  }

  // ---------- fuzzyOverlap -------------------------------------------------

  private val benchText =
    "the quick brown fox jumps over the lazy dog near the old river bank today"

  test("fuzzy decon: exact copy 1.0, near copy flagged, disjoint clean") {
    val bench = docs(900L -> benchText)
    val corpus = docs(
      1L -> benchText, // exact copy: jaccard 1.0
      2L -> benchText.split(" ").dropRight(1).mkString(" "), // near copy
      3L -> "completely different words about completely other things here",
      4L -> "so tiny") // below shingle length -> no signature
    val out = Decontaminate.fuzzyOverlap(corpus, "doc_id", "text",
      bench, "doc_id", "text", flagAt = 0.5)
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Double]("best_jaccard"), r.getAs[Long]("n_bench_matches"),
        r.getAs[Boolean]("contaminated"))).toMap
    assert(byId(1L) == ((1.0, 1L, true)), s"got ${byId(1L)}")
    assert(byId(2L)._1 > 0.5 && byId(2L)._1 < 1.0 && byId(2L)._3,
      s"near copy must verify above 0.5: ${byId(2L)}")
    assert(byId(3L) == ((0.0, 0L, false)), s"got ${byId(3L)}")
    assert(byId(4L) == ((0.0, 0L, false)), "sub-shingle doc never matches")
    assert(out.count() == 4, "every corpus doc appears in the verdict")
  }

  test("fuzzy decon: band multiplicity does not inflate match counts") {
    // an exact copy collides in ALL bands; n_bench_matches must still be 1
    val out = Decontaminate.fuzzyOverlap(
      docs(1L -> benchText), "doc_id", "text",
      docs(900L -> benchText), "doc_id", "text")
    val r = out.head()
    assert(r.getAs[Long]("n_bench_matches") == 1L)
    assert(r.getAs[Double]("best_jaccard") == 1.0)
  }

  test("fuzzy decon: bench side broadcasts, corpus side never does") {
    val out = Decontaminate.fuzzyOverlap(
      docs(1L -> benchText), "doc_id", "text",
      docs(900L -> benchText), "doc_id", "text")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast band probe:\n$plan")
  }

  test("curation v3 composition: gate, exact dedup, fuzzy decon each " +
    "prune their own class") {
    val base = "the a " + (1 to 60).map(i => s"word$i").mkString(" ")
    val benchTxt = "the a " + (1 to 60).map(i => s"bench$i").mkString(" ")
    val corpus = docs(
      1L -> base, // survivor
      2L -> base, // exact copy -> dedup drops (id 1 wins)
      3L -> benchTxt, // verbatim bench member -> fuzzy drops (jac 1.0)
      4L -> benchTxt.split(" ").dropRight(1).mkString(" "), // near copy
      5L -> "the a too short") // fails the gate
    val bench = docs(900L -> benchTxt)
    val gated = graft.operators.TextAnalysis
      .withGopherQuality(corpus, "text", minTokens = 50)
      .filter(col("gopher_pass"))
      .select(col("doc_id"), col("text"))
    val deduped = Dedup.exactKeepMinId(gated, "doc_id", "text")
    val out = Decontaminate.fuzzyDecontaminate(deduped, "doc_id",
        "text", bench, "doc_id", "text", flagAt = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L),
      s"each stage must prune its class (got survivors $out)")
  }

  // ---------- prefixTopK ---------------------------------------------------

  private def vecs(n: Int, dim: Int) = {
    // deterministic synthetic embeddings
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map(j =>
        math.sin(i * 31 + j * 7).toFloat).toArray)
    }.toDF("vec_id", "embedding")
  }

  test("prefixTopK with full-corpus shortlist IS exact cosineTopK") {
    val emb = vecs(30, 16)
    val exact = Similarity.cosineTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding", k = 5)
    val pref = Quantize.prefixTopK(
      emb.filter(col("vec_id") < 3), emb, "vec_id", "embedding",
      dPrefix = 4, k = 5, shortlist = 30)
    // the shortlist covers the whole corpus, so the exact re-rank sees
    // every candidate -> results must be bit-identical to the exact path
    val a = exact.orderBy("query_id", "rank").collect().toSeq
    val b = pref.orderBy("query_id", "rank").collect().toSeq
    assert(a == b, s"exact=$a\nprefix=$b")
  }

  test("prefixTopK returns k rows per query with a tight shortlist") {
    val emb = vecs(40, 16)
    val out = Quantize.prefixTopK(emb.filter(col("vec_id") < 2), emb,
      "vec_id", "embedding", dPrefix = 8, k = 3, shortlist = 10)
    val counts = out.groupBy("query_id").count()
      .collect().map(_.getLong(1)).toSeq
    assert(counts == Seq(3L, 3L), s"got $counts")
  }

  test("prefixTopK raises loudly on null vectors and short vectors") {
    val bad = Seq((0L, null: Array[Float]), (1L, Array(1f, 2f)))
      .toDF("vec_id", "embedding")
    val good = vecs(5, 8)
    val e1 = intercept[Exception] {
      Quantize.prefixTopK(bad.filter(col("vec_id") === 0L), good,
        "vec_id", "embedding", dPrefix = 4, k = 1).collect()
    }
    assert(e1.getMessage.contains("null vector"), e1.getMessage)
    val e2 = intercept[Exception] {
      Quantize.prefixTopK(bad.filter(col("vec_id") === 1L), good,
        "vec_id", "embedding", dPrefix = 4, k = 1).collect()
    }
    assert(e2.getMessage.contains("shorter than dPrefix"), e2.getMessage)
  }

  test("prefixTopK raises on a null element inside the prefix") {
    val bad = Seq((0L, Array[java.lang.Float](1f, null, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val good = vecs(5, 4)
    val e = intercept[Exception] {
      Quantize.prefixTopK(bad, good, "vec_id", "embedding",
        dPrefix = 4, k = 1).collect()
    }
    assert(e.getMessage.contains("null element inside the prefix"),
      e.getMessage)
  }

  // ---------- fuzzyJoin (record linkage) -----------------------------------

  test("fuzzyJoin links near-identical records across sources, " +
      "never within one source") {
    val a = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "completely unrelated text about spark partitioning here",
      3L -> "the quick brown fox jumps over the lazy dog today") // A-dup
    val b = docs(
      10L -> "the quick brown fox jumps over the lazy dog", // near 1 & 3
      11L -> "another unrelated sentence about duckdb oracles instead")
    val pairs = Dedup.fuzzyJoin(a, "doc_id", "text",
        b, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both A copies link to B#10; the A-internal dup pair (1,3) and
    // B-internal pairs never surface
    assert(pairs == Set((1L, 10L), (3L, 10L)), s"got $pairs")
  }

  test("fuzzyJoin survives id collisions across sides") {
    val a = docs(7L -> "alpha beta gamma delta epsilon zeta eta")
    val b = docs(7L -> "alpha beta gamma delta epsilon zeta") // same id!
    val pairs = Dedup.fuzzyJoin(a, "doc_id", "text",
        b, "doc_id", "text", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((7L, 7L)),
      "the colliding-id cross pair must survive the self-pair defenses")
  }

  test("fuzzyJoin ≡ verifiedNearDups cross-pairs on disjoint id spaces") {
    val a = docs(
      1L -> "one two three four five six seven eight",
      2L -> "red orange yellow green blue indigo violet")
    val b = docs(
      101L -> "one two three four five six seven",
      102L -> "cats dogs birds fish mice snakes lizards")
    val viaJoin = Dedup.fuzzyJoin(a, "doc_id", "text",
        b, "doc_id", "text", threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode
          .HALF_UP))).toSet
    val viaSelf = Dedup.verifiedNearDups(a.unionByName(b),
        "doc_id", "text", threshold = 0.3)
      .filter(col("doc_a") <= 2 && col("doc_b") >= 101)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode
          .HALF_UP))).toSet
    assert(viaJoin == viaSelf && viaJoin.nonEmpty, s"$viaJoin vs $viaSelf")
  }

  // ---------- semanticOverlap (embedding-level decontamination) ------------

  private def embRows(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("id", "vec")

  test("semanticOverlap flags identical and near vectors, not " +
      "orthogonal or null ones") {
    val corpus = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, Seq(1.0f, 0.0f)),
        org.apache.spark.sql.Row(2L, Seq(0.999f, 0.04f)),
        org.apache.spark.sql.Row(3L, Seq(0.0f, 1.0f)),
        org.apache.spark.sql.Row(4L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("vec",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val bench = embRows(100L -> Seq(1.0f, 0.0f)).select(col("vec"))
    val got = Decontaminate.semanticOverlap(corpus, "id", "vec",
        bench, "vec", threshold = 0.95)
      .select("id", "max_sim", "flagged")
      .collect().map(r => r.getLong(0) ->
        (Option(if (r.isNullAt(1)) null else r.getDouble(1)),
          r.getBoolean(2))).toMap
    assert(got(1L) == ((Some(1.0), true)))
    assert(got(2L)._2, "0.999-cosine paraphrase must flag")
    assert(got(3L) == ((Some(0.0), false)))
    assert(got(4L)._2 == false && got(4L)._1.isEmpty,
      "null vector: null sim, unflagged")
  }

  test("semanticOverlap: empty benchmark flags nothing; gate form drops " +
      "flagged rows only") {
    val corpus = embRows(1L -> Seq(1.0f, 0.0f), 2L -> Seq(0.0f, 1.0f))
    val none = Decontaminate.semanticOverlap(corpus, "id", "vec",
      embRows().select(col("vec")), "vec", 0.9)
      .select("id", "max_sim", "flagged")
    assert(none.collect().forall(!_.getBoolean(2)))
    val kept = Decontaminate.semanticDecontaminate(corpus, "id", "vec",
        embRows(9L -> Seq(1.0f, 0.0f)).select(col("vec")), "vec", 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L))
  }

  test("semanticOverlap validates the corpus schema: missing id or " +
      "vector column raises with the column inventory") {
    val corpus = embRows(1L -> Seq(1.0f, 0.0f))
    val bench = embRows(9L -> Seq(1.0f, 0.0f)).select(col("vec"))
    val e1 = intercept[IllegalArgumentException] {
      Decontaminate.semanticOverlap(corpus, "nope", "vec", bench,
        "vec", 0.9)
    }
    assert(e1.getMessage.contains("nope") &&
      e1.getMessage.contains("columns"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Decontaminate.semanticOverlap(corpus, "id", "missing_vec", bench,
        "vec", 0.9)
    }
    assert(e2.getMessage.contains("missing_vec"), e2.getMessage)
  }

  test("semanticOverlap plan: corpus never shuffles — broadcast sweep") {
    val corpus = embRows((1L to 50L).map(i =>
      i -> Seq(i.toFloat, 1.0f)): _*)
    val out = Decontaminate.semanticOverlap(corpus, "id", "vec",
      embRows(1L -> Seq(1.0f, 2.0f)).select(col("vec")), "vec", 0.99)
    out.collect()
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val lines = p.linesIterator.toSeq
    val ji = lines.indexWhere(_.contains("BroadcastNestedLoopJoin"))
    assert(ji >= 0, s"bench must broadcast:\n$p")
    val corpusBranch = lines(ji + 1)
    assert(corpusBranch.trim.startsWith(":-") &&
      !corpusBranch.contains("Exchange"),
      s"corpus must feed the sweep unshuffled:\n$p")
  }
}
