package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Property form of the reference's spot-checked round-trip law
  * (write ∘ read = id, `test/runtests.jl:18,40,44`): seeded random small
  * tables survive CSV/JSON/parquet round-trips modulo the format's
  * inherent ambiguities (CSV can't distinguish NULL from empty string, so
  * generated strings are non-empty). */
class RoundTripPropertySpec extends TestBase {

  private val schema = StructType(Seq(
    StructField("a", LongType, nullable = false),
    StructField("b", StringType, nullable = false),
    StructField("c", DoubleType, nullable = true)))

  private def randomTable(rnd: scala.util.Random) = {
    val n = 1 + rnd.nextInt(20)
    val rows = (0 until n).map { i =>
      val a = rnd.nextLong() / 2
      // leading letter so CSV inference can't mistake it for a number
      val b = "s" + rnd.alphanumeric.take(1 + rnd.nextInt(10)).mkString
      // row 0 always non-null so an all-null column can't degrade the
      // inferred type to string
      val c = if (i == 0 || rnd.nextBoolean())
        java.lang.Double.valueOf(math.rint(rnd.nextDouble() * 2e8 - 1e8) / 100)
      else null
      Row(a, b, c)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  for (ext <- Seq("csv", "tsv", "json", "parquet")) {
    test(s"random tables round-trip through $ext (5 seeded draws)") {
      val rnd = new scala.util.Random(ext.hashCode + 42)
      for (_ <- 1 to 5) {
        val df = randomTable(rnd)
        val p = s"${tmpDir()}/t.$ext"
        QuackIO.writeTable(df, p)
        assertSameRows(QuackIO.readFile(spark, Seq(p)), df)
      }
    }
  }

  test("random tables round-trip through sniffed ';' delimiter (5 draws)") {
    // written with an explicit odd delimiter, read back with NO options:
    // the sniffer must recover both delimiter and header
    val rnd = new scala.util.Random(4711)
    for (_ <- 1 to 5) {
      val df = randomTable(rnd)
      val p = s"${tmpDir()}/t.csv"
      QuackIO.writeTable(df, p, WriteOptions(delim = Some(";")))
      assertSameRows(QuackIO.readCsv(spark, Seq(p)), df)
    }
  }

  test("native expressions equal their composable twins on random unicode " +
    "corpora (property form of the twin pins, 3 seeded draws)") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, TextAnalysis}
    import spark.implicits._
    // vocabulary mixes ASCII, accents, CJK, an astral-plane emoji
    // (surrogate pair), stopwords, and an empty-ish token shape
    val vocab = Vector("the", "a", "of", "data", "café", "naïve", "東京",
      "x", "😀ok", "word1", "zz", "Straße")
    val rnd = new scala.util.Random(20260813)
    for (draw <- 1 to 3) {
      val docs = (1L to 25L).map { i =>
        val n = rnd.nextInt(30) // 0..29 tokens — includes sub-shingle docs
        val sep = if (rnd.nextBoolean()) " " else "  \t "
        (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(sep))
      }.toDF("doc_id", "text")

      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.toSeq).sortBy(_.mkString("|")).toSeq

      assert(rows(Dedup.simhash(docs, "doc_id", "text")) ==
        rows(Dedup.simhashViaVotes(docs, "doc_id", "text")),
        s"simhash twin diverged on draw $draw")
      assert(rows(Dedup.minhashSignatures(docs, "doc_id", "text", 8)) ==
        rows(Dedup.minhashSignaturesViaExplode(docs, "doc_id", "text", 8)),
        s"minhash twin diverged on draw $draw")
      val toks = docs.select($"doc_id",
        TextAnalysis.tokens($"text").as("toks"))
      assert(rows(toks.select($"doc_id", Dedup.shingles($"toks", 3))) ==
        rows(toks.select($"doc_id", Dedup.shinglesHof($"toks", 3))),
        s"shingles twin diverged on draw $draw")
      assert(rows(TextAnalysis.withCharEntropy(docs, "doc_id", "text")) ==
        rows(TextAnalysis.withCharEntropyViaExplode(docs, "doc_id", "text")),
        s"char-entropy twin diverged on draw $draw")
      assert(rows(toks.select($"doc_id",
          TextAnalysis.stopwordCount($"toks", TextAnalysis.EnStop))) ==
        rows(toks.select($"doc_id",
          TextAnalysis.stopwordCountHof($"toks", TextAnalysis.EnStop))),
        s"stopword twin diverged on draw $draw")
    }
  }
}
