package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** SURVEY.md §5's property-form round-trip law, the ScalaCheck upgrade
  * of the seeded-example [[RoundTripPropertySpec]]: RANDOM schemas —
  * nullable mixes, unicode / quote / backslash / delimiter-bearing
  * column names — and random values (empty strings vs nulls, full-range
  * longs, -0.0, NaN where the format stores it) survive
  * `writeTable ∘ read = id` per format, modulo each format's DOCUMENTED
  * ambiguity:
  *
  *  - parquet / ORC: exact — schema and values bit-preserved
  *    (IntegerType stays 32-bit, NaN and ±Inf round-trip);
  *  - JSON (NDJSON): exact modulo integer width — the reader infers
  *    LongType for every integral column, so the generator emits longs
  *    (the write side records no width; reference analog: DuckDB
  *    read_json's BIGINT inference);
  *  - CSV: exact modulo the two ambiguities the example specs document
  *    — empty string vs NULL collapse (both render as an empty cell,
  *    read back as NULL), and integer width (inference + the
  *    `widenIntegers` default reads every integral column as BIGINT).
  *
  * Draw counts are deliberately modest (each draw is a real Spark
  * write + read + collect); the seed is FIXED so a failure reproduces —
  * bump `Draws` locally when fuzzing for new corners.
  *
  * Reference analog: `test/runtests.jl:18,40,44` round-trips one
  * hand-built table per format; this suite draws ~15 random tables per
  * format including the adversarial corners those examples cannot
  * enumerate. */
class RoundTripLawsSpec extends TestBase {

  private val Draws = 15

  // ---------------------------------------------------------------- gens

  /** Column names: plain identifiers plus the adversarial pool —
    * unicode, embedded quotes, backslashes, the CSV delimiter, spaces,
    * dots. Distinct case-insensitively (Spark resolution is
    * case-insensitive by default). */
  private val adversarialNames = Seq(
    "naïve col", "値列", "a\"quote", "back\\slash", "com,ma",
    "semi;colon", "spaced name", "ΣΩµ", "quote'single", "dot.ted",
    "dash-ed", "ünïcodé")

  private val nameGen: Gen[String] = Gen.frequency(
    2 -> Gen.identifier.map(s => "c" + s.take(7)),
    3 -> Gen.oneOf(adversarialNames))

  private def namesGen(n: Int): Gen[List[String]] =
    Gen.listOfN(n, nameGen).retryUntil(
      ns => ns.map(_.toLowerCase).distinct.size == n, 100)

  /** Value pools. Strings draw from ASCII-with-specials, accented
    * latin, CJK, and an embedded-quote/backslash set; `allowNewline`
    * is off for CSV (single-line records by default — multiLine is its
    * own spec'd option, not part of this law). */
  private def stringGen(allowNewline: Boolean): Gen[String] = {
    val ch: Gen[Char] = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(" \",\\;|'`~!@#$%^&*(){}[]<>=+-_/?.:".toList),
      2 -> Gen.oneOf("àéîõüßçñΔλπ漢字測試русский한국".toList),
      1 -> (if (allowNewline) Gen.oneOf('\n', '\t', '\r')
            else Gen.const('\t')))
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, ch).map(_.mkString))
  }

  private val longGen: Gen[Long] = Gen.frequency(
    3 -> Gen.chooseNum(Long.MinValue + 1, Long.MaxValue),
    2 -> Gen.chooseNum(-1000L, 1000L),
    1 -> Gen.oneOf(0L, -1L, Long.MaxValue, Long.MinValue + 1))

  private def doubleGen(allowNonFinite: Boolean): Gen[Double] = {
    val finite = Gen.frequency(
      3 -> Gen.chooseNum(-1e12, 1e12),
      1 -> Gen.oneOf(0.0, -0.0, 1e-300, -1e300, 1.7976931348623157e308,
        java.lang.Double.MIN_VALUE))
    if (allowNonFinite) Gen.frequency(5 -> finite,
      1 -> Gen.oneOf(Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity))
    else finite
  }

  private case class TableCase(schema: StructType, rows: Seq[Row])

  /** `stringPrefix` keeps CSV/JSON string cells from masquerading as
    * numbers or booleans under schema INFERENCE (the law under
    * inference needs type-stable columns; cast-on-parse overrides have
    * their own O3 specs). `firstRowNonNull` pins inference's type
    * sample for CSV/JSON (an all-null column has no type evidence in
    * those formats — parquet/ORC carry it in the footer). */
  private def tableGen(types: Seq[DataType], allowNewline: Boolean,
      allowNonFinite: Boolean, stringPrefix: String,
      firstRowNonNull: Boolean): Gen[TableCase] = for {
    nCols <- Gen.chooseNum(1, 4)
    names <- namesGen(nCols)
    dts <- Gen.listOfN(nCols, Gen.oneOf(types))
    nulls <- Gen.listOfN(nCols, Gen.oneOf(true, false))
    nRows <- Gen.chooseNum(1, 10)
    cells <- Gen.sequence[List[List[Any]], List[Any]](
      (0 until nRows).toList.map { r =>
        Gen.sequence[List[Any], Any]((0 until nCols).toList.map { c =>
          val vg: Gen[Any] = dts(c) match {
            case LongType => longGen.map(x => x: Any)
            case IntegerType =>
              Gen.chooseNum(Int.MinValue, Int.MaxValue).map(x => x: Any)
            case DoubleType => doubleGen(allowNonFinite).map(x => x: Any)
            case BooleanType => Gen.oneOf(true, false).map(x => x: Any)
            case _ => stringGen(allowNewline).map(stringPrefix + _)
          }
          if (nulls(c) && !(firstRowNonNull && r == 0))
            Gen.frequency(3 -> vg, 1 -> Gen.const(null: Any))
          else vg
        })
      })
  } yield TableCase(
    StructType(names.zip(dts).zip(nulls).map { case ((n, t), nu) =>
      StructField(n, t, nullable = nu)
    }),
    cells.map(Row.fromSeq))

  // ------------------------------------------------------------- plumbing

  private def toDf(tc: TableCase): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(tc.rows: _*), tc.schema)

  /** Missing-aware multiset equality on (name, dataType) + cells —
    * assertSameRows' contract, returned as a Prop-friendly Either. */
  private def sameRows(expSchema: Seq[(String, DataType)],
      exp: Seq[Seq[Any]], got: DataFrame): Option[String] = {
    val gotSchema = got.schema.fields.map(f => (f.name, f.dataType)).toSeq
    if (gotSchema != expSchema)
      return Some(s"schema: expected $expSchema got $gotSchema")
    val key = (r: Seq[Any]) => r.map(String.valueOf(_)).mkString("")
    val ra = exp.sortBy(key)
    val rb = got.collect().map(_.toSeq).toSeq.sortBy(key)
    val eq = ra.length == rb.length && ra.zip(rb).forall { case (x, y) =>
      x.length == y.length && x.zip(y).forall(p => cellEq(p._1, p._2))
    }
    if (!eq) Some(s"rows: expected $ra got $rb") else None
  }

  /** EXACT cell equality: Scala's boxed `==` uses cooperative numeric
    * comparison, under which NaN != NaN — a written NaN that reads
    * back as NaN must PASS this law, while -0.0 reading back as 0.0
    * must FAIL it, so doubles compare via the total order
    * (`Double.compare`: NaN == NaN, -0.0 != 0.0). */
  private def cellEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.compare(x, y) == 0
    case (x, y) => x == y
  }

  /** Canonical column order for formats whose records carry none:
    * NDJSON objects are unordered by spec and Spark's inference
    * name-sorts the result, so the law compares both sides under the
    * same name-sort. */
  private def nameSorted(schema: Seq[(String, DataType)],
      rows: Seq[Seq[Any]]): (Seq[(String, DataType)], Seq[Seq[Any]]) = {
    val perm = schema.zipWithIndex.sortBy(_._1._1).map(_._2)
    (perm.map(schema), rows.map(r => perm.map(r)))
  }

  private def check(name: String, gen: Gen[TableCase])(
      law: (TableCase, String) => Option[String]): Unit = {
    val prop = Prop.forAll(gen) { tc =>
      val dir = tmpDir()
      val err = law(tc, dir.toString)
      err.foreach(e => fail(s"round-trip violation for " +
        s"schema=${tc.schema.simpleString} rows=${tc.rows}: $e"))
      err.isEmpty
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(Draws)
        .withInitialSeed(Seed(0xC0FFEE + name.hashCode.toLong)),
      prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // ------------------------------------------------------------ the laws

  test("property: random tables round-trip EXACTLY through parquet " +
      s"($Draws draws: unicode/quote/delimiter names, int32 width, " +
      "NaN/±Inf, -0.0, nulls)") {
    check("parquet", tableGen(
      Seq(LongType, IntegerType, DoubleType, BooleanType, StringType),
      allowNewline = true, allowNonFinite = true, stringPrefix = "",
      firstRowNonNull = false)) { (tc, dir) =>
      val p = s"$dir/t.parquet"
      QuackIO.writeTable(toDf(tc), p)
      sameRows(tc.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        tc.rows.map(_.toSeq), QuackIO.readParquet(spark, Seq(p)))
    }
  }

  test("property: random tables round-trip EXACTLY through ORC " +
      s"($Draws draws)") {
    check("orc", tableGen(
      Seq(LongType, IntegerType, DoubleType, BooleanType, StringType),
      allowNewline = true, allowNonFinite = true, stringPrefix = "",
      firstRowNonNull = false)) { (tc, dir) =>
      val p = s"$dir/t.orc"
      QuackIO.writeTable(toDf(tc), p)
      sameRows(tc.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        tc.rows.map(_.toSeq), QuackIO.readOrc(spark, Seq(p)))
    }
  }

  test("property: random tables round-trip through NDJSON " +
      s"($Draws draws; integral columns emitted as long — the " +
      "documented inference width)") {
    check("json", tableGen(
      Seq(LongType, DoubleType, BooleanType, StringType),
      allowNewline = true, allowNonFinite = false, stringPrefix = "s",
      firstRowNonNull = true)) { (tc, dir) =>
      val p = s"$dir/t.json"
      QuackIO.writeTable(toDf(tc), p)
      // NDJSON objects carry no column order (the reader's inferred
      // schema is name-sorted) — compare both sides under name-sort
      val (schemaSorted, rowsSorted) = nameSorted(
        tc.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        tc.rows.map(_.toSeq))
      sameRows(schemaSorted, rowsSorted, QuackIO.readJson(spark, Seq(p)))
    }
  }

  test("property: random tables round-trip through CSV modulo the " +
      s"documented ambiguities ($Draws draws; empty string reads back " +
      "as NULL, integral width widens to long)") {
    check("csv", tableGen(
      Seq(LongType, DoubleType, BooleanType, StringType),
      allowNewline = false, allowNonFinite = false, stringPrefix = "s",
      firstRowNonNull = true)) { (tc, dir) =>
      val p = s"$dir/t.csv"
      QuackIO.writeTable(toDf(tc), p)
      // the documented CSV collapses: an empty-string cell renders
      // identically to NULL and reads back as NULL, and a SINGLE-column
      // row whose one cell is NULL/empty renders as a blank line —
      // indistinguishable from no row at all, so the reader drops it
      val expRows = tc.rows.map(_.toSeq.map {
        case "" => null
        case v => v
      }).filterNot(r => r.length == 1 && r.head == null)
      sameRows(tc.schema.fields.map(f => (f.name, f.dataType)).toSeq,
        expRows,
        QuackIO.readCsv(spark, Seq(p),
          ReadOptions(delim = Some(","), header = Some(true))))
    }
  }
}
