package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The engine's named query catalog.
  *
  * Each entry pairs a Spark plan (the implementation under test) with the
  * exact SQL the driver replays in DuckDB over the same parquet tables
  * (`Verify.scala` contract). Conventions that make the hash-compare
  * deterministic across engines:
  *
  *  - every result is fully ordered by its (non-floating) output columns,
  *    with `NULLS FIRST` pinned explicitly in the SQL (DuckDB defaults to
  *    NULLS LAST; Spark to NULLS FIRST);
  *  - double aggregations go through an exact decimal cast per row —
  *    `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)` — so the sum is
  *    order-independent and both engines produce the identical double
  *    (sums stay below 2^53 in scaled units at every test SF, so the final
  *    decimal→double conversion is exact-then-correctly-rounded in both);
  *  - averages divide two exact doubles rather than using engine AVG;
  *  - column aliases match between Spark and SQL (driver sorts by name).
  *
  * Query semantics follow SURVEY.md §2: Q1/Q2 + L2-L9 are the reference's
  * own surface (`/root/reference/src/QuackIO.jl:70,79-97`,
  * `ext/SQLCollectionsExt.jl`, README lazy pipeline); the join/window/rollup
  * entries extend it to a complete analytics engine per the driver mandate.
  */
object Queries {

  final case class Entry(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table, with `ts` normalized to int64 epoch NANOS — the
    * representation every downstream query (hourly buckets, sessionize,
    * as-of) does exact integer arithmetic on. Three physical layouts:
    * TIMESTAMP(NANOS) parquet — handled ONLY when the engine surfaces
    * the column as a raw int64 (Spark 4.1 removed the
    * `nanosAsLong` conf, so a nanos column otherwise fails at schema
    * resolution before reaching this branch; re-encode such inputs to
    * µs upstream), µs TIMESTAMP_NTZ (current fixtures) — converted by
    * a zone-INDEPENDENT `timestampdiff` against the NTZ epoch, exactly
    * the wall-clock-as-UTC reading DuckDB's `epoch_ns` applies, on ANY
    * session timezone — and µs TIMESTAMP (an instant; `unix_micros` is
    * zone-independent by definition). All conversions are exact for µs
    * sources (`· 1000`). */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _: TimestampNTZType => raw.withColumn("ts",
        expr("timestampdiff(MICROSECOND, " +
          "TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)") * 1000L)
      case _ => raw.withColumn("ts", unix_micros(col("ts")) * 1000L)
    }
  }

  private val d2 = DecimalType(18, 2)
  private val d4 = DecimalType(18, 4)

  /** Order-independent exact sum of a double column: per-row decimal cast,
    * decimal sum, cast back. `scale` 2 for raw columns, 4 for products. */
  private def dsum(c: Column, dt: DecimalType = d2): Column =
    sum(c.cast(dt)).cast("double")

  private def davg(c: Column, dt: DecimalType = d2): Column =
    sum(c.cast(dt)).cast("double") / count(lit(1)).cast("double")

  // SQL-side twins of dsum/davg.
  private def S(col: String, s: Int = 2) =
    s"CAST(SUM(CAST($col AS DECIMAL(18,$s))) AS DOUBLE)"
  private def A(col: String, s: Int = 2) =
    s"${S(col, s)} / CAST(COUNT(*) AS DOUBLE)"

  // Exact-decimal revenue/charge terms. The factors have ≤2 true decimals,
  // so each is cast to decimal FIRST and the multiplication happens in
  // decimal arithmetic — a double product cast to decimal would round a
  // 6-decimal value at scale 4, landing on .xx50 ties where Spark
  // (BigDecimal HALF_UP) and DuckDB (double-multiply-then-round) disagree.
  private val d8_2 = DecimalType(8, 2)
  private def discPrice: Column =
    col("l_extendedprice").cast(d2) *
      (lit(1.0) - col("l_discount")).cast(d8_2)
  private def charge: Column =
    discPrice * (lit(1.0) + col("l_tax")).cast(d8_2)
  private val DiscPriceSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(8,2))"
  private val ChargeSql =
    s"$DiscPriceSql * CAST(1.0 + l_tax AS DECIMAL(8,2))"

  val core: Seq[(String, Entry)] = Seq(

    // ----- Q1+Q2+L4: projection + rename + limit (reference eager kwargs)
    "q01_select_rename_limit" -> Entry(
      (s, dir) =>
        QuackIO.readParquet(s, Seq(s"$dir/lineitem.parquet"),
            ReadOptions(select = Seq(Sel("l_orderkey", Some("ok")),
              Sel("l_linenumber", Some("ln")), Sel("l_quantity", Some("qty")))))
          // (ok, ln) is NOT unique in the fixture data — qty completes the
          // sort key so the LIMIT cut is deterministic in both engines
          .orderBy("ok", "ln", "qty").limit(100),
      Some("""SELECT l_orderkey AS ok, l_linenumber AS ln, l_quantity AS qty
             |FROM lineitem ORDER BY ok, ln, qty LIMIT 100""".stripMargin)),

    // ----- L2: predicate pushdown (reference lazy filter, startswith)
    "q02_filter_prefix" -> Entry(
      (s, dir) => t(s, dir, "customer")
        .filter(col("c_mktsegment").startsWith("B"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE c_mktsegment LIKE 'B%' ORDER BY c_custkey""".stripMargin)),

    // ----- L5: count with predicate
    "q03_count_where" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05)
        .agg(count(lit(1)).as("n")),
      Some("SELECT COUNT(*) AS n FROM lineitem WHERE l_discount > 0.05")),

    // ----- L6: group-by count (reference group_vg + length)
    "q04_group_count" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("flag"),
      Some("""SELECT l_returnflag AS flag, COUNT(*) AS cnt FROM lineitem
             |GROUP BY 1 ORDER BY flag""".stripMargin)),

    // ----- flagship TPC-H Q1-style pricing summary
    "q05_agg_pricing" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag").as("flag"),
          col("l_linestatus").as("status"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(discPrice).cast("double").as("sum_disc_price"),
          sum(charge).cast("double").as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount"), d4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("flag", "status"),
      Some(s"""SELECT l_returnflag AS flag, l_linestatus AS status,
              |${S("l_quantity")} AS sum_qty,
              |${S("l_extendedprice")} AS sum_base_price,
              |CAST(SUM($DiscPriceSql) AS DOUBLE) AS sum_disc_price,
              |CAST(SUM($ChargeSql) AS DOUBLE) AS sum_charge,
              |${A("l_quantity")} AS avg_qty,
              |${A("l_extendedprice")} AS avg_price,
              |${A("l_discount", 4)} AS avg_disc,
              |COUNT(*) AS count_order
              |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
              |GROUP BY 1, 2 ORDER BY flag, status""".stripMargin)),

    // ----- distinct
    "q06_distinct" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority"))
        .distinct()
        .orderBy("status", "priority"),
      Some("""SELECT DISTINCT o_orderstatus AS status,
             |o_orderpriority AS priority FROM orders
             |ORDER BY status, priority""".stripMargin)),

    // ----- S5/L8: multi-path scan unions rows (same file twice)
    "q07_union_multifile" -> Entry(
      (s, dir) => {
        val p = s"$dir/lineitem.parquet"
        QuackIO.readParquet(s, Seq(p, p))
          .groupBy(col("l_returnflag").as("flag"))
          .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("flag")
      },
      Some(s"""SELECT l_returnflag AS flag, COUNT(*) AS cnt,
              |${S("l_quantity")} AS sum_qty
              |FROM (SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem)
              |GROUP BY 1 ORDER BY flag""".stripMargin)),

    // ----- top-k by sort (TakeOrderedAndProject physical op)
    "q08_topk_orders" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ----- broadcast-hash join with a small dimension
    "q09_join_broadcast" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).as("nitems"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("brand"),
      Some(s"""SELECT p_brand AS brand, COUNT(*) AS nitems,
              |${S("l_quantity")} AS sum_qty
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |GROUP BY 1 ORDER BY brand""".stripMargin)),

    // ----- fact-to-fact join (shuffle join at scale; AQE decides locally)
    "q10_join_agg" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(sum(discPrice).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("priority"),
      Some(s"""SELECT o_orderpriority AS priority,
              |CAST(SUM($DiscPriceSql) AS DOUBLE) AS revenue,
              |COUNT(*) AS n
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY 1 ORDER BY priority""".stripMargin)),

    // ----- star-schema join: two broadcast dims + fact-to-fact
    "q11_star_join" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(dsum(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n_orders"))
        .orderBy("region", "nation"),
      Some(s"""SELECT r_name AS region, n_name AS nation,
              |${S("o_totalprice")} AS sum_price, COUNT(*) AS n_orders
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY 1, 2 ORDER BY region, nation""".stripMargin)),

    // ----- left-semi join (EXISTS)
    "q12_semi_join" -> Entry(
      (s, dir) => {
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        t(s, dir, "customer")
          .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n_cust"))
          .orderBy("segment")
      },
      Some("""SELECT c_mktsegment AS segment, COUNT(*) AS n_cust
             |FROM customer WHERE EXISTS (
             |  SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
             |GROUP BY 1 ORDER BY segment""".stripMargin)),

    // ----- left-anti join (NOT EXISTS)
    "q13_anti_join" -> Entry(
      (s, dir) => {
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        t(s, dir, "customer")
          .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey").as("nationkey"))
          .agg(count(lit(1)).as("n_cust"))
          .orderBy("nationkey")
      },
      Some("""SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
             |FROM customer WHERE NOT EXISTS (
             |  SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
             |GROUP BY 1 ORDER BY nationkey""".stripMargin)),

    // ----- left-outer join: unmatched rows survive with nulls, and the
    // aggregation is null-aware (COUNT(col) skips the miss rows)
    "q35_left_outer_join" -> Entry(
      (s, dir) => {
        val big = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        t(s, dir, "customer")
          .join(big, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("o_orderkey")).as("n_matched"),
            dsum(coalesce(col("o_totalprice"), lit(0.0))).as("sum_price"))
          .orderBy("segment")
      },
      Some(s"""SELECT c_mktsegment AS segment, COUNT(*) AS n_rows,
              |COUNT(o_orderkey) AS n_matched,
              |${S("COALESCE(o_totalprice, 0)")} AS sum_price
              |FROM customer LEFT JOIN
              |  (SELECT * FROM orders WHERE o_totalprice > 450000) o
              |  ON c_custkey = o_custkey
              |GROUP BY 1 ORDER BY segment""".stripMargin)),

    // ----- full-outer join: rare subsets on each side so BOTH null
    // directions appear; keys coalesce across sides
    "q36_full_outer_join" -> Entry(
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_acctbal") < -900)
          .groupBy(col("c_nationkey").as("c_nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = t(s, dir, "supplier").filter(col("s_acctbal") > 9000)
          .groupBy(col("s_nationkey").as("s_nk"))
          .agg(count(lit(1)).as("n_supp"))
        c.join(sup, col("c_nk") === col("s_nk"), "full_outer")
          .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
            col("n_cust"), col("n_supp"))
          .orderBy("nationkey")
      },
      Some("""SELECT COALESCE(c_nk, s_nk) AS nationkey, n_cust, n_supp
             |FROM (SELECT c_nationkey AS c_nk, COUNT(*) AS n_cust
             |      FROM customer WHERE c_acctbal < -900 GROUP BY 1) c
             |FULL JOIN (SELECT s_nationkey AS s_nk, COUNT(*) AS n_supp
             |      FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) s
             |  ON c_nk = s_nk
             |ORDER BY nationkey""".stripMargin)),

    // ----- null-heavy aggregation: NULL group key (nulls group together
    // in both engines), null-skipping COUNT/SUM/MIN, and an all-null-group
    // guard — the testdata has no natural nulls, so they are synthesized
    // with NULLIF/CASE
    "q37_null_agg" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .select(
          nullif(col("l_returnflag"), lit("N")).as("flagkey"),
          when(col("l_discount") >= 0.03, col("l_quantity")).as("qty_n"))
        .groupBy("flagkey")
        .agg(count(lit(1)).as("n_rows"), count(col("qty_n")).as("n_qty"),
          dsum(col("qty_n")).as("sum_qty"),
          min(col("qty_n")).as("min_qty"))
        .orderBy(asc_nulls_first("flagkey")),
      Some(s"""SELECT NULLIF(l_returnflag, 'N') AS flagkey,
              |COUNT(*) AS n_rows, COUNT(qty_n) AS n_qty,
              |${S("qty_n")} AS sum_qty, MIN(qty_n) AS min_qty
              |FROM (SELECT l_returnflag,
              |  CASE WHEN l_discount >= 0.03 THEN l_quantity END AS qty_n
              |  FROM lineitem)
              |GROUP BY 1 ORDER BY flagkey NULLS FIRST""".stripMargin)),

    // ----- exact percentiles (linear interpolation — Spark `percentile`
    // and DuckDB `quantile_cont` share the definition; 6-decimal round
    // absorbs any interpolation-arithmetic ulp)
    "q47_percentiles" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("med"),
          round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("priority"),
      Some("""SELECT o_orderpriority AS priority,
             |round(quantile_cont(o_totalprice, 0.5), 6) AS med,
             |round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
             |COUNT(*) AS n
             |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin)),

    // ----- window: top-3 orders per customer
    "q14_window_topk" -> Entry(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey").as("custkey"),
            col("o_orderkey").as("orderkey"),
            // long, matching the oracle's BIGINT ROW_NUMBER exactly (the
            // driver's compare tolerates int32-vs-int64, but exact types
            // keep any stricter differ green too)
            col("rn").cast("long").as("rn"))
          .orderBy("custkey", "rn")
      },
      Some("""SELECT o_custkey AS custkey, o_orderkey AS orderkey, rn
             |FROM (SELECT o_custkey, o_orderkey, ROW_NUMBER() OVER (
             |  PARTITION BY o_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
             |WHERE rn <= 3 ORDER BY custkey, rn""".stripMargin)),

    // ----- window: running sum (exact decimal frame sum)
    "q15_window_running" -> Entry(
      (s, dir) => {
        // (l_orderkey, l_linenumber) is not unique in the fixture data:
        // l_quantity joins the frame ordering so the running sum is
        // deterministic, and the output ordering includes running_qty so
        // tied rows land in the same sequence in both engines
        val w = Window.partitionBy("l_orderkey")
          .orderBy("l_linenumber", "l_quantity")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 97 === 0)
          .select(col("l_orderkey").as("orderkey"),
            col("l_linenumber").as("ln"),
            sum(col("l_quantity").cast(d2)).over(w).cast("double")
              .as("running_qty"))
          .orderBy("orderkey", "ln", "running_qty")
      },
      Some("""SELECT l_orderkey AS orderkey, l_linenumber AS ln,
             |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             |  PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             |  AS running_qty
             |FROM lineitem WHERE l_orderkey % 97 = 0
             |ORDER BY orderkey, ln, running_qty""".stripMargin)),

    // ----- rollup (grouping sets); NULLS FIRST pinned for subtotal rows
    "q16_rollup" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .rollup(col("l_returnflag").as("flag"),
          col("l_linestatus").as("status"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("flag"), asc_nulls_first("status")),
      Some(s"""SELECT l_returnflag AS flag, l_linestatus AS status,
              |COUNT(*) AS cnt, ${S("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY ROLLUP (1, 2)
              |ORDER BY flag NULLS FIRST, status NULLS FIRST""".stripMargin)),

    // ----- CUBE grouping sets (all 4 combinations incl. both-null total)
    "q53_cube" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .cube(col("l_returnflag").as("flag"),
          col("l_linestatus").as("status"))
        .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("flag"), asc_nulls_first("status")),
      Some(s"""SELECT l_returnflag AS flag, l_linestatus AS status,
              |COUNT(*) AS cnt, ${S("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY CUBE (1, 2)
              |ORDER BY flag NULLS FIRST, status NULLS FIRST""".stripMargin)),

    // ----- date part extraction + aggregation
    "q17_date_agg" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("yr"),
      Some(s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
              |COUNT(*) AS n, ${S("o_totalprice")} AS sum_price
              |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin)),

    // ----- CASE WHEN bucketing
    "q18_case_buckets" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(when(col("l_discount") < 0.03, "low")
          .when(col("l_discount") < 0.07, "mid")
          .otherwise("high").as("bucket"))
        .agg(count(lit(1)).as("n"), davg(col("l_quantity")).as("avg_qty"))
        .orderBy("bucket"),
      Some(s"""SELECT CASE WHEN l_discount < 0.03 THEN 'low'
              |WHEN l_discount < 0.07 THEN 'mid' ELSE 'high' END AS bucket,
              |COUNT(*) AS n, ${A("l_quantity")} AS avg_qty
              |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ----- distinct aggregation
    "q19_count_distinct" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey"), col("l_partkey")).as("n_sp"),
          count(lit(1)).as("n_rows"))
        .orderBy("flag"),
      Some("""SELECT l_returnflag AS flag,
             |COUNT(DISTINCT l_partkey) AS n_parts,
             |COUNT(DISTINCT (l_suppkey, l_partkey)) AS n_sp,
             |COUNT(*) AS n_rows
             |FROM lineitem GROUP BY 1 ORDER BY flag""".stripMargin)),

    // ----- set operations: INTERSECT / EXCEPT between two key sets
    "q19_setops" -> Entry(
      (s, dir) => {
        val before = t(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey"))
        val after = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
          .select(col("o_custkey"))
        val both = before.intersect(after).agg(count(lit(1)).as("n"))
          .select(lit("both").as("grp"), col("n"))
        val onlyBefore = before.except(after).agg(count(lit(1)).as("n"))
          .select(lit("only_before").as("grp"), col("n"))
        both.union(onlyBefore).orderBy("grp")
      },
      Some("""WITH b AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
             |a AS (SELECT o_custkey FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
             |SELECT 'both' AS grp, COUNT(*) AS n
             |  FROM (SELECT * FROM b INTERSECT SELECT * FROM a)
             |UNION ALL
             |SELECT 'only_before' AS grp, COUNT(*) AS n
             |  FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
             |ORDER BY grp""".stripMargin)),

    // ----- skew path: two-phase salted aggregation. The result is
    // identical to a plain groupBy (the oracle proves it); the plan shape
    // is the one that survives a hot key at cluster scale — partial
    // aggregation on (key, salt) spreads a skewed key over all
    // executors before the narrow final combine.
    "q32_salted_agg" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .withColumn("salt", col("l_orderkey") % 16)
        .groupBy(col("l_returnflag").as("flag"), col("salt"))
        .agg(count(lit(1)).as("pc"), dsum(col("l_quantity")).as("ps"))
        .groupBy("flag")
        .agg(sum(col("pc")).as("cnt"),
          sum(col("ps").cast(d2)).cast("double").as("sum_qty"))
        .orderBy("flag"),
      Some(s"""SELECT l_returnflag AS flag, COUNT(*) AS cnt,
              |${S("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY 1 ORDER BY flag""".stripMargin)),

    // ----- events: hourly tumbling aggregation over int64 nanos.
    // hour_idx uses FLOOR division to match DuckDB's `//` for pre-1970
    // (negative) timestamps: ts - pmod(ts, h) is always the largest
    // multiple of h ≤ ts, and the final `div` is exact (never routed
    // through double — epoch nanos exceed 2^53).
    "q50_events_hourly" -> Entry(
      (s, dir) => {
        events(s, dir)
          .groupBy(
            expr("(ts - pmod(ts, 3600000000000)) div 3600000000000")
              .as("hour_idx"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value"), d4).as("sum_value"))
          .orderBy("hour_idx", "event_type")
      },
      Some(s"""SELECT epoch_ns(ts) // 3600000000000 AS hour_idx, event_type,
              |COUNT(*) AS n, ${S("value", 4)} AS sum_value
              |FROM events GROUP BY 1, 2
              |ORDER BY hour_idx, event_type""".stripMargin)),

    // ----- events: gap-based sessionization (30-minute inactivity window)
    "q51_events_sessionize" -> Entry(
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        events(s, dir)
          .withColumn("prev_ts", lag("ts", 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts") - col("prev_ts") > 1800000000000L, 1L).otherwise(0L))
          .groupBy("user_id")
          .agg(sum("new_session").as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
             |COUNT(*) AS n_events FROM (
             |  SELECT user_id, CASE WHEN prev_ts IS NULL
             |    OR epoch_ns(ts) - epoch_ns(prev_ts) > 1800000000000
             |    THEN 1 ELSE 0 END AS new_session
             |  FROM (SELECT user_id, ts, event_id, LAG(ts) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |    FROM events))
             |GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // ----- pivot: long → wide aggregation ----------------------------------
    // Explicit pivot values keep the output schema static (one pass, no
    // value-discovery job) — at 100 TB the implicit form's distinct-scan
    // is a full extra read of the fact table.
    "q69_pivot" -> Entry(
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .withColumnsRenamed(Map(
          "F" -> "f_total", "O" -> "o_total", "P" -> "p_total"))
        .orderBy("priority"),
      Some(s"""SELECT o_orderpriority AS priority,
              |${pivotCell("F", "f_total")},
              |${pivotCell("O", "o_total")},
              |${pivotCell("P", "p_total")}
              |FROM orders GROUP BY 1 ORDER BY priority""".stripMargin)),

    // ----- unpivot/melt: wide → long ---------------------------------------
    "q70_unpivot" -> Entry(
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(dsum(col("l_quantity")).as("qty"),
          dsum(col("l_extendedprice")).as("price"),
          dsum(col("l_discount")).as("disc"))
        .unpivot(Array(col("flag")),
          Array(col("qty"), col("price"), col("disc")),
          "measure", "value")
        .orderBy("flag", "measure"),
      Some(s"""WITH w AS (SELECT l_returnflag AS flag,
              |    ${S("l_quantity")} AS qty,
              |    ${S("l_extendedprice")} AS price,
              |    ${S("l_discount")} AS disc
              |  FROM lineitem GROUP BY 1)
              |SELECT flag, measure, value FROM (
              |  SELECT flag, 'qty' AS measure, qty AS value FROM w
              |  UNION ALL SELECT flag, 'price', price FROM w
              |  UNION ALL SELECT flag, 'disc', disc FROM w)
              |ORDER BY flag, measure""".stripMargin))
  )

  /** SQL twin of one pivot cell: a filtered decimal-exact sum. */
  private def pivotCell(status: String, alias: String): String =
    s"""CAST(SUM(CASE WHEN o_orderstatus = '$status'
       |  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
       |  AS $alias""".stripMargin

  /** Full catalog: core relational + LLM-pipeline operators. */
  def catalog: Seq[(String, Entry)] = core ++ OpsQueries.catalog
}
