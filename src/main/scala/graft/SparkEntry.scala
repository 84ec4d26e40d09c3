package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The real implementation lives in [[QuackIO]] (reference API surface),
  * [[graft.operators]] (dedup / similarity / text / multimodal), and the
  * [[Queries]]/[[OpsQueries]] catalog (Spark plan + DuckDB oracle pairs).
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1-style pricing summary) on sf=0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.catalog.toMap.apply("q05_agg_pricing")
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.catalog.map { case (name, e) => name -> e.fn }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.catalog.collect { case (name, Queries.Entry(_, Some(sql))) =>
      name -> sql
    }.toMap
}
