package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.4 X3): brute-force cosine
  * top-k as the correctness baseline, and a sign-random-projection LSH
  * bucketing as the scale path.
  *
  * Scale posture: the brute-force path broadcasts only the (small) query
  * set against the corpus — a broadcast nested-loop join that scans the
  * corpus once, no shuffle of the big side. The LSH path reduces that scan
  * to an equi-join on bucket id (shuffle-on-bucket), which is the shape
  * that survives a 1000-executor corpus; plane projections are
  * MD5-derived constants so buckets are reproducible across engines.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double in
    * index order (deterministic fold — same order the oracle sums in). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each row of `queries` (small), the k
    * nearest `corpus` rows by cosine. Scores are rounded to 6 decimals
    * before ranking so ordering is reproducible; ties break on corpus id.
    * Returns (query_id, corpus_id, score, rank). */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    // norms are precomputed per side (n + m evaluations, not n × m)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("cn"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6)
          .as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random projection planes: plane p, dimension j
    * (1-based) gets component uint32(md5(p + "_" + j)[0,8)) / 2^32 - 0.5.
    * Returns (plane, j, r). `nPlanes` rows × `dim` — tiny; broadcast. */
  def planes(spark: org.apache.spark.sql.SparkSession, nPlanes: Int,
      dim: Int): DataFrame = {
    val p = spark.range(nPlanes).select(col("id").as("plane"))
    val j = spark.range(1, dim + 1).select(col("id").as("j"))
    p.crossJoin(j).select(col("plane"), col("j"),
      (conv(substring(md5(concat(col("plane").cast("string"), lit("_"),
        col("j").cast("string"))), 1, 8), 16, 10).cast("double")
        / lit(4294967296.0) - 0.5).as("r"))
  }

  /** Sign-LSH bucket id per vector: bit p of the bucket = 1 iff
    * dot(vec, plane_p) > 0. Returns input plus a `bucket` long column. */
  def lshBuckets(df: DataFrame, idCol: String, vecCol: String,
      planesDf: DataFrame, nPlanes: Int): DataFrame = {
    val comp = df.select(col(idCol).as("vid"), posexplode(col(vecCol))
        .as(Seq("pos", "x")))
      .withColumn("j", col("pos") + 1).drop("pos")
    val dots = comp.join(broadcast(planesDf), "j")
      .groupBy("vid", "plane")
      .agg(sum(col("x").cast("double") * col("r")).as("d"))
    val buckets = dots.groupBy("vid")
      .agg(sum(when(col("d") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(plane AS INT))"))
        .otherwise(0L)).as("bucket"))
    df.join(buckets, df(idCol) === buckets("vid")).drop("vid")
  }

  /** Approximate top-k: only corpus vectors sharing the query's LSH bucket
    * are scored. Returns (query_id, corpus_id, score, rank). */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 8): DataFrame = {
    val spark = queries.sparkSession
    val dim = 64 // embeddings fixture dimension; parameterize when needed
    val pl = planes(spark, nPlanes, dim)
    val qb = lshBuckets(queries, idCol, vecCol, pl, nPlanes)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket"))
    val cb = lshBuckets(corpus, idCol, vecCol, pl, nPlanes)
      .select(col(idCol).as("corpus_id"), col(vecCol).as("cv"), col("bucket"))
    val scored = qb.join(cb, "bucket")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        round(cosine(col("qv"), col("cv")), 6).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("corpus_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** X2 embedding near-dup: all pairs above a cosine threshold within a
    * (pre-bucketed or subset) DataFrame. Pairs are emitted once (a < b). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6)
          .as("score"))
      .filter(col("score") >= threshold)
  }
}
