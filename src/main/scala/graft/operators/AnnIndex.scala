package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted PQ index (SURVEY §2.4 X3, the operational half of the ANN
  * story): build ONCE — train codebooks on the corpus, encode every
  * vector, write the codes and codebooks as parquet — then serve any
  * number of query batches from the codes alone.
  *
  * Scale rationale: the codes table is ~`dim·4 / m` times smaller than
  * the raw vectors (64 floats → 4 ints here), so the serving scan reads
  * a few bytes per corpus row and typically stays in page cache where
  * the vector table never could. Codebooks round-trip through parquet
  * (doubles are bit-exact), so a query served from the persisted index
  * returns EXACTLY what [[Similarity.pqTopK]] on the live corpus would.
  *
  * Layout under `dir`:
  *  - `codes/`      (corpus_id, code0..code{m-1}) — partition/bucket by
  *    corpus_id like any fact table
  *  - `codebooks/`  (m, k, j, c) — KB-sized, one row per component
  */
object AnnIndex {

  /** Train (Lloyd `iters`) + encode + persist. Returns the trained
    * codebooks for immediate use. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      m: Int = 4, k: Int = 16, subDim: Int = 16, iters: Int = 2)
      : Array[Array[Array[Double]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val trained = Similarity.pqTrain(corpus, idCol, vecCol,
      Similarity.pqCodebooks(m, k, subDim), iters)
    guardedEncode(corpus, idCol, vecCol, trained, "build")
      .withColumnRenamed("id", "corpus_id")
      .write.mode("overwrite").parquet(s"$dir/codes")
    val rows = for {
      mi <- trained.indices
      ki <- trained(mi).indices
      j <- trained(mi)(ki).indices
    } yield (mi, ki, j, trained(mi)(ki)(j))
    rows.toDF("m", "k", "j", "c").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    trained
  }

  /** Load the codebooks (driver-side KB read) + the lazy codes scan. */
  def load(spark: SparkSession, dir: String)
      : (DataFrame, Array[Array[Array[Double]]]) = {
    val cbs = cbsOf(spark.read.parquet(s"$dir/codebooks"))
    (spark.read.parquet(s"$dir/codes"), cbs)
  }

  /** Incremental index maintenance: encode a new vector batch with the
    * index's EXISTING codebooks and append its codes — the steady-state
    * ingest move (each crawl batch lands in the index without touching
    * the accumulated corpus; compose with [[Dedup.dedupAgainst]] /
    * [[Dedup.dedupAgainstBloom]] upstream so duplicate ids never reach
    * the index, which — like any fact-table append — does not dedup).
    *
    * No retraining: a query over the appended index is bit-identical to
    * [[Similarity.pqTopK]] over the UNION corpus under the same
    * codebooks (spec-pinned). The trade is quantization drift — if the
    * batch's distribution has moved from what the codebooks were
    * trained on, its ADC error grows silently; monitor with
    * [[Similarity.pqQuantizationError]] on the batch and rebuild when
    * it departs from the build-time figure. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit = {
    val cbs = cbsOf(spark.read.parquet(s"$dir/codebooks"))
    guardedEncode(batch, idCol, vecCol, cbs, "append")
      .withColumnRenamed("id", "corpus_id")
      .write.mode("append").parquet(s"$dir/codes")
  }

  /** Encode, failing LOUDLY on null codes: PqDists (and therefore
    * pqEncode) nulls out a vector shorter than m·subDim, and adcTopK's
    * ascending distance sort would rank a null-distance row FIRST — a
    * dim-drifted ingest batch written as null codes corrupts every
    * subsequent query's top-k until a rebuild. The write job aborts on
    * the first such row instead. */
  private def guardedEncode(df: DataFrame, idCol: String, vecCol: String,
      cbs: Array[Array[Array[Double]]], op: String): DataFrame =
    Similarity.pqEncode(df, idCol, vecCol, cbs)
      .withColumn("code0",
        when(col("code0").isNull, raise_error(lit(
          s"AnnIndex.$op: batch contains a vector shorter than the " +
            "index's m*subDim — null codes would permanently corrupt " +
            "the index (they sort FIRST in every ADC top-k)")))
          .otherwise(col("code0")))

  /** Rebuild the in-memory codebook array from its (m, k, j, c) rows. */
  private def cbsOf(df: DataFrame): Array[Array[Array[Double]]] = {
    val raw = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getDouble(3))
      .toMap
    val m = raw.keys.map(_._1).max + 1
    val k = raw.keys.map(_._2).max + 1
    val subDim = raw.keys.map(_._3).max + 1
    Array.tabulate(m, k, subDim)((mi, ki, j) => raw((mi, ki, j)))
  }

  /** ADC top-k served from the persisted index: the corpus-side scan
    * reads CODES, never vectors. Bit-identical to
    * `Similarity.pqTopK(queries, corpus, ...)` under the same trained
    * codebooks — except self-pair exclusion, which defaults OFF here:
    * serving queries come from outside the corpus, so an id that
    * happens to collide with a corpus id must not silently drop that
    * corpus row from the results. Pass `excludeSelf = true` for
    * dedup-style calls where queries are corpus rows. */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val (codes, cbs) = load(spark, dir)
    Similarity.adcTopK(
      Similarity.pqQueryTables(queries, idCol, vecCol, cbs),
      codes, cbs.length, k, excludeSelf)
  }

  // ------------------------------------------------- IVF-structured index

  /** IVF-PQ index persisted as metastore tables under `name`: train
    * codebooks, assign every corpus vector to its nearest centroid,
    * encode, and write `(corpus_id, cluster, code0..)` BUCKETED on
    * `cluster` — so at serve time the cluster-size gate's window AND the
    * candidate equi-join both ride the bucket layout and the corpus side
    * never exchanges. At 100 TB that shuffle is the dominant serving
    * cost; bucketing pays it once at build. Centroids and codebooks
    * persist alongside (`<name>_centroids`, `<name>_codebooks` — both
    * KB-to-MB sized). Returns the trained codebooks. */
  def buildIvf(corpus: DataFrame, idCol: String, vecCol: String,
      name: String, centroids: DataFrame, centIdCol: String,
      centVecCol: String, m: Int = 4, k: Int = 16, subDim: Int = 16,
      iters: Int = 2, nBuckets: Int = 16): Array[Array[Array[Double]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val trained = Similarity.pqTrain(corpus, idCol, vecCol,
      Similarity.pqCodebooks(m, k, subDim), iters)
    val assigned = Similarity.ivfAssign(corpus, idCol, vecCol, centroids,
      centIdCol, centVecCol).select(col("id"), col("cluster"))
    val codes = assigned
      .join(guardedEncode(corpus, idCol, vecCol, trained, "buildIvf"), "id")
      .withColumnRenamed("id", "corpus_id")
    graft.QuackIO.writeBucketedTable(codes, s"${name}_codes", "parquet",
      Seq("cluster"), nBuckets)
    centroids.select(col(centIdCol).as("cid"), col(centVecCol).as("cvec"))
      .write.mode("overwrite").saveAsTable(s"${name}_centroids")
    val rows = for {
      mi <- trained.indices
      ki <- trained(mi).indices
      j <- trained(mi)(ki).indices
    } yield (mi, ki, j, trained(mi)(ki)(j))
    rows.toDF("m", "k", "j", "c").coalesce(1)
      .write.mode("overwrite").saveAsTable(s"${name}_codebooks")
    trained
  }

  /** Serve cluster-pruned ADC top-k from the persisted IVF index:
    * queries fan to their `probe` nearest persisted centroids and carry
    * distance tables; the bucketed codes table streams exchange-free.
    * Bit-identical to `Similarity.ivfPqTopK` under the same codebooks,
    * centroids, and probe — with serving's keep-colliding-ids default
    * (see [[query]]). */
  def queryIvf(spark: SparkSession, name: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, probe: Int = 1,
      excludeSelf: Boolean = false,
      maxCluster: Int = 1000000): DataFrame = {
    val cbs = cbsOf(spark.table(s"${name}_codebooks"))
    val q = Similarity.ivfQueryTables(queries, idCol, vecCol,
      spark.table(s"${name}_centroids"), "cid", "cvec", cbs, probe)
    Similarity.ivfAdcTopK(q, spark.table(s"${name}_codes"), cbs.length, k,
      excludeSelf, maxCluster)
  }
}
