package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data VALUATION for training-data pipelines — "which training rows
  * actually help the model?": the per-example counterpart of the
  * corpus-level mixture/quality operators. The first resident is the
  * exact KNN-Shapley of Jia et al. 2019 (Efficient task-specific data
  * valuation for nearest neighbor algorithms, VLDB 2019), whose
  * closed-form recursion makes Shapley values — normally 2^N subset
  * enumerations — an O(N log N) sort-and-scan per validation point,
  * i.e. expressible as declarative Spark (one broadcast score, one
  * per-query rank, one per-query suffix scan) with no training loop. */
object Valuation {

  private val Quantum = 1e12

  /** Exact KNN-Shapley values (Jia et al. 2019, Theorem 1): for each
    * validation point t, every training row i gets the exact Shapley
    * contribution of i to the unweighted K-NN classifier's likelihood
    * of t's label. With training rows sorted nearest-first
    * (rank 1..N by the repo-standard round-6 cosine, train-id
    * tiebreak — the [[Similarity.cosineTopK]] ordering), the
    * recursion is a SUFFIX scan:
    * `s_N = 1[y_N = y_t]/N`,
    * `s_i = s_{i+1} + (1[y_i = y_t] − 1[y_{i+1} = y_t])·min(K,i)/(K·i)`
    * — so each rank contributes one term and the value is the
    * rank-descending running sum.
    *
    * Parity: every term is quantized to a 1e-12-quantum long —
    * `floor(min(K,i)/(K·i)·1e12 + 0.5)` is one IEEE-exact division,
    * multiply and floor, identical on any engine — and the running
    * sum is over LONGS, so no float-association order can drift
    * (running-window doubles diverge between Spark's sequential fold
    * and DuckDB's segment tree). The published value comes back as
    * `shapley = cum/1e12` (round-6); `shapley_q` carries the exact
    * long for hash-stable comparison.
    *
    * Null vectors or labels on either side are excluded upstream of
    * the scoring (a null would silently sink to the ranking bottom
    * and shift every suffix).
    *
    * Scale: the validation side BROADCASTS (it is the small side by
    * construction — a held-out set); the training corpus never
    * exchanges for scoring. The rank + suffix scan partition BY
    * VALIDATION POINT, so parallelism is |valid| and each partition
    * holds |train| rows — exact valuation of a 100 TB corpus against
    * one validation set is inherently a full-corpus ranking. For the
    * 1000-executor path, pass a per-query CANDIDATE set instead (an
    * [[Similarity.ivfTopK]]/[[Similarity.annTopK]] shortlist joined
    * back to vectors): ranks beyond the shortlist contribute
    * O(min(K,i)/i) tail mass the shortlist truncates — the same
    * shortlist-then-exact contract the serving re-rankers document.
    *
    * Output: (query_id, train_id, rank, score, shapley_q, shapley),
    * one row per (validation, train) pair. */
  def knnShapley(train: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"knnShapley: k must be >= 1, got $k")
    val q = queries
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        Similarity.norm(col(vecCol)).as("qn"),
        col(labelCol).as("qy"))
    val c = train
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull &&
        col(labelCol).isNotNull)
      .select(col(idCol).as("train_id"), col(vecCol).as("cv"),
        Similarity.norm(col(vecCol)).as("cn"),
        col(labelCol).as("cy"))
    val pairs = broadcast(q).crossJoin(c)
      .filter(col("query_id") =!= col("train_id"))
      .select(col("query_id"), col("train_id"),
        round(Similarity.dot(col("qv"), col("cv")) /
          (col("qn") * col("cn")), 6).as("score"),
        (col("cy") === col("qy")).cast("long").as("__ind"))
    val byScore = Window.partitionBy("query_id")
      .orderBy(desc("score"), asc("train_id"))
    val part = Window.partitionBy("query_id")
    val ranked = pairs
      .withColumn("rank", row_number().over(byScore).cast("long"))
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__nextInd", lead(col("__ind"), 1).over(byScore))
    // per-rank term, quantized: rank N carries the base 1[y_N=y]/N;
    // rank i < N carries (1[y_i=y] − 1[y_{i+1}=y])·min(K,i)/(K·i)
    def q12(x: Column): Column =
      floor(x * lit(Quantum) + lit(0.5)).cast("long")
    val mag = q12(least(lit(k.toLong), col("rank")).cast("double") /
      (lit(k.toDouble) * col("rank").cast("double")))
    val base = q12(lit(1.0) / col("__n").cast("double"))
    val term = when(col("rank") === col("__n"), col("__ind") * base)
      .otherwise((col("__ind") - col("__nextInd")) * mag)
    val suffix = Window.partitionBy("query_id").orderBy(desc("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.withColumn("shapley_q", sum(term).over(suffix))
      .select(col("query_id"), col("train_id"), col("rank"),
        col("score"),
        col("shapley_q"),
        round(col("shapley_q").cast("double") / lit(Quantum), 6)
          .as("shapley"))
  }
}
