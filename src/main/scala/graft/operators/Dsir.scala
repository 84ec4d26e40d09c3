package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * NeurIPS: "Data Selection for Language Models via Importance
  * Resampling"). Given a small TARGET corpus (the distribution you want
  * more of — curated reference text) and a large RAW corpus (the crawl),
  * fit hashed bag-of-n-gram models of both, weight every raw document
  * by its log-likelihood ratio, and keep the raw documents that look
  * most target-like. The standard pre-training recipe for "give me
  * 100 TB of crawl, return the slice that reads like my reference set".
  *
  * Features are lowercased word unigrams AND bigrams hashed into
  * `numBuckets` buckets (the paper's hashed n-gram generative model) —
  * hashing bounds model size by construction, so the two fitted
  * distributions are `numBuckets`-row tables regardless of corpus size.
  * The hash is the library-wide md5-prefix draw ([[Sampling]]
  * convention): deterministic across engines, runs, and cluster sizes,
  * and replayable by the SQL oracle.
  *
  * Scale shape: the target model is one aggregation over the (small)
  * target side; the raw model and the per-doc scores come from ONE
  * explode of the raw corpus — (id, bucket) int pairs are the only
  * corpus-sized thing that shuffles, text never leaves the scan. The
  * fitted log-ratio table is `numBuckets` rows and BROADCASTS to the
  * scoring join. Per-doc sums fold in sorted bucket order
  * ([[Vocab.unigramLogProb]] convention) so scores are
  * partition-order-independent; the final score rounds to 6 (libm log2
  * ulps differ across engines).
  */
object Dsir {

  /** `md5(salt|feature)` first-8-hex-chars mod `numBuckets` — the
    * deterministic feature hash. 8 hex chars < 2^32, exact in a long. */
  private[operators] def bucketOf(feat: Column, numBuckets: Int,
      salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit("|"), feat)), 1, 8), 16, 10)
      .cast("long") % numBuckets

  /** Hashed feature array of one document: lowercased whitespace tokens
    * plus adjacent-pair bigrams (`"w1 w2"`), each mapped to its bucket.
    * Empty/whitespace-only text yields an empty array; null stays null.
    * A pure projection — evaluated inside the scan, never shuffled.
    * Served by the native [[graft.functions.FeatureBuckets]] (one
    * compiled pass, one thread-local digest); [[featureBucketsHof]] is
    * the composable twin it is spec-pinned bit-identical to. */
  def featureBuckets(text: Column, numBuckets: Int,
      salt: String): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.FeatureBuckets(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text),
        numBuckets, salt))

  /** The relational twin of [[featureBuckets]]: three higher-order
    * lambdas and a five-node hash tree per feature — the form the
    * DuckDB oracles replay, kept for the bit-identity spec (the
    * [[graft.functions.MinHashSig]] twin convention). */
  def featureBucketsHof(text: Column, numBuckets: Int,
      salt: String): Column = {
    val toks = filter(TextAnalysis.tokens(lower(text)),
      t => length(t) > 0)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    transform(concat(toks, bigrams),
      f => bucketOf(f, numBuckets, salt))
  }

  /** Fitted hashed-n-gram counts of a corpus: one row per occupied
    * bucket with its total feature-occurrence count. One scan, one
    * bucket-keyed exchange of int pairs (map-side combine collapses
    * each partition to ≤ `numBuckets` rows first). */
  def hashedCounts(df: DataFrame, textCol: String, numBuckets: Int,
      salt: String = "dsir"): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    df.select(explode(featureBuckets(col(textCol), numBuckets, salt))
        .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** The fitted importance model: `numBuckets` rows of
    * `(bucket, llr)` where `llr = log2 p_target(bucket) -
    * log2 p_raw(bucket)` under add-`alpha` smoothing
    * (`p(b) = (cnt_b + α) / (total + α·numBuckets)`). Built on a full
    * `spark.range` bucket spine so unseen buckets carry their smoothed
    * prior instead of silently vanishing ([[Profiles.psi]] spine
    * precedent). KB-sized by construction — broadcast it. */
  def importanceModel(raw: DataFrame, rawTextCol: String,
      target: DataFrame, targetTextCol: String, numBuckets: Int = 4096,
      alpha: Double = 0.5, salt: String = "dsir"): DataFrame =
    modelFromCounts(
      hashedCounts(target, targetTextCol, numBuckets, salt)
        .withColumnRenamed("cnt", "t_cnt"),
      hashedCounts(raw, rawTextCol, numBuckets, salt)
        .withColumnRenamed("cnt", "r_cnt"),
      numBuckets, alpha)

  /** [[importanceModel]]'s core over pre-aggregated per-bucket counts
    * (`t_cnt` / `r_cnt` tables) — split out so [[importanceWeights]]
    * can derive the raw side from its per-doc bucket table instead of
    * paying a second hashed-feature pass over the corpus. */
  private def modelFromCounts(t: DataFrame, r: DataFrame,
      numBuckets: Int, alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val spark = t.sparkSession
    val spine = spark.range(numBuckets).select(col("id").as("bucket"))
    val tTot = t.agg(coalesce(sum("t_cnt"), lit(0L)).as("t_tot"))
    val rTot = r.agg(coalesce(sum("r_cnt"), lit(0L)).as("r_tot"))
    spine
      .join(t, Seq("bucket"), "left")
      .join(r, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select(col("bucket"),
        (log2((coalesce(col("t_cnt"), lit(0L)).cast("double") + alpha) /
            (col("t_tot").cast("double") + alpha * numBuckets)) -
          log2((coalesce(col("r_cnt"), lit(0L)).cast("double") + alpha) /
            (col("r_tot").cast("double") + alpha * numBuckets)))
          .as("llr"))
  }

  /** KL divergence KL(target ‖ raw) in BITS over the hashed-feature
    * distributions — the one-number "how far has the crawl drifted
    * from the reference" report ([[Profiles.psi]]'s companion: PSI
    * watches a numeric column, this watches the text itself). Computed
    * from the same smoothed models [[importanceModel]] fits:
    * `Σ_b p_target(b) · llr(b)` where `llr = log2 p_t − log2 p_r` —
    * smoothing keeps every bucket finite, so the sum is total. One
    * aggregation over the `numBuckets`-row model table (the corpus
    * work is the two `hashedCounts` scans); the per-bucket terms sum
    * through DECIMAL(38,15) (order-exact), and the result rounds to 6
    * (libm log2 ulps differ across engines — the [[importanceWeights]]
    * convention). Returns one row: `(kl_bits)`. */
  def klDivergence(raw: DataFrame, rawTextCol: String,
      target: DataFrame, targetTextCol: String, numBuckets: Int = 4096,
      alpha: Double = 0.5, salt: String = "dsir"): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // one count pass per corpus (not importanceModel + a second target
    // pass): p_t and llr derive from the SAME t/r pair, the exact
    // expressions importanceModel fits
    val spine = raw.sparkSession.range(numBuckets)
      .select(col("id").as("bucket"))
    val t = hashedCounts(target, targetTextCol, numBuckets, salt)
      .withColumnRenamed("cnt", "t_cnt")
    val r = hashedCounts(raw, rawTextCol, numBuckets, salt)
      .withColumnRenamed("cnt", "r_cnt")
    val tTot = t.agg(coalesce(sum("t_cnt"), lit(0L)).as("t_tot"))
    val rTot = r.agg(coalesce(sum("r_cnt"), lit(0L)).as("r_tot"))
    val pT = (coalesce(col("t_cnt"), lit(0L)).cast("double") + alpha) /
      (col("t_tot").cast("double") + alpha * numBuckets)
    val pR = (coalesce(col("r_cnt"), lit(0L)).cast("double") + alpha) /
      (col("r_tot").cast("double") + alpha * numBuckets)
    spine
      .join(t, Seq("bucket"), "left")
      .join(r, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot))
      .crossJoin(broadcast(rTot))
      .select((pT * (log2(pT) - log2(pR)))
        .cast(org.apache.spark.sql.types.DecimalType(38, 15)).as("term"))
      .agg(round(sum(col("term")).cast("double"), 6).as("kl_bits"))
  }

  /** Importance weight of every raw document: `logw` = the sum over the
    * doc's hashed features of `llr(bucket)` (each occurrence counts),
    * rounded to 6. Higher = more target-like. Also emits `n_feats`
    * (the doc's feature-occurrence count). Documents with no features
    * (null/empty text) carry no evidence and are ABSENT from the
    * output, the [[Vocab.unigramLogProb]] convention — gate them
    * upstream if they need a score.
    *
    * Plan: raw corpus explodes ONCE to (id, bucket) pairs → groupBy
    * (id, bucket) with map-side combine → broadcast join against the
    * `numBuckets`-row model → per-doc sorted fold. Both exchanges are
    * keyed on (id, bucket) ints; text never shuffles; nothing
    * corpus-sized reaches the driver. */
  def importanceWeights(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, numBuckets: Int = 4096,
      alpha: Double = 0.5, salt: String = "dsir"): DataFrame = {
    // validate BEFORE the eager pin below: an invalid alpha must fail
    // fast, not after a full corpus feature-materialization job
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // ONE hashed-feature pass over the raw corpus: the per-doc bucket
    // table is pinned and the model's raw side derives from it by a
    // second (cheap, numBuckets-bounded) aggregation — identical counts
    // to hashedCounts(raw) by construction (Σ over per-doc counts).
    // Unpinned, the raw corpus paid the md5 feature explode TWICE
    // (model fit + scoring; measured r16: q113 planned 10 scans).
    val docBuckets = Checkpoints.pin(raw
      .select(col(idCol).as("doc_id"),
        explode(featureBuckets(col(textCol), numBuckets, salt))
          .as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("cnt")))
    val model = modelFromCounts(
      hashedCounts(target, targetTextCol, numBuckets, salt)
        .withColumnRenamed("cnt", "t_cnt"),
      docBuckets.groupBy("bucket").agg(sum("cnt").as("r_cnt")),
      numBuckets, alpha)
    docBuckets
      .join(broadcast(model), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("bucket"), col("cnt"),
          col("llr")))).as("__xs"),
        sum(col("cnt")).as("n_feats"))
      .select(col("doc_id"), col("n_feats"),
        round(aggregate(col("__xs"), lit(0.0), (acc, x) =>
          acc + x.getField("cnt").cast("double") * x.getField("llr")),
          6).as("logw"))
  }

  /** Select the `n` most target-like raw documents: top-`n` by
    * (`logw` DESC, doc id ASC — a total order, so selection is
    * reproducible). With `gumbel = true`, applies the paper's
    * resampling form: each doc's score is perturbed by deterministic
    * Gumbel noise `-ln(-ln(u))` where `u` derives from the md5 draw of
    * `(salt|id)` — still engine/run/cluster-reproducible (no RNG
    * state), but diversity-preserving where plain top-k clips to the
    * mode of the target distribution.
    *
    * The global top-`n` plans as TakeOrdered (per-partition top-`n`,
    * then a merge of `partitions × n` rows) — no full sort, no single
    * giant task. */
  def dsirSample(raw: DataFrame, idCol: String, textCol: String,
      target: DataFrame, targetTextCol: String, n: Int,
      numBuckets: Int = 4096, alpha: Double = 0.5,
      gumbel: Boolean = false, salt: String = "dsir"): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val w = importanceWeights(raw, idCol, textCol, target, targetTextCol,
      numBuckets, alpha, salt)
    val scored =
      if (!gumbel) w.withColumn("sel_score", col("logw"))
      else {
        // u in (0,1): the 10k-grain md5 draw shifted off the endpoints
        val u = (Sampling.draw(col("doc_id"), salt + "-gumbel")
          .cast("double") + 0.5) / 10000.0
        w.withColumn("sel_score", col("logw") - log(-log(u)))
      }
    scored.orderBy(desc("sel_score"), asc("doc_id")).limit(n)
      .select(col("doc_id"), col("n_feats"), col("logw"))
  }
}
