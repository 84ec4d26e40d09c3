package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trained quality classifier — the discriminative sibling of [[Dsir]]
  * and the standard pre-training quality-filter recipe (GPT-3 §A
  * Brown et al. 2020, CCNet Wenzek et al. 2020, LLaMA Touvron et al.
  * 2023): fit a linear head that separates a curated TARGET corpus
  * from the raw crawl, then keep the crawl documents the head scores
  * target-like. Two trainers share one model/serving shape:
  *
  *  - [[trainLda]] — the 100 TB default: a closed-form Gaussian
  *    discriminant (diagonal LDA — Bayes-optimal under per-bucket
  *    shared variance) fitted in ONE distributed pass. No iterated
  *    corpus scans, no step-size tuning: class means and pooled
  *    variances are a single aggregation, the head is
  *    `w_b = (μ⁺_b − μ⁻_b)/(σ²_b + ε)`.
  *  - [[train]] — full-batch gradient descent on logistic loss, the
  *    iterative form ([[Vocab.bpeTrain]] driver-loop convention; each
  *    step is one linear job). Plain uncentered GD needs the classes
  *    to separate STRONGLY (code vs prose, language A vs B) to make
  *    progress in few steps — on subtle distribution shifts its first
  *    iterations chase the corpus-wide mean direction, which is why
  *    the closed-form head is the default at scale.
  *
  * Features are [[Dsir.featureBuckets]] md5-hashed unigrams+bigrams,
  * TF-NORMALIZED per document (`x_b = cnt_b / Σcnt` — raw counts make
  * every linear score track document LENGTH, drowning content signal).
  *
  * Determinism is engineered end-to-end, the library's oracle bar:
  * md5 features (no RNG), the RATIONAL sigmoid
  * `σ̃(z) = ½(1 + z/(1+|z|))` as the link (add/div/abs are
  * correctly-rounded IEEE ops — bit-identical on every engine, where
  * libm `exp`/`log` are not; also why [[trainLda]] omits the
  * `ln(n⁺/n⁻)` prior offset: thresholds calibrate on scores, content
  * doesn't move), and every cross-row float sum routed through
  * `DECIMAL(38,15)` per-term casts ([[graft.Queries]] dsum
  * convention) — exact and summation-order-independent, so fitted
  * heads don't drift with partitioning and a SQL oracle replaying the
  * same arithmetic reproduces them to well under the differ's 1e-6.
  *
  * Scale shape: one explode of each corpus to (doc, bucket, cnt, x)
  * rows — text never shuffles, the per-doc total rides the explode
  * (no window, no second pass); the fitted head is `numBuckets` rows
  * and BROADCASTS to the scoring join; driver traffic is one
  * KB-sized collect per pass.
  */
object QualityFilter {

  /** The fitted head: one weight per hash bucket plus a bias.
    * KB-sized by construction (`numBuckets` doubles). */
  final case class Model(weights: Array[Double], bias: Double,
      numBuckets: Int, salt: String)

  /** Exact order-independent accumulator type for gradient/score sums:
    * 15 fractional digits captures any engine-level ulp difference a
    * non-exact float sum would have smuggled in, 23 integer digits
    * holds a 100 TB corpus's worth of |residual| ≤ 1 terms. */
  private val Dec = DecimalType(38, 15)

  /** `σ̃(z) = ½(1 + z/(1+|z|))` — the rational ("fast") sigmoid.
    * Monotone, σ̃(0)=½, range (0,1): everything training and
    * thresholding need, built only from correctly-rounded IEEE ops so
    * both engines compute identical bits (libm `exp` does not). */
  private[operators] def fastSigmoid(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /** Hashed-feature rows `(doc_id, bucket, cnt, x)` of a corpus —
    * [[Dsir.featureBuckets]] unigram+bigram md5 buckets aggregated per
    * doc, with `x = cnt / Σ_doc cnt` the tf-normalized value every
    * head trains and scores on. The per-doc total is the feature-array
    * SIZE taken before the explode — no window, no second exchange.
    * Null/empty-text docs yield no rows (no evidence — the
    * [[Vocab.unigramLogProb]] convention; gate upstream if every doc
    * needs a score). One explode + one (doc,bucket)-keyed exchange of
    * int triples with map-side combine; text stays in the scan. */
  def docFeatures(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int, salt: String = "qf"): DataFrame =
    featureRows(df, idCol, textCol, numBuckets, salt, marker = false)

  /** [[docFeatures]] plus, when `marker` is set, one synthetic
    * `bucket = −1` row per contributing doc riding the SAME explode
    * (prepended to the bucket array, so no extra scan, no union
    * branch): downstream per-class doc counts become a `count` at
    * bucket −1 inside whatever aggregation consumes these rows,
    * instead of their own corpus scans. Real buckets are untouched —
    * `__nf` stays the true feature count, so tf-normalized `x` is
    * bit-identical with or without the marker. */
  private def featureRows(df: DataFrame, idCol: String, textCol: String,
      numBuckets: Int, salt: String, marker: Boolean): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    val base = df.select(col(idCol).as("doc_id"),
      Dsir.featureBuckets(col(textCol), numBuckets, salt).as("__fb"))
    val bucketSrc =
      if (marker)
        // empty arrays guard to null → explode drops them, preserving
        // the "no features ⇒ no rows (and no count)" contract
        when(size(col("__fb")) > 0,
          concat(array(lit(-1L)), col("__fb")))
      else col("__fb")
    base.select(col("doc_id"), size(col("__fb")).as("__nf"),
        explode(bucketSrc).as("bucket"))
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("cnt"), max(col("__nf")).as("__nf"))
      .select(col("doc_id"), col("bucket"), col("cnt"),
        (col("cnt").cast("double") / col("__nf").cast("double")).as("x"))
  }

  /** Count of documents that would contribute feature rows — a
    * SCAN-ONLY count (no explode, no shuffle), replacing the
    * corpus-wide distinct the naive `feats.select(y, doc).distinct
    * .count` would shuffle for. "Has ≥ 1 feature" ⟺ "has ≥ 1
    * non-empty token", so the probe tokenizes WITHOUT hashing — the
    * md5 work belongs to the moment/gradient pass, not the count.
    * Same exclusion rule as [[docFeatures]]: null/empty-text docs
    * don't count. */
  private def countWithFeatures(df: DataFrame, textCol: String): Long =
    df.filter(
      size(filter(TextAnalysis.tokens(lower(col(textCol))),
        t => length(t) > 0)) > 0)
      .count()

  /** Labelled training rows: positive corpus tagged `y = 1`, negative
    * `y = 0`. The same document id may appear on both sides (standard
    * when the target is a curated subset of the crawl) — the label,
    * not the id, separates them. WITHIN a side ids must be unique
    * (dedup first): duplicate ids silently MERGE their feature vectors
    * in the (doc, bucket) aggregation — and, with `marker` set,
    * collapse to a single bucket −1 row, so the per-class doc count
    * sees one doc carrying doubled feature mass. */
  private def labelled(positive: DataFrame, posIdCol: String,
      posTextCol: String, negative: DataFrame, negIdCol: String,
      negTextCol: String, numBuckets: Int, salt: String,
      marker: Boolean = false): DataFrame =
    featureRows(positive, posIdCol, posTextCol, numBuckets, salt, marker)
      .withColumn("y", lit(1))
      .unionByName(
        featureRows(negative, negIdCol, negTextCol, numBuckets, salt,
          marker).withColumn("y", lit(0)))

  /** Closed-form diagonal-LDA head, fitted in ONE distributed pass —
    * the scale default. Per bucket (implicit zeros included — a doc
    * missing a bucket contributes x = 0 to that bucket's moments):
    * {{{
    *   μ⁺_b = Σ_{d∈pos} x_db / n⁺      μ⁻_b likewise
    *   σ²_b = (Σ_d x²_db − n⁺μ⁺² − n⁻μ⁻²) / n    (pooled, biased)
    *   w_b  = (μ⁺_b − μ⁻_b) / (σ²_b + ε)
    *   bias = − Σ_b w_b · (μ⁺_b + μ⁻_b) / 2
    * }}}
    * so `z > 0` ⇔ the doc sits closer to the target centroid under
    * the variance-scaled metric. The class-prior offset `ln(n⁺/n⁻)`
    * is deliberately omitted (libm-free determinism; it shifts every
    * score equally). The fit is ONE aggregation over (bucket, y) —
    * the per-class doc counts ride it as marker rows at bucket −1, so
    * no separate count scans — and ≤ `2·(numBuckets+1)` rows collect
    * to the driver; moments sum through
    * DECIMAL(38,15), and the driver mirrors the oracle's arithmetic
    * exactly (java BigDecimal HALF_UP is the same rounding both
    * engines apply casting double → decimal). */
  def trainLda(positive: DataFrame, posIdCol: String, posTextCol: String,
      negative: DataFrame, negIdCol: String, negTextCol: String,
      numBuckets: Int = 1024, eps: Double = 1e-8,
      salt: String = "qf"): Model = {
    require(eps > 0, s"eps must be positive, got $eps")
    val feats = labelled(positive, posIdCol, posTextCol,
      negative, negIdCol, negTextCol, numBuckets, salt, marker = true)
    // ONE job for everything the fit needs: per-(y, bucket) decimal
    // moments, with per-class doc counts riding as the row count at
    // the synthetic bucket −1 (one marker row per contributing doc —
    // see featureRows). No separate corpus count scans.
    ldaFit(ldaMoments(feats), numBuckets, eps, salt)
  }

  /** The fit's distributed half: per-(y, bucket) decimal moments over
    * marker-included labelled feature rows, collected (≤ 2·(buckets+1)
    * rows). Split out so the fused [[trainLdaAndScore]] path can run it
    * over a pinned feature table. */
  private def ldaMoments(
      feats: DataFrame): Array[org.apache.spark.sql.Row] =
    feats
      .groupBy("y", "bucket")
      .agg(sum(col("x").cast(Dec)).as("sx"),
        sum((col("x") * col("x")).cast(Dec)).as("sxx"),
        count(lit(1)).as("nr"))
      .collect()

  /** The fit's driver half — moments → [[Model]]; arithmetic identical
    * to the inline form it was extracted from (r16). */
  private def ldaFit(moments: Array[org.apache.spark.sql.Row],
      numBuckets: Int, eps: Double, salt: String): Model = {
    var nPos = 0L
    var nNeg = 0L
    val sxP = Array.fill(numBuckets)(java.math.BigDecimal.ZERO)
    val sxN = Array.fill(numBuckets)(java.math.BigDecimal.ZERO)
    var sxxAll = Array.fill(numBuckets)(java.math.BigDecimal.ZERO)
    moments.foreach { r =>
      val y = r.getInt(0); val b = r.getLong(1)
      if (b == -1L) {
        if (y == 1) nPos = r.getLong(4) else nNeg = r.getLong(4)
      } else {
        val sx = r.getDecimal(2); val sxx = r.getDecimal(3)
        if (y == 1) sxP(b.toInt) = sxP(b.toInt).add(sx)
        else sxN(b.toInt) = sxN(b.toInt).add(sx)
        sxxAll(b.toInt) = sxxAll(b.toInt).add(sxx)
      }
    }
    require(nPos > 0, "trainLda: no positive documents with features")
    require(nNeg > 0, "trainLda: no negative documents with features")
    val n = nPos + nNeg
    val weights = Array.fill(numBuckets)(0.0)
    // bias accumulates in decimal too — order-independent, mirroring
    // the oracle's CAST(... AS DECIMAL(38,15)) per-term sum
    var biasAcc = java.math.BigDecimal.ZERO
    for (b <- 0 until numBuckets) {
      val mp = sxP(b).doubleValue() / nPos
      val mn = sxN(b).doubleValue() / nNeg
      val varB = (sxxAll(b).doubleValue() -
        nPos * mp * mp - nNeg * mn * mn) / n
      val w = (mp - mn) / (varB + eps)
      weights(b) = w
      biasAcc = biasAcc.add(new java.math.BigDecimal(w * (mp + mn) * 0.5)
        .setScale(15, java.math.RoundingMode.HALF_UP))
    }
    Model(weights, -biasAcc.doubleValue(), numBuckets, salt)
  }

  /** Full-batch gradient descent on logistic loss with the rational
    * link: `w ← w − lr·(Σ_d (σ̃(z_d) − y_d)·x_d / n + l2·w)`, weights
    * and bias from 0 (first-step residuals are exactly ±½). Each
    * iteration is ONE linear job ending in a `numBuckets`-row collect.
    * Effective when the classes separate strongly; for subtle
    * distribution shifts prefer [[trainLda]] (see object scaladoc).
    * Docs with no features carry no evidence and are excluded from
    * `n` and the bias gradient alike. */
  def train(positive: DataFrame, posIdCol: String, posTextCol: String,
      negative: DataFrame, negIdCol: String, negTextCol: String,
      numBuckets: Int = 1024, iters: Int = 5, lr: Double = 50.0,
      l2: Double = 0.0, salt: String = "qf"): Model = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be positive, got $lr")
    require(l2 >= 0, s"l2 must be >= 0, got $l2")
    val spark = positive.sparkSession
    import spark.implicits._

    // pinned: the gradient loop consumes the labelled feature table
    // once per iteration — unpinned, the md5 feature explode of BOTH
    // corpora replays `iters` times (r17; the trainLdaAndScore fusion
    // precedent)
    val feats = Checkpoints.pin(labelled(positive, posIdCol, posTextCol,
      negative, negIdCol, negTextCol, numBuckets, salt))
    val n = countWithFeatures(positive, posTextCol) +
      countWithFeatures(negative, negTextCol)
    require(n > 0, "train: no documents with features on either side")

    val weights = Array.fill(numBuckets)(0.0)
    var bias = 0.0
    for (_ <- 1 to iters) {
      val wDf = broadcast(
        weights.toSeq.zipWithIndex.map { case (w, b) => (b.toLong, w) }
          .toDF("bucket", "w"))
      // one job: per-doc z (exact decimal dot product) → residual →
      // re-explode the doc's own features (bounded by numBuckets) for
      // the per-bucket gradient; bucket −1 carries the bias gradient.
      val grad = feats.join(wDf, Seq("bucket"))
        .groupBy("y", "doc_id")
        .agg(sum((col("x") * col("w")).cast(Dec)).as("zdec"),
          collect_list(struct(col("bucket"), col("x"))).as("bx"))
        .withColumn("r",
          fastSigmoid(lit(bias) + col("zdec").cast("double")) -
            col("y").cast("double"))
        .select(col("r"), explode(concat(
            array(struct(lit(-1L).as("bucket"), lit(1.0).as("x"))),
            col("bx"))).as("f"))
        .select(col("f.bucket").as("bucket"),
          (col("r") * col("f.x")).cast(Dec).as("g"))
        .groupBy("bucket")
        .agg(sum(col("g")).as("gs"))
        .collect()
      val gm = grad.map(r => r.getLong(0) -> r.getDecimal(1)).toMap
      bias -= lr * (gm.get(-1L).map(_.doubleValue()).getOrElse(0.0) / n)
      // every bucket steps (L2 decays weights with no evidence this
      // round too) — the exact expression an oracle would replay
      for (b <- 0 until numBuckets) {
        val gMean =
          gm.get(b.toLong).map(_.doubleValue()).getOrElse(0.0) / n
        weights(b) = weights(b) - lr * (gMean + l2 * weights(b))
      }
    }
    Model(weights, bias, numBuckets, salt)
  }

  /** Score every document: `logit = bias + Σ_b x_b·w_b` (exact
    * decimal dot product — partition-order-independent), `prob =
    * σ̃(logit)`, both rounded to 6; plus `n_feats` (the doc's raw
    * feature-occurrence total). Docs with no features are absent
    * (score them as `σ̃(bias)` upstream if needed). The weight table
    * broadcasts; only (doc, bucket) rows shuffle. */
  def scoreWith(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame =
    scoreRows(
      docFeatures(df, idCol, textCol, model.numBuckets, model.salt),
      model)

  /** [[scoreWith]]'s core over precomputed `(doc_id, bucket, cnt, x)`
    * feature rows. Marker rows (bucket −1) are harmless by
    * construction: the weight join is INNER over buckets 0..n−1, so
    * they drop before `n_feats`/`zdec` aggregate — which lets the
    * fused path feed the SAME pinned table to fit and scoring. */
  private def scoreRows(featRows: DataFrame, model: Model): DataFrame = {
    val spark = featRows.sparkSession
    import spark.implicits._
    val wDf = broadcast(
      model.weights.toSeq.zipWithIndex.map { case (w, b) => (b.toLong, w) }
        .toDF("bucket", "w"))
    featRows
      .join(wDf, Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_feats"),
        sum((col("x") * col("w")).cast(Dec)).as("zdec"))
      .withColumn("z", lit(model.bias) + col("zdec").cast("double"))
      .select(col("doc_id"), col("n_feats"),
        round(col("z"), 6).as("logit"),
        round(fastSigmoid(col("z")), 6).as("prob"))
  }

  /** [[trainLda]] + [[scoreWith]] fused over ONE hashed-feature pass —
    * the self-training recipe's serving shape (fit a head on a labeled
    * split of the corpus, score the SAME corpus): the labelled
    * marker-included feature table is computed once and PINNED
    * ([[Checkpoints.pin]] — durable under `graft.checkpoint.dir`), the
    * moment job and the scoring join both read it, and the corpus pays
    * the md5 feature explode exactly once instead of once per trainer
    * class plus once for scoring (measured r16: 3 feature passes → 1 on
    * the q115/q130-family entries, bit-identical outputs — the decimal
    * moment sums are partition-order-exact, so fitting from the fused
    * table reproduces [[trainLda]]'s head to the bit; spec-pinned).
    *
    * `posPred` labels each row: true → positive class, false →
    * negative, NULL → excluded from fit AND scores — exactly the
    * two-filter semantics `trainLda(df.filter(p), …, df.filter(!p), …)`
    * has, since `filter(!p)` drops null-predicate rows too. Docs with
    * no features are absent, the [[scoreWith]] convention. */
  def trainLdaAndScore(df: DataFrame, idCol: String, textCol: String,
      posPred: Column, numBuckets: Int = 1024, eps: Double = 1e-8,
      salt: String = "qf"): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val feats = Checkpoints.pin(
      labelledOnePass(df, idCol, textCol, posPred, numBuckets, salt))
    val model = ldaFit(ldaMoments(feats), numBuckets, eps, salt)
    scoreRows(feats.select(col("doc_id"), col("bucket"), col("cnt"),
      col("x")), model)
  }

  /** The gate form of [[trainLdaAndScore]] — [[classifierGate]] with
    * the fit fused into the same single feature pass: keep the rows of
    * `df` the self-trained head scores at or above `minProb`.
    *
    * NULL-`posPred` rows are excluded from the fit AND from scoring, so
    * the gate DROPS them (no posterior → never ≥ `minProb`). The
    * unfused `trainLda` + [[classifierGate]] composition scored every
    * row against the fitted model and could keep a null-predicate row —
    * spec-pinned difference (QualityFilterSpec's fused-gate law);
    * coalesce the predicate upstream if such rows must be scored. */
  def trainLdaAndGate(df: DataFrame, idCol: String, textCol: String,
      posPred: Column, numBuckets: Int = 1024, minProb: Double = 0.5,
      eps: Double = 1e-8, salt: String = "qf"): DataFrame = {
    val keep =
      trainLdaAndScore(df, idCol, textCol, posPred, numBuckets, eps, salt)
        .filter(col("prob") >= minProb)
        .select(col("doc_id").as("__keep_id"))
    df.join(keep, col(idCol) === col("__keep_id"), "left_semi")
  }

  /** One-pass labelled marker-included feature rows:
    * `(doc_id, y, bucket, cnt, x)` — [[labelled]]'s output computed
    * without splitting the corpus into two filtered scans. Rows whose
    * `posPred` is NULL are excluded (the two-filter semantics). The
    * label is per-row, so grouping by (doc_id, y, bucket) yields the
    * same rows as the per-side featureRows ever did. */
  private def labelledOnePass(df: DataFrame, idCol: String,
      textCol: String, posPred: Column, numBuckets: Int,
      salt: String): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"),
        when(posPred, 1).otherwise(when(!posPred, 0)).as("y"),
        Dsir.featureBuckets(col(textCol), numBuckets, salt).as("__fb"))
      .filter(col("y").isNotNull)
    base.select(col("doc_id"), col("y"), size(col("__fb")).as("__nf"),
        explode(when(size(col("__fb")) > 0,
          concat(array(lit(-1L)), col("__fb")))).as("bucket"))
      .groupBy("doc_id", "y", "bucket")
      .agg(count(lit(1)).as("cnt"), max(col("__nf")).as("__nf"))
      .select(col("doc_id"), col("y"), col("bucket"), col("cnt"),
        (col("cnt").cast("double") / col("__nf").cast("double")).as("x"))
  }

  /** Projection-form scorer: the same `(doc_id, n_feats, logit, prob)`
    * frame as [[scoreWith]], computed as a PURE ROW-LOCAL PROJECTION —
    * the weights ship as a literal array inside the expression
    * (`numBuckets` doubles, KB), the per-occurrence weights fold
    * in-row, and nothing shuffles or joins: the zero-exchange serving
    * path for scoring 100 TB in one map pass, and the form that
    * composes on a STREAMING DataFrame (stateless — [[scoreWith]]'s
    * groupBy cannot run on an unbounded stream without state).
    *
    * `Σ_b cnt_b·w_b / nf` is folded occurrence-wise
    * (`(Σ_occ w_b) / nf` — each occurrence contributes its bucket's
    * weight once), a plain double fold in token order: deterministic
    * for a given text, but NOT the decimal order-independent sum, so
    * scores agree with [[scoreWith]] to float accumulation (~1e-12
    * relative), not bit-for-bit — the oracle entries pin [[scoreWith]];
    * this is the serving twin (spec-pinned to 1e-9 agreement). */
  def scoreInline(df: DataFrame, idCol: String, textCol: String,
      model: Model): DataFrame = {
    val w = typedlit(model.weights.toSeq)
    df.select(col(idCol).as("doc_id"),
        Dsir.featureBuckets(col(textCol), model.numBuckets, model.salt)
          .as("__fb"))
      .filter(col("__fb").isNotNull && size(col("__fb")) > 0)
      .withColumn("n_feats", size(col("__fb")).cast("long"))
      .withColumn("z",
        lit(model.bias) +
          aggregate(col("__fb"), lit(0.0), (acc, b) =>
            acc + element_at(w, b.cast("int") + 1)) /
            col("n_feats").cast("double"))
      .select(col("doc_id"), col("n_feats"),
        round(col("z"), 6).as("logit"),
        round(fastSigmoid(col("z")), 6).as("prob"))
  }

  /** Keep the rows the model scores at or above `minProb` — a LEFT SEMI
    * join of the corpus against its own keep-list, both sides keyed on
    * the id (the keep-list is corpus-sized, so broadcasting it is not
    * an option at scale; the semi join ships ids only and never
    * duplicates rows). */
  def classifierGate(df: DataFrame, idCol: String, textCol: String,
      model: Model, minProb: Double = 0.5): DataFrame = {
    val keep = scoreWith(df, idCol, textCol, model)
      .filter(col("prob") >= minProb)
      .select(col("doc_id").as("__keep_id"))
    df.join(keep, col(idCol) === col("__keep_id"), "left_semi")
  }

  /** Persist a model as ONE parquet file: `numBuckets` weight rows plus
    * a `bucket = −1` bias row, with `numBuckets`/`salt` in the footer
    * key-value metadata ([[graft.QuackIO.writeTable]] K9 convention —
    * the artifact is self-describing). */
  def saveModel(model: Model, path: String)(
      implicit spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val rows = (-1, model.bias) +:
      model.weights.toSeq.zipWithIndex.map { case (w, b) => (b, w) }
    graft.QuackIO.writeTable(rows.toDF("bucket", "w"), path,
      graft.WriteOptions(kvMetadata = Map(
        "graft.qf.numBuckets" -> model.numBuckets.toString,
        "graft.qf.salt" -> model.salt)))
  }

  /** Load a persisted model; doubles round-trip parquet bit-exactly, so
    * a loaded model scores identically to the in-memory one. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): Model = {
    val kv = graft.ParquetMetadata.read(path)
    val numBuckets = kv.getOrElse("graft.qf.numBuckets",
      sys.error(s"loadModel: $path has no graft.qf.numBuckets footer " +
        "metadata — not a QualityFilter model")).toInt
    val salt = kv.getOrElse("graft.qf.salt", "qf")
    val rows = spark.read.parquet(path).collect()
    val weights = Array.fill(numBuckets)(0.0)
    var bias = 0.0
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      if (b == -1) bias = r.getAs[Double]("w")
      else weights(b) = r.getAs[Double]("w")
    }
    Model(weights, bias, numBuckets, salt)
  }
}
