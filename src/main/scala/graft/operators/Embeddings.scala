package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column hygiene — the gate a vector pipeline runs BEFORE
  * ANN indexing / semantic dedup pays for math on garbage: encoder
  * crashes leave nulls, version-skewed encoders leave wrong
  * dimensions, fp blowups leave NaN/Inf or zero vectors, and
  * norm outliers poison cosine neighborhoods. All checks are pure
  * scan-side higher-order-function predicates (codegen'd, zero
  * UDFs); the norm-outlier bound needs one corpus aggregation whose
  * two-number result broadcasts back — nothing corpus-sized moves.
  *
  * [[dimMoments]]/[[standardize]] are the feature-scaling half:
  * per-dimension mean/std (one (dim)-keyed partial aggregation — 64
  * tiny groups absorb map-side) and the broadcast z-transform. */
object Embeddings {

  /** Per-row verdict on `vecCol`, first failing check wins:
    * `null` → missing, wrong length → bad_dim, any NaN/±Inf →
    * nonfinite, all-zero → zero_norm, |z(norm)| > `maxNormZ` →
    * norm_outlier, else ok. Norm stats (population mean/std over the
    * VALID vectors only) ride a broadcast two-number table.
    *
    * The z-gate uses MOMENT statistics, so a large outlier FRACTION
    * inflates σ and masks itself (the classic non-robust-z caveat) —
    * fine for the rare-corruption case this gate targets. When
    * contamination is heavy, derive robust bounds instead (median ±
    * k·MAD via [[Rank.exactQuantiles]] over the norm column) and
    * filter on those. */
  def withVectorVerdict(df: DataFrame, vecCol: String, dim: Int,
      maxNormZ: Double = 3.0): DataFrame = {
    require(dim > 0, s"Embeddings: dim must be positive, got $dim")
    require(maxNormZ > 0, s"Embeddings: maxNormZ must be positive")
    Seq("__norm", "__mu", "__sd", "verdict").foreach(c =>
      require(!df.columns.contains(c),
        s"Embeddings: input already has a '$c' column; rename it"))
    val v = col(vecCol)
    val nonfinite = exists(v, x => isnan(x) || abs(x) > lit(Float.MaxValue))
    val structuralOk = v.isNotNull && size(v) === dim &&
      !nonfinite
    val normSq = aggregate(v, lit(0.0d), (acc, x) =>
      acc + x.cast("double") * x.cast("double"))
    val staged = df.withColumn("__norm",
      when(structuralOk, sqrt(normSq)).otherwise(lit(null)))
    val stats = staged
      .filter(col("__norm").isNotNull && col("__norm") > 0)
      .agg(avg(col("__norm")).as("__mu"),
        stddev_pop(col("__norm")).as("__sd"))
    staged.crossJoin(broadcast(stats))
      .withColumn("verdict",
        when(v.isNull, "missing")
          .when(size(v) =!= dim, "bad_dim")
          .when(nonfinite, "nonfinite")
          .when(col("__norm") === 0.0, "zero_norm")
          .when(col("__sd") > 0 &&
            abs(col("__norm") - col("__mu")) > lit(maxNormZ) * col("__sd"),
            "norm_outlier")
          .otherwise("ok"))
      .drop("__norm", "__mu", "__sd")
  }

  /** Rows whose vector passes every [[withVectorVerdict]] check —
    * the serving gate. */
  def vectorQualityGate(df: DataFrame, vecCol: String, dim: Int,
      maxNormZ: Double = 3.0): DataFrame =
    withVectorVerdict(df, vecCol, dim, maxNormZ)
      .filter(col("verdict") === "ok").drop("verdict")

  /** Per-verdict counts — the ingest health report. Columns:
    * `verdict`, `n`. */
  def vectorQualityReport(df: DataFrame, vecCol: String, dim: Int,
      maxNormZ: Double = 3.0): DataFrame =
    withVectorVerdict(df, vecCol, dim, maxNormZ)
      .groupBy("verdict").agg(count(lit(1)).as("n"))

  /** ROBUST norm gate — the heavy-contamination companion to
    * [[withVectorVerdict]]'s moment z-gate (which large outlier
    * fractions inflate and mask): bounds come from the median and the
    * MAD (median absolute deviation), each an EXACT
    * [[Rank.exactQuantiles]] pass — breakdown point 50%, no
    * whole-column buffer. Rows with null/short/NaN vectors are
    * excluded like the z-gate's stats; survivors satisfy
    * |‖v‖ − median| ≤ k·MAD (k·1.4826·MAD approximates k·σ on clean
    * Gaussian norms — pass `k ≈ 3·1.4826 ≈ 4.45` for that
    * convention, or a plain k for the raw-MAD bound). A zero MAD
    * (half the corpus shares one norm) keeps exactly the
    * median-normed rows — strict, documented. Cost: THREE passes over
    * the staged norm projection (two exact-quantile rank passes + the
    * final gate scan) — persist the input upstream when its lineage is
    * expensive; the bounds themselves are a two-number driver value. */
  def robustVectorGate(df: DataFrame, vecCol: String, dim: Int,
      k: Double = 4.45): DataFrame = {
    require(dim > 0 && k > 0, "Embeddings.robustVectorGate: bad params")
    Seq("__norm", "__rid", "__med", "__mad").foreach(c =>
      require(!df.columns.contains(c),
        s"Embeddings: input already has a '$c' column; rename it"))
    val v = col(vecCol)
    val normSq = aggregate(v, lit(0.0d), (acc, x) =>
      acc + x.cast("double") * x.cast("double"))
    val staged = df
      .filter(v.isNotNull && size(v) === dim &&
        !exists(v, x => isnan(x) || abs(x) > lit(Float.MaxValue)))
      .withColumn("__norm", sqrt(normSq))
      .withColumn("__rid", monotonically_increasing_id())
    // headOption: when NO vector survives the structural filter the
    // quantile frame is empty — return the (empty) filtered frame like
    // the sibling gates instead of throwing on collect().head
    Rank.exactQuantiles(staged, "__norm", "__rid", Seq(0.5))
      .collect().headOption.map(_.getDouble(1)) match {
      case None => staged.drop("__norm", "__rid")
      case Some(med) =>
        val dev = staged.withColumn("__dev", abs(col("__norm") - med))
        // staged is non-empty here, so the MAD median always exists
        val mad = Rank.exactQuantiles(dev, "__dev", "__rid", Seq(0.5))
          .collect().head.getDouble(1)
        staged.filter(abs(col("__norm") - med) <= k * mad)
          .drop("__norm", "__rid")
    }
  }

  /** Per-dimension population moments of `vecCol` (vectors must be
    * uniform length — run the gate first). Columns: `dim` (0-based),
    * `mean`, `std`. One posexplode + a (dim)-keyed aggregation: D tiny
    * groups, map-side combined — the corpus crosses one exchange of
    * (dim, partial-moment) rows. */
  def dimMoments(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy("dim")
      .agg(avg(col("__v").cast("double")).as("mean"),
        stddev_pop(col("__v").cast("double")).as("std"))

  /** Z-standardizes `vecCol` against `moments` (a [[dimMoments]]
    * result): out[i] = (v[i] − mean_i)/std_i, constant dims (std 0)
    * centered only. The D-row moment table collapses to two array
    * literals via a broadcast single-row cross join — the transform
    * itself is a zero-exchange projection. */
  def standardize(df: DataFrame, vecCol: String, moments: DataFrame,
      outCol: String = "std_vec"): DataFrame = {
    Seq("__mus", "__sds", outCol).foreach(c =>
      require(!df.columns.contains(c),
        s"Embeddings: input already has a '$c' column; rename it"))
    val packed = moments
      .agg(array_sort(collect_list(struct(col("dim"), col("mean"),
        col("std")))).as("__m"))
      .select(transform(col("__m"), m => m("mean")).as("__mus"),
        transform(col("__m"), m => m("std")).as("__sds"))
    df.crossJoin(broadcast(packed))
      .withColumn(outCol,
        zip_with(col(vecCol).cast("array<double>"),
          sequence(lit(0), size(col(vecCol)) - 1),
          (v, i) => {
            val mu = element_at(col("__mus"), i + 1)
            val sd = element_at(col("__sds"), i + 1)
            when(sd > 0, (v - mu) / sd).otherwise(v - mu)
          }))
      .drop("__mus", "__sds")
  }

  /** Population covariance matrix of `vecCol` (uniform length `dim`),
    * upper triangle: one row per (i ≤ j) with
    * `cov = E[v_i·v_j] − E[v_i]·E[v_j]`, round-6 doubles. Sums are
    * ORDER-INDEPENDENT: each product is quantized to an integer at
    * 1e-12 resolution (`floor(x·1e12 + 0.5)` — floor is IEEE-exact on
    * every engine, unlike round's tie conventions) and summed as a
    * long, so any association order yields the same bits and the
    * round-6 output replays exactly on any engine. The 5e-13 per-term
    * quantization is 6 orders below the published resolution; long
    * capacity holds to ~10⁷ unit-scale rows per cell and is ENFORCED —
    * a per-cell `n·max|term|` bound raises past capacity instead of
    * wrapping silently. Rows with null/short/NaN vectors are excluded.
    *
    * Scale shape: the (i, j) pair fan-out explodes UNDER a (i, j)-keyed
    * aggregation that partial-combines map-side, so the exchange ships
    * at most D(D+1)/2 cells per task — never corpus rows (the
    * [[dimMoments]] pattern squared). The D²-multiplier CPU is the
    * same product count any covariance pays; for D ≳ 256 prefer a
    * per-partition matrix fold (the declarative form's row fan-out
    * overhead starts to matter). */
  def covarianceMatrix(df: DataFrame, vecCol: String, dim: Int)
      : DataFrame = {
    require(dim > 0, "Embeddings.covarianceMatrix: dim must be positive")
    val v = col(vecCol)
    val clean = df
      .filter(v.isNotNull && size(v) === dim && !exists(v, x => isnan(x)))
      .select(v.cast("array<double>").as("__v"))
    // ONE explode of pre-built (i, j, x·y) triangle structs — a naive
    // double posexplode carries the whole array into a D²-row
    // intermediate and filters half of it away afterwards (measured
    // 3.5× slower at sf0.1); per-dim sums come from the D-row means
    // table instead of riding every cell (for a fixed i, the cell's
    // Σx IS the dimension's Σv_i — same multiset, same fold).
    // Exactness via SCALED-LONG sums, not decimal: 2080 cells × N
    // decimal additions measured 3× the whole query (6.4 s vs 2.2 s at
    // sf0.1), while long addition costs the same as double and is just
    // as order-independent. The quantized product rides each exploded
    // struct; everything after the two long sums is a fixed-order
    // IEEE-double expression both engines evaluate identically.
    val cells = clean
      .select(explode(flatten(transform(
        sequence(lit(0), lit(dim - 1)), i =>
          transform(sequence(i, lit(dim - 1)), j =>
            struct(i.as("i"), j.as("j"),
              floor(element_at(col("__v"), i + 1) *
                element_at(col("__v"), j + 1) * lit(1e12) + lit(0.5))
                .as("xy")))))).as("__c"))
      .groupBy(col("__c.i").as("i"), col("__c.j").as("j"))
      .agg(count(lit(1)).as("__n"), sum(col("__c.xy")).as("__sxy"),
        max(abs(col("__c.xy"))).as("__mx"))
    val means = clean
      .select(posexplode(col("__v")).as(Seq("__d", "__x")))
      .groupBy("__d")
      .agg(((sum(floor(col("__x") * lit(1e12) + lit(0.5)))
        .cast("double") / lit(1e12)) /
        count(lit(1)).cast("double")).as("__mu"))
    cells
      .join(broadcast(means.select(col("__d").as("i"),
        col("__mu").as("__mi"))), "i")
      .join(broadcast(means.select(col("__d").as("j"),
        col("__mu").as("__mj"))), "j")
      .select(col("i"), col("j"),
        // ENFORCED capacity: n·max|term| must fit a long or the
        // quantized cell sum can wrap silently (wrong covariances with
        // no signal on a large corpus). Σ|term| ≤ n·max|term| bounds
        // |Σterm|, so this conservative check never false-negatives;
        // unit-scale rows trip it around ~9·10⁶ rows — past that,
        // raise and tell the caller the remedy. Two-part check:
        //  - a SINGLE term at/past 2⁶² means the floor(x·1e12 + 0.5)
        //    quantization itself saturated or is about to (|x·y| ≳
        //    4.6·10⁶ — double→long conversion clamps at Long.MaxValue,
        //    which the n-scaled bound cannot see when n is small);
        //  - the n·max|term| bound compares against 9.2·10¹⁸, kept
        //    0.25% BELOW 2⁶³ so the IEEE-double division (whose
        //    nearest-representable rounding of Long.MaxValue is
        //    exactly 2⁶³) can never overshoot the true long capacity
        //    at the margin.
        when(col("__mx") >= lit(4611686018427387904L) ||
            col("__n").cast("double") >
              lit(9.2e18) / greatest(col("__mx"), lit(1L))
                .cast("double"),
          raise_error(concat(lit("Embeddings.covarianceMatrix: " +
            "quantized 1e-12 cell sum would exceed long capacity (n="),
            col("__n"), lit(", max|term|="), col("__mx"),
            lit(") — reduce rows per call or center/scale the " +
              "vectors first"))).cast("double"))
        .otherwise(round(
          (col("__sxy").cast("double") / lit(1e12)) /
            col("__n").cast("double") -
            col("__mi") * col("__mj"), 6)).as("cov"))
  }

  /** PCA: top-`k` principal axes of `vecCol` from the EXACT
    * [[covarianceMatrix]] (one corpus pass), eigendecomposed
    * driver-side with cyclic Jacobi — the covariance is a bounded D×D
    * value (the codebook/centroid collect precedent), so no iterative
    * distributed solver is needed below D ≈ 10³. Returns
    * `(components, eigenvalues)`: `components(c)(d)` = axis c's weight
    * on dimension d, eigenvalues descending; axis SIGN is normalized
    * (largest-|weight| component positive) so results are
    * deterministic. */
  def pca(df: DataFrame, vecCol: String, dim: Int, k: Int)
      : (Array[Array[Double]], Array[Double]) = {
    require(k >= 1 && k <= dim, s"Embeddings.pca: k must be in [1,$dim]")
    val cells = covarianceMatrix(df, vecCol, dim).collect()
    require(cells.nonEmpty, "Embeddings.pca: no valid vectors")
    val a = Array.ofDim[Double](dim, dim)
    cells.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      a(i)(j) = c; a(j)(i) = c
    }
    // cyclic Jacobi: rotate out the largest off-diagonal until ~0
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-12) {
      off = 0.0
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p)(q)
          off = math.max(off, math.abs(apq))
          if (math.abs(apq) > 1e-14) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // sign(0) must be +1 here: equal diagonals take the full
            // 45° rotation (t = 1), not a no-op
            val t = (if (theta >= 0) 1.0 else -1.0) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < dim) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < dim) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until dim).sortBy(i => -a(i)(i)).take(k)
    val comps = order.map { c =>
      val axis = Array.tabulate(dim)(d => v(d)(c))
      val m = axis.maxBy(math.abs)
      if (m < 0) axis.map(-_) else axis
    }.toArray
    (comps, order.map(i => a(i)(i)).toArray)
  }

  /** Projects `vecCol` onto [[pca]] axes — a zero-exchange broadcast
    * projection. Output column: `outCol` (array of k doubles). */
  def pcaProject(df: DataFrame, vecCol: String,
      components: Array[Array[Double]], outCol: String = "pca")
      : DataFrame = {
    require(components.nonEmpty, "Embeddings.pcaProject: no components")
    val axes = components.map(axis =>
      array(axis.toIndexedSeq.map(lit): _*))
    df.withColumn(outCol, array(axes.toIndexedSeq.map(ax =>
      aggregate(zip_with(col(vecCol).cast("array<double>"), ax,
        (x, w) => x * w), lit(0.0d), (acc, x) => acc + x)): _*))
  }

  /** Jensen-Shannon divergence between two corpora in EMBEDDING space
    * (the MAUVE-family distributional eval, Pillutla et al. 2021's
    * quantize-then-diverge recipe): both sides assign to a SHARED
    * centroid codebook ([[Similarity.ivfAssign]] — fixed centroids are
    * what make two corpora comparable, the [[Profiles.psi]] fixed-edge
    * argument), per-cluster occupancy shares are compared with
    * `JS = ½·KL(P‖M) + ½·KL(Q‖M)`, `M = (P+Q)/2`. One row per
    * codebook cluster: both counts, both shares, `js_term` (round-6;
    * Σ js_term ∈ [0, ln 2] is the headline — 0 identical occupancy,
    * ln 2 disjoint). Unlike PSI no ε floor is needed: a side's zero
    * share contributes exactly 0 to its own KL half and M stays
    * positive wherever either side lives; clusters empty on BOTH
    * sides term 0. An EMPTY side raises by name (the psi guard — its
    * shares are undefined).
    *
    * Scale: two cluster-keyed map-combined aggregations (the
    * assignment is a broadcast-centroid projection), then arithmetic
    * over the |codebook|-row spine. */
  def embeddingJsDivergence(a: DataFrame, b: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      centIdCol: String, centVecCol: String): DataFrame = {
    def occupancy(df: DataFrame, out: String) =
      Similarity.ivfAssign(df, idCol, vecCol, centroids, centIdCol,
          centVecCol)
        .groupBy("cluster").agg(count(lit(1)).as(out))
    val ha = occupancy(a, "n_a")
    val hb = occupancy(b, "n_b")
    val ta = ha.agg(sum(col("n_a")).as("__ta"))
    val tb = hb.agg(sum(col("n_b")).as("__tb"))
    def share(n: Column, total: Column, side: String): Column =
      when(total.isNull, raise_error(lit(
        s"embeddingJsDivergence: side '$side' has no vectors — its " +
          "cluster shares are undefined")))
        .otherwise(n.cast("double") / total.cast("double"))
    val m = (col("share_a") + col("share_b")) / lit(2.0)
    def half(p: Column): Column =
      when(p > 0, p * log(p / m)).otherwise(lit(0.0))
    centroids.select(col(centIdCol).cast("long").as("cluster"))
      .join(ha, Seq("cluster"), "left")
      .join(hb, Seq("cluster"), "left")
      .select(col("cluster"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("cluster"), col("n_a"), col("n_b"),
        share(col("n_a"), col("__ta"), "a").as("share_a"),
        share(col("n_b"), col("__tb"), "b").as("share_b"))
      .withColumn("js_term", round(
        lit(0.5) * half(col("share_a")) +
          lit(0.5) * half(col("share_b")), 6))
      .orderBy("cluster")
  }
}
