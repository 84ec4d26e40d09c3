package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition every large-scale
  * pipeline runs, expressed as ONE declarative plan so Catalyst sees the
  * whole thing (driver mandate; composes SURVEY §2.4 X1/X2/X5).
  *
  * Stages — each a library operator, chained lazily:
  *   1. language ID filter        (projection, no shuffle)
  *   2. token-count quality gate  (projection, no shuffle)
  *   3. exact dedup, min-id wins  (one shuffle on fingerprint)
  *   4. near-dup removal: MinHash→LSH candidates → exact-Jaccard verify →
  *      drop the higher id of each verified pair (the candidates are a
  *      tiny fraction of the corpus, so the expensive verify never runs
  *      on the n² pair space; the final anti-join is broadcast-size)
  *
  * Scale posture: stages 1–2 are map-side only; stage 3 shuffles once,
  * keyed on content fingerprint; stage 4 reuses the [[Dedup]] shapes
  * (single-pass LSH banding, candidate-only verification).
  */
object Pipelines {

  /** Returns the surviving documents as (idCol, pred, n_tokens), one row
    * per kept doc. `keepLang` filters on the n-gram-free language ID;
    * `minTokens` is the quality gate; `maxDupNgramRatio` (when set) adds
    * the Gopher-style repetition gate — another row-local projection, so
    * it too runs BEFORE any shuffle; `jaccardThreshold` drives near-dup
    * removal (higher id of a verified pair is dropped); `benchmark`
    * (when set) appends [[Decontaminate]] as the final stage — the
    * eval-set shingles broadcast and the near-dup survivors are the only
    * rows that pay the contamination count, since the verdict is per-doc
    * and gate-independent. */
  def curate(df: DataFrame, idCol: String, textCol: String,
      keepLang: String = "en", minTokens: Long = 10,
      jaccardThreshold: Double = 0.5,
      maxDupNgramRatio: Option[Double] = None,
      benchmark: Option[DataFrame] = None, benchTextCol: String = "text",
      deconShingleN: Int = 8, deconFlagAt: Double = 0.5): DataFrame = {
    // Gates FIRST: they are row-local projections, so Catalyst keeps
    // them next to the scan and the fingerprint shuffle only carries
    // surviving rows (dedup-before-gates reads identically — exact
    // copies share text so gates decide identically — but a window
    // blocks filter pushdown, measured ~50% slower end-to-end).
    val gated = TextAnalysis.withLangId(df, textCol, "pred")
      .withColumn("__ntok", TextAnalysis.tokenCount(col(textCol)))
      .filter(col("pred") === keepLang && col("__ntok") >= minTokens)
    val kept = maxDupNgramRatio.fold(gated) { mx =>
      TextAnalysis.withDupNgramRatio(gated, textCol, 2, "__r2")
        .filter(col("__r2") <= mx).drop("__r2")
    }
    // exact dedup — lowest id per fingerprint survives. The result is
    // PINNED (Checkpoints.pin): `deduped` feeds two consumers (the
    // near-dup pair flow and the final anti-join), and an unpinned
    // frame replays the whole gates→tokenize→fingerprint-shuffle chain
    // per consumer (measured r16: the q79 entry planned 14 corpus
    // scans; pinned, the chain runs once). At cluster scale the pin is
    // the staged-intermediate pattern (guide §3.3/§5): executor-local
    // by default, a durable checkpoint under graft.checkpoint.dir —
    // one materialization of the gated survivors versus re-running the
    // gate chain and its fingerprint exchange per downstream pass.
    val deduped = Checkpoints.pin(
      Dedup.exactKeepMinId(kept, idCol, textCol)
        .select(col(idCol), col(textCol), col("pred"), col("__ntok")))
    val pairs = Dedup.verifiedNearDups(
      deduped.select(col(idCol), col(textCol)), idCol, textCol,
      jaccardThreshold)
    val dropIds = pairs.select(col("doc_b").as(idCol)).distinct()
    val survivors = deduped.join(dropIds, Seq(idCol), "left_anti")
    // contamination flags come from the RAW corpus, not the survivors:
    // the verdict is per-doc and gate-independent, and the survivors
    // subtree is unmaterialized — feeding it to Decontaminate would
    // recompute the whole gates→dedup→near-dup pipeline a second time
    // (measured: 9 scans instead of 6 on the catalog entry)
    val deconned = benchmark.fold(survivors) { b =>
      val contaminated = Decontaminate.overlap(
          df.select(col(idCol), col(textCol)), idCol, textCol,
          b, benchTextCol, deconShingleN, deconFlagAt)
        .filter(col("contaminated"))
        .select(col("doc_id").as("__contam"))
      survivors.join(contaminated,
        survivors(idCol) === col("__contam"), "left_anti")
    }
    deconned.select(col(idCol), col("pred"), col("__ntok").as("n_tokens"))
  }

  /** Curation v4: Gopher quality gate → exact dedup (min id) → TRAINED
    * classifier gate — the modern recipe where the last stage is a
    * model fitted ON the corpus being curated ([[QualityFilter]]; the
    * FineWeb/LLaMA pattern: clean mechanically, then let a trained head
    * pick the target-like slice). The gate→dedup chain is ONE lazy
    * plan, but each pass that consumes it recomputes it — trainLda's
    * moment job, the serving gate's score + semi sides: multiple
    * recomputations of the gate chain and its fingerprint shuffle per
    * call. Fine at oracle scale; at 100 TB pass `stagingDir` — the
    * gated+deduped table is written to parquet ONCE and every
    * downstream pass (training moments, scoring, the gate's semi join)
    * scans the materialized columnar form instead of re-running the
    * Gopher gate and the dedup shuffle. One extra write + cheap
    * re-scans versus ~4 corpus-wide recomputations: at scale the
    * staged form wins by the width of the cleaning chain. Results are
    * row-identical either way (the stage is deterministic); the
    * staging write uses the session's default parquet codec and
    * OVERWRITES `stagingDir`.
    *
    * Returns the surviving rows of `df`'s gated+deduped form:
    * (idCol, sourceCol, textCol, n_tokens).
    *
    * NULL-`sourceCol` semantics (r16 fusion, spec-pinned in
    * [[QualityFilter]]): rows whose `sourceCol` is null have no defined
    * class under `isin(targetSources)`, are EXCLUDED from the
    * classifier fit, and are DROPPED from the output — the fused
    * `trainLdaAndGate` gate keeps only rows whose posterior clears
    * `minProb`, and a null-predicate row never gets a posterior. (The
    * pre-r16 two-step composition scored such rows against the fitted
    * model and could keep them.) Label your sources, or filter/imputed
    * null sources upstream if they must be scored. */
  def curateWithClassifier(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targetSources: Seq[String],
      minTokens: Long = 50, minStopHits: Int = 2,
      numBuckets: Int = 1024, minProb: Double = 0.5,
      stagingDir: Option[String] = None): DataFrame = {
    require(targetSources.nonEmpty, "targetSources must not be empty")
    val gated = TextAnalysis.withGopherQuality(df, textCol,
        minTokens = minTokens, minStopHits = minStopHits)
      .filter(col("gopher_pass"))
      .select(col(idCol), col(sourceCol), col(textCol), col("n_tokens"))
    val cleaned = Dedup.exactKeepMinId(gated, idCol, textCol)
    // Without a stagingDir the gated+deduped form is PINNED instead of
    // recomputed: it feeds ~4 downstream passes (trainLda's moment job,
    // the scoring side and both sides of the gate's semi join), each of
    // which otherwise replays the Gopher gate and the dedup shuffle
    // (measured r16: 8 corpus scans → 2 on the catalog entry). The pin
    // is the in-memory form of the staged table — durable under
    // graft.checkpoint.dir; rows identical either way.
    val deduped = stagingDir.fold(Checkpoints.pin(cleaned)) { dir =>
      cleaned.write.mode("overwrite").parquet(dir)
      df.sparkSession.read.parquet(dir)
    }
    // fused fit+gate (r16): one pinned feature pass over the staged
    // corpus instead of one per trainer class plus one for scoring —
    // bit-identical head (spec-pinned in QualityFilter)
    QualityFilter.trainLdaAndGate(deduped, idCol, textCol,
      posPred = col(sourceCol).isin(targetSources: _*),
      numBuckets = numBuckets, minProb = minProb)
  }

  /** Materialize a training recipe to disk: per-source epoch repeats
    * ([[Sampling.repeatBySource]]) → deterministic global shuffle
    * ([[Sampling.withShuffleKey]] on `(id, epoch)`, so a doc's copies
    * scatter across shards) → range-sharded sorted parquet
    * ([[graft.QuackIO.writeShards]]). The repeats and the shuffle key
    * are projections at the scan; the only exchange is the range
    * partitioner of the final write (plus its boundary-sampling pass) —
    * the minimum for a total-order layout. Contract: the GLOBAL row
    * order is reproducible (same rows, same keys, every run/cluster);
    * file SPLIT POINTS are not — `repartitionByRange` samples its
    * boundaries from the input's partitioning, so per-file contents
    * can differ across cluster sizes. Checksums belong on the sorted
    * row stream, not on files. ≤ `maxRecordsPerFile` rows per file. */
  def materializeRecipe(df: DataFrame, idCol: String, sourceCol: String,
      repeats: Map[String, Int], dir: String, shards: Int,
      maxRecordsPerFile: Long, defaultRepeat: Int = 1,
      salt: String = "shuffle"): Unit = {
    val repeated =
      Sampling.repeatBySource(df, sourceCol, repeats, defaultRepeat)
    val keyed = Sampling.withShuffleKey(repeated,
      concat_ws(":", col(idCol), col("epoch")), salt)
    graft.QuackIO.writeShards(keyed, dir, "shuffle_key", shards,
      maxRecordsPerFile)
  }

  /** Quantile-calibrated quality gate: keep rows whose `scoreCol` sits at
    * or above the corpus's `q`-quantile — "keep the best (1-q) fraction"
    * without hand-picking a threshold that drifts with every corpus mix.
    *
    * The cutoff is a one-row aggregate broadcast back over the corpus, so
    * the whole gate is one aggregation pass plus one filtered scan.
    *
    * `exact = false` (default) measures the cutoff with
    * `percentile_approx` — a mergeable sketch whose partial aggregation
    * scales to 100 TB. `exact = true` uses the exact interpolating
    * percentile, which buffers every value of its (single) group on one
    * reducer: right for tests and oracle parity, wrong at corpus scale.
    */
  def keepTopQuantile(df: DataFrame, scoreCol: String, q: Double,
      exact: Boolean = false): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q must be in (0, 1), got $q")
    val fn = if (exact) "percentile" else "percentile_approx"
    // both expr() and col() parse attribute names, so quote once for both
    val qn = "`" + scoreCol.replace("`", "``") + "`"
    val cut = df.agg(
      expr(s"$fn($qn, $q)").cast("double").as("__cut"))
    df.crossJoin(broadcast(cut))
      .filter(col(qn).cast("double") >= col("__cut"))
      .drop("__cut")
  }

  /** Keep the best documents until `keepBp` basis points of the
    * corpus's TOKENS are retained — the budget a training recipe
    * actually specifies ([[keepTopQuantile]] keeps a fraction of
    * DOCUMENTS, which over-represents short docs; a token budget is
    * the apples-to-apples gate). Greedy by `scoreCol` desc (id
    * tiebreak): a doc is kept iff the tokens BEFORE it fit under the
    * budget, so the doc that crosses the boundary is included and at
    * least one doc survives any positive budget. All-integer
    * arithmetic — `(running − w) · 10000 < keepBp · W` — so membership
    * is engine-bit-identical at any scale.
    *
    * Scale: rides [[graft.operators.Rank.globalRunningSum]] (ONE
    * reused range exchange, no single-task window); the slim
    * (score, id, weight) frame joins back to the full rows by id
    * (LEFT SEMI). Null scores/weights and negative weights are
    * excluded up front (they have no place in a budget). */
  def keepTopTokenBudget(df: DataFrame, idCol: String, scoreCol: String,
      weightCol: String, keepBp: Int): DataFrame = {
    require(keepBp >= 1 && keepBp <= 9999,
      s"keepTopTokenBudget: keepBp must be in [1, 9999], got $keepBp")
    val slim = df
      .filter(col(scoreCol).isNotNull && col(weightCol).isNotNull &&
        col(weightCol) >= 0)
      .select(col(scoreCol).as("__sc"), col(idCol).as("__id"),
        col(weightCol).cast("long").as("__w"))
    val run = graft.operators.Rank.globalRunningSum(slim,
      Seq(col("__sc").desc, col("__id").asc, col("__w").asc), "__w",
      outCol = "__run")
    val tot = run.agg(sum(col("__w")).as("__tot"))
    val kept = run.crossJoin(broadcast(tot))
      .filter((col("__run") - col("__w")) * 10000L <
        lit(keepBp.toLong) * col("__tot"))
      .select(col("__id"))
    df.join(kept, df(idCol) === kept("__id"), "left_semi")
  }

  /** UL2 mixture-of-denoisers (Tay et al. 2022 §3): every document is
    * deterministically routed — [[TextAnalysis.splitBucket]] on its id,
    * so the assignment survives any engine/run/cluster — to ONE of the
    * three denoising objectives and emitted as a training pair tagged
    * `objective`:
    *
    *  - `r` (regular): [[TextAnalysis.spanCorrupt]] at the T5 defaults
    *    (≈15% masked, mean span ≥3);
    *  - `x` (extreme): spanCorrupt at aggressive knobs (≈50% masked,
    *    longer spans — `startEvery=8, spanLen=4`);
    *  - `s` (sequential): [[TextAnalysis.prefixLmSplit]] continuation
    *    pairs.
    *
    * Weights set the r:x:s document proportions (UL2's 2:1:1 default
    * here). Per-objective salts decorrelate each generator's hash
    * stream from the router's. Docs with no tokens emit no pair; docs
    * too short to split are absent from the `s` slice ([[TextAnalysis.
    * prefixLmSplit]] contract). Output: `(doc_id, objective,
    * input_text, target_text)`.
    *
    * Scale shape: three filtered zero-exchange projection branches over
    * the two-column scan, unioned — no shuffle anywhere; the routing
    * predicate sits at each scan, so every branch reads only its
    * slice's row groups when the layout allows. */
  /** Leakage-free train/eval split: assign NEAR-DUP GROUPS, not
    * documents, to splits — the split hygiene step serious eval
    * methodology requires (splitting by doc leaks every near-duplicate
    * pair across the boundary, and "held-out" rows the model saw
    * near-verbatim inflate eval; Lee et al. 2022's dedup argument
    * applied to the split). Groups come from the transitive closure of
    * LSH near-dup candidates ([[Dedup.minhashCandidates]] →
    * [[Connected.components]]); a doc with no candidate pair is its own
    * group. Each GROUP then draws a deterministic md5 bucket
    * ([[Sampling]]'s `md5(salt|key) mod 10000` convention): under
    * `evalBp` → eval, else train — so membership is reproducible
    * across engines, runs, and cluster sizes, and by construction NO
    * candidate pair crosses the boundary.
    *
    * Output: `(idCol, group, split)` one row per input doc. Audit
    * cross-split leakage by joining the pair list against this
    * assignment — zero rows, which the spec and the catalog entry pin.
    *
    * Scale: the LSH banding is the [[Dedup]] one-pass shape; the
    * component iteration touches only candidate-pair ids (a tiny
    * fraction of the corpus); the split itself is a pure projection.
    * The doc→group join is id-keyed; everything else is
    * candidate-sized. */
  def leakageFreeSplit(df: DataFrame, idCol: String, textCol: String,
      evalBp: Int, salt: String = "split", k: Int = 8,
      rowsPerBand: Int = 2, shingleN: Int = 3): DataFrame = {
    require(evalBp >= 0 && evalBp <= 10000,
      s"leakageFreeSplit: evalBp must be in [0, 10000], got $evalBp")
    val pairs = Dedup.minhashCandidates(df, idCol, textCol, k,
      rowsPerBand, shingleN)
    val comp = Connected.components(pairs, "doc_a", "doc_b")
      .select(col("id").as("__cid"), col("comp").as("__comp"))
    val draw = TextAnalysis.md5Head(concat(lit(salt), lit("|"),
      col("group").cast("string"))) % 10000
    df.select(col(idCol))
      .join(comp, col(idCol) === col("__cid"), "left")
      .select(col(idCol),
        coalesce(col("__comp"), col(idCol).cast("long")).as("group"))
      .withColumn("split",
        when(draw < evalBp, lit("eval")).otherwise(lit("train")))
  }

  /** Leakage-free K-FOLD assignment — [[leakageFreeSplit]] generalized
    * from a two-way draw to cross-validation folds: near-dup GROUPS
    * (the LSH-candidate transitive closure), not documents, draw the
    * fold, so no candidate pair ever crosses a fold boundary and
    * "held-out" can never mean "seen near-verbatim". The deterministic
    * md5 draw makes folds reproducible across runs and engines.
    * Same scale shape as the split (banding one-pass, component
    * iteration candidate-sized, assignment a pure projection).
    * Output: `(idCol, group, fold)` with fold in [0, folds). */
  def kFoldSplit(df: DataFrame, idCol: String, textCol: String,
      folds: Int, salt: String = "kfold", k: Int = 8,
      rowsPerBand: Int = 2, shingleN: Int = 3): DataFrame = {
    require(folds >= 2 && folds <= 1000,
      s"kFoldSplit: folds must be in [2, 1000], got $folds")
    val pairs = Dedup.minhashCandidates(df, idCol, textCol, k,
      rowsPerBand, shingleN)
    val comp = Connected.components(pairs, "doc_a", "doc_b")
      .select(col("id").as("__cid"), col("comp").as("__comp"))
    df.select(col(idCol))
      .join(comp, col(idCol) === col("__cid"), "left")
      .select(col(idCol),
        coalesce(col("__comp"), col(idCol).cast("long")).as("group"))
      .withColumn("fold",
        TextAnalysis.md5Head(concat(lit(salt), lit("|"),
          col("group").cast("string"))) % folds)
  }

  def denoisingMixture(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[Int] = Seq(2, 1, 1), salt: String = "ul2")
      : DataFrame = {
    require(weights.size == 3,
      s"weights must be (r, x, s) — exactly 3, got ${weights.size}")
    val bucket = TextAnalysis.splitBucket(col(idCol), weights, salt)
    val base = df.withColumn("__obj", bucket)
    def tag(d: DataFrame, obj: String) =
      d.select(col("doc_id"), lit(obj).as("objective"),
        col("input_text"), col("target_text"))
    val r = tag(TextAnalysis.spanCorrupt(
        base.filter(col("__obj") === 0), idCol, textCol,
        startEvery = 20, spanLen = 3, salt = s"$salt-r")
      .filter(col("n_tokens") > 0), "r")
    val x = tag(TextAnalysis.spanCorrupt(
        base.filter(col("__obj") === 1), idCol, textCol,
        startEvery = 8, spanLen = 4, salt = s"$salt-x")
      .filter(col("n_tokens") > 0), "x")
    val sdn = tag(TextAnalysis.prefixLmSplit(
      base.filter(col("__obj") === 2), idCol, textCol,
      salt = s"$salt-s"), "s")
    r.unionByName(x).unionByName(sdn)
  }

  /** One release run's bookkeeping: staged row count, published row
    * count (post-repeats), published file count, and the quality-check
    * report rows that gated the publish. */
  final case class ReleaseSummary(
      nStaged: Long, nPublishedRows: Long, nPublishedFiles: Int,
      checks: Seq[(String, String, Option[Double], Double, Boolean)])

  /** The WHOLE corpus release in one call — the capstone composition a
    * pre-training data team runs per crawl snapshot:
    *
    *   1. Gopher document gate (scan-side projection)
    *   2. fused C4 line filter + global line dedup (`dedupLinesC4`)
    *   3. exact dedup, min-id wins
    *   4. fuzzy benchmark decontamination
    *   5. STAGE: the cleaned table materializes ONCE to `stagingDir` —
    *      every downstream consumer (checks, recipe, card) reads the
    *      parquet, not the five-stage lineage (the q117 lesson)
    *   6. quality-check gate ([[Checks]]) — a FAILING suite ABORTS
    *      before anything publishes; the staging dir remains for
    *      forensics
    *   7. training recipe: per-source epoch repeats → deterministic
    *      shuffle → range-sharded sorted parquet
    *      ([[materializeRecipe]])
    *   8. sidecars under `outDir`: `_card` (per-source ROLLUP data
    *      card) and `_manifest` (footer-only per-file row counts) —
    *      underscore-prefixed, invisible to scans.
    *
    * Cost honesty: the input scans twice (the gate re-runs for the
    * (id, source) join back around the line machinery — column-pruned
    * the second time), the staged table scans three times (checks,
    * recipe, card) — all cheap parquet re-reads, never lineage
    * recomputation. Output rows = Σ survivors × their source's repeat
    * factor. */
  def releaseCorpus(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, bench: DataFrame, benchIdCol: String,
      benchTextCol: String, stagingDir: String, outDir: String,
      repeats: Map[String, Int] = Map.empty, shards: Int = 8,
      maxRecordsPerFile: Long = 1000000L,
      checks: Seq[Checks.Constraint] = Nil,
      minTokens: Long = 50): ReleaseSummary = {
    val spark = docs.sparkSession
    val gated = TextAnalysis.withGopherQuality(docs, textCol,
        minTokens = minTokens)
      .filter(col("gopher_pass"))
      .select(col(idCol), col(textCol), col(sourceCol))
    val lined = Dedup.dedupLinesC4(gated, idCol, textCol)
    val withSrc = lined.join(
      gated.select(col(idCol), col(sourceCol)), Seq(idCol))
    val deduped = Dedup.exactKeepMinId(withSrc, idCol, textCol)
    val cleaned = Decontaminate.fuzzyDecontaminate(deduped, idCol,
      textCol, bench, benchIdCol, benchTextCol)
    cleaned.write.mode("error").parquet(stagingDir)
    val staged = spark.read.parquet(stagingDir)
    val suite =
      if (checks.nonEmpty) checks
      else Seq(Checks.NotNull(idCol), Checks.NotNull(textCol),
        Checks.MinRows(1))
    val report = Checks.run(staged, suite).collect().toSeq
      .map(r => (r.getString(0), r.getString(1),
        Option(if (r.isNullAt(2)) null else r.getDouble(2))
          .map(_.asInstanceOf[Double]),
        r.getDouble(3), r.getBoolean(4)))
    val failed = report.filter(!_._5)
    require(failed.isEmpty,
      s"releaseCorpus: quality checks failed, refusing to publish " +
        s"(staging kept at $stagingDir for forensics): " +
        failed.map(f => s"${f._1}(${f._2}) observed=${f._3}")
          .mkString("; "))
    materializeRecipe(staged, idCol, sourceCol, repeats, outDir,
      shards, maxRecordsPerFile)
    Profiles.dataCard(staged, textCol, Seq(sourceCol))
      .coalesce(1).write.mode("error").parquet(s"$outDir/_card")
    val manifest = FooterStats.fileRowCounts(spark, outDir)
    manifest.coalesce(1).write.mode("error")
      .parquet(s"$outDir/_manifest")
    val mrows = manifest.collect()
    ReleaseSummary(
      nStaged = FooterStats.totalRows(spark, stagingDir)
        .collect().head.getLong(0),
      nPublishedRows = mrows.map(_.getLong(1)).sum,
      nPublishedFiles = mrows.length,
      checks = report)
  }
}
