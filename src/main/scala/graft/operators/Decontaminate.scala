package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (X5): flag training documents whose word
  * n-grams overlap an evaluation/benchmark set — the standard
  * contamination check every pretraining pipeline runs before training
  * (n-gram overlap against held-out eval sets, as popularized by the
  * GPT-3/PaLM appendix methodology).
  *
  * Scale shape (the reason this is engine-worthy): the benchmark side is
  * small by nature — eval sets are KB–MB even when the corpus is 100 TB —
  * so its distinct shingle set builds in a dwarf aggregation and
  * BROADCASTS. The corpus side is touched exactly once: shingle + explode
  * are row-local projections, the membership probe is a broadcast-hash
  * left join (no corpus exchange), and the only corpus shuffle is the
  * final per-doc count keyed on `doc_id`.
  */
object Decontaminate {

  /** Per-document overlap against the benchmark's shingle set.
    *
    * Output: `doc_id`, `n_shingles` (distinct word n-grams in the doc),
    * `n_overlap` (how many of those appear anywhere in the benchmark),
    * `overlap_ratio` (= n_overlap / n_shingles, 0.0 for docs shorter
    * than one shingle), `contaminated` (ratio >= `flagAt`).
    *
    * `shingleN` defaults to 8: long enough that natural re-use of common
    * phrases stays below any sane threshold, short enough to catch
    * verbatim eval questions (the 8–13 range is the published norm).
    */
  def overlap(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      shingleN: Int = 8, flagAt: Double = 0.5,
      broadcastBench: Boolean = true): DataFrame = {
    require(shingleN >= 1, s"shingleN must be >= 1, got $shingleN")
    // broadcastBench=false drops the hint for the rare giant benchmark
    // (the probe becomes a fingerprint-keyed shuffle join instead of
    // forcing an executor-OOM broadcast); eval sets are normally KB-MB,
    // so the broadcast is the default
    val benchShingles0 = benchmark
      .select(TextAnalysis.tokens(col(benchTextCol)).as("__btoks"))
      .select(explode(Dedup.shingles(col("__btoks"), shingleN)).as("__bs"))
      .distinct()
    val benchShingles =
      if (broadcastBench) broadcast(benchShingles0) else benchShingles0
    // coalesce: a NULL text tokenizes to NULL, which would flow through
    // as n_shingles = null / contaminated = null — and a null verdict
    // silently fails BOTH a keep-filter and a drop-filter. Null text is
    // a doc with nothing in it: zero shingles, ratio 0, not contaminated.
    val docShingles = corpus
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        coalesce(array_distinct(Dedup.shingles(col("__toks"), shingleN)),
          array().cast("array<string>")).as("__sh"))
    // explode_outer keeps sub-shingle-length docs (empty array -> one null
    // row) so every input doc appears in the output with n_shingles = 0.
    val probed = docShingles
      .select(col("doc_id"), size(col("__sh")).as("__n"),
        explode_outer(col("__sh")).as("__s"))
      .join(benchShingles, col("__s") === col("__bs"), "left")
    val ratio =
      when(col("n_shingles") === 0, lit(0.0))
        .otherwise(col("n_overlap").cast("double") /
          col("n_shingles").cast("double"))
    probed.groupBy("doc_id")
      .agg(max(col("__n")).cast("long").as("n_shingles"),
        count(col("__bs")).as("n_overlap"))
      .select(col("doc_id"), col("n_shingles"), col("n_overlap"),
        ratio.as("overlap_ratio"),
        (ratio >= flagAt).as("contaminated"))
  }

  /** Roll [[overlap]]'s per-doc verdicts up to a per-group report —
    * the "how contaminated is each source against this benchmark"
    * number a pipeline publishes before training: docs, contaminated
    * docs, contamination fraction, and the mean overlap ratio (summed
    * through DECIMAL(38,15) so the report is partition-order-exact,
    * the [[graft.Queries]] dsum convention). The verdict join moves
    * (id, group) pairs only — never text — and the final aggregation
    * is one group-keyed exchange of small rows. */
  def contaminationReport(corpus: DataFrame, idCol: String,
      textCol: String, groupCol: String, benchmark: DataFrame,
      benchTextCol: String, shingleN: Int = 8,
      flagAt: Double = 0.5): DataFrame = {
    val v = overlap(corpus, idCol, textCol, benchmark, benchTextCol,
      shingleN, flagAt)
    val groups = corpus.select(col(idCol).as("doc_id"),
      col(groupCol).as("group"))
    v.join(groups, Seq("doc_id"))
      .groupBy("group")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("contaminated"), 1L).otherwise(0L))
          .as("n_contaminated"),
        (sum(col("overlap_ratio")
            .cast(org.apache.spark.sql.types.DecimalType(38, 15)))
          .cast("double") / count(lit(1)).cast("double"))
          .as("mean_overlap"))
      .select(col("group"), col("n_docs"), col("n_contaminated"),
        (col("n_contaminated").cast("double") /
          col("n_docs").cast("double")).as("contam_frac"),
        round(col("mean_overlap"), 6).as("mean_overlap"))
  }

  /** The gate form: drop contaminated docs, keep everything else (all
    * original columns). [[overlap]]'s verdict needs the per-doc
    * aggregation, so the survivors left-semi join back onto the corpus
    * by id; at 100 TB the survivor id set is not broadcastable, so this
    * is a key-shuffle semi-join — the same cost class as exact dedup.
    *
    * The join is NULL-SAFE (`<=>`) so the gate agrees with [[overlap]]'s
    * own verdict for null-id docs: a plain equi-join would drop every
    * null-id row unconditionally even when overlap() scores it clean.
    * Caveat (inherited from overlap's groupBy): ALL null-id docs share
    * one verdict — their shingles merge into a single group — so ids
    * should be non-null for per-doc gating; the null-safe form just
    * keeps the two APIs consistent instead of silently stricter. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String,
      shingleN: Int = 8, flagAt: Double = 0.5): DataFrame = {
    val clean = overlap(corpus, idCol, textCol, benchmark, benchTextCol,
      shingleN, flagAt)
      .filter(!col("contaminated")).select(col("doc_id").as("__keep"))
    corpus.join(clean, col(idCol) <=> col("__keep"), "left_semi")
  }

  /** FUZZY decontamination (X5): flag training docs that are MinHash
    * near-duplicates of benchmark docs — paraphrased or lightly-edited
    * eval leakage that [[overlap]]'s exact n-gram membership misses
    * (one changed word kills every n-gram crossing it, but barely moves
    * the Jaccard of the shingle SETS).
    *
    * Candidates come from shared LSH band buckets (the
    * [[Dedup.minhashBands]] projection both dedup pipelines use);
    * each candidate (doc, bench) pair is then verified with exact
    * shingle-set Jaccard, so the verdict is a real similarity, not a
    * banding artifact. Recall follows the (k, rowsPerBand) S-curve:
    * pairs far below the threshold may never collide — that is the
    * approximation being bought.
    *
    * Output: one row per corpus doc — `doc_id`, `best_jaccard` (max
    * over matched bench docs; 0.0 when none collide), `n_bench_matches`
    * (distinct bench docs with verified jaccard ≥ `flagAt`),
    * `contaminated` (best ≥ `flagAt`). Jaccard is an integer-ratio
    * double — engine-exact.
    *
    * Scale shape: the benchmark side (KB–MB by nature) builds
    * signatures + distinct shingle sets in a dwarf plan and BROADCASTS
    * its banded form, shingle set attached. The corpus is scanned once
    * for its own signature/shingle projection; the band join is
    * broadcast-hash (zero corpus exchange — band multiplicity only
    * duplicates jaccard COMPUTE, max/countDistinct absorb it); the only
    * corpus-keyed shuffle carries (doc_id, jaccard, bench_id) rows for
    * matched docs. The final left join re-attaches verdicts to the full
    * id list — ids and scores move, never text. */
  def fuzzyOverlap(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      k: Int = 8, rowsPerBand: Int = 2, shingleN: Int = 3,
      flagAt: Double = 0.5): DataFrame = {
    require(flagAt > 0.0 && flagAt <= 1.0,
      s"fuzzyOverlap: flagAt must be in (0, 1], got $flagAt")
    val benchBands = broadcast(
      Dedup.minhashBands(
          Dedup.sigWithShingles(benchmark, benchIdCol, benchTextCol,
            k, shingleN),
          k, rowsPerBand, carry = Seq("sh"))
        .select(col("doc_id").as("__bench_id"), col("sh").as("__bsh"),
          col("band"), col("bv")))
    val verdicts = Dedup
      .minhashBands(
        Dedup.sigWithShingles(corpus, idCol, textCol, k, shingleN),
        k, rowsPerBand, carry = Seq("sh"))
      .join(benchBands, Seq("band", "bv"))
      .select(col("doc_id"), col("__bench_id"),
        Dedup.jaccard(col("sh"), col("__bsh")).as("__jac"))
      .groupBy("doc_id")
      .agg(max(col("__jac")).as("best_jaccard"),
        countDistinct(when(col("__jac") >= flagAt, col("__bench_id")))
          .as("n_bench_matches"))
    corpus.select(col(idCol).as("doc_id"))
      .join(verdicts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
        coalesce(col("n_bench_matches"), lit(0L)).as("n_bench_matches"),
        coalesce(col("best_jaccard") >= flagAt, lit(false))
          .as("contaminated"))
  }

  /** The gate form of [[fuzzyOverlap]] — [[decontaminate]]'s fuzzy
    * counterpart: drop corpus docs whose best verified jaccard against
    * the benchmark reaches `flagAt`, keep everything else with all
    * columns. Same null-safe id join and shared-null-verdict caveat as
    * [[decontaminate]]. */
  def fuzzyDecontaminate(corpus: DataFrame, idCol: String,
      textCol: String, benchmark: DataFrame, benchIdCol: String,
      benchTextCol: String, k: Int = 8, rowsPerBand: Int = 2,
      shingleN: Int = 3, flagAt: Double = 0.5): DataFrame = {
    val clean = fuzzyOverlap(corpus, idCol, textCol, benchmark,
        benchIdCol, benchTextCol, k, rowsPerBand, shingleN, flagAt)
      .filter(!col("contaminated")).select(col("doc_id").as("__keep"))
    corpus.join(clean, col(idCol) <=> col("__keep"), "left_semi")
  }

  /** SEMANTIC contamination: flag corpus rows whose embedding is
    * cosine-≥-`threshold` close to ANY benchmark embedding —
    * the paraphrase-leakage check n-gram overlap cannot see (an eval
    * question reworded shares no 8-gram but sits next to its source in
    * embedding space).
    *
    * Scale shape: the benchmark collapses to ONE array-of-(vector,
    * norm) row that broadcasts; the corpus side is a pure projection —
    * per row, a higher-order-function sweep over the broadcast array
    * (round-6 cosine per pair, then max — round is monotone, so the
    * per-pair rounding the q30 oracle convention uses commutes with
    * the max). ZERO corpus exchanges, no groupBy, stream-composable.
    * Keep benchmarks in the ≤100k-vector range (each corpus row pays
    * |bench|·dim multiplies); shard the benchmark and OR the flags
    * beyond that.
    *
    * Null/zero-norm corpus vectors produce null/±Inf sims — run
    * [[Embeddings.vectorQualityGate]] upstream (nulls flag false via
    * the coalesce; an empty benchmark flags nothing).
    *
    * Output: corpus row + `max_sim` (round-6 double) + `flagged`. */
  def semanticOverlap(corpus: DataFrame, idCol: String, vecCol: String,
      bench: DataFrame, benchVecCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"semanticOverlap: threshold in (0, 1] required, got $threshold")
    Seq(idCol, vecCol).foreach(c =>
      require(corpus.columns.contains(c),
        s"semanticOverlap: corpus has no '$c' column " +
          s"(columns: ${corpus.columns.mkString(", ")})"))
    Seq("__bench", "__cn", "max_sim", "flagged").foreach(c =>
      require(!corpus.columns.contains(c),
        s"semanticOverlap: corpus already has a '$c' column; rename it"))
    val b = bench.select(col(benchVecCol).as("__bv"))
      .filter(col("__bv").isNotNull)
      .agg(collect_list(struct(col("__bv").as("v"),
        Similarity.norm(col("__bv")).as("n"))).as("__bench"))
    // Fan.out: the per-row |bench|·dim sweep runs inside the corpus
    // scan stage; an under-split corpus serializes it on one core
    // (no-op at production split counts — see Fan)
    Fan.out(corpus).crossJoin(broadcast(b))
      .withColumn("__cn", Similarity.norm(col(vecCol)))
      .withColumn("max_sim",
        array_max(transform(col("__bench"), bb =>
          round(Similarity.dot(col(vecCol), bb("v")) /
            (col("__cn") * bb("n")), 6))))
      .withColumn("flagged",
        coalesce(col("max_sim") >= threshold, lit(false)))
      .drop("__bench", "__cn")
  }

  /** Keeps only corpus rows [[semanticOverlap]] does NOT flag — the
    * gate form. */
  /** Memorization scan (Carlini et al. 2021/2023's verbatim-overlap
    * audit, run in the GENERATION direction): for each candidate text
    * (model samples, eval completions), the fraction of its n-token
    * windows that appear VERBATIM anywhere in the training corpus,
    * plus the longest consecutive matched-window run — `max_run + n−1`
    * tokens is the longest verbatim copied span, the number a
    * memorization report quotes. [[overlap]] answers "is my CORPUS
    * contaminated by the benchmark"; this answers "did my MODEL emit
    * my corpus".
    *
    * Scale shape: the candidate side is small by construction (a
    * sample of generations) — its DISTINCT window set BROADCASTS, the
    * corpus streams ONE scan against it (map-side semi-join, zero
    * corpus exchange — the [[overlap]] discipline), and everything
    * after runs on candidate-sized frames. The run-length fold is a
    * per-candidate-doc window bounded by document length (the
    * positions gaps trick: `pos − row_number` groups consecutive
    * matches).
    *
    * Output per candidate: `(id, n_windows, n_matched, mem_rate,
    * max_run, max_span_tokens)`; candidates shorter than n tokens
    * report 0 windows and a null rate (0/0 — loud, not 0). */
  def memorizationScan(candidates: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"memorizationScan: n must be >= 1, got $n")
    val candWin = candidates
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"),
        posexplode(Dedup.shingles(TextAnalysis.tokens(col(textCol)), n)))
      .select(col("__id"), (col("pos") + 1).as("__pos"),
        col("col").as("__g"))
    val candGrams = candWin.select("__g").distinct()
    val matched = corpus
      .filter(col(textCol).isNotNull)
      .select(explode(Dedup.shingles(TextAnalysis.tokens(col(textCol)),
        n)).as("__g"))
      .join(broadcast(candGrams), Seq("__g"), "left_semi")
      .distinct()
      .withColumn("__hit", lit(1))
    val flagged = candWin
      .join(broadcast(matched), Seq("__g"), "left")
      .select(col("__id"), col("__pos"),
        coalesce(col("__hit"), lit(0)).as("__m"))
    val counts = flagged.groupBy("__id")
      .agg(count(lit(1)).as("n_windows"), sum("__m").as("n_matched"))
    // longest consecutive matched run: pos − row_number over matched
    // positions is constant within a run (per-doc window, length-bounded)
    val runs = flagged.filter(col("__m") === 1)
      .withColumn("__grp", col("__pos") - row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("__id")
          .orderBy("__pos")))
      .groupBy("__id", "__grp").agg(count(lit(1)).as("__run"))
      .groupBy("__id").agg(max("__run").as("max_run"))
    candidates
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__id"))
      .join(counts, Seq("__id"), "left")
      .join(runs, Seq("__id"), "left")
      .select(col("__id").as("id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        when(coalesce(col("n_windows"), lit(0L)) > 0,
          round(col("n_matched").cast("double") /
            col("n_windows").cast("double"), 6)).as("mem_rate"),
        coalesce(col("max_run"), lit(0L)).as("max_run"),
        when(coalesce(col("max_run"), lit(0L)) > 0,
          col("max_run") + lit((n - 1).toLong)).otherwise(lit(0L))
          .as("max_span_tokens"))
  }

  def semanticDecontaminate(corpus: DataFrame, idCol: String,
      vecCol: String, bench: DataFrame, benchVecCol: String,
      threshold: Double): DataFrame =
    semanticOverlap(corpus, idCol, vecCol, bench, benchVecCol, threshold)
      .filter(!col("flagged")).drop("max_sim", "flagged")
}
