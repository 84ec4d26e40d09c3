package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics and TF-IDF term scoring (X5).
  *
  * Scale shape: both operators key their shuffles on `term`. Term
  * frequency is Zipf-skewed by nature, but the aggregations are
  * partial-agg friendly (map-side combine collapses each partition's
  * token stream to its distinct terms before the exchange), and AQE's
  * skew handling covers the head terms; nothing here materializes on
  * the driver.
  */
object Vocab {

  /** Corpus vocabulary: one row per term with collection frequency
    * (`tf_total`, total occurrences) and document frequency (`df`, how
    * many docs contain it), keeping terms appearing in at least `minDf`
    * docs. One scan; shuffles keyed on term only.
    *
    * `countDistinct(doc_id)` is exact; its partial aggregation dedups
    * (term, doc) pairs map-side, so the exchange carries at most one row
    * per distinct (term, doc) — the same row count a dedicated
    * pre-distinct would produce.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
      minDf: Int = 1): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("tf_total"), countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDf)

  /** Standard smoothed log IDF: `ln((n+1)/(df+1)) + 1`. Engine libm
    * implementations differ in final ulps, so oracle-checked pipelines
    * should use [[linearIdf]]; ranking behavior is the same (both are
    * strictly decreasing in df). */
  def logIdf(nDocs: Column, df: Column): Column =
    log((nDocs.cast("double") + 1.0) / (df.cast("double") + 1.0)) + 1.0

  /** Rational IDF `n/df`: one IEEE division of two exact integers —
    * bit-identical across engines, same relative ordering as log IDF. */
  def linearIdf(nDocs: Column, df: Column): Column =
    nDocs.cast("double") / df.cast("double")

  /** Unigram language-model quality score: each doc's mean per-token
    * log2-probability under the corpus's own unigram distribution — the
    * classic "perplexity filter" shape (docs of improbable tokens score
    * low; boilerplate scores high), self-trained so it needs no external
    * model.
    *
    * Output: `doc_id`, `n_tokens`, `logprob` (mean log2 p(token),
    * rounded to 6 — libm log2 differs across engines in final ulps; the
    * per-doc sum is a SORTED fold over the doc's (term, cnt) list so it
    * is also order-independent across partitionings).
    *
    * Plan: groupBy (doc, term) → term-keyed join against the unigram
    * table → per-doc fold. The corpus-total token count joins in as a
    * broadcast 1-row aggregate. Every exchange is keyed on doc or term;
    * nothing materializes on the driver. (Like [[tfIdfTopTerms]], the
    * unigram table is a second aggregation pass rather than a
    * term-partitioned window — head-term window partitions skew to one
    * task, while aggregation+join stays combinable and AQE-splittable.) */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // pinned: docTerms feeds the model aggregation AND the score join —
    // unpinned, the corpus explode + (doc, term) exchange replay per
    // consumer (r16; the staged-intermediate pattern, durable under
    // graft.checkpoint.dir)
    val docTerms = Checkpoints.pin(df
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("cnt")))
    val unigrams = docTerms.groupBy("term").agg(sum(col("cnt")).as("tf"))
    val total = unigrams.select(sum(col("tf")).cast("double").as("n_total"))
    docTerms
      .join(unigrams, "term")
      .crossJoin(broadcast(total))
      .groupBy("doc_id", "n_total")
      .agg(sort_array(collect_list(struct(col("term"), col("cnt"),
        col("tf")))).as("__xs"),
        sum(col("cnt")).as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        round(
          aggregate(col("__xs"), lit(0.0), (acc, x) =>
            acc + x.getField("cnt").cast("double") *
              log2(x.getField("tf").cast("double") / col("n_total"))) /
            col("n_tokens").cast("double"),
          6).as("logprob"))
  }

  /** Bigram language-model quality score — the CCNet-style "perplexity
    * filter" one order up from [[unigramLogProb]]: each doc's mean
    * per-bigram log2-probability under the corpus's own add-α smoothed
    * bigram model, `p(w2|w1) = (c(w1,w2) + α) / (c(w1,·) + α·V)` with
    * `V` the distinct-unigram vocabulary size. Word-order scrambles that
    * a unigram model cannot see (same tokens, broken transitions) score
    * low; formulaic boilerplate scores high. Self-trained: no external
    * model, so the gate needs nothing the corpus itself doesn't carry.
    *
    * Output: `doc_id`, `n_bigrams`, `logprob` (mean log2 p, rounded to
    * 6 — libm log2 differs across engines in final ulps; the per-doc
    * sum folds in SORTED (w1, w2) order so it is partition-order
    * independent). Docs with fewer than 2 tokens have no bigrams and
    * are absent from the output — score them with the unigram model
    * instead.
    *
    * Plan: bigrams are a zero-shuffle projection (`arrays_zip` of the
    * token array against its own tail — no explode-then-window, no
    * self-join); then groupBy (doc, bigram) → two model aggregations
    * keyed on (w1, w2) / w1 → joins back keyed the same way → per-doc
    * fold. `V` is a broadcast 1-row aggregate. Every exchange is keyed
    * on doc or bigram terms; nothing materializes on the driver. Like
    * [[tfIdfTopTerms]], the conditional-count side is a second
    * aggregation pass, not a w1-partitioned window: head-word window
    * partitions serialize to one task at corpus scale, while
    * aggregation+join stays map-side combinable and AQE-splittable. */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val pairs = df
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(zip_with(
        slice(col("__toks"), lit(1),
          greatest(size(col("__toks")) - 1, lit(0))),
        slice(col("__toks"), lit(2),
          greatest(size(col("__toks")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__p"))
      .select(col("doc_id"), col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    // pinned: docPairs feeds the bigram-model aggregation AND the score
    // join — unpinned, the corpus pair-explode + (doc, w1, w2) exchange
    // replay per consumer (r16; unigramLogProb convention)
    val docPairs = Checkpoints.pin(pairs.groupBy("doc_id", "w1", "w2")
      .agg(count(lit(1)).as("cnt")))
    val bigrams = docPairs.groupBy("w1", "w2").agg(sum("cnt").as("bf"))
    val starts = bigrams.groupBy("w1").agg(sum("bf").as("wf"))
    val vocabSize = df.select(
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .agg(countDistinct(col("term")).cast("double").as("v"))
    docPairs
      .join(bigrams, Seq("w1", "w2"))
      .join(starts, Seq("w1"))
      .crossJoin(broadcast(vocabSize))
      .groupBy("doc_id", "v")
      .agg(sort_array(collect_list(struct(col("w1"), col("w2"),
          col("cnt"), col("bf"), col("wf")))).as("__xs"),
        sum(col("cnt")).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"),
        round(
          aggregate(col("__xs"), lit(0.0), (acc, x) =>
            acc + x.getField("cnt").cast("double") *
              log2((x.getField("bf").cast("double") + lit(alpha)) /
                (x.getField("wf").cast("double") + lit(alpha) * col("v")))) /
            col("n_bigrams").cast("double"),
          6).as("logprob"))
  }

  /** Top-`k` terms per document by TF-IDF.
    *
    * Output: `doc_id`, `rank` (1-based), `term`, `score` where
    * `score = (cnt/doclen) * idf(nDocs, df)` — term frequency normalized
    * by document length times the chosen IDF. Ties break on term text so
    * the ranking is total and reproducible.
    *
    * Plan: one scan; groupBy (doc, term) for counts (doclen rides along
    * from a pre-explode projection, so no second per-doc pass); groupBy
    * term for df; the corpus-wide doc count joins in as a broadcast
    * 1-row aggregate; df joins back keyed on term; the final top-k is a
    * row_number window keyed on doc. Every exchange is on a natural key
    * of the stage that needs it.
    *
    * Deliberate trade-off: `df` could avoid its recompute of the
    * (doc, term) aggregate by becoming `count(*) over (partition by
    * term)` — but term frequency is Zipf-skewed, and a window partition
    * is ONE task per term (a head term's partition holds a row per
    * containing doc — billions at corpus scale), whereas the two-pass
    * aggregation combines map-side and AQE splits the skewed join. Extra
    * scans are linear; skew is not.
    */
  /** PMI collocation mining (Church & Hanks 1990): the corpus's
    * adjacent-word pairs ranked by pointwise mutual information,
    * `pmi(w1,w2) = log2( p(w1,w2) / (p(w1)·p(w2)) )` with pair
    * probability over all bigram slots and word probabilities over all
    * token slots. High-PMI pairs are the multi-word units ("new york",
    * "machine learning") a tokenizer, phrase table, or corpus-analysis
    * report wants; a `minCount` floor kills the hapax pairs whose PMI
    * is maximal by accident (the classic PMI failure mode).
    *
    * Output: top-`topK` rows (w1, w2, n, pmi round-6), ordered by
    * ROUNDED pmi desc then pair — ordering on the rounded value keeps
    * the cut engine-portable.
    *
    * Plan: bigrams are the same zero-shuffle `zip_with` projection as
    * [[bigramLogProb]] (no explode-then-window); one aggregation to
    * pair counts, one to word counts; the `minCount` filter shrinks
    * the pair table BEFORE its two word-keyed joins; totals are
    * broadcast 1-row aggregates; the final order-by-limit plans as
    * TakeOrdered (per-partition top-K, no global sort). */
  def pmiCollocations(df: DataFrame, textCol: String,
      minCount: Long = 5L, topK: Int = 100): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val toks = df.filter(col(textCol).isNotNull)
      .select(TextAnalysis.tokens(col(textCol)).as("__toks"))
    val pairs = toks.select(explode(zip_with(
        slice(col("__toks"), lit(1),
          greatest(size(col("__toks")) - 1, lit(0))),
        slice(col("__toks"), lit(2),
          greatest(size(col("__toks")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
    val bf = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    val uni = toks.select(explode(col("__toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("uf"))
    val totals = broadcast(bf.agg(sum("n").as("__b"))
      .crossJoin(broadcast(uni.agg(sum("uf").as("__t")))))
    bf.filter(col("n") >= minCount)
      .join(uni.select(col("w").as("w1"), col("uf").as("uf1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("uf").as("uf2")), Seq("w2"))
      .crossJoin(totals)
      .select(col("w1"), col("w2"), col("n"),
        round(log2((col("n").cast("double") / col("__b")) /
          ((col("uf1").cast("double") / col("__t")) *
            (col("uf2").cast("double") / col("__t")))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Class-based TF-IDF (the BERTopic/c-TF-IDF idea): the terms that
    * CHARACTERIZE each key (source, cluster, language) rather than each
    * document — treat every key's concatenated text as one
    * super-document, weight each term by its within-key rate times
    * ln(nKeys / keysWithTerm), and keep each key's top `k`. The
    * corpus-analysis report behind "what does src7 talk about that the
    * others don't".
    *
    * Output: `key`, `term`, `n` (within-key occurrences), `score`
    * (round-6), top-k per key ordered score desc then term — ties and
    * the cut are deterministic and engine-portable.
    *
    * Scale shape: one explode → (key, term) aggregation (map-side
    * combined — the only corpus-sized exchange), key totals and
    * term→key-counts are aggregations OF that table, nKeys broadcasts
    * as a 1-row aggregate, and the top-k filter is a key-partitioned
    * `row_number` ≤ k that plans as WindowGroupLimit (map-side top-k
    * per key BEFORE the exchange, the [[Sampling.perKeyCap]]
    * precedent); per-partition width is the per-key vocabulary. */
  def cTfIdfTopTerms(df: DataFrame, keyCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val keyTerms = df
      .filter(col(textCol).isNotNull && col(keyCol).isNotNull)
      .select(col(keyCol).as("key"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("key", "term")
      .agg(count(lit(1)).as("n"))
    val keyLen = keyTerms.groupBy("key").agg(sum("n").as("__len"))
    val termKeys = keyTerms.groupBy("term")
      .agg(count(lit(1)).as("__kw"))
    val nKeys = keyLen.agg(count(lit(1)).as("__nkeys"))
    val scored = keyTerms
      .join(keyLen, "key")
      .join(termKeys, "term")
      .crossJoin(broadcast(nKeys))
      .select(col("key"), col("term"), col("n"),
        round((col("n").cast("double") / col("__len")) *
          log(col("__nkeys").cast("double") / col("__kw")), 6)
          .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key"))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
      .orderBy(col("key"), col("score").desc, col("term"))
  }

  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int, idf: (Column, Column) => Column = logIdf): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // pinned: docTerms feeds the document-frequency aggregation AND the
    // score join (r16; unigramLogProb convention)
    val docTerms = Checkpoints.pin(df
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).as("doclen"),
        explode(col("__toks")).as("term"))
      .groupBy("doc_id", "doclen", "term")
      .agg(count(lit(1)).as("cnt")))
    val termDf = docTerms.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    val nDocs = df.select(
      countDistinct(col(idCol)).as("n_docs"))
    val scored = docTerms
      .join(termDf, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        (col("cnt").cast("double") / col("doclen").cast("double") *
          idf(col("n_docs"), col("df"))).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    scored
      .select(col("doc_id"), row_number().over(w).as("rank"),
        col("term"), col("score"))
      .filter(col("rank") <= k)
  }

  /** The corpus's top-`n` terms by collection frequency (ties broken by
    * term, so the cutoff is deterministic), collected to the driver.
    *
    * This IS a driver collect — deliberately: the result is bounded at
    * `n` strings (a KB-scale codebook, like the PQ/k-means centroids),
    * and shipping it as literals lets [[withOovRate]] score the corpus
    * in a pure scan projection with zero joins. The vocabulary
    * AGGREGATION is fully distributed; only the top-`n` rows land on
    * the driver. */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
      n: Int): Seq[String] = {
    require(n >= 1, s"topTerms: n must be >= 1, got $n")
    vocabulary(df, idCol, textCol, minDf = 1)
      .orderBy(col("tf_total").desc, col("term").asc)
      .limit(n)
      .select(col("term"))
      .collect().map(_.getString(0)).toSeq
  }

  /** One learned BPE merge: at `merge_rank`, the adjacent symbol pair
    * (`lhs`, `rhs`) with the highest corpus frequency (`freq`) was fused
    * into the new symbol `lhs+rhs`. */
  case class BpeMerge(merge_rank: Long, lhs: String, rhs: String,
    freq: Long)

  /** Distributed BPE vocabulary training (Sennrich et al. 2016): learn
    * `numMerges` byte-pair merges from the corpus — the tokenizer-
    * training step of every LLM data pipeline, run as Spark jobs.
    *
    * Architecture (the real one): the CORPUS is touched exactly once —
    * one token-keyed shuffle builds the word-frequency table — and all
    * merge iterations run over that vocab-sized table (Sennrich's own
    * formulation trains on word counts, not running text). Each
    * iteration is (a) a pair-count aggregation over the persisted
    * symbol table, (b) a KB-sized ranked-candidate collect (the
    * codebook precedent), (c) fold projections applying the round's
    * merges; the re-segmented table is re-persisted so iteration r
    * never replays folds 1..r-1. The per-iteration complexity class —
    * O(vocab), never O(corpus) — holds for every setting.
    *
    * `batchSize` is the production lever: per round, accept the top-M
    * NON-CONFLICTING pairs from one ranked count (greedy down the
    * (freq DESC, lhs, rhs) order, skipping any pair that shares a
    * symbol with — or whose merged token collides with — an already-
    * accepted pair this round), then apply them all before recounting.
    * Disjoint-symbol merges cannot change each other's pair counts
    * (a merge only creates/destroys pairs touching its own symbols),
    * so each accepted pair's recorded freq is exactly what sequential
    * training would have recounted; conflicting runners-up are simply
    * deferred to the next round's recount. 32k merges at batchSize=256
    * is ~125 count jobs instead of 32k count jobs + 32k collects —
    * scheduler overhead drops two orders of magnitude. `batchSize=1`
    * IS sequential Sennrich (and stays the catalog/oracle pin).
    *
    * Merge application is a single left-to-right greedy fold per word
    * (string accumulator with a leading-space symbol-boundary
    * convention), bit-identical to the DuckDB oracle's `list_reduce`:
    * "a a a a" under merge (a,a) becomes [aa, aa], never the
    * string-replace trap [aa, a, a]. Ties in the argmax break on
    * (freq DESC, lhs, rhs) — deterministic on both engines. All
    * arithmetic is integer/string: fully oracle-exact.
    *
    * Words segment as their code points plus a terminal `</w>` marker
    * (the Sennrich end-of-word convention, so "low" the word and "low"
    * the prefix of "lower" learn different merges). Returns the learned
    * merges in rank order; stops early if the pair space is exhausted. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int,
      modelPartitions: Int = 1, batchSize: Int = 1): Seq[BpeMerge] = {
    require(numMerges >= 1,
      s"bpeTrain: numMerges must be >= 1, got $numMerges")
    require(modelPartitions >= 1,
      s"bpeTrain: modelPartitions must be >= 1, got $modelPartitions")
    require(batchSize >= 1,
      s"bpeTrain: batchSize must be >= 1, got $batchSize")
    val wc = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    // repartition (NOT coalesce) to `modelPartitions`: coalesce is a
    // narrow dependency that would pull the corpus aggregation's FINAL
    // reduce into the same shrunken stage — one task merging every
    // partial count. The extra shuffle moves only the KB–MB word
    // table, keeps the corpus-scale reduce fully parallel, and shrinks
    // the per-iteration jobs (without this, every tiny merge-loop job
    // pays full shuffle-partition task overhead: measured 27 s for 10
    // merges at 32 partitions vs ~4 s at 1). Raise `modelPartitions`
    // for 100M-word vocabularies.
    // ONE job per merge round (r16): the candidate collect is the only
    // action — it materializes the current generation's cache as a side
    // effect, so the eager `count()` the loop used to run per round is
    // gone (2 jobs/round → 1, and the final generation — consumed by
    // nothing — is never materialized at all). The superseded
    // generation stays cached until its CHILD has materialized (the
    // next round's collect), then unpersists: dropping it earlier would
    // recompute the whole fold chain from the scan each round.
    var seg = wc.select(col("word"), col("cnt"),
      concat(split(col("word"), ""), array(lit("</w>"))).as("syms"))
      .repartition(modelPartitions)
      .persist()
    var superseded: Option[DataFrame] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[BpeMerge]
    var exhausted = false
    while (out.size < numMerges && !exhausted) {
      val want = math.min(batchSize, numMerges - out.size)
      // ranked candidates: a bounded KB collect (4·want + 8 covers the
      // conflicting runners-up; any non-conflicting pair beyond the
      // window is simply deferred to the next round's recount)
      val cand = seg
        .select(col("cnt"), explode(zip_with(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          (x, y) => struct(x.as("lhs"), y.as("rhs")))).as("p"))
        .select(col("cnt"), col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .groupBy("lhs", "rhs").agg(sum("cnt").as("freq"))
        .orderBy(desc("freq"), asc("lhs"), asc("rhs"))
        .limit(4 * want + 8).collect()
      // seg's cache is materialized now — its parent is provably dead
      superseded.foreach(_.unpersist(blocking = false))
      superseded = Some(seg)
      if (cand.isEmpty) exhausted = true
      else {
        // greedy top-M non-conflicting: a pair is rejected if it shares
        // a symbol with — or its merged token collides with — anything
        // accepted THIS round (its count may be stale after those apply)
        val used = scala.collection.mutable.HashSet.empty[String]
        val accepted =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        var i = 0
        while (i < cand.length && accepted.size < want) {
          val (lhs, rhs, f) = (cand(i).getString(0), cand(i).getString(1),
            cand(i).getLong(2))
          if (!used(lhs) && !used(rhs) && !used(lhs + rhs)) {
            accepted += ((lhs, rhs, f))
            used += lhs; used += rhs; used += lhs + rhs
          }
          i += 1
        }
        accepted.foreach { case (lhs, rhs, f) =>
          out += BpeMerge(out.size + 1L, lhs, rhs, f)
        }
        seg = accepted.foldLeft(seg) { case (s, (lhs, rhs, _)) =>
          s.withColumn("syms", applyMerge(col("syms"), lhs, rhs))
        }.persist()
      }
    }
    superseded.foreach(_.unpersist(blocking = false))
    seg.unpersist(blocking = false)
    out.toSeq
  }

  /** Left-to-right greedy application of ONE merge to a symbol array.
    * The accumulator is the space-joined symbol string with a leading
    * space per symbol (so the `endsWith(" " + lhs)` boundary test can
    * never match inside a symbol); symbols are whitespace-tokenized and
    * so never contain spaces themselves. */
  private def applyMerge(syms: Column, lhs: String, rhs: String): Column = {
    val folded = aggregate(syms, lit(""), (acc, s) =>
      when(s === lit(rhs) && acc.endsWith(lit(" " + lhs)),
        concat(substr(acc, lit(1), length(acc) - lit(lhs.length)),
          lit(lhs + rhs)))
        .otherwise(concat(acc, lit(" "), s)))
    split(substr(folded, lit(2), length(folded)), " ")
  }

  /** Persist learned merges as a rank-ordered parquet table — the
    * trained-tokenizer artifact ([[AnnIndex]]/`Int8Index` convention:
    * overwrite, one authoritative version per path). Serving jobs
    * [[loadBpeMerges]] instead of re-training; the table doubles as
    * the human-auditable merge log. */
  def saveBpeMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[BpeMerge], dir: String): Unit = {
    require(merges.nonEmpty, "saveBpeMerges: empty merge list — " +
      "nothing was learned; refusing to write an empty model")
    spark.createDataFrame(merges)
      .repartition(1) // KB-scale model: one file, stable read order
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a [[saveBpeMerges]] model, rank order restored. A missing or
    * schema-mismatched path fails loudly via the scan/select. */
  def loadBpeMerges(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[BpeMerge] =
    spark.read.parquet(dir)
      .select(col("merge_rank"), col("lhs"), col("rhs"), col("freq"))
      .orderBy("merge_rank").collect()
      .map(r => BpeMerge(r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  /** Segment a word column with learned merges, applied in rank order —
    * the serving side of [[bpeTrain]]. Pure scan-level expression, zero
    * shuffles; returns the subword symbol array including the `</w>`
    * terminal.
    *
    * The merges ship as ONE array-of-struct literal folded by an outer
    * `aggregate`, with the inner greedy fold (same string semantics as
    * [[applyMerge]], lhs/rhs as column refs instead of literals) nested
    * inside — so the expression tree is CONSTANT-size in `merges.size`.
    * The first version chained `merges.size` nested fold expressions
    * instead, and Catalyst analysis + codegen of that tree cost ~3-4 s
    * PER ACTION at ten merges — more than the entire execution over the
    * vocabulary. */
  def bpeSegment(word: Column, merges: Seq[BpeMerge]): Column = {
    val init = concat(split(word, ""), array(lit("</w>")))
    if (merges.isEmpty) init
    else {
      val table = typedlit(merges.sortBy(_.merge_rank)
        .map(m => (m.lhs, m.rhs)))
      val folded = aggregate(table, array_join(init, " "), (acc, m) => {
        val lhs = m.getField("_1")
        val rhs = m.getField("_2")
        val inner = aggregate(split(acc, " "), lit(""), (a, s) =>
          when(s === rhs && a.endsWith(concat(lit(" "), lhs)),
            concat(substr(a, lit(1), length(a) - length(lhs)), lhs, rhs))
            .otherwise(concat(a, lit(" "), s)))
        substr(inner, lit(2), length(inner))
      })
      split(folded, " ")
    }
  }

  /** Trained-tokenizer budget estimation (X5): per-doc subword count
    * under the merges [[bpeTrain]] learned — the real "how many tokens
    * will this corpus cost" number, where [[TextAnalysis.bpeTokenCount]]
    * is the untrained regex approximation.
    *
    * Serving shape (the one real tokenizers use): segment the
    * DISTINCT-WORD table once — `merges.size` fold projections over
    * O(vocab) rows — then join corpus tokens against that per-word
    * segmentation cache. Exchanges: one word-keyed (distinct + join),
    * one doc-keyed (the count); the fold chain never runs per
    * occurrence. Docs with no tokens (null/empty text) are absent, the
    * [[bigramLogProb]] convention.
    *
    * Output: `doc_id`, `n_words`, `n_bpe_tokens` (includes one `</w>`
    * terminal per word). */
  def withBpeTokenCount(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
    val wordSeg = toks.select(col("word")).distinct()
      .select(col("word"),
        size(bpeSegment(col("word"), merges)).as("n_sub"))
    toks.join(wordSeg, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_words"),
        sum("n_sub").cast("long").as("n_bpe_tokens"))
  }

  /** Tokenizer fertility by key (Ács 2019 / the multilingual-tokenizer
    * fairness metric): subwords emitted per whitespace word under the
    * trained merges, grouped by `keyCol` (language, source, domain). A
    * tokenizer trained on one language's corpus fragments the others —
    * high fertility means those documents consume disproportionate
    * sequence length per word, the standard multilingual budget-bias
    * audit. Also reports `bytes_per_subword` (UTF-8 bytes over subword
    * count — a byte-efficiency view of the same bias).
    *
    * Output: one row per key — `n_docs, n_words, n_subwords, n_bytes,
    * fertility, bytes_per_subword` (round-6 single divisions over
    * integer sums — engine-exact). Keyless (null-key) rows group
    * together as SQL null groups do. Scale: [[withBpeTokenCount]]'s
    * distinct-word segmentation cache (the fold never runs per
    * occurrence), one word-keyed join, then a |keys|-row aggregation;
    * byte lengths ride the same doc scan. */
  def fertilityByKey(df: DataFrame, keyCol: String, textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val base = df.select(col(keyCol).as("key"), col(textCol).as("__t"))
    val toks = base.select(col("key"),
        explode(TextAnalysis.tokens(col("__t"))).as("word"))
      .filter(length(col("word")) > 0)
    val wordSeg = toks.select(col("word")).distinct()
      .select(col("word"),
        size(bpeSegment(col("word"), merges)).as("n_sub"))
    val perKeyTok = toks.join(wordSeg, Seq("word"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_words"), sum("n_sub").as("n_subwords"))
    val perKeyDoc = base.groupBy("key")
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col("__t"))).as("n_bytes"))
    perKeyDoc.join(perKeyTok, Seq("key"), "left")
      .select(col("key"), col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        coalesce(col("n_bytes"), lit(0L)).as("n_bytes"))
      .withColumn("fertility", when(col("n_words") > 0,
        round(col("n_subwords").cast("double") /
          col("n_words").cast("double"), 6)))
      .withColumn("bytes_per_subword", when(col("n_subwords") > 0,
        round(col("n_bytes").cast("double") /
          col("n_subwords").cast("double"), 6)))
      .orderBy("key")
  }

  /** Per-doc out-of-vocabulary rate against a driver-known vocabulary
    * (X5 quality signal: a high OOV fraction against the corpus's own
    * head vocabulary flags gibberish, lang-ID misses, and encoding
    * damage — the CCNet/fastText-era cheap filter). Counts token
    * OCCURRENCES, not distinct types.
    *
    * Output adds `n_tokens`, `n_oov`, `oov_rate` (integer-ratio double,
    * engine-bit-identical; 0.0 for empty/null text — an empty doc has
    * no out-of-vocabulary MASS, gate on `n_tokens` if empties should
    * die).
    *
    * Scale shape: the vocab ships as literals inside the native
    * [[graft.functions.CountInSet]] probe ([[stopwordCount]]'s
    * expression) — one scan, zero joins, zero exchanges. Pair with
    * [[topTerms]] for the self-trained form. */
  def withOovRate(df: DataFrame, textCol: String, vocab: Seq[String])
      : DataFrame = {
    require(vocab.nonEmpty, "withOovRate: vocab must not be empty")
    df.withColumn("__toks",
        when(col(textCol).isNotNull,
          TextAnalysis.tokens(col(textCol))))
      .withColumn("n_tokens",
        coalesce(size(col("__toks")).cast("long"), lit(0L)))
      .withColumn("n_oov",
        when(col("n_tokens") > 0, col("n_tokens") -
          TextAnalysis.stopwordCount(col("__toks"), vocab))
          .otherwise(lit(0L)))
      .withColumn("oov_rate",
        when(col("n_tokens") > 0,
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .drop("__toks")
  }

  /** BM25 retrieval scoring against a seed-term set (Robertson et al.,
    * Okapi BM25) — the LEXICAL data-selection operator: "find the
    * slice of the crawl that looks like this domain" from nothing but
    * seed terms, the sparse sibling of the embedding path
    * ([[Similarity.cosineTopK]]) and the trained heads
    * ([[QualityFilter]]/[[Dsir]] need a target CORPUS; this needs only
    * a term list). Per doc: `Σ_t idf(t) · tf·(k1+1) /
    * (tf + k1·(1−b+b·dl/avgdl))` with the standard
    * `idf = log2(1 + (N−df+0.5)/(df+0.5))`, lowercase
    * whitespace tokens.
    *
    * Output: `(doc_id, n_hit_terms, bm25)` rounded to 6 (libm log2
    * ulps — [[unigramLogProb]] convention); per-term scores sum
    * through DECIMAL(38,15), so the total is partition-order-exact.
    * Docs containing NO query term are absent (their score is 0 —
    * union them back upstream if every doc needs a row). NULL-text
    * docs are excluded from the corpus statistics too (they can carry
    * no terms; counting them in N while their null length skips
    * `avgdl` would deflate every length normalization).
    *
    * Scale shape: the corpus explode filters to the query terms
    * BEFORE any exchange (a thousand-term query keeps millions of
    * tokens per doc out of the shuffle), so the only corpus-sized
    * exchanges are the (doc, term) tf-aggregation and the doc-keyed
    * score sum; the per-term document frequencies (≤ |query| rows)
    * and the 1-row corpus stats broadcast. The doc-length pass is a
    * scan-only projection — no second explode. */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(queryTerms.nonEmpty, "bm25Scores: queryTerms must not be empty")
    require(k1 > 0, s"k1 must be positive, got $k1")
    require(b >= 0 && b <= 1, s"b must be in [0, 1], got $b")
    val dec = org.apache.spark.sql.types.DecimalType(38, 15)
    val q = queryTerms.map(_.toLowerCase).distinct
    val toks = (t: Column) =>
      filter(TextAnalysis.tokens(lower(t)), x => length(x) > 0)
    val lens = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(toks(col(textCol))).as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl").cast(dec)).as("sum_dl"))
    val docTerms = df
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__ts"))
      .select(col("doc_id"), size(col("__ts")).as("dl"),
        explode(col("__ts")).as("term"))
      .filter(col("term").isInCollection(q))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfTab = docTerms.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log2(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfd = col("tf").cast("double")
    val w = idf * (tfd * lit(k1 + 1.0)) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) *
        col("dl").cast("double") / avgdl))
    docTerms.join(broadcast(dfTab), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__w", w)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_terms"),
        sum(col("__w").cast(dec)).as("__s"))
      .select(col("doc_id"), col("n_hit_terms"),
        round(col("__s").cast("double"), 6).as("bm25"))
  }

  /** Global BM25 top-k (score DESC, id ASC tie-break) with a `rank`
    * column: the corpus ranking plans as a TakeOrdered — per-partition
    * heaps, never a full sort — and only the ≤ k surviving rows pay
    * the row_number window (single-task over a shortlist by
    * construction; feeds [[Similarity.rrfFuse]] directly). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    bm25Scores(df, idCol, textCol, queryTerms, k1, b)
      .orderBy(col("bm25").desc, col("doc_id")).limit(k)
      // `__`-staged order columns: the rank window is bounded to ≤ k
      // rows by the limit above — the staging-column convention marks
      // it exempt under UnpartitionedWindowGuard's fail mode
      .withColumn("__s", col("bm25")).withColumn("__sid", col("doc_id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__s").desc, col("__sid"))).cast("long"))
      .drop("__s", "__sid")
  }

  /** Token↔label mutual information (the information-gain feature
    * selector of Yang & Pedersen 1997) — "which tokens MARK the
    * label": MI in bits between per-document token PRESENCE and a
    * boolean label, the vocabulary-mining companion to the quality
    * classifiers (what did the gate learn? which tokens leak the
    * split?). Per token the 2×2 presence×label table comes from
    * integer document counts; `MI = Σ_cells (n_ij/N)·log2(N·n_ij/
    * (n_i·n_j))` with empty cells contributing 0.
    *
    * Scale: one corpus pass (per-doc DISTINCT tokens explode →
    * token-keyed count, map-combined; the label totals ride a 1-row
    * broadcast); `topK` selection is orderBy+limit —
    * TakeOrderedAndProject, no global sort, no window.
    *
    * Parity: each cell term quantizes to a 1e-9 long (log2 of a
    * ratio of exact integers — a 1-ulp libm divergence flips a
    * quantized value w.p. ~1e-7 per term; the sum of 4 longs is
    * association-free) and the ranking orders by the quantized value
    * with a term tiebreak, so top-k membership cannot drift. Output:
    * `(term, df, d1, mi)` — docs containing the term, of which
    * label-true, MI in bits (round-6) — mi-descending. */
  def tokenLabelMi(df: DataFrame, idCol: String, textCol: String,
      label: Column, minDf: Long = 1L, topK: Int = 100): DataFrame = {
    require(minDf >= 1, s"tokenLabelMi: minDf must be >= 1, got $minDf")
    require(topK >= 1, s"tokenLabelMi: topK must be >= 1, got $topK")
    val base = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull &&
        label.isNotNull)
      .select(col(idCol).as("__id"), col(textCol).as("__text"),
        label.cast("boolean").as("__y"))
    val totals = base.agg(count(lit(1)).as("__N"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("__N1"))
    val perTok = base
      .select(col("__y"),
        explode(array_distinct(TextAnalysis.tokens(col("__text"))))
          .as("term"))
      .filter(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("d1"))
      .filter(col("df") >= minDf)
    // 2×2 cells: n11=d1, n10=df−d1, n01=N1−d1, n00=N0−(df−d1)
    def cell(nij: Column, ni: Column, nj: Column, bigN: Column)
        : Column = {
      val t = nij.cast("double") / bigN.cast("double") *
        log2(bigN.cast("double") * nij.cast("double") /
          (ni.cast("double") * nj.cast("double")))
      when(nij > 0, floor(t * lit(1e9) + lit(0.5)).cast("long"))
        .otherwise(lit(0L))
    }
    val scored = perTok.crossJoin(broadcast(totals))
      .withColumn("__n0", col("__N") - col("__N1"))
      .withColumn("__d0", col("df") - col("d1"))
      .withColumn("__miq",
        cell(col("d1"), col("df"), col("__N1"), col("__N")) +
        cell(col("__d0"), col("df"), col("__n0"), col("__N")) +
        cell(col("__N1") - col("d1"), col("__N") - col("df"),
          col("__N1"), col("__N")) +
        cell(col("__n0") - col("__d0"), col("__N") - col("df"),
          col("__n0"), col("__N")))
    scored.orderBy(desc("__miq"), asc("term")).limit(topK)
      .select(col("term"), col("df"), col("d1"),
        round(col("__miq").cast("double") / lit(1e9), 6).as("mi"))
  }

  /** Pairwise SOURCE similarity by top-k vocabulary Jaccard — the
    * corpus-dedup triage matrix ("which feeds are the same site
    * syndicated twice?") that decides where to point the expensive
    * near-dup pipelines first: per source the top-`k` terms by
    * frequency, then every source pair's `|∩| / |∪|` over those term
    * sets. Cheap by construction — the pair join runs on ≤ k rows per
    * source, never on documents.
    *
    * Scale: one (key, term) count aggregation; the per-key top-k rides
    * a key-partitioned `row_number` that Spark plans as a map-side
    * WindowGroupLimit (the [[graft.operators.Sampling.perKeyCap]]
    * precedent — each task keeps k rows per key before the exchange);
    * the pair join is term-keyed over the k-per-source survivors.
    * Integer set sizes, one exact division (round 6).
    *
    * Output: `(key_a, key_b, n_a, n_b, shared, jaccard)` with
    * `key_a < key_b`; pairs sharing nothing are absent (their Jaccard
    * is 0 and the all-pairs spine is the caller's cross join). */
  def sourceSimilarity(df: DataFrame, keyCol: String, idCol: String,
      textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"sourceSimilarity: k must be >= 1, got $k")
    val counts = df
      .filter(col(textCol).isNotNull)
      .select(col(keyCol).cast("string").as("__k"),
        explode(TextAnalysis.tokens(col(textCol))).as("__term"))
      .filter(col("__term") =!= "")
      .groupBy("__k", "__term").agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__k"))
      .orderBy(col("__cnt").desc, col("__term").asc)
    val tops = counts
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("__k"), col("__term"))
    val sizes = tops.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
    val shared = tops.as("a")
      .join(tops.as("b"), col("a.__term") === col("b.__term") &&
        col("a.__k") < col("b.__k"))
      .groupBy(col("a.__k").as("key_a"), col("b.__k").as("key_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("__k").as("key_a"), col("__n").as("n_a")),
        "key_a")
      .join(sizes.select(col("__k").as("key_b"), col("__n").as("n_b")),
        "key_b")
      .select(col("key_a"), col("key_b"), col("n_a"), col("n_b"),
        col("shared"),
        round(col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Cross-snapshot vocabulary drift — the term-level view of what
    * [[graft.operators.Profiles.psi]]/KS see only as a number: the two
    * snapshots' top-`k` term tables full-outer-joined into `new` /
    * `lost` / `common` rows with both counts and both ranks, so "the
    * crawl started saying 'casino'" is one grep away. Ranks break
    * ties on the term (total order, engine-replayable).
    *
    * Scale: each side is one map-combined term count into a
    * TakeOrdered top-k heap (no corpus sort); the row_number windows
    * run on the ALREADY-LIMITED k-row frames (bounded — the `__`
    * staging marks the guard exemption) and the final join touches
    * ≤ 2k rows. Output: `(term, status, cnt_a, cnt_b, rank_a,
    * rank_b)` — absent-side counts/ranks null. */
  def vocabDrift(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"vocabDrift: k must be >= 1, got $k")
    def top(df: DataFrame, cnt: String, rk: String): DataFrame = {
      val capped = vocabulary(df, idCol, textCol, minDf = 1)
        .select(col("term"), col("tf_total").as("__cnt"))
        .orderBy(col("__cnt").desc, col("term").asc)
        .limit(k)
        .withColumn("__term", col("term"))
      // k-row frame: the __-staged order marks the bounded-window
      // guard exemption (the FooterStats convention)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("__cnt").desc, col("__term").asc)
      capped.withColumn(rk, row_number().over(w).cast("long"))
        .withColumnRenamed("__cnt", cnt).drop("__term")
    }
    top(a, "cnt_a", "rank_a")
      .join(top(b, "cnt_b", "rank_b"), Seq("term"), "full_outer")
      .select(col("term"),
        when(col("cnt_a").isNull, lit("new"))
          .when(col("cnt_b").isNull, lit("lost"))
          .otherwise(lit("common")).as("status"),
        col("cnt_a"), col("cnt_b"), col("rank_a"), col("rank_b"))
  }
}
