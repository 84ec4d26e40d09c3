package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (SURVEY.md §2.4
  * X1/X2): exact (hash-groupBy), MinHash+LSH banding, SimHash, and exact
  * n-gram Jaccard verification.
  *
  * Scale posture (100 TB design point):
  *  - everything is shuffle-on-key DataFrame ops — no driver collects, no
  *    cross joins; LSH candidate generation is ONE aggregation keyed on
  *    (band, value) followed by per-bucket pair expansion, so the whole
  *    corpus is shuffled exactly once and nothing is computed twice (a
  *    naive bands-self-join would recompute the signature pipeline on both
  *    sides and double-scan);
  *  - intermediate arrays (tokens, shingles) are materialized as real
  *    attributes in their own projections, NOT inlined expressions — an
  *    inlined `split()` re-evaluates per transform-lambda element (O(n²)
  *    per doc) and the duplicated subtree blows up codegen;
  *  - signatures are fixed-width (k columns) per doc: the groupBy(doc)
  *    aggregation map-side combines, so the shuffle carries one row per
  *    doc, not one per shingle;
  *  - MD5 is the hash family (seeded by prefix) so results are
  *    reproducible across engines and runs — the DuckDB oracle replays the
  *    exact same arithmetic;
  *  - known LSH caveat at scale: a pathological bucket (thousands of
  *    identical docs) expands quadratically — cap with `maxBucket` which
  *    drops oversized buckets (they are exact-dup territory, handled by
  *    [[exact]] first in a real pipeline).
  */
object Dedup {

  /** X1 exact dedup: one representative (min id) per fingerprint.
    * Returns (fingerprint, keep_id, n_copies). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** X1 exact dedup, ROW-PRESERVING form: keep the min-id row of every
    * fingerprint group with all input columns intact — the in-pipeline
    * shape ([[exact]] returns the per-group summary instead; the
    * curation pipelines and the q109 composition all gate then dedup
    * then keep flowing). One shuffle keyed on the content fingerprint;
    * the window sort is per-fingerprint-group (group size = copy
    * count, tiny). */
  def exactKeepMinId(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    require(!df.columns.contains("__fp") && !df.columns.contains("__rn"),
      "exactKeepMinId: input already has a '__fp'/'__rn' column; " +
        "rename it (it would be overwritten by the internal state)")
    val wfp = Window.partitionBy("__fp").orderBy(idCol)
    df.withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(wfp))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** X1 incremental dedup: rows of `incoming` whose fingerprint does NOT
    * already appear in `seen` (all incoming columns preserved). The
    * everyday production shape — each new crawl/batch dedups against the
    * accumulated corpus index rather than re-deduping the world.
    *
    * Plan: a left-anti join keyed on the md5 fingerprint. Both sides
    * shuffle on the fingerprint — unavoidable when the seen-set is
    * billions of keys (not broadcastable); at 100 TB the `seen` side is
    * the persisted fingerprint index (a few bytes/row), not the corpus,
    * so the exchange moves hashes, not documents. Incoming-side
    * duplicates are NOT collapsed here (that is [[exact]]'s job);
    * composing `exact` then `dedupAgainst` gives the full incremental
    * pipeline.
    *
    * NULL text never matches (null fp != anything, even another null
    * fp), so null-text incoming rows are ALWAYS kept — deliberate: an
    * empty doc is not "a duplicate of the other empty docs", and
    * dropping it here would make the anti-join's verdict depend on
    * whether `seen` happens to contain a null. Filter null text
    * upstream if empties should die. */
  def dedupAgainst(incoming: DataFrame, textCol: String,
      seen: DataFrame, seenTextCol: String): DataFrame = {
    // a caller-owned __fp (plausible: persisted fingerprint indexes use
    // exactly this name) would be silently overwritten by withColumn —
    // refuse loudly instead of corrupting the caller's column
    require(!incoming.columns.contains("__fp"),
      "dedupAgainst: incoming already has a '__fp' column; rename it " +
        "(it would be overwritten by the internal fingerprint)")
    require(!incoming.columns.contains("__seen_fp"),
      "dedupAgainst: incoming already has a '__seen_fp' column; rename " +
        "it (the join condition would become ambiguous)")
    val seenFps = seen
      .select(TextAnalysis.fingerprint(col(seenTextCol)).as("__seen_fp"))
    incoming
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(seenFps, col("__fp") === col("__seen_fp"), "left_anti")
      .drop("__fp")
  }

  /** X1 incremental dedup, Bloom-filter path: like [[dedupAgainst]] but
    * the seen-set is compressed into a Bloom filter that ships with every
    * task, so the incoming batch is filtered AT ITS SCAN — zero shuffle
    * on either side, where the anti-join exchanges both. The trade:
    *
    *  - '''false positives drop extra rows''' at rate ≈ `fpp`: a never-
    *    seen doc whose hash collides is wrongly "already seen". For
    *    dedup that errs on the safe side (no duplicate ever survives;
    *    ~fpp of fresh docs are lost). When exactness matters, use this
    *    as a cheap PRE-filter and confirm survivors-to-drop with the
    *    anti-join, or use [[dedupAgainst]] alone.
    *  - '''the sketch must fit on the driver/executors''': ~1.2 bytes ×
    *    `expectedItems` at fpp=1% (120 MB at 100M keys). Billions of
    *    seen keys → the anti-join is the right tool; this path is for
    *    the many-batches-against-a-medium-index regime where paying one
    *    sketch build amortizes over every subsequent batch scan.
    *
    * The membership test is Spark's own codegen'd
    * `BloomFilterMightContain` over `xxhash64(fingerprint)` — the exact
    * expression pair runtime row-group filtering uses; no UDF. Build the
    * sketch once per seen-index version and reuse it across batches.
    *
    * NULL text never probes the filter (same contract as
    * [[dedupAgainst]]): null-fingerprint rows are always kept.
    */
  def dedupAgainstBloom(incoming: DataFrame, textCol: String,
      seenBloom: org.apache.spark.util.sketch.BloomFilter): DataFrame = {
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      seenBloom.writeTo(bos)
      bos.toByteArray
    }
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val fp = TextAnalysis.fingerprint(col(textCol))
    val might = ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.expression(lit(bytes)),
        ColumnBridge.expression(xxhash64(fp))))
    incoming.filter(fp.isNull || !might)
  }

  /** Build the seen-set Bloom filter for [[dedupAgainstBloom]]: one
    * aggregation over the seen index (tree-merged per-partition sketches;
    * the corpus never moves), keyed on `xxhash64(fingerprint)` to match
    * the probe side bit-for-bit. Persist the returned sketch alongside
    * the index and rebuild only when the index version changes. */
  def seenBloomFilter(seen: DataFrame, seenTextCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): org.apache.spark.util.sketch.BloomFilter = {
    require(expectedItems > 0, "expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    // filter the FINGERPRINT, not the hash: xxhash64 never returns null
    // (a null input hashes to the seed), and planting that seed-hash
    // would be a wasted slot — the probe side never consults the filter
    // for null text
    seen
      .select(TextAnalysis.fingerprint(col(seenTextCol)).as("__fp"))
      .filter(col("__fp").isNotNull)
      .select(xxhash64(col("__fp")).as("__h"))
      .stat.bloomFilter("__h", expectedItems, fpp)
  }

  /** Word n-gram shingles of a token array, joined with single spaces.
    * Empty result when the doc has fewer than n tokens.
    *
    * IMPORTANT: pass an *attribute* (a column materialized by a previous
    * projection), not a computed expression — the lambda references `toks`
    * once per element and an inlined expression would be re-evaluated
    * n times per row. */
  def shingles(toks: Column, n: Int): Column =
    graft.functions.Shingles.shingles(toks, n)

  /** Composable HOF reference form of [[shingles]] (sequence → slice →
    * array_join lambdas). Kept as the cross-checkable twin the native
    * expression is spec-asserted byte-identical to; the native form
    * avoids three interpreted lambdas per shingle. */
  def shinglesHof(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))

  /** One row per (doc, shingle): tokens and shingles staged as their own
    * projections so each is computed exactly once per row. */
  private def explodedShingles(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(shingles(col("toks"), shingleN)).as("s"))

  /** MinHash signature: k columns m0..m{k-1}, where m_i = lexicographic min
    * of md5("i|" + shingle) over the doc's shingles. One row per doc.
    *
    * (Lexicographic min over a seeded-MD5 family is a valid MinHash — the
    * hex strings are uniform — and makes every engine agree byte-for-byte.)
    *
    * Computed by the native one-pass [[graft.functions.MinHashSig]]
    * expression — a pure scan projection, NO shuffle. The relational form
    * ([[minhashSignaturesViaExplode]]) exchanged one row per SHINGLE
    * through a k-column min aggregation; the per-doc fold belongs inside
    * the row. Spec-pinned bit-identical to the twin; the size filter
    * mirrors the twin's explode, which drops docs with no shingles
    * (fewer than `shingleN` tokens, or null text). The signature array is
    * staged as its own projection so the k `element_at` references read
    * one computed attribute (CollapseProject keeps expensive expressions
    * un-inlined, and the twin spec would catch a k× recompute as a
    * timing regression).
    *
    * Doc ids are assumed UNIQUE (the contract throughout this library):
    * being a projection, this emits one signature row per input ROW,
    * where the twin's groupBy would collapse a duplicated id — dedup a
    * duplicated-id batch with [[exact]] first. The candidate generators
    * downstream additionally never emit self-pairs.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, shingleN: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      // drop docs with no shingles on the CHEAP equivalent condition
      // (size >= n ⟺ non-empty shingle array; null toks → not-true):
      // a filter on the shingle array itself gets pushed below the
      // projection with the whole shingle expression substituted into
      // the scan filter — computing every shingle twice per row
      .filter(size(col("toks")) >= shingleN)
      .select(col("doc_id"), shingles(col("toks"), shingleN).as("shArr"))
      .select(col("doc_id"),
        graft.functions.MinHashSig.minhashSig(col("shArr"), k).as("sig"))
      .select(col("doc_id") +:
        (0 until k).map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)

  /** Composable reference form of [[minhashSignatures]] (explode → k min
    * aggregations). Kept as the cross-checkable twin the native
    * expression is spec-asserted bit-identical to. Not for production
    * use: it shuffles one row per SHINGLE. */
  def minhashSignaturesViaExplode(df: DataFrame, idCol: String,
      textCol: String, k: Int, shingleN: Int = 3): DataFrame = {
    val hashed = explodedShingles(df, idCol, textCol, shingleN)
      .select(col("doc_id") +:
        (0 until k).map(i => md5(concat(lit(s"$i|"), col("s"))).as(s"h$i")): _*)
    val aggs = (0 until k).map(i => min(col(s"h$i")).as(s"m$i"))
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** THE MinHash band projection — the single definition every banding
    * consumer shares ([[lshCandidates]], [[verifiedNearDups]],
    * [[nearDupAgainst]]), so bands built from the same signatures can
    * never drift incompatible: band `b` re-hashes its `rowsPerBand`
    * signature components (md5 of their concatenation) into one bucket
    * value. Input is the [[minhashSignatures]] shape (`doc_id,
    * m0..m{k-1}`); output `(doc_id, carry..., band, bv)`. `carry`
    * columns ride along unchanged (the verified pipeline carries its
    * shingle sets into the buckets this way). */
  private[operators] def minhashBands(sigs: DataFrame, k: Int,
      rowsPerBand: Int, carry: Seq[String] = Nil): DataFrame = {
    require(k % rowsPerBand == 0, "k must be divisible by rowsPerBand")
    val nBands = k / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      val parts =
        (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("bv"))
    }
    val carried = carry.map(col)
    sigs.select(col("doc_id") +: carried :+
        explode(array(bandCols: _*)).as("e"): _*)
      .select(col("doc_id") +: carried :+
        col("e.band").as("band") :+ col("e.bv").as("bv"): _*)
  }

  /** LSH banding over a MinHash signature: bands of `rowsPerBand` signature
    * columns re-hash to a single value; docs sharing any (band index, band
    * value) become candidate pairs. Returns (doc_a, doc_b), doc_a < doc_b,
    * distinct.
    *
    * Single-pass plan: explode to (doc, band, value) → ONE groupBy(band,
    * value) collecting the bucket's sorted doc ids → expand each bucket
    * into its pairs → distinct. The corpus shuffles once, keyed by band
    * value (i.e. hash-partitioned across executors). */
  def lshCandidates(sigs: DataFrame, k: Int, rowsPerBand: Int,
      maxBucket: Int = 10000): DataFrame = {
    val bands = minhashBands(sigs, k, rowsPerBand)
    // size-gate BEFORE the collect buffers anything: the window count is
    // sort-based and spills, so a degenerate bucket streams through disk
    // instead of OOMing the agg buffer; the groupBy reuses the window's
    // exchange (same key) — still one shuffle
    val wb = Window.partitionBy("band", "bv")
    val gated = bands.withColumn("cnt", count(lit(1)).over(wb))
      .filter(col("cnt") > 1 && col("cnt") <= maxBucket)
    val buckets = gated.groupBy("band", "bv")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    // expand each bucket into its (a < b) pairs
    buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("doc_a"), y.as("doc_b")))))).as("p"))
      .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      // duplicate-id defense: a doc_id appearing twice in the input puts
      // two identical rows in its buckets and the i<j expansion pairs
      // them as (X, X) — ids are documented unique, but never emit a
      // self-pair even on contract-violating input
      .filter(col("doc_a") =!= col("doc_b"))
      .distinct()
  }

  /** End-to-end MinHash near-dup candidates (X2). */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, rowsPerBand: Int = 2, shingleN: Int = 3): DataFrame =
    lshCandidates(minhashSignatures(df, idCol, textCol, k, shingleN),
      k, rowsPerBand)

  /** X2 incremental NEAR-dup dedup: rows of `incoming` with no LSH-banded
    * near-duplicate in the accumulated SIGNATURE index — completing the
    * incremental family ([[dedupAgainst]] exact / [[dedupAgainstBloom]]
    * sketch / this for fuzzy). `seenSigs` is exactly the output shape of
    * [[minhashSignatures]] (`doc_id, m0..m{k-1}`) persisted per batch: a
    * few hex strings per document, so the index is orders of magnitude
    * smaller than the corpus and the exchanges below move signatures,
    * never text.
    *
    * Semantics are CANDIDATE-level (any shared band ⇒ near-dup), the
    * same recall/precision surface as [[lshCandidates]] tuned by
    * (k, rowsPerBand): the index stores no text, so exact-Jaccard
    * verification is impossible by design — persist text alongside and
    * verify downstream where precision matters.
    *
    * Plan: both sides project to (doc, band, bv); a left-SEMI join marks
    * incoming docs sharing any band bucket with the index (the "dup"
    * id-set, bytes per dup); a left-ANTI join on ids keeps the rest.
    * The incoming source is scanned twice — once projected to its band
    * signatures, once as the anti-join's left side — but every exchange
    * moves signatures or ids only, never text.
    *
    * Docs with no shingles (fewer than `shingleN` tokens, null text)
    * have no signature — they are ALWAYS kept, mirroring
    * [[dedupAgainst]]'s null-text contract. */
  def nearDupAgainst(incoming: DataFrame, idCol: String, textCol: String,
      seenSigs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
      shingleN: Int = 3): DataFrame = {
    require(!incoming.columns.contains("__nd_id"),
      "nearDupAgainst: incoming already has a '__nd_id' column; rename it")
    require(seenSigs.columns.contains("doc_id") &&
      (0 until k).forall(i => seenSigs.columns.contains(s"m$i")),
      s"nearDupAgainst: seenSigs must have (doc_id, m0..m${k - 1}) — " +
        "the minhashSignatures output shape")
    val inBands = minhashBands(
      minhashSignatures(incoming, idCol, textCol, k, shingleN),
      k, rowsPerBand)
    val seenBands = minhashBands(seenSigs, k, rowsPerBand)
      .select("band", "bv")
    val dupIds = inBands
      .join(seenBands, Seq("band", "bv"), "left_semi")
      .select(col("doc_id").as("__nd_id")).distinct()
    incoming
      .join(dupIds, incoming(idCol) === col("__nd_id"), "left_anti")
  }

  /** THE signature-plus-shingle-set projection every verify-capable
    * MinHash consumer shares ([[verifiedNearDups]],
    * [[Decontaminate.fuzzyOverlap]]): `(doc_id, sh, m0..m{k-1})` where
    * `sh` is the distinct shingle set riding along for exact-Jaccard
    * verification. Two load-bearing invariants live here so the copies
    * can never drift:
    *  - the no-shingle gate filters on the CHEAP equivalent
    *    `size(toks) >= shingleN` — a filter referencing the shingle
    *    array itself gets pushed below the projection with the whole
    *    shingle expression substituted in, computing every shingle
    *    twice per row;
    *  - `shArr` stays a twice-referenced alias (sig + distinct), which
    *    CollapseProject keeps materialized so shingling runs once.
    * MinHash over the distinct set is value-identical to the raw
    * pipeline (duplicates never change a min), so the DuckDB oracles
    * (min over dup rows) agree byte-for-byte; the set's order is
    * engine-arbitrary, fine for order-independent intersect/size. */
  private[operators] def sigWithShingles(df: DataFrame, idCol: String,
      textCol: String, k: Int, shingleN: Int): DataFrame =
    // Fan.out: tokenize + shingle + k MinHash folds are the CPU-dense
    // part of every LSH flow and run inside the input's scan stage; an
    // under-split input serializes them on one core (no-op when the
    // input is already parallel — see Fan)
    Fan.out(df).select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= shingleN)
      .select(col("doc_id"), shingles(col("toks"), shingleN).as("shArr"))
      .select(col("doc_id"),
        graft.functions.MinHashSig.minhashSig(col("shArr"), k).as("sig"),
        array_distinct(col("shArr")).as("sh"))
      .select(col("doc_id") +: col("sh") +:
        (0 until k).map(i => element_at(col("sig"), i + 1).as(s"m$i")): _*)

  /** The canonical near-dup pipeline: MinHash+LSH candidate generation,
    * then exact shingle-set Jaccard verification of only the candidate
    * pairs. At corpus scale the expensive exact measure runs on the tiny
    * candidate set, never on the n² pair space. Returns
    * (doc_a, doc_b, jac) for pairs with jac ≥ threshold. */
  def verifiedNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, k: Int = 8, rowsPerBand: Int = 2,
      shingleN: Int = 3, maxBucket: Int = 10000): DataFrame = {
    // Single linear flow — NO diamond: the naive shape (candidates from
    // one subtree, then two joins back to a shingle-set subtree) scans
    // the corpus 6× at sf0.1, because filter pushdown specializes each
    // branch's scan and defeats ReuseExchange. Instead the shingle SET
    // rides along with the signature into the bucket collect, and pairs
    // verify in-bucket. One corpus scan, two shuffles (bucket,
    // pair-dedup), zero joins — the doc-level signature aggregation the
    // old shape needed is gone entirely: the native MinHashSig fold runs
    // inside the scan projection. The bucket shuffle carries the set
    // nBands× — the price of never re-deriving it; `maxBucket`
    // (window-count gated BEFORE the collect buffers anything, so a
    // degenerate bucket spills instead of OOMing) bounds expansion.
    val sigs = sigWithShingles(df, idCol, textCol, k, shingleN)
    val bands = minhashBands(sigs, k, rowsPerBand, carry = Seq("sh"))
    val wb = Window.partitionBy("band", "bv")
    val gated = bands.withColumn("cnt", count(lit(1)).over(wb))
      .filter(col("cnt") > 1 && col("cnt") <= maxBucket)
    // struct ordering is field-by-field and doc_id is unique, so
    // sort_array orders each bucket by id — (i < j) pairs give a < b
    val buckets = gated.groupBy("band", "bv")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sh"))))
        .as("rows"))
    buckets
      .select(explode(flatten(transform(col("rows"), (x, i) =>
        transform(slice(col("rows"), i + 2, size(col("rows"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a.doc_id").as("doc_a"), col("p.b.doc_id").as("doc_b"), {
        val inter = size(array_intersect(col("p.a.sh"), col("p.b.sh")))
          .cast("double")
        (inter / (size(col("p.a.sh")).cast("double")
          + size(col("p.b.sh")).cast("double") - inter)).as("jac")
      })
      // duplicate-id defense (see lshCandidates): never a self-pair
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("jac") >= threshold)
      // a pair sharing several buckets verifies identically each time;
      // keep it once (the oracle's DISTINCT-candidates-then-verify set)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Record linkage: fuzzy JOIN between two corpora (A = e.g. the
    * current crawl, B = e.g. a partner feed / prior snapshot with
    * different ids) — pairs whose shingle-set Jaccard ≥ `threshold`.
    * The n²-avoiding shape is [[verifiedNearDups]]'s single linear
    * flow run over the side-tagged UNION: both sides sign and band in
    * one scan pass, buckets collect (side, id)-keyed rows (struct
    * ordering puts every A row before every B row, so the in-bucket
    * (i < j) expansion enumerates each cross pair exactly once), and
    * only side-crossing pairs verify — A×A and B×B pairs never
    * materialize past the bucket. Id values may collide across sides
    * (the side tag disambiguates); the two id columns must share a
    * type. Returns (id_a, id_b, jac), distinct. */
  def fuzzyJoin(a: DataFrame, idColA: String, textColA: String,
      b: DataFrame, idColB: String, textColB: String,
      threshold: Double, k: Int = 8, rowsPerBand: Int = 2,
      shingleN: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val ua = a.select(struct(lit(0).as("side"),
      col(idColA).as("id")).as("__key"), col(textColA).as("__text"))
    val ub = b.select(struct(lit(1).as("side"),
      col(idColB).as("id")).as("__key"), col(textColB).as("__text"))
    val sigs = sigWithShingles(ua.unionByName(ub), "__key", "__text",
      k, shingleN)
    val bands = minhashBands(sigs, k, rowsPerBand, carry = Seq("sh"))
    val wb = Window.partitionBy("band", "bv")
    val gated = bands.withColumn("cnt", count(lit(1)).over(wb))
      .filter(col("cnt") > 1 && col("cnt") <= maxBucket)
    val buckets = gated.groupBy("band", "bv")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sh"))))
        .as("rows"))
    buckets
      .select(explode(flatten(transform(col("rows"), (x, i) =>
        transform(slice(col("rows"), i + 2, size(col("rows"))),
          y => struct(x.as("a"), y.as("b")))))).as("p"))
      // sorted by (side, id): a cross pair always has a on side 0
      .filter(col("p.a.doc_id.side") === 0 && col("p.b.doc_id.side") === 1)
      .select(col("p.a.doc_id.id").as("id_a"),
        col("p.b.doc_id.id").as("id_b"), {
          val inter = size(array_intersect(col("p.a.sh"), col("p.b.sh")))
            .cast("double")
          (inter / (size(col("p.a.sh")).cast("double")
            + size(col("p.b.sh")).cast("double") - inter)).as("jac")
        })
      .filter(col("jac") >= threshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** 32-bit SimHash over whitespace tokens. Per token, the first 8 hex
    * chars of md5(token) give a 32-bit value; each bit votes ±1; the
    * signature sets bits with positive vote sums. Returns (doc_id, simhash).
    *
    * Computed by the native one-pass [[graft.functions.SimHash]]
    * expression — a pure scan projection, NO shuffle. The relational
    * vote-aggregation form ([[simhashViaVotes]]) exchanged the entire
    * tokenized corpus (one row per token) just to fold votes per doc;
    * the fold belongs inside the row. Spec-pinned bit-identical to the
    * twin; the null-array filter mirrors the twin's explode, which drops
    * null-token-array (null-text) docs. Doc ids are assumed UNIQUE (see
    * [[minhashSignatures]] — a duplicated id yields one row per input
    * row here, not the twin's collapsed single row).
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame =
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(col("toks").isNotNull)
      .select(col("doc_id"),
        graft.functions.SimHash.simhash(col("toks"), bits).as("simhash"))

  /** Composable reference form of [[simhash]] (explode → per-bit ±1 vote
    * sums → sign threshold). Kept as the cross-checkable twin the native
    * expression is spec-asserted bit-identical to — the same pattern as
    * `DotProduct`/`WinnowWins`/`PqDists`/`DupNgramRatio`. Not for
    * production use: it shuffles one row per TOKEN. */
  def simhashViaVotes(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val tok = df
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
    val voteAggs = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v$b")
    }
    val votes = tok.groupBy("doc_id").agg(voteAggs.head, voteAggs.tail: _*)
    val sig = (0 until bits).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    votes.select(col("doc_id"), sig.as("simhash"))
  }

  /** X2 SimHash near-dup candidates via the band pigeonhole: the
    * `bits`-bit signature splits into `nBands` contiguous bands, and any
    * pair within hamming distance nBands−1 must share at least one
    * unchanged band — so bucketing on (band index, band value) finds ALL
    * such pairs with no self-join and no n² space. Same single-pass
    * shape as [[lshCandidates]]: one shuffle keyed on the band value,
    * spill-safe window gate (`maxBucket`) before anything buffers, pairs
    * expand in-bucket and verify exactly with `bit_count(xor)`. Requires
    * `maxHamming < nBands` (the pigeonhole guarantee; a larger radius
    * needs more/wider bands). Returns (doc_a, doc_b, hamming), a < b. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bits: Int = 32, nBands: Int = 4,
      maxBucket: Int = 10000): DataFrame =
    hammingCandidates(simhash(df, idCol, textCol, bits), "doc_id",
      "simhash", maxHamming, bits, nBands, maxBucket)

  /** The band pigeonhole of [[simhashCandidates]] over ANY precomputed
    * `bits`-bit signature column — text SimHash, image dHash
    * ([[Multimodal.dHashes]]), audio fingerprints: every pair within
    * hamming distance nBands−1 shares an unchanged band, so bucketing
    * on (band, value) finds all such pairs with no self-join. Input:
    * one row per item (`idCol` long, `sigCol` long); output
    * (doc_a, doc_b, hamming), a < b.
    *
    * Skew posture (r17): band VALUES are data-adversarial — one hot
    * (band, bv) bucket used to serialize its whole quadratic pair
    * sweep on a single task (and AQE's byte-based coalescing shrank
    * the whole bucket stage to one task at small shuffle sizes).
    * The one (band, bv) exchange is now pinned at the session's
    * shuffle-partition count, and buckets larger than `saltAt` members
    * are split by a deterministic per-doc salt into
    * `salts`·(`salts`+1)/2 cells that provably cover every intra-
    * bucket pair exactly once (spec-pinned equivalence). `maxBucket`
    * still drops degenerate buckets BEFORE any rows collect. */
  def hammingCandidates(sigs0: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int = 3, bits: Int = 32, nBands: Int = 4,
      maxBucket: Int = 10000, saltAt: Int = 256,
      salts: Int = 8): DataFrame = {
    require(bits % nBands == 0, "bits must be divisible by nBands")
    require(maxHamming < nBands,
      s"pigeonhole guarantee needs maxHamming < nBands ($maxHamming >= $nBands)")
    require(saltAt >= 1, s"saltAt must be >= 1, got $saltAt")
    require(salts >= 2, s"salts must be >= 2, got $salts")
    val w = bits / nBands
    val spark = sigs0.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val sigs = sigs0.select(col(idCol).as("doc_id"),
      col(sigCol).as("simhash"))
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * w).bitwiseAND(lit((1L << w) - 1))
          .as("bv"))
    }
    val bands = sigs
      .select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("e"))
      .select(col("doc_id"), col("simhash"),
        col("e.band").as("band"), col("e.bv").as("bv"))
    // bucket-size window (LINEAR work — a per-bucket sort + count,
    // bounded by maxBucket; AQE may size its exchange freely): gates
    // over-limit buckets BEFORE anything collects them
    val gated = bands
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy("band", "bv")))
      .filter(col("cnt") > 1 && col("cnt") <= maxBucket)
    // pair structs carry (doc_id, simhash) only; orientation is fixed
    // at the final projection (hamming is symmetric)
    def pairStruct(x: Column, y: Column): Column = struct(
      struct(x.getField("doc_id").as("doc_id"),
        x.getField("simhash").as("simhash")).as("a"),
      struct(y.getField("doc_id").as("doc_id"),
        y.getField("simhash").as("simhash")).as("b"))
    def triangle(rows: Column): Column =
      flatten(transform(rows, (x, i) =>
        transform(slice(rows, i + 2, size(rows)), y => pairStruct(x, y))))
    // Conditionally SALTED cell split, one branch for every bucket
    // size. A small bucket (≤ saltAt members) routes whole to its
    // (0, 0) cell — one row per member, triangle pairs, exactly the
    // unsalted shape. A HOT bucket's members each take a deterministic
    // salt s = xxhash64(doc_id) mod `salts` and are routed to every
    // cell (min(s,t), max(s,t)), t ∈ [0, salts) — an unordered pair
    // {x, y} lands together in EXACTLY one cell, (min(sx,sy),
    // max(sx,sy)): the pair set is preserved by construction
    // (spec-pinned) while one hot bucket's quadratic pair work spreads
    // over salts·(salts+1)/2 cells. Within a diagonal cell (c, c) both
    // members share salt c: triangle pairs. Within an off-diagonal
    // cell (i, j) pairs cross the two salt groups only (same-salt
    // pairs live in their diagonal cells).
    val cells = gated
      .withColumn("s", when(col("cnt") <= saltAt, lit(0)).otherwise(
        pmod(xxhash64(col("doc_id")), lit(salts.toLong)).cast("int")))
      .select(col("band"), col("bv"), col("doc_id"), col("simhash"),
        col("s"), explode(when(col("cnt") <= saltAt, array(lit(0)))
          .otherwise(array((0 until salts).map(lit): _*))).as("t"))
      .select(col("band"), col("bv"), col("doc_id"), col("simhash"),
        col("s"), least(col("s"), col("t")).as("ci"),
        greatest(col("s"), col("t")).as("cj"))
    // the cell exchange is pinned at the session's shuffle-partition
    // count (REPARTITION_BY_NUM): the pair explode downstream is
    // QUADRATIC in cell size, so AQE's byte-based coalescing — which
    // sees only the small (doc, band, cell) rows — under-provisions
    // exactly this stage (measured r16/r17: the whole bucket stage
    // coalesced onto one task at sf0.1)
    cells
      .repartition(p, col("band"), col("bv"), col("ci"), col("cj"))
      .groupBy("band", "bv", "ci", "cj")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash"),
        col("s")))).as("rows"))
      .select(explode(
        when(col("ci") === col("cj"), triangle(col("rows")))
          .otherwise(flatten(transform(
            filter(col("rows"), r => r.getField("s") === col("ci")),
            x => transform(
              filter(col("rows"), r => r.getField("s") === col("cj")),
              y => pairStruct(x, y)))))).as("p"))
      .select(
        least(col("p.a.doc_id"), col("p.b.doc_id")).as("doc_a"),
        greatest(col("p.a.doc_id"), col("p.b.doc_id")).as("doc_b"),
        bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash")))
          .cast("long").as("hamming"))
      // duplicate-id defense (see lshCandidates): never a self-pair
      .filter(col("doc_a") =!= col("doc_b"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** Exact token-set Jaccard similarity between two token-array columns
    * (X2 verification stage / n-gram Jaccard dedup). Pass attributes, not
    * computed expressions (see [[shingles]] note). */
  def jaccard(a: Column, b: Column): Column = {
    val da = array_distinct(a)
    val db = array_distinct(b)
    val inter = size(array_intersect(da, db)).cast("double")
    inter / (size(da).cast("double") + size(db).cast("double") - inter)
  }

  /** Cross-document repeated passages (the signal substring-level dedup
    * à la ExactSubstr targets): word `n`-gram windows occurring in at
    * least `minDocs` DISTINCT documents — boilerplate headers, license
    * blocks, templated spam that whole-doc dedup never sees.
    *
    * Output is fixed-width per passage (hash, text, doc count, min/max
    * doc id): no per-group collections, so a passage shared by millions
    * of docs costs the same as one shared by two. One corpus scan;
    * both shuffles key on the window text — the (doc, window) distinct
    * and the count combine map-side. */
  def repeatedPassages(df: DataFrame, idCol: String, textCol: String,
      n: Int = 50, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2,
      s"need n >= 1 and minDocs >= 2, got n=$n minDocs=$minDocs")
    df.select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), explode(shingles(col("__toks"), n)).as("s"))
      .distinct() // one (doc, window) pair even when repeated in-doc
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .filter(col("n_docs") >= minDocs)
      .select(md5(col("s")).as("passage"), col("s").as("passage_text"),
        col("n_docs"), col("first_doc"), col("last_doc"))
  }

  /** Substring-level dedup, the REMOVAL form (X2 — the "deduplicating
    * training data makes language models better" operator, Lee et al.
    * 2022): delete from every document the token positions covered by
    * any word `n`-gram that occurs in at least `minDocs` DISTINCT
    * documents. Whole-doc dedup never sees shared license headers /
    * templated boilerplate inside otherwise-unique docs; this strips
    * exactly those spans and keeps the rest.
    *
    * Output: one row per input doc — `doc_id`, `n_tokens` (before),
    * `n_removed`, `clean_text` (remaining tokens space-joined, in
    * order; empty string when everything was covered; null for null
    * text). All arithmetic is integer/string — engine-exact.
    *
    * Scale shape: (1) gram occurrences are a posexplode of the native
    * shingle projection; the ONLY corpus-sized shuffle keys on the gram
    * for the document-frequency count (map-side combinable). (2) The
    * frequent-gram set — small by construction (only grams repeated
    * across ≥ `minDocs` docs) — semi-joins the occurrences to per-doc
    * covered-start lists, exchanging (doc_id, pos) ints only, never
    * text. (3) Reassembly joins those lists back to a second scan of
    * the corpus and filters tokens in ONE projection: per token an
    * `exists` probe over the doc's own covered-start list (bounded by
    * its gram count; boilerplate-scale lists are tiny). Three scans of
    * the (id, text) columns total — the gram projection feeds both the
    * frequency count and the covered-start semi-join and is recomputed
    * rather than cached (cheaper than exchanging the full gram table);
    * no corpus-text exchange anywhere. */
  def removeRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2,
      s"need n >= 1 and minDocs >= 2, got n=$n minDocs=$minDocs")
    val toks = df.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    // 0-based gram start positions (posexplode), one row per occurrence
    val grams = toks.filter(size(col("__toks")) >= n)
      .select(col("doc_id"), posexplode(shingles(col("__toks"), n))
        .as(Seq("pos", "g")))
    val frequent = grams.groupBy("g")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select(col("g"))
    val starts = grams.join(frequent, Seq("g"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("__starts"))
    toks.join(starts, Seq("doc_id"), "left")
      // a null starts list must read as "nothing covered": the exists
      // probe below null-propagates, and filter() DROPS null-predicate
      // elements — every token would vanish from untouched docs
      .withColumn("__st",
        coalesce(col("__starts"), array().cast("array<int>")))
      .withColumn("__kept", expr(
        s"""filter(transform(__toks, (t, i) -> struct(t AS t, i AS i)),
           |  x -> NOT exists(__st,
           |    s -> x.i >= s AND x.i <= s + ${n - 1}))""".stripMargin))
      .select(col("doc_id"),
        coalesce(size(col("__toks")).cast("long"), lit(0L)).as("n_tokens"),
        coalesce((size(col("__toks")) - size(col("__kept"))).cast("long"),
          lit(0L)).as("n_removed"),
        array_join(expr("transform(__kept, x -> x.t)"), " ")
          .as("clean_text"))
  }

  /** Representative selection after duplicate clustering: one row per
    * cluster keeping the BEST-scoring member (highest `scoreCol`, min id
    * on ties) instead of [[exact]]'s arbitrary min-id — "of every
    * near-dup cluster, keep the longest/highest-quality copy", the keep
    * policy real curation wants.
    *
    * `clusters` is an (id → cluster) labeling, e.g.
    * [[Connected.components]] output over near-dup pairs; docs absent
    * from it (never paired) form their own singleton cluster. The argmax
    * is a single `max(struct(score, -id))` aggregation — one shuffle
    * keyed on cluster, no window sort — after a key-shuffle left join
    * attaches labels (at 100 TB the pair-graph labeling is small but not
    * broadcastable in general).
    *
    * Output: `cluster`, `keep_id`, `score` (the kept doc's),
    * `cluster_size`. */
  def keepBest(docs: DataFrame, idCol: String, scoreCol: String,
      clusters: DataFrame, clusterIdCol: String, clusterLabelCol: String)
      : DataFrame = {
    // ids must be integer-valued: the min-id tie-break rides
    // max(struct(score, -id)), and the long cast below would silently
    // null out (and merge) non-numeric ids instead of erroring
    import org.apache.spark.sql.types.{ByteType, DataType, DecimalType,
      IntegerType, LongType, ShortType}
    def fieldType(df: DataFrame, c: String): DataType =
      df.schema.fields.find(_.name == c)
        .orElse(df.schema.fields.find(_.name.equalsIgnoreCase(c)))
        .getOrElse(throw new IllegalArgumentException(
          s"keepBest: column '$c' not found"))
        .dataType
    def idLike(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case d: DecimalType => d.scale == 0 // warehouse-style DECIMAL(p,0) id
      case _ => false
    }
    for ((df, c) <- Seq((docs, idCol), (clusters, clusterIdCol),
        (clusters, clusterLabelCol))) {
      val t = fieldType(df, c)
      require(idLike(t),
        s"keepBest requires integer-valued id/label columns; '$c' is " +
          t.simpleString)
    }
    val labeled = docs
      .join(clusters, docs(idCol) === clusters(clusterIdCol), "left")
      .select(
        coalesce(col(clusterLabelCol), docs(idCol)).cast("long")
          .as("cluster"),
        docs(idCol).cast("long").as("__id"),
        docs(scoreCol).as("__score"))
    labeled.groupBy("cluster")
      .agg(max(struct(col("__score").as("s"), (-col("__id")).as("negId")))
          .as("__best"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster"), (-col("__best.negId")).as("keep_id"),
        col("__best.s").as("score"), col("cluster_size"))
  }

  /** MinHash Jaccard ESTIMATE from two k-component signatures: the
    * fraction of components that agree (the textbook unbiased estimator;
    * stderr ≈ 1/sqrt(k)). This is what makes MinHash useful at 100 TB —
    * similarity from 2k fixed-width hashes without touching either text.
    * Pass the aligned signature columns of both docs (m0..m{k-1} from
    * [[minhashSignatures]]); the division is one IEEE op of two exact
    * ints, so the estimate is bit-identical across engines. */
  def minhashEstimate(sigA: Seq[Column], sigB: Seq[Column]): Column = {
    require(sigA.nonEmpty && sigA.size == sigB.size,
      s"signature widths differ: ${sigA.size} vs ${sigB.size}")
    val agree = sigA.zip(sigB)
      .map { case (a, b) => when(a === b, 1).otherwise(0) }
      .reduce(_ + _)
    agree.cast("double") / lit(sigA.size).cast("double")
  }

  /** C4-style GLOBAL exact line dedup (Raffel et al. 2020 §2.2 — the
    * "discard repeated lines across the corpus" pass every web-corpus
    * pipeline runs before document-level dedup): a line occurring
    * anywhere else in the corpus survives only at its FIRST occurrence
    * — smallest `(id, position)` — and every other copy is removed
    * from inside its document. Catches boilerplate (nav bars, cookie
    * banners, license headers) that document-level dedup never sees
    * because the surrounding text differs.
    *
    * Lines shorter than `minLineChars` are EXEMPT — kept in place,
    * every copy: "1.", "", "Introduction" repeat legitimately, and
    * deduplicating them would shred ordinary prose structure. Exempt
    * lines are filtered out BELOW the dedup exchange and flow straight
    * to document reassembly — ranking them would be pure waste.
    *
    * Returns `(idCol, textCol)` with each document rebuilt from its
    * surviving lines in original order (join other columns back on id).
    * A document whose every line was removed — pure boilerplate — is
    * DROPPED, as is a null-text document (no lines to keep).
    *
    * Scale shape: posexplode → `groupBy(line).agg(min(struct(id,pos)))`
    * → the winner row IS the surviving occurrence, so no window and no
    * join-back. Partial (map-side) aggregation collapses a boilerplate
    * line repeated across millions of pages to ONE row per map task
    * before the exchange — the skew a window-by-line-text would
    * serialize on a single reducer (WindowExec buffers each partition
    * group whole; AQE can split skewed joins, never windows) is
    * absorbed where it arises. Exchange budget: one line-keyed (hot
    * keys pre-collapsed), one id-keyed reassembly. The two-column
    * source projection is scanned twice (exempt branch + dedup
    * branch); at 100 TB two columnar scans beat one serialized window
    * partition by orders of magnitude. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minLineChars: Int = 10): DataFrame = {
    require(minLineChars >= 1,
      s"minLineChars must be >= 1, got $minLineChars")
    reassembleLines(
      dedupSurvivors(explodeLines(df, idCol, textCol), minLineChars),
      idCol, textCol)
  }

  /** `(__did, __pos, __line)` rows, one per newline-split line. */
  private def explodeLines(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol).as("__did"),
        posexplode(split(col(textCol), "\n")))
      .withColumnRenamed("pos", "__pos")
      .withColumnRenamed("col", "__line")

  /** Surviving (id, pos, line) occurrences of the C4 global line-dedup
    * rule over an exploded `(__did, __pos, __line)` frame: short lines
    * exempt below the exchange, one min-(id,pos) winner per distinct
    * long line straight from the aggregation. */
  private def dedupSurvivors(lines: DataFrame, minLineChars: Int)
      : DataFrame = {
    val exempt = lines.filter(length(col("__line")) < minLineChars)
    val winners = lines
      .filter(length(col("__line")) >= minLineChars)
      .groupBy(col("__line"))
      .agg(min(struct(col("__did"), col("__pos"))).as("__min"))
      .select(col("__min.__did").as("__did"),
        col("__min.__pos").as("__pos"), col("__line"))
    exempt.unionByName(winners)
  }

  /** Rebuild one `(idCol, textCol)` row per document from surviving
    * `(__did, __pos, __line)` occurrences, lines in original order. */
  private def reassembleLines(kept: DataFrame, idCol: String,
      textCol: String): DataFrame =
    kept.groupBy(col("__did").as(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line")),
        "\n").as(textCol))

  /** Composed C4 cleaning: the §2.2 LINE filter (terminal punctuation,
    * ≥ `minLineWords` words, no "javascript" — the predicate of
    * [[TextAnalysis.withC4Rules]]) fused INTO the global line dedup of
    * [[dedupLines]], one text pass. Running `withC4Rules` then
    * `dedupLines` explodes/reassembles the corpus text twice; the
    * composition filters doomed lines at the explode — BEFORE any
    * exchange — and feeds only C4-surviving lines to the dedup, which
    * is also what the paper's pipeline does (line filter first, then
    * cross-corpus dedup of what remains).
    *
    * C4-failing lines are DELETED (not exempt); among survivors the
    * [[dedupLines]] contract applies unchanged: sub-`minLineChars`
    * lines kept everywhere, longer lines kept at their first (id, pos)
    * only, documents losing every line dropped. */
  def dedupLinesC4(df: DataFrame, idCol: String, textCol: String,
      minLineChars: Int = 10, minLineWords: Int = 3): DataFrame = {
    require(minLineChars >= 1,
      s"minLineChars must be >= 1, got $minLineChars")
    require(minLineWords >= 1,
      s"minLineWords must be >= 1, got $minLineWords")
    val keep = TextAnalysis.c4KeepLine(minLineWords)
    val lines = explodeLines(df, idCol, textCol)
      .filter(keep(col("__line")))
    reassembleLines(dedupSurvivors(lines, minLineChars), idCol, textCol)
  }

  /** Paragraph-level FUZZY global dedup — the tier between
    * [[dedupLines]] (exact, line) and document near-dup removal:
    * boilerplate blocks that repeat across pages WITH small edits
    * (dates, usernames, reflowed punctuation) survive exact line
    * dedup and are invisible to document-level near-dup because the
    * surrounding text differs. Paragraphs (split on blank lines)
    * become the dedup unit: each runs through the
    * [[verifiedNearDups]] MinHash→LSH→exact-Jaccard flow under a
    * composite `(doc, pos)` identity, and the LATER member of every
    * verified pair is removed from inside its document — first
    * occurrence (smallest doc, then position) wins, transitively for
    * exact copies since every copy pairs with the first.
    *
    * Paragraphs with fewer than `minParaTokens` tokens are EXEMPT
    * (kept in place, never even enter candidate generation — the
    * [[dedupLines]] short-line rationale). Documents losing every
    * paragraph are dropped, as are null-text docs.
    *
    * Identity encoding: `pid = id·maxParasPerDoc + pos` — ids must be
    * non-negative and small enough not to overflow
    * (`id < 2^63 / maxParasPerDoc`); a document exceeding
    * `maxParasPerDoc` paragraphs raises per-row via `assert_true`
    * rather than silently colliding.
    *
    * TWO STAGES, exact then fuzzy — load-bearing at scale: a
    * boilerplate block repeated millions of times would fill its LSH
    * band buckets past any `maxBucket` cap and be silently skipped by
    * candidate generation (the cap exists to stop quadratic bucket
    * expansion). The EXACT stage kills that case first with a
    * skew-safe partial-agg `groupBy(para).agg(min(pid))` — the
    * [[dedupLines]] shape, hot paragraphs collapse map-side — so only
    * DISTINCT paragraph variants reach the LSH flow and bucket sizes
    * reflect near-dup variant counts, not copy counts. `maxBucket`
    * (exposed) then caps only pathological families of *distinct*
    * near-identical variants.
    *
    * Scale shape: exact stage = one line-keyed partial-agg exchange;
    * fuzzy stage inherits [[verifiedNearDups]]'s single-linear-flow
    * budget over distinct survivors; the exempt/keep branches re-scan
    * the two-column projection (the q29 planted-union precedent), and
    * the final reassembly is one id-keyed exchange. */
  def dedupParagraphsFuzzy(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.6, minParaTokens: Int = 5, k: Int = 8,
      rowsPerBand: Int = 2, shingleN: Int = 3,
      maxParasPerDoc: Long = 1L << 20, maxBucket: Int = 10000)
      : DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    require(minParaTokens >= 1,
      s"minParaTokens must be >= 1, got $minParaTokens")
    require(maxParasPerDoc >= 2,
      s"maxParasPerDoc must be >= 2, got $maxParasPerDoc")
    // pinned: the paragraph table feeds THREE consumers (the candidate
    // stage, the short-paragraph exempt branch, and the survivor
    // re-attach), each of which would otherwise replay the corpus scan
    // and the split/posexplode (measured r16: the q131 entry planned 16
    // corpus scans; pinned, 3 — one per pipeline stage). At cluster
    // scale this is the staged-intermediate pattern (durable under
    // graft.checkpoint.dir); rows identical either way.
    val paras = Checkpoints.pin(df
      .select(col(idCol).cast("long").as("__did"),
        posexplode(split(col(textCol), "\n{2,}")))
      .withColumnRenamed("pos", "__pos")
      .withColumnRenamed("col", "__para")
      .withColumn("__pid",
        col("__did") * maxParasPerDoc + col("__pos") +
          coalesce(assert_true(col("__pos") < maxParasPerDoc,
            lit(s"document exceeds $maxParasPerDoc paragraphs — " +
              "raise maxParasPerDoc")).cast("long"), lit(0L))))
    val nParaToks = size(filter(TextAnalysis.tokens(col("__para")),
      t => length(t) > 0))
    val candidates = paras
      .filter(nParaToks >= minParaTokens)
      .select(col("__pid"), col("__para"))
    // exact stage: one winner (min pid) per distinct paragraph — the
    // agg row IS the representative, every other exact copy drops here.
    // Deliberately NOT pinned (unlike paras): both consumers re-derive
    // it from the pinned paragraph table with one cheap map-side-
    // combined aggregation each, and keeping the aggregation in the
    // final plan keeps its skew posture (partial_min below the
    // exchange) visible to the plan pin in ScaleSpec.
    val reps = candidates
      .groupBy(col("__para"))
      .agg(min(col("__pid")).as("__pid"))
    // fuzzy stage over distinct representatives only
    val pairs = verifiedNearDups(reps.select(col("__pid"), col("__para")),
      "__pid", "__para", threshold, k, rowsPerBand, shingleN,
      maxBucket)
    val dropReps = pairs.select(col("doc_b").as("__pid")).distinct()
    val keepRepIds = reps.join(dropReps, Seq("__pid"), "left_anti")
      .select(col("__pid"))
    // a paragraph occurrence survives iff it IS its family's surviving
    // representative; exempt short paragraphs bypass everything
    val exempt = paras.filter(nParaToks < minParaTokens)
    val kept = paras.join(keepRepIds, Seq("__pid"), "left_semi")
      .unionByName(exempt)
    kept
      .groupBy(col("__did").as(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__para")))),
          s => s.getField("__para")),
        "\n\n").as(textCol))
  }

  /** Latest-wins upsert merge — [[corpusDiff]]'s writing sibling and
    * the lakehouse MERGE semantics without a table format: combine the
    * accumulated corpus with an update batch, keeping ONE row per id —
    * the highest `verCol`, the NEW side winning version ties (re-crawl
    * at the same version replaces). Ids must be unique WITHIN each
    * side ([[exactKeepMinId]] first if not) and versions non-null;
    * under that contract each id carries ≤ 2 rows and the winner is
    * fully determined by (version, side) — row content never
    * tie-breaks, so results are deterministic and engine-exact.
    *
    * Scale shape: ONE id-keyed aggregation (`max` of a
    * (version, side, row) struct — map-side combined, and skew-free by
    * construction since no id exceeds two rows); no join, no window,
    * no second scan. The textbook full-outer-join merge shuffles both
    * sides AND materializes the coalesce of every column; this moves
    * each row once. */
  def upsertLatest(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      verCol: String): DataFrame = {
    require(oldDf.columns.toSeq == newDf.columns.toSeq,
      s"upsertLatest: schemas differ: ${oldDf.columns.toSeq} vs " +
        s"${newDf.columns.toSeq} — align columns first " +
        "(QuackIO.schemaDiff shows the drift)")
    val cols = oldDf.columns.toSeq
    val tagged = oldDf.withColumn("__src", lit(0))
      .unionByName(newDf.withColumn("__src", lit(1)))
    tagged
      .groupBy(col(idCol).as("__id"))
      .agg(max(struct(col(verCol).as("__v"), col("__src"),
        struct(cols.map(col): _*).as("__row"))).as("__w"))
      .select(cols.map(c => col("__w.__row").getField(c).as(c)): _*)
  }

  /** Corpus snapshot diff — the operational "what changed between
    * crawl N and crawl N+1" report every incremental pipeline keys
    * re-processing off: one row per id present in either snapshot with
    * `status` ∈ added | removed | changed | unchanged, judged by
    * content FINGERPRINT ([[TextAnalysis.fingerprint]] — whitespace/
    * case-normalized md5, the library's dedup identity), not raw
    * equality, so a reflowed-but-identical doc reads `unchanged`.
    * Null-text rows carry a null fingerprint; two nulls compare equal
    * (null-safe `<=>`), null-vs-text reads `changed`.
    *
    * Ids must be UNIQUE within each snapshot ([[exactKeepMinId]] them
    * first if not): a duplicated id multiplies through the full outer
    * join and emits contradictory statuses for the same document.
    *
    * Plan: both sides reduce to (id, fingerprint) AT THE SCAN — text
    * never shuffles — then one full outer join keyed on id. At 100 TB
    * that is the minimum possible movement for an exact diff (ids +
    * 16-byte hashes), and the usual follow-up
    * (`.filter($"status" =!= "unchanged")`) pushes nothing extra. */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp_old"),
      lit(1).as("__in_old"))
    val n = newDf.select(col(idCol).as("doc_id"),
      TextAnalysis.fingerprint(col(textCol)).as("__fp_new"),
      lit(1).as("__in_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("__fp_old") <=> col("__fp_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** EXACT edit-distance similarity join over the DISTINCT values of a
    * string column: every unordered pair `(a < b)` of distinct values
    * with `1 ≤ levenshtein(a, b) ≤ maxDist` — the typo/near-identical-
    * title dedup MinHash cannot see (one character flipped in a short
    * string barely moves a shingle set, but it IS edit distance 1).
    *
    * Algorithm: FastSS deletion neighborhoods (Bocek et al. 2007) —
    * any two strings within edit distance d share at least one common
    * variant in their ≤d-deletion neighborhoods, so candidates come
    * from co-grouping on variant strings (lossless blocking: the
    * pigeonhole never drops a true pair — ONE exchange carries the
    * spill-safe size gate, the bucket aggregation, and the streamed
    * in-task pair expansion over each bucket's sorted value array) and
    * each candidate verifies with the real `levenshtein` (the
    * shared-variant condition is necessary, not sufficient — "ab"/"ba"
    * share "a" at d=1 but sit at distance 2). Exact output,
    * relational plan.
    *
    * Scale: the neighborhood fans each distinct value out ~len^d ways
    * (d ≤ 2 enforced — d=3 cubes the fan-out and typo dedup does not
    * need it), so the join input is |distinct|·len^d rows, NOT corpus-
    * sized — dedupe-to-distinct runs first and is the operator's
    * contract. A variant shared by k values yields k·(k−1)/2 candidate
    * pairs; `maxBucket` FAILS LOUD (raise_error, never a silent drop —
    * exactness is the point) when a bucket exceeds it: hot buckets mean
    * the values were not typo-grade distinct (e.g. single characters)
    * and need an upstream length floor.
    *
    * ==Capacity contract (the 100×-scale caller's budget)==
    * Work scales with the DISTINCT-VALUE VOCABULARY, not the corpus:
    * the exact cost is `Σ_variants k·(k−1)/2` candidate verifications,
    * and collision density k rises as the vocabulary fills its
    * keyspace, so doubling a vocabulary that already collides heavily
    * MORE than doubles wall (measured on the synthetic corpus's
    * 12-char prefixes: ~2× rows → ~2.3× candidates — plan-stable, a
    * cost curve, not a plan cliff). Budget by candidate count, not
    * rows: `maxBucket` caps the per-variant term, and a length floor /
    * longer prefix keeps vocabulary sparse in its keyspace. Corpus
    * SIZE is irrelevant after the initial dedupe-to-distinct scan —
    * 100 TB of text with a bounded title/key vocabulary is exactly the
    * intended deployment.
    *
    * Output: `(a, b, dist)` with `a < b`, dist an int. */
  def editDistanceJoin(df: DataFrame, textCol: String, maxDist: Int,
      maxBucket: Int = 10000): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"Dedup.editDistanceJoin: maxDist must be 1 or 2, got $maxDist")
    require(maxBucket >= 2,
      s"Dedup.editDistanceJoin: maxBucket must be >= 2, got $maxBucket")
    val strs = df.select(col(textCol).cast("string").as("__s"))
      .filter(col("__s").isNotNull)
      .distinct()
    // level-1 neighborhood: s itself plus each single deletion
    val d1 = flatten(array(
      array(col("__s")),
      transform(sequence(lit(1), length(col("__s"))), p =>
        concat(substring(col("__s"), lit(1), (p - 1).cast("int")),
          col("__s").substr(p + 1, length(col("__s")))))))
    // level-2 adds all ordered pairs i < j deleted from the original:
    // delete j first (positions stay aligned), then i
    val d2pairs = flatten(transform(
      sequence(lit(1), length(col("__s")) - 1), i =>
        transform(sequence(i + 1, length(col("__s"))), j => {
          val afterJ = concat(substring(col("__s"), lit(1),
            (j - 1).cast("int")),
            col("__s").substr(j + 1, length(col("__s"))))
          concat(substring(afterJ, lit(1), (i - 1).cast("int")),
            afterJ.substr(i + 1, length(afterJ)))
        })))
    val levels =
      if (maxDist == 1) d1
      else flatten(array(d1,
        when(length(col("__s")) >= 2, d2pairs)
          .otherwise(array().cast("array<string>"))))
    // Spark's sequence(1, 0) runs DESCENDING, so the empty string must
    // not reach the per-position transforms — its neighborhood is itself
    val neighborhood =
      when(length(col("__s")) === 0, array(col("__s"))).otherwise(levels)
    val variants = strs
      .select(col("__s"), explode(neighborhood).as("__var"))
      .distinct()
    // ONE exchange does the whole bucket stage. Ordering matters for
    // ROBUSTNESS, not just speed:
    //  1. size-gate FIRST, on the window count — WindowExec buffers a
    //     partition group in a spillable row array, so a degenerate
    //     mega-bucket spills to disk and then FAILS LOUD (raise_error)
    //     on its first output row, before any in-memory list of it
    //     exists anywhere;
    //  2. only gated buckets (≤ maxBucket values — KB-scale at the
    //     default) reach collect_list, which groups WITHOUT a second
    //     exchange (the window's hash partitioning on __var already
    //     satisfies the aggregation);
    //  3. pairs STREAM out of two chained generators — per element,
    //     explode the sorted array's tail slice (ascending sort ⇒
    //     a < b for free) — so peak per-row allocation stays O(bucket),
    //     never the O(bucket²) a materialized pair array would be.
    // The pre-r15 shape moved the variant table through the sort
    // exchange AND a variant-keyed sort-merge self-join for the same
    // candidate set; at the 10M soak point that was ~2× this wall.
    val guarded = variants
      .withColumn("__bn",
        count(lit(1)).over(Window.partitionBy(col("__var"))))
      .filter(col("__bn") > 1)
      .select(
        when(col("__bn") > maxBucket, raise_error(concat(
          lit("editDistanceJoin: variant bucket exceeds maxBucket=" +
            s"$maxBucket for variant '"), col("__var"),
          lit("' — values are not typo-grade distinct; floor the " +
            "length or raise maxBucket")))).otherwise(col("__s"))
          .as("__s"),
        col("__var"))
    guarded
      .groupBy(col("__var"))
      .agg(array_sort(collect_list(col("__s"))).as("__ss"))
      .select(col("__ss"), posexplode(col("__ss")).as(Seq("__i", "a")))
      .select(col("a"),
        explode(slice(col("__ss"), col("__i") + 2, size(col("__ss"))))
          .as("b"))
      .distinct()
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxDist)
  }
}
