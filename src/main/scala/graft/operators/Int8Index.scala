package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted int8 index (SURVEY §2.4 X3) — the operational companion to
  * [[Quantize]], completing the serving-stack symmetry with [[AnnIndex]]
  * (the PQ family's persisted form): derive [[Quantize.int8Stats]] ONCE,
  * encode the corpus ONCE, write both as parquet, then serve any number
  * of query batches from the codes alone.
  *
  * Scale rationale: the inline catalog entries (q93/q95) re-derive
  * stats + codes from the float corpus per serving call — at 100 TB that
  * is two extra full-corpus scans per query batch, the exact cost the
  * compression exists to avoid. Built once, the serving scan reads 4×
  * fewer bytes than the float corpus and the floats are never touched
  * (touched only for |Q|·shortlist candidates on the re-rank path).
  * Doubles round-trip bit-exactly through parquet, so a query served
  * from the persisted index returns EXACTLY what [[Quantize.int8TopK]]
  * over the live corpus would (spec-pinned).
  *
  * Layout under `dir`:
  *  - `codes/`  (corpus_id, codes array<int>) — partition like any fact
  *    table; 4× smaller than the vectors it replaces
  *  - `stats/`  (los, his) — ONE row, the per-dimension [lo, hi] ranges
  *
  * (The codes column is an array in the INDEX layout — fine for parquet;
  * the catalog's oracle entries stay unpivoted per the differ contract.)
  */
object Int8Index {

  /** Derive stats + encode + persist. The codes are encoded against the
    * PERSISTED stats read back from parquet, so build-time codes and
    * any later [[append]] batch go through the identical broadcast row.
    * Loud contracts: everything [[Quantize.int8Encode]] raises on
    * (over-length vectors, null elements, all-null dimensions) PLUS the
    * index-specific refusals in [[guardedEncode]] (null and short
    * vectors) — the build aborts instead of writing a silently-corrupt
    * index.
    *
    * A REBUILD over an existing index is staged: both outputs
    * materialize under `dir/.build-tmp` first and publish by rename
    * only after both jobs committed — a build that fails partway
    * (e.g. the codes job hits a null vector) leaves the previous
    * stats+codes pair untouched and still serving (spec-pinned).
    * Writing stats in place first would pair NEW ranges with OLD codes
    * on failure: a silently mis-decoded index. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      dir: String): Unit = {
    val spark = corpus.sparkSession
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir, ".build-tmp")
    fs.delete(tmp, true)
    Quantize.int8Stats(corpus, vecCol).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/.build-tmp/stats")
    guardedEncode(corpus, idCol, vecCol,
        spark.read.parquet(s"$dir/.build-tmp/stats"), "build")
      .write.mode("overwrite").parquet(s"$dir/.build-tmp/codes")
    // both outputs are complete and mutually consistent — publish.
    // (Two renames, not one atomic swap: the vulnerable window is now
    // two metadata ops instead of a full corpus encode, and a reader
    // caught inside it fails loudly on a missing path rather than
    // decoding codes against the wrong ranges.)
    Seq("stats", "codes").foreach { part =>
      val dst = new org.apache.hadoop.fs.Path(dir, part)
      fs.delete(dst, true)
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp, part), dst),
        s"Int8Index.build: publish rename failed for $dst")
    }
    fs.delete(tmp, true)
  }

  /** The lazy codes scan + the 1-row stats frame. */
  def load(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/stats"))

  /** Incremental maintenance: encode a new batch with the index's
    * EXISTING stats and append its codes — the steady-state ingest move
    * (compose with [[Dedup.dedupAgainst]]/[[Dedup.dedupAgainstBloom]]
    * upstream; like any fact-table append this does not dedup). No
    * re-deriving: values outside the trained per-dimension range clamp
    * to the edge levels (the documented [[Quantize.int8Encode]] sample-
    * trained contract), so an appended index is bit-identical to a
    * rebuild WITH THE SAME STATS over the union corpus (spec-pinned).
    * The trade is range drift — if the batch's distribution has moved,
    * its edge-clamped mass grows silently; monitor reconstruction error
    * via [[Quantize.int8Decode]] on a batch sample and rebuild when it
    * departs from the build-time figure. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
      idCol: String, vecCol: String): Unit =
    guardedEncode(batch, idCol, vecCol,
        spark.read.parquet(s"$dir/stats"), "append")
      .write.mode("append").parquet(s"$dir/codes")

  /** Encode, failing LOUDLY on codes that would poison serving:
    * [[Quantize.int8Encode]] already raises on OVER-length vectors, null
    * elements, and all-null stats dimensions, but it passes through (a)
    * whole-null vectors as null codes and (b) SHORT vectors as short
    * codes — both legal for ad-hoc encoding, both index corruption here:
    * a short-codes row's serving score null-pads through `zip_with` and
    * silently sinks it (unretrievable, no error), and a null-codes row
    * can never be served at all. The write job aborts on the first such
    * row instead (an aborted parquet job commits nothing, so a failed
    * append leaves the index serving exactly as before — spec-pinned). */
  private def guardedEncode(df: DataFrame, idCol: String, vecCol: String,
      stats: DataFrame, op: String): DataFrame =
    Quantize.int8Encode(df, idCol, vecCol, stats)
      .withColumnRenamed(idCol, "corpus_id")
      .crossJoin(broadcast(stats.select(size(col("los")).as("__dim"))))
      .select(col("corpus_id"),
        when(col("codes").isNull, raise_error(lit(
          s"Int8Index.$op: null vector — its codes could never be " +
            "served; filter null vectors upstream")))
        .when(size(col("codes")) =!= col("__dim"), raise_error(concat(
          lit(s"Int8Index.$op: vector length "),
          size(col("codes")).cast("string"),
          lit(" != index dimensionality "), col("__dim").cast("string"),
          lit(" — its serving scores would null-pad and silently sink; " +
            "pad or filter upstream"))))
        .otherwise(col("codes")).as("codes"))

  /** Cosine top-k served from the persisted codes — delegates to
    * [[Quantize.int8TopK]], so scores/ranks/self-pair exclusion are the
    * live path's exactly (and [[Similarity.recallAtK]] comparability is
    * structural). The corpus-side scan reads codes only. */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val (codes, stats) = load(spark, dir)
    Quantize.int8TopK(queries, idCol, vecCol, codes, "corpus_id", stats, k)
  }

  /** Two-stage serving from the persisted index: codes shortlist, exact
    * float re-rank over |Q|·shortlist candidates only — the
    * [[Quantize.int8TopKReranked]] architecture with the shortlist stage
    * reading the index instead of re-encoding the corpus. `corpus` (the
    * float table) is scanned only through the candidate semi-join. */
  def queryReranked(spark: SparkSession, dir: String, queries: DataFrame,
      idCol: String, vecCol: String, corpus: DataFrame, k: Int,
      shortlist: Int = 50): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val (codes, stats) = load(spark, dir)
    Similarity.exactRerank(
      Quantize.int8TopK(queries, idCol, vecCol, codes, "corpus_id", stats,
        shortlist).select(col("query_id"), col("corpus_id")),
      queries, corpus, idCol, vecCol, k)
  }
}
