package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression (X3 storage path): int8 scalar quantization and
  * random-projection dimensionality reduction — the two standard levers
  * for shrinking an embedding corpus before ANN serving (4× from
  * float32→int8, dim/outDim× from projection; compose them for both).
  *
  * Scale shape: quantization stats are ONE partial-agg-friendly
  * aggregation whose exchange carries at most `dim` rows per partition,
  * collapsed to a single 2-array row that BROADCASTS to the encoder —
  * the corpus itself is scanned once per step and never re-shuffles.
  * Level assignment is floor-based (no round-half-even vs half-up
  * ambiguity), so codes are engine-bit-identical: the same IEEE
  * sub/mul/div tree in the same order on both sides of the oracle.
  */
object Quantize {

  /** Per-dimension global `[lo, hi]` over the corpus, as ONE row
    * `(los: array<double>, his: array<double>)` ordered by dimension.
    * Null/empty vectors contribute no elements; ragged lengths are fine
    * here (short vectors simply have no say in the tail dimensions) but
    * will fail loudly in [[int8Encode]]. A dimension where EVERY element
    * is null raises here by name (min/max skip nulls, so its stats would
    * be null and [[int8Encode]]'s out-of-bounds guard would blame the
    * wrong thing — "exceeds the stats arrays" for an in-bounds
    * dimension). */
  def int8Stats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("pos", "v")))
      .groupBy("pos").agg(min("v").as("lo"), max("v").as("hi"))
      .select(col("pos"),
        when(col("lo").isNull, raise_error(concat(
          lit("int8Stats: dimension "), col("pos").cast("string"),
          lit(" has no non-null values in the corpus — its range is " +
            "undefined; clean or impute upstream")))).otherwise(col("lo"))
          .as("lo"),
        col("hi"))
      .agg(sort_array(collect_list(struct(col("pos"), col("lo"),
        col("hi")))).as("s"))
      .select(transform(col("s"), x => x.getField("lo")).as("los"),
        transform(col("s"), x => x.getField("hi")).as("his"))

  /** Affine int8 codes: level `min(255, floor((v - lo) * 256 / (hi - lo)))`
    * shifted to `[-128, 127]`; degenerate dimensions (`hi == lo`) map to
    * level 0. `stats` is the [[int8Stats]] 1-row frame (broadcast; pass a
    * TRAINING sample's stats to encode a much larger corpus — values
    * outside the trained range clamp to the edge levels). Vectors longer
    * than the stats arrays fail loudly (null lo) rather than emitting
    * silently-null code tails; null ELEMENTS fail loudly too (Spark's
    * least/greatest skip nulls, so a null element would otherwise
    * silently take the TOP edge level and fabricate a large component);
    * whole-null vectors stay null. */
  def int8Encode(df: DataFrame, idCol: String, vecCol: String,
      stats: DataFrame): DataFrame = {
    require(stats.columns.toSeq == Seq("los", "his"),
      "int8Encode: stats must be the int8Stats output (los, his)")
    df.crossJoin(broadcast(stats))
      .select(col(idCol), transform(col(vecCol).cast("array<double>"),
        (x, i) => {
          // try_element_at: out-of-bounds yields null (ANSI element_at
          // throws a generic index error) so the named guard below owns
          // the failure message
          val lo = try_element_at(col("los"), i + 1)
          val hi = try_element_at(col("his"), i + 1)
          val level = when(lo.isNull, raise_error(concat(
              lit("int8Encode: vector dimension "), (i + 1).cast("string"),
              lit(" exceeds the stats arrays — encode with stats trained " +
                "on vectors at least this long"))))
            .when(x.isNull, raise_error(concat(
              lit("int8Encode: null element at dimension "),
              (i + 1).cast("string"),
              lit(" — it would silently clamp to the top level and " +
                "fabricate a large component; clean or impute upstream"))))
            .when(hi === lo, lit(0.0))
            .otherwise(greatest(lit(0.0), least(lit(255.0),
              floor((x - lo) * lit(256.0) / (hi - lo)))))
          (level - lit(128.0)).cast("int")
        }).as("codes"))
  }

  /** Dequantized reconstruction: each level maps back to its cell
    * midpoint `lo + (level + 128 + 0.5) * (hi - lo) / 256`, bounding
    * per-element error by half a cell width. Output `recon` is
    * array<double>. The same loud contracts as [[int8Encode]]: codes
    * longer than the stats arrays and null code elements raise (a
    * silently-null recon element would null the row's norm downstream
    * and sink it to the bottom of every ranking with no error). */
  def int8Decode(df: DataFrame, idCol: String, codesCol: String,
      stats: DataFrame): DataFrame = {
    require(stats.columns.toSeq == Seq("los", "his"),
      "int8Decode: stats must be the int8Stats output (los, his)")
    df.crossJoin(broadcast(stats))
      .select(col(idCol), transform(col(codesCol), (c, i) => {
        val lo = try_element_at(col("los"), i + 1)
        val hi = try_element_at(col("his"), i + 1)
        when(lo.isNull, raise_error(concat(
            lit("int8Decode: code dimension "), (i + 1).cast("string"),
            lit(" exceeds the stats arrays — decode with the stats the " +
              "codes were encoded with"))))
          .when(c.isNull, raise_error(lit(
            "int8Decode: null code element — the codes table is " +
              "corrupted (int8Encode never emits null elements)")))
          .otherwise(
            lo + (c.cast("double") + lit(128.5)) * (hi - lo) / lit(256.0))
      }).as("recon"))
  }

  /** Random-projection dimensionality reduction: `out_j = <vec, plane_j>`
    * for the `planes.length` fixed hyperplanes (pass
    * [[Similarity.planeVectors]] for the deterministic seeded set — the
    * Johnson–Lindenstrauss-style cheap projection, and the same plane
    * family the LSH bucketer signs). Double accumulation in index order
    * per plane. Null vectors AND vectors whose length differs from the
    * planes' dimensionality yield a NULL projection (zip_with pads the
    * shorter side with nulls and the in-order sum carries them) — gate
    * or pad to the plane dimension upstream. */
  def randomProject(df: DataFrame, vecCol: String,
      planes: Array[Array[Double]], out: String = "proj"): DataFrame = {
    require(planes.nonEmpty, "randomProject: need at least one plane")
    require(planes.map(_.length).distinct.length == 1,
      "randomProject: planes must share one dimensionality")
    df.withColumn(out, array(planes.map(p =>
      Similarity.dotHof(col(vecCol), typedlit(p.toSeq))).toIndexedSeq: _*))
  }

  /** Brute-force cosine top-k SERVED FROM THE COMPRESSED CORPUS: the
    * scan side is int8 codes dequantized on the fly — 4× less I/O than
    * the float corpus, the decisive term at 100 TB — while the (small)
    * query set broadcasts. Score/rank shape is identical to
    * [[Similarity.cosineTopK]] (round-6 scores, corpus-id tiebreak,
    * self-pairs excluded), so [[Similarity.recallAtK]] measures the
    * quantization recall cost directly against the exact float path.
    *
    * At production scale compute [[int8Stats]] ONCE and persist it with
    * the codes (this signature takes both precomputed; [[Int8Index]]
    * packages exactly that) — re-deriving stats per serving call would
    * rescan the corpus.
    *
    * Contract symmetry: corpus-side null codes / over-length drift
    * raise in [[int8Decode]]; query-side null vectors and null elements
    * raise here as a pure projection; cross-side length drift raises
    * per-pair in [[Similarity.broadcastTopK]]'s score — every silent
    * null-score sink-to-bottom path is closed without an extra
    * stats join or exchange.
    */
  def int8TopK(queries: DataFrame, idCol: String, vecCol: String,
      codes: DataFrame, codesIdCol: String, stats: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"int8TopK: k must be >= 1, got $k")
    import Similarity.dotHof
    // norms precomputed per side (n + m evaluations, not n × m); the
    // scoring/ranking shape is Similarity.broadcastTopK — shared with
    // cosineTopK, so recallAtK comparability is structural
    val c = int8Decode(codes, codesIdCol, "codes", stats)
      .select(col(codesIdCol).as("corpus_id"), col("recon").as("cv"))
      .withColumn("cn", sqrt(dotHof(col("cv"), col("cv"))))
    // the query side gets the same loud contract the corpus side has:
    // null vectors and null elements raise here (a pure projection — no
    // stats join, no extra exchange); length drift vs the decoded
    // corpus raises per-pair inside broadcastTopK's score (the decoded
    // side's length IS the stats dimensionality by construction).
    val q = queries
      .select(col(idCol).as("query_id"),
        when(col(vecCol).isNull, raise_error(lit(
          "int8TopK: null query vector — it has no defined ranking; " +
            "filter null queries upstream")))
        .otherwise(transform(col(vecCol), x =>
          when(x.isNull, raise_error(lit(
            "int8TopK: null element in a query vector — the score " +
              "would silently null out; clean or impute upstream")))
          .otherwise(x.cast("double")))).as("qv"))
      .withColumn("qn", sqrt(dotHof(col("qv"), col("qv"))))
    Similarity.broadcastTopK(q, c, dotHof, k)
  }

  /** Two-stage serving at the int8 compression point — the PQ-rerank
    * architecture ([[Similarity.pqTopKReranked]]) with codes as the
    * cheap stage: [[int8TopK]] shortlists from the 4×-smaller corpus,
    * then only the |Q|·shortlist candidate pairs are re-scored exactly
    * against the float vectors. Wide floats are touched for candidates
    * only; ranks/scores use the exact path's shape. */
  def int8TopKReranked(queries: DataFrame, idCol: String, vecCol: String,
      codes: DataFrame, codesIdCol: String, stats: DataFrame,
      corpus: DataFrame, k: Int, shortlist: Int = 50): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    Similarity.exactRerank(
      int8TopK(queries, idCol, vecCol, codes, codesIdCol, stats,
        shortlist).select(col("query_id"), col("corpus_id")),
      queries, corpus, idCol, vecCol, k)
  }

  /** Matryoshka-style two-stage serving (X3): shortlist on the FIRST
    * `dPrefix` dimensions only, then exact full-dimension cosine
    * re-rank of the |Q|·shortlist candidates. MRL-trained embeddings
    * put most of the signal in the prefix, so the cheap stage reads
    * `dPrefix/dim` of the vector bytes — the dimension-truncation
    * sibling of [[int8TopKReranked]]'s value-truncation (the two
    * compose: quantize the prefix).
    *
    * Same ranking/score shape as every other serving path
    * ([[Similarity.broadcastTopK]] + [[Similarity.exactRerank]]), so
    * `recallAtK` against [[Similarity.cosineTopK]] measures the prefix
    * cost directly. Queries and corpus share `idCol`/`vecCol` names
    * (the int8TopKReranked convention).
    *
    * Loud contracts, both sides: null vectors, vectors shorter than
    * `dPrefix`, and null elements INSIDE the prefix raise by name — a
    * null-scored pair would otherwise silently sink to the bottom of
    * the shortlist ranking (the r6 int8TopK lesson). Elements past the
    * prefix are only read by the exact re-rank stage, which shares
    * [[Similarity.cosineTopK]]'s contract (a full-dim null element
    * nulls that pair's exact score) — clean vectors upstream. */
  def prefixTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dPrefix: Int, k: Int, shortlist: Int = 50)
      : DataFrame = {
    require(dPrefix >= 1, s"prefixTopK: dPrefix must be >= 1, got $dPrefix")
    require(k >= 1, s"prefixTopK: k must be >= 1, got $k")
    require(shortlist >= k, "prefixTopK: shortlist must be >= k")
    def pref(df: DataFrame, outId: String, outV: String): DataFrame =
      df.select(col(idCol).as(outId),
        when(col(vecCol).isNull, raise_error(lit(
          s"prefixTopK: null vector in '$outId' side — it has no " +
            "defined ranking; filter null vectors upstream")))
          .when(size(col(vecCol)) < dPrefix, raise_error(concat(
            lit(s"prefixTopK: vector shorter than dPrefix=$dPrefix ("),
            size(col(vecCol)).cast("string"),
            lit(") — the prefix ranking would compare unequal slices"))))
          .when(exists(slice(col(vecCol), 1, dPrefix), x => x.isNull),
            raise_error(lit(
              "prefixTopK: null element inside the prefix — the score " +
                "would silently null out; clean or impute upstream")))
          .otherwise(slice(col(vecCol), 1, dPrefix)).as(outV))
    val q = pref(queries, "query_id", "qv")
      .withColumn("qn", Similarity.norm(col("qv")))
    val c = pref(corpus, "corpus_id", "cv")
      .withColumn("cn", Similarity.norm(col("cv")))
    Similarity.exactRerank(
      Similarity.broadcastTopK(q, c, Similarity.dot, shortlist)
        .select(col("query_id"), col("corpus_id")),
      queries, corpus, idCol, vecCol, k)
  }
}
