package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi & Sunter 1969) — the standard
  * entity-resolution frame every dedup-across-sources pipeline runs
  * when there is NO shared key: block candidate pairs on a cheap
  * equality key, score each pair as a sum of per-field agreement /
  * disagreement weights (the log-likelihood ratios of the FS model,
  * supplied as constants — in practice estimated offline by EM or set
  * from labeled data), and classify against two thresholds into
  * `match` / `possible` / `non_match`. The `possible` band is the
  * clerical-review queue of the original paper.
  *
  * Weights arrive as literals, so a pair's score is one FIXED-ORDER
  * chain of double additions — no aggregation, no association-order
  * drift, bit-stable on any engine. A null field on either side is
  * "no evidence": it contributes 0, per standard FS practice.
  *
  * Scale: candidate generation is a hash equi-join on the block key —
  * the ONLY shuffle, and the fan-out is Σ_blocks |A_b|·|B_b|, governed
  * entirely by block granularity (the caller's lever; a too-coarse
  * block is the classic linkage mistake and shows up as a skewed join,
  * which AQE splits). Scoring and classification are pure projections
  * on the joined rows. Comparators are codegen'd builtins — no UDF.
  */
object EntityResolution {

  /** One field comparison: `agree(a, b)` decided by the comparator
    * column built from the two sides' columns; contributes `agreeW`
    * (> 0) when it holds, `disagreeW` (< 0) when it provably fails,
    * and 0 when either side is null. */
  final case class FieldRule(aCol: String, bCol: String, agreeW: Double,
      disagreeW: Double)

  /** Blocked FS linkage of `a` × `b`.
    *
    * @param a,b        the two record sets
    * @param idA,idB    unique id column of each side
    * @param blockA,blockB  block-key column of each side (pairs are
    *                   generated only WITHIN equal non-null block keys)
    * @param rules      per-field agreement rules; agreement is
    *                   null-safe equality of the two columns after
    *                   `lower(trim(.))` normalization for strings
    *                   (exact equality for non-strings)
    * @param matchAt,possibleAt  score thresholds: ≥ matchAt →
    *                   'match', ≥ possibleAt → 'possible', else
    *                   'non_match'
    * @return one row per candidate pair with `id_a, id_b, score,
    *         decision`, `non_match` pairs dropped (they are the
    *         blocked-but-unlinked bulk; keeping them would make the
    *         output block-product-sized for no consumer) */
  def linkage(a: DataFrame, b: DataFrame, idA: String, idB: String,
      blockA: String, blockB: String, rules: Seq[FieldRule],
      matchAt: Double, possibleAt: Double): DataFrame = {
    require(rules.nonEmpty, "EntityResolution.linkage: no field rules")
    require(matchAt >= possibleAt,
      s"EntityResolution.linkage: matchAt ($matchAt) < possibleAt " +
        s"($possibleAt)")
    rules.foreach { r =>
      require(r.agreeW > 0 && r.disagreeW < 0,
        s"EntityResolution.linkage: rule (${r.aCol}, ${r.bCol}) needs " +
          s"agreeW > 0 > disagreeW, got (${r.agreeW}, ${r.disagreeW})")
    }
    def normed(c: Column, dt: org.apache.spark.sql.types.DataType) =
      dt match {
        case org.apache.spark.sql.types.StringType => lower(trim(c))
        case _ => c
      }
    val aTyped = a.schema.map(f => f.name -> f.dataType).toMap
    val bTyped = b.schema.map(f => f.name -> f.dataType).toMap
    val left = a.select((col(idA).as("id_a") +: col(blockA).as("__blk")
      +: rules.zipWithIndex.map { case (r, i) =>
        normed(col(r.aCol), aTyped(r.aCol)).as(s"__a$i") }): _*)
    val right = b.select((col(idB).as("id_b") +: col(blockB).as("__blk")
      +: rules.zipWithIndex.map { case (r, i) =>
        normed(col(r.bCol), bTyped(r.bCol)).as(s"__b$i") }): _*)
    val score = rules.zipWithIndex.map { case (r, i) =>
      when(col(s"__a$i").isNull || col(s"__b$i").isNull, lit(0.0))
        .when(col(s"__a$i") === col(s"__b$i"), lit(r.agreeW))
        .otherwise(lit(r.disagreeW))
    }.reduce(_ + _)
    left.join(right, "__blk")
      .select(col("id_a"), col("id_b"), round(score, 6).as("score"))
      .withColumn("decision",
        when(col("score") >= matchAt, lit("match"))
          .when(col("score") >= possibleAt, lit("possible")))
      .filter(col("decision").isNotNull)
  }
}
