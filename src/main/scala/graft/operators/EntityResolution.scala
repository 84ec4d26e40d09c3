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

  /** One EM iteration for the FS parameters (Winkler 1988, the
    * standard unsupervised way to GET the [[linkage]] weights): over
    * candidate pairs carrying per-field boolean agreement columns
    * `flagCols`, with current prior `p` and per-field match/unmatch
    * agreement rates `m`/`u`,
    *
    *  - E-step (per pair, closed form):
    *    `w = p·Π fₘ / (p·Π fₘ + (1−p)·Π fᵤ)` where fₖ is `mᵢ` or
    *    `1−mᵢ` (resp. `uᵢ`) as the field agrees or not; a NULL flag is
    *    missing evidence — factor 1 on both sides.
    *  - M-step: `p' = Σw/N`, `mᵢ' = Σ w·γᵢ / Σw`,
    *    `uᵢ' = Σ (1−w)·γᵢ / Σ(1−w)`.
    *
    * Output: rows `('p', null, p')` and `('m'|'u', field, value)`,
    * round-6. Iterate by feeding the values back in; weights for
    * [[linkage]] are then `log2(mᵢ/uᵢ)` / `log2((1−mᵢ)/(1−uᵢ))`,
    * computed by the caller.
    *
    * Determinism: `w` is one fixed-order rational expression of
    * literals (no transcendentals), and every cross-row sum quantizes
    * `w`/`w·γ` to longs at 1e9 (association-order-exact; capacity to
    * ~9·10⁹ pairs — block-candidate sets sit far below that, and the
    * 5e-10 per-term quantization is noise three orders under the
    * round-6 report). One aggregation over the pair set; output is
    * 2K+1 rows. */
  def emStep(pairs: DataFrame, flagCols: Seq[String], p: Double,
      m: Seq[Double], u: Seq[Double]): DataFrame = {
    require(flagCols.nonEmpty, "EntityResolution.emStep: no flag columns")
    require(m.size == flagCols.size && u.size == flagCols.size,
      s"EntityResolution.emStep: need one (m, u) per flag column")
    require(p > 0 && p < 1, s"emStep: p must be in (0, 1), got $p")
    (m ++ u).foreach(x => require(x > 0 && x < 1,
      s"emStep: every m/u must be in (0, 1), got $x"))
    def prod(rates: Seq[Double]): Column =
      flagCols.zip(rates).map { case (c, r) =>
        when(col(c).isNull, lit(1.0))
          .when(col(c), lit(r)).otherwise(lit(1.0 - r))
      }.reduce(_ * _)
    val num = lit(p) * prod(m)
    val w = num / (num + lit(1.0 - p) * prod(u))
    def q(c: Column): Column = floor(c * lit(1e9) + lit(0.5))
    val staged = pairs.select((w.as("__w") +:
      flagCols.zipWithIndex.map { case (c, i) =>
        col(c).as(s"__f$i") }): _*)
    val aggs =
      Seq(count(lit(1)).as("__n"), sum(q(col("__w"))).as("__sw")) ++
      flagCols.indices.flatMap { i =>
        Seq(sum(q(when(col(s"__f$i"), col("__w")).otherwise(lit(0.0))))
            .as(s"__swg$i"),
          sum(q(when(col(s"__f$i"), lit(1.0) - col("__w"))
            .otherwise(lit(0.0)))).as(s"__svg$i"),
          // Σ(1−w) restricted to rows where flag i is NON-NULL, so a
          // field's u denominator matches its numerator's support
          sum(q(when(col(s"__f$i").isNotNull, lit(1.0) - col("__w"))
            .otherwise(lit(0.0)))).as(s"__sv$i"),
          sum(q(when(col(s"__f$i").isNotNull, col("__w"))
            .otherwise(lit(0.0)))).as(s"__swn$i"))
      }
    val tot = staged.agg(aggs.head, aggs.tail: _*)
    // ONE aggregation, unpivoted through a struct-array explode — a
    // union of per-row selects would replay the pair aggregation once
    // per output row
    val outRows =
      struct(lit("p").as("param"), lit(null).cast("string").as("field"),
        round((col("__sw").cast("double") / lit(1e9)) /
          col("__n").cast("double"), 6).as("value")) +:
      flagCols.zipWithIndex.flatMap { case (c, i) => Seq(
        struct(lit("m").as("param"), lit(c).as("field"),
          round(col(s"__swg$i").cast("double") /
            col(s"__swn$i").cast("double"), 6).as("value")),
        struct(lit("u").as("param"), lit(c).as("field"),
          round(col(s"__svg$i").cast("double") /
            col(s"__sv$i").cast("double"), 6).as("value")))
      }
    tot.select(explode(array(outRows: _*)).as("__r"))
      .select(col("__r.param").as("param"), col("__r.field").as("field"),
        col("__r.value").as("value"))
      .orderBy("param", "field")
  }
}
