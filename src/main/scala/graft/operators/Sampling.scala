package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling (X5). `DataFrame.sample()` draws from a
  * partition-seeded RNG, so membership changes whenever the file layout,
  * split count, or cluster size changes — useless for reproducible
  * corpus construction. These samplers decide membership from a hash of
  * the row's own key (same family as [[TextAnalysis.splitBucket]]):
  * every engine, run, and cluster size keeps exactly the same rows, and
  * the decision is a pure projection — no shuffle, no RNG state, and
  * the filter sits directly on the scan.
  *
  * Rates are in basis points (1/10000) so the cut is integer-exact:
  * `bp = 2500` keeps a doc iff `md5(salt|key) mod 10000 < 2500` —
  * no float rounding at the boundary.
  *
  * NULL handling (deliberate, uniform across all three samplers): a row
  * with a NULL key is ALWAYS excluded — a null key has no hash, so it
  * has no reproducible draw; admitting it under any fixed rule would
  * put every null-key row on the same side of every cut, which is not a
  * sample. Callers sampling corpora with nullable ids should
  * `coalesce`/filter ids first. A NULL `weightBp` in [[weighted]] is
  * explicitly 0 bp (never kept); a NULL `stratum` in [[stratified]]
  * falls to `defaultBp` (a CASE branch on null is not-true).
  */
object Sampling {

  /** `md5(salt|key) mod 10000`, the uniform [0, 10000) draw.
    * NULL key → NULL draw → every comparison is not-true → excluded. */
  private def draw(key: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit("|"), key.cast("string"))),
      1, 8), 16, 10).cast("long") % 10000

  /** Uniform Bernoulli sample at `bp` basis points, keyed on `key`. */
  def bernoulli(df: DataFrame, key: Column, bp: Int,
      salt: String = "sample"): DataFrame = {
    require(bp >= 0 && bp <= 10000, s"bp must be in [0, 10000], got $bp")
    df.filter(draw(key, salt) < bp)
  }

  /** Weighted sample: per-ROW keep rate in basis points, from any column
    * expression (clamped to [0, 10000]). The quality-weighted resampling
    * move — upweight high-quality docs by keeping them at a higher rate —
    * with the same determinism guarantees as [[bernoulli]]: membership
    * depends only on (key, salt, weight), never on partitioning. */
  def weighted(df: DataFrame, key: Column, weightBp: Column,
      salt: String = "sample"): DataFrame =
    // coalesce, not null-propagate: a NULL weight means "never keep"
    // (0 bp) by contract, not "silently fall out of the filter"
    df.filter(draw(key, salt) <
      greatest(lit(0), least(lit(10000), coalesce(weightBp, lit(0)))))

  /** Stratified sample: per-stratum rates in basis points with a default
    * for unlisted strata. The rate lookup is a CASE chain over the
    * (small, driver-known) strata map — still a pure projection; the
    * sampled fraction of each stratum concentrates tightly around its
    * rate because draws are independent per key.
    *
    * This is the downsample-the-overrepresented-language/source move of
    * every corpus-mixing recipe, made reproducible.
    */
  def stratified(df: DataFrame, key: Column, stratum: Column,
      ratesBp: Map[String, Int], defaultBp: Int,
      salt: String = "sample"): DataFrame = {
    require((defaultBp +: ratesBp.values.toSeq)
      .forall(v => v >= 0 && v <= 10000),
      "all rates must be in [0, 10000] basis points")
    // sorted for a deterministic CASE chain (Map order is not stable)
    val rate = ratesBp.toSeq.sortBy(_._1).foldLeft(lit(defaultBp): Column) {
      case (acc, (k, v)) => when(stratum === k, lit(v)).otherwise(acc)
    }
    df.filter(draw(key, salt) < rate)
  }
}
