package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * Source-mixture rebalancing for training-data blends: given a target
 * share per source (e.g. 50% web / 30% code / 20% books, by weight
 * column — tokens, chars, docs), compute the per-source keep fractions
 * that hit the target EXACTLY while retaining as much data as possible,
 * then apply them with the deterministic sampler.
 *
 * The math (standard corpus-mixing): with current per-source masses
 * t_s and target shares w_s (Σw = 1), the largest total T whose blend
 * is achievable without oversampling satisfies w_s·T ≤ t_s for every s,
 * so T = min_s t_s/w_s (the scarcest source binds) and f_s = w_s·T/t_s.
 * Exactly one source keeps fraction 1.0; everything else downsamples.
 *
 * Scale shape: the only driver-side data is one row per SOURCE (a
 * groupBy-sum over the corpus — bounded by the source vocabulary, not
 * the data); membership is then [[Sampling.stratifiedHashSample]]'s
 * pure-function-of-(key, salt, fraction) predicate — zero further
 * shuffles, reproducible across engines and repartitionings.
 *
 * Fractions apply at document granularity: the realized token blend
 * approaches the target as doc-length variance within a source
 * averages out (the standard approximation; length-stratify the key if
 * a source's lengths are wildly skewed).
 *
 * Extension beyond the reference surface (parquery has no sampling or
 * mixing operators).
 */
object Mixture {

  /**
   * Per-source keep fractions hitting `targetShares` with maximum
   * retained mass. `masses` maps source → current total (tokens/chars/
   * docs). Sources absent from `targetShares` get fraction 0 (dropped
   * from the blend).
   */
  def planFractions(masses: Map[String, Long],
                    targetShares: Map[String, Double]): Map[String, Double] = {
    require(targetShares.nonEmpty, "need at least one target share")
    val total = targetShares.values.sum
    require(math.abs(total - 1.0) < 1e-6,
      s"target shares must sum to 1, got $total")
    targetShares.foreach { case (s, w) =>
      require(w > 0, s"share for $s must be > 0")
      require(masses.getOrElse(s, 0L) > 0L,
        s"target source '$s' has no mass in the corpus")
    }
    val bindingT = targetShares.map { case (s, w) => masses(s) / w }.min
    targetShares.map { case (s, w) =>
      // snap to exactly 1.0 within an ulp-scale tolerance: the binding
      // source's w*(t/w)/t can land an ulp BELOW 1.0 in doubles, which
      // would turn its "keep all" threshold into 'ffff' and silently drop
      // the ~1/65536 of keys whose md5 prefix is exactly ffff
      val f = w * bindingT / masses(s)
      s -> (if (f >= 1.0 - 1e-12) 1.0 else f)
    }
  }

  /**
   * Rebalance `df` to `targetShares` of `weightCol` mass per
   * `sourceCol`: one aggregation for the per-source masses (source-
   * vocabulary-sized collect), then a deterministic stratified filter.
   */
  def rebalance(df: DataFrame, keyCol: String, sourceCol: String,
                weightCol: String, targetShares: Map[String, Double],
                salt: String = "mix"): DataFrame = {
    val masses = df.groupBy(col(sourceCol))
      .agg(sum(col(weightCol)).as("__m"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Number](1).longValue).toMap
    Sampling.stratifiedHashSample(df, keyCol, sourceCol,
      planFractions(masses, targetShares), salt)
  }

  /**
   * Temperature-flattened target shares — the multilingual-LM
   * α-sampling recipe (Conneau & Lample 2019; mT5's "temperature"):
   * `p_s ∝ mass_s^α` with `α ∈ (0, 1]`. α = 1 keeps the natural
   * distribution; α → 0 flattens toward uniform, up-weighting
   * low-resource sources so the head cannot drown them. α = 0.5 uses
   * `sqrt` (IEEE-754 correctly-rounded, so an oracle replays it bit-
   * exactly); other α go through `pow`, whose last-ulp behavior is
   * libm-specific — fine for training mixes, documented for replays.
   */
  def temperatureShares(masses: Map[String, Long],
                        alpha: Double): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(masses.nonEmpty, "need at least one source")
    masses.foreach { case (s, m) =>
      require(m > 0L, s"source '$s' has no mass") }
    val pows = masses.map { case (s, m) =>
      s -> (if (alpha == 0.5) math.sqrt(m.toDouble)
            else math.pow(m.toDouble, alpha))
    }
    val z = pows.values.sum
    pows.map { case (s, p) => s -> p / z }
  }

  /** [[rebalance]] with [[temperatureShares]] computed from the
    * corpus's own per-source masses — one aggregation, then the
    * deterministic stratified filter; the temperature arithmetic runs
    * on the source-vocabulary-sized driver rows. */
  def rebalanceTemperature(df: DataFrame, keyCol: String,
                           sourceCol: String, weightCol: String,
                           alpha: Double,
                           salt: String = "mix"): DataFrame = {
    val masses = df.groupBy(col(sourceCol))
      .agg(sum(col(weightCol)).as("__m"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Number](1).longValue).toMap
    Sampling.stratifiedHashSample(df, keyCol, sourceCol,
      planFractions(masses, temperatureShares(masses, alpha)), salt)
  }
}
