package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * DSIR-style data selection via importance resampling (Xie et al.,
 * NeurIPS 2023, public): score every raw document by how much more
 * likely its token bag is under the TARGET distribution (a trusted
 * high-quality subset — Wikipedia, curated domains, an in-domain seed
 * set) than under the RAW distribution, then keep the top-weighted
 * documents. The standard "make 100 TB of crawl look like 100 GB of
 * quality data" selection pass. Extension beyond the reference surface
 * (single-table OLAP, `parquery/README.md:4-8`).
 *
 * Both distributions are smoothed bag-of-tokens estimated from the
 * corpus itself — pure counting, no fitting — so the whole operator is
 * deterministic and SQL-replayable (the driver's oracle runs the exact
 * formula in DuckDB). Per document:
 *
 *   logw(d) = (1/dl_d) · Σ_t n_{t,d} · [ ln p̂_T(t) − ln p̂_R(t) ]
 *   p̂_X(t) = (cnt_X(t) + α) / (tok_X + α·V)     V = raw vocabulary
 *
 * length-normalized (the 1/dl) so the ratio measures per-token
 * affinity, not document length. Per (doc, term) row the raw count
 * joins inner (every document term is in the raw vocabulary by
 * construction) and the target count joins left with `coalesce(·, 0)`
 * — the smoothed formula is the same expression whether the term was
 * seen in the target or not, so one join shape covers both cases.
 *
 * == Determinism discipline ==
 *
 * A raw double Σ of per-(doc,term) contributions is order-dependent at
 * the last few ulps, so neither the ranking NOR the emitted value is a
 * pure function of the data — Spark's partial-sum order and an oracle
 * engine's aggregation order can round a near-boundary value to
 * different decimals (the failure mode that kept `q_dsir_select` red
 * for two rounds). The fix quantizes at the source and never sums in
 * FP: each smoothed log-probability is snapped to the 1e-9 grid AS A
 * LONG (`round(ln·1e9)`), the per-term contribution is the exact
 * integer `n · (lnT − lnR)`, and the per-doc total S is a LONG sum —
 * associative, order-independent, bit-identical in any engine. The
 * final 4-decimal rounding of S/(dl·1e9) is likewise integer-exact
 * (see [[dsirSelect]]), so the projected weight is a pure function of
 * the data, the same discipline as `Analytics.distributionDrift`'s
 * exact-DECIMAL TV accumulation. Magnitude headroom: |ln p̂| < 100
 * (would need e^100 tokens to exceed), so |lnT−lnR|·1e9 < 2e11 and a
 * doc of 1e6 tokens stays < 2e17 — inside Long for any real corpus.
 *
 * Scale shape: two map-side-combined counting aggregations
 * (token-scale), then token-scale hash joins of the doc-term rows to
 * the raw and target term tables (both vocabulary-sized; broadcast
 * when small), corpus totals as broadcast one-row frames — no driver
 * collect, no global window; the per-doc sum and the length
 * normalization come out of ONE groupBy; [[dsirSelect]]'s top-k ranks
 * via a single ordered limit (TakeOrderedAndProject), never a full
 * sort.
 */
object Importance {

  /** 1e-9 quantization grid for the smoothed log-probabilities: fine
   * enough that the quantization error (≤ 1e-9 per token, so ≤ 1e-9 on
   * the length-normalized weight) is far below any meaningful weight
   * difference, coarse enough that a 1-ulp libm `ln` disagreement
   * between engines virtually never crosses a grid boundary. */
  private val LnScale = 1000000000L

  /** `(__id, dl, __s)` — per-doc token count and the exact integer
   * weight sum on the 1e-9 ln grid; `log_weight = __s / (dl · 1e9)`. */
  private def exactParts(docs: DataFrame, idCol: String, textCol: String,
                         isTarget: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    val terms = TextAnalysis.docTermCounts(docs, idCol, textCol)
    val targetIds = docs.where(isTarget).select(col(idCol).as("__id"))
    val rawCnt = terms.groupBy(col("__term").as("term"))
      .agg(sum(col("__n")).as("cnt_r"))
    val tgtCnt = terms.join(targetIds, "__id")
      .groupBy(col("__term").as("term"))
      .agg(sum(col("__n")).as("cnt_t"))
    // one-row corpus totals: raw tokens, target tokens, raw vocabulary
    val stats = rawCnt.agg(sum(col("cnt_r")).as("tok_r"),
        count(lit(1)).as("vocab"))
      .crossJoin(tgtCnt.agg(
        coalesce(sum(col("cnt_t")), lit(0L)).as("tok_t")))
    // grid-snapped log-probabilities (LONG): round(ln p̂ · 1e9)
    def lnQ(p: Column): Column = round(log(p) * lit(LnScale), 0).cast("long")
    // per-(doc, term) contribution as an exact integer; target side via
    // left join so terms unseen in the target use cnt_t = 0 (the
    // smoothed formula is the same expression either way — one join
    // shape, no correction split needed because rawCnt already carries
    // every doc term)
    val contrib = terms
      .join(rawCnt, col("__term") === rawCnt("term"))
      .drop("term")
      .join(tgtCnt, col("__term") === tgtCnt("term"), "left")
      .crossJoin(broadcast(stats))
      .select(col("__id"), col("__n"),
        (col("__n") *
          (lnQ((coalesce(col("cnt_t"), lit(0L)) + lit(alpha)) /
             (col("tok_t") + lit(alpha) * col("vocab"))) -
           lnQ((col("cnt_r") + lit(alpha)) /
             (col("tok_r") + lit(alpha) * col("vocab"))))).as("__c"))
    // dl rides the same groupBy as the sum — no second pass over terms
    contrib.groupBy(col("__id"))
      .agg(sum(col("__c")).as("__s"), sum(col("__n")).as("dl"))
  }

  /**
   * Per-document importance weights `(idCol, dl, log_weight)`.
   * `isTarget` is a boolean Column over the input's columns selecting
   * the target subset (e.g. `col("source") === "curated"`); it must be
   * non-empty to be meaningful: an empty target leaves the smoothed
   * target distribution uniform, so every weight collapses to the same
   * document-independent shape (finite, never NaN — smoothing keeps
   * both logs defined; no scan-ahead guard needed).
   *
   * `log_weight` is deterministic: the exact integer sum divided once
   * in double (`S / (dl·1e9)`), reproducible across runs, partition
   * layouts, and engines (see the object scaladoc). Accuracy vs the
   * un-quantized formula is within 1e-9 — far inside any meaningful
   * weight difference.
   *
   * Empty documents (dl = 0) carry no evidence either way and are
   * EXCLUDED from the output — a 0/0 normalization has no meaningful
   * weight; filter them before selection or admit them by policy.
   */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column,
                        alpha: Double = 1.0): DataFrame =
    exactParts(docs, idCol, textCol, isTarget, alpha)
      .select(col("__id").as(idCol), col("dl"),
        (col("__s").cast("double") /
          (col("dl").cast("double") * lit(LnScale.toDouble)))
          .as("log_weight"))

  /**
   * Top-k selection by importance weight `(idCol, dl, log_weight)`,
   * where `log_weight` is emitted ROUNDED to `tieDecimals` decimals
   * and the ranking orders on that rounded weight descending with an
   * id-ascending tiebreak. The rounding is integer-exact, never
   * FP-then-round: with S the integer sum on the 1e-9 grid and
   * `den = dl · 10^(9−tieDecimals)`, the rounded weight is
   * `sign(S) · ⌊(2|S| + den) / 2den⌋ / 10^tieDecimals` — half away
   * from zero, computed entirely in Long, so the kept set, the
   * tiebreak, AND the projected value are pure functions of the data
   * (an oracle replays the identical integer arithmetic). The
   * deterministic counterpart of the paper's Gumbel resampling: same
   * weights, reproducible selection (the
   * `Sampling.hashSampleWeighted` discipline — no RNG in the plan).
   * Plans as TakeOrderedAndProject (per-partition top-k then a k-row
   * driver merge), never a global sort or window.
   */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int,
                 alpha: Double = 1.0, tieDecimals: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(tieDecimals >= 0 && tieDecimals <= 9,
      s"tieDecimals must be in [0, 9], got $tieDecimals")
    val pow10 = math.pow(10.0, tieDecimals)
    val denom = (col("dl") * lit(LnScale / pow10.toLong)).as("__den")
    val q = expr("(2 * abs(__s) + __den) div (2 * __den)")
    exactParts(docs, idCol, textCol, isTarget, alpha)
      .withColumn("__den", denom)
      .select(col("__id").as(idCol), col("dl"),
        (signum(col("__s")).cast("long") * q / lit(pow10))
          .as("log_weight"))
      .orderBy(col("log_weight").desc, col(idCol).asc)
      .limit(k)
  }
}
