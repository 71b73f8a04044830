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

  /**
   * Per-document importance weights `(idCol, dl, log_weight)`.
   * `isTarget` is a boolean Column over the input's columns selecting
   * the target subset (e.g. `col("source") === "curated"`); it must be
   * non-empty to be meaningful: an empty target leaves the smoothed
   * target distribution uniform, so every weight collapses to the same
   * document-independent shape (finite, never NaN — smoothing keeps
   * both logs defined; no scan-ahead guard needed).
   *
   * Empty documents (dl = 0) carry no evidence either way and are
   * EXCLUDED from the output — a 0/0 normalization has no meaningful
   * weight; filter them before selection or admit them by policy.
   */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column,
                        alpha: Double = 1.0): DataFrame = {
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
    // per-(doc, term) contribution; target side via left join so terms
    // unseen in the target use cnt_t = 0 (the smoothed formula is the
    // same expression either way — one join shape, no correction split
    // needed because rawCnt already carries every doc term)
    val contrib = terms
      .join(rawCnt, col("__term") === rawCnt("term"))
      .drop("term")
      .join(tgtCnt, col("__term") === tgtCnt("term"), "left")
      .crossJoin(broadcast(stats))
      .select(col("__id"), col("__n"),
        (col("__n") * (log((coalesce(col("cnt_t"), lit(0L)) + lit(alpha)) /
            (col("tok_t") + lit(alpha) * col("vocab"))) -
          log((col("cnt_r") + lit(alpha)) /
            (col("tok_r") + lit(alpha) * col("vocab"))))).as("__c"))
    // dl rides the same groupBy as the sum — no second pass over terms
    contrib.groupBy(col("__id"))
      .agg(sum(col("__c")).as("__sum"), sum(col("__n")).as("dl"))
      .select(col("__id").as(idCol), col("dl"),
        (col("__sum") / col("dl")).as("log_weight"))
  }

  /**
   * Top-k selection by importance weight `(idCol, dl, log_weight)` —
   * ordered on the weight ROUNDED to `tieDecimals` decimals with an
   * id-ascending tiebreak. Ranking on the raw double is not
   * reproducible across engines or even across runs: the distributed
   * sum in [[importanceWeights]] is order-dependent at the last few
   * ulps, so two mathematically-tied documents (e.g. exact duplicates)
   * or a hair-thin gap at the cut can be ordered differently by FP
   * noise alone, flipping the kept SET. Quantizing the sort key to a
   * grid ~1e11 coarser than the noise makes the kept set and the
   * tiebreak a pure function of the data. The deterministic
   * counterpart of the paper's Gumbel resampling: same weights,
   * reproducible selection (the `Sampling.hashSampleWeighted`
   * discipline — no RNG in the plan). Plans as TakeOrderedAndProject
   * (per-partition top-k then a k-row driver merge), never a global
   * sort or window.
   */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, k: Int,
                 alpha: Double = 1.0, tieDecimals: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    importanceWeights(docs, idCol, textCol, isTarget, alpha)
      .orderBy(round(col("log_weight"), tieDecimals).desc, col(idCol).asc)
      .limit(k)
  }
}
