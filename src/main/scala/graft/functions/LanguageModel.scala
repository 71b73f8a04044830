package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * CCNet-style language-model quality filtering (Wenzek et al. 2020,
 * public): train a word-bigram LM on a trusted target corpus
 * (Wikipedia in the paper), score every candidate document by
 * perplexity under that model, and bucket the corpus into
 * head / middle / tail quality tiers. The standard "does this crawl
 * page read like real language" gate. Extension beyond the reference
 * surface (single-table OLAP, `parquery/README.md:4-8`).
 *
 * The model is COUNTING ONLY — target unigram and bigram frequencies
 * with Laplace (add-α) smoothing — so train and score are
 * deterministic aggregations, replayable as ANSI SQL (the driver's
 * oracle recomputes the exact formula in DuckDB). Per document with
 * tokens w_1..w_n (n ≥ 2):
 *
 *   p(w_{i+1} | w_i) = (cnt_bi(w_i w_{i+1}) + α) / (cnt_uni(w_i) + α·V)
 *   ppl(d) = exp( −(1/(n−1)) Σ_i ln p(w_{i+1} | w_i) )
 *
 * V = target unigram vocabulary. Out-of-vocabulary contexts degrade
 * smoothly (cnt 0 on both joins → p = 1/V); documents with fewer than
 * two tokens have no bigrams and are EXCLUDED from the output (no
 * evidence to score — admit or reject them by policy upstream).
 *
 * Bigrams are the two tokens joined with a single space — collision
 * free by construction, because whitespace-split tokens cannot
 * contain a space. The context denominator uses the plain unigram
 * count (the usual simplification: doc-final tokens count as context
 * once more than they appear as one; CCNet's SRILM setup makes the
 * same class of choice).
 *
 * Scale shape: training is two map-side-combined counting aggregations
 * over the target's tokens/bigrams. Scoring explodes candidate bigrams
 * once and hash-joins them to the two model tables (vocabulary-sized;
 * broadcast when small), with corpus totals as a broadcast one-row
 * frame; the per-doc reduction is one groupBy. No global window, no
 * driver collect. [[perplexityBuckets]] adds one exact-percentile
 * aggregation (a C-value broadcast) and a codegen'd CASE — the CCNet
 * head/middle/tail split without a global sort.
 */
object LanguageModel {

  /** Trained bigram LM: `unigrams` (w, cnt), `bigrams` (bg, cnt) with
    * `bg = "w1 w2"`, `stats` — ONE row (vocab). Lazy frames; persist
    * the three to serialize the model. */
  final case class BigramLm(unigrams: DataFrame, bigrams: DataFrame,
                            stats: DataFrame)

  /** `(__id, __w1, bg)` — one row per in-document bigram occurrence
    * (context word and "w1 w2" joined form, repeats kept: each
    * occurrence is scored; both come out of the same transform so the
    * scoring path never re-parses the joined string). Docs with fewer
    * than two tokens yield no rows. */
  private def docBigrams(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(lower(col(textCol)))
    docs.select(col(idCol).as("__id"), toks.as("__toks"))
      .where(size(col("__toks")) >= 2)
      .select(col("__id"), explode(transform(
        sequence(lit(1), size(col("__toks")) - 1),
        i => struct(element_at(col("__toks"), i).as("w1"),
          concat(element_at(col("__toks"), i), lit(" "),
            element_at(col("__toks"), i + 1)).as("bg")))).as("__p"))
      .select(col("__id"), col("__p.w1").as("__w1"),
        col("__p.bg").as("bg"))
  }

  /** Train on the target corpus: unigram and bigram occurrence counts
    * plus the vocabulary size. Pure counting, nothing collected. */
  def trainBigramLm(target: DataFrame, textCol: String): BigramLm = {
    val uni = target
      .select(explode(TextAnalysis.tokens(lower(col(textCol))))
        .as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val bi = docBigrams(target.select(lit(0L).as("__row"),
        col(textCol)), "__row", textCol)
      .select(col("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("cnt"))
    val stats = uni.agg(count(lit(1)).as("vocab"))
    BigramLm(uni, bi, stats)
  }

  /**
   * Score candidates: `(idCol, n_bigrams, ppl)` — smoothed bigram
   * perplexity under the model, one row per document with ≥ 2 tokens.
   * Deterministic; ppl is the raw double (round in the caller's final
   * projection, the registry discipline).
   */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
                 model: BigramLm, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    val scored = docBigrams(docs, idCol, textCol)
      .join(model.bigrams.withColumnRenamed("cnt", "cnt_bi"),
        Seq("bg"), "left")
      .join(model.unigrams.withColumnRenamed("cnt", "cnt_uni")
          .withColumnRenamed("w", "__w1"),
        Seq("__w1"), "left")
      .crossJoin(broadcast(model.stats))
      .select(col("__id"),
        log((coalesce(col("cnt_bi"), lit(0L)) + lit(alpha)) /
          (coalesce(col("cnt_uni"), lit(0L)) + lit(alpha) * col("vocab")))
          .as("__lp"))
    scored.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        exp(-sum(col("__lp")) / count(lit(1))).as("ppl"))
      .select(col("__id").as(idCol), col("n_bigrams"), col("ppl"))
  }

  /**
   * CCNet head/middle/tail: cut the scored frame into `buckets`
   * equal-population tiers by percentile of `ppl` (lowest perplexity
   * = bucket 1 = "head"). One percentile aggregation (C−1 doubles
   * broadcast back) + a codegen'd CASE — no global sort or window,
   * unlike `ntile`. The default is the `approx_percentile` sketch:
   * exact `percentile` funnels every distinct value into one
   * reducer's aggregation buffer (the q_percentile scaladoc's
   * anti-pattern), while the sketch keeps O(1/accuracy) state with
   * map-side partials — the only shape that survives a
   * billion-document corpus. `exact = true` opts into interpolated
   * exact cuts for small frames. Boundary rows (ppl exactly equal to
   * a cut) land in the lower bucket; rows with null/NaN `ppl` (e.g. a
   * left-joined score column for unscorable docs) keep a NULL bucket
   * rather than being mislabeled as worst-tier.
   */
  def perplexityBuckets(scored: DataFrame, pplCol: String = "ppl",
                        buckets: Int = 3, exact: Boolean = false,
                        accuracy: Int = 10000): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val cutAgg =
      if (exact) percentile(col(pplCol), typedlit(probs))
      else approx_percentile(col(pplCol), typedlit(probs), lit(accuracy))
    val cuts = scored.agg(cutAgg.as("__cuts"))
    val tier = probs.indices.reverse.foldLeft(lit(buckets)) {
      case (acc, i) =>
        when(col(pplCol) <= element_at(col("__cuts"), i + 1),
          lit(i + 1)).otherwise(acc)
    }
    val bucket = when(col(pplCol).isNotNull && !isnan(col(pplCol)), tier)
    scored.crossJoin(broadcast(cuts))
      .withColumn("bucket", bucket)
      .drop("__cuts")
  }
}
