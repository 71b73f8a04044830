package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed multinomial Naive Bayes over token features — the
 * fastText-class document classifier that sits in every large-scale
 * training-data pipeline (language gates, quality gates, domain
 * routing: e.g. the CCNet / LLaMA-style "keep pages an English-vs-crawl
 * classifier scores well"). Extension beyond the reference surface
 * (single-table OLAP, `parquery/README.md:4-8`; no model surface).
 *
 * Training is PURE COUNTING — per-class document counts, per-class
 * token totals, per-(class, term) counts — so both train and score are
 * deterministic aggregations: no RNG, no iterative fitting, and the
 * whole thing is replayable as ANSI SQL (the driver's oracle runs the
 * exact formula in DuckDB).
 *
 * Scoring uses Laplace (add-α) smoothing over the training vocabulary
 * V, decomposed so the plan only ever joins OBSERVED (term, class)
 * pairs — the "baseline + correction" form:
 *
 *   score(d, c) = ln(n_c / N)                      (log prior)
 *               + dl_d · ln(α / (tok_c + α·V))     (all-unseen baseline)
 *               + Σ_{t ∈ d, (t,c) observed} n_{t,d} · ln((cnt_{t,c} + α) / α)
 *
 * which is algebraically identical to the textbook
 * Σ n·ln((cnt+α)/(tok_c+αV)) but never materializes the dense
 * (doc-token × class) cross product: the correction join touches only
 * (term, class) rows that exist in the model.
 *
 * Scale shape: training is two counting aggregations over the corpus —
 * one narrow projection to (label, dl) for class stats, one explode →
 * map-side-combined groupBy for (label, term) counts; no join anywhere
 * in train. Scoring joins doc tokens to the model on `term`
 * (token-scale hash join; broadcast when the model is small), plus a
 * docs×C-row baseline frame (C = #classes, single digits). No window
 * over the corpus; the argmax window partitions by document.
 *
 * `featureHash = Some(b)` maps terms to `pmod(xxhash64(term), b)`
 * buckets (the hashing trick) — bounds the model at b×C rows for open
 * vocabularies (100 TB of web text has billions of distinct tokens;
 * the classifier doesn't need them distinguished, it needs bounded
 * state). The setting is CARRIED IN THE MODEL so train and score can
 * never disagree about the feature space. Collisions only blur
 * features, never break the math; ClassifySpec asserts hashed ≡ exact
 * when b is far above vocabulary size.
 */
object Classify {

  /** Trained model: `classStats` (label, n_docs, tok_c) — one row per
    * class; `termCond` (label, term, cnt) — observed pairs only;
    * `stats` — ONE row (n_docs_total, vocab); `featureHash` — the
    * feature space the frames were counted in. Frames are lazy:
    * nothing is collected at train time, and persisting the three
    * frames (plus the featureHash setting beside them) IS model
    * serialization. */
  final case class NbModel(classStats: DataFrame, termCond: DataFrame,
                           stats: DataFrame, featureHash: Option[Int])

  /** Hashing-trick bucketing of an already-exploded token column. */
  private def bucketed(featureHash: Option[Int])(tok: Column): Column =
    featureHash match {
      case Some(b) =>
        require(b >= 2, s"featureHash buckets must be >= 2, got $b")
        pmod(xxhash64(tok), lit(b.toLong)).cast("string")
      case None => tok
    }

  /** (id, dl) total token count per document — INCLUDING empty and
    * null-text docs (dl = 0), which score on priors alone. The
    * coalesce matters: `size(tokens(NULL))` is null under ANSI
    * semantics and would null out every downstream score. */
  private def docLengths(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).as("__id"),
      size(TextAnalysis.tokens(lower(coalesce(col(textCol), lit("")))))
        .cast("long").as("__dl"))

  /**
   * Train: count everything, collect nothing. `labelCol` values are the
   * classes (cast to string); null labels are rejected up front —
   * a silent drop would bias every prior.
   */
  def trainNaiveBayes(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String,
                      featureHash: Option[Int] = None): NbModel = {
    val labeled = docs.select(col(idCol).as("__id"),
      col(textCol).as("__text"),
      when(col(labelCol).isNotNull, col(labelCol).cast("string"))
        .otherwise(raise_error(concat(lit(s"null $labelCol for "),
          col(idCol).cast("string")))).as("__label"))
    // label and text sit on the same row: one narrow projection, no join
    val classStats = labeled
      .select(col("__label").as("label"),
        size(TextAnalysis.tokens(lower(coalesce(col("__text"), lit("")))))
          .cast("long").as("__dl"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__dl")).as("tok_c"))
    val termCond = labeled
      .select(col("__label").as("label"),
        explode(TextAnalysis.tokens(lower(col("__text")))).as("__tok"))
      .select(col("label"),
        bucketed(featureHash)(col("__tok")).as("term"))
      .groupBy(col("label"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val stats = classStats.agg(sum(col("n_docs")).as("n_total"))
      .crossJoin(termCond.agg(
        count_distinct(col("term")).as("vocab")))
    NbModel(classStats, termCond, stats, featureHash)
  }

  /**
   * Per-(document, class) log-scores `(idCol, label, score)` — the full
   * posterior surface (unnormalized log joint), for calibration or
   * thresholding. The feature space comes from the model itself, so a
   * train/score mismatch cannot happen by API shape.
   */
  def scoreNaiveBayes(docs: DataFrame, idCol: String, textCol: String,
                      model: NbModel, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    val dl = docLengths(docs, idCol, textCol)
    // baseline: docs × C rows; log prior + dl tokens of unseen mass
    val base = dl.crossJoin(broadcast(model.stats))
      .crossJoin(broadcast(model.classStats))
      .select(col("__id"), col("label"),
        (log(col("n_docs").cast("double") / col("n_total")) +
          col("__dl") * log(lit(alpha) /
            (col("tok_c") + lit(alpha) * col("vocab")))).as("__base"))
    // correction: only observed (term, class) pairs join
    val corr = TextAnalysis.docTermCounts(docs, idCol, textCol,
        bucketed(model.featureHash))
      .join(model.termCond, col("__term") === col("term"))
      .groupBy(col("__id"), col("label"))
      .agg(sum(col("__n") * log((col("cnt") + lit(alpha)) / lit(alpha)))
        .as("__corr"))
    base.join(corr, Seq("__id", "label"), "left")
      .select(col("__id").as(idCol), col("label"),
        (col("__base") + coalesce(col("__corr"), lit(0.0))).as("score"))
  }

  /**
   * Argmax prediction `(idCol, predicted, score)` — deterministic:
   * ranks on the raw double with a label-ascending tiebreak (ties only
   * arise for empty documents under equal priors). The window
   * partitions by document — never global.
   */
  def predictNaiveBayes(docs: DataFrame, idCol: String, textCol: String,
                        model: NbModel,
                        alpha: Double = 1.0): DataFrame = {
    val scored = scoreNaiveBayes(docs, idCol, textCol, model, alpha)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("label").asc)
    scored.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col(idCol), col("label").as("predicted"), col("score"))
  }
}
