package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * BM25 full-text retrieval over an inverted index — the lookup side of
 * a training-data pipeline: "which documents in this 100 TB corpus
 * match this query / this contamination probe / this eval prompt".
 * Extension beyond the reference surface (its engine is single-table
 * OLAP, `parquery/README.md:4-8`; no text-retrieval surface).
 *
 * Scoring is Okapi BM25 with the Lucene idf variant
 * (Robertson–Spärck Jones with +1 inside the log, so idf is always
 * positive even for terms in more than half the corpus):
 *
 *   idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
 *   score(q, d) = Σ_{t ∈ distinct(q)} idf(t) · tf(t,d)·(k1+1)
 *                   / (tf(t,d) + k1·(1 - b + b·dl(d)/avgdl))
 *
 * Query-side term frequency is intentionally dropped (terms are
 * DISTINCT per query — the common engine simplification; repeating a
 * word in a 5-word query shouldn't double its weight).
 *
 * Scale shape, by stage:
 *  - Index build ([[invertedIndex]]): one explode to (doc, term), one
 *    map-side-combined groupBy — the standard distributed
 *    inverted-index job. Document length is DENORMALIZED into each
 *    posting (term, doc, tf, dl) so search never joins a lengths
 *    table per hit — the classic posting-list layout, paid once at
 *    build, saved at every query.
 *  - Search ([[bm25SearchAgainstIndex]]): the query set broadcasts
 *    (small by contract, like every query frame here); the postings
 *    join touches ONLY the probed terms' lists — persisted partitioned
 *    by term, that is a partition-pruned read of ~df/|corpus| of the
 *    index. df(t) needs no separate statistics table: the probed
 *    posting list IS every document containing t, so a count over the
 *    (query, term) window reads it off the hits in flight.
 *  - All shuffles after the probe are hits-sized (Σ df over query
 *    terms), never corpus-sized; windows partition by query — no
 *    global sort anywhere.
 */
object TextSearch {

  /**
   * Build the inverted index: postings `(term, doc_id, tf, dl)` — one
   * row per (document, distinct term), lowercased whitespace tokens
   * (exactly [[TextAnalysis.tokens]] semantics; empty/whitespace-only
   * documents produce no postings) — plus the per-document length
   * table `(doc_id, dl)` for corpus statistics (N, avgdl). `dl` counts
   * ALL token occurrences, not distinct terms.
   *
   * Persist postings `.write.partitionBy("term")` (or bucketed by
   * term) and searches read only the probed terms' partitions.
   */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    (tf.join(dl, "doc_id").select(col("term"), col("doc_id"),
      col("tf"), col("dl")), dl)
  }

  /**
   * BM25 top-k against a prebuilt [[invertedIndex]]: returns
   * `(queryIdCol, doc_id, score, rank)`, ranks 1..k per query,
   * deterministic (rank on the raw double with a doc_id tiebreak;
   * round only in the final projection — the same engine-portability
   * discipline as [[TextAnalysis.tfidfTopTerms]]). Queries whose terms
   * all miss the corpus produce no rows. N and avgdl come from
   * `docLens` via a broadcast one-row frame — no driver collect.
   */
  def bm25SearchAgainstIndex(postings: DataFrame, docLens: DataFrame,
                             queries: DataFrame, queryIdCol: String,
                             queryTextCol: String, k: Int,
                             k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"need k1 >= 0 and b in [0, 1], got k1=$k1 b=$b")
    val stats = docLens.agg(count(lit(1)).as("__n"),
      avg(col("dl")).as("__avgdl"))
    val qt = queries.select(col(queryIdCol),
      explode(array_distinct(
        TextAnalysis.tokens(lower(col(queryTextCol))))).as("term"))
    val hits = postings.join(broadcast(qt), Seq("term"))
    // df(term) = rows in the term's posting list; the window reads it
    // off the already-probed hits instead of a second index pass
    val wdf = Window.partitionBy(col(queryIdCol), col("term"))
    val scored = hits
      .withColumn("__df", count(lit(1)).over(wdf))
      .crossJoin(broadcast(stats))
      .withColumn("__contrib",
        log(lit(1.0) + (col("__n") - col("__df") + 0.5)
          / (col("__df") + 0.5))
          * col("tf") * (k1 + 1.0)
          / (col("tf") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl") / col("__avgdl"))))
    val agg = scored.groupBy(col(queryIdCol), col("doc_id"))
      .agg(sum(col("__contrib")).as("__raw"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__raw").desc, col("doc_id"))
    agg.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col("doc_id"),
        round(col("__raw"), 4).as("score"), col("rank"))
  }

  /** [[bm25SearchAgainstIndex]] with the index built inline — the
    * self-contained form for one-shot retrieval; production builds the
    * index once and searches many times. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, queryIdCol: String,
                 queryTextCol: String, k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (postings, docLens) = invertedIndex(docs, idCol, textCol)
    bm25SearchAgainstIndex(postings, docLens, queries, queryIdCol,
      queryTextCol, k, k1, b)
  }

  /**
   * Hybrid lexical+dense retrieval fused by Reciprocal Rank Fusion
   * (Cormack, Clarke & Buettcher 2009 — public method): per query,
   * take the top-`candidates` BM25 hits and the top-`candidates`
   * embedding-cosine hits, score every candidate
   * `Σ_lists 1/(kRrf + rank)` (a list not containing the doc
   * contributes 0 — the standard convention), and keep the top `k` by
   * fused score with a doc-id tiebreak. RRF needs only RANKS, never
   * score calibration across the two systems — which is exactly why
   * it is the production default for first-stage hybrid retrieval.
   *
   * Output: (queryIdCol, doc_id, rrf, rank).
   *
   * Scale shape: the lexical stage is [[bm25Search]] (hits-sized
   * shuffles against a term-partitioned index); the dense stage here
   * is the EXACT scan — corpus vectors stream past the broadcast query
   * set with a per-query window (the [[graft.operators.Similarity
   * .hardNegatives]] shape; queries are small by contract). For
   * web-scale corpora swap the dense stage for `ivfTopK`/`ivfpqTopK`
   * candidates — RRF consumes ranks from ANY retriever pair. The
   * fusion join itself is candidates-sized (≤ 2·candidates rows per
   * query), never corpus-sized.
   */
  def hybridSearchRrf(docs: DataFrame, idCol: String, textCol: String,
                      vecCol: String,
                      queries: DataFrame, queryIdCol: String,
                      queryTextCol: String, queryVecCol: String,
                      k: Int, candidates: Int = 20,
                      kRrf: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // no candidates >= k requirement: the fused pool holds up to
    // 2*candidates docs (the two lists need not overlap), so k may
    // exceed the per-list depth; output is simply capped by the pool
    require(candidates >= 1, s"candidates must be >= 1, got $candidates")
    require(kRrf >= 1, s"kRrf must be >= 1, got $kRrf")
    val lex = bm25Search(
        docs.select(col(idCol), col(textCol)), idCol, textCol,
        queries.select(col(queryIdCol), col(queryTextCol)),
        queryIdCol, queryTextCol, candidates)
      .select(col(queryIdCol), col("doc_id"),
        col("rank").as("__lex_rank"))
    val cos = graft.operators.Similarity.cosineFn(docs, useNative = true)
    val qv = queries.select(col(queryIdCol),
      col(queryVecCol).cast("array<double>").as("__qv"))
    val wd = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__cos").desc, col("doc_id"))
    val dense = docs
      .select(col(idCol).as("doc_id"),
        col(vecCol).cast("array<double>").as("__dv"))
      .crossJoin(broadcast(qv))
      .withColumn("__cos", cos(col("__dv"), col("__qv")))
      .withColumn("__dense_rank", row_number().over(wd))
      .where(col("__dense_rank") <= candidates)
      .select(col(queryIdCol), col("doc_id"), col("__dense_rank"))
    val wf = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__rrf").desc, col("doc_id"))
    lex.join(dense, Seq(queryIdCol, "doc_id"), "full_outer")
      .withColumn("__rrf",
        coalesce(lit(1.0) / (lit(kRrf) + col("__lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("__dense_rank")),
            lit(0.0)))
      .withColumn("rank", row_number().over(wf))
      .where(col("rank") <= k)
      .select(col(queryIdCol), col("doc_id"),
        round(col("__rrf"), 6).as("rrf"), col("rank"))
  }
}
