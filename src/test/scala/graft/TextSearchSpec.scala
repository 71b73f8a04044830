package graft

import graft.functions.TextSearch
import org.apache.spark.sql.functions._

class TextSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark joins data with data"),   // dl 5, "data" tf 2
    (2L, "spark joins data"),             // dl 3, "data" tf 1
    (3L, "spark spark spark spark"),      // dl 4, no "data"
    (4L, "rare gem here"),                // dl 3, unique terms
    (5L, "   ")                           // whitespace-only: no postings
  ).toDF("doc_id", "text")

  test("invertedIndex: tf, dl, and empty-text handling") {
    val (postings, docLens) = TextSearch.invertedIndex(docs, "doc_id", "text")
    val p = postings.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(p.contains(("data", 1L, 2L, 5L)))
    assert(p.contains(("data", 2L, 1L, 3L)))
    assert(p.contains(("spark", 3L, 4L, 4L)))
    assert(!p.exists(_._2 == 5L), "whitespace-only doc must produce no postings")
    val dl = docLens.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dl == Map(1L -> 5L, 2L -> 3L, 3L -> 4L, 4L -> 3L))
  }

  test("bm25: higher tf wins at equal length; missing term scores nothing") {
    val q = Seq((10L, "data")).toDF("query_id", "qtext")
    val res = TextSearch.bm25Search(docs, "doc_id", "text", q,
      "query_id", "qtext", k = 10)
      .orderBy("rank").collect()
    // only docs 1 and 2 contain "data"
    assert(res.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    // doc 1 has tf 2 but dl 5; tf dominates here
    assert(res(0).getInt(3) == 1 && res(0).getLong(1) == 1L)
  }

  test("bm25: length normalization prefers the shorter doc at equal tf") {
    val d = Seq(
      (1L, "term pad pad pad pad pad pad pad"),
      (2L, "term pad")
    ).toDF("doc_id", "text")
    val q = Seq((0L, "term")).toDF("query_id", "qtext")
    val res = TextSearch.bm25Search(d, "doc_id", "text", q,
      "query_id", "qtext", k = 2).orderBy("rank").collect()
    assert(res(0).getLong(1) == 2L, "shorter doc must rank first under b > 0")
    // b = 0 disables length normalization: equal tf scores tie, id breaks
    val flat = TextSearch.bm25Search(d, "doc_id", "text", q,
      "query_id", "qtext", k = 2, b = 0.0).orderBy("rank").collect()
    assert(flat(0).getLong(1) == 1L)
    assert(flat(0).getDouble(2) == flat(1).getDouble(2))
  }

  test("bm25: rarer term out-scores a common one (idf)") {
    val q = Seq((0L, "gem"), (1L, "spark")).toDF("query_id", "qtext")
    val res = TextSearch.bm25Search(docs, "doc_id", "text", q,
      "query_id", "qtext", k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(res(0L) > res(1L),
      s"df=1 'gem' must out-score df=3 'spark': $res")
  }

  test("bm25: multi-term query sums contributions; repeated query word counts once") {
    val q = Seq((0L, "spark data"), (1L, "spark data data")).toDF("query_id", "qtext")
    val res = TextSearch.bm25Search(docs, "doc_id", "text", q,
      "query_id", "qtext", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // distinct-terms contract: both queries identical
    assert(res.keySet.map(_._1) == Set(0L, 1L))
    res.collect { case ((0L, d), s) => assert(res((1L, d)) == s) }
    // doc 3 matches only "spark" but still surfaces
    assert(res.contains((0L, 3L)))
  }

  test("bm25: all-miss query yields no rows; k caps output") {
    val q = Seq((0L, "absent words only"), (1L, "spark")).toDF("query_id", "qtext")
    val res = TextSearch.bm25Search(docs, "doc_id", "text", q,
      "query_id", "qtext", k = 2).collect()
    assert(!res.exists(_.getLong(0) == 0L))
    assert(res.count(_.getLong(0) == 1L) == 2)
    assert(res.filter(_.getLong(0) == 1L).map(_.getInt(3)).toSet == Set(1, 2))
  }

  test("against-index form equals the inline form") {
    val (postings, docLens) = TextSearch.invertedIndex(docs, "doc_id", "text")
    val q = Seq((0L, "spark data"), (7L, "gem")).toDF("query_id", "qtext")
    val a = TextSearch.bm25SearchAgainstIndex(postings, docLens, q,
      "query_id", "qtext", k = 5).collect().toSet
    val b = TextSearch.bm25Search(docs, "doc_id", "text", q,
      "query_id", "qtext", k = 5).collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("empty corpus: empty, well-typed result") {
    val q = Seq((0L, "spark")).toDF("query_id", "qtext")
    val res = TextSearch.bm25Search(docs.limit(0), "doc_id", "text", q,
      "query_id", "qtext", k = 3)
    assert(res.count() == 0)
    assert(res.columns.toSeq == Seq("query_id", "doc_id", "score", "rank"))
  }

  test("hybridSearchRrf: hand-checked fusion — both-list docs beat " +
      "single-list docs, ties break on doc_id") {
    // doc 1 and 2 match the query text (1 stronger: repeated term);
    // vectors make doc 3 densest, doc 2 second — so doc 2 is the only
    // BOTH-list doc and must fuse to the top even though it wins
    // neither list alone
    val corpus = Seq(
      (1L, "spark spark engine", Array(0.0f, 1.0f)),
      (2L, "spark rows", Array(0.9f, 0.5f)),
      (3L, "unrelated words here", Array(1.0f, 0.0f)),
      (4L, "other text entirely", Array(-1.0f, 0.0f))
    ).toDF("doc_id", "text", "embedding")
    val q = Seq((0L, "spark", Array(1.0f, 0.0f)))
      .toDF("query_id", "qtext", "qv")
    val got = TextSearch.hybridSearchRrf(corpus, "doc_id", "text",
        "embedding", q, "query_id", "qtext", "qv",
        k = 4, candidates = 2, kRrf = 60)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // lex: 1 (rank 1), 2 (rank 2); dense: 3 (rank 1), 2 (rank 2)
    // rrf(2) = 1/62 + 1/62 ≈ 0.032258; rrf(1) = rrf(3) = 1/61 ≈
    // 0.016393 — tie broken by doc_id; doc 4 in neither list
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 3L))
    assert(math.abs(got(0)._2 - 2.0 / 62) < 1e-6)
    assert(math.abs(got(1)._2 - 1.0 / 61) < 1e-6)
    assert(got.map(_._3).toSeq == Seq(1, 2, 3))
  }

  test("rrfFuse consumes ranks from ANY retriever pair; " +
      "hybridSearchRrfIvf at full probe equals the exact configuration") {
    // hand-built rank frames through the fusion core directly
    val lex = Seq((0L, 10L, 1), (0L, 11L, 2))
      .toDF("query_id", "doc_id", "rank")
    val dense = Seq((0L, 11L, 1), (0L, 12L, 2))
      .toDF("query_id", "doc_id", "rank")
    val fused = TextSearch.rrfFuse(lex, dense, "query_id", k = 3)
      .orderBy(col("rank")).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    // 11 in both lists (1/62 + 1/61); 10 and 12 one list each, tie on
    // score -> doc_id order
    assert(fused.map(_._1).toSeq == Seq(11L, 10L, 12L))
    assert(math.abs(fused(0)._2 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    // separable corpus: IVF dense stage probing EVERY cell must
    // reproduce the exact configuration end-to-end
    val corpus = Seq(
      (1L, "spark spark engine", Array(0.0f, 1.0f)),
      (2L, "spark rows", Array(0.9f, 0.5f)),
      (3L, "unrelated words here", Array(1.0f, 0.0f)),
      (4L, "other text entirely", Array(-1.0f, 0.0f))
    ).toDF("doc_id", "text", "embedding")
    val q = Seq((0L, "spark", Array(1.0f, 0.0f)))
      .toDF("query_id", "qtext", "qv")
    val exact = TextSearch.hybridSearchRrf(corpus, "doc_id", "text",
        "embedding", q, "query_id", "qtext", "qv",
        k = 4, candidates = 2).orderBy(col("rank")).collect().toSeq
    val ivf = TextSearch.hybridSearchRrfIvf(corpus, "doc_id", "text",
        "embedding", q, "query_id", "qtext", "qv",
        k = 4, candidates = 2, nlist = 2, nprobe = 2)
      .orderBy(col("rank")).collect().toSeq
    assert(ivf == exact)
    // the pluggable dense stages directly: full-probe IVF ranks must
    // equal the exact broadcast-scan ranks (nothing pruned), and the
    // exact stage must rank by cosine with doc_id tie-break
    val er = TextSearch.exactDenseRanks(corpus, "doc_id", "embedding",
        q, "query_id", "qv", candidates = 4)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(er.map(_._1) == Seq(3L, 2L, 1L, 4L)) // cosine vs (1,0)
    val ir = TextSearch.ivfDenseRanks(corpus, "doc_id", "embedding",
        q, "query_id", "qv", candidates = 4, nlist = 2, nprobe = 2)
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(ir == er)
  }
}
