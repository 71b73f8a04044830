package graft

import graft.operators.Importance
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  // target (quality=1) speaks {alpha beta}, raw background speaks
  // {noise junk}; doc 10 looks like the target, doc 11 like the noise
  private def corpus = Seq(
    (1L, "alpha beta alpha", 1),
    (2L, "beta alpha beta", 1),
    (3L, "noise junk noise junk", 0),
    (4L, "junk noise junk", 0),
    (10L, "alpha beta", 0),
    (11L, "noise junk", 0),
    (12L, "", 0)
  ).toDF("id", "text", "quality")

  test("target-like documents outweigh background-like ones") {
    val w = Importance.importanceWeights(corpus, "id", "text",
        col("quality") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(10L) > w(11L), s"target-like ${w(10L)} vs noise-like ${w(11L)}")
    assert(w(1L) > w(3L))
    // empty doc excluded
    assert(!w.contains(12L))
  }

  test("weight matches the hand-computed smoothed log ratio") {
    val w = Importance.importanceWeights(corpus, "id", "text",
        col("quality") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // corpus tokens: alpha x4, beta x4, noise x4, junk x5 -> tok_r = 17
    // vocab V = 4; target (docs 1,2): alpha x3, beta x3 -> tok_t = 6
    // doc 10 = {alpha, beta}: both tokens have cnt_t = 3, cnt_r = 4,
    // so per token (and after the /dl) the weight is
    //   ln((3+1)/(6+4)) - ln((4+1)/(17+4))
    // tolerance = the 1e-9 ln-quantization grid (each ln is snapped to
    // 1e-9 before the exact integer sum), not FP ulps
    val expected = (math.log(4.0 / 10) - math.log(5.0 / 21))
    assert(math.abs(w(10L) - expected) < 2e-9,
      s"${w(10L)} vs $expected")
  }

  test("dsirSelect keeps the top-k by weight with deterministic ties") {
    val sel = Importance.dsirSelect(corpus, "id", "text",
        col("quality") === 1, k = 3)
      .collect().map(_.getLong(0)).toSet
    // docs 1, 2 (pure target) and 10 (target-like) outrank all noise
    assert(sel == Set(1L, 2L, 10L), s"got $sel")
  }

  test("empty target yields finite uniform-shifted weights, no NaN") {
    val w = Importance.importanceWeights(corpus, "id", "text",
        col("quality") === 99)
      .collect().map(r => r.getDouble(2))
    assert(w.nonEmpty)
    assert(w.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("exact-duplicate docs at the cut resolve by id, not FP noise") {
    // docs 20/21/22 are identical -> mathematically equal weights; with
    // k cutting inside the tie the kept ids must be the SMALLEST ones,
    // decided by the rounded-weight + id ordering (raw-double ordering
    // would let summation-order ulps pick the survivors)
    val dup = corpus.union(Seq(
      (20L, "alpha beta", 0), (21L, "alpha beta", 0),
      (22L, "alpha beta", 0)).toDF("id", "text", "quality"))
    val sel = Importance.dsirSelect(dup, "id", "text",
        col("quality") === 1, k = 5)
      .collect().map(_.getLong(0)).toSet
    // ranking: {1,2} (pure target), then the four tied target-like
    // docs {10,20,21,22} -> id ascending keeps 10, 20, 21
    assert(sel == Set(1L, 2L, 10L, 20L, 21L), s"got $sel")
  }

  test("k larger than the corpus returns every non-empty doc") {
    val sel = Importance.dsirSelect(corpus, "id", "text",
      col("quality") === 1, k = 100).collect()
    assert(sel.length == 6) // 7 docs minus the empty one
  }
}
