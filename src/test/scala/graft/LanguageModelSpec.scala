package graft

import graft.functions.LanguageModel
import org.apache.spark.sql.functions._

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("perplexity matches the hand-computed smoothed bigram formula") {
    val target = Seq("a b a b").toDF("text")
    val model = LanguageModel.trainBigramLm(target, "text")
    // uni: a->2 b->2, V = 2; bi: "a b"->2, "b a"->1
    val docs = Seq((1L, "a b"), (2L, "b a"), (3L, "c c")).toDF("id", "text")
    val ppl = LanguageModel.perplexity(docs, "id", "text", model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // doc 1: p("a b") = (2+1)/(2+2) = 3/4 -> ppl = 4/3
    assert(ppl(1L)._1 == 1L)
    assert(math.abs(ppl(1L)._2 - 4.0 / 3) < 1e-12)
    // doc 2: p("b a") = (1+1)/(2+2) = 1/2 -> ppl = 2
    assert(math.abs(ppl(2L)._2 - 2.0) < 1e-12)
    // doc 3 fully OOV: p = (0+1)/(0+2) = 1/2 -> ppl = V = 2
    assert(math.abs(ppl(3L)._2 - 2.0) < 1e-12)
  }

  test("target-like text scores lower perplexity than noise") {
    val target = Seq("the cat sat on the mat", "the dog sat on the rug")
      .toDF("text")
    val model = LanguageModel.trainBigramLm(target, "text")
    val docs = Seq((1L, "the cat sat on the rug"),
      (2L, "zq xv qqq zzz unseen junk")).toDF("id", "text")
    val ppl = LanguageModel.perplexity(docs, "id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ppl(1L) < ppl(2L),
      s"in-domain ${ppl(1L)} should beat OOV ${ppl(2L)}")
  }

  test("documents with fewer than two tokens are excluded") {
    val model = LanguageModel.trainBigramLm(Seq("a b").toDF("text"), "text")
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("id", "text")
    val ids = LanguageModel.perplexity(docs, "id", "text", model)
      .select("id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("perplexityBuckets cuts equal-population tiers, boundary to lower") {
    val scored = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0).zipWithIndex
      .map { case (p, i) => (i.toLong, 1L, p) }
      .toDF("id", "n_bigrams", "ppl")
    // sketch path (the default, corpus-scale shape) and exact path
    // agree on this data: cuts near 2.x and 4.x either way
    for (exact <- Seq(false, true)) {
      val got = LanguageModel.perplexityBuckets(scored, exact = exact)
        .collect().map(r => r.getDouble(2) -> r.getInt(3)).toMap
      assert(got(1.0) == 1 && got(2.0) == 1, s"exact=$exact: $got")
      assert(got(3.0) == 2 && got(4.0) == 2, s"exact=$exact: $got")
      assert(got(5.0) == 3 && got(6.0) == 3, s"exact=$exact: $got")
    }
  }

  test("perplexityBuckets gives null ppl a null bucket, not worst-tier") {
    val scored = Seq((1L, 1L, Some(1.0)), (2L, 1L, Some(2.0)),
        (3L, 1L, Some(3.0)), (4L, 0L, None))
      .toDF("id", "n_bigrams", "ppl")
    val rows = LanguageModel.perplexityBuckets(scored)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    assert(rows(4L).isEmpty, s"null ppl must keep a null bucket: $rows")
    assert(rows(1L).contains(1) && rows(3L).contains(3))
  }
}
