package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Similarity, Skew}
import graft.plans.{Mojibake, NativeFunctions}

/** Round-8 additions: bloom-gated join reduction, deterministic
  * training shuffle / source interleave, k-NN label propagation,
  * mojibake repair. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("mojibake repair: single, double, and identity cases") {
    assert(Mojibake.repair("cafÃ©") == "café")
    assert(Mojibake.repair("naÃ¯ve donâ€™t") == "naïve don’t")
    assert(Mojibake.repair("Â°C and Â£5") == "°C and £5")
    // four-byte sequence (emoji) through the cp1252 glyph block
    assert(Mojibake.repair("ðŸ˜€ ok") == "😀 ok")
    // double encoding unwinds over two passes
    assert(Mojibake.repair("cafÃƒÂ©") == "café")
    // clean ASCII is identity (and allocation-free by construction)
    assert(Mojibake.repair("clean ascii text") == "clean ascii text")
    // legitimate non-ASCII: 'á' IS a UTF-8 lead byte under cp1252,
    // but its neighbors fail the continuation window — untouched
    assert(Mojibake.repair("já correct é") == "já correct é")
    // overlong/surrogate guards: C0/C1 leads invalid, ED A0 excluded
    assert(Mojibake.repair("À¯") == "À¯")
    assert(Mojibake.repair("í ") == "í ")
  }

  test("mojibake expression runs under whole-stage codegen") {
    NativeFunctions.register(spark)
    val out = Seq("cafÃ©", "plain", null)
      .toDF("t")
      .select(NativeFunctions.fixMojibakeNative(col("t")).as("f"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("café"), Some("plain"), None))
  }

  test("bloomGatedJoin equals the plain join") {
    val big = (1L to 5000L).map(i => (i % 400, i)).toDF("k", "v")
    val small = (0L until 400L).filter(_ % 13 == 0)
      .map(k => (k, s"d$k")).toDF("k", "name")
    val gated = Skew.bloomGatedJoin(big, small, Seq("k"))
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    val plain = big.join(small, Seq("k"))
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(gated == plain && gated.nonEmpty)
  }

  test("bloomGatedJoin: empty small side and unsafe join types") {
    val big = (1L to 100L).map(i => (i, i)).toDF("k", "v")
    val empty = Seq.empty[(Long, String)].toDF("k", "name")
    assert(Skew.bloomGatedJoin(big, empty, Seq("k")).count() == 0)
    intercept[IllegalArgumentException] {
      Skew.bloomGatedJoin(big, empty, Seq("k"), joinType = "left")
    }
    intercept[IllegalArgumentException] {
      Skew.bloomGatedJoin(big, empty, Seq("k"), joinType = "left_anti")
    }
  }

  test("deterministicShuffle: contiguous per-shard positions, " +
      "layout-independent") {
    val df = (1L to 500L).toDF("id")
    val out = Sampling.deterministicShuffle(df, "id", shards = 4, salt = "s")
      .select("id", "shard", "pos")
      .as[(Long, Int, Int)].collect()
    assert(out.length == 500 && out.map(_._1).distinct.length == 500)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // same (shard, pos) regardless of input partitioning
    val re = Sampling.deterministicShuffle(
        df.repartition(7), "id", shards = 4, salt = "s")
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(re.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException] {
      Sampling.deterministicShuffle(df, "id", shards = 5)
    }
  }

  test("hashSampleN: exactly n, layout-stable, TakeOrdered plan") {
    val df = (1L to 1000L).toDF("id")
    val a = Sampling.hashSampleN(df, "id", 50, "s")
      .as[Long].collect().toSet
    val b = Sampling.hashSampleN(df.repartition(13), "id", 50, "s")
      .as[Long].collect().toSet
    assert(a.size == 50 && a == b)
    val plan = Sampling.hashSampleN(df, "id", 50, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    // n larger than the input returns everything
    assert(Sampling.hashSampleN(df, "id", 5000).count() == 1000)
  }

  test("interleaveBySource: batch b holds the b-th doc of each source") {
    val df = (1L to 90L).map(i => (i, s"src${i % 3}")).toDF("id", "src")
    val out = Sampling.interleaveBySource(df, "src", "id", salt = "x")
      .select("src", "batch").as[(String, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0L until 30L))
    }
  }

  test("schemaContract: ok / drift / missing / extra statuses") {
    val df = Seq((1L, "a", 2)).toDF("id", "name", "cnt")
    val out = graft.operators.Profile.schemaContract(df,
        Seq("id" -> "bigint", "cnt" -> "bigint", "added" -> "string"))
      .as[(String, String, String, String)].collect().toSeq
    assert(out == Seq(
      ("id", "bigint", "bigint", "ok"),
      ("cnt", "bigint", "int", "type_drift"),
      ("added", "string", null, "missing"),
      ("name", null, "string", "extra")))
    // case-insensitive resolution, contract name reported as declared
    val ci = graft.operators.Profile.schemaContract(df,
        Seq("ID" -> "bigint")).select("status").as[String].collect()
    assert(ci.head == "ok")
  }

  test("packedText: offset-ordered assembly, count per sequence") {
    val packed = Seq(
      (0L, 0L, "first"), (0L, 5L, "second"), (0L, 11L, "third"),
      (1L, 0L, "solo")).toDF("seq_id", "seq_offset", "text")
    val out = graft.operators.Pack.packedText(packed, "text", sep = " ")
      .select("seq_id", "n_docs", "text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((0L, 3L, "first second third"), (1L, 1L, "solo")))
  }

  test("knnLabel: planted neighborhoods vote their label") {
    // labeled: 6 copies of vector A (label 1), 6 of vector B (label 2);
    // unlabeled u1 == A must take label 1 with 5/5 votes, u2 == B → 2
    val a = Seq(1.0f, 0.0f, 0.0f)
    val b = Seq(0.0f, 1.0f, 0.0f)
    val labeled = ((1L to 6L).map(i => (i, a, 1)) ++
      (7L to 12L).map(i => (i, b, 2))).toDF("nid", "nv", "label")
    val unlabeled = Seq((101L, a), (102L, b)).toDF("id", "v")
    val out = Similarity.knnLabel(unlabeled, labeled,
        "id", "v", "nid", "nv", "label", k = 5)
      .select("id", "label").as[(Long, Int)].collect().toMap
    val votes = Similarity.knnLabel(unlabeled, labeled,
        "id", "v", "nid", "nv", "label", k = 5)
      .select("id", "votes").as[(Long, Long)].collect().toMap
    assert(out == Map(101L -> 1, 102L -> 2))
    assert(votes == Map(101L -> 5L, 102L -> 5L))
  }

  test("knnLabel: count ties break toward the smaller label") {
    // two labeled vectors equally close, different labels → k=2 splits
    // 1-1; the smaller label wins deterministically
    val u = Seq((1L, Seq(1.0f, 0.0f))).toDF("id", "v")
    val lab = Seq((10L, Seq(1.0f, 0.1f), 7), (11L, Seq(1.0f, -0.1f), 3))
      .toDF("nid", "nv", "label")
    val out = Similarity.knnLabel(u, lab, "id", "v", "nid", "nv",
        "label", k = 2)
      .select("label").as[Int].collect().toSeq
    assert(out == Seq(3))
  }
}
