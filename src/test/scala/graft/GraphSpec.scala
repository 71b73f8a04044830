package graft

import graft.operators.Graph

/** PageRank invariants on hand-checkable graphs: symmetry, dangling
  * redistribution, mass conservation, and layout-independence of the
  * integer-grid iteration. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("a 2-cycle is symmetric at exactly half the mass each") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "t")
    val r = Graph.pageRank(e, "s", "t", iters = 5)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r(1L) - 0.5) < 1e-9)
    assert(math.abs(r(2L) - 0.5) < 1e-9)
  }

  test("dangling mass redistributes; total mass stays ~1") {
    // 1 -> 2, 2 is dangling: without redistribution node 1 would decay
    // to the base share only
    val e = Seq((1L, 2L)).toDF("s", "t")
    val r = Graph.pageRank(e, "s", "t", iters = 10)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    assert(r(2L) > r(1L)) // the sink holds more than its feeder
    assert(r(1L) > 0.15 / 2 - 1e-6) // above the bare base share
  }

  test("star graph: the hub out-ranks the leaves") {
    val e = (2L to 6L).map(i => (i, 1L)).toDF("s", "t")
    val r = Graph.pageRank(e, "s", "t", iters = 5)
      .as[(Long, Double)].collect().toMap
    assert((2L to 6L).forall(i => r(1L) > r(i)))
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("extractLinks: boundary-anchored href, real link not shadowed") {
    import org.apache.spark.sql.functions._
    val out = Seq(
      "<a data-href=\"/tracker\" href=\"/real\">x</a>",
      "<a xhref=\"/no\">y</a>",
      "<a\thref=\"/tabbed\">z</a>")
      .toDF("h")
      .select(graft.functions.TextAnalysis.extractLinks(col("h"))
        .as("l"))
      .as[Seq[String]].collect().toSeq
    assert(out == Seq(Seq("/real"), Seq(), Seq("/tabbed")))
  }

  test("extractAnchors: pairs, nested tags stripped, unclosed dropped") {
    import org.apache.spark.sql.functions.col
    val h = "<a href=\"/a\"> <b>Bold</b>\n link </a>" +
      "<A HREF='/b'>plain</A><a href=/c>never closed"
    val got = Seq(Tuple1(h)).toDF("h")
      .select(graft.functions.TextAnalysis.extractAnchors(col("h"))
        .as("a"))
      .selectExpr("inline(a)")
      .as[(String, String)].collect().toSeq
    assert(got == Seq(("/a", "Bold link"), ("/b", "plain")))
  }

  test("pageRank rejects overflow-prone damping denominators") {
    val e = Seq((1L, 2L)).toDF("s", "t")
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "s", "t", dampingNum = 3400000000L,
        dampingDen = 4000000000L)
    }
  }

  test("integer-grid iteration is partition-layout independent") {
    val edges = (1L to 200L).map(i => (i % 23, (i * 7 + 5) % 23))
    val a = Graph.pageRank(edges.toDF("s", "t"), "s", "t", iters = 3)
      .as[(Long, Double)].collect().toMap
    val b = Graph.pageRank(edges.toDF("s", "t").repartition(13),
        "s", "t", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(a == b) // bit-identical, not approximately equal
  }
}
