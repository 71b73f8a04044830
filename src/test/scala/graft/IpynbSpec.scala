package graft

import graft.sources.Ipynb

class IpynbSpec extends SparkSpec {

  private def cellRows(json: String*) = {
    import spark.implicits._
    val nb = json.zipWithIndex.map { case (j, i) => (i.toLong, j) }
      .toDF("nb_id", "json")
    Ipynb.cells(nb, "nb_id").collect().map { r =>
      (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) null else r.getString(3),
        if (r.isNullAt(4)) null else r.getString(4))
    }.sortBy(r => (r._1, r._3)).toSeq
  }

  test("both live source shapes extract verbatim: spec string and " +
      "nbformat list-of-lines (lines carry their own newlines)") {
    val nb = Ipynb.buildIpynb(Seq(
      ("markdown", Left("# Title\nprose body")),
      ("code", Right(Seq("import os\n", "print(1)\n", "x = 2"))),
      ("raw", Left(""))))
    assert(cellRows(nb) == Seq(
      (0L, true, 0, "markdown", "# Title\nprose body"),
      (0L, true, 1, "code", "import os\nprint(1)\nx = 2"),
      (0L, true, 2, "raw", "")))
  }

  test("code-cell extras (outputs, execution_count) and metadata are " +
      "walked over; JSON escapes round-trip through the fixture " +
      "writer") {
    val tricky = "q\"uo\\te\tandé — unicode"
    val nb = Ipynb.buildIpynb(Seq(("markdown", Left(tricky))))
    assert(cellRows(nb) == Seq((0L, true, 0, "markdown", tricky)))
  }

  test("malformed JSON yields ONE parse_ok=false row with null " +
      "cells — counted, never silently dropped; valid siblings " +
      "unaffected") {
    val good = Ipynb.buildIpynb(Seq(("code", Left("pass"))))
    val bad = good.dropRight(7)
    assert(cellRows(good, bad) == Seq(
      (0L, true, 0, "code", "pass"),
      (1L, false, -1, null, null)))
  }

  test("shape leniency: valid JSON without cells and mis-typed " +
      "cells read as parse_ok=false (no usable cells array); cells " +
      "missing source/cell_type yield null fields, not errors") {
    val rows = cellRows(
      """{"nbformat":4}""",
      """{"cells":"not an array"}""",
      """{"cells":[{"cell_type":"code"},{"source":"s"}]}""")
    assert(rows == Seq(
      (0L, false, -1, null, null),
      (1L, false, -1, null, null),
      (2L, true, 0, "code", null),
      (2L, true, 1, null, "s")))
  }

  test("non-ASCII survives the read (the reason this is from_json, " +
      "not variant: the pinned Spark's variant string decode mangles " +
      "UTF-8 to U+FFFD runs)") {
    val nb = Ipynb.buildIpynb(Seq(
      ("markdown", Left("xé—y")),
      ("code", Right(Seq("é\n", "—")))))
    val rows = cellRows(nb)
    assert(rows == Seq(
      (0L, true, 0, "markdown", "xé—y"),
      (0L, true, 1, "code", "é\n—")))
    assert(!rows.exists(_._5 != null && rows.exists(
      r => r._5 != null && r._5.contains('�'))))
  }
}
