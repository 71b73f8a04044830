package graft

import org.scalatest.funsuite.AnyFunSuite

class QuerySpecSpec extends AnyFunSuite {

  test("measure normalization follows tool.py:181-204 rules") {
    assert(Measure.normalize(Seq(Seq("m1"))) ==
      Seq(Measure("m1", AggOp.Sum, "m1")))
    assert(Measure.normalize(Seq(Seq("m1", "mean"))) ==
      Seq(Measure("m1", AggOp.Mean, "m1")))
    assert(Measure.normalize(Seq(Seq("m1", "max", "out"))) ==
      Seq(Measure("m1", AggOp.Max, "out")))
  }

  test("agg aliases: avg→mean, stddev→std") {
    assert(AggOp.parse("avg") == AggOp.Mean)
    assert(AggOp.parse("stddev") == AggOp.Std)
  }

  test("unknown agg op raises with valid list (engine parity)") {
    val e = intercept[IllegalArgumentException](AggOp.parse("median"))
    assert(e.getMessage.contains("count_distinct"))
  }

  test("filter op parsing incl. aliases") {
    assert(FilterOp.parse("nin") == FilterOp.NotIn)
    assert(FilterOp.parse("=") == FilterOp.Eq)
    intercept[IllegalArgumentException](FilterOp.parse("like"))
  }

  test("all ten reference agg ops parse") {
    Seq("sum", "mean", "std", "count", "count_na", "count_distinct",
      "sorted_count_distinct", "min", "max", "one")
      .foreach(n => AggOp.parse(n))
  }
}
