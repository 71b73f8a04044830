package graft

import graft.api.{Document, Typed}

/** Typed Dataset facade: encoder round trips, plan discipline (the
  * Column-expression gate must still push to the scan), and lossless
  * re-typing through the untyped engines. */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("documents round-trip through the Document encoder") {
    val ds = Typed.documents(spark, sfDir)
    val row = ds.head()
    assert(row.text != null && row.n_chars >= 0)
    assert(ds.count() > 0)
  }

  test("lengthGate stays a pushed scan filter, not a lambda") {
    val gated = Typed.lengthGate(Typed.documents(spark, sfDir), 100, 900)
    val physical = gated.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("n_chars"), physical.take(1200))
    assert(gated.collect().forall(d =>
      d.n_chars >= 100 && d.n_chars <= 900))
  }

  test("dedupExact re-types losslessly and keeps one doc per text") {
    val docs = Seq(
      Document(1, "same body", "en", "a", 9),
      Document(2, "same body", "en", "b", 9),
      Document(3, "other", "en", "a", 5)).toDS()
    val out = Typed.dedupExact(docs).collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq == Seq(1L, 3L)) // min-id survivor
    assert(out.head == Document(1, "same body", "en", "a", 9))
  }

  test("splitAssign pairs the intact record with its split") {
    val out = Typed.splitAssign(Typed.documents(spark, sfDir),
      Seq("train" -> 0.8, "test" -> 0.2), salt = "t")
    val rows = out.collect()
    assert(rows.map(_._2).toSet.subsetOf(Set("train", "test")))
    // the typed record is the full document, untouched
    val docs = Typed.documents(spark, sfDir).collect()
      .map(d => d.doc_id -> d).toMap
    assert(rows.forall { case (d, _) => docs(d.doc_id) == d })
  }
}
