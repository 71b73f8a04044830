package graft

import graft.sources.Avro

class AvroSpec extends SparkSpec {

  test("recordsOf: library-written container round-trips through the " +
      "library's own JSON rendering (external anchor), null and " +
      "deflate codecs identical; the rendering may \\u-escape " +
      "non-ASCII (valid JSON — the from_json decode inverts it)") {
    for (codec <- Seq("null", "deflate")) {
      val bytes = Avro.buildContainer(Seq(
        (1L, "Té—xt", "body \"quoted\" line"),
        (2L, "B", "second")), codec)
      val (schema, recs) = Avro.recordsOf(bytes)
      assert(schema.contains("\"doc\""))
      assert(recs.length == 2)
      assert(recs.head.contains("\"id\": 1"))
    }
  }

  test("corrupt containers err NAMED: garbage, empty, header cuts, " +
      "and — the reader's own silent-loss hole — tail truncation " +
      "(avro's hasNext swallows an incomplete block as clean EOF; " +
      "the sync-marker tail check catches it)") {
    val good = Avro.buildContainer(Seq((1L, "t", "b" * 100)))
    for (bad <- Seq("not avro at all".getBytes("UTF-8"),
        Array.empty[Byte], good.take(40), good.take(150),
        good.take(good.length - 1), good.take(good.length - 7),
        good.take(good.length - 17))) {
      val e = intercept[IllegalArgumentException](Avro.recordsOf(bad))
      assert(e.getMessage.startsWith("AVRO:"))
    }
  }

  test("non-ASCII round-trips exactly through render + from_json " +
      "decode") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val (_, recs) = Avro.recordsOf(Avro.buildContainer(
      Seq((1L, "Té—xt", "béödy"))))
    val got = recs.toDF("j")
      .select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "title STRING, body STRING")).as("r"))
      .select(col("r.title"), col("r.body"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(("Té—xt", "béödy")))
  }

  test("recordsJson: one task per shard, per-FILE quarantine, " +
      "records typed back via from_json") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "a.avro"),
      Avro.buildContainer(Seq((1L, "T1", "B1"), (2L, "T2", "B2"))))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "b.avro"),
      "garbage".getBytes("UTF-8"))
    val df = Avro.recordsJson(spark, s"$dir/*.avro")
    val good = df.where(col("avro_error").isNull)
      .select(col("path"),
        from_json(col("record_json"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("title",
              org.apache.spark.sql.types.StringType)))).as("r"))
      .select(col("r.id"), col("r.title"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(good.toSeq == Seq((1L, "T1"), (2L, "T2")))
    val errs = df.where(col("avro_error").isNotNull).collect()
    assert(errs.length == 1 &&
      errs.head.getAs[String]("path").endsWith("b.avro") &&
      errs.head.getAs[String]("avro_error").startsWith("AVRO:"))
  }
}
