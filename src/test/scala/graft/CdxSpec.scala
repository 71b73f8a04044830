package graft

import graft.sources.Cdx

class CdxSpec extends SparkSpec {

  private def writeIdx(dir: String, name: String, text: String): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, name), text.getBytes("UTF-8"))

  test("entries: CDXJ lines parse to typed captures; malformed " +
      "timestamp, malformed JSON, and blank lines handled per-ROW") {
    val dir = tmpDir()
    writeIdx(dir, "cdx-00000",
      Cdx.buildCdx(Seq(
        ("com,ex)/a", "20260101123456", "http://ex.com/a", 200,
          "SHA1:AAA", 100L, 0L, "w1.warc.gz"))) +
        "\n" + // blank line skipped
        "com,ex)/bad notatimestamp {\"filename\":\"w\"}\n" +
        "com,ex)/worse 20260101000000 {garbage\n")
    val rows = Cdx.entries(spark, s"$dir/cdx-*").collect()
    assert(rows.length == 3)
    val good = rows.find(_.getAs[String]("cdx_error") == null).get
    assert(good.getAs[String]("surt") == "com,ex)/a" &&
      good.getAs[String]("url") == "http://ex.com/a" &&
      good.getAs[Int]("status") == 200 &&
      good.getAs[Long]("offset") == 0L &&
      good.getAs[String]("filename") == "w1.warc.gz" &&
      good.getAs[java.sql.Timestamp]("capture_ts").toString
        .startsWith("2026-01-01"))
    val errs = rows.filter(_.getAs[String]("cdx_error") != null)
      .map(_.getAs[String]("cdx_error")).sorted
    assert(errs.toSeq == Seq("CDX: malformed JSON blob",
      "CDX: malformed timestamp field"))
  }

  test("latestCaptures: newest per SURT wins; error rows excluded") {
    val dir = tmpDir()
    writeIdx(dir, "cdx-00000",
      Cdx.buildCdx(Seq(
        ("com,ex)/a", "20260101000000", "http://ex.com/a?v=1", 200,
          "D1", 10L, 0L, "w1.warc.gz"),
        ("com,ex)/a", "20260301000000", "http://ex.com/a?v=2", 200,
          "D2", 20L, 50L, "w2.warc.gz"),
        ("com,ex)/b", "20260201000000", "http://ex.com/b", 404,
          "D3", 30L, 99L, "w1.warc.gz"))) +
        "com,ex)/a bad {\"filename\":\"w\"}\n")
    val latest = Cdx.latestCaptures(Cdx.entries(spark, s"$dir/cdx-*"))
      .collect().map(r => (r.getAs[String]("surt"),
        r.getAs[String]("digest"))).sorted
    assert(latest.toSeq == Seq(("com,ex)/a", "D2"), ("com,ex)/b", "D3")))
  }

  test("fetchPlan: per-file offset-sorted ranges with totals — the " +
      "selective-fetch shape (read 50 GB, not 100 TB)") {
    val dir = tmpDir()
    writeIdx(dir, "cdx-00000",
      Cdx.buildCdx(Seq(
        ("s1", "20260101000000", "u1", 200, "D1", 100L, 500L, "w1"),
        ("s2", "20260101000001", "u2", 200, "D2", 200L, 100L, "w1"),
        ("s3", "20260101000002", "u3", 200, "D3", 300L, 0L, "w2"))))
    val plan = Cdx.fetchPlan(Cdx.entries(spark, s"$dir/cdx-*"))
      .collect().map { r =>
        (r.getAs[String]("filename"), r.getAs[Long]("n_records"),
          r.getAs[Long]("total_bytes"),
          r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("ranges")
            .map(x => (x.getLong(0), x.getLong(1))).toSeq)
      }.sortBy(_._1)
    assert(plan.toSeq == Seq(
      ("w1", 2L, 300L, Seq((100L, 200L), (500L, 100L))),
      ("w2", 1L, 300L, Seq((0L, 300L)))))
  }

  test("fetchRecords: positioned range reads pull ONLY the indexed " +
      "records out of a member-per-record shard; bad ranges and " +
      "missing shards quarantine NAMED per-range/per-file") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    val (shard, idx) = Cdx.buildIndexedWarc(Seq(
      ("http://a.test/", "<p>alpha é</p>"),
      ("http://b.test/", "<p>beta</p>"),
      ("http://c.test/", "<p>gamma</p>")))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "w0.warc.gz"), shard)
    // index selects a and c only (b's bytes must never be parsed),
    // plus one lying range and one range into a missing shard
    val sel = idx.filterNot(_._1 == "http://b.test/")
    val cdx = Cdx.buildCdx(
      sel.zipWithIndex.map { case ((uri, off, len), i) =>
        (s"t)/$i", "20260101000000", uri, 200, s"D$i", len, off,
          "w0.warc.gz")
      } ++ Seq(
        ("t)/bad", "20260101000000", "http://bad.test/", 200, "DB",
          400000000L, 5L, "w0.warc.gz"),
        ("t)/gone", "20260101000000", "http://gone.test/", 200, "DG",
          10L, 0L, "missing.warc.gz")))
    import spark.implicits._
    val plan = Cdx.fetchPlan(Cdx.parseLines(
      cdx.split("\n").toSeq.toDF("value")))
    val rows = Cdx.fetchRecords(plan, dir).collect()
    val good = rows.filter(_.getAs[String]("fetch_error") == null)
      .map(r => (r.getAs[String]("target_uri"),
        r.getAs[String]("warc_type"),
        new String(r.getAs[Array[Byte]]("payload"), "UTF-8"))).sorted
    assert(good.toSeq == Seq(
      ("http://a.test/", "resource", "<p>alpha é</p>"),
      ("http://c.test/", "resource", "<p>gamma</p>")))
    val errs = rows.filter(_.getAs[String]("fetch_error") != null)
    assert(errs.length == 2)
    assert(errs.exists(r => r.getAs[String]("filename") == "w0.warc.gz"
      && r.getAs[String]("fetch_error").contains("out of bounds")))
    assert(errs.exists(r =>
      r.getAs[String]("filename") == "missing.warc.gz" &&
        r.getAs[String]("fetch_error").startsWith("shard:")))
  }
}
