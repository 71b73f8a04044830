package graft

import org.apache.spark.sql.functions._

import graft.sources.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def record(url: String, text: String,
                     version: String = "WARC/1.0"): String =
    version + "\r\n" +
      s"WARC-Type: conversion\r\nWARC-Target-URI: $url\r\n" +
      "WARC-Date: 2024-06-01T12:00:00Z\r\n" +
      s"Content-Length: ${text.getBytes("UTF-8").length}\r\n\r\n" +
      text + "\r\n\r\n"

  private def wetFile(records: Seq[(String, String)],
                      version: String = "WARC/1.0"): String = {
    val f = java.nio.file.Files.createTempFile("graft-wet", ".wet")
    java.nio.file.Files.writeString(f,
      records.map { case (u, t) => record(u, t, version) }.mkString)
    f.toString
  }

  test("readWetRecords splits a real WET file into records") {
    val path = wetFile(Seq(
      ("http://a.example/1", "first doc text\nsecond line"),
      ("http://b.example/2", "short"),
      ("http://c.example/3", "third doc")))
    val docs = Warc.wetDocuments(spark, path).orderBy("url").collect()
    assert(docs.length == 3)
    assert(docs.map(_.getString(0)).toSeq == Seq(
      "http://a.example/1", "http://b.example/2", "http://c.example/3"))
    assert(docs(0).getString(3) == "first doc text\nsecond line")
    assert(docs(0).getLong(2) == "first doc text\nsecond line".length)
    assert(docs.forall(_.getString(1) == "2024-06-01T12:00:00Z"))
  }

  test("WARC/1.1 archives split correctly when the version is passed") {
    val path = wetFile(Seq(
      ("http://a.example/1", "one"), ("http://b.example/2", "two")),
      version = "WARC/1.1")
    assert(Warc.wetDocuments(spark, path, "WARC/1.1").count() == 2)
  }

  test("payload blank lines and a bare in-payload version LINE do not " +
      "split or truncate the record") {
    val text = "para one\n\npara two\nWARC/1.0\nnot a new record\n\nend"
    val path = wetFile(Seq(("http://x.example/p", text)))
    val got = Warc.wetDocuments(spark, path).collect()
    assert(got.length == 1)
    assert(got(0).getString(3) == text)
  }

  test("content trailing newlines survive the round trip") {
    val text = "ends with blank lines\n\n"
    val path = wetFile(Seq(("http://t.example/n", text)))
    val got = Warc.wetDocuments(spark, path).collect()(0)
    // only the record terminator is stripped — content bytes intact
    assert(got.getString(3) == text)
  }

  test("corrupt records yield null fields, not a failed scan") {
    val f = java.nio.file.Files.createTempFile("graft-wet", ".wet")
    java.nio.file.Files.writeString(f,
      "WARC/1.0\r\ngarbage without headers or blank line")
    val got = Warc.wetDocuments(spark, f.toString).collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(0) && got(0).isNullAt(2))
  }

  test("hostile header values cannot shadow other headers") {
    val f = java.nio.file.Files.createTempFile("graft-wet", ".wet")
    java.nio.file.Files.writeString(f,
      "WARC/1.0\r\n" +
        "WARC-Target-URI: http://evil/?x=Content-Length: 0\r\n" +
        "Content-Length: 7\r\n\r\npayload\r\n\r\n")
    val got = Warc.wetDocuments(spark, f.toString).collect()(0)
    assert(got.getString(0) == "http://evil/?x=Content-Length: 0")
    assert(got.getLong(2) == 7L)
    assert(got.getString(3) == "payload")
  }

  test("toWetRecord ∘ parseWet is identity; Content-Length is octets") {
    val docs = Seq((1L, "hello world"), (2L, ""), (3L, "tab\tand space"),
      (4L, "trailing\n\n"), (5L, "中国 bytes"))
      .toDF("id", "text")
    val parsed = Warc.parseWet(docs.select(Warc.toWetRecord(
        concat(lit("u/"), col("id").cast("string")),
        lit("2024-01-01T00:00:00Z"), col("text")).as("record")))
      .orderBy("url").collect()
    assert(parsed.map(_.getString(3)).toSeq ==
      Seq("hello world", "", "tab\tand space", "trailing\n\n",
        "中国 bytes"))
    assert(parsed.map(_.getLong(2)).toSeq ==
      Seq(11L, 0L, 13L, 10L, 12L)) // 中国 = 6 octets + " bytes"
  }

  test("streaming WET ingestion dedups across archive drops") {
    val wetDir = java.nio.file.Files
      .createTempDirectory("graft-wet-stream").toString
    val corpus = java.nio.file.Files
      .createTempDirectory("graft-wet-corpus").toString + "/c"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-wet-ckpt").toString
    def drop(name: String, records: Seq[(String, String)]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(wetDir, name),
        records.map { case (u, t) => record(u, t) }.mkString)
    drop("seg1.wet", Seq(("http://a/1", "alpha"), ("http://b/2", "beta")))
    Warc.wetIngest(spark, wetDir, corpus, ckpt).awaitTermination()
    // second drop: one new doc, one exact re-crawl of an ingested one
    drop("seg2.wet", Seq(("http://c/3", "gamma"), ("http://a/1", "alpha")))
    Warc.wetIngest(spark, wetDir, corpus, ckpt).awaitTermination()
    val got = spark.read.parquet(corpus)
      .select("url", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("http://a/1", "alpha"), ("http://b/2", "beta"),
      ("http://c/3", "gamma")))
  }

  test("record splitting survives many records across input splits") {
    // force multiple Hadoop splits with a small maxPartitionBytes so a
    // delimiter straddles a split boundary somewhere
    val n = 500
    val path = wetFile((0 until n).map(i =>
      (s"http://s.example/$i", s"document number $i " + ("x" * 200))))
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
      val docs = Warc.wetDocuments(spark, path)
      assert(docs.count() == n)
      assert(docs.where(col("url").isNull).count() == 0)
      val ids = docs.select(
          regexp_extract(col("url"), "/(\\d+)$", 1).cast("int"))
        .as[Int].collect().sorted
      assert(ids.toSeq == (0 until n))
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }
}
