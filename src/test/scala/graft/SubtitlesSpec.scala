package graft

import graft.sources.Subtitles

/**
 * SRT/WebVTT parsing: block grammar, timestamp forms (comma/dot
 * separators, optional hours), advisory-index renumbering, VTT
 * signature/NOTE/settings/identifiers/markup stripping, entity
 * decoding, malformed-cue skipping vs zero-cue NAMED errors, and the
 * exploding quarantined Spark surface.
 */
class SubtitlesSpec extends SparkSpec {

  private val cues = Seq(
    (0L, 1500L, "first cue text"),
    (2000L, 3800L, "second cue\nwith a line break"),
    (4000L, 6000L, "third & final <cue>"))

  test("SRT and VTT fixtures parse to the same cues: times in ms, " +
      "markup stripped, entities decoded, indexes in file order") {
    val entIn = cues.map { case (s, e, t) =>
      (s, e, t.replace("&", "&amp;").replace("<", "&lt;")
        .replace(">", "&gt;")) }
    val fromSrt = Subtitles.parse(Subtitles.buildSrt(entIn))
    val fromVtt = Subtitles.parse(Subtitles.buildVtt(entIn))
    for (got <- Seq(fromSrt, fromVtt)) {
      assert(got.length == 3)
      assert(got.map(_.idx) == Seq(0, 1, 2))
      assert(got.map(c => (c.startMs, c.endMs)) ==
        cues.map(c => (c._1, c._2)))
      assert(got.map(_.text) == cues.map(_._3),
        "markup must strip and entities decode identically")
    }
  }

  test("real-world slop parses: renumbered/missing indexes, dot " +
      "milliseconds in SRT, hourless VTT timestamps, BOM, CRLF") {
    val srt = "﻿99\r\n00:00:01.000 --> 00:00:02,500\r\nhi there\r\n" +
      "\r\n\r\n00:00:03,000 --> 00:00:04,000\r\nno index line\r\n"
    val got = Subtitles.parse(srt)
    assert(got.map(_.text) == Seq("hi there", "no index line"))
    assert(got(0).startMs == 1000L && got(0).endMs == 2500L)
    val vtt = "WEBVTT\n\n01:00.000 --> 01:30.000\nhourless cue\n"
    val v = Subtitles.parse(vtt)
    assert(v.length == 1 && v(0).startMs == 60000L && v(0).endMs == 90000L)
  }

  test("malformed cues skip; zero parseable cues is a NAMED error") {
    val mixed = "1\n00:00:01,000 --> garbage\nskipped\n\n" +
      "2\n00:00:02,000 --> 00:00:03,000\nkept\n"
    val got = Subtitles.parse(mixed)
    assert(got.map(_.text) == Seq("kept"))
    intercept[IllegalArgumentException](Subtitles.parse("not subtitles"))
    intercept[IllegalArgumentException](Subtitles.parse("WEBVTT\n\nNOTE\nonly a note\n"))
    intercept[IllegalArgumentException](Subtitles.parse(""))
  }

  test("Spark surface explodes cues and quarantines per-row") {
    import spark.implicits._
    val rows: Seq[(Long, String)] = Seq(
      (1L, Subtitles.buildSrt(cues)),
      (2L, "garbage, not a subtitle file"),
      (3L, Subtitles.buildVtt(cues)))
    val out = Subtitles.parseAll(spark.createDataset(rows)).collect()
    assert(out.count(_.getString(5) == null) == 6)
    val bad = out.filter(_.getString(5) != null)
    assert(bad.length == 1 && bad(0).getLong(0) == 2L)
    assert(bad(0).getString(5).contains("SRT"))
  }
}
