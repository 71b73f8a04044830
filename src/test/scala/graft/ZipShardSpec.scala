package graft

import graft.sources.Zip

/**
 * ZIP shard ingestion: text members explode with BOM-aware decode,
 * non-text members skip COUNTED, bombs err named (per-entry and
 * per-shard), corrupt shards quarantine per-file.
 */
class ZipShardSpec extends SparkSpec {

  test("text members decode (BOM stripped), binary members skip " +
      "counted, member names and order survive") {
    val shard = Zip.buildShard(Seq(
      ("a/one.txt", "first document"),
      ("a/two.jsonl", "{\"text\":\"second\"}"),
      ("notes.md", "# third doc")))
    val (members, skipped) = Zip.textMembers(shard)
    assert(members.map(_._1) == Seq("a/one.txt", "a/two.jsonl", "notes.md"))
    assert(members.map(_._2) == Seq("first document",
      "{\"text\":\"second\"}", "# third doc"))
    assert(skipped == 1, "the planted binary member must be counted")
    // BOM-led member
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("bom.txt"))
    z.write(Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte))
    z.write("ünïcode body".getBytes("UTF-8")); z.closeEntry(); z.close()
    val (m2, _) = Zip.textMembers(out.toByteArray)
    assert(m2 == Seq("bom.txt" -> "ünïcode body"))
  }

  test("a shard whose members together blow the decode budget errs " +
      "NAMED; garbage is a NAMED error") {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.setLevel(9)
    val zeros = new Array[Byte](1 << 16)
    (0 until 3).foreach { i =>
      z.putNextEntry(new java.util.zip.ZipEntry(s"p$i.txt"))
      var fed = 0L
      while (fed < (100L << 20)) { z.write(zeros); fed += zeros.length }
      z.closeEntry()
    }
    z.close()
    val e = intercept[IllegalArgumentException](
      Zip.textMembers(out.toByteArray))
    assert(e.getMessage.contains("bomb"))
    intercept[IllegalArgumentException](Zip.textMembers("junk".getBytes))
  }

  test("Spark surface: one task per shard, members exploded, corrupt " +
      "shards quarantined per-file") {
    val dir = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s1.zip"),
      Zip.buildShard(Seq(("d1.txt", "alpha"), ("d2.txt", "beta"))))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s2.zip"),
      Zip.buildShard(Seq(("d3.txt", "gamma"))))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.zip"),
      "PKjunk but not a zip really".getBytes)
    val out = Zip.textShards(spark, dir + "/*.zip").collect()
    val ok = out.filter(_.getString(4) == null)
    val bad = out.filter(_.getString(4) != null)
    assert(ok.map(_.getString(2)).toSet == Set("alpha", "beta", "gamma"))
    assert(ok.forall(_.getInt(3) == 1))
    assert(bad.length == 1 && bad(0).getString(0).endsWith("bad.zip"))
  }
}
