package graft

import graft.multimodal.{FrameDecoder, H264, Mp4}

/**
 * MP4 (ISO-BMFF) demux/mux: the container layer that makes real .mp4
 * files decodable by the built-in H.264 path — avcC parameter sets,
 * length-prefixed NAL samples, stsz/stsc/stco location, and the
 * FrameDecoder.Auto ftyp sniff.
 */
class Mp4Spec extends SparkSpec {

  private def gradient(w: Int, h: Int, seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(w * h)(i =>
      ((i * 31 + seed) & 0xFF) << 16 | (rnd.nextInt(256) << 8) |
        ((i / w) & 0xFF))
  }

  test("mux→demux round-trips NAL payloads exactly (I_PCM stream)") {
    val annexB = H264.encode(48, 32,
      Seq(gradient(48, 32, 1), gradient(48, 32, 2)))
    val mp4 = Mp4.fromAnnexB(annexB, 48, 32)
    assert(Mp4.looksLikeMp4(mp4))
    assert(!Mp4.looksLikeMp4(annexB))
    val back = Mp4.demuxToAnnexB(mp4)
    // same NAL payload multiset in the same order (start-code framing
    // may normalize, payload bytes must not)
    val a = H264.nalUnits(annexB).map(_.toSeq)
    val b = H264.nalUnits(back).map(_.toSeq)
    assert(b == a, s"NALs differ: ${a.size} vs ${b.size}")
    // and the decoded pixels are bit-identical
    val fa = H264.decodeFrames(annexB)
    val fb = H264.decodeFrames(back)
    assert(fa.size == 2 && fb.size == 2)
    fa.zip(fb).foreach { case ((w1, h1, p1), (w2, h2, p2)) =>
      assert(w1 == w2 && h1 == h2 && p1.toSeq == p2.toSeq)
    }
  }

  test("real-world shape end-to-end: CAVLC compressed MBs inside MP4 " +
      "through FrameDecoder.Auto, bit-exact vs encoder recon") {
    val frames = Seq(gradient(64, 48, 5), gradient(64, 48, 6),
      gradient(64, 48, 7))
    val (annexB, recon) = H264.encodeCavlc(64, 48, frames, qp = 28)
    val mp4 = Mp4.fromAnnexB(annexB, 64, 48)
    val pngs = FrameDecoder.Auto.frames(mp4)
    assert(pngs.size == 3, s"expected 3 samples, got ${pngs.size}")
    pngs.zip(recon).zipWithIndex.foreach { case ((png, (w, h, rp)), f) =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      val got = Array.tabulate(w * h)(i =>
        img.getRGB(i % w, i / w) & 0xFFFFFF)
      assert(got.toSeq == rp.toSeq, s"frame $f differs from recon")
    }
  }

  test("avcC carries SPS/PPS byte-exact with 4-byte length prefixes") {
    val annexB = H264.encode(16, 16, Seq(gradient(16, 16, 9)))
    val nals = H264.nalUnits(annexB)
    val mp4 = Mp4.fromAnnexB(annexB, 16, 16)
    val back = H264.nalUnits(Mp4.demuxToAnnexB(mp4))
    assert(back.head.toSeq == nals.find(n => (n(0) & 0x1F) == 7).get.toSeq,
      "SPS must round-trip through avcC")
    assert(back(1).toSeq == nals.find(n => (n(0) & 0x1F) == 8).get.toSeq,
      "PPS must round-trip through avcC")
  }

  test("multi-slice pictures group into one sample per picture") {
    // hand-assemble a 2-picture stream where each picture is ONE
    // slice (first_mb 0) — sample count must equal picture count,
    // proven through the decode path (2 frames out)
    val annexB = H264.encode(32, 32,
      Seq(gradient(32, 32, 3), gradient(32, 32, 4)))
    val mp4 = Mp4.fromAnnexB(annexB, 32, 32)
    assert(FrameDecoder.Auto.frames(mp4).size == 2)
  }

  test("unsupported shapes fail with NAMED errors, and degrade to " +
      "skips through the video operators") {
    val annexB = H264.encode(16, 16, Seq(gradient(16, 16, 9)))
    val mp4 = Mp4.fromAnnexB(annexB, 16, 16)
    // truncate inside moov → parse error, not garbage
    intercept[Exception] {
      Mp4.demuxToAnnexB(mp4.take(mp4.length - 20))
    }
    // a file with ftyp but no moov
    val noMoov = mp4.take(24 + 8) // ftyp + mdat header only
    val e = intercept[IllegalArgumentException] {
      Mp4.demuxToAnnexB(noMoov)
    }
    assert(e.getMessage.contains("moov") ||
      e.getMessage.contains("overruns"), e.getMessage)
    // the degrade-don't-fail contract: a corrupt mp4 in a corpus is
    // skipped by videoHashes, not fatal
    import graft.multimodal.{MediaMeta, MediaRow, Multimodal}
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "video", mp4, MediaMeta(16, 16, 0, 1)),
      MediaRow(2L, "video", noMoov, MediaMeta(16, 16, 0, 1))).toDS()
    val hashed = Multimodal.videoHashes(rows)
    assert(hashed.select("media_id").as[Long].collect().toSet == Set(1L))
  }

  // --- fragmented MP4 (round 15) -----------------------------------

  /** Top-level (type, start, end-exclusive) box spans of an ISO-BMFF
    * file — test-side reader for fixture surgery. */
  private def topBoxes(b: Array[Byte]): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var o = 0
    while (o + 8 <= b.length) {
      val size = ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
        ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
      val t = new String(b, o + 4, 4, "ISO-8859-1")
      out += ((t, o, o + size))
      o += size
    }
    out.result()
  }

  private def be32(v: Int): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def rawBox(t: String, payload: Array[Byte]*): Array[Byte] = {
    val n = 8 + payload.map(_.length).sum
    be32(n) ++ t.getBytes("ISO-8859-1") ++ payload.flatten
  }

  test("fMP4 mux→demux round-trips NAL payloads exactly; oracle " +
      "pixels identical to the progressive container") {
    val frames = Seq(gradient(64, 48, 11), gradient(64, 48, 12),
      gradient(64, 48, 13), gradient(64, 48, 14), gradient(64, 48, 15))
    val (annexB, recon) = H264.encodeCavlc(64, 48, frames, qp = 26)
    val fmp4 = Mp4.fromAnnexBFragmented(annexB, 64, 48,
      samplesPerFragment = 2) // 2+2+1 → multi-fragment + short tail
    assert(Mp4.looksLikeMp4(fmp4))
    assert(topBoxes(fmp4).count(_._1 == "moof") == 3)
    val back = Mp4.demuxToAnnexB(fmp4)
    assert(H264.nalUnits(back).map(_.toSeq) ==
      H264.nalUnits(annexB).map(_.toSeq))
    // container agnosticism: same pixels as progressive mux + decode
    val prog = H264.decodeFrames(Mp4.demuxToAnnexB(
      Mp4.fromAnnexB(annexB, 64, 48)))
    val frag = H264.decodeFrames(back)
    assert(frag.size == 5 && prog.size == 5)
    frag.zip(prog).zip(recon).foreach {
      case (((w1, h1, p1), (w2, h2, p2)), (w3, h3, p3)) =>
        assert(w1 == w2 && w2 == w3 && h1 == h2 && h2 == h3)
        assert(p1.toSeq == p2.toSeq && p2.toSeq == p3.toSeq)
    }
  }

  test("orthogonality: CABAC + deblocking + varying QP inside an fMP4 " +
      "demuxes and decodes bit-exact (all round-15 features composed)") {
    val frames = Seq(gradient(48, 48, 91), gradient(48, 48, 92))
    val (annexB, recon) = H264.encodeCabac(48, 48, frames, qp = 30,
      mbRowsPerSlice = 1, deblock = true, qpAmp = 4)
    val fmp4 = Mp4.fromAnnexBFragmented(annexB, 48, 48,
      samplesPerFragment = 1)
    val decoded = H264.decodeFrames(Mp4.demuxToAnnexB(fmp4))
    assert(decoded.size == 2)
    decoded.zip(recon).foreach { case ((w, h, dp), (_, _, rp)) =>
      assert(w == 48 && h == 48 && dp.toSeq == rp.toSeq)
    }
  }

  test("fMP4 variants the muxer never emits: tfhd default-sample-size " +
      "and multi-trun implicit offsets demux correctly") {
    val annexB = H264.encode(32, 32,
      Seq(gradient(32, 32, 21), gradient(32, 32, 22)))
    val gen = Mp4.fromAnnexBFragmented(annexB, 32, 32,
      samplesPerFragment = 1)
    val tops = topBoxes(gen)
    val ftyp = gen.slice(tops(0)._2, tops(0)._3)
    val moov = gen.slice(tops(1)._2, tops(1)._3)
    // extract the two sample payloads from the generated mdats
    val samples = tops.filter(_._1 == "mdat").map { case (_, s, e) =>
      gen.slice(s + 8, e)
    }
    assert(samples.size == 2)

    // variant A: tfhd carries default-sample-size (flag 0x10), NO
    // default-base-is-moof — exercising the implicit moof-start base;
    // trun has data-offset only (flag 0x1)
    def moofA(seq: Int, sample: Array[Byte]): Array[Byte] = {
      val mfhd = rawBox("mfhd", be32(0), be32(seq))
      val tfhd = rawBox("tfhd", be32(0x000010), be32(1),
        be32(sample.length))
      val trun0 = rawBox("trun", be32(0x000001), be32(1), be32(0))
      val traf = rawBox("traf", tfhd, trun0)
      val moofLen = 8 + mfhd.length + traf.length
      val trun = rawBox("trun", be32(0x000001), be32(1),
        be32(moofLen + 8))
      rawBox("moof", mfhd, rawBox("traf", tfhd, trun))
    }
    val fileA = ftyp ++ moov ++
      moofA(1, samples(0)) ++ rawBox("mdat", samples(0)) ++
      moofA(2, samples(1)) ++ rawBox("mdat", samples(1))
    assert(H264.nalUnits(Mp4.demuxToAnnexB(fileA)).map(_.toSeq) ==
      H264.nalUnits(annexB).map(_.toSeq), "variant A NALs differ")

    // variant B: ONE fragment, one traf, TWO truns — the second has
    // no data_offset and must continue where the first ended
    val mfhd = rawBox("mfhd", be32(0), be32(1))
    val tfhd = rawBox("tfhd", be32(0x020000), be32(1))
    def trunFor(sample: Array[Byte], off: Option[Int]): Array[Byte] =
      off match {
        case Some(o) => rawBox("trun", be32(0x000201), be32(1),
          be32(o), be32(sample.length))
        case None => rawBox("trun", be32(0x000200), be32(1),
          be32(sample.length))
      }
    val t2NoOff = trunFor(samples(1), None)
    val t1Sized = trunFor(samples(0), Some(0))
    val moofLenB = 8 + mfhd.length +
      (8 + tfhd.length + t1Sized.length + t2NoOff.length)
    val trafB = rawBox("traf", tfhd,
      trunFor(samples(0), Some(moofLenB + 8)), t2NoOff)
    val fileB = ftyp ++ moov ++ rawBox("moof", mfhd, trafB) ++
      rawBox("mdat", samples(0) ++ samples(1))
    assert(H264.nalUnits(Mp4.demuxToAnnexB(fileB)).map(_.toSeq) ==
      H264.nalUnits(annexB).map(_.toSeq), "variant B NALs differ")

    // named error: size-less trun with size-less tfhd
    val tfhdBare = rawBox("tfhd", be32(0x020000), be32(1))
    val trunBare = rawBox("trun", be32(0x000001), be32(1), be32(64))
    val fileC = ftyp ++ moov ++
      rawBox("moof", mfhd, rawBox("traf", tfhdBare, trunBare)) ++
      rawBox("mdat", samples(0))
    val e = intercept[IllegalArgumentException] {
      Mp4.demuxToAnnexB(fileC)
    }
    assert(e.getMessage.contains("trex size defaults unsupported") ||
      e.getMessage.contains("without sample sizes"), e.getMessage)
  }

  test("fMP4: largesize moof header anchors default-base-is-moof at " +
      "the box START, and multi-traf implicit bases chain") {
    val annexB = H264.encode(32, 32, Seq(gradient(32, 32, 41)))
    val gen = Mp4.fromAnnexBFragmented(annexB, 32, 32,
      samplesPerFragment = 1)
    val tops = topBoxes(gen)
    val ftyp = gen.slice(tops(0)._2, tops(0)._3)
    val moov = gen.slice(tops(1)._2, tops(1)._3)
    val sample = {
      val (_, s, e) = tops.find(_._1 == "mdat").get
      gen.slice(s + 8, e)
    }

    // --- largesize moof: 16-byte header (size=1 + 64-bit largesize).
    // default-base-is-moof must anchor at the size field, not 8 bytes
    // into the box (the old `payloadStart - 8` assumption).
    def rawBox64(t: String, payload: Array[Byte]*): Array[Byte] = {
      val n = 16 + payload.map(_.length).sum
      be32(1) ++ t.getBytes("ISO-8859-1") ++
        Array.fill[Byte](4)(0) ++ be32(n) ++ payload.flatten
    }
    val mfhd = rawBox("mfhd", be32(0), be32(1))
    val tfhdMoofBase = rawBox("tfhd", be32(0x020000), be32(1))
    def trunAt(off: Int): Array[Byte] =
      rawBox("trun", be32(0x000201), be32(1), be32(off),
        be32(sample.length))
    val trafLen = 8 + tfhdMoofBase.length + trunAt(0).length
    val moofLen64 = 16 + mfhd.length + trafLen
    val moof64 = rawBox64("moof", mfhd,
      rawBox("traf", tfhdMoofBase, trunAt(moofLen64 + 8)))
    assert(moof64.length == moofLen64)
    val fileL = ftyp ++ moov ++ moof64 ++ rawBox("mdat", sample)
    assert(H264.nalUnits(Mp4.demuxToAnnexB(fileL)).map(_.toSeq) ==
      H264.nalUnits(annexB).map(_.toSeq), "largesize moof NALs differ")

    // --- multi-traf implicit base: traf#1 (another track, implicit
    // moof-start base) is followed by traf#2 (the video track, NO
    // base flags) whose base must be the END of traf#1's data — not
    // the moof start.
    val dummy = Array.tabulate[Byte](37)(i => (i * 7).toByte)
    val tfhdTrk2 = rawBox("tfhd", be32(0), be32(2))
    val tfhdTrk1 = rawBox("tfhd", be32(0), be32(1))
    def trun1(off: Int) = rawBox("trun", be32(0x000201), be32(1),
      be32(off), be32(dummy.length))
    val trun2 = rawBox("trun", be32(0x000200), be32(1),
      be32(sample.length)) // size only: implicit chained base
    val traf2 = rawBox("traf", tfhdTrk1, trun2)
    val moofLenM = 8 + mfhd.length +
      (8 + tfhdTrk2.length + trun1(0).length) + traf2.length
    val moofM = rawBox("moof", mfhd,
      rawBox("traf", tfhdTrk2, trun1(moofLenM + 8)), traf2)
    assert(moofM.length == moofLenM)
    val fileM = ftyp ++ moov ++ moofM ++ rawBox("mdat", dummy ++ sample)
    assert(H264.nalUnits(Mp4.demuxToAnnexB(fileM)).map(_.toSeq) ==
      H264.nalUnits(annexB).map(_.toSeq), "multi-traf NALs differ")

    // --- named error: traf#1's data end UNKNOWN (size-less trun on a
    // foreign track) followed by an implicit-base video traf
    val tfhdTrk2Bare = rawBox("tfhd", be32(0), be32(2))
    val trunBare2 = rawBox("trun", be32(0x000001), be32(1), be32(0))
    val moofU = rawBox("moof", mfhd,
      rawBox("traf", tfhdTrk2Bare, trunBare2), traf2)
    val fileU = ftyp ++ moov ++ moofU ++ rawBox("mdat", dummy ++ sample)
    val e = intercept[IllegalArgumentException] {
      Mp4.demuxToAnnexB(fileU)
    }
    assert(e.getMessage.contains("data end is unknown"), e.getMessage)
  }

  test("64-bit largesize boxes walk correctly (the >4 GiB mdat shape)") {
    // real >4 GiB files use size == 1 + a 64-bit largesize; rewrite
    // the muxed fixture's mdat into that form (its content shifts by
    // 8, so the stco chunk offset is patched to match) and demux must
    // produce the identical Annex-B stream
    val annexB = H264.encode(32, 32, Seq(gradient(32, 32, 21)))
    val mp4 = Mp4.fromAnnexB(annexB, 32, 32)
    def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    def put32(b: Array[Byte], o: Int, v: Long): Unit = {
      b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
      b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
    }
    val ftypEnd = u32(mp4, 0).toInt
    assert(new String(mp4, ftypEnd + 4, 4, "ISO-8859-1") == "mdat")
    val mdatSize = u32(mp4, ftypEnd)
    val out = new java.io.ByteArrayOutputStream()
    out.write(mp4, 0, ftypEnd)
    out.write(Array[Byte](0, 0, 0, 1), 0, 4) // size = 1 → largesize
    out.write("mdat".getBytes("ISO-8859-1"), 0, 4)
    val large = new Array[Byte](8)
    put32(large, 4, mdatSize + 8) // largesize includes its own field
    out.write(large, 0, 8)
    out.write(mp4, ftypEnd + 8, mp4.length - ftypEnd - 8)
    val rewritten = out.toByteArray
    // patch stco's single chunk offset (+8 for the largesize field):
    // locate the stco box inside the (shifted) moov
    var i = ftypEnd + mdatSize.toInt + 8
    var stco = -1
    while (i < rewritten.length - 4 && stco < 0) {
      if (new String(rewritten, i, 4, "ISO-8859-1") == "stco") stco = i
      i += 1
    }
    assert(stco > 0, "stco not found")
    val offField = stco + 4 /*ver/flags*/ + 4 /*count*/ + 4
    put32(rewritten, offField, u32(rewritten, offField) + 8)
    val back = Mp4.demuxToAnnexB(rewritten)
    assert(H264.nalUnits(back).map(_.toSeq) ==
      H264.nalUnits(annexB).map(_.toSeq),
      "largesize mdat must demux to the identical NALs")
  }

  test("looksLikeMp4 sniffs ftyp and rejects other containers") {
    assert(!Mp4.looksLikeMp4(Array[Byte](0, 0, 0, 1, 0x67)))
    assert(!Mp4.looksLikeMp4("ÿØÿ".getBytes("ISO-8859-1")))
    assert(!Mp4.looksLikeMp4(Array.emptyByteArray))
    val ok = Array[Byte](0, 0, 0, 24) ++
      "ftypisom".getBytes("ISO-8859-1") ++ new Array[Byte](12)
    assert(Mp4.looksLikeMp4(ok))
  }
}
