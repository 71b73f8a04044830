package graft.multimodal

/**
 * Minimal ISO base media file format (MP4) demuxer + muxer for H.264
 * video tracks (ISO/IEC 14496-12 container, 14496-15 avcC — public
 * specs), closing the "real files arrive as MP4" gap: bare Annex-B
 * byte streams are an interchange format, but actual .mp4 files carry
 * `avcC` (out-of-band SPS/PPS) plus LENGTH-PREFIXED NAL samples
 * located through the `stbl` sample tables. This module extracts that
 * structure and re-emits Annex-B for the existing [[H264]] decode
 * path ([[FrameDecoder.Auto]] sniffs `ftyp` and routes here), and
 * muxes Annex-B back into a spec-valid MP4 for fixtures.
 *
 * Demux scope: the first video (`hdlr` = 'vide') track; `avc1`/`avc3`
 * sample entries; `stsz`/`stsc`/`stco`-or-`co64` sample location
 * (versioned boxes tolerated, 64-bit box sizes supported); samples
 * emitted in decode order, which equals display order for the I-only
 * streams the H.264 path decodes. Unsupported shapes (no video
 * track, fragmented `moof` movies, non-AVC codecs) throw named errors
 * — the degrade-don't-fail `Try` upstream turns them into skips.
 */
object Mp4 {

  /** `ftyp` leads every conformant file — the [[FrameDecoder.Auto]]
    * container sniff. */
  def looksLikeMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)

  private def boxType(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, "ISO-8859-1")

  /** Walk the child boxes of [from, to): (type, payloadStart,
    * payloadEnd) triples in file order. */
  private def boxes(b: Array[Byte], from: Long,
                    to: Long): Seq[(String, Long, Long)] = {
    val out = Seq.newBuilder[(String, Long, Long)]
    var o = from
    while (o + 8 <= to) {
      val size0 = u32(b, o.toInt)
      val t = boxType(b, o.toInt)
      val (payload, end) =
        if (size0 == 1) (o + 16, o + u64(b, o.toInt + 8)) // largesize
        else if (size0 == 0) (o + 8, to) // extends to end
        else (o + 8, o + size0)
      require(end <= to && end > o, s"box $t overruns its parent")
      out += ((t, payload, end))
      o = end
    }
    out.result()
  }

  private def child(b: Array[Byte], kids: Seq[(String, Long, Long)],
                    t: String): Option[(Long, Long)] =
    kids.find(_._1 == t).map(k => (k._2, k._3))

  /** Parsed AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1). */
  final case class AvcC(lengthSize: Int, sps: Seq[Array[Byte]],
                        pps: Seq[Array[Byte]])

  private def parseAvcC(b: Array[Byte], from: Long, to: Long): AvcC = {
    var o = from.toInt
    require(b(o) == 1, s"avcC configurationVersion ${b(o)}")
    o += 4 // version, profile, compat, level
    val lengthSize = (b(o) & 3) + 1
    o += 1
    val nSps = b(o) & 0x1F
    o += 1
    val sps = (0 until nSps).map { _ =>
      val n = u16(b, o); o += 2
      val a = java.util.Arrays.copyOfRange(b, o, o + n); o += n
      a
    }
    val nPps = b(o) & 0xFF
    o += 1
    val pps = (0 until nPps).map { _ =>
      val n = u16(b, o); o += 2
      val a = java.util.Arrays.copyOfRange(b, o, o + n); o += n
      a
    }
    require(o <= to, "avcC overruns its box")
    AvcC(lengthSize, sps, pps)
  }

  /** Per-sample (offset, size) pairs resolved from stsz/stsc/stco. */
  private def sampleLocations(b: Array[Byte],
                              stbl: Seq[(String, Long, Long)])
      : Seq[(Long, Int)] = {
    val (szS, szE) = child(b, stbl, "stsz")
      .getOrElse(throw new IllegalArgumentException("no stsz"))
    require(szE > szS, "empty stsz")
    val uniform = u32(b, szS.toInt + 4)
    val count = u32(b, szS.toInt + 8).toInt
    val sizes: Array[Int] =
      if (uniform != 0) Array.fill(count)(uniform.toInt)
      else Array.tabulate(count)(i =>
        u32(b, szS.toInt + 12 + 4 * i).toInt)
    val (coS, coE, wide) = child(b, stbl, "stco")
      .map(c => (c._1, c._2, false))
      .orElse(child(b, stbl, "co64").map(c => (c._1, c._2, true)))
      .getOrElse(throw new IllegalArgumentException("no stco/co64"))
    require(coE > coS)
    val nChunks = u32(b, coS.toInt + 4).toInt
    val chunkOff: Array[Long] = Array.tabulate(nChunks)(i =>
      if (wide) u64(b, coS.toInt + 8 + 8 * i)
      else u32(b, coS.toInt + 8 + 4 * i))
    val (scS, _) = child(b, stbl, "stsc")
      .getOrElse(throw new IllegalArgumentException("no stsc"))
    val nRuns = u32(b, scS.toInt + 4).toInt
    val runs = (0 until nRuns).map { i =>
      val o = scS.toInt + 8 + 12 * i
      (u32(b, o).toInt, u32(b, o + 4).toInt) // (first_chunk, perChunk)
    }
    // expand runs: samples per chunk for chunk 1..nChunks (1-based)
    val perChunk = new Array[Int](nChunks)
    runs.zipWithIndex.foreach { case ((first, n), i) =>
      val last = if (i + 1 < nRuns) runs(i + 1)._1 - 1 else nChunks
      var c = first
      while (c <= last) { perChunk(c - 1) = n; c += 1 }
    }
    val out = Seq.newBuilder[(Long, Int)]
    var sample = 0
    var chunk = 0
    while (chunk < nChunks && sample < count) {
      var off = chunkOff(chunk)
      var i = 0
      while (i < perChunk(chunk) && sample < count) {
        out += ((off, sizes(sample)))
        off += sizes(sample)
        sample += 1
        i += 1
      }
      chunk += 1
    }
    require(sample == count,
      s"stsc/stco located $sample of $count samples")
    out.result()
  }

  private val startCode = Array[Byte](0, 0, 0, 1)

  /**
   * Demux the first video track into an Annex-B byte stream: avcC's
   * SPS/PPS first, then every sample's length-prefixed NALs with
   * start codes — directly decodable by [[H264.decodeFrames]].
   */
  def demuxToAnnexB(bytes: Array[Byte]): Array[Byte] = {
    val top = boxes(bytes, 0, bytes.length)
    require(top.exists(_._1 == "ftyp"), "not an ISO-BMFF file")
    require(!top.exists(_._1 == "moof"),
      "fragmented MP4 (moof) unsupported")
    val (moovS, moovE) = child(bytes, top, "moov")
      .getOrElse(throw new IllegalArgumentException("no moov box"))
    val moovKids = boxes(bytes, moovS, moovE)
    // first trak whose mdia/hdlr is 'vide'
    val stblOpt = moovKids.filter(_._1 == "trak").flatMap {
      case (_, ts, te) =>
        val mdia = child(bytes, boxes(bytes, ts, te), "mdia")
        mdia.flatMap { case (ms, me) =>
          val mdiaKids = boxes(bytes, ms, me)
          val isVideo = child(bytes, mdiaKids, "hdlr").exists {
            case (hs, _) => boxType(bytes, hs.toInt + 4) == "vide"
          }
          if (!isVideo) None
          else child(bytes, mdiaKids, "minf").flatMap {
            case (ns, ne) => child(bytes, boxes(bytes, ns, ne), "stbl")
          }
        }
    }.headOption
    val (stblS, stblE) = stblOpt.getOrElse(
      throw new IllegalArgumentException("no video track"))
    val stbl = boxes(bytes, stblS, stblE)
    val (sdS, sdE) = child(bytes, stbl, "stsd")
      .getOrElse(throw new IllegalArgumentException("no stsd"))
    val entries = boxes(bytes, sdS + 8, sdE) // ver/flags + count
    val avc = entries.find(e => e._1 == "avc1" || e._1 == "avc3")
      .getOrElse(throw new IllegalArgumentException(
        s"no AVC sample entry (found ${entries.map(_._1).mkString(",")})"))
    // VisualSampleEntry: 78 fixed bytes before the child boxes
    val avcKids = boxes(bytes, avc._2 + 78, avc._3)
    val (ccS, ccE) = child(bytes, avcKids, "avcC")
      .getOrElse(throw new IllegalArgumentException("no avcC"))
    val cfg = parseAvcC(bytes, ccS, ccE)
    val out = new java.io.ByteArrayOutputStream()
    (cfg.sps ++ cfg.pps).foreach { n =>
      out.write(startCode); out.write(n, 0, n.length)
    }
    sampleLocations(bytes, stbl).foreach { case (off, size) =>
      var o = off
      val end = off + size
      while (o + cfg.lengthSize <= end) {
        var n = 0L
        var i = 0
        while (i < cfg.lengthSize) {
          n = (n << 8) | (bytes((o + i).toInt) & 0xFFL); i += 1
        }
        o += cfg.lengthSize
        require(o + n <= end, s"NAL length $n overruns its sample")
        out.write(startCode)
        out.write(bytes, o.toInt, n.toInt)
        o += n
      }
    }
    out.toByteArray
  }

  // ---- mux (fixture writer) ----------------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def be16(v: Int): Array[Byte] =
    Array((v >>> 8).toByte, v.toByte)

  private def box(t: String, payload: Array[Byte]*): Array[Byte] = {
    val n = 8L + payload.map(_.length.toLong).sum
    require(n <= Int.MaxValue, "use largesize for >2 GiB boxes")
    val out = new java.io.ByteArrayOutputStream(n.toInt)
    out.write(be32(n), 0, 4)
    out.write(t.getBytes("ISO-8859-1"), 0, 4)
    payload.foreach(p => out.write(p, 0, p.length))
    out.toByteArray
  }

  private def fullBox(t: String, payload: Array[Byte]): Array[Byte] =
    box(t, Array[Byte](0, 0, 0, 0), payload)

  /**
   * Mux an Annex-B H.264 stream (SPS + PPS + I/IDR slice NALs — both
   * [[H264.encode]] and [[H264.encodeCavlc]] output) into a minimal
   * spec-valid MP4: `ftyp` + `mdat` + `moov` with one video track,
   * avcC carrying the parameter sets, 4-byte length-prefixed samples,
   * one sample per picture (a new picture starts at each slice whose
   * first_mb_in_slice is 0), 25 fps timing. Deterministic bytes.
   */
  def fromAnnexB(annexB: Array[Byte], width: Int,
                 height: Int): Array[Byte] = {
    val nals = H264.nalUnits(annexB)
    val sps = nals.filter(n => (n(0) & 0x1F) == 7)
    val pps = nals.filter(n => (n(0) & 0x1F) == 8)
    require(sps.nonEmpty && pps.nonEmpty, "Annex-B lacks SPS/PPS")
    val slices = nals.filter(n => (n(0) & 0x1F) == 1 ||
      (n(0) & 0x1F) == 5)
    require(slices.nonEmpty, "Annex-B lacks slices")
    // group slices into pictures: first_mb_in_slice == 0 starts one
    val samples = Seq.newBuilder[Array[Byte]]
    var cur = new java.io.ByteArrayOutputStream()
    slices.foreach { s =>
      val firstMb = new H264.BitReader(H264.ebspToRbsp(s, 1)).ue()
      if (firstMb == 0 && cur.size > 0) {
        samples += cur.toByteArray
        cur = new java.io.ByteArrayOutputStream()
      }
      cur.write(be32(s.length), 0, 4)
      cur.write(s, 0, s.length)
    }
    if (cur.size > 0) samples += cur.toByteArray
    val smp = samples.result()

    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"),
      be32(0x200), "isomavc1".getBytes("ISO-8859-1"))
    val mdatPayload = smp.flatten.toArray
    val mdat = box("mdat", mdatPayload)
    val mdatOffset = ftyp.length + 8L // first sample's file offset

    val timescale = 1000L
    val frameTicks = 40L // 25 fps
    val duration = smp.size * frameTicks

    val avcC = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(1) // configurationVersion
      out.write(sps.head(1)); out.write(sps.head(2)); out.write(sps.head(3))
      out.write(0xFF) // '111111' + lengthSizeMinusOne 3 → 4-byte
      out.write(0xE0 | sps.size)
      sps.foreach { s => out.write(be16(s.length), 0, 2)
        out.write(s, 0, s.length) }
      out.write(pps.size)
      pps.foreach { p => out.write(be16(p.length), 0, 2)
        out.write(p, 0, p.length) }
      box("avcC", out.toByteArray)
    }
    val avc1 = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(new Array[Byte](6), 0, 6) // reserved
      out.write(be16(1), 0, 2) // data_reference_index
      out.write(new Array[Byte](16), 0, 16) // pre_defined/reserved
      out.write(be16(width), 0, 2)
      out.write(be16(height), 0, 2)
      out.write(be32(0x00480000L), 0, 4) // 72 dpi horiz
      out.write(be32(0x00480000L), 0, 4) // 72 dpi vert
      out.write(be32(0), 0, 4) // reserved
      out.write(be16(1), 0, 2) // frame_count
      out.write(new Array[Byte](32), 0, 32) // compressorname
      out.write(be16(0x0018), 0, 2) // depth 24
      out.write(be16(0xFFFF), 0, 2) // pre_defined -1
      box("avc1", out.toByteArray, avcC)
    }
    val stsd = fullBox("stsd", be32(1) ++ avc1)
    val stts = fullBox("stts",
      be32(1) ++ be32(smp.size) ++ be32(frameTicks))
    val stsc = fullBox("stsc", be32(1) ++ be32(1) ++
      be32(smp.size) ++ be32(1))
    val stsz = fullBox("stsz", be32(0) ++ be32(smp.size) ++
      smp.flatMap(s => be32(s.length)).toArray)
    val stco = fullBox("stco", be32(1) ++ be32(mdatOffset))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val dref = fullBox("dref", be32(1) ++
      box("url ", Array[Byte](0, 0, 0, 1))) // flag 1: self-contained
    val vmhd = box("vmhd", // version 0, flags 1 (14496-12 12.1.2)
      Array[Byte](0, 0, 0, 1), new Array[Byte](8))
    val minf = box("minf", vmhd, box("dinf", dref), stbl)
    val hdlr = fullBox("hdlr", be32(0) ++
      "vide".getBytes("ISO-8859-1") ++ new Array[Byte](12) ++
      "graft\u0000".getBytes("ISO-8859-1"))
    val mdhd = fullBox("mdhd", be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ be16(0x55C4) ++ be16(0))
    val mdia = box("mdia", mdhd, hdlr, minf)
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7), // flags: enabled
      be32(0), be32(0), be32(1), be32(0), be32(duration),
      new Array[Byte](8), be16(0), be16(0), be16(0), be16(0),
      // identity matrix
      be32(0x10000), be32(0), be32(0), be32(0), be32(0x10000),
      be32(0), be32(0), be32(0), be32(0x40000000),
      be32(width.toLong << 16), be32(height.toLong << 16))
    val mvhd = fullBox("mvhd", be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(duration) ++ be32(0x10000) ++
      be16(0x0100) ++ be16(0) ++ new Array[Byte](8) ++
      be32(0x10000) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x10000) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x40000000) ++ new Array[Byte](24) ++ be32(2))
    val moov = box("moov", mvhd, box("trak", tkhd, mdia))

    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    out.write(mdat, 0, mdat.length)
    out.write(moov, 0, moov.length)
    out.toByteArray
  }
}
