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
 * streams the H.264 path decodes. FRAGMENTED movies (fMP4 — the
 * DASH/streaming-era shape, 14496-12 §8.8) are demuxed too: top-level
 * `moof` boxes' `tfhd`/`trun` sample tables locate each fragment's
 * samples (base-data-offset, default-base-is-moof, and implicit
 * moof-start bases; per-sample or tfhd-default sizes), feeding the
 * SAME NAL reframe path as the `stbl` route. Unsupported shapes (no
 * video track, non-AVC codecs, size-less truns) throw named errors —
 * the degrade-don't-fail `Try` upstream turns them into skips.
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

  /** Walk the child boxes of [from, to): (type, boxStart,
    * payloadStart, payloadEnd) in file order. boxStart is the first
    * byte of the size field — the correct moof anchor for
    * default-base-is-moof regardless of 32-bit vs largesize header. */
  private def boxesFull(b: Array[Byte], from: Long,
                        to: Long): Seq[(String, Long, Long, Long)] = {
    val out = Seq.newBuilder[(String, Long, Long, Long)]
    var o = from
    while (o + 8 <= to) {
      val size0 = u32(b, o.toInt)
      val t = boxType(b, o.toInt)
      val (payload, end) =
        if (size0 == 1) (o + 16, o + u64(b, o.toInt + 8)) // largesize
        else if (size0 == 0) (o + 8, to) // extends to end
        else (o + 8, o + size0)
      require(end <= to && end > o, s"box $t overruns its parent")
      out += ((t, o, payload, end))
      o = end
    }
    out.result()
  }

  /** Walk the child boxes of [from, to): (type, payloadStart,
    * payloadEnd) triples in file order. */
  private def boxes(b: Array[Byte], from: Long,
                    to: Long): Seq[(String, Long, Long)] =
    boxesFull(b, from, to).map { case (t, _, p, e) => (t, p, e) }

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
    val (moovS, moovE) = child(bytes, top, "moov")
      .getOrElse(throw new IllegalArgumentException("no moov box"))
    val moovKids = boxes(bytes, moovS, moovE)
    // first trak whose mdia/hdlr is 'vide': its stbl + its track_ID
    // (the ID keys this track's traf boxes in fragmented movies)
    val stblOpt = moovKids.filter(_._1 == "trak").flatMap {
      case (_, ts, te) =>
        val trakKids = boxes(bytes, ts, te)
        val trackId = child(bytes, trakKids, "tkhd").map {
          case (hs, _) =>
            // fullbox: version 0 → creation/modification are 4 B each,
            // version 1 → 8 B each; track_ID follows them
            val ver = bytes(hs.toInt) & 0xFF
            u32(bytes, hs.toInt + 4 + (if (ver == 1) 16 else 8))
        }.getOrElse(-1L)
        val mdia = child(bytes, trakKids, "mdia")
        mdia.flatMap { case (ms, me) =>
          val mdiaKids = boxes(bytes, ms, me)
          val isVideo = child(bytes, mdiaKids, "hdlr").exists {
            case (hs, _) => boxType(bytes, hs.toInt + 4) == "vide"
          }
          if (!isVideo) None
          else child(bytes, mdiaKids, "minf").flatMap {
            case (ns, ne) => child(bytes, boxes(bytes, ns, ne), "stbl")
              .map(st => (st, trackId))
          }
        }
    }.headOption
    val ((stblS, stblE), videoTrackId) = stblOpt.getOrElse(
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
    // fragmented movies carry samples in moof/traf/trun tables, not
    // stbl (whose stsz is typically present-but-empty); both routes
    // feed the same length-prefixed NAL reframe below
    val locations =
      if (top.exists(_._1 == "moof"))
        fragmentSampleLocations(bytes, videoTrackId)
      else sampleLocations(bytes, stbl)
    locations.foreach { case (off, size) =>
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

  /** Per-sample (offset, size) pairs from a fragmented movie's moof
    * boxes (14496-12 §8.8), in file order: for each `traf` whose
    * `tfhd` names the video track, resolve the base data offset
    * (explicit base-data-offset flag 0x1; default-base-is-moof flag
    * 0x20000; or the implicit default — the first byte of the
    * enclosing moof), then walk its `trun`s (data-offset flag 0x1,
    * first-sample-flags 0x4, per-sample duration/size/flags/cts
    * 0x100/0x200/0x400/0x800). Sample sizes come per-sample from the
    * trun or from tfhd's default-sample-size (flag 0x10); a movie
    * relying on mvex/trex defaults for SIZE throws a named error
    * (trex defaults are for duration/flags in practice — size-less
    * truns don't occur in AVC video). */
  private def fragmentSampleLocations(b: Array[Byte],
                                      trackId: Long): Seq[(Long, Int)] = {
    val out = Seq.newBuilder[(Long, Int)]
    boxesFull(b, 0, b.length).filter(_._1 == "moof").foreach {
      case (_, moofStart, moofS, moofE) =>
        // Implicit base chaining (§8.8.7): the first traf without an
        // explicit base or default-base-is-moof anchors at the moof
        // start; each SUBSEQUENT such traf anchors at the end of the
        // previous traf's sample data. To know that end we walk the
        // truns of EVERY traf (any track), emitting locations only
        // for the requested track; a traf whose sizes we cannot
        // resolve leaves the chain end unknown (-1) and a later
        // implicit-base traf then fails with a named error.
        var prevTrafEnd = -1L
        var firstTraf = true
        boxes(b, moofS, moofE).filter(_._1 == "traf").foreach {
          case (_, trafS, trafE) =>
            val trafKids = boxes(b, trafS, trafE)
            val (thS, _) = child(b, trafKids, "tfhd").getOrElse(
              throw new IllegalArgumentException("traf without tfhd"))
            val thFlags = u32(b, thS.toInt) & 0xFFFFFF
            var o = thS.toInt + 4
            val tfTrackId = u32(b, o); o += 4
            val emit = tfTrackId == trackId
            val base: Long =
              if ((thFlags & 0x1) != 0) { val v = u64(b, o); o += 8; v }
              else if ((thFlags & 0x20000) != 0) moofStart // base-is-moof
              else if (firstTraf) moofStart // implicit default, 1st traf
              else if (prevTrafEnd >= 0) prevTrafEnd
              else throw new IllegalArgumentException(
                "implicit traf base after a traf whose data end is " +
                  "unknown — unsupported multi-traf layout")
            if ((thFlags & 0x2) != 0) o += 4 // sample_description_index
            if ((thFlags & 0x8) != 0) o += 4 // default_sample_duration
            val defaultSize: Long =
              if ((thFlags & 0x10) != 0) { val v = u32(b, o); o += 4; v }
              else -1L
            // default_sample_flags (0x20) not needed for location
            var nextImplicitOff = -1L // end of previous trun's samples
            var sizesUnknown = false
            trafKids.filter(_._1 == "trun").foreach { case (_, trS, _) =>
              val trFlags = u32(b, trS.toInt) & 0xFFFFFF
              val hasSize = (trFlags & 0x200) != 0 || defaultSize >= 0
              if (!hasSize && emit)
                throw new IllegalArgumentException(
                  "trun without sample sizes and tfhd without default" +
                    " — mvex/trex size defaults unsupported")
              if (!hasSize) sizesUnknown = true
              if (!sizesUnknown) {
                var p = trS.toInt + 4
                val count = u32(b, p).toInt; p += 4
                var off: Long =
                  if ((trFlags & 0x1) != 0) {
                    val v = u32(b, p).toInt; p += 4 // signed int32
                    base + v
                  } else if (nextImplicitOff >= 0) nextImplicitOff
                  else base
                if ((trFlags & 0x4) != 0) p += 4 // first_sample_flags
                var i = 0
                while (i < count) {
                  if ((trFlags & 0x100) != 0) p += 4 // sample_duration
                  val size: Long =
                    if ((trFlags & 0x200) != 0) {
                      val v = u32(b, p); p += 4; v
                    } else defaultSize
                  if ((trFlags & 0x400) != 0) p += 4 // sample_flags
                  if ((trFlags & 0x800) != 0) p += 4 // composition offset
                  if (emit) out += ((off, size.toInt))
                  off += size
                  i += 1
                }
                nextImplicitOff = off
              }
            }
            prevTrafEnd =
              if (sizesUnknown) -1L
              else if (nextImplicitOff >= 0) nextImplicitOff
              else base // traf with no truns: no data consumed
            firstTraf = false
        }
    }
    val locs = out.result()
    require(locs.nonEmpty, "fragmented movie has no video samples")
    locs
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
  /** Annex-B → (SPS NALs, PPS NALs, per-picture samples of 4-byte
    * length-prefixed slice NALs — a new picture starts at each slice
    * with first_mb_in_slice == 0): the shared front of both muxers. */
  private def groupSamples(annexB: Array[Byte])
      : (Seq[Array[Byte]], Seq[Array[Byte]], Seq[Array[Byte]]) = {
    val nals = H264.nalUnits(annexB)
    val sps = nals.filter(n => (n(0) & 0x1F) == 7)
    val pps = nals.filter(n => (n(0) & 0x1F) == 8)
    require(sps.nonEmpty && pps.nonEmpty, "Annex-B lacks SPS/PPS")
    val slices = nals.filter(n => (n(0) & 0x1F) == 1 ||
      (n(0) & 0x1F) == 5)
    require(slices.nonEmpty, "Annex-B lacks slices")
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
    (sps, pps, samples.result())
  }

  def fromAnnexB(annexB: Array[Byte], width: Int,
                 height: Int): Array[Byte] = {
    val (sps, pps, smp) = groupSamples(annexB)

    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"),
      be32(0x200), "isomavc1".getBytes("ISO-8859-1"))
    val mdatPayload = smp.flatten.toArray
    val mdat = box("mdat", mdatPayload)
    val mdatOffset = ftyp.length + 8L // first sample's file offset

    val timescale = 1000L
    val frameTicks = 40L // 25 fps
    val duration = smp.size * frameTicks

    val stsd = fullBox("stsd", be32(1) ++
      avc1Box(sps, pps, width, height))
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

  /** VisualSampleEntry ('avc1') with its avcC child — shared by the
    * progressive and fragmented muxers. */
  private def avc1Box(sps: Seq[Array[Byte]], pps: Seq[Array[Byte]],
                      width: Int, height: Int): Array[Byte] = {
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

  /**
   * Mux an Annex-B H.264 stream into a FRAGMENTED MP4 (fMP4, the
   * DASH/streaming shape): `ftyp` + `moov` whose stbl sample tables
   * are EMPTY (stsz count 0 — samples live in fragments) and whose
   * `mvex`/`trex` declares fragmenting, then one `moof`+`mdat` pair
   * per group of `samplesPerFragment` pictures. Each traf uses
   * tfhd flag 0x20000 (default-base-is-moof) and one trun with
   * data-offset + per-sample sizes — the common real-world encoding
   * of the §8.8 tables. Deterministic bytes; the demux side of this
   * module reads its own output AND the tfhd-default-size /
   * implicit-base variants it never emits (Mp4Spec covers those by
   * hand-built fixtures).
   */
  def fromAnnexBFragmented(annexB: Array[Byte], width: Int,
                           height: Int,
                           samplesPerFragment: Int = 3): Array[Byte] = {
    require(samplesPerFragment >= 1)
    val (sps, pps, smp) = groupSamples(annexB)

    val timescale = 1000L
    val frameTicks = 40L // 25 fps

    val ftyp = box("ftyp", "iso5".getBytes("ISO-8859-1"),
      be32(0x200), "iso5isomavc1".getBytes("ISO-8859-1"))
    val stsd = fullBox("stsd", be32(1) ++
      avc1Box(sps, pps, width, height))
    // empty sample tables: fragments own the samples
    val stts = fullBox("stts", be32(0))
    val stsc = fullBox("stsc", be32(0))
    val stsz = fullBox("stsz", be32(0) ++ be32(0))
    val stco = fullBox("stco", be32(0))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val dref = fullBox("dref", be32(1) ++
      box("url ", Array[Byte](0, 0, 0, 1)))
    val vmhd = box("vmhd", Array[Byte](0, 0, 0, 1), new Array[Byte](8))
    val minf = box("minf", vmhd, box("dinf", dref), stbl)
    val hdlr = fullBox("hdlr", be32(0) ++
      "vide".getBytes("ISO-8859-1") ++ new Array[Byte](12) ++
      "graft ".getBytes("ISO-8859-1"))
    // duration 0 in mdhd/tkhd/mvhd: unknown until fragments are read
    val mdhd = fullBox("mdhd", be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(0) ++ be16(0x55C4) ++ be16(0))
    val mdia = box("mdia", mdhd, hdlr, minf)
    val tkhd = box("tkhd", Array[Byte](0, 0, 0, 7),
      be32(0), be32(0), be32(1), be32(0), be32(0),
      new Array[Byte](8), be16(0), be16(0), be16(0), be16(0),
      be32(0x10000), be32(0), be32(0), be32(0), be32(0x10000),
      be32(0), be32(0), be32(0), be32(0x40000000),
      be32(width.toLong << 16), be32(height.toLong << 16))
    val trex = fullBox("trex", be32(1) ++ // track_ID
      be32(1) ++ // default_sample_description_index
      be32(frameTicks) ++ // default_sample_duration
      be32(0) ++ // default_sample_size (sizes ride in truns)
      be32(0))   // default_sample_flags
    val mvex = box("mvex", trex)
    val mvhd = fullBox("mvhd", be32(0) ++ be32(0) ++
      be32(timescale) ++ be32(0) ++ be32(0x10000) ++
      be16(0x0100) ++ be16(0) ++ new Array[Byte](8) ++
      be32(0x10000) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x10000) ++ be32(0) ++ be32(0) ++ be32(0) ++
      be32(0x40000000) ++ new Array[Byte](24) ++ be32(2))
    val moov = box("moov", mvhd, box("trak", tkhd, mdia), mvex)

    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    out.write(moov, 0, moov.length)
    var seq = 1
    var decodeTime = 0L
    smp.grouped(samplesPerFragment).foreach { group =>
      val mfhd = fullBox("mfhd", be32(seq))
      val tfhd = box("tfhd", Array[Byte](0, 2, 0, 0), // flags 0x20000
        be32(1)) // track_ID
      val tfdt = fullBox("tfdt", be32(decodeTime))
      // trun flags: 0x1 data-offset + 0x200 sample-size
      val trunPayload = be32(group.size) ++
        be32(0) ++ // data_offset placeholder, patched below
        group.flatMap(s => be32(s.length)).toArray
      val trun = box("trun", Array[Byte](0, 0, 2, 1), trunPayload)
      val traf = box("traf", tfhd, tfdt, trun)
      val moof = box("moof", mfhd, traf)
      // data_offset (from moof start) = moof size + mdat header;
      // its slot sits after trun's size+type+verflags+sample_count
      val dataOff = moof.length + 8
      val slotInTraf = 8 + tfhd.length + tfdt.length + 8 + 4 + 4
      val slot = 8 + mfhd.length + slotInTraf
      val patched = be32(dataOff)
      System.arraycopy(patched, 0, moof, slot, 4)
      val mdat = box("mdat", group.flatten.toArray)
      out.write(moof, 0, moof.length)
      out.write(mdat, 0, mdat.length)
      seq += 1
      decodeTime += group.size * frameTicks
    }
    out.toByteArray
  }
}
