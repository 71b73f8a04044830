package graft.multimodal

/**
 * Partial pure-JVM H.264 decoder (ITU-T Rec. H.264 / ISO 14496-10 —
 * public specification), built to make the [[FrameDecoder]] SPI's
 * video path carry REAL H.264 bitstream plumbing with zero external
 * dependencies:
 *
 *  - Annex-B byte-stream parsing: 3-/4-byte start codes, NAL unit
 *    extraction, emulation-prevention-byte removal (EBSP → RBSP,
 *    spec §7.4.1.1);
 *  - Exp-Golomb entropy coding: ue(v) / se(v) / u(n) (§9.1);
 *  - Sequence/picture parameter sets: dimensions, cropping window,
 *    chroma format, frame-num field width (§7.3.2.1, §7.3.2.2);
 *  - Slice headers for I/IDR slices (§7.3.3) and the macroblock
 *    layer for **I_PCM macroblocks** (§7.3.5, §7.4.5: `mb_type` 25 in
 *    I slices — byte-aligned raw 4:2:0 samples), assembling frames
 *    across one or many slices per picture.
 *
 * The macroblock layer lives in the sibling modules: [[H264Mb]] +
 * [[Cavlc]] (intra prediction, §8.5 transforms — 4x4 AND the High-
 * profile 8x8 (§8.3.2/§8.5.13) with quantization scaling matrices
 * (§7.3.2.1.1.1 + Table 7-2 fallbacks) — CAVLC residuals),
 * [[H264Cabac]] (§9.3 CABAC entropy coding, both directions),
 * [[H264Inter]] (P AND B motion compensation: §8.4.2.2 quarter-pel
 * interpolation, §8.4.1 MV prediction, P_Skip/B_Skip, spatial AND
 * temporal direct, default / explicit / implicit (bi)prediction,
 * Tables 7-13/7-14/7-17/7-18 partitions, POC-ordered reference
 * lists over a sliding-window DPB), and
 * [[H264Deblock]] (§8.7 in-loop filter, the full §8.7.2.1 boundary
 * strengths over both lists, 8x8-aware edge grid) — so I/IDR
 * pictures decode display-exact under EITHER entropy coder, and
 * P/B pictures decode with real motion compensation under CAVLC
 * (display-order output via §8.2.1 POC), filtered or not, flat or
 * weighted quant.
 *
 * SCOPE — stated plainly: CABAC inter slices (the inter
 * syntax-element context init tables are not transcribed —
 * constants are never invented) and long-term machinery (MMCO
 * marking, long-term list-modification ops) are named boundaries
 * (SHORT-TERM ref-pic-list modification decodes, §8.2.4.3.1): an
 * affected picture
 * is SKIPPED whole (a reference gap then disables inter decode
 * until the next IDR re-anchors the DPB), so such streams degrade
 * to I-frame-only decoding; a stream where NOTHING decodes is a
 * named error. Interlaced coding and CABAC×transform_8x8 (ctx-399+
 * init tables) remain named errors, bindable through the SPI
 * (`graft.video.frameDecoder`). The degrade-don't-fail `Try` in
 * `videoHashes` turns named errors into skips. Reference behaviors
 * modeled on the published spec only.
 */
object H264 {

  // ---- bit I/O -----------------------------------------------------------

  /** MSB-first bit reader over an RBSP (emulation bytes already
    * stripped). Throws past-the-end — callers treat any throw as a
    * corrupt NAL. */
  final class BitReader(rbsp: Array[Byte]) {
    private var pos = 0 // bit position

    def u(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byte = rbsp(pos >>> 3) & 0xFF
        v = (v << 1) | ((byte >>> (7 - (pos & 7))) & 1)
        pos += 1
        i += 1
      }
      v
    }

    /** ue(v): count leading zeros, read that many more bits. */
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        require(zeros <= 31, "ue(v) exceeds 31 leading zeros")
      }
      if (zeros == 0) 0 else ((1 << zeros) - 1) + u(zeros)
    }

    /** se(v): signed mapping of ue(v) (§9.1.1). */
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }

    def byteAligned: Boolean = (pos & 7) == 0

    /** pcm_alignment_zero_bit* — must all be zero. */
    def alignToByte(): Unit =
      while (!byteAligned) require(u(1) == 0,
        "nonzero pcm_alignment_zero_bit")

    def readByte(): Int = { require(byteAligned); u(8) }

    def bitsLeft: Int = rbsp.length * 8 - pos

    /** Bit position of the rbsp_stop_one_bit (the last set bit). */
    private lazy val stopBit: Int = {
      var i = rbsp.length * 8 - 1
      while (i >= 0 &&
          ((rbsp(i >>> 3) >>> (7 - (i & 7))) & 1) == 0) i -= 1
      i
    }

    /** §7.2 more_rbsp_data(): syntax elements remain before the
      * trailing stop bit. */
    def moreRbspData: Boolean = pos < stopBit
  }

  /** MSB-first bit writer producing an RBSP. */
  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0

    def u(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1)
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }

    def ue(v: Int): Unit = {
      require(v >= 0)
      val bits = 32 - Integer.numberOfLeadingZeros(v + 1)
      u(0, bits - 1) // leading zeros
      u(v + 1, bits) // the value with its leading 1
    }

    def se(v: Int): Unit =
      ue(if (v <= 0) -2 * v else 2 * v - 1)

    def alignZero(): Unit = while (nbits != 0) u(0, 1)

    def byteAligned: Boolean = nbits == 0

    /** rbsp_trailing_bits: stop-one then zero-pad to the byte. */
    def trailingBits(): Unit = { u(1, 1); alignZero() }

    def toBytes: Array[Byte] = {
      require(nbits == 0, "unterminated RBSP (call trailingBits)")
      out.toByteArray
    }
  }

  // ---- NAL layer ---------------------------------------------------------

  /** Annex-B scan: NAL payloads (header byte included, start codes
    * excluded), in stream order. Tolerates leading garbage before the
    * first start code and 3- or 4-byte codes. */
  def nalUnits(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        starts += i + 3
        i += 3
      } else i += 1
    }
    starts.toSeq.zipWithIndex.map { case (s, idx) =>
      var e = if (idx + 1 < starts.length) starts(idx + 1) - 3
              else bytes.length
      // a 4-byte start code's leading zero belongs to the separator,
      // not to this NAL's payload; trailing zeros before the next
      // start code are trailing_zero_8bits either way
      while (e > s && bytes(e - 1) == 0) e -= 1
      java.util.Arrays.copyOfRange(bytes, s, e)
    }.filter(_.nonEmpty)
  }

  /** EBSP → RBSP: drop each emulation_prevention_three_byte (a 0x03
    * after two 0x00s, §7.4.1.1). `from` skips the NAL header byte. */
  def ebspToRbsp(nal: Array[Byte], from: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length - from)
    var zeros = 0
    var i = from
    while (i < nal.length) {
      val b = nal(i) & 0xFF
      if (zeros >= 2 && b == 3) {
        zeros = 0 // skip the EPB itself
      } else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** RBSP → EBSP: insert 0x03 before any third byte ≤ 0x03 following
    * two zeros (the writer-side of §7.4.1.1). */
  def rbspToEbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 16)
    var zeros = 0
    var i = 0
    while (i < rbsp.length) {
      val b = rbsp(i) & 0xFF
      if (zeros >= 2 && b <= 3) {
        out.write(3)
        zeros = 0
      }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
      i += 1
    }
    out.toByteArray
  }

  // ---- parameter sets ----------------------------------------------------

  final case class Sps(id: Int, profileIdc: Int, levelIdc: Int,
                       chromaFormatIdc: Int,
                       log2MaxFrameNum: Int, pocType: Int,
                       log2MaxPocLsb: Int,
                       deltaPicOrderAlwaysZero: Boolean,
                       widthMbs: Int, heightMapUnits: Int,
                       frameMbsOnly: Boolean,
                       cropL: Int, cropR: Int, cropT: Int, cropB: Int,
                       sm: Option[ScalingMatrices] = None,
                       maxNumRefFrames: Int = 0,
                       direct8x8Inference: Boolean = true) {
    require(frameMbsOnly, "interlaced (field) coding unsupported")
    require(chromaFormatIdc == 1, "only 4:2:0 chroma supported")
    val heightMbs: Int = heightMapUnits
    /** Cropped display dims — crop units are 2 px in 4:2:0 frames. */
    val width: Int = widthMbs * 16 - 2 * (cropL + cropR)
    val height: Int = heightMbs * 16 - 2 * (cropT + cropB)
    require(width > 0 && height > 0, "crop removes the whole frame")
  }

  private val highProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** scaling_list() (§7.3.2.1.1.1): delta-coded values in SCAN order
    * written into RASTER positions via `zig`; a first-step jump to 0
    * selects the default matrix. */
  private def scalingList(r: BitReader, size: Int,
                          zig: Array[Int]): (Array[Int], Boolean) = {
    val out = new Array[Int](size)
    var last = 8; var next = 8
    var useDefault = false
    var j = 0
    while (j < size) {
      if (next != 0) {
        next = (last + r.se() + 256) % 256
        if (j == 0 && next == 0) useDefault = true
      }
      val v = if (next == 0) last else next
      out(zig(j)) = v
      last = v
      j += 1
    }
    (out, useDefault)
  }

  /** Parse one scaling-matrix block (SPS or PPS form) and resolve it
    * to final matrices via the Table 7-2 fallback rules: rule A
    * (defaults) when `spsBase` is None, rule B (fall back to the SPS
    * matrices on lists 0/3/6/7) otherwise. `n8` = number of 8x8
    * lists coded (2 here — 4:2:0 only). */
  private def parseScalingMatrix(r: BitReader, n8: Int,
                                 spsBase: Option[ScalingMatrices])
      : ScalingMatrices = {
    import ScalingMatrices._
    val w4 = new Array[Array[Int]](6)
    val w8 = new Array[Array[Int]](2)
    def default(i: Int): Array[Int] = i match {
      case 0 | 1 | 2 => Default4x4Intra
      case 3 | 4 | 5 => Default4x4Inter
      case 6 => Default8x8Intra
      case _ => Default8x8Inter
    }
    def fallback(i: Int): Array[Int] = (i, spsBase) match {
      case (0, Some(b)) => b.w4(0)
      case (3, Some(b)) => b.w4(3)
      case (6, Some(b)) => b.w8(0)
      case (7, Some(b)) => b.w8(1)
      case (0, None) | (3, None) | (6, None) | (7, None) => default(i)
      case (i4, _) if i4 < 6 => w4(i4 - 1)
      case _ => w8(0) // list 7 after list 6 cannot occur (6/7 are anchors)
    }
    var i = 0
    while (i < 6 + n8) {
      val present = r.u(1) == 1
      val resolved =
        if (!present) fallback(i)
        else {
          val (vals, useDef) =
            if (i < 6) scalingList(r, 16, Transform.zigzag4x4)
            else scalingList(r, 64, Transform.zigzag8x8)
          if (useDef) default(i) else vals
        }
      if (i < 6) w4(i) = resolved else w8(i - 6) = resolved
      i += 1
    }
    if (n8 == 0) {
      // 8x8 lists not coded (no transform_8x8): carry the base's
      w8(0) = spsBase.map(_.w8(0)).getOrElse(Flat.w8(0))
      w8(1) = spsBase.map(_.w8(1)).getOrElse(Flat.w8(1))
    }
    new ScalingMatrices(w4, w8)
  }

  def parseSps(rbsp: Array[Byte]): Sps = {
    val r = new BitReader(rbsp)
    val profile = r.u(8)
    r.u(8) // constraint flags + reserved
    val level = r.u(8)
    val id = r.ue()
    var chroma = 1
    var sm: Option[ScalingMatrices] = None
    if (highProfiles.contains(profile)) {
      chroma = r.ue()
      if (chroma == 3) r.u(1) // separate_colour_plane_flag
      r.ue(); r.ue() // bit_depth_luma/chroma_minus8
      require(r.bitsLeft >= 0)
      r.u(1) // qpprime_y_zero_transform_bypass_flag
      if (r.u(1) == 1) // seq_scaling_matrix_present_flag
        sm = Some(parseScalingMatrix(r, n8 = 2, spsBase = None))
    }
    val log2FrameNum = r.ue() + 4
    val pocType = r.ue()
    var log2Poc = 0
    // pocType 0/2 slices carry no delta_pic_order_cnt — treat as the
    // always-zero case so the slice-header parser has one rule
    var deltaAlwaysZero = true
    pocType match {
      case 0 => log2Poc = r.ue() + 4
      case 1 =>
        deltaAlwaysZero = r.u(1) == 1
        r.se(); r.se()
        val n = r.ue()
        (0 until n).foreach(_ => r.se())
      case 2 => ()
      case other =>
        throw new IllegalArgumentException(s"bad pic_order_cnt_type $other")
    }
    val maxRefFrames = r.ue() // max_num_ref_frames
    r.u(1) // gaps_in_frame_num_value_allowed_flag
    val wMbs = r.ue() + 1
    val hUnits = r.ue() + 1
    val frameOnly = r.u(1) == 1
    if (!frameOnly) r.u(1) // mb_adaptive_frame_field_flag
    val d8x8Inf = r.u(1) == 1 // direct_8x8_inference_flag
    val (cl, cr, ct, cb) =
      if (r.u(1) == 1) (r.ue(), r.ue(), r.ue(), r.ue()) else (0, 0, 0, 0)
    // vui ignored
    Sps(id, profile, level, chroma, log2FrameNum, pocType, log2Poc,
      deltaAlwaysZero, wMbs, hUnits, frameOnly, cl, cr, ct, cb, sm,
      maxRefFrames, d8x8Inf)
  }

  final case class Pps(id: Int, spsId: Int, cabac: Boolean,
                       bottomFieldPicOrder: Boolean,
                       deblockingControl: Boolean,
                       redundantPicCnt: Boolean,
                       picInitQp: Int, chromaQpOffset: Int,
                       transform8x8: Boolean = false,
                       sm: ScalingMatrices = ScalingMatrices.Flat,
                       chromaQpOffsetCr: Int = 0,
                       numRefIdxL0Default: Int = 1,
                       weightedPred: Boolean = false,
                       constrainedIntra: Boolean = false,
                       numRefIdxL1Default: Int = 1,
                       weightedBipred: Int = 0)

  /** Parse a PPS. `spsLookup` resolves the referenced SPS so PPS
    * scaling lists can apply fallback rule B against the SPS
    * matrices (Table 7-2); absent, rule A (defaults) applies — the
    * correct behavior when the SPS carries no matrix. */
  def parsePps(rbsp: Array[Byte],
               spsLookup: Int => Option[Sps] = _ => None): Pps = {
    val r = new BitReader(rbsp)
    val id = r.ue()
    val spsId = r.ue()
    val cabac = r.u(1) == 1
    val bfpo = r.u(1) == 1
    val groups = r.ue() + 1
    require(groups == 1, "slice groups (FMO) unsupported")
    val numRefIdxL0Default = r.ue() + 1 // num_ref_idx_l0_default_active
    val numRefIdxL1Default = r.ue() + 1 // num_ref_idx_l1_default_active
    val weightedPred = r.u(1) == 1 // weighted_pred_flag
    val weightedBipred = r.u(2) // weighted_bipred_idc (B slices)
    val picInitQp = 26 + r.se() // pic_init_qp_minus26
    r.se() // pic_init_qs_minus26
    val chromaQpOffset = r.se() // chroma_qp_index_offset
    val deblock = r.u(1) == 1
    val constrainedIntra = r.u(1) == 1 // constrained_intra_pred_flag
    val redundant = r.u(1) == 1
    // optional tail (§7.3.2.2): present in High-profile streams
    var transform8x8 = false
    var ppsSm: Option[ScalingMatrices] = None
    // absent tail → Cr shares the Cb offset (§7.4.2.2 inference rule)
    var chromaQpOffsetCr = chromaQpOffset
    if (r.moreRbspData) {
      transform8x8 = r.u(1) == 1
      if (r.u(1) == 1) // pic_scaling_matrix_present_flag
        ppsSm = Some(parseScalingMatrix(r,
          n8 = if (transform8x8) 2 else 0,
          spsBase = spsLookup(spsId).flatMap(_.sm)))
      chromaQpOffsetCr = r.se() // second_chroma_qp_index_offset (Cr)
    }
    // picture-effective matrices: PPS lists beat SPS lists beat flat
    val sm = ppsSm
      .orElse(spsLookup(spsId).flatMap(_.sm))
      .getOrElse(ScalingMatrices.Flat)
    Pps(id, spsId, cabac, bfpo, deblock, redundant, picInitQp,
      chromaQpOffset, transform8x8, sm, chromaQpOffsetCr,
      numRefIdxL0Default, weightedPred, constrainedIntra,
      numRefIdxL1Default, weightedBipred)
  }

  // ---- frame decode ------------------------------------------------------

  /** One decoded 4:2:0 picture (full-range planes, pre-crop). */
  private final class Yuv(val wMbs: Int, val hMbs: Int) {
    val y = new Array[Byte](wMbs * 16 * hMbs * 16)
    val cb = new Array[Byte](wMbs * 8 * hMbs * 8)
    val cr = new Array[Byte](wMbs * 8 * hMbs * 8)
    var mbsDone = 0
    val total: Int = wMbs * hMbs
    /** nC / intra-mode / slice-ownership context (§9.2.1, §8.3.1.1). */
    val ctx = new H264Mb.PicCtx(wMbs, hMbs)
    var slices = 0
    // per-MB deblocking state (§8.7): the MB's decoded QP (I_PCM: 0)
    // and its slice's filter idc/offsets
    val mbQp = new Array[Int](total)
    val deblockIdc: Array[Int] = Array.fill(total)(1)
    val offsetA = new Array[Int](total)
    val offsetB = new Array[Int](total)
    var chromaQpOffset = 0
    var chromaQpOffsetCr = 0
    /** per-4x4 motion state (§8.4.1.3 neighbors + §8.7.2.1 bS). */
    val mo = new H264Inter.MotionCtx(wMbs * 4, hMbs * 4)
    /** §8.2.1 picture order count + IDR epoch: the display-order
      * sort key (B pictures decode after the future reference they
      * use, so decode order ≠ display order). */
    var poc = 0
    var epoch = 0
  }

  /** Decode an Annex-B stream: intra pictures (I_PCM, Intra_4x4,
    * Intra_8x8, Intra_16x16) under CAVLC ([[H264Mb]]/[[Cavlc]]) OR
    * CABAC ([[H264Cabac]], §9.3), and P AND B pictures with REAL
    * motion compensation under CAVLC ([[H264Inter]] — quarter-pel
    * interpolation, MV prediction, P_Skip/B_Skip, spatial direct,
    * default biprediction, explicit weighted prediction, all
    * Table 7-13/7-14/7-17/7-18 partitions, intra MBs inside inter
    * slices, POC-ordered multi-reference lists over a
    * sliding-window DPB); returns frames as (width, height, packed
    * 0xRRGGBB) in DISPLAY order (§8.2.1 POC — B streams decode out
    * of display order). Streams that enable the deblocking filter
    * are filtered per §8.7 with the full §8.7.2.1 boundary
    * strengths ([[H264Deblock]]) — display-exact pixels.
    *
    * Pictures that hit a named inter boundary (SP/SI slices, CABAC
    * inter, long-term reference ops)
    * are SKIPPED whole; if such a picture was a REFERENCE, inter
    * decode stays off until the next IDR (the DPB would be wrong),
    * so those streams degrade to I-frame-only decoding. A stream
    * where NO picture decodes throws a named error, as do genuinely
    * unsupported constructs — callers wrap in `Try` per the
    * degrade-don't-fail contract. */
  def decodeFrames(bytes: Array[Byte]): Seq[(Int, Int, Array[Int])] = {
    val sps = scala.collection.mutable.Map.empty[Int, Sps]
    val pps = scala.collection.mutable.Map.empty[Int, Pps]
    // (epoch, poc, frame): B pictures decode out of display order;
    // the final emission sorts by IDR epoch then POC (§8.2.1)
    val pending = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, (Int, Int, Array[Int]))]
    var cur: Yuv = null
    var curSps: Sps = null
    var framesOut = 0
    var skippedInter = 0
    // decoded picture buffer: short-term reference pictures
    // (post-deblock planes), sliding-window marked (§8.2.5.3)
    val dpb = scala.collection.mutable.ArrayBuffer.empty[H264Inter.RefPic]
    var picCounter = 0
    var dpbBroken = false
    var curIsRef = false
    var curFrameNum = 0
    var curL0Head = -1 // picId of the current picture's RefPicList0[0]
    // §8.2.1 POC state: type 0 anchors on the previous REFERENCE
    // picture's msb/lsb; type 2 tracks FrameNumOffset per picture
    var pocMsbPrev = 0
    var pocLsbPrev = 0
    var fnOffPrev = 0
    var fnPrev = 0
    var epoch = 0

    nalUnits(bytes).foreach { nal =>
      val header = nal(0) & 0xFF
      require((header & 0x80) == 0, "forbidden_zero_bit set")
      val refIdc = (header >>> 5) & 3
      val nalType = header & 0x1F
      nalType match {
        case 7 =>
          val s = parseSps(ebspToRbsp(nal, 1))
          sps(s.id) = s
        case 8 =>
          val p = parsePps(ebspToRbsp(nal, 1), sps.get)
          require(sps.contains(p.spsId), s"PPS ${p.id} before its SPS")
          pps(p.id) = p
        case 1 | 5 =>
          val rbsp = ebspToRbsp(nal, 1)
          val r = new BitReader(rbsp)
          val firstMb = r.ue()
          val sliceType = r.ue()
          require(sliceType <= 9, s"bad slice_type $sliceType")
          val isI = sliceType == 2 || sliceType == 7
          val isP = sliceType == 0 || sliceType == 5
          val isB = sliceType == 1 || sliceType == 6
          // an undecodable inter picture is dropped whole; if it was
          // a REFERENCE, later P pictures would motion-compensate
          // from a frame we don't have, so P decode stays off until
          // the next IDR re-anchors the DPB
          def skipPicture(): Unit = {
            skippedInter += 1
            cur = null
            if (refIdc != 0) dpbBroken = true
          }
          if (!isI && !isP && !isB) {
            // SP/SI slice: no switching-slice support — named SPI
            // boundary; the intra pictures (the ones the fingerprint
            // needs most) still decode
            skipPicture()
          } else {
            val p = pps.getOrElse(r.ue(),
              throw new IllegalArgumentException("slice before its PPS"))
            val s = sps(p.spsId)
            val frameNum = r.u(s.log2MaxFrameNum)
            if (nalType == 5) r.ue() // idr_pic_id
            var pocLsb = 0
            if (s.pocType == 0) {
              pocLsb = r.u(s.log2MaxPocLsb)
              if (p.bottomFieldPicOrder) r.se()
            } else if (s.pocType == 1 && !s.deltaPicOrderAlwaysZero) {
              // §7.3.3: delta_pic_order_cnt[0], and [1] when the PPS
              // carries bottom-field order (frame_mbs_only streams have
              // no field_pic_flag to gate it off)
              r.se()
              if (p.bottomFieldPicOrder) r.se()
            }
            if (p.redundantPicCnt) r.ue()
            // P-slice list syntax (§7.3.3); the undecodable-P causes
            // are named here and degrade to the I-frame-only path
            var numRefActive = p.numRefIdxL0Default
            var numRefActive1 = p.numRefIdxL1Default
            var pWhyNot: String = null
            var pWeights: H264Inter.PredWeights = null
            var pWeightsL1: H264Inter.PredWeights = null
            var listMod0: Seq[(Int, Int)] = null
            var listMod1: Seq[(Int, Int)] = null
            var directSpatial = true
            if (isB) directSpatial = r.u(1) == 1
            if (isP || isB) {
              if (r.u(1) == 1) { // num_ref_idx_active_override_flag
                numRefActive = r.ue() + 1
                if (isB) numRefActive1 = r.ue() + 1
              }
              // ref_pic_list_modification (§7.3.3.1): short-term ops
              // decode (§8.2.4.3.1); long-term ops name the slice
              // undecodable (caught → picture skip, not a throw)
              try {
                if (r.u(1) == 1)
                  listMod0 = H264Inter.parseListModification(r)
                if (isB && r.u(1) == 1)
                  listMod1 = H264Inter.parseListModification(r)
              } catch {
                case e: IllegalArgumentException =>
                  pWhyNot = e.getMessage
              }
              if (pWhyNot != null) ()
              else if (p.cabac) pWhyNot =
                "CABAC inter slice (inter context init tables not transcribed)"
              else if (p.constrainedIntra) pWhyNot =
                "constrained_intra_pred unsupported"
              else if (isB && s.pocType == 1) pWhyNot =
                "B slices under pic_order_cnt_type 1 unsupported"
              else if (isB && !s.direct8x8Inference) pWhyNot =
                "direct_8x8_inference_flag=0 unsupported"
              else if (dpbBroken) pWhyNot =
                "reference picture gap (an undecodable inter picture was a reference)"
              else if (nalType != 5 && dpb.isEmpty) pWhyNot =
                "inter slice with an empty reference list"
              // pred_weight_table (§7.3.3.2) sits between the list
              // syntax and dec_ref_pic_marking; explicit weighting
              // applies per refIdx in the MC stage (§8.4.2.3.2). B
              // slices carry BOTH lists' entries under
              // weighted_bipred_idc 1.
              if (pWhyNot == null && isP && p.weightedPred)
                pWeights = H264Inter.parsePredWeightTable(r,
                  numRefActive)
              if (pWhyNot == null && isB && p.weightedBipred == 1) {
                val (w0, w1) = H264Inter.parsePredWeightTableB(r,
                  numRefActive, numRefActive1)
                pWeights = w0; pWeightsL1 = w1
              }
            }
            // dec_ref_pic_marking (§7.3.3.3) applies to ALL slice
            // types. Unsupported marking ops (long-term self-marking
            // on an IDR, MMCO) skip that PICTURE per the module
            // contract — never abort the stream — and poison the DPB
            // when the skipped picture was a reference. The read is
            // guarded on pWhyNot: a slice already named undecodable
            // may have left the bit reader desynced.
            if (pWhyNot == null && refIdc != 0) {
              if (nalType == 5) {
                r.u(1) // no_output_of_prior_pics_flag
                if (r.u(1) == 1) pWhyNot =
                  "long_term_reference_flag=1 (long-term marking unsupported)"
              } else if (r.u(1) == 1) pWhyNot =
                "adaptive_ref_pic_marking (MMCO) unsupported"
            }
            if (pWhyNot != null) skipPicture()
            else {
            val sliceQpDelta = r.se()
            var deblockIdc = 0 // absent control syntax → filter on
            var filterOffA = 0
            var filterOffB = 0
            if (p.deblockingControl) {
              deblockIdc = r.ue()
              require(deblockIdc <= 2, s"deblock idc $deblockIdc")
              if (deblockIdc != 1) {
                filterOffA = 2 * r.se()
                filterOffB = 2 * r.se()
              }
            }
            // macroblock layer
            if (firstMb == 0 || cur == null ||
                cur.wMbs != s.widthMbs || cur.hMbs != s.heightMbs) {
              cur = new Yuv(s.widthMbs, s.heightMbs)
              curSps = s
              // an IDR picture re-anchors reference decoding (§8.2.5.1)
              if (nalType == 5) {
                dpb.clear(); dpbBroken = false; epoch += 1
              }
              curIsRef = refIdc != 0
              curFrameNum = frameNum
              curL0Head = -1
              // §8.2.1 picture order count (types 0 and 2; type 1
              // pictures order by decode position — fine for the
              // streams we decode, since B under type 1 is named off)
              cur.epoch = epoch
              cur.poc = s.pocType match {
                case 0 =>
                  val maxLsb = 1 << s.log2MaxPocLsb
                  val (mPrev, lPrev) =
                    if (nalType == 5) (0, 0) else (pocMsbPrev, pocLsbPrev)
                  val msb =
                    if (pocLsb < lPrev && lPrev - pocLsb >= maxLsb / 2)
                      mPrev + maxLsb
                    else if (pocLsb > lPrev &&
                        pocLsb - lPrev > maxLsb / 2) mPrev - maxLsb
                    else mPrev
                  if (curIsRef) { pocMsbPrev = msb; pocLsbPrev = pocLsb }
                  msb + pocLsb
                case 2 =>
                  val maxFn = 1 << s.log2MaxFrameNum
                  val off =
                    if (nalType == 5) 0
                    else if (fnPrev > frameNum) fnOffPrev + maxFn
                    else fnOffPrev
                  fnOffPrev = off; fnPrev = frameNum
                  2 * (off + frameNum) - (if (curIsRef) 0 else 1)
                case _ => picCounter * 2 // decode-order fallback
              }
            }
            val sliceId = cur.slices
            cur.slices += 1
            var qpY = p.picInitQp + sliceQpDelta
            require(qpY >= 0 && qpY <= 51, s"slice QP $qpY out of range")
            cur.chromaQpOffset = p.chromaQpOffset
            cur.chromaQpOffsetCr = p.chromaQpOffsetCr
            def recordDeblock(mb: Int, qp: Int): Unit = {
              cur.mbQp(mb) = qp
              cur.deblockIdc(mb) = deblockIdc
              cur.offsetA(mb) = filterOffA
              cur.offsetB(mb) = filterOffB
            }
            if (isB) {
              // RefPicList0/1 for B (§8.2.4.2.3): list 0 = past refs
              // by descending POC then future refs ascending; list 1
              // mirrored; identical lists of length > 1 swap their
              // first two entries
              val before = dpb.filter(_.poc < cur.poc).sortBy(-_.poc)
              val after = dpb.filter(_.poc > cur.poc).sortBy(_.poc)
              var l0 = (before ++ after).toIndexedSeq
              var l1 = (after ++ before).toIndexedSeq
              if (l1.size > 1 && l0 == l1)
                l1 = IndexedSeq(l1(1), l1(0)) ++ l1.drop(2)
              require(numRefActive >= 1 && numRefActive1 >= 1 &&
                numRefActive <= 32 && numRefActive1 <= 32,
                "num_ref_idx_active out of range")
              val maxFnB = 1 << s.log2MaxFrameNum
              if (listMod0 != null)
                l0 = H264Inter.applyListModification(l0, listMod0,
                  frameNum, maxFnB, numRefActive)
              if (listMod1 != null)
                l1 = H264Inter.applyListModification(l1, listMod1,
                  frameNum, maxFnB, numRefActive1)
              // §8.2.4.2: the final lists hold at most
              // num_ref_idx_lX_active entries even when no
              // modification syntax is present, so an out-of-active
              // ref_idx fails decode validation instead of silently
              // motion-compensating from an inactive reference
              l0 = l0.take(numRefActive)
              l1 = l1.take(numRefActive1)
              val colPic = l1.head
              curL0Head = l0.head.picId
              val ctx = cur.ctx; val mo = cur.mo
              var mb = firstMb
              var more = r.moreRbspData
              while (more && mb < cur.total) {
                val run = r.ue() // mb_skip_run (B_Skip = direct)
                var k = 0
                while (k < run && mb < cur.total) {
                  H264Inter.decodeBSkipMb(ctx, mo, sliceId, mb, l0,
                    l1, colPic, cur.y, cur.cb, cur.cr,
                    directSpatial, cur.poc, pWeights, pWeightsL1,
                    p.weightedBipred == 2)
                  recordDeblock(mb, qpY)
                  cur.mbsDone += 1
                  mb += 1; k += 1
                }
                require(k == run, "mb_skip_run past end of picture")
                more = r.moreRbspData
                if (more && mb < cur.total) {
                  val mbType = r.ue()
                  if (mbType >= 23) { // intra MB in a B slice
                    val it = mbType - 23
                    if (it == 25) {
                      readIpcmMb(r, cur, mb, sliceId)
                      recordDeblock(mb, 0)
                    } else {
                      qpY = H264Mb.decodeMb(r, it, ctx, mb, sliceId,
                        qpY, p.chromaQpOffset, cur.y, cur.cb, cur.cr,
                        p.transform8x8, p.sm, p.chromaQpOffsetCr)
                      recordDeblock(mb, qpY)
                    }
                    mo.markIntraMb(mb, cur.wMbs)
                  } else {
                    qpY = H264Inter.decodeBMb(r, mbType, ctx, mo,
                      sliceId, mb, qpY, p, l0, l1, numRefActive,
                      numRefActive1, colPic, cur.y, cur.cb, cur.cr,
                      directSpatial, cur.poc, pWeights, pWeightsL1,
                      p.weightedBipred == 2, s.direct8x8Inference)
                    recordDeblock(mb, qpY)
                  }
                  cur.mbsDone += 1
                  mb += 1
                  more = r.moreRbspData
                }
              }
            } else if (isP) {
              // RefPicList0 (§8.2.4.2.1): short-term refs by
              // descending PicNum (FrameNumWrap, §8.2.4.1)
              val maxFn = 1 << s.log2MaxFrameNum
              def picNum(rp: H264Inter.RefPic): Int =
                if (rp.frameNum > frameNum) rp.frameNum - maxFn
                else rp.frameNum
              var refList = dpb.sortBy(rp => -picNum(rp)).toIndexedSeq
              require(numRefActive >= 1 && numRefActive <= 32,
                s"num_ref_idx_l0_active $numRefActive out of range")
              if (listMod0 != null)
                refList = H264Inter.applyListModification(refList,
                  listMod0, frameNum, maxFn, numRefActive)
              // truncate to num_ref_idx_l0_active (§8.2.4.2.1) so
              // ref_idx validation is bounded by the ACTIVE count
              refList = refList.take(numRefActive)
              curL0Head = refList.head.picId
              val ctx = cur.ctx; val mo = cur.mo
              var mb = firstMb
              var more = r.moreRbspData
              while (more && mb < cur.total) {
                val run = r.ue() // mb_skip_run
                var k = 0
                while (k < run && mb < cur.total) {
                  H264Inter.decodeSkipMb(ctx, mo, sliceId, mb,
                    refList, cur.y, cur.cb, cur.cr, pWeights)
                  recordDeblock(mb, qpY) // P_Skip: QP carries over
                  cur.mbsDone += 1
                  mb += 1; k += 1
                }
                require(k == run, "mb_skip_run past end of picture")
                more = r.moreRbspData
                if (more && mb < cur.total) {
                  val mbType = r.ue()
                  if (mbType >= 5) { // intra MB in a P slice
                    val it = mbType - 5
                    if (it == 25) {
                      readIpcmMb(r, cur, mb, sliceId)
                      recordDeblock(mb, 0)
                    } else {
                      qpY = H264Mb.decodeMb(r, it, ctx, mb, sliceId,
                        qpY, p.chromaQpOffset, cur.y, cur.cb, cur.cr,
                        p.transform8x8, p.sm, p.chromaQpOffsetCr)
                      recordDeblock(mb, qpY)
                    }
                    mo.markIntraMb(mb, cur.wMbs)
                  } else {
                    qpY = H264Inter.decodeInterMb(r, mbType, ctx, mo,
                      sliceId, mb, qpY, p, refList, numRefActive,
                      cur.y, cur.cb, cur.cr, pWeights)
                    recordDeblock(mb, qpY)
                  }
                  cur.mbsDone += 1
                  mb += 1
                  more = r.moreRbspData
                }
              }
            } else if (p.cabac) {
              // CABAC × transform_8x8 needs the ctx-399+ init tables
              // (§9.3.1.1 High extension), which this module has NOT
              // transcribed — a named error, never invented constants
              // (the MP3 rule); CAVLC carries the 8x8 path
              require(!p.transform8x8,
                "CABAC with transform_8x8_mode unsupported (ctx-399+ " +
                  "init tables not transcribed) — CAVLC 8x8 is")
              // cabac_alignment_one_bit* then CABAC slice data (§9.3)
              while (!r.byteAligned)
                require(r.u(1) == 1, "cabac_alignment_one_bit must be 1")
              val qps = new Array[Int](cur.total)
              val done = H264Cabac.decodeSliceData(r, cur.ctx,
                sliceId, firstMb, qpY, p.chromaQpOffset,
                cur.y, cur.cb, cur.cr, qps, p.sm, p.chromaQpOffsetCr)
              var mb = firstMb
              while (mb < firstMb + done) {
                recordDeblock(mb, qps(mb))
                cur.mo.markIntraMb(mb, cur.wMbs)
                mb += 1
              }
              cur.mbsDone += done
            } else {
            var mb = firstMb
            while (mb < cur.total && r.moreRbspData) {
              val mbType = r.ue()
              if (mbType == 25) { // I_PCM
                readIpcmMb(r, cur, mb, sliceId)
                recordDeblock(mb, 0) // I_PCM deblocks at QP 0 (§8.7.2)
              } else {
                qpY = H264Mb.decodeMb(r, mbType, cur.ctx, mb, sliceId,
                  qpY, p.chromaQpOffset, cur.y, cur.cb, cur.cr,
                  p.transform8x8, p.sm, p.chromaQpOffsetCr)
                recordDeblock(mb, qpY)
              }
              cur.mo.markIntraMb(mb, cur.wMbs)
              cur.mbsDone += 1
              mb += 1
            }
            }
            if (cur.mbsDone >= cur.total) {
              if (cur.deblockIdc.exists(_ != 1))
                H264Deblock.filterPicture(cur.y, cur.cb, cur.cr,
                  cur.wMbs, cur.hMbs, cur.mbQp, cur.chromaQpOffset,
                  cur.ctx.sliceId, cur.deblockIdc, cur.offsetA,
                  cur.offsetB, cur.ctx.is8x8, cur.chromaQpOffsetCr,
                  cur.mo, cur.ctx.lumaNz)
              pending += ((cur.epoch, cur.poc, toRgb(cur, curSps)))
              framesOut += 1
              if (curIsRef) {
                // store POST-deblock planes (§8.4.2.1 MC reads the
                // filtered picture); sliding-window marking: evict
                // the smallest FrameNumWrap when over max_num_ref_frames
                dpb += new H264Inter.RefPic(picCounter, curFrameNum,
                  cur.wMbs, cur.hMbs, cur.y, cur.cb, cur.cr,
                  cur.poc, cur.mo, curL0Head)
                picCounter += 1
                val maxFn = 1 << curSps.log2MaxFrameNum
                val cap = math.max(1, curSps.maxNumRefFrames)
                while (dpb.size > cap) {
                  def wrap(rp: H264Inter.RefPic): Int =
                    if (rp.frameNum > curFrameNum) rp.frameNum - maxFn
                    else rp.frameNum
                  dpb -= dpb.minBy(wrap)
                }
              }
              cur = null
            }
            }
          }
        case _ => () // SEI/AUD/filler/...: skipped
      }
    }
    if (framesOut == 0 && skippedInter > 0)
      throw new IllegalArgumentException(
        s"no decodable picture: all $skippedInter inter pictures " +
          "hit a named boundary (SP/SI, CABAC inter, long-term " +
          "reference ops, or a missing reference) and no intra " +
          "picture decoded")
    // display order: IDR epoch, then POC (stable for ties)
    pending.sortBy(t => (t._1, t._2)).map(_._3).toSeq
  }

  /** Read one I_PCM macroblock's raw samples (§7.3.5 pcm path) into
    * the picture planes — shared by the I-slice and P-slice loops. */
  private def readIpcmMb(r: BitReader, cur: Yuv, mb: Int,
                         sliceId: Int): Unit = {
    r.alignToByte()
    val mbX = (mb % cur.wMbs) * 16
    val mbY = (mb / cur.wMbs) * 16
    var i = 0
    while (i < 256) {
      cur.y((mbY + i / 16) * cur.wMbs * 16 + mbX + i % 16) =
        r.readByte().toByte
      i += 1
    }
    val cX = mbX / 2; val cY = mbY / 2; val cw = cur.wMbs * 8
    i = 0
    while (i < 64) {
      cur.cb((cY + i / 8) * cw + cX + i % 8) = r.readByte().toByte
      i += 1
    }
    i = 0
    while (i < 64) {
      cur.cr((cY + i / 8) * cw + cX + i % 8) = r.readByte().toByte
      i += 1
    }
    cur.ctx.sliceId(mb) = sliceId
    cur.ctx.isIpcm(mb) = true
  }

  /** Full-range BT.601 YCbCr → packed RGB, cropped per the SPS. The
    * EXACT integer inverse of [[rgbToYuv]]'s forward rounding is not
    * required (lossy either way); determinism is — identical payloads
    * decode to identical pixels. */
  private def toRgb(f: Yuv, s: Sps): (Int, Int, Array[Int]) = {
    val w = s.width; val h = s.height
    val x0 = 2 * s.cropL; val y0 = 2 * s.cropT
    val lw = f.wMbs * 16; val cw = f.wMbs * 8
    val out = new Array[Int](w * h)
    fillRgb(out, w, h, x0, y0, lw, cw, f.y, f.cb, f.cr)
    (w, h, out)
  }

  /** The encoder-side twin of [[toRgb]] (top-left crop origin). */
  private def planesToRgb(wMbs: Int, hMbs: Int, cropR: Int, cropB: Int,
                          y: Array[Byte], cb: Array[Byte],
                          cr: Array[Byte]): (Int, Int, Array[Int]) = {
    val w = wMbs * 16 - 2 * cropR
    val h = hMbs * 16 - 2 * cropB
    val out = new Array[Int](w * h)
    fillRgb(out, w, h, 0, 0, wMbs * 16, wMbs * 8, y, cb, cr)
    (w, h, out)
  }

  private def fillRgb(out: Array[Int], w: Int, h: Int, x0: Int,
                      y0: Int, lw: Int, cw: Int, yPl: Array[Byte],
                      cbPl: Array[Byte], crPl: Array[Byte]): Unit = {
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val yy = yPl((y0 + y) * lw + x0 + x) & 0xFF
        val cb = (cbPl(((y0 + y) / 2) * cw + (x0 + x) / 2) & 0xFF) - 128
        val cr = (crPl(((y0 + y) / 2) * cw + (x0 + x) / 2) & 0xFF) - 128
        def clamp(v: Double): Int =
          math.max(0, math.min(255, math.round(v).toInt))
        val r = clamp(yy + 1.402 * cr)
        val g = clamp(yy - 0.344136 * cb - 0.714136 * cr)
        val b = clamp(yy + 1.772 * cb)
        out(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
  }

  /** Forward full-range BT.601 RGB → (Y, Cb, Cr). */
  def rgbToYuv(rgb: Int): (Int, Int, Int) = {
    val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF
    val b = rgb & 0xFF
    def clamp(v: Double): Int =
      math.max(0, math.min(255, math.round(v).toInt))
    (clamp(0.299 * r + 0.587 * g + 0.114 * b),
      clamp(128 - 0.168736 * r - 0.331264 * g + 0.5 * b),
      clamp(128 + 0.5 * r - 0.418688 * g - 0.081312 * b))
  }

  // ---- encode (fixture generator) ---------------------------------------

  private def nal(refIdc: Int, nalType: Int,
                  rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0); out.write(0); out.write(0); out.write(1)
    out.write((refIdc << 5) | nalType)
    val ebsp = rbspToEbsp(rbsp)
    out.write(ebsp, 0, ebsp.length)
    out.toByteArray
  }

  private def spsRbsp(wMbs: Int, hMbs: Int, cropR: Int,
                      cropB: Int, maxRefFrames: Int = 0,
                      high: Boolean = false,
                      seqScalingDefault: Boolean = false,
                      pocLsbBits: Int = 0): Array[Byte] = {
    val w = new BitWriter()
    w.u(if (high) 100 else 66, 8) // profile_idc: High or Baseline
    w.u(0, 8)  // constraint flags + reserved_zero_2bits
    w.u(40, 8) // level_idc 4.0
    w.ue(0)    // seq_parameter_set_id
    if (high) {
      w.ue(1)     // chroma_format_idc 4:2:0
      w.ue(0); w.ue(0) // bit_depth_luma/chroma_minus8
      w.u(0, 1)   // qpprime_y_zero_transform_bypass_flag
      if (seqScalingDefault) {
        w.u(1, 1) // seq_scaling_matrix_present_flag
        // list 0 present, first delta jumps to 0 → the DEFAULT intra
        // matrix (§7.3.2.1.1.1); all other lists absent → Table 7-2
        // rule-A fallbacks (1,2 inherit list 0; 3-5 default inter;
        // 6/7 default 8x8 intra/inter)
        w.u(1, 1); w.se(-8)
        (1 until 8).foreach(_ => w.u(0, 1))
      } else w.u(0, 1)
    }
    w.ue(0)    // log2_max_frame_num_minus4
    if (pocLsbBits > 0) {
      w.ue(0)  // pic_order_cnt_type 0 (B streams reorder output)
      w.ue(pocLsbBits - 4) // log2_max_pic_order_cnt_lsb_minus4
    } else w.ue(2) // pic_order_cnt_type 2 (decode order = display)
    w.ue(maxRefFrames) // max_num_ref_frames (1 when P filler present)
    w.u(0, 1)  // gaps_in_frame_num_value_allowed_flag
    w.ue(wMbs - 1)
    w.ue(hMbs - 1)
    w.u(1, 1)  // frame_mbs_only_flag
    w.u(1, 1)  // direct_8x8_inference_flag
    if (cropR > 0 || cropB > 0) {
      w.u(1, 1); w.ue(0); w.ue(cropR); w.ue(0); w.ue(cropB)
    } else w.u(0, 1)
    w.u(0, 1)  // vui_parameters_present_flag
    w.trailingBits()
    w.toBytes
  }

  private def ppsRbsp(deblockingControl: Boolean = false,
                      cabac: Boolean = false,
                      id: Int = 0,
                      transform8x8: Boolean = false,
                      chromaQpOffsetCr: Int = 0,
                      weightedPred: Boolean = false,
                      weightedBipredIdc: Int = 0): Array[Byte] = {
    val w = new BitWriter()
    w.ue(id)  // pic_parameter_set_id
    w.ue(0)   // seq_parameter_set_id
    w.u(if (cabac) 1 else 0, 1) // entropy_coding_mode_flag
    w.u(0, 1) // bottom_field_pic_order_in_frame_present_flag
    w.ue(0)   // num_slice_groups_minus1
    w.ue(0); w.ue(0) // num_ref_idx_l{0,1}_default_active_minus1
    w.u(if (weightedPred) 1 else 0, 1) // weighted_pred_flag
    w.u(weightedBipredIdc, 2) // weighted_bipred_idc
    w.se(0)   // pic_init_qp_minus26
    w.se(0)   // pic_init_qs_minus26
    w.se(0)   // chroma_qp_index_offset
    w.u(if (deblockingControl) 1 else 0, 1) // deblocking control present
    w.u(0, 1) // constrained_intra_pred_flag
    w.u(0, 1) // redundant_pic_cnt_present_flag
    if (transform8x8 || chromaQpOffsetCr != 0) { // §7.3.2.2 tail
      w.u(if (transform8x8) 1 else 0, 1) // transform_8x8_mode_flag
      w.u(0, 1) // pic_scaling_matrix_present_flag (SPS lists apply)
      w.se(chromaQpOffsetCr) // second_chroma_qp_index_offset (Cr)
    }
    w.trailingBits()
    w.toBytes
  }

  private def idrSliceRbsp(frameIdx: Int, wMbs: Int, hMbs: Int,
                           y: Array[Byte], cb: Array[Byte],
                           cr: Array[Byte]): Array[Byte] = {
    val w = new BitWriter()
    w.ue(0)  // first_mb_in_slice
    w.ue(7)  // slice_type: I (all slices in picture are I)
    w.ue(0)  // pic_parameter_set_id
    w.u(0, 4) // frame_num (log2MaxFrameNum = 4; IDR resets to 0)
    w.ue(frameIdx & 1) // idr_pic_id: consecutive IDRs must differ
    w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking (IDR)
    w.se(0)  // slice_qp_delta
    val lw = wMbs * 16; val cwid = wMbs * 8
    var mb = 0
    while (mb < wMbs * hMbs) {
      w.ue(25) // mb_type: I_PCM
      w.alignZero() // pcm_alignment_zero_bit*
      val mbX = (mb % wMbs) * 16
      val mbY = (mb / wMbs) * 16
      var i = 0
      while (i < 256) {
        w.u(y((mbY + i / 16) * lw + mbX + i % 16) & 0xFF, 8); i += 1
      }
      val cX = mbX / 2; val cY = mbY / 2
      i = 0
      while (i < 64) {
        w.u(cb((cY + i / 8) * cwid + cX + i % 8) & 0xFF, 8); i += 1
      }
      i = 0
      while (i < 64) {
        w.u(cr((cY + i / 8) * cwid + cX + i % 8) & 0xFF, 8); i += 1
      }
      mb += 1
    }
    w.trailingBits()
    w.toBytes
  }

  /**
   * Encode frames of packed-RGB pixels as a spec-valid Annex-B H.264
   * stream: SPS, PPS, then one all-I_PCM IDR slice per frame.
   * Chroma is subsampled by 2×2 averaging of the forward-converted
   * planes. Deterministic; emulation prevention applied. This is the
   * FIXTURE GENERATOR for the video family's H.264 gates — it emits
   * conformant output any decoder accepts, not just [[decodeFrames]].
   */
  def encode(width: Int, height: Int,
             frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty)
    require(frames.forall(_.length == width * height))
    val wMbs = (width + 15) / 16
    val hMbs = (height + 15) / 16
    // crop offsets are in 2-px units (4:2:0): pad to even first
    require(width % 2 == 0 && height % 2 == 0,
      "odd display dims need crop in 1-px units (unsupported)")
    val cropR = (wMbs * 16 - width) / 2
    val cropB = (hMbs * 16 - height) / 2
    val out = new java.io.ByteArrayOutputStream()
    val spsNal = nal(3, 7, spsRbsp(wMbs, hMbs, cropR, cropB))
    val ppsNal = nal(3, 8, ppsRbsp())
    out.write(spsNal, 0, spsNal.length)
    out.write(ppsNal, 0, ppsNal.length)
    val lw = wMbs * 16; val lh = hMbs * 16; val cwid = wMbs * 8
    frames.zipWithIndex.foreach { case (rgb, f) =>
      val yP = new Array[Byte](lw * lh)
      val cbF = new Array[Int](lw * lh)
      val crF = new Array[Int](lw * lh)
      var yy = 0
      while (yy < lh) {
        var x = 0
        while (x < lw) {
          // edge-replicate into the padded MB area
          val sx = math.min(x, width - 1)
          val sy = math.min(yy, height - 1)
          val (l, cbv, crv) = rgbToYuv(rgb(sy * width + sx))
          yP(yy * lw + x) = l.toByte
          cbF(yy * lw + x) = cbv
          crF(yy * lw + x) = crv
          x += 1
        }
        yy += 1
      }
      val cbP = new Array[Byte](cwid * hMbs * 8)
      val crP = new Array[Byte](cwid * hMbs * 8)
      var cy = 0
      while (cy < hMbs * 8) {
        var cx = 0
        while (cx < cwid) {
          val i0 = (2 * cy) * lw + 2 * cx
          val i1 = i0 + 1; val i2 = i0 + lw; val i3 = i2 + 1
          cbP(cy * cwid + cx) =
            ((cbF(i0) + cbF(i1) + cbF(i2) + cbF(i3) + 2) / 4).toByte
          crP(cy * cwid + cx) =
            ((crF(i0) + crF(i1) + crF(i2) + crF(i3) + 2) / 4).toByte
          cx += 1
        }
        cy += 1
      }
      val sliceNal =
        nal(3, 5, idrSliceRbsp(f, wMbs, hMbs, yP, cbP, crP))
      out.write(sliceNal, 0, sliceNal.length)
    }
    out.toByteArray
  }

  /** Edge-replicated padded YUV planes for one RGB frame: luma at
    * (wMbs·16 × hMbs·16), chroma 2×2-averaged at half size — the
    * shared front of both the I_PCM and CAVLC encoders. */
  private def rgbToPlanes(width: Int, height: Int, wMbs: Int,
                          hMbs: Int, rgb: Array[Int])
      : (Array[Int], Array[Int], Array[Int]) = {
    val lw = wMbs * 16; val lh = hMbs * 16; val cwid = wMbs * 8
    val yP = new Array[Int](lw * lh)
    val cbF = new Array[Int](lw * lh)
    val crF = new Array[Int](lw * lh)
    var yy = 0
    while (yy < lh) {
      var x = 0
      while (x < lw) {
        val sx = math.min(x, width - 1)
        val sy = math.min(yy, height - 1)
        val (l, cbv, crv) = rgbToYuv(rgb(sy * width + sx))
        yP(yy * lw + x) = l
        cbF(yy * lw + x) = cbv
        crF(yy * lw + x) = crv
        x += 1
      }
      yy += 1
    }
    val cbP = new Array[Int](cwid * hMbs * 8)
    val crP = new Array[Int](cwid * hMbs * 8)
    var cy = 0
    while (cy < hMbs * 8) {
      var cx = 0
      while (cx < cwid) {
        val i0 = (2 * cy) * lw + 2 * cx
        val i1 = i0 + 1; val i2 = i0 + lw; val i3 = i2 + 1
        cbP(cy * cwid + cx) = (cbF(i0) + cbF(i1) + cbF(i2) + cbF(i3) + 2) / 4
        crP(cy * cwid + cx) = (crF(i0) + crF(i1) + crF(i2) + crF(i3) + 2) / 4
        cx += 1
      }
      cy += 1
    }
    (yP, cbP, crP)
  }

  /**
   * Encode frames as a spec-valid Annex-B H.264 stream with REAL
   * compressed intra macroblocks: CAVLC entropy coding, a
   * deterministic mix of Intra_4x4 and Intra_16x16 MB types cycling
   * through every prediction mode that neighbor availability allows
   * (see [[H264Mb.encodeSliceData]]). Lossy at any `qp` — so, unlike
   * [[encode]]'s I_PCM output, the pixels a decoder must produce are
   * the encoder's own integer-exact RECONSTRUCTION, which is returned
   * alongside the bytes: `decodeFrames(bytes)` equals it bit-exactly
   * (H264Spec pins this). The slice signals
   * disable_deblocking_filter_idc=1, so the stream is exact under any
   * conformant external decoder too, not just this one.
   */
  /** The matrices the `scalingMatrix = true` fixtures quantize and
    * reconstruct with — by construction EXACTLY what parseSps
    * resolves from the emitted SPS (list 0 default + rule-A
    * fallbacks), so decode == recon stays the pin. */
  private def defaultSm: ScalingMatrices = new ScalingMatrices(
    Array(ScalingMatrices.Default4x4Intra,
      ScalingMatrices.Default4x4Intra,
      ScalingMatrices.Default4x4Intra,
      ScalingMatrices.Default4x4Inter,
      ScalingMatrices.Default4x4Inter,
      ScalingMatrices.Default4x4Inter),
    Array(ScalingMatrices.Default8x8Intra,
      ScalingMatrices.Default8x8Inter))

  def encodeCavlc(width: Int, height: Int, frames: Seq[Array[Int]],
                  qp: Int = 26, mbRowsPerSlice: Int = 0,
                  deblock: Boolean = false, qpAmp: Int = 0,
                  transform8x8: Boolean = false,
                  scalingMatrix: Boolean = false,
                  chromaQpOffsetCr: Int = 0)
      : (Array[Byte], Seq[(Int, Int, Array[Int])]) = {
    require(frames.nonEmpty)
    require(frames.forall(_.length == width * height))
    require(qp >= 0 && qp <= 51, s"qp $qp out of [0, 51]")
    require(width % 2 == 0 && height % 2 == 0,
      "odd display dims need crop in 1-px units (unsupported)")
    val wMbs = (width + 15) / 16
    val hMbs = (height + 15) / 16
    val cropR = (wMbs * 16 - width) / 2
    val cropB = (hMbs * 16 - height) / 2
    // mbRowsPerSlice > 0 splits each picture into multiple slices of
    // that many MB rows — slices are independent decoding units, so
    // intra prediction and CAVLC nC contexts must NOT cross the
    // boundary (the PicCtx sliceId machinery both sides exercise;
    // single-slice fixtures leave that logic untested)
    val rows = if (mbRowsPerSlice <= 0) hMbs else mbRowsPerSlice
    // High profile carries transform_8x8/scaling matrices; the
    // encoder-side quant and recon must use the SAME resolved
    // matrices parseSps/parsePps produce (decode == recon is the pin)
    val high = transform8x8 || scalingMatrix
    val sm =
      if (!scalingMatrix) ScalingMatrices.Flat
      else defaultSm
    val out = new java.io.ByteArrayOutputStream()
    val spsNal = nal(3, 7, spsRbsp(wMbs, hMbs, cropR, cropB,
      high = high, seqScalingDefault = scalingMatrix))
    val ppsNal = nal(3, 8, ppsRbsp(deblockingControl = true,
      transform8x8 = transform8x8,
      chromaQpOffsetCr = chromaQpOffsetCr))
    out.write(spsNal, 0, spsNal.length)
    out.write(ppsNal, 0, ppsNal.length)
    val recon = frames.zipWithIndex.map { case (rgb, f) =>
      val (srcY, srcCb, srcCr) = rgbToPlanes(width, height, wMbs,
        hMbs, rgb)
      val yR = new Array[Byte](wMbs * 16 * hMbs * 16)
      val cbR = new Array[Byte](wMbs * 8 * hMbs * 8)
      val crR = new Array[Byte](wMbs * 8 * hMbs * 8)
      val ctx = new H264Mb.PicCtx(wMbs, hMbs)
      val mbQps = Array.fill(wMbs * hMbs)(qp)
      var row = 0
      var sliceId = 0
      while (row < hMbs) {
        val firstMb = row * wMbs
        val endMb = math.min(hMbs, row + rows) * wMbs
        val w = new BitWriter()
        w.ue(firstMb) // first_mb_in_slice
        w.ue(7)  // slice_type: I
        w.ue(0)  // pic_parameter_set_id
        w.u(0, 4) // frame_num
        w.ue(f & 1) // idr_pic_id
        w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking (IDR)
        w.se(qp - 26) // slice_qp_delta vs pic_init_qp 26
        if (deblock) { w.ue(0); w.se(0); w.se(0) } // filter on
        else w.ue(1) // disable_deblocking_filter_idc = 1
        H264Mb.encodeSliceData(w, ctx, sliceId, sliceQp = qp,
          chromaQpOffset = 0, srcY, srcCb, srcCr, yR, cbR, crR,
          firstMb, endMb, qpAmp, mbQps, transform8x8, sm,
          chromaQpOffsetCr)
        w.trailingBits()
        val sliceNal = nal(3, 5, w.toBytes)
        out.write(sliceNal, 0, sliceNal.length)
        row += rows
        sliceId += 1
      }
      if (deblock) deblockRecon(ctx, mbQps, yR, cbR, crR,
        chromaQpOffsetCr)
      planesToRgb(wMbs, hMbs, cropR, cropB, yR, cbR, crR)
    }
    (out.toByteArray, recon)
  }

  /** Encoder-side deblock post-pass: the recon planes double as the
    * prediction source DURING encoding (intra prediction reads
    * unfiltered samples, §8.7), so the filter runs only after the
    * whole picture is encoded — exactly the decoder's sequencing. */
  private def deblockRecon(ctx: H264Mb.PicCtx, mbQps: Array[Int],
                           yR: Array[Byte], cbR: Array[Byte],
                           crR: Array[Byte],
                           chromaQpOffsetCr: Int = 0,
                           mo: H264Inter.MotionCtx = null): Unit = {
    val n = ctx.wMbs * ctx.hMbs
    H264Deblock.filterPicture(yR, cbR, crR, ctx.wMbs, ctx.hMbs,
      mbQps, chromaQpOffset = 0, ctx.sliceId,
      Array.fill(n)(0), new Array[Int](n), new Array[Int](n),
      ctx.is8x8, chromaQpOffsetCr, mo, ctx.lumaNz)
  }

  /**
   * Encode an IPPP… stream (CAVLC): frame 0 (and every `gop`-th
   * frame when `gop` > 0) is an IDR via [[H264Mb.encodeSliceData]];
   * every other frame is ONE P slice of motion-compensated
   * macroblocks ([[H264Inter.encodePMb]]) referencing up to
   * `refFrames` sliding-window short-term references.
   *
   *  - `forcedMv` plants one global quarter-pel MV per P frame
   *    (cycled), exercising every §8.4.2.2 fractional position and
   *    making most interior MBs collapse to P_Skip on translating
   *    content; empty → integer SAD search per partition.
   *  - `partitionCycle` cycles the MB partitioning through
   *    P_L0_16x16 / 16x8 / 8x16 / P_8x8 / P_8x8ref0 so every
   *    Table 7-13/7-17 shape and §8.4.1.3 directional rule is on
   *    the wire; off → 16x16 only (the skip-friendly shape).
   *  - `intraEvery` > 0 codes every n-th MB of P slices as an INTRA
   *    MB (mb_type + 5) — the refresh pattern real encoders emit.
   *
   * Returns (Annex-B bytes, per-frame reconstruction) — the decode
   * oracle: `decodeFrames(bytes)` must equal the recon pixels
   * exactly (H264InterSpec pins it).
   */
  /** Modification ops that rebuild a list as `desired` picNums,
    * each op relative to the running predictor (§8.2.4.3.1). */
  private def listModOps(desired: Seq[Int],
                         currPicNum: Int): Seq[(Int, Int)] = {
    var pred = currPicNum
    desired.map { pn =>
      val diff = pn - pred
      pred = pn
      if (diff < 0) (0, -diff - 1) else (1, diff - 1)
    }
  }

  def encodeCavlcP(width: Int, height: Int, frames: Seq[Array[Int]],
                   qp: Int = 26, gop: Int = 0,
                   forcedMv: Seq[(Int, Int)] = Nil,
                   searchRange: Int = 4,
                   partitionCycle: Boolean = false,
                   intraEvery: Int = 0,
                   refFrames: Int = 1,
                   deblock: Boolean = false,
                   transform8x8: Boolean = false,
                   scalingMatrix: Boolean = false,
                   weighted: Boolean = false,
                   listModSwap: Boolean = false)
      : (Array[Byte], Seq[(Int, Int, Array[Int])]) = {
    require(frames.nonEmpty)
    require(frames.forall(_.length == width * height))
    require(qp >= 0 && qp <= 51, s"qp $qp out of [0, 51]")
    require(width % 2 == 0 && height % 2 == 0,
      "odd display dims need crop in 1-px units (unsupported)")
    require(refFrames >= 1 && refFrames <= 4, "refFrames in 1..4")
    val wMbs = (width + 15) / 16
    val hMbs = (height + 15) / 16
    val nMbs = wMbs * hMbs
    val cropR = (wMbs * 16 - width) / 2
    val cropB = (hMbs * 16 - height) / 2
    val high = transform8x8 || scalingMatrix
    val sm = if (scalingMatrix) defaultSm else ScalingMatrices.Flat
    val out = new java.io.ByteArrayOutputStream()
    val spsNal = nal(3, 7, spsRbsp(wMbs, hMbs, cropR, cropB,
      maxRefFrames = refFrames, high = high,
      seqScalingDefault = scalingMatrix))
    val ppsNal = nal(3, 8, ppsRbsp(deblockingControl = true,
      transform8x8 = transform8x8, weightedPred = weighted))
    out.write(spsNal, 0, spsNal.length)
    out.write(ppsNal, 0, ppsNal.length)
    // the Pps a decoder parses from ppsRbsp above — encode-side
    // quant/recon must run off the SAME picture parameters
    val pEnc = Pps(0, 0, cabac = false, bottomFieldPicOrder = false,
      deblockingControl = true, redundantPicCnt = false,
      picInitQp = 26, chromaQpOffset = 0,
      transform8x8 = transform8x8, sm = sm,
      weightedPred = weighted)
    // deterministic explicit weights per refIdx (§7.3.3.2): a fade
    // shape — ~0.9x luma with a small positive offset on ref 0,
    // stepping per ref so multi-ref fixtures carry DISTINCT weights;
    // chroma weighted toward identity with a negative Cr offset
    def wts(numRef: Int): H264Inter.PredWeights =
      H264Inter.PredWeights(5, 6,
        wY = Array.tabulate(numRef)(i => 29 - 2 * i),
        oY = Array.tabulate(numRef)(i => 2 + i),
        wCb = Array.tabulate(numRef)(i => 64 - 3 * i),
        oCb = Array.fill(numRef)(0),
        wCr = Array.tabulate(numRef)(i => 61 + i),
        oCr = Array.fill(numRef)(-1))
    val dpb = scala.collection.mutable.ArrayBuffer
      .empty[H264Inter.RefPic]
    var picId = 0
    var nextFn = 0
    var pIdx = 0 // P-frame counter, indexes forcedMv
    val recon = frames.zipWithIndex.map { case (rgb, f) =>
      val isIdr = f == 0 || (gop > 0 && f % gop == 0)
      val (srcY, srcCb, srcCr) = rgbToPlanes(width, height, wMbs,
        hMbs, rgb)
      val yR = new Array[Byte](wMbs * 16 * hMbs * 16)
      val cbR = new Array[Byte](wMbs * 8 * hMbs * 8)
      val crR = new Array[Byte](wMbs * 8 * hMbs * 8)
      val ctx = new H264Mb.PicCtx(wMbs, hMbs)
      val mo = new H264Inter.MotionCtx(wMbs * 4, hMbs * 4)
      val mbQps = Array.fill(nMbs)(qp)
      val w = new BitWriter()
      val fn = if (isIdr) 0 else nextFn
      if (isIdr) {
        dpb.clear()
        w.ue(0)  // first_mb_in_slice
        w.ue(7)  // slice_type: I
        w.ue(0)  // pic_parameter_set_id
        w.u(0, 4) // frame_num (IDR resets)
        w.ue(f & 1) // idr_pic_id
        w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking (IDR)
        w.se(qp - 26)
        if (deblock) { w.ue(0); w.se(0); w.se(0) } else w.ue(1)
        H264Mb.encodeSliceData(w, ctx, 0, qp, 0, srcY, srcCb, srcCr,
          yR, cbR, crR, 0, -1, 0, mbQps, transform8x8, sm)
        var mb = 0
        while (mb < nMbs) { mo.markIntraMb(mb, wMbs); mb += 1 }
        w.trailingBits()
        val sliceNal = nal(3, 5, w.toBytes)
        out.write(sliceNal, 0, sliceNal.length)
      } else {
        val maxFn = 16 // log2_max_frame_num 4 (spsRbsp)
        val refList0 = dpb.sortBy(rp =>
          -(if (rp.frameNum > fn) rp.frameNum - maxFn
            else rp.frameNum)).toIndexedSeq
        val numRefActive = math.min(refFrames, refList0.size)
        def pnOf(rp: H264Inter.RefPic): Int =
          if (rp.frameNum > fn) rp.frameNum - maxFn else rp.frameNum
        // listModSwap: reverse the initial list order on the wire —
        // the DECODER must reconstruct the same swapped list
        val doSwap = listModSwap && numRefActive >= 2
        val refList =
          if (doSwap) refList0.take(numRefActive).reverse ++
            refList0.drop(numRefActive)
          else refList0
        val fmv =
          if (forcedMv.isEmpty) None
          else Some(forcedMv(pIdx % forcedMv.size))
        pIdx += 1
        w.ue(0)  // first_mb_in_slice
        w.ue(5)  // slice_type: P (all slices in picture are P)
        w.ue(0)  // pic_parameter_set_id
        w.u(fn, 4)
        if (numRefActive != 1) { w.u(1, 1); w.ue(numRefActive - 1) }
        else w.u(0, 1) // num_ref_idx_active_override_flag
        if (doSwap) {
          w.u(1, 1) // ref_pic_list_modification_flag_l0
          H264Inter.writeListModification(w,
            listModOps(refList.take(numRefActive).map(pnOf), fn))
        } else w.u(0, 1)
        val pwSlice =
          if (weighted) {
            val pws = wts(numRefActive)
            H264Inter.writePredWeightTable(w, pws)
            pws
          } else null
        w.u(0, 1) // adaptive_ref_pic_marking_mode_flag
        w.se(qp - 26)
        if (deblock) { w.ue(0); w.se(0); w.se(0) } else w.ue(1)
        var qpY = qp
        var run = 0
        var mb = 0
        while (mb < nMbs) {
          if (intraEvery > 0 && mb % intraEvery == intraEvery - 1) {
            w.ue(run); run = 0
            val plan = H264Mb.analyzeMb(ctx, mb, 0, qp, 0, srcY,
              srcCb, srcCr, yR, cbR, crR, transform8x8, sm)
            qpY = H264Mb.emitIntraMb(w, ctx, 0, mb, plan, qpY, qp,
              transform8x8, mbTypeOffset = 5)
            mo.markIntraMb(mb, wMbs)
          } else {
            val variant = if (partitionCycle) mb % 5 else 0
            val (skipped, q) = H264Inter.encodePMb(w, ctx, mo, 0, mb,
              refList, numRefActive, srcY, srcCb, srcCr, qpY, qp,
              pEnc, variant, fmv, searchRange, yR, cbR, crR, run,
              transform8x8, pwSlice)
            if (skipped) run += 1 else { run = 0; qpY = q }
          }
          mbQps(mb) = qpY
          mb += 1
        }
        if (run > 0) w.ue(run) // trailing skips close the slice
        w.trailingBits()
        val sliceNal = nal(2, 1, w.toBytes)
        out.write(sliceNal, 0, sliceNal.length)
      }
      if (deblock) deblockRecon(ctx, mbQps, yR, cbR, crR, 0, mo)
      // every picture is a reference: sliding-window marking
      dpb += new H264Inter.RefPic(picId, fn, wMbs, hMbs, yR, cbR, crR)
      picId += 1
      while (dpb.size > refFrames)
        dpb -= dpb.minBy(rp =>
          if (rp.frameNum > fn) rp.frameNum - 16 else rp.frameNum)
      nextFn = (fn + 1) % 16
      planesToRgb(wMbs, hMbs, cropR, cropB, yR, cbR, crR)
    }
    (out.toByteArray, recon)
  }

  /**
   * Encode an I(B..B)P(B..B)P… stream (CAVLC): display frame 0 is an
   * IDR; every `bBetween + 1`-th display frame (and the last) is a P
   * ANCHOR referencing the previous anchor; the frames between
   * consecutive anchors are non-reference B pictures whose list 0
   * holds the past anchor and list 1 the future anchor — the classic
   * broadcast GOP, decode order ≠ display order. POC type 0 with
   * `pocLsbBits` of lsb (small values exercise the §8.2.1.1 msb
   * wraparound); the decoder's output must come back in DISPLAY
   * order, equal to the returned recon.
   *
   * `variant` coverage mirrors [[encodeCavlcP]]: `partitionCycle`
   * walks B_Direct/L0/L1/Bi 16x16, the 16x8/8x16 two-list pairs and
   * B_8x8 sub-partitions; `intraEvery` codes intra MBs inside B
   * slices (mb_type + 23); `refsEachWay = 2` makes both anchors
   * addressable from BOTH lists (ref_idx te on the wire).
   */
  def encodeCavlcB(width: Int, height: Int, frames: Seq[Array[Int]],
                   qp: Int = 26, bBetween: Int = 2,
                   forcedMv: Seq[(Int, Int)] = Nil,
                   searchRange: Int = 4,
                   partitionCycle: Boolean = false,
                   intraEvery: Int = 0,
                   deblock: Boolean = false,
                   transform8x8: Boolean = false,
                   scalingMatrix: Boolean = false,
                   refsEachWay: Int = 1,
                   pocLsbBits: Int = 8,
                   bVariantBase: Int = 0,
                   directTemporal: Boolean = false,
                   weightedBi: Boolean = false,
                   implicitBi: Boolean = false,
                   listModSwap: Boolean = false)
      : (Array[Byte], Seq[(Int, Int, Array[Int])]) = {
    require(frames.nonEmpty)
    require(frames.forall(_.length == width * height))
    require(qp >= 0 && qp <= 51, s"qp $qp out of [0, 51]")
    require(width % 2 == 0 && height % 2 == 0,
      "odd display dims need crop in 1-px units (unsupported)")
    require(bBetween >= 1 && refsEachWay >= 1 && refsEachWay <= 2)
    require(pocLsbBits >= 4 && pocLsbBits <= 16)
    val n = frames.size
    val wMbs = (width + 15) / 16
    val hMbs = (height + 15) / 16
    val nMbs = wMbs * hMbs
    val cropR = (wMbs * 16 - width) / 2
    val cropB2 = (hMbs * 16 - height) / 2
    val high = transform8x8 || scalingMatrix
    val sm = if (scalingMatrix) defaultSm else ScalingMatrices.Flat
    val out = new java.io.ByteArrayOutputStream()
    val spsNal = nal(3, 7, spsRbsp(wMbs, hMbs, cropR, cropB2,
      maxRefFrames = 2, high = high,
      seqScalingDefault = scalingMatrix, pocLsbBits = pocLsbBits))
    require(!(weightedBi && implicitBi),
      "weighted_bipred_idc is one of explicit (1) or implicit (2)")
    val ppsNal = nal(3, 8, ppsRbsp(deblockingControl = true,
      transform8x8 = transform8x8,
      weightedBipredIdc =
        if (weightedBi) 1 else if (implicitBi) 2 else 0))
    out.write(spsNal, 0, spsNal.length)
    out.write(ppsNal, 0, ppsNal.length)
    val pEnc = Pps(0, 0, cabac = false, bottomFieldPicOrder = false,
      deblockingControl = true, redundantPicCnt = false,
      picInitQp = 26, chromaQpOffset = 0,
      transform8x8 = transform8x8, sm = sm)
    // deterministic explicit BI weights per list (§8.4.2.3.2): list 0
    // above identity, list 1 below, distinct offsets — asymmetric so
    // the weighted combine differs visibly from the plain average
    def bws(nRefs: Int, list: Int): H264Inter.PredWeights =
      H264Inter.PredWeights(5, 6,
        wY = Array.tabulate(nRefs)(i =>
          (if (list == 0) 36 else 27) + 2 * i),
        oY = Array.tabulate(nRefs)(i =>
          (if (list == 0) 2 else -2) + i),
        wCb = Array.fill(nRefs)(64 + (if (list == 0) 3 else -3)),
        oCb = Array.fill(nRefs)(if (list == 0) 1 else 0),
        wCr = Array.fill(nRefs)(64 - (if (list == 0) 2 else -2)),
        oCr = Array.fill(nRefs)(if (list == 0) -1 else 1))
    // display-index schedule: anchors every bBetween+1 (last frame
    // coerced anchor), then decode order = anchor, then its B run
    val g = bBetween + 1
    val anchors = ((0 until n by g) ++ Seq(n - 1)).distinct.sorted
    val schedule = Seq.newBuilder[Int]
    schedule += anchors.head
    anchors.sliding(2).foreach {
      case Seq(a, b) =>
        schedule += b
        (a + 1 until b).foreach(schedule += _)
      case _ => ()
    }
    val maxLsb = 1 << pocLsbBits
    val dpb = scala.collection.mutable.ArrayBuffer
      .empty[H264Inter.RefPic]
    var picId = 0
    var nextFn = 0
    var pIdx = 0
    val reconByDisplay = new Array[(Int, Int, Array[Int])](n)
    schedule.result().foreach { disp =>
      val isIdr = disp == 0
      val isAnchor = anchors.contains(disp)
      val poc = 2 * disp
      val pocLsb = poc % maxLsb
      val (srcY, srcCb, srcCr) = rgbToPlanes(width, height, wMbs,
        hMbs, frames(disp))
      val yR = new Array[Byte](wMbs * 16 * hMbs * 16)
      val cbR = new Array[Byte](wMbs * 8 * hMbs * 8)
      val crR = new Array[Byte](wMbs * 8 * hMbs * 8)
      val ctx = new H264Mb.PicCtx(wMbs, hMbs)
      val mo = new H264Inter.MotionCtx(wMbs * 4, hMbs * 4)
      val mbQps = Array.fill(nMbs)(qp)
      val w = new BitWriter()
      val fn = if (isIdr) 0 else nextFn
      if (isIdr) {
        dpb.clear()
        w.ue(0); w.ue(7); w.ue(0)
        w.u(0, 4) // frame_num
        w.ue(0)   // idr_pic_id
        w.u(pocLsb, pocLsbBits)
        w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking (IDR)
        w.se(qp - 26)
        if (deblock) { w.ue(0); w.se(0); w.se(0) } else w.ue(1)
        H264Mb.encodeSliceData(w, ctx, 0, qp, 0, srcY, srcCb, srcCr,
          yR, cbR, crR, 0, -1, 0, mbQps, transform8x8, sm)
        var mb = 0
        while (mb < nMbs) { mo.markIntraMb(mb, wMbs); mb += 1 }
        w.trailingBits()
        val sliceNal = nal(3, 5, w.toBytes)
        out.write(sliceNal, 0, sliceNal.length)
      } else if (isAnchor) { // P anchor referencing the previous one
        val refList = dpb.sortBy(-_.poc).take(1).toIndexedSeq
        w.ue(0); w.ue(5); w.ue(0)
        w.u(fn, 4)
        w.u(pocLsb, pocLsbBits)
        w.u(0, 1) // num_ref_idx_active_override (l0 default 1)
        w.u(0, 1) // ref_pic_list_modification_flag_l0
        w.u(0, 1) // adaptive_ref_pic_marking_mode_flag
        w.se(qp - 26)
        if (deblock) { w.ue(0); w.se(0); w.se(0) } else w.ue(1)
        var qpY = qp
        var run = 0
        var mb = 0
        val fmv =
          if (forcedMv.isEmpty) None
          else Some(forcedMv(pIdx % forcedMv.size))
        pIdx += 1
        while (mb < nMbs) {
          val variant = if (partitionCycle) mb % 5 else 0
          val (skipped, q) = H264Inter.encodePMb(w, ctx, mo, 0, mb,
            refList, 1, srcY, srcCb, srcCr, qpY, qp, pEnc, variant,
            fmv, searchRange, yR, cbR, crR, run, transform8x8)
          if (skipped) run += 1 else { run = 0; qpY = q }
          mbQps(mb) = qpY
          mb += 1
        }
        if (run > 0) w.ue(run)
        w.trailingBits()
        val sliceNal = nal(2, 1, w.toBytes)
        out.write(sliceNal, 0, sliceNal.length)
      } else { // non-reference B between the two newest anchors
        // the DECODER's list construction, replicated exactly
        val before = dpb.filter(_.poc < poc).sortBy(-_.poc)
        val after = dpb.filter(_.poc > poc).sortBy(_.poc)
        val l0Init = (before ++ after).toIndexedSeq
        var l1 = (after ++ before).toIndexedSeq
        if (l1.size > 1 && l0Init == l1)
          l1 = IndexedSeq(l1(1), l1(0)) ++ l1.drop(2)
        val nr0 = math.min(refsEachWay, l0Init.size)
        val nr1 = math.min(refsEachWay, l1.size)
        def pnOfB(rp: H264Inter.RefPic): Int =
          if (rp.frameNum > fn) rp.frameNum - 16 else rp.frameNum
        // listModSwap on l0: reverse the first nr0 entries (nr0 = 1
        // selects the OTHER anchor as the sole list-0 reference)
        val doSwapB = listModSwap && l0Init.size >= 2
        val l0 =
          if (doSwapB) l0Init.take(2).reverse ++ l0Init.drop(2)
          else l0Init
        val colPic = l1.head
        w.ue(0); w.ue(6); w.ue(0) // slice_type 6: B (all-B picture)
        w.u(fn, 4)
        w.u(pocLsb, pocLsbBits)
        w.u(if (directTemporal) 0 else 1, 1) // direct_spatial_mv_pred
        if (nr0 != 1 || nr1 != 1) {
          w.u(1, 1); w.ue(nr0 - 1); w.ue(nr1 - 1)
        } else w.u(0, 1)
        if (doSwapB) {
          w.u(1, 1) // ref_pic_list_modification_flag_l0
          H264Inter.writeListModification(w,
            listModOps(l0.take(math.max(nr0, 2)).take(nr0 max 1)
              .map(pnOfB), fn))
        } else w.u(0, 1)
        w.u(0, 1) // ref_pic_list_modification_flag_l1
        val (pw0S, pw1S) =
          if (weightedBi) {
            val a = bws(nr0, 0); val b = bws(nr1, 1)
            H264Inter.writePredWeightTable(w, a)
            H264Inter.writePredWeightTable(w, b, denoms = false)
            (a, b)
          } else (null, null)
        // non-reference (refIdc 0): no dec_ref_pic_marking
        w.se(qp - 26)
        if (deblock) { w.ue(0); w.se(0); w.se(0) } else w.ue(1)
        var qpY = qp
        var run = 0
        var mb = 0
        val fmv =
          if (forcedMv.isEmpty) None
          else Some(forcedMv(pIdx % forcedMv.size))
        pIdx += 1
        while (mb < nMbs) {
          if (intraEvery > 0 && mb % intraEvery == intraEvery - 1) {
            w.ue(run); run = 0
            val plan = H264Mb.analyzeMb(ctx, mb, 0, qp, 0, srcY,
              srcCb, srcCr, yR, cbR, crR, transform8x8, sm)
            qpY = H264Mb.emitIntraMb(w, ctx, 0, mb, plan, qpY, qp,
              transform8x8, mbTypeOffset = 23)
            mo.markIntraMb(mb, wMbs)
          } else {
            val variant = if (partitionCycle) mb % 8 else bVariantBase
            val (skipped, q) = H264Inter.encodeBMb(w, ctx, mo, 0, mb,
              l0, l1, nr0, nr1, colPic, srcY, srcCb, srcCr, qpY, qp,
              pEnc, variant, fmv, searchRange, yR, cbR, crR, run,
              transform8x8, !directTemporal, poc, pw0S, pw1S,
              implicitBi)
            if (skipped) run += 1 else { run = 0; qpY = q }
          }
          mbQps(mb) = qpY
          mb += 1
        }
        if (run > 0) w.ue(run)
        w.trailingBits()
        val sliceNal = nal(0, 1, w.toBytes) // non-reference
        out.write(sliceNal, 0, sliceNal.length)
      }
      if (deblock) deblockRecon(ctx, mbQps, yR, cbR, crR, 0, mo)
      if (isAnchor) { // only anchors are references
        val l0Head =
          if (isIdr) -1 else dpb.maxBy(_.poc).picId // its P reference
        dpb += new H264Inter.RefPic(picId, fn, wMbs, hMbs, yR, cbR,
          crR, poc, mo, l0Head)
        picId += 1
        while (dpb.size > 2)
          dpb -= dpb.minBy(_.poc) // anchors arrive in POC order
        nextFn = (fn + 1) % 16
      }
      reconByDisplay(disp) = planesToRgb(wMbs, hMbs, cropR, cropB2,
        yR, cbR, crR)
    }
    (out.toByteArray, reconByDisplay.toSeq)
  }

  /**
   * Encode frames with CABAC entropy coding (§9.3) — the High-profile
   * entropy layer real-world files dominantly use. The PPS signals
   * `entropy_coding_mode_flag=1`; each slice header is followed by
   * cabac_alignment_one_bits, the context-adaptive arithmetic-coded
   * macroblock layer, and the engine flush whose final 1 is the rbsp
   * stop bit. Analysis/reconstruction is [[H264Mb.analyzeMb]] — the
   * SAME deterministic mode cycle as [[encodeCavlc]], so for equal
   * inputs the two entropy coders reconstruct IDENTICAL pixels
   * (CabacSpec pins this cross-coder equality, plus
   * `decodeFrames(bytes) == recon` bit-exactness).
   */
  def encodeCabac(width: Int, height: Int, frames: Seq[Array[Int]],
                  qp: Int = 26, mbRowsPerSlice: Int = 0,
                  deblock: Boolean = false, qpAmp: Int = 0,
                  pcmEvery: Int = 0,
                  scalingMatrix: Boolean = false,
                  chromaQpOffsetCr: Int = 0)
      : (Array[Byte], Seq[(Int, Int, Array[Int])]) = {
    require(frames.nonEmpty)
    require(frames.forall(_.length == width * height))
    require(qp >= 0 && qp <= 51, s"qp $qp out of [0, 51]")
    require(width % 2 == 0 && height % 2 == 0,
      "odd display dims need crop in 1-px units (unsupported)")
    val wMbs = (width + 15) / 16
    val hMbs = (height + 15) / 16
    val cropR = (wMbs * 16 - width) / 2
    val cropB = (hMbs * 16 - height) / 2
    val rows = if (mbRowsPerSlice <= 0) hMbs else mbRowsPerSlice
    val sm =
      if (!scalingMatrix) ScalingMatrices.Flat
      else defaultSm
    val out = new java.io.ByteArrayOutputStream()
    val spsNal = nal(3, 7, spsRbsp(wMbs, hMbs, cropR, cropB,
      high = scalingMatrix, seqScalingDefault = scalingMatrix))
    val ppsNal = nal(3, 8,
      ppsRbsp(deblockingControl = true, cabac = true,
        chromaQpOffsetCr = chromaQpOffsetCr))
    out.write(spsNal, 0, spsNal.length)
    out.write(ppsNal, 0, ppsNal.length)
    val recon = frames.zipWithIndex.map { case (rgb, f) =>
      val (srcY, srcCb, srcCr) = rgbToPlanes(width, height, wMbs,
        hMbs, rgb)
      val yR = new Array[Byte](wMbs * 16 * hMbs * 16)
      val cbR = new Array[Byte](wMbs * 8 * hMbs * 8)
      val crR = new Array[Byte](wMbs * 8 * hMbs * 8)
      val ctx = new H264Mb.PicCtx(wMbs, hMbs)
      val mbQps = Array.fill(wMbs * hMbs)(qp)
      var row = 0
      var sliceId = 0
      while (row < hMbs) {
        val firstMb = row * wMbs
        val endMb = math.min(hMbs, row + rows) * wMbs
        val w = new BitWriter()
        w.ue(firstMb) // first_mb_in_slice
        w.ue(7)  // slice_type: I
        w.ue(0)  // pic_parameter_set_id
        w.u(0, 4) // frame_num
        w.ue(f & 1) // idr_pic_id
        w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking (IDR)
        w.se(qp - 26) // slice_qp_delta vs pic_init_qp 26
        if (deblock) { w.ue(0); w.se(0); w.se(0) } // filter on
        else w.ue(1) // disable_deblocking_filter_idc = 1
        while (!w.byteAligned) w.u(1, 1) // cabac_alignment_one_bit*
        H264Cabac.encodeSliceData(w, ctx, sliceId, sliceQp = qp,
          chromaQpOffset = 0, srcY, srcCb, srcCr, yR, cbR, crR,
          firstMb, endMb, qpAmp, mbQps, pcmEvery, sm,
          chromaQpOffsetCr)
        w.alignZero() // flush's final 1 was the rbsp stop bit
        val sliceNal = nal(3, 5, w.toBytes)
        out.write(sliceNal, 0, sliceNal.length)
        row += rows
        sliceId += 1
      }
      if (deblock) deblockRecon(ctx, mbQps, yR, cbR, crR,
        chromaQpOffsetCr)
      planesToRgb(wMbs, hMbs, cropR, cropB, yR, cbR, crR)
    }
    (out.toByteArray, recon)
  }

  /** Conformant all-skip P-slice RBSP — the filler picture between
    * IDRs in mixed-stream fixtures. CAVLC P slice data is one
    * `mb_skip_run` covering every macroblock (§7.3.4): a "repeat the
    * reference" picture a conformant decoder reconstructs as the
    * preceding IDR, and exactly what [[decodeFrames]] skips at the
    * header. Non-reference (nal_ref_idc 0), so dec_ref_pic_marking
    * is absent and frame_num stays PrevRefFrameNum+1 = 1 (§7.4.3). */
  private def pFillerRbsp(totalMbs: Int): Array[Byte] = {
    val w = new BitWriter()
    w.ue(0)        // first_mb_in_slice
    w.ue(5)        // slice_type: P (all slices in picture are P)
    w.ue(1)        // pic_parameter_set_id → the CAVLC filler PPS
    w.u(1, 4)      // frame_num (log2MaxFrameNum = 4)
    // pic_order_cnt_type 2 → no POC syntax
    w.u(0, 1)      // num_ref_idx_active_override_flag
    w.u(0, 1)      // ref_pic_list_modification_flag_l0 (§7.3.3.1)
    w.se(0)        // slice_qp_delta (PPS 1: no deblock control syntax)
    w.ue(totalMbs) // mb_skip_run: every MB is P_Skip
    w.trailingBits()
    w.toBytes
  }

  /**
   * Turn an all-IDR fixture stream (any of [[encode]]/[[encodeCavlc]]/
   * [[encodeCabac]]'s outputs) into the real-world MIXED shape: after
   * each IDR picture, `perGap` skippable P filler pictures. The SPS is
   * re-emitted with max_num_ref_frames=1 (P pictures reference the
   * IDR) and a second, CAVLC PPS (id 1) carries the filler slices —
   * pictures may reference different PPSs, so this composes with
   * CABAC base streams without needing P-context CABAC tables. The
   * result is spec-valid end to end; [[decodeFrames]] returns exactly
   * the IDR pictures of the base stream.
   */
  def insertInterFiller(annexB: Array[Byte],
                        perGap: Int = 2): Array[Byte] = {
    require(perGap >= 1, s"perGap $perGap")
    val nals = nalUnits(annexB)
    val spsNal = nals.find(n => (n(0) & 0x1F) == 7)
      .getOrElse(throw new IllegalArgumentException("no SPS"))
    val s = parseSps(ebspToRbsp(spsNal, 1))
    require(s.pocType == 2 && s.log2MaxFrameNum == 4 &&
      s.cropL == 0 && s.cropT == 0,
      "insertInterFiller expects this module's own fixture SPS shape")
    val high = highProfiles.contains(s.profileIdc)
    val hasSm = s.sm.isDefined
    require(!hasSm || (s.sm.get.w4(0).toSeq == defaultSm.w4(0).toSeq &&
        s.sm.get.w8(0).toSeq == defaultSm.w8(0).toSeq),
      "insertInterFiller regenerates the SPS and supports only the " +
        "fixture default scaling matrices")
    nals.filter(n => (n(0) & 0x1F) == 8).foreach { p =>
      require(parsePps(ebspToRbsp(p, 1)).id != 1,
        "PPS id 1 is reserved for the filler slices")
    }
    val filler = nal(0, 1, pFillerRbsp(s.widthMbs * s.heightMbs))
    val fillerPps = nal(3, 8,
      ppsRbsp(deblockingControl = false, cabac = false, id = 1))
    val newSps = nal(3, 7, spsRbsp(s.widthMbs, s.heightMbs, s.cropR,
      s.cropB, maxRefFrames = 1, high = high,
      seqScalingDefault = hasSm))
    val out = new java.io.ByteArrayOutputStream()
    // nal()-built units carry their own start code; nalUnits()
    // payloads do not — re-prefix those on pass-through
    def emit(n: Array[Byte]): Unit = out.write(n, 0, n.length)
    def raw(n: Array[Byte]): Unit = {
      out.write(Array[Byte](0, 0, 0, 1), 0, 4)
      out.write(n, 0, n.length)
    }
    var sawPps = false
    var inPicture = false
    def gap(): Unit =
      if (inPicture) { (0 until perGap).foreach(_ => emit(filler)) }
    nals.foreach { n =>
      (n(0) & 0x1F) match {
        case 7 => emit(newSps)
        case 8 =>
          raw(n)
          if (!sawPps) { emit(fillerPps); sawPps = true }
        case 1 | 5 =>
          val firstMb = new BitReader(ebspToRbsp(n, 1)).ue()
          if (firstMb == 0) { gap(); inPicture = true }
          raw(n)
        case _ => raw(n)
      }
    }
    gap() // trailing P tail after the last IDR
    out.toByteArray
  }

  /** True when the payload leads with an Annex-B start code (possibly
    * after leading zero padding) — the container sniff behind
    * [[FrameDecoder.Auto]]. */
  def looksLikeAnnexB(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < math.min(bytes.length - 2, 16)) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1)
        return true
      if (bytes(i) != 0) return false
      i += 1
    }
    false
  }

  /** Decoded frames as PNG payloads — the [[FrameDecoder]] contract
    * (any ImageIO-decodable per-frame encoding). */
  def framesAsPng(bytes: Array[Byte]): Seq[Array[Byte]] =
    decodeFrames(bytes).map { case (w, h, px) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, w, h, px, 0, w)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
}
