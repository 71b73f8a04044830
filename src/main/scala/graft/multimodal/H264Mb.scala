package graft.multimodal

import H264.{BitReader, BitWriter}

/**
 * Macroblock layer for CAVLC I slices (§7.3.5, §7.4.5): mb_type
 * dispatch (I_NxN / I_16x16 / I_PCM), prediction-mode signaling,
 * coded_block_pattern, per-MB QP tracking, the §9.2.1 nC context
 * bookkeeping across macroblocks, and full reconstruction through
 * [[Intra]] + [[Transform]]. The encoder half emits the same syntax
 * and reconstructs through the IDENTICAL dequant/inverse path a
 * decoder must implement, so `decode(encode(x)).pixels ==
 * encoderRecon(x).pixels` bit-exactly — the contract H264Spec pins.
 */
private[graft] object H264Mb {

  /** z-order 4x4 luma block scan (§6.4.3): blkIdx → (x, y) in 4x4
    * units, and back. Left/up neighbors always have a smaller z. */
  val zx: Array[Int] = Array(0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3)
  val zy: Array[Int] = Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)
  private def zIdx(bx: Int, by: Int): Int =
    (by & 2) * 4 + (bx & 2) * 2 + (by & 1) * 2 + (bx & 1)

  /** Table 9-4 (intra column): codeNum → coded_block_pattern. */
  val intraCbpFromCode: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  val intraCodeFromCbp: Array[Int] = {
    val inv = new Array[Int](48)
    intraCbpFromCode.zipWithIndex.foreach { case (cbp, code) =>
      inv(cbp) = code
    }
    inv
  }

  /** Per-picture decode/encode context: slice ownership plus the nC
    * and Intra4x4-mode neighbor state (§9.2.1, §8.3.1.1). The last
    * five arrays are the CABAC neighbor contexts (§9.3.3.1.1.4/.8/.9
    * — cbp bits, chroma pred mode, and the I_16x16/chroma DC
    * coded_block_flags; AC-block flags reuse the nz arrays: a CABAC
    * coded_block_flag of 1 guarantees ≥1 nonzero, so nz>0 ≡ cbf). */
  final class PicCtx(val wMbs: Int, val hMbs: Int) {
    val sliceId: Array[Int] = Array.fill(wMbs * hMbs)(-1)
    val isIpcm: Array[Boolean] = new Array[Boolean](wMbs * hMbs)
    val lumaNz: Array[Array[Int]] =
      Array.fill(wMbs * hMbs)(new Array[Int](16))
    val cbNz: Array[Array[Int]] =
      Array.fill(wMbs * hMbs)(new Array[Int](4))
    val crNz: Array[Array[Int]] =
      Array.fill(wMbs * hMbs)(new Array[Int](4))
    /** Intra4x4PredMode per block; -1 when the MB is not I_4x4. */
    val i4Modes: Array[Array[Int]] =
      Array.fill(wMbs * hMbs)(Array.fill(16)(-1))
    val cbpLumaArr: Array[Int] = new Array[Int](wMbs * hMbs)
    val cbpChromaArr: Array[Int] = new Array[Int](wMbs * hMbs)
    val chromaModeArr: Array[Int] = new Array[Int](wMbs * hMbs)
    val lumaDcCbf: Array[Boolean] = new Array[Boolean](wMbs * hMbs)
    val cbDcCbf: Array[Boolean] = new Array[Boolean](wMbs * hMbs)
    val crDcCbf: Array[Boolean] = new Array[Boolean](wMbs * hMbs)
    /** transform_size_8x8_flag per MB (High profile §7.3.5): drives
      * the deblocking filter's luma edge grid (8x8-transform MBs
      * filter only 8x8-aligned internal edges, §8.7). */
    val is8x8: Array[Boolean] = new Array[Boolean](wMbs * hMbs)
  }

  /** Availability of the MB at (mx, my) as a neighbor of a MB in
    * `sliceId` (§6.4.11.4: in picture, decoded, same slice). */
  private[multimodal] def mbAvail(ctx: PicCtx, mx: Int, my: Int,
                      sliceId: Int): Boolean =
    mx >= 0 && my >= 0 && mx < ctx.wMbs && my < ctx.hMbs &&
      ctx.sliceId(my * ctx.wMbs + mx) == sliceId

  /** nC contribution of the luma 4x4 block at GLOBAL block coords
    * (gbx, gby); -1 when unavailable. `curMb`/`curZ` let in-MB
    * neighbors resolve during this MB's own parse. */
  private def lumaNzAt(ctx: PicCtx, gbx: Int, gby: Int, sliceId: Int,
                       curMb: Int, curZ: Int): Int = {
    if (gbx < 0 || gby < 0 || gbx >= ctx.wMbs * 4 ||
        gby >= ctx.hMbs * 4) return -1
    val m = (gby >> 2) * ctx.wMbs + (gbx >> 2)
    val z = zIdx(gbx & 3, gby & 3)
    if (m == curMb) {
      if (z < curZ) ctx.lumaNz(m)(z) else -1
    } else if (ctx.sliceId(m) == sliceId) {
      if (ctx.isIpcm(m)) 16 else ctx.lumaNz(m)(z)
    } else -1
  }

  /** §9.2.1 nC for the luma 4x4 block (bx, by) of MB (mbX, mbY). */
  private def lumaNC(ctx: PicCtx, mbX: Int, mbY: Int, bx: Int, by: Int,
             sliceId: Int): Int = {
    val curMb = mbY * ctx.wMbs + mbX
    val curZ = zIdx(bx, by)
    val nA = lumaNzAt(ctx, mbX * 4 + bx - 1, mbY * 4 + by, sliceId,
      curMb, curZ)
    val nB = lumaNzAt(ctx, mbX * 4 + bx, mbY * 4 + by - 1, sliceId,
      curMb, curZ)
    if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
    else if (nA >= 0) nA
    else if (nB >= 0) nB
    else 0
  }

  private def chromaNzAt(nz: Array[Array[Int]], ctx: PicCtx,
                         gbx: Int, gby: Int, sliceId: Int,
                         curMb: Int, curBlk: Int): Int = {
    if (gbx < 0 || gby < 0 || gbx >= ctx.wMbs * 2 ||
        gby >= ctx.hMbs * 2) return -1
    val m = (gby >> 1) * ctx.wMbs + (gbx >> 1)
    val b = (gby & 1) * 2 + (gbx & 1) // chroma blocks scan in raster
    if (m == curMb) {
      if (b < curBlk) nz(m)(b) else -1
    } else if (ctx.sliceId(m) == sliceId) {
      if (ctx.isIpcm(m)) 16 else nz(m)(b)
    } else -1
  }

  /** Package accessors for the §9.2.1 nC rules, so the inter module
    * ([[H264Inter]]) shares ONE neighbor implementation. */
  private[multimodal] def lumaNCFor(ctx: PicCtx, mbX: Int, mbY: Int,
                                    bx: Int, by: Int,
                                    sliceId: Int): Int =
    lumaNC(ctx, mbX, mbY, bx, by, sliceId)
  private[multimodal] def chromaNCFor(nz: Array[Array[Int]],
                                      ctx: PicCtx, mbX: Int, mbY: Int,
                                      blk: Int, sliceId: Int): Int =
    chromaNC(nz, ctx, mbX, mbY, blk, sliceId)

  /** §9.2.1 nC for chroma AC block `blk` (raster 0..3) of a MB. */
  private def chromaNC(nz: Array[Array[Int]], ctx: PicCtx, mbX: Int, mbY: Int,
               blk: Int, sliceId: Int): Int = {
    val curMb = mbY * ctx.wMbs + mbX
    val bx = blk & 1; val by = blk >> 1
    val nA = chromaNzAt(nz, ctx, mbX * 2 + bx - 1, mbY * 2 + by,
      sliceId, curMb, blk)
    val nB = chromaNzAt(nz, ctx, mbX * 2 + bx, mbY * 2 + by - 1,
      sliceId, curMb, blk)
    if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
    else if (nA >= 0) nA
    else if (nB >= 0) nB
    else 0
  }

  /** The Intra4x4 mode of the 4x4 block at GLOBAL block coords, as a
    * prediction neighbor: 2 (DC) when out of picture, in another
    * slice, or in a non-I4x4 MB (§8.3.1.1). */
  private def neighborI4Mode(ctx: PicCtx, curMb: Int,
                             curModes: Array[Int], sliceId: Int,
                             gbx: Int, gby: Int): Int = {
    if (gbx < 0 || gby < 0) return 2
    val m = (gby >> 2) * ctx.wMbs + (gbx >> 2)
    val z = zIdx(gbx & 3, gby & 3)
    if (m == curMb) {
      val v = curModes(z) // z-order: left/up in-MB already assigned
      if (v >= 0) v else 2
    } else if (ctx.sliceId(m) == sliceId) {
      val v = ctx.i4Modes(m)(z)
      if (v >= 0) v else 2 // I16x16 / I_PCM neighbor → DC
    } else 2
  }

  /** §8.3.1.1 predicted Intra4x4 mode for block (bx, by): min of the
    * left/up blocks' modes; unavailable or non-I4x4 neighbor → 2. */
  private[multimodal] def predIntra4x4Mode(ctx: PicCtx, mbX: Int, mbY: Int, bx: Int,
                       by: Int, sliceId: Int,
                       curModes: Array[Int]): Int = {
    val curMb = mbY * ctx.wMbs + mbX
    math.min(
      neighborI4Mode(ctx, curMb, curModes, sliceId,
        mbX * 4 + bx - 1, mbY * 4 + by),
      neighborI4Mode(ctx, curMb, curModes, sliceId,
        mbX * 4 + bx, mbY * 4 + by - 1))
  }

  /** Sample-level availability of the 4x4 block at global BLOCK
    * coords — used for intra prediction neighbor samples. Within the
    * current MB, earlier-in-z blocks are reconstructed and available. */
  private def blkSamplesAvail(ctx: PicCtx, gbx: Int, gby: Int,
                              sliceId: Int, curMb: Int,
                              curZ: Int): Boolean = {
    if (gbx < 0 || gby < 0 || gbx >= ctx.wMbs * 4 ||
        gby >= ctx.hMbs * 4) return false
    val m = (gby >> 2) * ctx.wMbs + (gbx >> 2)
    if (m == curMb) zIdx(gbx & 3, gby & 3) < curZ
    else ctx.sliceId(m) == sliceId
  }

  @inline private def clipB(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Carrier for one parsed+reconstructed MB's syntax, so encode and
    * decode can share the write/parse ordering exactly. */
  private[multimodal] final case class MbCoeffs(
      lumaDc: Array[Int], // 16, scan order (I_16x16 only)
      lumaAc: Array[Array[Int]], // per z-blk; 15 or 16 coeffs scan
      cbDc: Array[Int], crDc: Array[Int], // 4, scan order
      cbAc: Array[Array[Int]], crAc: Array[Array[Int]]) // raster blks

  // ---------------------------------------------------------------
  // decode
  // ---------------------------------------------------------------

  /**
   * Decode one non-I_PCM intra MB (mb_type already read): parses
   * prediction + CBP + mb_qp_delta + CAVLC residuals, reconstructs
   * into the planes, updates `ctx`. Returns the new luma QP.
   */
  def decodeMb(r: BitReader, mbType: Int, ctx: PicCtx, mbIdx: Int,
               sliceId: Int, qpYPrev: Int, chromaQpOffset: Int,
               yP: Array[Byte], cbP: Array[Byte],
               crP: Array[Byte],
               transform8x8Allowed: Boolean = false,
               sm: ScalingMatrices = ScalingMatrices.Flat,
               chromaQpOffsetCr: Int = Int.MinValue): Int = {
    // second_chroma_qp_index_offset (§7.4.2.2): Cr gets its own QP
    // offset when the PPS tail carries one; sentinel = same as Cb
    val offCr =
      if (chromaQpOffsetCr == Int.MinValue) chromaQpOffset
      else chromaQpOffsetCr
    require(mbType >= 0 && mbType <= 24,
      s"mb_type $mbType is not an intra CAVLC type")
    val mbX = mbIdx % ctx.wMbs
    val mbY = mbIdx / ctx.wMbs
    val is4x4 = mbType == 0
    ctx.sliceId(mbIdx) = sliceId // neighbors resolve during parse

    // --- transform_size_8x8_flag (§7.3.5, I_NxN only) ---
    val use8 = is4x4 && transform8x8Allowed && r.u(1) == 1
    ctx.is8x8(mbIdx) = use8

    // --- mb_pred ---
    val modes = Array.fill(16)(-1)
    if (is4x4 && use8) {
      // 4 Intra8x8PredModes, each replicated into its four 4x4 slots
      // so every neighbor rule (§8.3.2.1 via the 4x4 mode array)
      // reads the covering 8x8 block's mode
      var b = 0
      while (b < 4) {
        val bx = (b & 1) * 2; val by = (b >> 1) * 2
        val pred = predIntra4x4Mode(ctx, mbX, mbY, bx, by,
          sliceId, modes)
        val m =
          if (r.u(1) == 1) pred
          else { val rem = r.u(3); if (rem < pred) rem else rem + 1 }
        var k = 0
        while (k < 4) {
          modes(zIdx(bx + (k & 1), by + (k >> 1))) = m; k += 1
        }
        b += 1
      }
      ctx.i4Modes(mbIdx) = modes
    } else if (is4x4) {
      var z = 0
      while (z < 16) {
        val pred = predIntra4x4Mode(ctx, mbX, mbY, zx(z), zy(z),
          sliceId, modes)
        modes(z) =
          if (r.u(1) == 1) pred
          else { val rem = r.u(3); if (rem < pred) rem else rem + 1 }
        z += 1
      }
      ctx.i4Modes(mbIdx) = modes
    }
    val chromaMode = r.ue()
    require(chromaMode <= 3, s"intra_chroma_pred_mode $chromaMode")

    // --- CBP + QP ---
    val (cbpLuma, cbpChroma, pred16Mode) =
      if (is4x4) {
        val code = r.ue()
        require(code < 48, s"cbp codeNum $code out of range")
        val cbp = intraCbpFromCode(code)
        (cbp & 15, cbp >> 4, -1)
      } else {
        val m1 = mbType - 1
        (if (m1 >= 12) 15 else 0, (m1 / 4) % 3, m1 % 4)
      }
    var qpY = qpYPrev
    if (!is4x4 || cbpLuma != 0 || cbpChroma != 0) {
      val delta = r.se()
      require(delta >= -26 && delta <= 25, s"mb_qp_delta $delta")
      qpY = (qpY + delta + 52) % 52
    }
    val qpC = Transform.chromaQp(qpY, chromaQpOffset)
    val qpCr = Transform.chromaQp(qpY, offCr)

    // --- residual parse (§7.3.5.3), recording nz context as we go ---
    val lumaDc = new Array[Int](16)
    if (!is4x4) {
      val nC = lumaNC(ctx, mbX, mbY, 0, 0, sliceId)
      val (c, _) = Cavlc.readResidualBlock(r, nC, 16)
      System.arraycopy(c, 0, lumaDc, 0, 16)
    }
    val lumaAc = new Array[Array[Int]](16)
    var z = 0
    while (z < 16) {
      val grp = z >> 2
      if ((cbpLuma & (1 << grp)) != 0) {
        val nC = lumaNC(ctx, mbX, mbY, zx(z), zy(z), sliceId)
        val n = if (is4x4) 16 else 15
        val (c, tc) = Cavlc.readResidualBlock(r, nC, n)
        lumaAc(z) = c
        ctx.lumaNz(mbIdx)(z) = tc
      } else {
        lumaAc(z) = new Array[Int](if (is4x4) 16 else 15)
        ctx.lumaNz(mbIdx)(z) = 0
      }
      z += 1
    }
    val cbDc = new Array[Int](4); val crDc = new Array[Int](4)
    if (cbpChroma != 0) {
      System.arraycopy(Cavlc.readResidualBlock(r, -1, 4)._1, 0, cbDc, 0, 4)
      System.arraycopy(Cavlc.readResidualBlock(r, -1, 4)._1, 0, crDc, 0, 4)
    }
    val cbAc = Array.fill(4)(new Array[Int](15))
    val crAc = Array.fill(4)(new Array[Int](15))
    if (cbpChroma == 2) {
      var b = 0
      while (b < 4) {
        val nC = chromaNC(ctx.cbNz, ctx, mbX, mbY, b, sliceId)
        val (c, tc) = Cavlc.readResidualBlock(r, nC, 15)
        cbAc(b) = c; ctx.cbNz(mbIdx)(b) = tc
        b += 1
      }
      b = 0
      while (b < 4) {
        val nC = chromaNC(ctx.crNz, ctx, mbX, mbY, b, sliceId)
        val (c, tc) = Cavlc.readResidualBlock(r, nC, 15)
        crAc(b) = c; ctx.crNz(mbIdx)(b) = tc
        b += 1
      }
    }

    reconstruct(ctx, mbIdx, sliceId, qpY, qpC, is4x4, modes,
      pred16Mode, chromaMode, cbpChroma,
      MbCoeffs(lumaDc, lumaAc, cbDc, crDc, cbAc, crAc), yP, cbP, crP,
      use8 = use8, sm = sm, qpCr = qpCr)
    qpY
  }

  // ---------------------------------------------------------------
  // shared reconstruction (the decoder path; the encoder calls it too)
  // ---------------------------------------------------------------

  private[multimodal] def reconstruct(ctx: PicCtx, mbIdx: Int, sliceId: Int,
                          qpY: Int, qpC: Int, is4x4: Boolean,
                          modes: Array[Int], pred16Mode: Int,
                          chromaMode: Int, cbpChroma: Int,
                          co: MbCoeffs, yP: Array[Byte],
                          cbP: Array[Byte], crP: Array[Byte],
                          use8: Boolean = false,
                          sm: ScalingMatrices = ScalingMatrices.Flat,
                          qpCr: Int = Int.MinValue)
      : Unit = {
    val mbX = mbIdx % ctx.wMbs
    val mbY = mbIdx / ctx.wMbs
    val lw = ctx.wMbs * 16
    val cw = ctx.wMbs * 8
    val x0 = mbX * 16; val y0 = mbY * 16
    val availLeftMb = mbAvail(ctx, mbX - 1, mbY, sliceId)
    val availUpMb = mbAvail(ctx, mbX, mbY - 1, sliceId)
    val availUpLeftMb = mbAvail(ctx, mbX - 1, mbY - 1, sliceId)
    val pred = new Array[Int](256)

    if (is4x4 && use8) {
      // §8.3.2 + §8.5.13: per 8x8 block — predict (filtered refs),
      // de-interleave the four CAVLC 4x4 parts back into the 64-coeff
      // scan (coeff64[4·i + k] = part_k[i], §7.4.5.3.3), dequant8,
      // inverse 8x8 transform, add
      val p8 = new Array[Int](64)
      var b = 0
      while (b < 4) {
        val bx = (b & 1) * 2; val by = (b >> 1) * 2
        val gbx = mbX * 4 + bx; val gby = mbY * 4 + by
        val zTL = zIdx(bx, by)
        val aL = blkSamplesAvail(ctx, gbx - 1, gby, sliceId, mbIdx, zTL)
        val aU = blkSamplesAvail(ctx, gbx, gby - 1, sliceId, mbIdx, zTL)
        val aUL = blkSamplesAvail(ctx, gbx - 1, gby - 1, sliceId,
          mbIdx, zTL)
        val aUR = blkSamplesAvail(ctx, gbx + 2, gby - 1, sliceId,
          mbIdx, zTL)
        Intra.predict8x8(yP, lw, x0 + bx * 4, y0 + by * 4,
          modes(zTL), aL, aU, aUL, aUR, p8)
        val d = new Array[Int](64)
        var s = 0
        while (s < 64) {
          val cval = co.lumaAc(b * 4 + (s & 3))(s >> 2)
          val raster = Transform.zigzag8x8(s)
          d(raster) = Transform.dequant8(cval, qpY, raster, sm.w8(0)(raster))
          s += 1
        }
        val res = Transform.inverse8x8(d)
        var i = 0
        while (i < 64) {
          val px = x0 + bx * 4 + (i & 7); val py = y0 + by * 4 + (i >> 3)
          yP(py * lw + px) = clipB(p8(i) + res(i))
          i += 1
        }
        b += 1
      }
    } else if (is4x4) {
      var z = 0
      val p4 = new Array[Int](16)
      while (z < 16) {
        val bx = zx(z); val by = zy(z)
        val gbx = mbX * 4 + bx; val gby = mbY * 4 + by
        val aL = blkSamplesAvail(ctx, gbx - 1, gby, sliceId, mbIdx, z)
        val aU = blkSamplesAvail(ctx, gbx, gby - 1, sliceId, mbIdx, z)
        val aUL = blkSamplesAvail(ctx, gbx - 1, gby - 1, sliceId, mbIdx, z)
        val aUR = blkSamplesAvail(ctx, gbx + 1, gby - 1, sliceId, mbIdx, z)
        Intra.predict4x4(yP, lw, x0 + bx * 4, y0 + by * 4, modes(z),
          aL, aU, aUL, aUR, p4)
        // dequant + inverse transform (all 16 coeffs standalone)
        val d = new Array[Int](16)
        var k = 0
        while (k < 16) {
          val raster = Transform.zigzag4x4(k)
          d(raster) = Transform.dequant(co.lumaAc(z)(k), qpY, raster,
            sm.w4(0)(raster))
          k += 1
        }
        val res = Transform.inverse4x4(d)
        var i = 0
        while (i < 16) {
          val px = x0 + bx * 4 + (i & 3); val py = y0 + by * 4 + (i >> 2)
          yP(py * lw + px) = clipB(p4(i) + res(i))
          i += 1
        }
        z += 1
      }
    } else {
      Intra.predict16x16(yP, lw, x0, y0, pred16Mode, availLeftMb,
        availUpMb, pred)
      // luma DC: scan → raster, inverse Hadamard, dequant (§8.5.10)
      val dcRaster = new Array[Int](16)
      var k = 0
      while (k < 16) {
        dcRaster(Transform.zigzag4x4(k)) = co.lumaDc(k); k += 1
      }
      val dcT = Transform.hadamard4x4(dcRaster)
        .map(Transform.dequantLumaDc(_, qpY, sm.w4(0)(0)))
      var z = 0
      while (z < 16) {
        val bx = zx(z); val by = zy(z)
        val d = new Array[Int](16)
        d(0) = dcT(by * 4 + bx)
        var j = 0
        while (j < 15) {
          val raster = Transform.zigzag4x4(j + 1)
          d(raster) = Transform.dequant(co.lumaAc(z)(j), qpY, raster,
            sm.w4(0)(raster))
          j += 1
        }
        val res = Transform.inverse4x4(d)
        var i = 0
        while (i < 16) {
          val lx = bx * 4 + (i & 3); val ly = by * 4 + (i >> 2)
          yP((y0 + ly) * lw + x0 + lx) =
            clipB(pred(ly * 16 + lx) + res(i))
          i += 1
        }
        z += 1
      }
    }

    // chroma — one shared path with the encoder's chroma-only recon
    reconChromaOnly(ctx, mbIdx, sliceId, qpC, chromaMode, cbpChroma,
      co, cbP, crP, availLeftMb, availUpMb, sm,
      if (qpCr == Int.MinValue) qpC else qpCr)
  }

  // ---------------------------------------------------------------
  // encode (fixture generator)
  // ---------------------------------------------------------------

  /** One analyzed+reconstructed MB, ready for syntax emission by
    * EITHER entropy coder — the analysis (mode choice, transforms,
    * quantization, reconstruction) is entropy-agnostic, and sharing
    * it keeps the CAVLC and CABAC fixtures pixel-identical. */
  private[multimodal] final case class MbPlan(
      is4x4: Boolean, modes: Array[Int], pred16Mode: Int,
      chromaMode: Int, cbpLuma: Int, cbpChroma: Int, co: MbCoeffs,
      use8: Boolean = false)

  /**
   * Analyze + reconstruct one MB for the fixture encoders: choose
   * the MB type and prediction modes (cycling deterministically over
   * the available choices so fixtures exercise I_4x4 AND I_16x16,
   * every 16x16/chroma mode, and a spread of 4x4 modes), transform +
   * quantize against the RECON planes (which double as the
   * prediction source, exactly like a decoder's frame buffer), and
   * reconstruct through the decoder path. Entropy-agnostic: the
   * caller emits the returned plan as CAVLC or CABAC syntax.
   */
  private[multimodal] def analyzeMb(ctx: PicCtx, mbIdx: Int,
                      sliceId: Int, qpY: Int, chromaQpOffset: Int,
                      srcY: Array[Int], srcCb: Array[Int],
                      srcCr: Array[Int], yP: Array[Byte],
                      cbP: Array[Byte], crP: Array[Byte],
                      transform8x8: Boolean = false,
                      sm: ScalingMatrices = ScalingMatrices.Flat,
                      chromaQpOffsetCr: Int = Int.MinValue)
      : MbPlan = {
    val offCr =
      if (chromaQpOffsetCr == Int.MinValue) chromaQpOffset
      else chromaQpOffsetCr
    val lw = ctx.wMbs * 16
    val cw = ctx.wMbs * 8
    locally {
      val mbX = mbIdx % ctx.wMbs
      val mbY = mbIdx / ctx.wMbs
      val x0 = mbX * 16; val y0 = mbY * 16
      ctx.sliceId(mbIdx) = sliceId
      val availLeftMb = mbAvail(ctx, mbX - 1, mbY, sliceId) &&
        mbX > 0 // same-slice left
      val availUpMb = mbAvail(ctx, mbX, mbY - 1, sliceId)
      val is4x4 = (mbX + mbY) % 3 == 0
      // deterministic 8x8/4x4 mix inside the I_NxN population, so
      // fixtures exercise BOTH transform sizes and their neighbor
      // interactions (mode prediction across sizes, nC across the
      // interleave split)
      val use8 = transform8x8 && is4x4 && (mbIdx % 2 == 0)
      ctx.is8x8(mbIdx) = use8
      val qpC = Transform.chromaQp(qpY, chromaQpOffset)
      val qpCr = Transform.chromaQp(qpY, offCr)

      val modes = Array.fill(16)(-1)
      val lumaAc = new Array[Array[Int]](16)
      val lumaDc = new Array[Int](16)
      var pred16Mode = -1

      if (use8) {
        // per 8x8 block: choose mode, predict (filtered refs),
        // forward 8x8 transform + quant, split into the four CAVLC
        // interleave parts, reconstruct immediately (later blocks
        // predict from it) — mirror of the 4x4 branch below
        val p8 = new Array[Int](64)
        var b = 0
        while (b < 4) {
          val bx = (b & 1) * 2; val by = (b >> 1) * 2
          val gbx = mbX * 4 + bx; val gby = mbY * 4 + by
          val zTL = zIdx(bx, by)
          val aL = blkSamplesAvail(ctx, gbx - 1, gby, sliceId, mbIdx, zTL)
          val aU = blkSamplesAvail(ctx, gbx, gby - 1, sliceId, mbIdx, zTL)
          val aUL = blkSamplesAvail(ctx, gbx - 1, gby - 1, sliceId,
            mbIdx, zTL)
          val aUR = blkSamplesAvail(ctx, gbx + 2, gby - 1, sliceId,
            mbIdx, zTL)
          def ok(m: Int): Boolean = m match {
            case 0 | 3 | 7 => aU
            case 1 | 8 => aL
            case 2 => true
            case _ => aL && aU && aUL
          }
          var m = (b + mbIdx) % 9
          while (!ok(m)) m = (m + 1) % 9
          var k = 0
          while (k < 4) {
            modes(zIdx(bx + (k & 1), by + (k >> 1))) = m; k += 1
          }
          Intra.predict8x8(yP, lw, x0 + bx * 4, y0 + by * 4, m,
            aL, aU, aUL, aUR, p8)
          val diff = new Array[Int](64)
          var i = 0
          while (i < 64) {
            diff(i) = (srcY((y0 + by * 4 + (i >> 3)) * lw +
              x0 + bx * 4 + (i & 7)) & 0xFF) - p8(i)
            i += 1
          }
          val wCoef = Transform.forward8x8(diff)
          val d = new Array[Int](64)
          var sp = 0
          while (sp < 64) {
            val raster = Transform.zigzag8x8(sp)
            val lvl = Transform.quant8(wCoef(raster), qpY, raster,
              sm.w8(0)(raster))
            if (lumaAc(b * 4 + (sp & 3)) == null)
              lumaAc(b * 4 + (sp & 3)) = new Array[Int](16)
            lumaAc(b * 4 + (sp & 3))(sp >> 2) = lvl
            d(raster) = Transform.dequant8(lvl, qpY, raster,
              sm.w8(0)(raster))
            sp += 1
          }
          val res = Transform.inverse8x8(d)
          i = 0
          while (i < 64) {
            yP((y0 + by * 4 + (i >> 3)) * lw + x0 + bx * 4 + (i & 7)) =
              clipB(p8(i) + res(i))
            i += 1
          }
          b += 1
        }
        ctx.i4Modes(mbIdx) = modes
      } else if (is4x4) {
        // per-block: choose mode, predict from RECON, transform+quant,
        // then reconstruct immediately (later blocks predict from it)
        val p4 = new Array[Int](16)
        var z = 0
        while (z < 16) {
          val bx = zx(z); val by = zy(z)
          val gbx = mbX * 4 + bx; val gby = mbY * 4 + by
          val aL = blkSamplesAvail(ctx, gbx - 1, gby, sliceId, mbIdx, z)
          val aU = blkSamplesAvail(ctx, gbx, gby - 1, sliceId, mbIdx, z)
          val aUL = blkSamplesAvail(ctx, gbx - 1, gby - 1, sliceId,
            mbIdx, z)
          val aUR = blkSamplesAvail(ctx, gbx + 1, gby - 1, sliceId,
            mbIdx, z)
          def ok(m: Int): Boolean = m match {
            case 0 | 3 | 7 => aU
            case 1 | 8 => aL
            case 2 => true
            case _ => aL && aU && aUL
          }
          var m = (z + mbIdx) % 9
          while (!ok(m)) m = (m + 1) % 9
          modes(z) = m
          Intra.predict4x4(yP, lw, x0 + bx * 4, y0 + by * 4, m,
            aL, aU, aUL, aUR, p4)
          val diff = new Array[Int](16)
          var i = 0
          while (i < 16) {
            diff(i) = (srcY((y0 + by * 4 + (i >> 2)) * lw +
              x0 + bx * 4 + (i & 3)) & 0xFF) - p4(i)
            i += 1
          }
          val wCoef = Transform.forward4x4(diff)
          val scan = new Array[Int](16)
          var k = 0
          while (k < 16) {
            val raster = Transform.zigzag4x4(k)
            scan(k) = Transform.quant(wCoef(raster), qpY, raster,
              sm.w4(0)(raster))
            k += 1
          }
          lumaAc(z) = scan
          // immediate recon (decoder path)
          val d = new Array[Int](16)
          k = 0
          while (k < 16) {
            val raster = Transform.zigzag4x4(k)
            d(raster) = Transform.dequant(scan(k), qpY, raster,
              sm.w4(0)(raster))
            k += 1
          }
          val res = Transform.inverse4x4(d)
          i = 0
          while (i < 16) {
            yP((y0 + by * 4 + (i >> 2)) * lw + x0 + bx * 4 + (i & 3)) =
              clipB(p4(i) + res(i))
            i += 1
          }
          z += 1
        }
        ctx.i4Modes(mbIdx) = modes
      } else {
        val okModes = Seq(2) ++
          (if (availUpMb) Seq(0) else Nil) ++
          (if (availLeftMb) Seq(1) else Nil) ++
          (if (availLeftMb && availUpMb) Seq(3) else Nil)
        pred16Mode = okModes((mbIdx / 2) % okModes.size)
        val pred = new Array[Int](256)
        Intra.predict16x16(yP, lw, x0, y0, pred16Mode, availLeftMb,
          availUpMb, pred)
        // forward transform per block; DC coeffs get the Hadamard
        val dcRaster = new Array[Int](16)
        val acScan = new Array[Array[Int]](16)
        var z = 0
        while (z < 16) {
          val bx = zx(z); val by = zy(z)
          val diff = new Array[Int](16)
          var i = 0
          while (i < 16) {
            diff(i) = (srcY((y0 + by * 4 + (i >> 2)) * lw +
              x0 + bx * 4 + (i & 3)) & 0xFF) - pred((by * 4 + (i >> 2)) * 16 + bx * 4 + (i & 3))
            i += 1
          }
          val wCoef = Transform.forward4x4(diff)
          dcRaster(by * 4 + bx) = wCoef(0)
          val scan = new Array[Int](15)
          var k = 0
          while (k < 15) {
            val raster = Transform.zigzag4x4(k + 1)
            scan(k) = Transform.quant(wCoef(raster), qpY, raster,
              sm.w4(0)(raster))
            k += 1
          }
          acScan(z) = scan
          z += 1
        }
        // DC: forward Hadamard with the reference >>1 then quantDc
        val had = Transform.hadamard4x4(dcRaster).map(v =>
          if (v >= 0) (v + 1) >> 1 else -((-v + 1) >> 1))
        var k = 0
        while (k < 16) {
          lumaDc(k) = Transform.quantDc(had(Transform.zigzag4x4(k)),
            qpY, sm.w4(0)(0))
          k += 1
        }
        System.arraycopy(acScan, 0, lumaAc, 0, 16)
      }

      // chroma: predict, transform, quant (shared by both MB types)
      val chromaOk = Seq(0) ++
        (if (availLeftMb) Seq(1) else Nil) ++
        (if (availUpMb) Seq(2) else Nil) ++
        (if (availLeftMb && availUpMb) Seq(3) else Nil)
      val chromaMode = chromaOk(mbIdx % chromaOk.size)
      val cx0 = mbX * 8; val cy0 = mbY * 8
      def chromaCoeffs(src: Array[Int], plane: Array[Byte],
                       wgt: Array[Int], qp: Int)
          : (Array[Int], Array[Array[Int]]) = {
        val predC = new Array[Int](64)
        Intra.predictChroma(plane, cw, cx0, cy0, chromaMode,
          availLeftMb, availUpMb, predC)
        val dcRaw = new Array[Int](4)
        val ac = new Array[Array[Int]](4)
        var b = 0
        while (b < 4) {
          val bx = b & 1; val by = b >> 1
          val diff = new Array[Int](16)
          var i = 0
          while (i < 16) {
            diff(i) = (src((cy0 + by * 4 + (i >> 2)) * cw +
              cx0 + bx * 4 + (i & 3)) & 0xFF) -
              predC((by * 4 + (i >> 2)) * 8 + bx * 4 + (i & 3))
            i += 1
          }
          val wCoef = Transform.forward4x4(diff)
          dcRaw(b) = wCoef(0)
          val scan = new Array[Int](15)
          var k = 0
          while (k < 15) {
            val raster = Transform.zigzag4x4(k + 1)
            scan(k) = Transform.quant(wCoef(raster), qp, raster,
              wgt(raster))
            k += 1
          }
          ac(b) = scan
          b += 1
        }
        val dcQ = Transform.hadamard2x2(dcRaw).map(
          Transform.quantDc(_, qp, wgt(0)))
        (dcQ, ac)
      }
      val (cbDc, cbAc) = chromaCoeffs(srcCb, cbP, sm.w4(1), qpC)
      val (crDc, crAc) = chromaCoeffs(srcCr, crP, sm.w4(2), qpCr)

      // CBP from the quantized coefficients
      var cbpLuma = 0
      if (is4x4) {
        var g = 0
        while (g < 4) {
          if ((0 until 4).exists(s => lumaAc(g * 4 + s).exists(_ != 0)))
            cbpLuma |= 1 << g
          g += 1
        }
      } else if (lumaAc.exists(_.exists(_ != 0))) cbpLuma = 15
      val anyChromaAc = cbAc.exists(_.exists(_ != 0)) ||
        crAc.exists(_.exists(_ != 0))
      val anyChromaDc = cbDc.exists(_ != 0) || crDc.exists(_ != 0)
      val cbpChroma =
        if (anyChromaAc) 2 else if (anyChromaDc) 1 else 0

      // reconstruct I_16x16 luma + chroma through the decoder path
      // (I_4x4 luma already reconstructed block-by-block above)
      val co = MbCoeffs(lumaDc, lumaAc, cbDc, crDc, cbAc, crAc)
      if (!is4x4) {
        reconstruct(ctx, mbIdx, sliceId, qpY, qpC, is4x4 = false,
          modes, pred16Mode, chromaMode, cbpChroma, co, yP, cbP, crP,
          sm = sm, qpCr = qpCr)
      } else {
        // chroma-only recon for the I_NxN MB (4x4 or 8x8 luma was
        // reconstructed block-by-block above)
        reconChromaOnly(ctx, mbIdx, sliceId, qpC, chromaMode,
          cbpChroma, co, cbP, crP, availLeftMb, availUpMb, sm, qpCr)
      }
      MbPlan(is4x4, modes, pred16Mode, chromaMode, cbpLuma,
        cbpChroma, co, use8)
    }
  }

  /**
   * Encode one frame's MBs as CAVLC slice data into `w` (see
   * [[analyzeMb]] for the shared analysis/reconstruction). Returns
   * nothing — the caller wraps `w` into a slice NAL.
   */
  /** Deterministic per-MB QP target for `qpAmp > 0` fixtures: a
    * triangle wave of amplitude qpAmp around the slice QP, clipped
    * to [0, 51] — exercises the mb_qp_delta decode path real
    * rate-controlled streams hit constantly. Shared by both entropy
    * coders so their pixels stay identical. */
  private[multimodal] def qpTarget(sliceQp: Int, qpAmp: Int,
                                   mbIdx: Int): Int = {
    if (qpAmp <= 0) return sliceQp
    val period = 2 * qpAmp
    val ph = mbIdx % period
    val wave = if (ph <= qpAmp) ph else period - ph
    math.max(0, math.min(51, sliceQp - qpAmp / 2 + wave))
  }

  def encodeSliceData(wr: BitWriter, ctx: PicCtx, sliceId: Int,
                      sliceQp: Int, chromaQpOffset: Int,
                      srcY: Array[Int], srcCb: Array[Int],
                      srcCr: Array[Int], yP: Array[Byte],
                      cbP: Array[Byte], crP: Array[Byte],
                      firstMb: Int = 0, endMb: Int = -1,
                      qpAmp: Int = 0,
                      mbQpOut: Array[Int] = null,
                      transform8x8: Boolean = false,
                      sm: ScalingMatrices = ScalingMatrices.Flat,
                      chromaQpOffsetCr: Int = Int.MinValue)
      : Unit = {
    val stop = if (endMb < 0) ctx.wMbs * ctx.hMbs else endMb
    var qpY = sliceQp
    var mbIdx = firstMb
    while (mbIdx < stop) {
      val mbX = mbIdx % ctx.wMbs
      val mbY = mbIdx / ctx.wMbs
      val target = qpTarget(sliceQp, qpAmp, mbIdx)
      val plan = analyzeMb(ctx, mbIdx, sliceId, target, chromaQpOffset,
        srcY, srcCb, srcCr, yP, cbP, crP, transform8x8, sm,
        chromaQpOffsetCr)
      qpY = emitIntraMb(wr, ctx, sliceId, mbIdx, plan, qpY, target,
        transform8x8)
      if (mbQpOut != null) mbQpOut(mbIdx) = qpY
      mbIdx += 1
    }
  }

  /**
   * Emit one analyzed intra MB's CAVLC syntax (mirror of decodeMb's
   * parse order), updating the nz context as it writes. Returns the
   * new running luma QP. `mbTypeOffset` shifts mb_type for intra MBs
   * inside P slices (+5, Table 7-13).
   */
  private[multimodal] def emitIntraMb(wr: BitWriter, ctx: PicCtx,
                                      sliceId: Int, mbIdx: Int,
                                      plan: MbPlan, qpYIn: Int,
                                      target: Int,
                                      transform8x8: Boolean,
                                      mbTypeOffset: Int = 0): Int = {
    import plan._
    val mbX = mbIdx % ctx.wMbs
    val mbY = mbIdx / ctx.wMbs
    var qpY = qpYIn
    val mbType =
      if (is4x4) 0
      else 1 + pred16Mode + 4 * cbpChroma +
        12 * (if (cbpLuma == 15) 1 else 0)
    wr.ue(mbType + mbTypeOffset)
    if (is4x4 && transform8x8) wr.u(if (use8) 1 else 0, 1)
    if (is4x4 && use8) {
      var b = 0
      while (b < 4) {
        val bx = (b & 1) * 2; val by = (b >> 1) * 2
        val z = zIdx(bx, by)
        val pm = predIntra4x4Mode(ctx, mbX, mbY, bx, by,
          sliceId, modes)
        if (modes(z) == pm) wr.u(1, 1)
        else {
          wr.u(0, 1)
          wr.u(if (modes(z) < pm) modes(z) else modes(z) - 1, 3)
        }
        b += 1
      }
    } else if (is4x4) {
      var z = 0
      while (z < 16) {
        val pm = predIntra4x4Mode(ctx, mbX, mbY, zx(z), zy(z),
          sliceId, modes)
        if (modes(z) == pm) wr.u(1, 1)
        else {
          wr.u(0, 1)
          wr.u(if (modes(z) < pm) modes(z) else modes(z) - 1, 3)
        }
        z += 1
      }
    }
    wr.ue(chromaMode)
    if (is4x4)
      wr.ue(intraCodeFromCbp(cbpLuma | (cbpChroma << 4)))
    // mb_qp_delta: present for I16x16 or any coded residual; an
    // MB without the slot carries no coefficients, so QP is moot
    // there and the running qpY simply persists (decoder rule)
    if (!is4x4 || cbpLuma != 0 || cbpChroma != 0) {
      val delta = target - qpY
      wr.se(delta)
      qpY = target
    }
    // residuals, with the same nz bookkeeping order as decode
    if (!is4x4) {
      val nC = lumaNC(ctx, mbX, mbY, 0, 0, sliceId)
      Cavlc.writeResidualBlock(wr, co.lumaDc, nC)
    }
    var z = 0
    while (z < 16) {
      val grp = z >> 2
      if ((cbpLuma & (1 << grp)) != 0) {
        val nC = lumaNC(ctx, mbX, mbY, zx(z), zy(z), sliceId)
        ctx.lumaNz(mbIdx)(z) =
          Cavlc.writeResidualBlock(wr, co.lumaAc(z), nC)
      } else ctx.lumaNz(mbIdx)(z) = 0
      z += 1
    }
    if (cbpChroma != 0) {
      Cavlc.writeResidualBlock(wr, co.cbDc, -1)
      Cavlc.writeResidualBlock(wr, co.crDc, -1)
    }
    if (cbpChroma == 2) {
      var b = 0
      while (b < 4) {
        val nC = chromaNC(ctx.cbNz, ctx, mbX, mbY, b, sliceId)
        ctx.cbNz(mbIdx)(b) =
          Cavlc.writeResidualBlock(wr, co.cbAc(b), nC)
        b += 1
      }
      b = 0
      while (b < 4) {
        val nC = chromaNC(ctx.crNz, ctx, mbX, mbY, b, sliceId)
        ctx.crNz(mbIdx)(b) =
          Cavlc.writeResidualBlock(wr, co.crAc(b), nC)
        b += 1
      }
    } else {
      var b = 0
      while (b < 4) {
        ctx.cbNz(mbIdx)(b) = 0; ctx.crNz(mbIdx)(b) = 0; b += 1
      }
    }
    qpY
  }

  private def reconChromaOnly(ctx: PicCtx, mbIdx: Int, sliceId: Int,
                              qpC: Int, chromaMode: Int,
                              cbpChroma: Int, co: MbCoeffs,
                              cbP: Array[Byte], crP: Array[Byte],
                              availLeftMb: Boolean,
                              availUpMb: Boolean,
                              sm: ScalingMatrices = ScalingMatrices.Flat,
                              qpCrIn: Int = Int.MinValue)
      : Unit = {
    val qpCr = if (qpCrIn == Int.MinValue) qpC else qpCrIn
    val mbX = mbIdx % ctx.wMbs
    val mbY = mbIdx / ctx.wMbs
    val cw = ctx.wMbs * 8
    val cx0 = mbX * 8; val cy0 = mbY * 8
    val predC = new Array[Int](64)
    def go(plane: Array[Byte], dcScan: Array[Int],
           ac: Array[Array[Int]], w: Array[Int], qp: Int): Unit = {
      Intra.predictChroma(plane, cw, cx0, cy0, chromaMode,
        availLeftMb, availUpMb, predC)
      val dc =
        if (cbpChroma != 0)
          Transform.chromaDcTransformDequant(dcScan, qp, w(0))
        else Array(0, 0, 0, 0)
      var b = 0
      while (b < 4) {
        val bx = b & 1; val by = b >> 1
        val d = new Array[Int](16)
        d(0) = dc(b)
        if (cbpChroma == 2) {
          var j = 0
          while (j < 15) {
            val raster = Transform.zigzag4x4(j + 1)
            d(raster) = Transform.dequant(ac(b)(j), qp, raster,
              w(raster))
            j += 1
          }
        }
        val res = Transform.inverse4x4(d)
        var i = 0
        while (i < 16) {
          val px = bx * 4 + (i & 3); val py = by * 4 + (i >> 2)
          plane((cy0 + py) * cw + cx0 + px) =
            clipB(predC(py * 8 + px) + res(i))
          i += 1
        }
        b += 1
      }
    }
    go(cbP, co.cbDc, co.cbAc, sm.w4(1), qpC)
    go(crP, co.crDc, co.crAc, sm.w4(2), qpCr)
  }
}
