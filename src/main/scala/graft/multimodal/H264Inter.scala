package graft.multimodal

import H264.{BitReader, BitWriter, Pps}

/**
 * H.264 inter (P-slice) prediction — motion-compensated decode of
 * P macroblocks under CAVLC entropy coding, built from the public
 * ITU-T Rec. H.264 spec sections cited inline (the same
 * public-spec-only rule as the intra modules; reference behaviors:
 * parquery has no video surface — this whole family is the repo's
 * LLM-pipeline extension tier).
 *
 * What decodes natively: P slices with P_L0_16x16 / 16x8 / 8x16 /
 * P_8x8 / P_8x8ref0 partitions (Tables 7-13/7-17), P_Skip, multiple
 * short-term reference frames (sliding-window marking), intra MBs
 * inside P slices (incl. I_PCM), quarter-pel luma (§8.4.2.2.1) and
 * eighth-pel chroma (§8.4.2.2.2) interpolation, and the full
 * §8.4.1.3 MV prediction (median + directional + single-ref-match
 * rules). SCOPE boundaries, all named errors at the SPI binding
 * point: B slices (list1/direct modes), CABAC P slices (the inter
 * syntax-element context init tables are not transcribed — the
 * constants-are-never-invented rule), weighted prediction,
 * ref-pic-list modification, MMCO/long-term marking, and inter
 * transform_8x8.
 */
private[graft] object H264Inter {

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  @inline private def clipB(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  // ---------------------------------------------------------------
  // reference pictures
  // ---------------------------------------------------------------

  /** One decoded reference picture (POST-deblock planes — §8.4.2.1
    * motion compensation reads the filtered picture). `picId` is a
    * decode-order counter unique within the stream; the deblocker's
    * bS=1 "different reference pictures" test compares it. */
  final class RefPic(val picId: Int, val frameNum: Int,
                     val wMbs: Int, val hMbs: Int,
                     val y: Array[Byte], val cb: Array[Byte],
                     val cr: Array[Byte])

  /** Per-picture motion state at 4x4-block granularity (§8.4.1.3
    * neighbor reads + §8.7.2.1 bS derivation). `refPic` doubles as
    * the decoded-yet flag: NOT_DECODED until the covering partition
    * (or intra MB) finishes, then the reference's picId, or INTRA. */
  final class MotionCtx(val w4: Int, val h4: Int) {
    val mvx = new Array[Short](w4 * h4)
    val mvy = new Array[Short](w4 * h4)
    val refPic: Array[Int] = Array.fill(w4 * h4)(NotDecoded)
    val refIdx: Array[Byte] = Array.fill(w4 * h4)(-1)

    def markIntraMb(mbIdx: Int, wMbs: Int): Unit = {
      val bx0 = (mbIdx % wMbs) * 4; val by0 = (mbIdx / wMbs) * 4
      var by = by0
      while (by < by0 + 4) {
        var bx = bx0
        while (bx < bx0 + 4) {
          val i = by * w4 + bx
          refPic(i) = Intra; refIdx(i) = -1; mvx(i) = 0; mvy(i) = 0
          bx += 1
        }
        by += 1
      }
    }

    def setPartition(bx0: Int, by0: Int, pw: Int, ph: Int,
                     mx: Int, my: Int, rIdx: Int, rPic: Int): Unit = {
      var by = by0
      while (by < by0 + ph) {
        var bx = bx0
        while (bx < bx0 + pw) {
          val i = by * w4 + bx
          mvx(i) = mx.toShort; mvy(i) = my.toShort
          refIdx(i) = rIdx.toByte; refPic(i) = rPic
          bx += 1
        }
        by += 1
      }
    }
  }
  val NotDecoded: Int = -2
  val Intra: Int = -1

  // ---------------------------------------------------------------
  // fractional-sample interpolation (§8.4.2.2)
  // ---------------------------------------------------------------

  @inline private def tap6(a: Int, b: Int, c: Int, d: Int, e: Int,
                           f: Int): Int =
    a - 5 * b + 20 * c + 20 * d - 5 * e + f

  /**
   * Luma quarter-pel prediction (§8.4.2.2.1): 6-tap (1,-5,20,20,-5,1)
   * half-sample filter, quarter samples by rounding averages of the
   * nearest integer/half samples (Figure 8-4 positions a..s). Writes
   * `w`×`h` prediction samples for the partition whose top-left LUMA
   * sample is (x0, y0) displaced by (mvx, mvy) in quarter-pel units
   * into `out` at (ox, oy) of a 16-wide MB-local buffer. Samples
   * outside the picture clamp to the border (§8.4.2.2.1's coordinate
   * clipping).
   */
  def predLuma(ref: Array[Byte], refW: Int, refH: Int,
               x0: Int, y0: Int, mvx: Int, mvy: Int,
               w: Int, h: Int, out: Array[Int], ox: Int,
               oy: Int): Unit = {
    val xI = x0 + (mvx >> 2); val yI = y0 + (mvy >> 2)
    val xF = mvx & 3; val yF = mvy & 3
    @inline def at(x: Int, y: Int): Int =
      ref(clip3(0, refH - 1, y) * refW + clip3(0, refW - 1, x)) & 0xFF
    // unrounded 6-tap sums (the j intermediate path keeps full
    // precision per §8.4.2.2.1)
    @inline def sumH(x: Int, y: Int): Int =
      tap6(at(x - 2, y), at(x - 1, y), at(x, y), at(x + 1, y),
        at(x + 2, y), at(x + 3, y))
    @inline def sumV(x: Int, y: Int): Int =
      tap6(at(x, y - 2), at(x, y - 1), at(x, y), at(x, y + 1),
        at(x, y + 2), at(x, y + 3))
    @inline def halfH(x: Int, y: Int): Int =
      clip3(0, 255, (sumH(x, y) + 16) >> 5)
    @inline def halfV(x: Int, y: Int): Int =
      clip3(0, 255, (sumV(x, y) + 16) >> 5)
    // center half-pel j: 6-tap across the unrounded vertical sums
    @inline def halfC(x: Int, y: Int): Int = {
      val j1 = tap6(sumV(x - 2, y), sumV(x - 1, y), sumV(x, y),
        sumV(x + 1, y), sumV(x + 2, y), sumV(x + 3, y))
      clip3(0, 255, (j1 + 512) >> 10)
    }
    @inline def avg(a: Int, b: Int): Int = (a + b + 1) >> 1
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        val x = xI + i; val y = yI + j
        val v = (xF, yF) match {
          case (0, 0) => at(x, y)
          case (1, 0) => avg(at(x, y), halfH(x, y))
          case (2, 0) => halfH(x, y)
          case (3, 0) => avg(at(x + 1, y), halfH(x, y))
          case (0, 1) => avg(at(x, y), halfV(x, y))
          case (0, 2) => halfV(x, y)
          case (0, 3) => avg(at(x, y + 1), halfV(x, y))
          case (2, 2) => halfC(x, y)
          case (1, 1) => avg(halfH(x, y), halfV(x, y))
          case (3, 1) => avg(halfH(x, y), halfV(x + 1, y))
          case (1, 3) => avg(halfV(x, y), halfH(x, y + 1))
          case (3, 3) => avg(halfV(x + 1, y), halfH(x, y + 1))
          case (2, 1) => avg(halfH(x, y), halfC(x, y))
          case (2, 3) => avg(halfC(x, y), halfH(x, y + 1))
          case (1, 2) => avg(halfV(x, y), halfC(x, y))
          case (3, 2) => avg(halfC(x, y), halfV(x + 1, y))
          case _ => throw new IllegalStateException("frac")
        }
        out((oy + j) * 16 + ox + i) = v
        i += 1
      }
      j += 1
    }
  }

  /**
   * Chroma eighth-pel bilinear prediction (§8.4.2.2.2). The luma MV
   * in quarter-pel units IS the chroma MV in eighth-pel units for
   * 4:2:0. (cx0, cy0) is the partition's top-left CHROMA sample;
   * writes `w`×`h` into `out` at (ox, oy) of an 8-wide buffer.
   */
  def predChroma(ref: Array[Byte], refW: Int, refH: Int,
                 cx0: Int, cy0: Int, mvx: Int, mvy: Int,
                 w: Int, h: Int, out: Array[Int], ox: Int,
                 oy: Int): Unit = {
    val xI = cx0 + (mvx >> 3); val yI = cy0 + (mvy >> 3)
    val xF = mvx & 7; val yF = mvy & 7
    @inline def at(x: Int, y: Int): Int =
      ref(clip3(0, refH - 1, y) * refW + clip3(0, refW - 1, x)) & 0xFF
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        val x = xI + i; val y = yI + j
        val v = ((8 - xF) * (8 - yF) * at(x, y) +
          xF * (8 - yF) * at(x + 1, y) +
          (8 - xF) * yF * at(x, y + 1) +
          xF * yF * at(x + 1, y + 1) + 32) >> 6
        out((oy + j) * 8 + ox + i) = v
        i += 1
      }
      j += 1
    }
  }

  // ---------------------------------------------------------------
  // motion vector prediction (§8.4.1.3)
  // ---------------------------------------------------------------

  /** Neighbor read for MV prediction: (available, refIdx, mvx, mvy).
    * A block is available when it is inside the picture, already
    * decoded, and its MB is in the same slice (§6.4.11.7's marking of
    * not-yet-decoded and cross-slice neighbors as unavailable);
    * intra blocks are available but contribute refIdx −1 / mv 0
    * (§8.4.1.3.2). */
  private def nbr(ctx: H264Mb.PicCtx, mo: MotionCtx, sliceId: Int,
                  bx: Int, by: Int): (Boolean, Int, Int, Int) = {
    if (bx < 0 || by < 0 || bx >= mo.w4 || by >= mo.h4)
      return (false, -1, 0, 0)
    val mb = (by >> 2) * ctx.wMbs + (bx >> 2)
    if (ctx.sliceId(mb) != sliceId) return (false, -1, 0, 0)
    val i = by * mo.w4 + bx
    mo.refPic(i) match {
      case NotDecoded => (false, -1, 0, 0)
      case Intra => (true, -1, 0, 0)
      case _ => (true, mo.refIdx(i).toInt, mo.mvx(i).toInt,
        mo.mvy(i).toInt)
    }
  }

  @inline private def median3(a: Int, b: Int, c: Int): Int =
    math.max(math.min(a, b), math.min(c, math.max(a, b)))

  /** Partition kinds for the §8.4.1.3 directional special cases. */
  final val PartNormal = 0
  final val Part16x8Top = 1
  final val Part16x8Bottom = 2
  final val Part8x16Left = 3
  final val Part8x16Right = 4

  /**
   * §8.4.1.3 luma MV prediction for the partition whose top-left is
   * (bx, by) in global 4x4-block units, `w4` blocks wide. Neighbors:
   * A left, B above, C above-right of the top-right block (D
   * above-left when C is unavailable, §6.4.11.7). Rules in spec
   * order: the 16x8/8x16 directional cases, then B+C-unavailable →
   * A, exactly-one-refIdx-match, else component-wise median.
   */
  def mvPred(ctx: H264Mb.PicCtx, mo: MotionCtx, sliceId: Int,
             bx: Int, by: Int, w4: Int, refIdx: Int,
             partKind: Int): (Int, Int) = {
    val a = nbr(ctx, mo, sliceId, bx - 1, by)
    val b = nbr(ctx, mo, sliceId, bx, by - 1)
    val c0 = nbr(ctx, mo, sliceId, bx + w4, by - 1)
    val c = if (c0._1) c0 else nbr(ctx, mo, sliceId, bx - 1, by - 1)

    partKind match {
      case Part16x8Top if b._1 && b._2 == refIdx => return (b._3, b._4)
      case Part16x8Bottom if a._1 && a._2 == refIdx =>
        return (a._3, a._4)
      case Part8x16Left if a._1 && a._2 == refIdx => return (a._3, a._4)
      case Part8x16Right if c._1 && c._2 == refIdx =>
        return (c._3, c._4)
      case _ => ()
    }
    if (!b._1 && !c._1)
      return if (a._1) (a._3, a._4) else (0, 0)
    val matches =
      Seq(a, b, c).filter(n => n._1 && n._2 == refIdx)
    if (matches.size == 1) return (matches.head._3, matches.head._4)
    (median3(a._3, b._3, c._3), median3(a._4, b._4, c._4))
  }

  /** §8.4.1.1 P_Skip motion: zero MV when the 16x16's A or B
    * neighbor is unavailable or is a zero-motion ref-0 block;
    * otherwise the 16x16 median prediction with refIdx 0. */
  def skipMv(ctx: H264Mb.PicCtx, mo: MotionCtx, sliceId: Int,
             bx: Int, by: Int): (Int, Int) = {
    val a = nbr(ctx, mo, sliceId, bx - 1, by)
    val b = nbr(ctx, mo, sliceId, bx, by - 1)
    if (!a._1 || !b._1 ||
        (a._2 == 0 && a._3 == 0 && a._4 == 0) ||
        (b._2 == 0 && b._3 == 0 && b._4 == 0)) (0, 0)
    else mvPred(ctx, mo, sliceId, bx, by, 4, 0, PartNormal)
  }

  // ---------------------------------------------------------------
  // P macroblock decode (CAVLC)
  // ---------------------------------------------------------------

  /** Table 9-4, inter column: coded_block_pattern ue(v) codeNum →
    * cbp for ChromaArrayType 1. Structurally validated as a
    * permutation of 0..47 at class-load. */
  val interCbpFromCode: Array[Int] = Array(
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)
  val interCodeFromCbp: Array[Int] = {
    require(interCbpFromCode.sorted.sameElements(0 until 48),
      "Table 9-4 inter column must be a permutation of 0..47")
    val inv = new Array[Int](48)
    interCbpFromCode.zipWithIndex.foreach { case (cbp, code) =>
      inv(cbp) = code
    }
    inv
  }

  /** One partition: offsets/sizes in 4x4 units relative to the MB,
    * plus the §8.4.1.3 directional kind. */
  private final case class Part(px: Int, py: Int, w4: Int, h4: Int,
                                kind: Int)

  /** Table 7-13 partitionings for P mb_type 0..2 (P_8x8 comes from
    * Table 7-17 sub_mb_types). */
  private def partsOf(mbType: Int): Seq[Part] = mbType match {
    case 0 => Seq(Part(0, 0, 4, 4, PartNormal))
    case 1 => Seq(Part(0, 0, 4, 2, Part16x8Top),
      Part(0, 2, 4, 2, Part16x8Bottom))
    case 2 => Seq(Part(0, 0, 2, 4, Part8x16Left),
      Part(2, 0, 2, 4, Part8x16Right))
    case other =>
      throw new IllegalArgumentException(s"not a partitioned P type $other")
  }

  /** Table 7-17: sub_mb_type → sub-partitions of one 8x8 (offsets in
    * 4x4 units relative to the 8x8's top-left). */
  private def subPartsOf(subType: Int): Seq[Part] = subType match {
    case 0 => Seq(Part(0, 0, 2, 2, PartNormal))
    case 1 => Seq(Part(0, 0, 2, 1, PartNormal),
      Part(0, 1, 2, 1, PartNormal))
    case 2 => Seq(Part(0, 0, 1, 2, PartNormal),
      Part(1, 0, 1, 2, PartNormal))
    case 3 => Seq(Part(0, 0, 1, 1, PartNormal),
      Part(0, 1, 1, 1, PartNormal),
      Part(1, 0, 1, 1, PartNormal),
      Part(1, 1, 1, 1, PartNormal))
    case other =>
      throw new IllegalArgumentException(s"bad P sub_mb_type $other")
  }

  /** te(v) for ref_idx (§9.1.1): one inverted bit when the bound is
    * 1, ue(v) otherwise. */
  private def te(r: BitReader, max: Int): Int =
    if (max == 0) 0
    else if (max == 1) 1 - r.u(1)
    else r.ue()

  private def writeTe(w: BitWriter, v: Int, max: Int): Unit =
    if (max == 0) ()
    else if (max == 1) w.u(1 - v, 1)
    else w.ue(v)

  /** Motion-compensate one luma+chroma partition from `ref` into the
    * MB-local pred buffers. */
  private def mcPartition(ref: RefPic, mbX: Int, mbY: Int, p: Part,
                          mx: Int, my: Int, predY: Array[Int],
                          predCb: Array[Int], predCr: Array[Int])
      : Unit = {
    val lw = ref.wMbs * 16; val lh = ref.hMbs * 16
    val cw = ref.wMbs * 8; val ch = ref.hMbs * 8
    predLuma(ref.y, lw, lh, mbX * 16 + p.px * 4, mbY * 16 + p.py * 4,
      mx, my, p.w4 * 4, p.h4 * 4, predY, p.px * 4, p.py * 4)
    predChroma(ref.cb, cw, ch, mbX * 8 + p.px * 2, mbY * 8 + p.py * 2,
      mx, my, p.w4 * 2, p.h4 * 2, predCb, p.px * 2, p.py * 2)
    predChroma(ref.cr, cw, ch, mbX * 8 + p.px * 2, mbY * 8 + p.py * 2,
      mx, my, p.w4 * 2, p.h4 * 2, predCr, p.px * 2, p.py * 2)
  }

  /** Decode one P_Skip MB: 16x16 MC at the §8.4.1.1 skip motion from
    * refIdx 0, no residual; QP carries over unchanged. */
  def decodeSkipMb(ctx: H264Mb.PicCtx, mo: MotionCtx, sliceId: Int,
                   mbIdx: Int, refList: IndexedSeq[RefPic],
                   yP: Array[Byte], cbP: Array[Byte],
                   crP: Array[Byte]): Unit = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    ctx.sliceId(mbIdx) = sliceId
    val (mx, my) = skipMv(ctx, mo, sliceId, mbX * 4, mbY * 4)
    val predY = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    val ref = refList(0)
    mcPartition(ref, mbX, mbY, Part(0, 0, 4, 4, PartNormal), mx, my,
      predY, predCb, predCr)
    writePred(ctx, mbIdx, predY, predCb, predCr, yP, cbP, crP)
    mo.setPartition(mbX * 4, mbY * 4, 4, 4, mx, my, 0, ref.picId)
    clearNz(ctx, mbIdx)
  }

  private def clearNz(ctx: H264Mb.PicCtx, mbIdx: Int): Unit = {
    java.util.Arrays.fill(ctx.lumaNz(mbIdx), 0)
    java.util.Arrays.fill(ctx.cbNz(mbIdx), 0)
    java.util.Arrays.fill(ctx.crNz(mbIdx), 0)
    ctx.cbpLumaArr(mbIdx) = 0
    ctx.cbpChromaArr(mbIdx) = 0
    ctx.is8x8(mbIdx) = false
  }

  private def writePred(ctx: H264Mb.PicCtx, mbIdx: Int,
                        predY: Array[Int], predCb: Array[Int],
                        predCr: Array[Int], yP: Array[Byte],
                        cbP: Array[Byte], crP: Array[Byte]): Unit = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    val lw = ctx.wMbs * 16; val cw = ctx.wMbs * 8
    var i = 0
    while (i < 256) {
      yP((mbY * 16 + (i >> 4)) * lw + mbX * 16 + (i & 15)) =
        clipB(predY(i))
      i += 1
    }
    i = 0
    while (i < 64) {
      val o = (mbY * 8 + (i >> 3)) * cw + mbX * 8 + (i & 7)
      cbP(o) = clipB(predCb(i)); crP(o) = clipB(predCr(i))
      i += 1
    }
  }

  /** Parsed-but-not-yet-reconstructed inter MB syntax (mirrors the
    * intra MbCoeffs carrier so encode and decode share ordering). */
  private final case class InterMb(
      parts: Seq[(Part, Int, Int, Int)], // partition, refIdx, mvx, mvy
      cbpLuma: Int, cbpChroma: Int, qpY: Int,
      lumaAc: Array[Array[Int]],
      cbDc: Array[Int], crDc: Array[Int],
      cbAc: Array[Array[Int]], crAc: Array[Array[Int]])

  /**
   * Decode one inter-coded P MB (mb_type 0..4 of Table 7-13,
   * CAVLC). Parse order per §7.3.5.1/2: [sub_mb_type×4,] ref_idx per
   * partition, mvd per (sub-)partition, coded_block_pattern,
   * [mb_qp_delta,] residuals. MV prediction runs sequentially in
   * partition order AFTER the mvd parse, exactly the §8.4.1.3
   * decode-order dependence. Returns the updated luma QP.
   */
  def decodeInterMb(r: BitReader, mbType: Int, ctx: H264Mb.PicCtx,
                    mo: MotionCtx, sliceId: Int, mbIdx: Int,
                    qpYPrev: Int, p: Pps, refList: IndexedSeq[RefPic],
                    numRefActive: Int, yP: Array[Byte],
                    cbP: Array[Byte], crP: Array[Byte]): Int = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    ctx.sliceId(mbIdx) = sliceId
    ctx.is8x8(mbIdx) = false

    // --- partition structure + per-partition (refIdx, mvd) parse ---
    // pred carrier: (part global offsets resolved later, refIdx, mvdx, mvdy)
    val withSub = mbType == 3 || mbType == 4
    val subTypes: Array[Int] =
      if (withSub) Array.fill(4)(r.ue()) else null
    if (withSub) subTypes.foreach(st =>
      require(st <= 3, s"P sub_mb_type $st out of range"))

    val nParts = if (withSub) 4 else partsOf(mbType).size
    val refIdxArr = new Array[Int](nParts)
    var i = 0
    while (i < nParts) {
      refIdxArr(i) =
        if (mbType == 4) 0 // P_8x8ref0: inferred
        else te(r, numRefActive - 1)
      require(refIdxArr(i) < refList.size,
        s"ref_idx_l0 ${refIdxArr(i)} but only ${refList.size} refs")
      i += 1
    }
    // mvd per (sub-)partition, in decode order
    val mvds = Seq.newBuilder[(Part, Int, Int, Int)] // part, refIdx, mvdx, mvdy
    if (withSub) {
      var b = 0
      while (b < 4) {
        val ox = (b & 1) * 2; val oy = (b >> 1) * 2
        subPartsOf(subTypes(b)).foreach { sp =>
          val mdx = r.se(); val mdy = r.se()
          mvds += ((Part(ox + sp.px, oy + sp.py, sp.w4, sp.h4,
            sp.kind), refIdxArr(b), mdx, mdy))
        }
        b += 1
      }
    } else {
      partsOf(mbType).zipWithIndex.foreach { case (pt, pi) =>
        val mdx = r.se(); val mdy = r.se()
        mvds += ((pt, refIdxArr(pi), mdx, mdy))
      }
    }

    // --- derive MVs sequentially; MC each partition ---
    val predY = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    val resolved = mvds.result().map { case (pt, ri, mdx, mdy) =>
      val (px, py) = (mbX * 4 + pt.px, mbY * 4 + pt.py)
      val (pmx, pmy) = mvPred(ctx, mo, sliceId, px, py, pt.w4, ri,
        pt.kind)
      val mx = pmx + mdx; val my = pmy + mdy
      val ref = refList(ri)
      mcPartition(ref, mbX, mbY, pt, mx, my, predY, predCb, predCr)
      mo.setPartition(px, py, pt.w4, pt.h4, mx, my, ri, ref.picId)
      (pt, ri, mx, my)
    }

    // --- coded_block_pattern (Table 9-4 inter column) ---
    val code = r.ue()
    require(code < 48, s"inter cbp codeNum $code out of range")
    val cbp = interCbpFromCode(code)
    val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
    require(cbpChroma <= 2, s"cbp chroma $cbpChroma")
    // transform_size_8x8_flag (§7.3.5): only when the PPS enables it,
    // luma residual exists, and no sub-partition is below 8x8; the
    // residual PARSE is unchanged (the §7.4.5.3.3 4x4-interleave
    // split), only dequant + inverse transform switch to 8x8
    val use8 = p.transform8x8 && cbpLuma != 0 &&
      (!withSub || subTypes.forall(_ == 0)) && r.u(1) == 1
    ctx.is8x8(mbIdx) = use8
    var qpY = qpYPrev
    if (cbp != 0) {
      val delta = r.se()
      require(delta >= -26 && delta <= 25, s"mb_qp_delta $delta")
      qpY = (qpY + delta + 52) % 52
    }

    // --- residuals (§7.3.5.3; inter lists 3/4/5 weight the dequant) ---
    val lumaAc = parseLumaResidual(r, ctx, mbX, mbY, sliceId, mbIdx,
      cbpLuma)
    val (cbDc, crDc, cbAc, crAc) =
      parseChromaResidual(r, ctx, mbX, mbY, sliceId, mbIdx, cbpChroma)
    ctx.cbpLumaArr(mbIdx) = cbpLuma
    ctx.cbpChromaArr(mbIdx) = cbpChroma

    reconInter(ctx, mbIdx, qpY, p, InterMb(resolved, cbpLuma,
      cbpChroma, qpY, lumaAc, cbDc, crDc, cbAc, crAc), predY, predCb,
      predCr, yP, cbP, crP, use8)
    qpY
  }

  private def parseLumaResidual(r: BitReader, ctx: H264Mb.PicCtx,
                                mbX: Int, mbY: Int, sliceId: Int,
                                mbIdx: Int, cbpLuma: Int)
      : Array[Array[Int]] = {
    val lumaAc = new Array[Array[Int]](16)
    var z = 0
    while (z < 16) {
      if ((cbpLuma & (1 << (z >> 2))) != 0) {
        val nC = lumaNCVia(ctx, mbX, mbY, H264Mb.zx(z), H264Mb.zy(z),
          sliceId)
        val (c, tc) = Cavlc.readResidualBlock(r, nC, 16)
        lumaAc(z) = c
        ctx.lumaNz(mbIdx)(z) = tc
      } else {
        lumaAc(z) = new Array[Int](16)
        ctx.lumaNz(mbIdx)(z) = 0
      }
      z += 1
    }
    lumaAc
  }

  private def parseChromaResidual(r: BitReader, ctx: H264Mb.PicCtx,
                                  mbX: Int, mbY: Int, sliceId: Int,
                                  mbIdx: Int, cbpChroma: Int)
      : (Array[Int], Array[Int], Array[Array[Int]], Array[Array[Int]]) = {
    val cbDc = new Array[Int](4); val crDc = new Array[Int](4)
    if (cbpChroma != 0) {
      System.arraycopy(Cavlc.readResidualBlock(r, -1, 4)._1, 0, cbDc,
        0, 4)
      System.arraycopy(Cavlc.readResidualBlock(r, -1, 4)._1, 0, crDc,
        0, 4)
    }
    val cbAc = Array.fill(4)(new Array[Int](15))
    val crAc = Array.fill(4)(new Array[Int](15))
    if (cbpChroma == 2) {
      var b = 0
      while (b < 4) {
        val nC = chromaNCVia(ctx.cbNz, ctx, mbX, mbY, b, sliceId)
        val (c, tc) = Cavlc.readResidualBlock(r, nC, 15)
        cbAc(b) = c; ctx.cbNz(mbIdx)(b) = tc
        b += 1
      }
      b = 0
      while (b < 4) {
        val nC = chromaNCVia(ctx.crNz, ctx, mbX, mbY, b, sliceId)
        val (c, tc) = Cavlc.readResidualBlock(r, nC, 15)
        crAc(b) = c; ctx.crNz(mbIdx)(b) = tc
        b += 1
      }
    } else {
      var b = 0
      while (b < 4) {
        ctx.cbNz(mbIdx)(b) = 0; ctx.crNz(mbIdx)(b) = 0; b += 1
      }
    }
    (cbDc, crDc, cbAc, crAc)
  }

  /** Add the dequantized inter residual (weight lists 3/4/5 and 8x8
    * list 1 — the INTER columns of the scaling matrices) onto the MC
    * prediction and write the MB's planes. `use8` switches the luma
    * residual to §8.5.13 8x8 dequant + §8.5.12.3 inverse 8x8 over the
    * de-interleaved parts (§7.4.5.3.3). */
  private def reconInter(ctx: H264Mb.PicCtx, mbIdx: Int, qpY: Int,
                         p: Pps, m: InterMb, predY: Array[Int],
                         predCb: Array[Int], predCr: Array[Int],
                         yP: Array[Byte], cbP: Array[Byte],
                         crP: Array[Byte], use8: Boolean = false)
      : Unit = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    val lw = ctx.wMbs * 16; val cw = ctx.wMbs * 8
    val x0 = mbX * 16; val y0 = mbY * 16
    val qpC = Transform.chromaQp(qpY, p.chromaQpOffset)
    val qpCr = Transform.chromaQp(qpY, p.chromaQpOffsetCr)
    if (use8) {
      // luma as four 8x8 transform blocks: de-interleave the CAVLC
      // parts back into the 64-coeff scan, dequant8 on inter list 1,
      // inverse 8x8 butterfly, add
      var b = 0
      while (b < 4) {
        val bx = (b & 1) * 8; val by = (b >> 1) * 8
        if ((m.cbpLuma & (1 << b)) != 0) {
          val d = new Array[Int](64)
          var s = 0
          while (s < 64) {
            val cval = m.lumaAc(b * 4 + (s & 3))(s >> 2)
            val raster = Transform.zigzag8x8(s)
            d(raster) = Transform.dequant8(cval, qpY, raster,
              p.sm.w8(1)(raster))
            s += 1
          }
          val res = Transform.inverse8x8(d)
          var i = 0
          while (i < 64) {
            val px = bx + (i & 7); val py = by + (i >> 3)
            yP((y0 + py) * lw + x0 + px) =
              clipB(predY(py * 16 + px) + res(i))
            i += 1
          }
        } else {
          var i = 0
          while (i < 64) {
            val px = bx + (i & 7); val py = by + (i >> 3)
            yP((y0 + py) * lw + x0 + px) = clipB(predY(py * 16 + px))
            i += 1
          }
        }
        b += 1
      }
    } else {
    // luma: 16 standalone 4x4 blocks (no DC split in inter MBs)
    var z = 0
    while (z < 16) {
      val bx = H264Mb.zx(z); val by = H264Mb.zy(z)
      if ((m.cbpLuma & (1 << (z >> 2))) != 0) {
        val d = new Array[Int](16)
        var k = 0
        while (k < 16) {
          val raster = Transform.zigzag4x4(k)
          d(raster) = Transform.dequant(m.lumaAc(z)(k), qpY, raster,
            p.sm.w4(3)(raster))
          k += 1
        }
        val res = Transform.inverse4x4(d)
        var i = 0
        while (i < 16) {
          val px = bx * 4 + (i & 3); val py = by * 4 + (i >> 2)
          yP((y0 + py) * lw + x0 + px) =
            clipB(predY(py * 16 + px) + res(i))
          i += 1
        }
      } else {
        var i = 0
        while (i < 16) {
          val px = bx * 4 + (i & 3); val py = by * 4 + (i >> 2)
          yP((y0 + py) * lw + x0 + px) = clipB(predY(py * 16 + px))
          i += 1
        }
      }
      z += 1
    }
    }
    // chroma
    val cx0 = mbX * 8; val cy0 = mbY * 8
    def go(plane: Array[Byte], pred: Array[Int], dcScan: Array[Int],
           ac: Array[Array[Int]], w: Array[Int], qp: Int): Unit = {
      val dc =
        if (m.cbpChroma != 0)
          Transform.chromaDcTransformDequant(dcScan, qp, w(0))
        else Array(0, 0, 0, 0)
      var b = 0
      while (b < 4) {
        val bx = b & 1; val by = b >> 1
        val d = new Array[Int](16)
        d(0) = dc(b)
        if (m.cbpChroma == 2) {
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
            clipB(pred(py * 8 + px) + res(i))
          i += 1
        }
        b += 1
      }
    }
    go(cbP, predCb, m.cbDc, m.cbAc, p.sm.w4(4), qpC)
    go(crP, predCr, m.crDc, m.crAc, p.sm.w4(5), qpCr)
  }

  // nC via H264Mb's private §9.2.1 helpers — duplicated thin
  // accessors to keep the neighbor logic in ONE place
  private def lumaNCVia(ctx: H264Mb.PicCtx, mbX: Int, mbY: Int,
                        bx: Int, by: Int, sliceId: Int): Int =
    H264Mb.lumaNCFor(ctx, mbX, mbY, bx, by, sliceId)
  private def chromaNCVia(nz: Array[Array[Int]], ctx: H264Mb.PicCtx,
                          mbX: Int, mbY: Int, blk: Int,
                          sliceId: Int): Int =
    H264Mb.chromaNCFor(nz, ctx, mbX, mbY, blk, sliceId)

  // ---------------------------------------------------------------
  // encode (fixture generator): P macroblocks
  // ---------------------------------------------------------------

  /** Integer-pel SAD search on luma: best (mvx, mvy) in QUARTER-pel
    * units over a ±`range` full-pel window centered on the prediction
    * (deterministic: first strict improvement in row-major order). */
  private def searchMv(ref: RefPic, srcY: Array[Int], lw: Int,
                       x0: Int, y0: Int, w: Int, h: Int,
                       center: (Int, Int), range: Int): (Int, Int) = {
    val refW = ref.wMbs * 16; val refH = ref.hMbs * 16
    @inline def at(x: Int, y: Int): Int =
      ref.y(clip3(0, refH - 1, y) * refW + clip3(0, refW - 1, x)) & 0xFF
    val cx = (center._1 + 2) >> 2; val cy = (center._2 + 2) >> 2
    var best = Int.MaxValue; var bx = 0; var by = 0
    var dy = -range
    while (dy <= range) {
      var dx = -range
      while (dx <= range) {
        var sad = 0
        var j = 0
        while (j < h && sad < best) {
          var i = 0
          while (i < w) {
            sad += math.abs(srcY((y0 + j) * lw + x0 + i) -
              at(x0 + cx + dx + i, y0 + cy + dy + j))
            i += 1
          }
          j += 1
        }
        if (sad < best) { best = sad; bx = cx + dx; by = cy + dy }
        dx += 1
      }
      dy += 1
    }
    (bx << 2, by << 2)
  }

  /**
   * Analyze + emit + reconstruct ONE P macroblock for the fixture
   * encoder. `variant` picks the partitioning (0 16x16 / 1 16x8 /
   * 2 8x16 / 3 P_8x8 / 4 P_8x8ref0); `forcedMv` plants a global
   * quarter-pel MV (exercising every fractional interpolation
   * position), otherwise an integer SAD search runs per partition.
   * A 16x16/ref0 MB whose MV equals the §8.4.1.1 skip motion and
   * whose residual quantizes to zero becomes P_Skip: the caller
   * accumulates `skipRun` and this returns (true, qpY) WITHOUT
   * writing; otherwise ue(skipRun) + the MB syntax are written.
   * Reconstruction runs through the decoder path either way.
   */
  private[multimodal] def encodePMb(wr: BitWriter, ctx: H264Mb.PicCtx,
      mo: MotionCtx, sliceId: Int, mbIdx: Int,
      refList: IndexedSeq[RefPic], numRefActive: Int,
      srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int],
      qpYIn: Int, target: Int, p: Pps, variant: Int,
      forcedMv: Option[(Int, Int)], searchRange: Int,
      yR: Array[Byte], cbR: Array[Byte], crR: Array[Byte],
      skipRun: Int, transform8x8: Boolean = false): (Boolean, Int) = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    val lw = ctx.wMbs * 16; val cw = ctx.wMbs * 8
    ctx.sliceId(mbIdx) = sliceId
    ctx.is8x8(mbIdx) = false
    val mbType = variant % 5
    val subTypes: Array[Int] =
      if (mbType >= 3) Array.tabulate(4)(b => (b + mbIdx) % 4)
      else null
    val qpC = Transform.chromaQp(target, p.chromaQpOffset)
    val qpCr = Transform.chromaQp(target, p.chromaQpOffsetCr)

    // quantized residual of the whole MB against a given prediction;
    // `use8` codes luma through the 8x8 transform (quant8 on inter
    // 8x8 list 1, parts in the §7.4.5.3.3 interleave split)
    def residuals(predY: Array[Int], predCb: Array[Int],
                  predCr: Array[Int], use8: Boolean = false)
        : (Array[Array[Int]], Array[Int], Array[Int],
           Array[Array[Int]], Array[Array[Int]], Int, Int) = {
      val lumaAc = new Array[Array[Int]](16)
      if (use8) {
        var b = 0
        while (b < 4) {
          val bx = (b & 1) * 8; val by = (b >> 1) * 8
          val diff = new Array[Int](64)
          var i = 0
          while (i < 64) {
            val px = bx + (i & 7); val py = by + (i >> 3)
            diff(i) = srcY((mbY * 16 + py) * lw + mbX * 16 + px) -
              predY(py * 16 + px)
            i += 1
          }
          val wCoef = Transform.forward8x8(diff)
          var k = 0
          while (k < 4) { lumaAc(b * 4 + k) = new Array[Int](16); k += 1 }
          var s = 0
          while (s < 64) {
            val raster = Transform.zigzag8x8(s)
            lumaAc(b * 4 + (s & 3))(s >> 2) =
              Transform.quant8(wCoef(raster), target, raster,
                p.sm.w8(1)(raster))
            s += 1
          }
          b += 1
        }
      } else {
      var z = 0
      while (z < 16) {
        val bx = H264Mb.zx(z); val by = H264Mb.zy(z)
        val diff = new Array[Int](16)
        var i = 0
        while (i < 16) {
          val px = bx * 4 + (i & 3); val py = by * 4 + (i >> 2)
          diff(i) = srcY((mbY * 16 + py) * lw + mbX * 16 + px) -
            predY(py * 16 + px)
          i += 1
        }
        val wCoef = Transform.forward4x4(diff)
        val scan = new Array[Int](16)
        var k = 0
        while (k < 16) {
          val raster = Transform.zigzag4x4(k)
          scan(k) = Transform.quant(wCoef(raster), target, raster,
            p.sm.w4(3)(raster))
          k += 1
        }
        lumaAc(z) = scan
        z += 1
      }
      }
      def chromaCoeffs(src: Array[Int], pred: Array[Int],
                       wgt: Array[Int], qp: Int)
          : (Array[Int], Array[Array[Int]]) = {
        val dcRaw = new Array[Int](4)
        val ac = new Array[Array[Int]](4)
        var b = 0
        while (b < 4) {
          val bx = b & 1; val by = b >> 1
          val diff = new Array[Int](16)
          var i = 0
          while (i < 16) {
            val px = bx * 4 + (i & 3); val py = by * 4 + (i >> 2)
            diff(i) = src((mbY * 8 + py) * cw + mbX * 8 + px) -
              pred(py * 8 + px)
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
      val (cbDc, cbAc) = chromaCoeffs(srcCb, predCb, p.sm.w4(4), qpC)
      val (crDc, crAc) = chromaCoeffs(srcCr, predCr, p.sm.w4(5), qpCr)
      var cbpLuma = 0
      var g = 0
      while (g < 4) {
        if ((0 until 4).exists(s2 => lumaAc(g * 4 + s2).exists(_ != 0)))
          cbpLuma |= 1 << g
        g += 1
      }
      val anyChromaAc = cbAc.exists(_.exists(_ != 0)) ||
        crAc.exists(_.exists(_ != 0))
      val anyChromaDc = cbDc.exists(_ != 0) || crDc.exists(_ != 0)
      val cbpChroma =
        if (anyChromaAc) 2 else if (anyChromaDc) 1 else 0
      (lumaAc, cbDc, crDc, cbAc, crAc, cbpLuma, cbpChroma)
    }

    // skip FIRST (the real-encoder decision order): 16x16 at the
    // §8.4.1.1 skip motion from ref 0, residual quantizes to zero
    if (mbType == 0 && refList.nonEmpty) {
      val skipCand = skipMv(ctx, mo, sliceId, mbX * 4, mbY * 4)
      val sy = new Array[Int](256)
      val scb = new Array[Int](64); val scr = new Array[Int](64)
      mcPartition(refList(0), mbX, mbY, Part(0, 0, 4, 4, PartNormal),
        skipCand._1, skipCand._2, sy, scb, scr)
      val (_, _, _, _, _, skL, skC) = residuals(sy, scb, scr)
      if (skL == 0 && skC == 0) {
        mo.setPartition(mbX * 4, mbY * 4, 4, 4, skipCand._1,
          skipCand._2, 0, refList(0).picId)
        writePred(ctx, mbIdx, sy, scb, scr, yR, cbR, crR)
        clearNz(ctx, mbIdx)
        return (true, qpYIn)
      }
    }

    // --- choose per-partition motion, prediction-order sequential ---
    val parts: Seq[(Part, Int)] = // partition, refIdx
      if (mbType >= 3) {
        (0 until 4).flatMap { b =>
          val ox = (b & 1) * 2; val oy = (b >> 1) * 2
          val ri =
            if (mbType == 4) 0
            else (mbIdx + b) % math.min(numRefActive, refList.size)
          subPartsOf(subTypes(b)).map(sp =>
            (Part(ox + sp.px, oy + sp.py, sp.w4, sp.h4, sp.kind), ri))
        }
      } else {
        partsOf(mbType).zipWithIndex.map { case (pt, pi) =>
          (pt, (mbIdx + pi) % math.min(numRefActive, refList.size))
        }
      }
    // ref_idx is per PARTITION (not sub-partition): for P_8x8 the 4
    // entries above repeat per sub-part; collapse for emission order
    val refPerPart: Seq[Int] =
      if (mbType >= 3) (0 until 4).map { b =>
        if (mbType == 4) 0
        else (mbIdx + b) % math.min(numRefActive, refList.size)
      }
      else parts.map(_._2)

    val predY = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    val chosen = parts.map { case (pt, ri) =>
      val (px, py) = (mbX * 4 + pt.px, mbY * 4 + pt.py)
      val (pmx, pmy) = mvPred(ctx, mo, sliceId, px, py, pt.w4, ri,
        pt.kind)
      val (mx, my) = forcedMv.getOrElse(
        searchMv(refList(ri), srcY, lw, mbX * 16 + pt.px * 4,
          mbY * 16 + pt.py * 4, pt.w4 * 4, pt.h4 * 4, (pmx, pmy),
          searchRange))
      mcPartition(refList(ri), mbX, mbY, pt, mx, my, predY, predCb,
        predCr)
      mo.setPartition(px, py, pt.w4, pt.h4, mx, my, ri,
        refList(ri).picId)
      (pt, ri, mx - pmx, my - pmy, mx, my)
    }

    // --- residuals against the MC prediction ---
    // deterministic 8x8/4x4 mix when the PPS allows it (and the
    // partitioning does — §7.3.5's noSubMbPartSizeLessThan8x8)
    val t8Eligible = transform8x8 &&
      (mbType <= 2 || subTypes.forall(_ == 0))
    val use8Want = t8Eligible && mbIdx % 2 == 0
    val (lumaAc, cbDc, crDc, cbAc, crAc, cbpLuma, cbpChroma) =
      residuals(predY, predCb, predCr, use8Want)
    val cbp = cbpLuma | (cbpChroma << 4)
    val use8 = use8Want && cbpLuma != 0
    ctx.is8x8(mbIdx) = use8

    // --- emit (decode parse order) ---
    wr.ue(skipRun)
    wr.ue(mbType)
    if (mbType >= 3) subTypes.foreach(wr.ue)
    if (mbType != 4)
      refPerPart.foreach(ri => writeTe(wr, ri, numRefActive - 1))
    chosen.foreach { case (_, _, mdx, mdy, _, _) =>
      wr.se(mdx); wr.se(mdy)
    }
    wr.ue(interCodeFromCbp(cbp))
    if (transform8x8 && cbpLuma != 0 &&
        (mbType <= 2 || subTypes.forall(_ == 0)))
      wr.u(if (use8) 1 else 0, 1) // transform_size_8x8_flag
    var qpY = qpYIn
    if (cbp != 0) {
      wr.se(target - qpY)
      qpY = target
    }
    // residual blocks, nz bookkeeping in decode order
    var z = 0
    while (z < 16) {
      if ((cbpLuma & (1 << (z >> 2))) != 0) {
        val nC = lumaNCVia(ctx, mbX, mbY, H264Mb.zx(z), H264Mb.zy(z),
          sliceId)
        ctx.lumaNz(mbIdx)(z) =
          Cavlc.writeResidualBlock(wr, lumaAc(z), nC)
      } else ctx.lumaNz(mbIdx)(z) = 0
      z += 1
    }
    if (cbpChroma != 0) {
      Cavlc.writeResidualBlock(wr, cbDc, -1)
      Cavlc.writeResidualBlock(wr, crDc, -1)
    }
    if (cbpChroma == 2) {
      var b = 0
      while (b < 4) {
        val nC = chromaNCVia(ctx.cbNz, ctx, mbX, mbY, b, sliceId)
        ctx.cbNz(mbIdx)(b) = Cavlc.writeResidualBlock(wr, cbAc(b), nC)
        b += 1
      }
      b = 0
      while (b < 4) {
        val nC = chromaNCVia(ctx.crNz, ctx, mbX, mbY, b, sliceId)
        ctx.crNz(mbIdx)(b) = Cavlc.writeResidualBlock(wr, crAc(b), nC)
        b += 1
      }
    } else {
      var b = 0
      while (b < 4) {
        ctx.cbNz(mbIdx)(b) = 0; ctx.crNz(mbIdx)(b) = 0; b += 1
      }
    }
    ctx.cbpLumaArr(mbIdx) = cbpLuma
    ctx.cbpChromaArr(mbIdx) = cbpChroma

    // --- reconstruct through the decoder path ---
    reconInter(ctx, mbIdx, qpY, p,
      InterMb(chosen.map(c => (c._1, c._2, c._5, c._6)), cbpLuma,
        cbpChroma, qpY, lumaAc, cbDc, crDc, cbAc, crAc),
      predY, predCb, predCr, yR, cbR, crR, use8)
    (false, qpY)
  }
}
