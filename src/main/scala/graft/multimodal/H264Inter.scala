package graft.multimodal

import H264.{BitReader, BitWriter, Pps}

/**
 * H.264 inter prediction — motion-compensated decode of P AND B
 * macroblocks under CAVLC entropy coding, built from the public
 * ITU-T Rec. H.264 spec sections cited inline (the same
 * public-spec-only rule as the intra modules; reference behaviors:
 * parquery has no video surface — this whole family is the repo's
 * LLM-pipeline extension tier).
 *
 * What decodes natively: P slices with P_L0_16x16 / 16x8 / 8x16 /
 * P_8x8 / P_8x8ref0 partitions (Tables 7-13/7-17) and P_Skip; B
 * slices with the full Table 7-14/7-18 grammar (L0/L1/Bi 16x16,
 * the two-list 16x8/8x16 pairs, B_8x8 sub-partitions), B_Skip,
 * SPATIAL direct (§8.4.1.2.2 with direct_8x8_inference and the
 * co-located colZeroFlag) AND TEMPORAL direct (§8.4.1.2.3
 * POC-scaled co-located motion), default (§8.4.2.3.1), explicit
 * weighted (§8.4.2.3.2, idc 1) and POC-implicit (idc 2)
 * biprediction;
 * multiple short-term reference frames (sliding-window marking,
 * POC-ordered B lists), intra MBs inside inter slices (incl.
 * I_PCM), quarter-pel luma (§8.4.2.2.1) and eighth-pel chroma
 * (§8.4.2.2.2) interpolation, the full §8.4.1.3 MV prediction
 * (median + directional + single-ref-match rules, per list),
 * explicit weighted prediction for P (§7.3.3.2 / §8.4.2.3.2), and
 * the inter transform_8x8 residual (§8.5.13 on the inter weight
 * lists). SCOPE boundaries, all named errors at the SPI binding
 * point: CABAC inter slices (the inter syntax-element context init
 * tables are not transcribed — the constants-are-never-invented
 * rule) and the long-term machinery (MMCO marking, long-term
 * list-modification ops); SHORT-TERM ref-pic-list modification
 * decodes (§8.2.4.3.1, both lists).
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
    * bS=1 "different reference pictures" test compares it. `poc`
    * orders the B reference lists (§8.2.4.2.3) and `mo` carries the
    * motion state the §8.4.1.2.2 spatial-direct colZeroFlag reads
    * from the co-located picture. */
  final class RefPic(val picId: Int, val frameNum: Int,
                     val wMbs: Int, val hMbs: Int,
                     val y: Array[Byte], val cb: Array[Byte],
                     val cr: Array[Byte],
                     val poc: Int = 0,
                     val mo: MotionCtx = null,
                     /** picId of this picture's own RefPicList0[0]
                       * when it was decoded (−1 for intra pictures) —
                       * §8.4.1.2.3 temporal direct resolves an
                       * intra co-located block's refPicCol to it. */
                     val l0HeadPicId: Int = -1)

  /** Per-picture motion state at 4x4-block granularity (§8.4.1.3
    * neighbor reads, §8.4.1.2.2 spatial direct, §8.7.2.1 bS
    * derivation). List 0 lives in `mvx/mvy/refIdx/refPic` (the
    * original P-slice arrays — `refPic` keeps its NOT_DECODED/INTRA
    * conventions, and an inter block that does not USE list 0 stores
    * INTRA there, which is exactly the §8.4.1.3.2 "predFlagL0 = 0 →
    * refIdx −1 / mv 0" neighbor contribution); list 1 lives in the
    * `*1` twins. `state` disambiguates for the deblocker: 0 not
    * decoded, 1 intra, 2 inter. */
  final class MotionCtx(val w4: Int, val h4: Int) {
    val mvx = new Array[Short](w4 * h4)
    val mvy = new Array[Short](w4 * h4)
    val refPic: Array[Int] = Array.fill(w4 * h4)(NotDecoded)
    val refIdx: Array[Byte] = Array.fill(w4 * h4)(-1)
    val mvx1 = new Array[Short](w4 * h4)
    val mvy1 = new Array[Short](w4 * h4)
    val refPic1: Array[Int] = Array.fill(w4 * h4)(Intra)
    val refIdx1: Array[Byte] = Array.fill(w4 * h4)(-1)
    val state = new Array[Byte](w4 * h4)

    @inline def lMvx(l: Int): Array[Short] = if (l == 0) mvx else mvx1
    @inline def lMvy(l: Int): Array[Short] = if (l == 0) mvy else mvy1
    @inline def lRefIdx(l: Int): Array[Byte] =
      if (l == 0) refIdx else refIdx1
    @inline def lRefPic(l: Int): Array[Int] =
      if (l == 0) refPic else refPic1

    def markIntraMb(mbIdx: Int, wMbs: Int): Unit = {
      val bx0 = (mbIdx % wMbs) * 4; val by0 = (mbIdx / wMbs) * 4
      var by = by0
      while (by < by0 + 4) {
        var bx = bx0
        while (bx < bx0 + 4) {
          val i = by * w4 + bx
          refPic(i) = Intra; refIdx(i) = -1; mvx(i) = 0; mvy(i) = 0
          refPic1(i) = Intra; refIdx1(i) = -1; mvx1(i) = 0; mvy1(i) = 0
          state(i) = 1
          bx += 1
        }
        by += 1
      }
    }

    /** List-0-only inter partition (the P path): list 1 cleared. */
    def setPartition(bx0: Int, by0: Int, pw: Int, ph: Int,
                     mx: Int, my: Int, rIdx: Int, rPic: Int): Unit = {
      var by = by0
      while (by < by0 + ph) {
        var bx = bx0
        while (bx < bx0 + pw) {
          val i = by * w4 + bx
          mvx(i) = mx.toShort; mvy(i) = my.toShort
          refIdx(i) = rIdx.toByte; refPic(i) = rPic
          mvx1(i) = 0; mvy1(i) = 0
          refIdx1(i) = -1; refPic1(i) = Intra
          state(i) = 2
          bx += 1
        }
        by += 1
      }
    }

    /** One list of a B partition; an unused list is written with
      * (rIdx, rPic) = (−1, INTRA) and zero MV. Callers set both
      * lists for every covered block. */
    def setPartitionL(list: Int, bx0: Int, by0: Int, pw: Int,
                      ph: Int, mx: Int, my: Int, rIdx: Int,
                      rPic: Int): Unit = {
      val xs = lMvx(list); val ys = lMvy(list)
      val ris = lRefIdx(list); val rps = lRefPic(list)
      var by = by0
      while (by < by0 + ph) {
        var bx = bx0
        while (bx < bx0 + pw) {
          val i = by * w4 + bx
          xs(i) = mx.toShort; ys(i) = my.toShort
          ris(i) = rIdx.toByte; rps(i) = if (rIdx < 0) Intra else rPic
          state(i) = 2
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

  /** Neighbor read for MV prediction: (available, refIdx, mvx, mvy)
    * for one reference list. A block is available when it is inside
    * the picture, already decoded, and its MB is in the same slice
    * (§6.4.11.7's marking of not-yet-decoded and cross-slice
    * neighbors as unavailable); intra blocks — and inter blocks that
    * do not USE the list — are available but contribute refIdx −1 /
    * mv 0 (§8.4.1.3.2). */
  private def nbr(ctx: H264Mb.PicCtx, mo: MotionCtx, sliceId: Int,
                  bx: Int, by: Int, list: Int = 0)
      : (Boolean, Int, Int, Int) = {
    if (bx < 0 || by < 0 || bx >= mo.w4 || by >= mo.h4)
      return (false, -1, 0, 0)
    val mb = (by >> 2) * ctx.wMbs + (bx >> 2)
    if (ctx.sliceId(mb) != sliceId) return (false, -1, 0, 0)
    val i = by * mo.w4 + bx
    if (mo.state(i) == 0) return (false, -1, 0, 0)
    val ri = mo.lRefIdx(list)(i).toInt
    if (ri < 0) (true, -1, 0, 0)
    else (true, ri, mo.lMvx(list)(i).toInt, mo.lMvy(list)(i).toInt)
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
             partKind: Int, list: Int = 0): (Int, Int) = {
    val a = nbr(ctx, mo, sliceId, bx - 1, by, list)
    val b = nbr(ctx, mo, sliceId, bx, by - 1, list)
    val c0 = nbr(ctx, mo, sliceId, bx + w4, by - 1, list)
    val c =
      if (c0._1) c0 else nbr(ctx, mo, sliceId, bx - 1, by - 1, list)

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

  /** Explicit weighted-prediction parameters for list 0 (§7.3.3.2):
    * per-refIdx luma/chroma weights and offsets plus the shared
    * log2 denominators. Defaults (absent flags) are the identity
    * weight `1 << denom` with offset 0. */
  final case class PredWeights(lumaDenom: Int, chromaDenom: Int,
                               wY: Array[Int], oY: Array[Int],
                               wCb: Array[Int], oCb: Array[Int],
                               wCr: Array[Int], oCr: Array[Int])

  /** One list's weight entries given the shared denominators. */
  private def parseWeightEntries(r: BitReader, n: Int, lumaDenom: Int,
                                 chromaDenom: Int): PredWeights = {
    val wY = Array.fill(n)(1 << lumaDenom)
    val oY = new Array[Int](n)
    val wCb = Array.fill(n)(1 << chromaDenom)
    val oCb = new Array[Int](n)
    val wCr = Array.fill(n)(1 << chromaDenom)
    val oCr = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (r.u(1) == 1) { wY(i) = r.se(); oY(i) = r.se() }
      if (r.u(1) == 1) {
        wCb(i) = r.se(); oCb(i) = r.se()
        wCr(i) = r.se(); oCr(i) = r.se()
      }
      i += 1
    }
    PredWeights(lumaDenom, chromaDenom, wY, oY, wCb, oCb, wCr, oCr)
  }

  /** Parse pred_weight_table (§7.3.3.2) for a P slice (list 0 only,
    * 4:2:0 so the chroma syntax is present). */
  def parsePredWeightTable(r: BitReader,
                           numRefActive: Int): PredWeights = {
    val lumaDenom = r.ue()
    val chromaDenom = r.ue()
    require(lumaDenom <= 7 && chromaDenom <= 7,
      s"log2 weight denom out of range: $lumaDenom/$chromaDenom")
    parseWeightEntries(r, numRefActive, lumaDenom, chromaDenom)
  }

  /** Parse pred_weight_table for a B slice under
    * weighted_bipred_idc 1: shared denominators, then list-0 and
    * list-1 entry blocks. */
  def parsePredWeightTableB(r: BitReader, numRef0: Int,
                            numRef1: Int): (PredWeights, PredWeights) = {
    val lumaDenom = r.ue()
    val chromaDenom = r.ue()
    require(lumaDenom <= 7 && chromaDenom <= 7,
      s"log2 weight denom out of range: $lumaDenom/$chromaDenom")
    val p0 = parseWeightEntries(r, numRef0, lumaDenom, chromaDenom)
    val p1 = parseWeightEntries(r, numRef1, lumaDenom, chromaDenom)
    (p0, p1)
  }

  /** Encoder twin of [[parsePredWeightTable]]; for the B form
    * ([[parsePredWeightTableB]]) call once per list with
    * `denoms = false` on the second. */
  private[graft] def writePredWeightTable(w: BitWriter,
                                          pw: PredWeights,
                                          denoms: Boolean = true)
      : Unit = {
    if (denoms) {
      w.ue(pw.lumaDenom)
      w.ue(pw.chromaDenom)
    }
    var i = 0
    while (i < pw.wY.length) {
      val defY = pw.wY(i) == (1 << pw.lumaDenom) && pw.oY(i) == 0
      if (defY) w.u(0, 1)
      else { w.u(1, 1); w.se(pw.wY(i)); w.se(pw.oY(i)) }
      val defC = pw.wCb(i) == (1 << pw.chromaDenom) &&
        pw.oCb(i) == 0 &&
        pw.wCr(i) == (1 << pw.chromaDenom) && pw.oCr(i) == 0
      if (defC) w.u(0, 1)
      else {
        w.u(1, 1)
        w.se(pw.wCb(i)); w.se(pw.oCb(i))
        w.se(pw.wCr(i)); w.se(pw.oCr(i))
      }
      i += 1
    }
  }

  /** §8.4.2.3.2 explicit weighted sample prediction, single list:
    * `((pred·w + 2^(d−1)) >> d) + o` (plain `pred·w + o` at d = 0),
    * clipped — applied in place over one partition's region of an
    * MB-local pred buffer. */
  private[graft] def applyWeight(out: Array[Int], stride: Int,
                          ox: Int,
                          oy: Int, w: Int, h: Int, wgt: Int,
                          off: Int, denom: Int): Unit = {
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        val idx = (oy + j) * stride + ox + i
        val v =
          if (denom >= 1)
            ((out(idx) * wgt + (1 << (denom - 1))) >> denom) + off
          else out(idx) * wgt + off
        out(idx) = clip3(0, 255, v)
        i += 1
      }
      j += 1
    }
  }

  /** Parse ref_pic_list_modification ops for ONE list (§7.3.3.1,
    * the flag already read as 1): (idc, abs_diff_pic_num_minus1)
    * pairs until idc 3. Long-term ops (idc 2) are a named error —
    * long-term marking itself is out of scope. */
  def parseListModification(r: BitReader): Seq[(Int, Int)] = {
    val ops = Seq.newBuilder[(Int, Int)]
    var idc = r.ue()
    var n = 0
    while (idc != 3) {
      require(idc == 0 || idc == 1,
        s"modification_of_pic_nums_idc $idc unsupported " +
          "(long-term reference ops are out of scope)")
      ops += ((idc, r.ue()))
      n += 1
      require(n <= 32, "runaway ref_pic_list_modification")
      idc = r.ue()
    }
    ops.result()
  }

  /** Encoder twin of [[parseListModification]]. */
  private[multimodal] def writeListModification(
      w: BitWriter, ops: Seq[(Int, Int)]): Unit = {
    ops.foreach { case (idc, v) => w.ue(idc); w.ue(v) }
    w.ue(3)
  }

  /**
   * §8.2.4.3.1 short-term reordering: each op derives picNumLX from
   * the running predictor (init CurrPicNum, modular in MaxPicNum),
   * inserts the matching short-term picture at the front cursor and
   * squeezes later duplicates out; the list truncates back to
   * `numRefActive`.
   */
  def applyListModification(init: IndexedSeq[RefPic],
                            ops: Seq[(Int, Int)], currPicNum: Int,
                            maxPicNum: Int,
                            numRefActive: Int): IndexedSeq[RefPic] = {
    def picNum(rp: RefPic): Int =
      if (rp.frameNum > currPicNum) rp.frameNum - maxPicNum
      else rp.frameNum
    val list = scala.collection.mutable.ArrayBuffer[RefPic](
      init.take(numRefActive): _*)
    var pred = currPicNum
    var refIdx = 0
    ops.foreach { case (idc, absM1) =>
      val noWrap =
        if (idc == 0) {
          val v = pred - (absM1 + 1)
          if (v < 0) v + maxPicNum else v
        } else {
          val v = pred + absM1 + 1
          if (v >= maxPicNum) v - maxPicNum else v
        }
      pred = noWrap
      val pn = if (noWrap > currPicNum) noWrap - maxPicNum else noWrap
      val pic = init.find(picNum(_) == pn).getOrElse(
        throw new IllegalArgumentException(
          s"list modification references absent PicNum $pn"))
      // insert at refIdx, shift, then drop the later duplicate
      list.insert(refIdx, pic)
      refIdx += 1
      val dup = list.indexWhere(p => (p eq pic), refIdx)
      if (dup >= 0) list.remove(dup)
      while (list.size > numRefActive) list.remove(list.size - 1)
    }
    list.toIndexedSeq
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
    * MB-local pred buffers; explicit weighted prediction (§8.4.2.3.2)
    * applies per `refIdx` when a pred_weight_table is in force. */
  private def mcPartition(ref: RefPic, mbX: Int, mbY: Int, p: Part,
                          mx: Int, my: Int, predY: Array[Int],
                          predCb: Array[Int], predCr: Array[Int],
                          refIdx: Int = 0,
                          pw: PredWeights = null): Unit = {
    val lw = ref.wMbs * 16; val lh = ref.hMbs * 16
    val cw = ref.wMbs * 8; val ch = ref.hMbs * 8
    predLuma(ref.y, lw, lh, mbX * 16 + p.px * 4, mbY * 16 + p.py * 4,
      mx, my, p.w4 * 4, p.h4 * 4, predY, p.px * 4, p.py * 4)
    predChroma(ref.cb, cw, ch, mbX * 8 + p.px * 2, mbY * 8 + p.py * 2,
      mx, my, p.w4 * 2, p.h4 * 2, predCb, p.px * 2, p.py * 2)
    predChroma(ref.cr, cw, ch, mbX * 8 + p.px * 2, mbY * 8 + p.py * 2,
      mx, my, p.w4 * 2, p.h4 * 2, predCr, p.px * 2, p.py * 2)
    if (pw != null) {
      applyWeight(predY, 16, p.px * 4, p.py * 4, p.w4 * 4, p.h4 * 4,
        pw.wY(refIdx), pw.oY(refIdx), pw.lumaDenom)
      applyWeight(predCb, 8, p.px * 2, p.py * 2, p.w4 * 2, p.h4 * 2,
        pw.wCb(refIdx), pw.oCb(refIdx), pw.chromaDenom)
      applyWeight(predCr, 8, p.px * 2, p.py * 2, p.w4 * 2, p.h4 * 2,
        pw.wCr(refIdx), pw.oCr(refIdx), pw.chromaDenom)
    }
  }

  /** Decode one P_Skip MB: 16x16 MC at the §8.4.1.1 skip motion from
    * refIdx 0, no residual; QP carries over unchanged. */
  def decodeSkipMb(ctx: H264Mb.PicCtx, mo: MotionCtx, sliceId: Int,
                   mbIdx: Int, refList: IndexedSeq[RefPic],
                   yP: Array[Byte], cbP: Array[Byte],
                   crP: Array[Byte],
                   pw: PredWeights = null): Unit = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    ctx.sliceId(mbIdx) = sliceId
    val (mx, my) = skipMv(ctx, mo, sliceId, mbX * 4, mbY * 4)
    val predY = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    val ref = refList(0)
    mcPartition(ref, mbX, mbY, Part(0, 0, 4, 4, PartNormal), mx, my,
      predY, predCb, predCr, 0, pw)
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
                    cbP: Array[Byte], crP: Array[Byte],
                    pw: PredWeights = null): Int = {
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
      mcPartition(ref, mbX, mbY, pt, mx, my, predY, predCb, predCr,
        ri, pw)
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

  // ---------------------------------------------------------------
  // B slices (§7.3.5.1 Table 7-14/7-18, §8.4.1.2 direct, §8.4.2.3.1)
  // ---------------------------------------------------------------

  /** One B partition: geometry plus list usage. `direct` partitions
    * derive their motion from §8.4.1.2.2 (spatial) instead of
    * carrying refs/mvds. */
  private final case class BPart(px: Int, py: Int, w4: Int, h4: Int,
                                 kind: Int, useL0: Boolean,
                                 useL1: Boolean, direct: Boolean)

  // (useL0, useL1) for the Pred_L0 / Pred_L1 / BiPred codes
  private val predModes: Array[(Boolean, Boolean)] =
    Array((true, false), (false, true), (true, true))

  /** Table 7-14: B mb_type 0..21 → partitions (22 = B_8x8 handled
    * via sub_mb_types; ≥ 23 = intra, offset −23). */
  private def bParts(mbType: Int): Seq[BPart] = {
    if (mbType == 0)
      return Seq(BPart(0, 0, 4, 4, PartNormal, useL0 = false,
        useL1 = false, direct = true))
    if (mbType <= 3) {
      val (l0, l1) = predModes(mbType - 1)
      return Seq(BPart(0, 0, 4, 4, PartNormal, l0, l1,
        direct = false))
    }
    require(mbType <= 21, s"B mb_type $mbType out of Table 7-14")
    // 4..21: (pred0, pred1) pairs in the order
    // (L0,L0),(L1,L1),(L0,L1),(L1,L0),(L0,Bi),(L1,Bi),(Bi,L0),
    // (Bi,L1),(Bi,Bi); even = 16x8, odd = 8x16
    val pairIdx = (mbType - 4) >> 1
    val is8x16 = ((mbType - 4) & 1) == 1
    val pairs = Array((0, 0), (1, 1), (0, 1), (1, 0), (0, 2), (1, 2),
      (2, 0), (2, 1), (2, 2))
    val (m0, m1) = pairs(pairIdx)
    val (a0, a1) = predModes(m0)
    val (b0, b1) = predModes(m1)
    if (is8x16)
      Seq(BPart(0, 0, 2, 4, Part8x16Left, a0, a1, direct = false),
        BPart(2, 0, 2, 4, Part8x16Right, b0, b1, direct = false))
    else
      Seq(BPart(0, 0, 4, 2, Part16x8Top, a0, a1, direct = false),
        BPart(0, 2, 4, 2, Part16x8Bottom, b0, b1, direct = false))
  }

  /** Table 7-18: B sub_mb_type → sub-partitions of one 8x8 (offsets
    * relative to the 8x8). */
  private def bSubParts(subType: Int): Seq[BPart] = {
    def mk(shapes: Seq[(Int, Int, Int, Int)], l0: Boolean,
           l1: Boolean): Seq[BPart] =
      shapes.map(s => BPart(s._1, s._2, s._3, s._4, PartNormal, l0,
        l1, direct = false))
    val whole = Seq((0, 0, 2, 2))
    val h2 = Seq((0, 0, 2, 1), (0, 1, 2, 1))
    val v2 = Seq((0, 0, 1, 2), (1, 0, 1, 2))
    val q4 = Seq((0, 0, 1, 1), (1, 0, 1, 1), (0, 1, 1, 1),
      (1, 1, 1, 1))
    subType match {
      case 0 => Seq(BPart(0, 0, 2, 2, PartNormal, useL0 = false,
        useL1 = false, direct = true)) // B_Direct_8x8
      case 1 => mk(whole, l0 = true, l1 = false)
      case 2 => mk(whole, l0 = false, l1 = true)
      case 3 => mk(whole, l0 = true, l1 = true)
      case 4 => mk(h2, l0 = true, l1 = false)
      case 5 => mk(v2, l0 = true, l1 = false)
      case 6 => mk(h2, l0 = false, l1 = true)
      case 7 => mk(v2, l0 = false, l1 = true)
      case 8 => mk(h2, l0 = true, l1 = true)
      case 9 => mk(v2, l0 = true, l1 = true)
      case 10 => mk(q4, l0 = true, l1 = false)
      case 11 => mk(q4, l0 = false, l1 = true)
      case 12 => mk(q4, l0 = true, l1 = true)
      case other =>
        throw new IllegalArgumentException(
          s"B sub_mb_type $other out of Table 7-18")
    }
  }

  /** MinPositive (§8.4.1.2.2): min when both non-negative, else the
    * larger (i.e. the non-negative one, or −1 when both are). */
  @inline private def minPositive(a: Int, b: Int): Int =
    if (a >= 0 && b >= 0) math.min(a, b) else math.max(a, b)

  /** Derived spatial-direct motion for one MB: per-list refIdx and
    * predicted MV, plus the co-located picture handle for the
    * per-block colZeroFlag moderation. */
  private final case class DirectMv(refIdxL0: Int, refIdxL1: Int,
                                    mv0: (Int, Int), mv1: (Int, Int),
                                    zeroAll: Boolean)

  /**
   * §8.4.1.2.2 spatial direct, MB-level part: list refIdx = the
   * MinPositive over the 16x16's A/B/C neighbors, MVs = the
   * §8.4.1.3.1 median prediction per list; when NO neighbor
   * references either list, both lists predict ref 0 with zero MVs
   * unconditionally (directZeroPredictionFlag).
   */
  private def spatialDirectMb(ctx: H264Mb.PicCtx, mo: MotionCtx,
                              sliceId: Int, mbIdx: Int): DirectMv = {
    val bx = (mbIdx % ctx.wMbs) * 4; val by = (mbIdx / ctx.wMbs) * 4
    def lrf(list: Int): Int = {
      val a = nbr(ctx, mo, sliceId, bx - 1, by, list)
      val b = nbr(ctx, mo, sliceId, bx, by - 1, list)
      val c0 = nbr(ctx, mo, sliceId, bx + 4, by - 1, list)
      val c =
        if (c0._1) c0 else nbr(ctx, mo, sliceId, bx - 1, by - 1, list)
      minPositive(minPositive(a._2, b._2), c._2)
    }
    val r0 = lrf(0); val r1 = lrf(1)
    if (r0 < 0 && r1 < 0)
      return DirectMv(0, 0, (0, 0), (0, 0), zeroAll = true)
    val mv0 =
      if (r0 >= 0) mvPred(ctx, mo, sliceId, bx, by, 4, r0, PartNormal,
        0)
      else (0, 0)
    val mv1 =
      if (r1 >= 0) mvPred(ctx, mo, sliceId, bx, by, 4, r1, PartNormal,
        1)
      else (0, 0)
    DirectMv(r0, r1, mv0, mv1, zeroAll = false)
  }

  /** colZeroFlag (§8.4.1.2.2): the co-located block in RefPicList1[0]
    * is a zero-ish motion ref-0 block. With direct_8x8_inference the
    * co-located 4x4 is the OUTER CORNER of the co-located 8x8:
    * b 0→(0,0), 1→(3,0), 2→(0,3), 3→(3,3) in MB-relative 4x4 units. */
  private def colZero(colPic: RefPic, mbIdx: Int, b8: Int): Boolean = {
    if (colPic == null || colPic.mo == null) return false
    val mo = colPic.mo
    val mbX = mbIdx % colPic.wMbs; val mbY = mbIdx / colPic.wMbs
    val cx = mbX * 4 + (if ((b8 & 1) == 1) 3 else 0)
    val cy = mbY * 4 + (if ((b8 & 2) == 2) 3 else 0)
    val i = cy * mo.w4 + cx
    if (mo.state(i) != 2) return false // intra co-located: no zeroing
    // the co-located block's "refIdxCol": its L0 ref if used, else L1
    val (ri, mx, my) =
      if (mo.refIdx(i) >= 0)
        (mo.refIdx(i).toInt, mo.mvx(i).toInt, mo.mvy(i).toInt)
      else (mo.refIdx1(i).toInt, mo.mvx1(i).toInt, mo.mvy1(i).toInt)
    ri == 0 && mx >= -1 && mx <= 1 && my >= -1 && my <= 1
  }

  /**
   * §8.4.1.2.3 temporal direct for one 8x8: the co-located block's
   * motion scaled by POC distances. Returns (refIdxL0, mvL0, mvL1);
   * refIdxL1 is 0 by definition. `tx = (16384 + |td/2|) / td`,
   * `DistScaleFactor = Clip3(−1024, 1023, (tb·tx + 32) >> 6)`,
   * `mvL0 = (DSF·mvCol + 128) >> 8`, `mvL1 = mvL0 − mvCol`; a
   * zero POC distance copies the co-located motion. An intra
   * co-located block contributes zero motion referencing the
   * co-located picture's own list-0 head.
   */
  private[graft] def temporalDirect(colPic: RefPic, mbIdx: Int, b8: Int,
                             l0: IndexedSeq[RefPic], curPoc: Int)
      : (Int, (Int, Int), (Int, Int)) = {
    val mo = colPic.mo
    val mbX = mbIdx % colPic.wMbs; val mbY = mbIdx / colPic.wMbs
    val cx = mbX * 4 + (if ((b8 & 1) == 1) 3 else 0)
    val cy = mbY * 4 + (if ((b8 & 2) == 2) 3 else 0)
    val i = cy * mo.w4 + cx
    val (colRefPicId, mvColX, mvColY) =
      if (mo.state(i) != 2) (colPic.l0HeadPicId, 0, 0)
      else if (mo.refPic(i) >= 0)
        (mo.refPic(i), mo.mvx(i).toInt, mo.mvy(i).toInt)
      else (mo.refPic1(i), mo.mvx1(i).toInt, mo.mvy1(i).toInt)
    // map refPicCol into the CURRENT list 0 (lowest index); an
    // unresolvable picture (intra co-located inside an I anchor)
    // falls back to index 0
    val idx = l0.indexWhere(_.picId == colRefPicId)
    val ri0 = if (idx >= 0) idx else 0
    val pic0 = l0(ri0)
    if (colPic.poc == pic0.poc)
      (ri0, (mvColX, mvColY), (0, 0))
    else {
      val tb = clip3(-128, 127, curPoc - pic0.poc)
      val td = clip3(-128, 127, colPic.poc - pic0.poc)
      val tx = (16384 + math.abs(td / 2)) / td
      val dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
      val m0 = ((dsf * mvColX + 128) >> 8, (dsf * mvColY + 128) >> 8)
      (ri0, m0, (m0._1 - mvColX, m0._2 - mvColY))
    }
  }

  /** Average two MB-local pred buffers over one partition region —
    * §8.4.2.3.1 default biprediction. */
  private def avgRegion(a: Array[Int], b: Array[Int], stride: Int,
                        ox: Int, oy: Int, w: Int, h: Int): Unit = {
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        val idx = (oy + j) * stride + ox + i
        a(idx) = (a(idx) + b(idx) + 1) >> 1
        i += 1
      }
      j += 1
    }
  }

  /** §8.4.2.3.2 explicit weighted BIprediction over one region:
    * `Clip1(((p0·w0 + p1·w1 + 2^logWD) >> (logWD+1)) +
    * ((o0+o1+1) >> 1))`. */
  private[graft] def biWeightRegion(a: Array[Int], b: Array[Int],
                                    stride: Int, ox: Int, oy: Int,
                                    w: Int, h: Int, w0: Int, w1: Int,
                                    o0: Int, o1: Int,
                                    denom: Int): Unit = {
    val rnd = 1 << denom
    val off = (o0 + o1 + 1) >> 1
    var j = 0
    while (j < h) {
      var i = 0
      while (i < w) {
        val idx = (oy + j) * stride + ox + i
        a(idx) = clip3(0, 255,
          ((a(idx) * w0 + b(idx) * w1 + rnd) >> (denom + 1)) + off)
        i += 1
      }
      j += 1
    }
  }

  /** §8.4.2.3.1 IMPLICIT biprediction weights (idc 2): derived from
    * the POC distances of the two references; (32, 32) when the
    * references share a POC or the scale leaves [−64, 128]. */
  private[graft] def implicitBiWeights(curPoc: Int, poc0: Int,
                                       poc1: Int): (Int, Int) = {
    if (poc1 == poc0) return (32, 32)
    val tb = clip3(-128, 127, curPoc - poc0)
    val td = clip3(-128, 127, poc1 - poc0)
    val tx = (16384 + math.abs(td / 2)) / td
    val dsf = clip3(-1024, 1023, (tb * tx + 32) >> 6)
    val w1 = dsf >> 2
    if (w1 < -64 || w1 > 128) (32, 32) else (64 - w1, w1)
  }

  /** Motion-compensate one B partition: single-list into the main
    * buffers (per-list explicit weights when in force, §8.4.2.3.2),
    * BiPred as the rounded average (§8.4.2.3.1, idc 0), the
    * explicit weighted combine (idc 1), or the POC-implicit combine
    * (idc 2) of both lists' predictions. */
  private def mcB(pt: Part, mbX: Int, mbY: Int,
                  useL0: Boolean, useL1: Boolean,
                  r0: RefPic, mv0: (Int, Int),
                  r1: RefPic, mv1: (Int, Int),
                  predY: Array[Int], predCb: Array[Int],
                  predCr: Array[Int],
                  ri0: Int = 0, ri1: Int = 0,
                  pw0: PredWeights = null,
                  pw1: PredWeights = null,
                  implicitBi: Boolean = false,
                  curPoc: Int = 0): Unit = {
    if (useL0 && useL1) {
      val tY = new Array[Int](256)
      val tCb = new Array[Int](64); val tCr = new Array[Int](64)
      // RAW interpolated predictions; weighting happens at the
      // combine (the §8.4.2.3.2 bi formula weights the pair)
      mcPartition(r0, mbX, mbY, pt, mv0._1, mv0._2, predY, predCb,
        predCr)
      mcPartition(r1, mbX, mbY, pt, mv1._1, mv1._2, tY, tCb, tCr)
      if (implicitBi) {
        val (w0, w1) = implicitBiWeights(curPoc, r0.poc, r1.poc)
        biWeightRegion(predY, tY, 16, pt.px * 4, pt.py * 4,
          pt.w4 * 4, pt.h4 * 4, w0, w1, 0, 0, 5)
        biWeightRegion(predCb, tCb, 8, pt.px * 2, pt.py * 2,
          pt.w4 * 2, pt.h4 * 2, w0, w1, 0, 0, 5)
        biWeightRegion(predCr, tCr, 8, pt.px * 2, pt.py * 2,
          pt.w4 * 2, pt.h4 * 2, w0, w1, 0, 0, 5)
      } else if (pw0 != null && pw1 != null) {
        biWeightRegion(predY, tY, 16, pt.px * 4, pt.py * 4,
          pt.w4 * 4, pt.h4 * 4, pw0.wY(ri0), pw1.wY(ri1),
          pw0.oY(ri0), pw1.oY(ri1), pw0.lumaDenom)
        biWeightRegion(predCb, tCb, 8, pt.px * 2, pt.py * 2,
          pt.w4 * 2, pt.h4 * 2, pw0.wCb(ri0), pw1.wCb(ri1),
          pw0.oCb(ri0), pw1.oCb(ri1), pw0.chromaDenom)
        biWeightRegion(predCr, tCr, 8, pt.px * 2, pt.py * 2,
          pt.w4 * 2, pt.h4 * 2, pw0.wCr(ri0), pw1.wCr(ri1),
          pw0.oCr(ri0), pw1.oCr(ri1), pw0.chromaDenom)
      } else {
        avgRegion(predY, tY, 16, pt.px * 4, pt.py * 4, pt.w4 * 4,
          pt.h4 * 4)
        avgRegion(predCb, tCb, 8, pt.px * 2, pt.py * 2, pt.w4 * 2,
          pt.h4 * 2)
        avgRegion(predCr, tCr, 8, pt.px * 2, pt.py * 2, pt.w4 * 2,
          pt.h4 * 2)
      }
    } else if (useL0) {
      mcPartition(r0, mbX, mbY, pt, mv0._1, mv0._2, predY, predCb,
        predCr, ri0, pw0)
    } else {
      mcPartition(r1, mbX, mbY, pt, mv1._1, mv1._2, predY, predCb,
        predCr, ri1, pw1)
    }
  }

  /** Decode the motion + MC of one DIRECT region (whole MB or one
    * 8x8): SPATIAL (per-8x8 colZeroFlag moderation of the MB-level
    * `dm`) or TEMPORAL (per-8x8 POC-scaled co-located motion), both
    * lists stored. `b8s` = the 8x8 indices covered. */
  private def mcDirect(ctx: H264Mb.PicCtx, mo: MotionCtx,
                       sliceId: Int, mbIdx: Int, dm: DirectMv,
                       b8s: Seq[Int], l0: IndexedSeq[RefPic],
                       l1: IndexedSeq[RefPic], colPic: RefPic,
                       predY: Array[Int], predCb: Array[Int],
                       predCr: Array[Int],
                       spatial: Boolean = true,
                       curPoc: Int = 0,
                       pw0: PredWeights = null,
                       pw1: PredWeights = null,
                       implicitBi: Boolean = false): Unit = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    b8s.foreach { b8 =>
      val ox = (b8 & 1) * 2; val oy = (b8 >> 1) * 2
      val (useL0, useL1, ri0, ri1, m0, m1) =
        if (spatial) {
          val cz = !dm.zeroAll && colZero(colPic, mbIdx, b8)
          val u0 = dm.refIdxL0 >= 0 || dm.zeroAll
          val u1 = dm.refIdxL1 >= 0 || dm.zeroAll
          val mv0 =
            if (dm.zeroAll || (cz && dm.refIdxL0 == 0)) (0, 0)
            else dm.mv0
          val mv1 =
            if (dm.zeroAll || (cz && dm.refIdxL1 == 0)) (0, 0)
            else dm.mv1
          (u0, u1, if (dm.zeroAll) 0 else dm.refIdxL0,
            if (dm.zeroAll) 0 else dm.refIdxL1, mv0, mv1)
        } else {
          val (r0, mv0, mv1) = temporalDirect(colPic, mbIdx, b8, l0,
            curPoc)
          (true, true, r0, 0, mv0, mv1)
        }
      val pt = Part(ox, oy, 2, 2, PartNormal)
      mcB(pt, mbX, mbY, useL0, useL1,
        if (useL0) l0(ri0) else null, m0,
        if (useL1) l1(ri1) else null, m1,
        predY, predCb, predCr, ri0, ri1, pw0, pw1, implicitBi,
        curPoc)
      val gx = mbX * 4 + ox; val gy = mbY * 4 + oy
      mo.setPartitionL(0, gx, gy, 2, 2, m0._1, m0._2,
        if (useL0) ri0 else -1, if (useL0) l0(ri0).picId else -1)
      mo.setPartitionL(1, gx, gy, 2, 2, m1._1, m1._2,
        if (useL1) ri1 else -1, if (useL1) l1(ri1).picId else -1)
    }
  }

  /** Decode one B_Skip MB (§8.4.1.2 direct motion, no residual). */
  def decodeBSkipMb(ctx: H264Mb.PicCtx, mo: MotionCtx, sliceId: Int,
                    mbIdx: Int, l0: IndexedSeq[RefPic],
                    l1: IndexedSeq[RefPic], colPic: RefPic,
                    yP: Array[Byte], cbP: Array[Byte],
                    crP: Array[Byte],
                    directSpatial: Boolean = true,
                    curPoc: Int = 0,
                    pw0: PredWeights = null,
                    pw1: PredWeights = null,
                    implicitBi: Boolean = false): Unit = {
    ctx.sliceId(mbIdx) = sliceId
    val dm =
      if (directSpatial) spatialDirectMb(ctx, mo, sliceId, mbIdx)
      else null
    val predY = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    mcDirect(ctx, mo, sliceId, mbIdx, dm, 0 until 4, l0, l1, colPic,
      predY, predCb, predCr, directSpatial, curPoc, pw0, pw1,
      implicitBi)
    writePred(ctx, mbIdx, predY, predCb, predCr, yP, cbP, crP)
    clearNz(ctx, mbIdx)
  }

  /**
   * Decode one inter-coded B MB (Table 7-14 mb_type 0..22, CAVLC).
   * Parse order per §7.3.5.1: [sub_mb_type×4,] all ref_idx_l0, all
   * ref_idx_l1, all mvd_l0, all mvd_l1, coded_block_pattern,
   * [transform_size_8x8_flag,] [mb_qp_delta,] residuals. Direct
   * partitions (B_Direct_16x16 / B_Direct_8x8) derive spatial-direct
   * motion. Returns the updated luma QP.
   */
  def decodeBMb(r: BitReader, mbType: Int, ctx: H264Mb.PicCtx,
                mo: MotionCtx, sliceId: Int, mbIdx: Int,
                qpYPrev: Int, p: Pps, l0: IndexedSeq[RefPic],
                l1: IndexedSeq[RefPic], numRef0: Int, numRef1: Int,
                colPic: RefPic, yP: Array[Byte], cbP: Array[Byte],
                crP: Array[Byte],
                directSpatial: Boolean = true,
                curPoc: Int = 0,
                pw0: PredWeights = null,
                pw1: PredWeights = null,
                implicitBi: Boolean = false,
                direct8x8Inference: Boolean = true): Int = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    ctx.sliceId(mbIdx) = sliceId
    ctx.is8x8(mbIdx) = false

    val is8x8Mb = mbType == 22
    val subTypes: Array[Int] =
      if (is8x8Mb) Array.fill(4)(r.ue()) else null
    // partitions: MB-level (with their 8x8 coverage) or per-sub
    val parts: Seq[(BPart, Int)] = // partition, owning 8x8 (or -1)
      if (is8x8Mb) {
        (0 until 4).flatMap { b =>
          val ox = (b & 1) * 2; val oy = (b >> 1) * 2
          bSubParts(subTypes(b)).map(sp =>
            (sp.copy(px = ox + sp.px, py = oy + sp.py), b))
        }
      } else bParts(mbType).map((_, -1))
    // ref_idx parse: per partition-or-8x8 that uses the list, list 0
    // then list 1 (for B_8x8, refs are per 8x8, shared by its subs)
    def rsl: Seq[Int] = // indices into a per-slot ref array
      if (is8x8Mb) 0 until 4 else parts.indices
    def slu(list: Int, slot: Int): Boolean =
      if (is8x8Mb) {
        val st = subTypes(slot)
        if (st == 0) false
        else {
          val sp = bSubParts(st).head
          if (list == 0) sp.useL0 else sp.useL1
        }
      } else {
        val pt = parts(slot)._1
        !pt.direct && (if (list == 0) pt.useL0 else pt.useL1)
      }
    val refs0 = new Array[Int](rsl.size)
    val refs1 = new Array[Int](rsl.size)
    rsl.foreach { s =>
      if (slu(0, s)) {
        refs0(s) = te(r, numRef0 - 1)
        require(refs0(s) < l0.size,
          s"ref_idx_l0 ${refs0(s)} but only ${l0.size} refs")
      }
    }
    rsl.foreach { s =>
      if (slu(1, s)) {
        refs1(s) = te(r, numRef1 - 1)
        require(refs1(s) < l1.size,
          s"ref_idx_l1 ${refs1(s)} but only ${l1.size} refs")
      }
    }
    // mvd parse: all list-0 mvds in partition order, then list 1
    val mvd0 = parts.map { case (pt, _) =>
      if (pt.useL0) (r.se(), r.se()) else (0, 0)
    }
    val mvd1 = parts.map { case (pt, _) =>
      if (pt.useL1) (r.se(), r.se()) else (0, 0)
    }

    // --- derive motion sequentially, MC each partition ---
    val predY = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    // direct derivation uses the NEIGHBOR state before this MB's
    // non-direct partitions write — derive it up front (it is
    // MB-level in §8.4.1.2.2); temporal direct reads only the
    // co-located picture, so it has no such ordering concern
    lazy val dm =
      if (directSpatial) spatialDirectMb(ctx, mo, sliceId, mbIdx)
      else null
    parts.zipWithIndex.foreach { case ((pt, b8), pi) =>
      if (pt.direct) {
        val covered = if (is8x8Mb) Seq(b8) else (0 until 4)
        mcDirect(ctx, mo, sliceId, mbIdx, dm, covered, l0, l1,
          colPic, predY, predCb, predCr, directSpatial, curPoc,
          pw0, pw1, implicitBi)
      } else {
        val slot = if (is8x8Mb) b8 else pi
        val gx = mbX * 4 + pt.px; val gy = mbY * 4 + pt.py
        val (m0, r0) =
          if (pt.useL0) {
            val ri = refs0(slot)
            val (px0, py0) = mvPred(ctx, mo, sliceId, gx, gy, pt.w4,
              ri, pt.kind, 0)
            ((px0 + mvd0(pi)._1, py0 + mvd0(pi)._2), ri)
          } else ((0, 0), -1)
        val (m1, r1ri) =
          if (pt.useL1) {
            val ri = refs1(slot)
            val (px1, py1) = mvPred(ctx, mo, sliceId, gx, gy, pt.w4,
              ri, pt.kind, 1)
            ((px1 + mvd1(pi)._1, py1 + mvd1(pi)._2), ri)
          } else ((0, 0), -1)
        mcB(Part(pt.px, pt.py, pt.w4, pt.h4, pt.kind), mbX, mbY,
          pt.useL0, pt.useL1,
          if (pt.useL0) l0(r0) else null, m0,
          if (pt.useL1) l1(r1ri) else null, m1,
          predY, predCb, predCr, r0, r1ri, pw0, pw1, implicitBi,
          curPoc)
        mo.setPartitionL(0, gx, gy, pt.w4, pt.h4, m0._1, m0._2,
          if (pt.useL0) r0 else -1,
          if (pt.useL0) l0(r0).picId else -1)
        mo.setPartitionL(1, gx, gy, pt.w4, pt.h4, m1._1, m1._2,
          if (pt.useL1) r1ri else -1,
          if (pt.useL1) l1(r1ri).picId else -1)
      }
    }

    // --- coded_block_pattern + transform_size_8x8_flag ---
    val code = r.ue()
    require(code < 48, s"inter cbp codeNum $code out of range")
    val cbp = interCbpFromCode(code)
    val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
    require(cbpChroma <= 2, s"cbp chroma $cbpChroma")
    // §7.3.5: B_Direct_16x16 carries transform_size_8x8_flag only
    // under direct_8x8_inference (threaded from the SPS; the slice
    // header separately names inference=0 unsupported, so the flag
    // is true on every path that reaches here today); B_8x8 must
    // have no sub-partition below 8x8 (direct subs count as 8x8
    // under inference)
    val t8Allowed = p.transform8x8 && cbpLuma != 0 &&
      (mbType != 0 || direct8x8Inference) &&
      (!is8x8Mb || subTypes.forall(st => st <= 3))
    val use8 = t8Allowed && r.u(1) == 1
    ctx.is8x8(mbIdx) = use8
    var qpY = qpYPrev
    if (cbp != 0) {
      val delta = r.se()
      require(delta >= -26 && delta <= 25, s"mb_qp_delta $delta")
      qpY = (qpY + delta + 52) % 52
    }
    val lumaAc = parseLumaResidual(r, ctx, mbX, mbY, sliceId, mbIdx,
      cbpLuma)
    val (cbDc, crDc, cbAc, crAc) =
      parseChromaResidual(r, ctx, mbX, mbY, sliceId, mbIdx, cbpChroma)
    ctx.cbpLumaArr(mbIdx) = cbpLuma
    ctx.cbpChromaArr(mbIdx) = cbpChroma
    reconInter(ctx, mbIdx, qpY, p, InterMb(Nil, cbpLuma, cbpChroma,
      qpY, lumaAc, cbDc, crDc, cbAc, crAc), predY, predCb, predCr,
      yP, cbP, crP, use8)
    qpY
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

  /** Quantized residual of one whole MB against a given prediction:
    * luma through the 4x4 transform on inter list 3 — or, with
    * `use8`, the 8x8 transform on inter 8x8 list 1 in the
    * §7.4.5.3.3 interleave split — chroma DC/AC on lists 4/5.
    * Returns (lumaAc, cbDc, crDc, cbAc, crAc, cbpLuma, cbpChroma). */
  private def mbResiduals(ctx: H264Mb.PicCtx, mbIdx: Int,
                          srcY: Array[Int], srcCb: Array[Int],
                          srcCr: Array[Int], predY: Array[Int],
                          predCb: Array[Int], predCr: Array[Int],
                          target: Int, p: Pps, use8: Boolean)
      : (Array[Array[Int]], Array[Int], Array[Int],
         Array[Array[Int]], Array[Array[Int]], Int, Int) = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    val lw = ctx.wMbs * 16; val cw = ctx.wMbs * 8
    val qpC = Transform.chromaQp(target, p.chromaQpOffset)
    val qpCr = Transform.chromaQp(target, p.chromaQpOffsetCr)
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
    def ccs(src: Array[Int], pred: Array[Int],
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
    val (cbDc, cbAc) = ccs(srcCb, predCb, p.sm.w4(4), qpC)
    val (crDc, crAc) = ccs(srcCr, predCr, p.sm.w4(5), qpCr)
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
    val cbpChroma = if (anyChromaAc) 2 else if (anyChromaDc) 1 else 0
    (lumaAc, cbDc, crDc, cbAc, crAc, cbpLuma, cbpChroma)
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
      skipRun: Int, transform8x8: Boolean = false,
      pw: PredWeights = null): (Boolean, Int) = {
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

    // quantized residual of the whole MB against a given prediction
    // (shared with the B encoder — see mbResiduals)
    def residuals(predY: Array[Int], predCb: Array[Int],
                  predCr: Array[Int], use8: Boolean = false)
        : (Array[Array[Int]], Array[Int], Array[Int],
           Array[Array[Int]], Array[Array[Int]], Int, Int) =
      mbResiduals(ctx, mbIdx, srcY, srcCb, srcCr, predY, predCb,
        predCr, target, p, use8)

    // skip FIRST (the real-encoder decision order): 16x16 at the
    // §8.4.1.1 skip motion from ref 0, residual quantizes to zero
    if (mbType == 0 && refList.nonEmpty) {
      val skipCand = skipMv(ctx, mo, sliceId, mbX * 4, mbY * 4)
      val sy = new Array[Int](256)
      val scb = new Array[Int](64); val scr = new Array[Int](64)
      mcPartition(refList(0), mbX, mbY, Part(0, 0, 4, 4, PartNormal),
        skipCand._1, skipCand._2, sy, scb, scr, 0, pw)
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
        predCr, ri, pw)
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

  /**
   * Analyze + emit + reconstruct ONE B macroblock for the fixture
   * encoder. `variant` cycles the Table 7-14 shapes: 0 tries direct
   * first (B_Skip when the residual quantizes to zero, else
   * B_Direct_16x16); 1/2/3 = L0/L1/Bi 16x16; 4 = L0L0_16x8;
   * 5 = L0L1_8x16; 6 = BiBi_16x8; 7 = B_8x8 with cycling
   * sub_mb_types. Forced MVs apply to list 0 and are mirrored on
   * list 1 (the B anchors sit on opposite temporal sides).
   */
  private[multimodal] def encodeBMb(wr: BitWriter, ctx: H264Mb.PicCtx,
      mo: MotionCtx, sliceId: Int, mbIdx: Int,
      l0: IndexedSeq[RefPic], l1: IndexedSeq[RefPic],
      numRef0: Int, numRef1: Int, colPic: RefPic,
      srcY: Array[Int], srcCb: Array[Int], srcCr: Array[Int],
      qpYIn: Int, target: Int, p: Pps, variant: Int,
      forcedMv: Option[(Int, Int)], searchRange: Int,
      yR: Array[Byte], cbR: Array[Byte], crR: Array[Byte],
      skipRun: Int, transform8x8: Boolean = false,
      directSpatial: Boolean = true, curPoc: Int = 0,
      pw0: PredWeights = null, pw1: PredWeights = null,
      implicitBi: Boolean = false)
      : (Boolean, Int) = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
    val lw = ctx.wMbs * 16
    ctx.sliceId(mbIdx) = sliceId
    ctx.is8x8(mbIdx) = false

    // --- direct-first (variant 0): B_Skip or B_Direct_16x16 ---
    if (variant % 8 == 0) {
      val dm =
        if (directSpatial) spatialDirectMb(ctx, mo, sliceId, mbIdx)
        else null
      val predY = new Array[Int](256)
      val predCb = new Array[Int](64); val predCr = new Array[Int](64)
      mcDirect(ctx, mo, sliceId, mbIdx, dm, 0 until 4, l0, l1,
        colPic, predY, predCb, predCr, directSpatial, curPoc,
        pw0, pw1, implicitBi)
      val (lumaAc, cbDc, crDc, cbAc, crAc, cbpL, cbpC) =
        mbResiduals(ctx, mbIdx, srcY, srcCb, srcCr, predY, predCb,
          predCr, target, p, use8 = false)
      if (cbpL == 0 && cbpC == 0) { // B_Skip
        writePred(ctx, mbIdx, predY, predCb, predCr, yR, cbR, crR)
        clearNz(ctx, mbIdx)
        return (true, qpYIn)
      }
      // B_Direct_16x16 with residual
      wr.ue(skipRun)
      wr.ue(0)
      val cbp = cbpL | (cbpC << 4)
      wr.ue(interCodeFromCbp(cbp))
      if (transform8x8 && cbpL != 0) wr.u(0, 1) // keep 4x4 residual
      var qpY = qpYIn
      wr.se(target - qpY); qpY = target
      emitInterResidual(wr, ctx, mbIdx, sliceId, cbpL, cbpC, lumaAc,
        cbDc, crDc, cbAc, crAc)
      reconInter(ctx, mbIdx, qpY, p, InterMb(Nil, cbpL, cbpC, qpY,
        lumaAc, cbDc, crDc, cbAc, crAc), predY, predCb, predCr,
        yR, cbR, crR)
      return (false, qpY)
    }

    // --- explicit-motion variants ---
    val mbType = variant % 8 match {
      case 1 => 1 // B_L0_16x16
      case 2 => 2 // B_L1_16x16
      case 3 => 3 // B_Bi_16x16
      case 4 => 4 // B_L0_L0_16x8
      case 5 => 9 // B_L0_L1_8x16
      case 6 => 20 // B_Bi_Bi_16x8
      case _ => 22 // B_8x8
    }
    val is8x8Mb = mbType == 22
    // sub cycle avoids direct-8x8 here (variant 0 owns direct) and
    // covers L0/L1/Bi at 8x8 plus one below-8x8 shape
    val subTypes: Array[Int] =
      if (is8x8Mb) Array.tabulate(4)(b => Array(1, 2, 3, 5)((b + mbIdx) % 4))
      else null
    val parts: Seq[(BPart, Int)] =
      if (is8x8Mb)
        (0 until 4).flatMap { b =>
          val ox = (b & 1) * 2; val oy = (b >> 1) * 2
          bSubParts(subTypes(b)).map(sp =>
            (sp.copy(px = ox + sp.px, py = oy + sp.py), b))
        }
      else bParts(mbType).map((_, -1))
    val nSlots = if (is8x8Mb) 4 else parts.size
    val refs0 = new Array[Int](nSlots)
    val refs1 = new Array[Int](nSlots)
    var s = 0
    while (s < nSlots) {
      refs0(s) = (mbIdx + s) % math.min(numRef0, l0.size)
      refs1(s) = (mbIdx + s) % math.min(numRef1, l1.size)
      s += 1
    }
    def slu(list: Int, slot: Int): Boolean =
      if (is8x8Mb) {
        val sp = bSubParts(subTypes(slot)).head
        if (list == 0) sp.useL0 else sp.useL1
      } else {
        val pt = parts(slot)._1
        if (list == 0) pt.useL0 else pt.useL1
      }

    // motion per partition (decode order), MC into the buffers
    val predY = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    val mvds = parts.zipWithIndex.map { case ((pt, b8), pi) =>
      val slot = if (is8x8Mb) b8 else pi
      val gx = mbX * 4 + pt.px; val gy = mbY * 4 + pt.py
      val (m0, d0) =
        if (pt.useL0) {
          val ri = refs0(slot)
          val (px0, py0) = mvPred(ctx, mo, sliceId, gx, gy, pt.w4,
            ri, pt.kind, 0)
          val mv = forcedMv.getOrElse(
            searchMv(l0(ri), srcY, lw, mbX * 16 + pt.px * 4,
              mbY * 16 + pt.py * 4, pt.w4 * 4, pt.h4 * 4,
              (px0, py0), searchRange))
          (mv, (mv._1 - px0, mv._2 - py0))
        } else ((0, 0), (0, 0))
      val (m1, d1) =
        if (pt.useL1) {
          val ri = refs1(slot)
          val (px1, py1) = mvPred(ctx, mo, sliceId, gx, gy, pt.w4,
            ri, pt.kind, 1)
          val mv = forcedMv.map(v => (-v._1, -v._2)).getOrElse(
            searchMv(l1(ri), srcY, lw, mbX * 16 + pt.px * 4,
              mbY * 16 + pt.py * 4, pt.w4 * 4, pt.h4 * 4,
              (px1, py1), searchRange))
          (mv, (mv._1 - px1, mv._2 - py1))
        } else ((0, 0), (0, 0))
      mcB(Part(pt.px, pt.py, pt.w4, pt.h4, pt.kind), mbX, mbY,
        pt.useL0, pt.useL1,
        if (pt.useL0) l0(refs0(slot)) else null, m0,
        if (pt.useL1) l1(refs1(slot)) else null, m1,
        predY, predCb, predCr, refs0(slot), refs1(slot), pw0, pw1,
        implicitBi, curPoc)
      mo.setPartitionL(0, gx, gy, pt.w4, pt.h4, m0._1, m0._2,
        if (pt.useL0) refs0(slot) else -1,
        if (pt.useL0) l0(refs0(slot)).picId else -1)
      mo.setPartitionL(1, gx, gy, pt.w4, pt.h4, m1._1, m1._2,
        if (pt.useL1) refs1(slot) else -1,
        if (pt.useL1) l1(refs1(slot)).picId else -1)
      (d0, d1)
    }

    val t8Eligible = transform8x8 &&
      (!is8x8Mb || subTypes.forall(_ <= 3))
    val use8Want = t8Eligible && mbIdx % 2 == 0
    val (lumaAc, cbDc, crDc, cbAc, crAc, cbpLuma, cbpChroma) =
      mbResiduals(ctx, mbIdx, srcY, srcCb, srcCr, predY, predCb,
        predCr, target, p, use8Want)
    val cbp = cbpLuma | (cbpChroma << 4)
    val use8 = use8Want && cbpLuma != 0
    ctx.is8x8(mbIdx) = use8

    // --- emit (decode parse order) ---
    wr.ue(skipRun)
    wr.ue(mbType)
    if (is8x8Mb) subTypes.foreach(wr.ue)
    var slot = 0
    while (slot < nSlots) {
      if (slu(0, slot)) writeTe(wr, refs0(slot), numRef0 - 1)
      slot += 1
    }
    slot = 0
    while (slot < nSlots) {
      if (slu(1, slot)) writeTe(wr, refs1(slot), numRef1 - 1)
      slot += 1
    }
    parts.zipWithIndex.foreach { case ((pt, _), pi) =>
      if (pt.useL0) { wr.se(mvds(pi)._1._1); wr.se(mvds(pi)._1._2) }
    }
    parts.zipWithIndex.foreach { case ((pt, _), pi) =>
      if (pt.useL1) { wr.se(mvds(pi)._2._1); wr.se(mvds(pi)._2._2) }
    }
    wr.ue(interCodeFromCbp(cbp))
    if (transform8x8 && cbpLuma != 0 &&
        (!is8x8Mb || subTypes.forall(_ <= 3)))
      wr.u(if (use8) 1 else 0, 1)
    var qpY = qpYIn
    if (cbp != 0) {
      wr.se(target - qpY)
      qpY = target
    }
    emitInterResidual(wr, ctx, mbIdx, sliceId, cbpLuma, cbpChroma,
      lumaAc, cbDc, crDc, cbAc, crAc)
    ctx.cbpLumaArr(mbIdx) = cbpLuma
    ctx.cbpChromaArr(mbIdx) = cbpChroma
    reconInter(ctx, mbIdx, qpY, p, InterMb(Nil, cbpLuma, cbpChroma,
      qpY, lumaAc, cbDc, crDc, cbAc, crAc), predY, predCb, predCr,
      yR, cbR, crR, use8)
    (false, qpY)
  }

  /** CAVLC residual emission with the decode-order nz bookkeeping —
    * shared by the P and B macroblock encoders. */
  private def emitInterResidual(wr: BitWriter, ctx: H264Mb.PicCtx,
                                mbIdx: Int, sliceId: Int,
                                cbpLuma: Int, cbpChroma: Int,
                                lumaAc: Array[Array[Int]],
                                cbDc: Array[Int], crDc: Array[Int],
                                cbAc: Array[Array[Int]],
                                crAc: Array[Array[Int]]): Unit = {
    val mbX = mbIdx % ctx.wMbs; val mbY = mbIdx / ctx.wMbs
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
  }
}
