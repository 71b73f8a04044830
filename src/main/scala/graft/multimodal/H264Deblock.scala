package graft.multimodal

/**
 * In-loop deblocking filter (ITU-T Rec. H.264 §8.7 — public
 * specification). Until round 15, streams that enabled the filter
 * decoded to PRE-deblock pixels; this closed that gap on the intra
 * path, and the inter round added the full §8.7.2.1 boundary-strength
 * derivation for P pictures.
 *
 * Scope and shape:
 *  - intra MBs: boundary strength is 4 on macroblock edges and 3 on
 *    internal 4x4 edges (the §8.7.2.1 derivation collapses to that);
 *    with motion state present, inter 4x4 block pairs derive bS
 *    2 (residual coefficients), 1 (different reference picture or an
 *    MV component ≥ 4 quarter-pel apart) or 0 (skip the edge);
 *  - per-MB raster order, all vertical edges left→right then all
 *    horizontal edges top→bottom, filtering IN PLACE so later edges
 *    see earlier edges' outputs (the spec's sequencing);
 *  - `disable_deblocking_filter_idc` per MB (slices may differ):
 *    1 = skip the MB entirely, 2 = skip MB edges whose neighbor is
 *    in another slice, 0 = filter everything; FilterOffsetA/B from
 *    the slice header shift the alpha/beta/tC0 table indices;
 *  - intra prediction reads UNFILTERED samples, so both decode and
 *    the fixture encoders run this as a whole-picture post-pass.
 *
 * The alpha/beta/tC0 constants are transcribed from Tables 8-16 and
 * 8-17. Both coder halves share this one transcription, so the
 * fixture encode↔decode round-trips (H264Spec/CabacSpec) are
 * bit-exact independently of it — but decoding EXTERNAL conformant
 * streams requires the exact published values, so H264DeblockSpec
 * pins spot rows of all three tC0 columns against the spec table.
 */
private[graft] object H264Deblock {

  // Table 8-16: alpha and beta by index (0..51)
  private val alphaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144,
    162, 182, 203, 226, 255, 255)
  private val betaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
    16, 16, 17, 17, 18, 18)

  // Table 8-17: tC0 columns for bS 1..3 (bS 4 edges use the strong
  // filter, no tC0). Verbatim re-transcription of the spec table
  // (round 17 — the previous transcription had shifted first-nonzero
  // rows and invented tail values in all three columns). Fixture
  // encode↔decode round-trips share this transcription and so stay
  // bit-exact either way; EXTERNAL conformant streams require these
  // exact values, which H264DeblockSpec now pins against spot rows
  // of the published table (e.g. indexA 36 → (2,3,4), 51 → (13,17,25)).
  private val tc0Bs1: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6,
    7, 8, 9, 10, 11, 13)
  private val tc0Bs2: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
    2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 6, 7, 8,
    9, 10, 11, 13, 15, 17)
  private val tc0Bs3: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
    3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13,
    14, 16, 18, 20, 23, 25)
  private[graft] def tc0For(bs: Int, indexA: Int): Int = bs match {
    case 1 => tc0Bs1(indexA)
    case 2 => tc0Bs2(indexA)
    case _ => tc0Bs3(indexA)
  }

  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v
  @inline private def clip1(v: Int): Int = clip3(0, 255, v)

  /**
   * Filter one edge of `len` sample lines in place. The edge sits
   * between sample columns/rows: p samples at offsets -1..-4 times
   * `across` from `base`, q samples at 0..3; successive lines step
   * by `along`. `bsSeg` carries the §8.7.2.1 boundary strength per
   * group of `segLen` lines (4 luma lines / 2 chroma lines per 4x4
   * luma block pair): 0 skips the group, 4 runs the strong filter,
   * 1..3 the clipped normal filter with that bS's tC0 column.
   */
  private def filterEdge(plane: Array[Byte], base: Int, across: Int,
                         along: Int, len: Int, bsSeg: Array[Int],
                         segLen: Int, chroma: Boolean, indexA: Int,
                         indexB: Int): Unit = {
    val alpha = alphaTab(indexA)
    val beta = betaTab(indexB)
    if (alpha == 0 || beta == 0) return
    var line = 0
    while (line < len) {
      val bs = bsSeg(line / segLen)
      if (bs == 0) { line += 1 }
      else {
      val strong = bs == 4
      val o = base + line * along
      @inline def s(k: Int): Int = plane(o + k * across) & 0xFF
      val p0 = s(-1); val p1 = s(-2); val p2 = s(-3)
      val q0 = s(0); val q1 = s(1); val q2 = s(2)
      if (math.abs(p0 - q0) < alpha && math.abs(p1 - p0) < beta &&
          math.abs(q1 - q0) < beta) {
        if (strong) {
          if (chroma) {
            plane(o - across) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
            plane(o) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
          } else {
            val p3 = s(-4); val q3 = s(3)
            val smallGap = math.abs(p0 - q0) < (alpha >> 2) + 2
            if (smallGap && math.abs(p2 - p0) < beta) {
              plane(o - across) =
                ((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3).toByte
              plane(o - 2 * across) =
                ((p2 + p1 + p0 + q0 + 2) >> 2).toByte
              plane(o - 3 * across) =
                ((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3).toByte
            } else
              plane(o - across) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
            if (smallGap && math.abs(q2 - q0) < beta) {
              plane(o) =
                ((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3).toByte
              plane(o + across) =
                ((q2 + q1 + q0 + p0 + 2) >> 2).toByte
              plane(o + 2 * across) =
                ((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3).toByte
            } else
              plane(o) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
          }
        } else { // bS 1..3: the clipped normal filter
          val tc0 = tc0For(bs, indexA)
          val ap = math.abs(p2 - p0)
          val aq = math.abs(q2 - q0)
          val tc =
            if (chroma) tc0 + 1
            else tc0 + (if (ap < beta) 1 else 0) +
              (if (aq < beta) 1 else 0)
          val delta = clip3(-tc, tc,
            (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
          plane(o - across) = clip1(p0 + delta).toByte
          plane(o) = clip1(q0 - delta).toByte
          if (!chroma) {
            if (ap < beta)
              plane(o - 2 * across) = (p1 + clip3(-tc0, tc0,
                (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)).toByte
            if (aq < beta)
              plane(o + across) = (q1 + clip3(-tc0, tc0,
                (q2 + ((q0 + p0 + 1) >> 1) - 2 * q1) >> 1)).toByte
          }
        }
      }
      line += 1
      }
    }
  }

  private val allBs3 = Array(3, 3, 3, 3)
  private val allBs4 = Array(4, 4, 4, 4)

  /**
   * Deblock one picture in place. Per-MB arrays carry each MB's
   * decode state: `mbQp` (I_PCM MBs: 0, the spec's convention),
   * `disableIdc`/`offsetA`/`offsetB` from the MB's slice header, and
   * `sliceId` for the idc==2 cross-slice rule.
   *
   * Intra pictures (no `motion`): boundary strength is 4 on MB edges
   * and 3 internally — the §8.7.2.1 derivation collapses to that for
   * intra MBs. With `motion` + `lumaNz` (inter pictures), the full
   * derivation runs per 4x4 block pair: either side intra → 4 (MB
   * edge) / 3; either 4x4 block has residual coefficients → 2;
   * different reference pictures or an MV component differing by
   * ≥ 4 quarter-pel → 1; else 0 (no filtering).
   */
  def filterPicture(yP: Array[Byte], cbP: Array[Byte],
                    crP: Array[Byte], wMbs: Int, hMbs: Int,
                    mbQp: Array[Int], chromaQpOffset: Int,
                    sliceId: Array[Int], disableIdc: Array[Int],
                    offsetA: Array[Int], offsetB: Array[Int],
                    is8x8: Array[Boolean] = null,
                    chromaQpOffsetCr: Int = Int.MinValue,
                    motion: H264Inter.MotionCtx = null,
                    lumaNz: Array[Array[Int]] = null): Unit = {
    // second_chroma_qp_index_offset: Cr edges filter at Cr's own QP
    // (§8.7.2 uses QPc of the PLANE being filtered)
    val offCr =
      if (chromaQpOffsetCr == Int.MinValue) chromaQpOffset
      else chromaQpOffsetCr
    val lw = wMbs * 16
    val cw = wMbs * 8
    var mb = 0
    while (mb < wMbs * hMbs) {
      if (disableIdc(mb) != 1) {
        val mbX = mb % wMbs
        val mbY = mb / wMbs
        def neighborOk(n: Int): Boolean =
          disableIdc(mb) == 0 || sliceId(n) == sliceId(mb)
        def indicesFor(qpP: Int, qpQ: Int, off: Option[Int])
            : (Int, Int) = {
          val qp = off match {
            case Some(o) =>
              (Transform.chromaQp(qpP, o) +
                Transform.chromaQp(qpQ, o) + 1) >> 1
            case None => (qpP + qpQ + 1) >> 1
          }
          (clip3(0, 51, qp + offsetA(mb)),
            clip3(0, 51, qp + offsetB(mb)))
        }
        def indices(qpP: Int, qpQ: Int, chromaPlane: Boolean)
            : (Int, Int) =
          indicesFor(qpP, qpQ,
            if (chromaPlane) Some(chromaQpOffset) else None)
        // an 8x8-transform MB filters only 8x8-aligned internal
        // luma edges (§8.7: transform block edges); chroma edges sit
        // at e 0/2 regardless, so only the luma grid changes
        val t8 = is8x8 != null && is8x8(mb)
        // §8.7.2.1 boundary strength for the 4x4 pair (p, q); the
        // intra collapse (no motion state) is 4 on MB edges, 3 inside
        def bsFor(pbx: Int, pby: Int, qbx: Int, qby: Int,
                  mbEdge: Boolean): Int = {
          if (motion == null) return if (mbEdge) 4 else 3
          val w4 = wMbs * 4
          val pi = pby * w4 + pbx; val qi = qby * w4 + qbx
          if (motion.state(pi) != 2 || motion.state(qi) != 2)
            return if (mbEdge) 4 else 3 // either side intra
          def nzAt(bx: Int, by: Int): Boolean = {
            val m = (by >> 2) * wMbs + (bx >> 2)
            if (lumaNz == null) return false
            if (is8x8 != null && is8x8(m)) {
              // 8x8 transform: "the block containing the sample" is
              // the covering 8x8 — any of its four interleave parts
              val b8 = (by & 2) + ((bx & 2) >> 1)
              var k = 0
              while (k < 4) {
                if (lumaNz(m)(b8 * 4 + k) > 0) return true
                k += 1
              }
              false
            } else {
              val z = (by & 2) * 4 + (bx & 2) * 2 + (by & 1) * 2 +
                (bx & 1)
              lumaNz(m)(z) > 0
            }
          }
          if (nzAt(pbx, pby) || nzAt(qbx, qby)) return 2
          // §8.7.2.1 motion comparison, both lists (B pictures may
          // carry two MVs per block): different MV count or a
          // different set of reference PICTURES → 1; same refs →
          // compare the vectors (same-picture-twice blocks compare
          // under both pairings)
          def used(i: Int): Seq[(Int, Int, Int)] = {
            val out = Seq.newBuilder[(Int, Int, Int)]
            if (motion.refPic(i) >= 0)
              out += ((motion.refPic(i), motion.mvx(i).toInt,
                motion.mvy(i).toInt))
            if (motion.refPic1(i) >= 0)
              out += ((motion.refPic1(i), motion.mvx1(i).toInt,
                motion.mvy1(i).toInt))
            out.result()
          }
          val pu = used(pi); val qu = used(qi)
          if (pu.size != qu.size) return 1
          @inline def far(a: (Int, Int, Int), b: (Int, Int, Int)) =
            math.abs(a._2 - b._2) >= 4 || math.abs(a._3 - b._3) >= 4
          if (pu.size == 1) {
            if (pu.head._1 != qu.head._1) 1
            else if (far(pu.head, qu.head)) 1
            else 0
          } else {
            val pPics = Seq(pu(0)._1, pu(1)._1).sorted
            val qPics = Seq(qu(0)._1, qu(1)._1).sorted
            if (pPics != qPics) 1
            else if (pu(0)._1 != pu(1)._1) {
              // two distinct pictures: match vectors by picture
              val q0 = if (qu(0)._1 == pu(0)._1) qu(0) else qu(1)
              val q1 = if (qu(0)._1 == pu(0)._1) qu(1) else qu(0)
              if (far(pu(0), q0) || far(pu(1), q1)) 1 else 0
            } else {
              // the same picture twice: either pairing may match
              val ok =
                (!far(pu(0), qu(0)) && !far(pu(1), qu(1))) ||
                  (!far(pu(0), qu(1)) && !far(pu(1), qu(0)))
              if (ok) 0 else 1
            }
          }
        }
        def bsEdge(e: Int, vertical: Boolean): Array[Int] = {
          if (motion == null) return if (e == 0) allBs4 else allBs3
          val out = new Array[Int](4)
          var k = 0
          while (k < 4) {
            val (qbx, qby) =
              if (vertical) (mbX * 4 + e, mbY * 4 + k)
              else (mbX * 4 + k, mbY * 4 + e)
            out(k) =
              if (vertical) bsFor(qbx - 1, qby, qbx, qby, e == 0)
              else bsFor(qbx, qby - 1, qbx, qby, e == 0)
            k += 1
          }
          out
        }
        // --- vertical edges, left to right ---
        var e = 0
        while (e < 4) {
          val boundary = e == 0
          val filterIt =
            (if (!boundary) true
             else mbX > 0 && neighborOk(mb - 1)) &&
              !(t8 && (e & 1) == 1)
          if (filterIt) {
            val bs = bsEdge(e, vertical = true)
            val qpP = if (boundary) mbQp(mb - 1) else mbQp(mb)
            val (ia, ib) = indices(qpP, mbQp(mb), chromaPlane = false)
            filterEdge(yP, mbY * 16 * lw + mbX * 16 + e * 4,
              across = 1, along = lw, len = 16,
              bs, segLen = 4, chroma = false, ia, ib)
            if ((e & 1) == 0) { // chroma vertical edges at 0 and 8/2
              val (ca, cb) = indices(qpP, mbQp(mb), chromaPlane = true)
              val (ra, rb) = indicesFor(qpP, mbQp(mb), Some(offCr))
              val cbase = mbY * 8 * cw + mbX * 8 + e * 2
              filterEdge(cbP, cbase, 1, cw, 8, bs, segLen = 2,
                chroma = true, ca, cb)
              filterEdge(crP, cbase, 1, cw, 8, bs, segLen = 2,
                chroma = true, ra, rb)
            }
          }
          e += 1
        }
        // --- horizontal edges, top to bottom ---
        e = 0
        while (e < 4) {
          val boundary = e == 0
          val filterIt =
            (if (!boundary) true
             else mbY > 0 && neighborOk(mb - wMbs)) &&
              !(t8 && (e & 1) == 1)
          if (filterIt) {
            val bs = bsEdge(e, vertical = false)
            val qpP = if (boundary) mbQp(mb - wMbs) else mbQp(mb)
            val (ia, ib) = indices(qpP, mbQp(mb), chromaPlane = false)
            filterEdge(yP, (mbY * 16 + e * 4) * lw + mbX * 16,
              across = lw, along = 1, len = 16,
              bs, segLen = 4, chroma = false, ia, ib)
            if ((e & 1) == 0) {
              val (ca, cb) = indices(qpP, mbQp(mb), chromaPlane = true)
              val (ra, rb) = indicesFor(qpP, mbQp(mb), Some(offCr))
              val cbase = (mbY * 8 + e * 2) * cw + mbX * 8
              filterEdge(cbP, cbase, cw, 1, 8, bs, segLen = 2,
                chroma = true, ca, cb)
              filterEdge(crP, cbase, cw, 1, 8, bs, segLen = 2,
                chroma = true, ra, rb)
            }
          }
          e += 1
        }
      }
      mb += 1
    }
  }
}
