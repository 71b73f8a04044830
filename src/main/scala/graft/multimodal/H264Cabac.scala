package graft.multimodal

import H264.{BitReader, BitWriter}

/**
 * CABAC entropy coding for H.264 I slices (ITU-T Rec. H.264 §9.3 —
 * public specification): context-adaptive binary arithmetic decoding
 * AND encoding of the intra macroblock layer, closing the dominant
 * real-world gap — High-profile streams set
 * `entropy_coding_mode_flag=1`, which previously named-errored at the
 * slice header even for I frames.
 *
 * What is implemented, by spec section:
 *  - §9.3.1.1 context-variable initialization from (m, n) pairs with
 *    the SliceQPy-dependent preCtxState clip;
 *  - §9.3.3.2 arithmetic decoding engine: DecodeDecision with the
 *    rangeTabLPS/transIdx tables, DecodeBypass, DecodeTerminate;
 *  - §9.3.4 arithmetic ENCODING engine (EncodeDecision/Bypass/
 *    Terminate/Flush with outstanding-bit carry), used by the fixture
 *    generator so every decode path is exercised against bit-exact
 *    round-trips;
 *  - §9.3.2 binarizations for the I-slice syntax elements: mb_type
 *    (Table 9-36 with the terminate-coded I_PCM bin), TU for
 *    intra_chroma_pred_mode, FL for rem_intra4x4_pred_mode, U for
 *    the mapped mb_qp_delta, the 4+2-bin coded_block_pattern, and
 *    UEG0-suffixed coeff_abs_level_minus1;
 *  - §9.3.3.1 context modeling: neighbor-derived ctxIdxInc for
 *    mb_type/CBP/chroma-mode/mb_qp_delta, per-category
 *    coded_block_flag neighbors (§9.3.3.1.1.9), and the
 *    significance-map / last-flag / abs-level context schedules for
 *    ctxBlockCat 0..4 (frame coding).
 *
 * SCOPE, stated plainly: I slices only (P/B syntax is absent, as
 * everywhere in this decoder); frame-coded (no MBAFF/field context
 * offsets). I_PCM inside CABAC slices is SUPPORTED (the PCM mb_type
 * bin flushes the engine, the raw byte-aligned samples follow, and
 * the engine reinitializes with contexts persisting — §9.3.1.2;
 * CabacSpec round-trips mixed compressed/PCM slices). The context
 * INITIALIZATION constants are transcribed from the spec's I-slice
 * column (Tables 9-12..9-23). For the repo's OWN fixture
 * round-trips a transcription slip cannot produce wrong pixels
 * (both coder halves share the one table — a slip only moves
 * compression efficiency off the standard's); for EXTERNAL
 * conformant streams a wrong init constant desynchronizes the
 * arithmetic decoder and corrupts pixels, and with no conformance
 * bitstreams available in this environment that path is unproven
 * beyond CabacSpec's hand-derived arithmetic-level golden vectors
 * (which pin the engine but not every table row).
 *
 * Reference behaviors modeled on the published spec only.
 */
private[graft] object H264Cabac {

  // ---- §9.3.3.2.1.1 Table 9-44: rangeTabLPS[pStateIdx][qIdx] ----
  val rangeTabLPS: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(29, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  // ---- §9.3.3.2.1.1 Table 9-45: state transitions ----
  val transIdxLPS: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63)

  @inline def transIdxMPS(s: Int): Int = if (s >= 62) s else s + 1

  /**
   * Context-variable init (m, n) pairs for the I-slice column of
   * Tables 9-12..9-23, ctxIdx 0..275 — the full range the intra MB
   * layer uses (0-10 mb_type; 60-63 mb_qp_delta; 64-67
   * intra_chroma_pred_mode; 68-69 intra4x4 pred mode; 70-72
   * mb_field_decoding_flag, unused in frame-only streams; 73-84
   * coded_block_pattern; 85-104 coded_block_flag cats 0-4; 105-165
   * significant_coeff_flag frame; 166-226 last_significant_coeff_flag
   * frame; 227-275 coeff_abs_level_minus1). ctxIdx 11..59 belong to
   * P/B mb/sub-mb/ref/mvd syntax — never consulted in an I slice and
   * initialized to the neutral (0, 64) here. ctxIdx 276 is the
   * terminate context (fixed state, no init entry).
   */
  val initI: Array[(Int, Int)] = {
    val t = Array.fill[(Int, Int)](276)((0, 64))
    val head = Array( // 0..10: mb_type (SI/I)
      (20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
      (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51))
    head.zipWithIndex.foreach { case (v, i) => t(i) = v }
    val mid = Array( // 60..104
      (0, 41), (0, 63), (0, 63), (0, 63),             // mb_qp_delta
      (-9, 83), (4, 86), (0, 97), (-7, 72),           // chroma pred
      (13, 41), (3, 62),                              // intra4x4 pred
      (0, 45), (-4, 78), (-3, 96),                    // mb_field
      (-27, 126), (-28, 98), (-25, 101), (-23, 67),   // cbp luma
      (-28, 82), (-20, 94), (-16, 83), (-22, 110),    // cbp chroma
      (-21, 91), (-18, 102), (-13, 93), (-29, 127),
      (-7, 93), (-11, 87), (-3, 77), (-5, 71),        // cbf cat0
      (-4, 63), (-4, 68), (-12, 84), (-7, 62),        // cbf cat1
      (-7, 65), (8, 61), (5, 56), (-2, 66),           // cbf cat2
      (1, 64), (0, 61), (-2, 78), (1, 50),            // cbf cat3
      (7, 52), (10, 35), (0, 44), (11, 38))           // cbf cat4
    mid.zipWithIndex.foreach { case (v, i) => t(60 + i) = v }
    val sig = Array( // 105..165: significant_coeff_flag (frame)
      // cat0 (luma DC): 105..119
      (1, 45), (15, 36), (14, 40), (16, 27), (12, 29), (1, 44),
      (20, 36), (18, 32), (5, 42), (1, 48), (10, 62), (17, 46),
      (9, 64), (-12, 104), (-11, 97),
      // cat1 (luma AC): 120..133
      (-16, 96), (-7, 88), (-8, 85), (-7, 85), (-9, 85), (-13, 88),
      (4, 66), (-3, 77), (-3, 76), (-6, 76), (10, 58), (-1, 76),
      (-1, 83), (-7, 99),
      // cat2 (luma 4x4): 134..148
      (-14, 95), (2, 95), (0, 76), (-5, 74), (0, 70), (-11, 75),
      (1, 68), (0, 65), (-14, 73), (3, 62), (4, 62), (-1, 68),
      (-13, 75), (11, 55), (5, 64),
      // cat3 (chroma DC): 149..151
      (12, 70), (15, 6), (6, 19),
      // cat4 (chroma AC): 152..165
      (7, 16), (12, 14), (18, 13), (13, 11), (13, 15), (15, 16),
      (12, 23), (13, 23), (15, 20), (14, 26), (14, 44), (17, 40),
      (17, 47), (24, 17))
    require(sig.length == 61, s"sig table ${sig.length}")
    sig.zipWithIndex.foreach { case (v, i) => t(105 + i) = v }
    val last = Array( // 166..226: last_significant_coeff_flag (frame)
      // cat0: 166..180
      (21, 21), (25, 22), (31, 27), (22, 29), (19, 35), (14, 50),
      (10, 57), (7, 63), (-2, 77), (-4, 82), (-3, 94), (9, 69),
      (-12, 109), (36, -35), (36, -34),
      // cat1: 181..194
      (32, -26), (37, -30), (44, -32), (34, -18), (34, -15),
      (40, -15), (33, -7), (35, -5), (33, 0), (38, 2), (33, 13),
      (23, 35), (13, 58), (29, -3),
      // cat2: 195..209
      (26, 0), (22, 30), (31, -7), (35, -15), (34, -3), (34, 3),
      (36, -1), (34, 5), (32, 11), (35, 5), (34, 12), (39, 11),
      (30, 29),
      // cat3: 210..212 (the first two close cat2's run)
      (34, 26), (29, 39), (19, 66), (31, 21), (31, 31),
      // cat4: 213..226
      (25, 50), (-17, 120), (-20, 112), (-18, 114), (-11, 85),
      (-15, 92), (-14, 89), (-26, 71), (-15, 81), (-14, 80),
      (0, 68), (-14, 70), (-24, 56), (-23, 68))
    require(last.length == 61, s"last table ${last.length}")
    last.zipWithIndex.foreach { case (v, i) => t(166 + i) = v }
    val lvl = Array( // 227..275: coeff_abs_level_minus1
      (-24, 115), (-22, 82), (-9, 62), (0, 53), (0, 59), (-14, 85),
      (-13, 89), (-13, 94), (-11, 92), (-29, 127),    // cat0
      (-21, 100), (-14, 57), (-12, 67), (-11, 71), (-10, 77),
      (-21, 85), (-16, 88), (-23, 104), (-15, 98), (-37, 127), // cat1
      (-10, 82), (-8, 48), (-8, 61), (-8, 66), (-7, 70),
      (-14, 75), (-10, 79), (-9, 83), (-12, 92), (-18, 108),   // cat2
      (-4, 79), (-22, 69), (-16, 75), (-2, 58), (1, 58),
      (-13, 78), (-9, 83), (-4, 81), (-13, 99),       // cat3 (9)
      (-13, 81), (-6, 38), (-13, 62), (-6, 58), (-2, 59),
      (-16, 73), (-10, 93), (-13, 46), (-9, 49), (-5, 70))     // cat4
    require(lvl.length == 49, s"level table ${lvl.length}")
    lvl.zipWithIndex.foreach { case (v, i) => t(227 + i) = v }
    t
  }

  /** Context-variable state (pStateIdx + valMPS per ctxIdx),
    * initialized per §9.3.1.1 from the slice QP. Shared by the
    * decoder and the encoder so the two halves cannot diverge. */
  final class CtxModel(sliceQp: Int) {
    val state = new Array[Int](276)
    val mps = new Array[Int](276)
    private val qp = math.max(0, math.min(51, sliceQp))
    var i = 0
    while (i < 276) {
      val (m, n) = initI(i)
      val pre = math.max(1, math.min(126, ((m * qp) >> 4) + n))
      if (pre <= 63) { state(i) = 63 - pre; mps(i) = 0 }
      else { state(i) = pre - 64; mps(i) = 1 }
      i += 1
    }
  }

  // ---- decoding engine (§9.3.3.2) ----------------------------------

  final class Decoder(r: BitReader, cm: CtxModel) {
    private var range = 510
    private var offset = r.u(9)
    require(offset < 510, "initial codIOffset must be < codIRange")

    def decision(ctxIdx: Int): Int = {
      val s = cm.state(ctxIdx)
      val rLPS = rangeTabLPS(s)((range >> 6) & 3)
      range -= rLPS
      val bin =
        if (offset >= range) { // LPS
          offset -= range
          range = rLPS
          val b = 1 - cm.mps(ctxIdx)
          if (s == 0) cm.mps(ctxIdx) = 1 - cm.mps(ctxIdx)
          cm.state(ctxIdx) = transIdxLPS(s)
          b
        } else { // MPS
          cm.state(ctxIdx) = transIdxMPS(s)
          cm.mps(ctxIdx)
        }
      while (range < 256) {
        range <<= 1
        offset = (offset << 1) | r.u(1)
      }
      bin
    }

    def bypass(): Int = {
      offset = (offset << 1) | r.u(1)
      if (offset >= range) { offset -= range; 1 } else 0
    }

    /** DecodeTerminate (§9.3.3.2.4): end_of_slice_flag and the I_PCM
      * mb_type bin. */
    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else {
        while (range < 256) {
          range <<= 1
          offset = (offset << 1) | r.u(1)
        }
        0
      }
    }

  }

  // ---- encoding engine (§9.3.4) -------------------------------------

  final class Encoder(w: BitWriter, cm: CtxModel) {
    private var low = 0
    private var range = 510
    private var outstanding = 0
    private var firstBit = true

    private def putBit(b: Int): Unit = {
      if (firstBit) firstBit = false else w.u(b, 1)
      while (outstanding > 0) { w.u(1 - b, 1); outstanding -= 1 }
    }

    private def renorm(): Unit =
      while (range < 256) {
        if (low >= 512) { putBit(1); low -= 512 }
        else if (low < 256) putBit(0)
        else { outstanding += 1; low -= 256 }
        range <<= 1
        low <<= 1
      }

    def decision(ctxIdx: Int, bin: Int): Unit = {
      val s = cm.state(ctxIdx)
      val rLPS = rangeTabLPS(s)((range >> 6) & 3)
      range -= rLPS
      if (bin != cm.mps(ctxIdx)) {
        low += range
        range = rLPS
        if (s == 0) cm.mps(ctxIdx) = 1 - cm.mps(ctxIdx)
        cm.state(ctxIdx) = transIdxLPS(s)
      } else cm.state(ctxIdx) = transIdxMPS(s)
      renorm()
    }

    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin != 0) low += range
      if (low >= 1024) { putBit(1); low -= 1024 }
      else if (low < 512) putBit(0)
      else { outstanding += 1; low -= 512 }
    }

    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin != 0) {
        // EncodeTerminate (§9.3.4.1.1) goes STRAIGHT to EncodeFlush —
        // no intermediate renorm. flush() emits exactly 10 bits
        // (7 renorm + 1 putBit + 2 raw); the decoder's 9-bit init
        // preread plus the terminate bin's zero-read makes the reader
        // land exactly at the flush end, so the decode side needs only
        // a byte alignment before I_PCM samples.
        low += range
        flush()
      } else renorm()
    }

    /** EncodeFlush (§9.3.4.1.2): the final two raw bits end in a 1,
      * which doubles as the rbsp_stop_one_bit — callers byte-align
      * with zeros afterwards, NOT with trailingBits(). */
    private def flush(): Unit = {
      range = 2
      renorm()
      putBit((low >> 9) & 1)
      w.u(((low >> 7) & 3) | 1, 2)
    }
  }

  // ---- context-index derivations (§9.3.3.1.1) -----------------------
  // Shared verbatim by parse and emit: a single implementation of
  // each neighbor rule is what keeps the two halves bit-compatible.

  import H264Mb.{PicCtx, MbCoeffs, zx, zy, mbAvail}

  /** Is the (available) MB at index m an I_NxN macroblock? */
  @inline private def isI4x4(ctx: PicCtx, m: Int): Boolean =
    !ctx.isIpcm(m) && ctx.i4Modes(m)(0) >= 0

  /** mb_type bin0 ctxIdxInc: condTermN = 1 unless mbN is unavailable
    * or I_NxN (§9.3.3.1.1.3). */
  private def mbTypeInc(ctx: PicCtx, mbX: Int, mbY: Int,
                        sliceId: Int): Int = {
    def ct(mx: Int, my: Int): Int =
      if (!mbAvail(ctx, mx, my, sliceId)) 0
      else if (isI4x4(ctx, my * ctx.wMbs + mx)) 0
      else 1
    ct(mbX - 1, mbY) + ct(mbX, mbY - 1)
  }

  /** intra_chroma_pred_mode bin0 ctxIdxInc: condTermN = 1 iff mbN is
    * available, intra non-PCM, with nonzero chroma mode
    * (§9.3.3.1.1.8). */
  private def chromaModeInc(ctx: PicCtx, mbX: Int, mbY: Int,
                            sliceId: Int): Int = {
    def ct(mx: Int, my: Int): Int =
      if (!mbAvail(ctx, mx, my, sliceId)) 0
      else {
        val m = my * ctx.wMbs + mx
        if (ctx.isIpcm(m) || ctx.chromaModeArr(m) == 0) 0 else 1
      }
    ct(mbX - 1, mbY) + ct(mbX, mbY - 1)
  }

  /** coded_block_pattern luma bin `b` ctxIdxInc (§9.3.3.1.1.4):
    * condTermN = 1 iff the neighboring 8x8 block's cbp bit is 0;
    * unavailable or I_PCM neighbors count as coded (0). `cbpSoFar`
    * carries the current MB's already-decoded bins. */
  private def cbpLumaInc(ctx: PicCtx, mbX: Int, mbY: Int, sliceId: Int,
                         b: Int, cbpSoFar: Int): Int = {
    // 8x8 blocks raster in the MB: 0 TL, 1 TR, 2 BL, 3 BR
    def ct8(mx: Int, my: Int, blk: Int, inCur: Boolean): Int =
      if (inCur) { if (((cbpSoFar >> blk) & 1) == 0) 1 else 0 }
      else if (!mbAvail(ctx, mx, my, sliceId)) 0
      else {
        val m = my * ctx.wMbs + mx
        if (ctx.isIpcm(m)) 0
        else if (((ctx.cbpLumaArr(m) >> blk) & 1) == 0) 1 else 0
      }
    val condA = // left neighbor 8x8 of block b
      if ((b & 1) == 1) ct8(0, 0, b - 1, inCur = true)
      else ct8(mbX - 1, mbY, b + 1, inCur = false)
    val condB = // top neighbor 8x8 of block b
      if (b >= 2) ct8(0, 0, b - 2, inCur = true)
      else ct8(mbX, mbY - 1, b + 2, inCur = false)
    condA + 2 * condB
  }

  /** coded_block_pattern chroma ctxIdxInc: bin0 asks "is neighbor
    * cbp_chroma nonzero", bin1 (offset +4) asks "is it 2"; I_PCM
    * counts as 2 (§9.3.3.1.1.4). */
  private def cbpChromaInc(ctx: PicCtx, mbX: Int, mbY: Int,
                           sliceId: Int, bin1: Boolean): Int = {
    def ct(mx: Int, my: Int): Int =
      if (!mbAvail(ctx, mx, my, sliceId)) 0
      else {
        val m = my * ctx.wMbs + mx
        val v = if (ctx.isIpcm(m)) 2 else ctx.cbpChromaArr(m)
        if (bin1) { if (v == 2) 1 else 0 }
        else { if (v != 0) 1 else 0 }
      }
    (if (bin1) 4 else 0) +
      ct(mbX - 1, mbY) + 2 * ct(mbX, mbY - 1)
  }

  // ctxBlockCat: 0 = I16x16 luma DC, 1 = I16x16 luma AC, 2 = luma
  // 4x4, 3 = chroma DC, 4 = chroma AC (Table 9-42).
  private val cbfCatOffset = Array(0, 4, 8, 12, 16)
  private val sigCatOffset = Array(0, 15, 29, 44, 47)
  private val lvlCatOffset = Array(0, 10, 20, 30, 39)

  /** coded_block_flag ctxIdx = 85 + 4·cat + condA + 2·condB, with the
    * §9.3.3.1.1.9 neighbor rules: unavailable neighbors of an intra
    * MB and I_PCM neighbors count 1; a neighbor whose MB carries no
    * such block counts 0; otherwise the neighbor block's decoded
    * flag. `component`: 0 luma, 1 cb, 2 cr. `blk`: z-order 4x4 index
    * (cats 1/2) or chroma raster index (cat 4); unused for DC cats. */
  private def cbfCtx(ctx: PicCtx, mbX: Int, mbY: Int, sliceId: Int,
                     cat: Int, component: Int, blk: Int,
                     curMb: Int): Int = {
    @inline def zIdxOf(bx: Int, by: Int): Int =
      (by & 2) * 4 + (bx & 2) * 2 + (by & 1) * 2 + (bx & 1)
    def mbc(m: Int, get: Int => Boolean): Int =
      if (ctx.isIpcm(m)) 1 else if (get(m)) 1 else 0
    def ct(dx: Int, dy: Int): Int = cat match {
      case 0 => // luma DC: neighbor MB's luma DC block, I16x16 only
        if (!mbAvail(ctx, mbX + dx, mbY + dy, sliceId)) 1
        else {
          val m = (mbY + dy) * ctx.wMbs + (mbX + dx)
          if (ctx.isIpcm(m)) 1
          else if (!isI4x4(ctx, m)) { if (ctx.lumaDcCbf(m)) 1 else 0 }
          else 0 // neighbor has no luma DC block
        }
      case 1 | 2 => // luma 4x4 block neighbor at global block coords
        val bx = mbX * 4 + zx(blk) + dx
        val by = mbY * 4 + zy(blk) + dy
        if (bx < 0 || by < 0) 1 // out of picture, current MB is intra
        else {
          val m = (by >> 2) * ctx.wMbs + (bx >> 2)
          val z = zIdxOf(bx & 3, by & 3)
          if (m == curMb) { if (ctx.lumaNz(m)(z) > 0) 1 else 0 }
          else if (!mbAvail(ctx, bx >> 2, by >> 2, sliceId)) 1
          else mbc(m, mm => ctx.lumaNz(mm)(z) > 0)
        }
      case 3 => // chroma DC of the same component
        if (!mbAvail(ctx, mbX + dx, mbY + dy, sliceId)) 1
        else {
          val m = (mbY + dy) * ctx.wMbs + (mbX + dx)
          if (ctx.isIpcm(m)) 1
          else if (ctx.cbpChromaArr(m) != 0) {
            val f = if (component == 1) ctx.cbDcCbf(m) else ctx.crDcCbf(m)
            if (f) 1 else 0
          } else 0
        }
      case 4 => // chroma AC 4x4 at the 2x2-per-MB grid
        val bx = mbX * 2 + (blk & 1) + dx
        val by = mbY * 2 + (blk >> 1) + dy
        if (bx < 0 || by < 0) 1
        else {
          val m = (by >> 1) * ctx.wMbs + (bx >> 1)
          val b = (by & 1) * 2 + (bx & 1)
          val nz = if (component == 1) ctx.cbNz else ctx.crNz
          if (m == curMb) { if (nz(m)(b) > 0) 1 else 0 }
          else if (!mbAvail(ctx, bx >> 1, by >> 1, sliceId)) 1
          else mbc(m, mm => nz(mm)(b) > 0)
        }
      case other => throw new IllegalArgumentException(s"cat $other")
    }
    85 + cbfCatOffset(cat) + ct(-1, 0) + 2 * ct(0, -1)
  }

  @inline private def sigCtx(cat: Int, i: Int): Int =
    105 + sigCatOffset(cat) + (if (cat == 3) math.min(i, 2) else i)
  @inline private def lastCtx(cat: Int, i: Int): Int =
    166 + sigCatOffset(cat) + (if (cat == 3) math.min(i, 2) else i)

  private def levelCtx0(cat: Int, numEq1: Int, numGt1: Int): Int =
    227 + lvlCatOffset(cat) +
      (if (numGt1 != 0) 0 else math.min(4, 1 + numEq1))
  private def levelCtxN(cat: Int, numGt1: Int): Int =
    227 + lvlCatOffset(cat) +
      5 + math.min(if (cat == 3) 3 else 4, numGt1)

  // ---- residual block (§7.3.5.3.3) ----------------------------------

  /** Decode one residual block's coefficients in scan order (the
    * coded_block_flag has already been decoded as 1). Returns the
    * coefficients and the nonzero count. */
  private[graft] def readResidual(d: Decoder, cat: Int,
                           maxNumCoeff: Int): (Array[Int], Int) = {
    val coeffs = new Array[Int](maxNumCoeff)
    val sig = new Array[Boolean](maxNumCoeff)
    var numCoeff = maxNumCoeff
    var i = 0
    while (i < numCoeff - 1) {
      if (d.decision(sigCtx(cat, i)) == 1) {
        sig(i) = true
        if (d.decision(lastCtx(cat, i)) == 1) numCoeff = i + 1
      }
      i += 1
    }
    sig(numCoeff - 1) = true // the last coefficient is implied
    var numEq1 = 0
    var numGt1 = 0
    var total = 0
    var idx = numCoeff - 1
    while (idx >= 0) {
      if (sig(idx)) {
        var minus1 = 0
        val ctx0 = levelCtx0(cat, numEq1, numGt1)
        if (d.decision(ctx0) == 1) {
          minus1 = 1
          val ctxN = levelCtxN(cat, numGt1)
          var cont = true
          while (cont && minus1 < 14) {
            if (d.decision(ctxN) == 1) minus1 += 1 else cont = false
          }
          if (minus1 == 14) { // UEG0 suffix, bypass
            var k = 0
            while (d.bypass() == 1) {
              minus1 += (1 << k)
              k += 1
              require(k <= 30, "runaway UEG0 prefix")
            }
            var kk = k - 1
            while (kk >= 0) {
              minus1 += d.bypass() << kk
              kk -= 1
            }
          }
        }
        val negative = d.bypass() == 1
        val level = minus1 + 1
        coeffs(idx) = if (negative) -level else level
        if (level == 1) numEq1 += 1 else numGt1 += 1
        total += 1
      }
      idx -= 1
    }
    (coeffs, total)
  }

  /** Encode one residual block (caller has emitted coded_block_flag
    * = 1; at least one coefficient must be nonzero). */
  private def writeResidual(e: Encoder, cat: Int,
                            coeffs: Array[Int]): Unit = {
    val maxNumCoeff = coeffs.length
    var lastNz = maxNumCoeff - 1
    while (lastNz >= 0 && coeffs(lastNz) == 0) lastNz -= 1
    require(lastNz >= 0, "coded_block_flag=1 needs a nonzero coeff")
    var i = 0
    while (i < math.min(lastNz + 1, maxNumCoeff - 1)) {
      val s = if (coeffs(i) != 0) 1 else 0
      e.decision(sigCtx(cat, i), s)
      if (s == 1)
        e.decision(lastCtx(cat, i), if (i == lastNz) 1 else 0)
      i += 1
    }
    var numEq1 = 0
    var numGt1 = 0
    var idx = lastNz
    while (idx >= 0) {
      val v = coeffs(idx)
      if (v != 0) {
        val level = math.abs(v)
        var minus1 = level - 1
        val ctx0 = levelCtx0(cat, numEq1, numGt1)
        if (minus1 == 0) e.decision(ctx0, 0)
        else {
          e.decision(ctx0, 1)
          val ctxN = levelCtxN(cat, numGt1)
          // TU prefix cMax 14 counts bin0: emit min(minus1,14)-1
          // further ones, and a terminating 0 only below the cap
          val prefix = math.min(minus1, 14)
          var j = 1
          while (j < prefix) { e.decision(ctxN, 1); j += 1 }
          if (minus1 < 14) e.decision(ctxN, 0)
          else {
            var sufS = minus1 - 14
            var k = 0
            while (sufS >= (1 << k)) {
              e.bypass(1)
              sufS -= (1 << k)
              k += 1
            }
            e.bypass(0)
            var kk = k - 1
            while (kk >= 0) { e.bypass((sufS >> kk) & 1); kk -= 1 }
          }
        }
        e.bypass(if (v < 0) 1 else 0)
        if (level == 1) numEq1 += 1 else numGt1 += 1
      }
      idx -= 1
    }
  }

  // ---- macroblock layer: decode --------------------------------------

  /**
   * Decode CABAC slice data for an I slice: cabac_alignment_one_bit
   * is already consumed and `r` sits byte-aligned at the first slice
   * data byte. Decodes macroblocks (reconstructing through
   * [[H264Mb]]'s shared path) until end_of_slice_flag. Returns the
   * number of macroblocks decoded.
   */
  def decodeSliceData(r: BitReader, ctx: PicCtx, sliceId: Int,
                      firstMb: Int, sliceQp: Int, chromaQpOffset: Int,
                      yP: Array[Byte], cbP: Array[Byte],
                      crP: Array[Byte],
                      mbQpOut: Array[Int] = null,
                      sm: ScalingMatrices = ScalingMatrices.Flat,
                      chromaQpOffsetCr: Int = Int.MinValue)
      : Int = {
    val cm = new CtxModel(sliceQp)
    var d = new Decoder(r, cm)
    var qpY = sliceQp
    require(qpY >= 0 && qpY <= 51, s"slice QP $qpY out of range")
    var prevQpDeltaNonZero = false
    var mbIdx = firstMb
    var done = 0
    val total = ctx.wMbs * ctx.hMbs
    var end = false
    while (!end) {
      require(mbIdx < total, "slice data overruns the picture")
      val mbX = mbIdx % ctx.wMbs
      val mbY = mbIdx / ctx.wMbs
      val bin0 = d.decision(3 + mbTypeInc(ctx, mbX, mbY, sliceId))
      if (bin0 == 1 && d.terminate() == 1) {
        // I_PCM (§7.3.5 + §9.3.1.2): after the terminate bin the
        // reader already sits exactly at the encoder-flush end (the
        // 9-bit init preread covers the flush's 10 emitted bits minus
        // the suppressed first bit), so only pcm_alignment_zero_bit
        // remains before the raw samples; reinitialize the engine
        // afterwards (the contexts persist)
        ctx.sliceId(mbIdx) = sliceId
        ctx.isIpcm(mbIdx) = true
        r.alignToByte()
        readPcmSamples(r, ctx, mbIdx, yP, cbP, crP)
        prevQpDeltaNonZero = false
        if (mbQpOut != null) mbQpOut(mbIdx) = 0 // deblock QP (§8.7.2)
        d = new Decoder(r, cm)
      } else {
        qpY = decodeMb(d, ctx, mbIdx, sliceId, qpY, chromaQpOffset,
          prevQpDeltaNonZeroIn = prevQpDeltaNonZero,
          setPrev = v => prevQpDeltaNonZero = v, yP, cbP, crP,
          mbTypeBin0 = bin0, sm = sm,
          chromaQpOffsetCr = chromaQpOffsetCr)
        if (mbQpOut != null) mbQpOut(mbIdx) = qpY
      }
      done += 1
      mbIdx += 1
      end = d.terminate() == 1
    }
    done
  }

  /** Raw I_PCM sample read/write order (§7.3.5): 256 luma then 64
    * Cb then 64 Cr bytes, raster within the MB. */
  private def readPcmSamples(r: BitReader, ctx: PicCtx, mbIdx: Int,
                             yP: Array[Byte], cbP: Array[Byte],
                             crP: Array[Byte]): Unit = {
    val mbX = (mbIdx % ctx.wMbs) * 16
    val mbY = (mbIdx / ctx.wMbs) * 16
    val lw = ctx.wMbs * 16
    val cw = ctx.wMbs * 8
    var i = 0
    while (i < 256) {
      yP((mbY + i / 16) * lw + mbX + i % 16) = r.readByte().toByte
      i += 1
    }
    val cX = mbX / 2; val cY = mbY / 2
    i = 0
    while (i < 64) {
      cbP((cY + i / 8) * cw + cX + i % 8) = r.readByte().toByte; i += 1
    }
    i = 0
    while (i < 64) {
      crP((cY + i / 8) * cw + cX + i % 8) = r.readByte().toByte; i += 1
    }
  }

  private def decodeMb(d: Decoder, ctx: PicCtx, mbIdx: Int,
                       sliceId: Int, qpYPrev: Int, chromaQpOffset: Int,
                       prevQpDeltaNonZeroIn: Boolean,
                       setPrev: Boolean => Unit,
                       yP: Array[Byte], cbP: Array[Byte],
                       crP: Array[Byte], mbTypeBin0: Int,
                       sm: ScalingMatrices = ScalingMatrices.Flat,
                       chromaQpOffsetCr: Int = Int.MinValue)
      : Int = {
    val mbX = mbIdx % ctx.wMbs
    val mbY = mbIdx / ctx.wMbs
    ctx.sliceId(mbIdx) = sliceId

    // --- mb_type (Table 9-36 / 9-39; bin0 and — for bin0==1 — the
    // I_PCM terminate bin were consumed by the caller) ---
    var is4x4 = false
    var cbpLuma = 0
    var cbpChroma = 0
    var pred16Mode = -1
    if (mbTypeBin0 == 0) is4x4 = true
    else {
      if (d.decision(3 + 3) == 1) cbpLuma = 15
      if (d.decision(3 + 4) == 1)
        cbpChroma = if (d.decision(3 + 5) == 1) 2 else 1
      pred16Mode = (d.decision(3 + 6) << 1) | d.decision(3 + 7)
    }

    // --- mb_pred ---
    val modes = Array.fill(16)(-1)
    if (is4x4) {
      var z = 0
      while (z < 16) {
        val pred = H264Mb.predIntra4x4Mode(ctx, mbX, mbY, zx(z), zy(z),
          sliceId, modes)
        modes(z) =
          if (d.decision(68) == 1) pred
          else {
            // rem_intra4x4_pred_mode: FL cMax 7, LSB-first bins
            val rem = d.decision(69) | (d.decision(69) << 1) |
              (d.decision(69) << 2)
            if (rem < pred) rem else rem + 1
          }
        z += 1
      }
      ctx.i4Modes(mbIdx) = modes
    }
    val chromaMode = { // TU cMax 3, ctx 64+inc then 64+3
      var v = 0
      if (d.decision(64 + chromaModeInc(ctx, mbX, mbY, sliceId)) == 1) {
        v = 1
        if (d.decision(64 + 3) == 1) {
          v = 2
          if (d.decision(64 + 3) == 1) v = 3
        }
      }
      v
    }
    ctx.chromaModeArr(mbIdx) = chromaMode

    // --- coded_block_pattern (I_NxN only) ---
    if (is4x4) {
      var b = 0
      while (b < 4) {
        val inc = cbpLumaInc(ctx, mbX, mbY, sliceId, b, cbpLuma)
        if (d.decision(73 + inc) == 1) cbpLuma |= 1 << b
        b += 1
      }
      if (d.decision(77 + cbpChromaInc(ctx, mbX, mbY, sliceId,
          bin1 = false)) == 1) {
        cbpChroma =
          if (d.decision(77 + cbpChromaInc(ctx, mbX, mbY, sliceId,
            bin1 = true)) == 1) 2 else 1
      }
    }
    ctx.cbpLumaArr(mbIdx) = cbpLuma
    ctx.cbpChromaArr(mbIdx) = cbpChroma

    // --- mb_qp_delta ---
    var qpY = qpYPrev
    if (!is4x4 || cbpLuma != 0 || cbpChroma != 0) {
      var u = 0
      if (d.decision(60 + (if (prevQpDeltaNonZeroIn) 1 else 0)) == 1) {
        u = 1
        if (d.decision(62) == 1) {
          u = 2
          while (u < 52 && d.decision(63) == 1) u += 1
          require(u < 52, "mb_qp_delta unary overrun")
        }
      }
      val delta = if (u % 2 == 1) (u + 1) / 2 else -(u / 2)
      setPrev(delta != 0)
      qpY = (qpY + delta + 52) % 52
    } else setPrev(false)
    val qpC = Transform.chromaQp(qpY, chromaQpOffset)

    // --- residuals ---
    val lumaDc = new Array[Int](16)
    if (!is4x4) {
      val cbf = d.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 0,
        component = 0, blk = 0, curMb = mbIdx))
      ctx.lumaDcCbf(mbIdx) = cbf == 1
      if (cbf == 1) {
        val (c, _) = readResidual(d, cat = 0, maxNumCoeff = 16)
        System.arraycopy(c, 0, lumaDc, 0, 16)
      }
    }
    val lumaAc = new Array[Array[Int]](16)
    val lumaCat = if (is4x4) 2 else 1
    val lumaN = if (is4x4) 16 else 15
    var z = 0
    while (z < 16) {
      if ((cbpLuma & (1 << (z >> 2))) != 0) {
        val cbf = d.decision(cbfCtx(ctx, mbX, mbY, sliceId, lumaCat,
          component = 0, blk = z, curMb = mbIdx))
        if (cbf == 1) {
          val (c, tc) = readResidual(d, lumaCat, lumaN)
          lumaAc(z) = c
          ctx.lumaNz(mbIdx)(z) = tc
        } else {
          lumaAc(z) = new Array[Int](lumaN)
          ctx.lumaNz(mbIdx)(z) = 0
        }
      } else {
        lumaAc(z) = new Array[Int](lumaN)
        ctx.lumaNz(mbIdx)(z) = 0
      }
      z += 1
    }
    val cbDc = new Array[Int](4)
    val crDc = new Array[Int](4)
    if (cbpChroma != 0) {
      val cbfCb = d.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 3,
        component = 1, blk = 0, curMb = mbIdx))
      ctx.cbDcCbf(mbIdx) = cbfCb == 1
      if (cbfCb == 1)
        System.arraycopy(readResidual(d, 3, 4)._1, 0, cbDc, 0, 4)
      val cbfCr = d.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 3,
        component = 2, blk = 0, curMb = mbIdx))
      ctx.crDcCbf(mbIdx) = cbfCr == 1
      if (cbfCr == 1)
        System.arraycopy(readResidual(d, 3, 4)._1, 0, crDc, 0, 4)
    }
    val cbAc = Array.fill(4)(new Array[Int](15))
    val crAc = Array.fill(4)(new Array[Int](15))
    if (cbpChroma == 2) {
      var b = 0
      while (b < 4) {
        val cbf = d.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 4,
          component = 1, blk = b, curMb = mbIdx))
        if (cbf == 1) {
          val (c, tc) = readResidual(d, 4, 15)
          cbAc(b) = c; ctx.cbNz(mbIdx)(b) = tc
        } else ctx.cbNz(mbIdx)(b) = 0
        b += 1
      }
      b = 0
      while (b < 4) {
        val cbf = d.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 4,
          component = 2, blk = b, curMb = mbIdx))
        if (cbf == 1) {
          val (c, tc) = readResidual(d, 4, 15)
          crAc(b) = c; ctx.crNz(mbIdx)(b) = tc
        } else ctx.crNz(mbIdx)(b) = 0
        b += 1
      }
    }

    H264Mb.reconstruct(ctx, mbIdx, sliceId, qpY, qpC, is4x4, modes,
      pred16Mode, chromaMode, cbpChroma,
      MbCoeffs(lumaDc, lumaAc, cbDc, crDc, cbAc, crAc), yP, cbP, crP,
      sm = sm, qpCr = Transform.chromaQp(qpY,
        if (chromaQpOffsetCr == Int.MinValue) chromaQpOffset
        else chromaQpOffsetCr))
    qpY
  }

  // ---- macroblock layer: encode --------------------------------------

  /**
   * Encode one slice's MBs as CABAC slice data into `w` (the caller
   * has written the slice header and the cabac_alignment_one_bits).
   * Analysis and reconstruction ride [[H264Mb.analyzeMb]] — the SAME
   * mode choices and pixels as the CAVLC fixtures — so only the
   * entropy layer differs. Ends with end_of_slice_flag=1 and the
   * engine flush; callers byte-align with ZEROS (the flush's final 1
   * is the rbsp stop bit).
   */
  def encodeSliceData(w: BitWriter, ctx: PicCtx, sliceId: Int,
                      sliceQp: Int, chromaQpOffset: Int,
                      srcY: Array[Int], srcCb: Array[Int],
                      srcCr: Array[Int], yP: Array[Byte],
                      cbP: Array[Byte], crP: Array[Byte],
                      firstMb: Int, endMb: Int,
                      qpAmp: Int = 0,
                      mbQpOut: Array[Int] = null,
                      pcmEvery: Int = 0,
                      sm: ScalingMatrices = ScalingMatrices.Flat,
                      chromaQpOffsetCr: Int = Int.MinValue)
      : Unit = {
    val cm = new CtxModel(sliceQp)
    var e = new Encoder(w, cm)
    var qpY = sliceQp
    var prevQpDeltaNonZero = false
    var mbIdx = firstMb
    while (mbIdx < endMb) {
      val mbX = mbIdx % ctx.wMbs
      val mbY = mbIdx / ctx.wMbs
      if (pcmEvery > 0 && mbIdx % pcmEvery == pcmEvery - 1) {
        // I_PCM fixture MB: the mb_type PCM bin flushes the engine
        // (EncodeTerminate(1) includes EncodeFlush), then the raw
        // byte-aligned source samples, then a FRESH engine on the
        // same contexts — the decoder's exact mirror
        e.decision(3 + mbTypeInc(ctx, mbX, mbY, sliceId), 1)
        e.terminate(1)
        w.alignZero() // pcm_alignment_zero_bit*
        ctx.sliceId(mbIdx) = sliceId
        ctx.isIpcm(mbIdx) = true
        writePcmSamples(w, ctx, mbIdx, srcY, srcCb, srcCr,
          yP, cbP, crP)
        prevQpDeltaNonZero = false
        if (mbQpOut != null) mbQpOut(mbIdx) = 0
        e = new Encoder(w, cm)
        e.terminate(if (mbIdx + 1 == endMb) 1 else 0)
        mbIdx += 1
      } else {
      val target = H264Mb.qpTarget(sliceQp, qpAmp, mbIdx)
      val plan = H264Mb.analyzeMb(ctx, mbIdx, sliceId, target,
        chromaQpOffset, srcY, srcCb, srcCr, yP, cbP, crP, sm = sm,
        chromaQpOffsetCr = chromaQpOffsetCr)
      import plan._

      // --- mb_type ---
      e.decision(3 + mbTypeInc(ctx, mbX, mbY, sliceId),
        if (is4x4) 0 else 1)
      if (!is4x4) {
        e.terminate(0) // not I_PCM
        e.decision(3 + 3, if (cbpLuma == 15) 1 else 0)
        e.decision(3 + 4, if (cbpChroma != 0) 1 else 0)
        if (cbpChroma != 0)
          e.decision(3 + 5, if (cbpChroma == 2) 1 else 0)
        e.decision(3 + 6, (pred16Mode >> 1) & 1)
        e.decision(3 + 7, pred16Mode & 1)
      }

      // --- mb_pred ---
      if (is4x4) {
        var z = 0
        while (z < 16) {
          val pm = H264Mb.predIntra4x4Mode(ctx, mbX, mbY, zx(z), zy(z),
            sliceId, modes)
          if (modes(z) == pm) e.decision(68, 1)
          else {
            e.decision(68, 0)
            val rem = if (modes(z) < pm) modes(z) else modes(z) - 1
            e.decision(69, rem & 1)
            e.decision(69, (rem >> 1) & 1)
            e.decision(69, (rem >> 2) & 1)
          }
          z += 1
        }
      }
      val cmInc = chromaModeInc(ctx, mbX, mbY, sliceId)
      if (chromaMode == 0) e.decision(64 + cmInc, 0)
      else {
        e.decision(64 + cmInc, 1)
        if (chromaMode == 1) e.decision(64 + 3, 0)
        else {
          e.decision(64 + 3, 1)
          if (chromaMode == 2) e.decision(64 + 3, 0)
          else e.decision(64 + 3, 1)
        }
      }
      ctx.chromaModeArr(mbIdx) = chromaMode

      // --- coded_block_pattern ---
      if (is4x4) {
        var soFar = 0
        var b = 0
        while (b < 4) {
          val inc = cbpLumaInc(ctx, mbX, mbY, sliceId, b, soFar)
          val bit = (cbpLuma >> b) & 1
          e.decision(73 + inc, bit)
          soFar |= bit << b
          b += 1
        }
        e.decision(77 + cbpChromaInc(ctx, mbX, mbY, sliceId,
          bin1 = false), if (cbpChroma != 0) 1 else 0)
        if (cbpChroma != 0)
          e.decision(77 + cbpChromaInc(ctx, mbX, mbY, sliceId,
            bin1 = true), if (cbpChroma == 2) 1 else 0)
      }
      ctx.cbpLumaArr(mbIdx) = cbpLuma
      ctx.cbpChromaArr(mbIdx) = cbpChroma

      // --- mb_qp_delta (unary of the se-style mapped value) ---
      if (!is4x4 || cbpLuma != 0 || cbpChroma != 0) {
        val delta = target - qpY
        qpY = target
        val u = if (delta > 0) 2 * delta - 1 else -2 * delta
        if (u == 0)
          e.decision(60 + (if (prevQpDeltaNonZero) 1 else 0), 0)
        else {
          e.decision(60 + (if (prevQpDeltaNonZero) 1 else 0), 1)
          if (u == 1) e.decision(62, 0)
          else {
            e.decision(62, 1)
            var k = 3
            while (k <= u) { e.decision(63, 1); k += 1 }
            e.decision(63, 0)
          }
        }
        prevQpDeltaNonZero = delta != 0
      }
      if (mbQpOut != null) mbQpOut(mbIdx) = qpY
      // --- residuals ---
      if (!is4x4) {
        val has = co.lumaDc.exists(_ != 0)
        e.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 0,
          component = 0, blk = 0, curMb = mbIdx), if (has) 1 else 0)
        ctx.lumaDcCbf(mbIdx) = has
        if (has) writeResidual(e, 0, co.lumaDc)
      }
      val lumaCat = if (is4x4) 2 else 1
      var z = 0
      while (z < 16) {
        if ((cbpLuma & (1 << (z >> 2))) != 0) {
          val nz = co.lumaAc(z).count(_ != 0)
          e.decision(cbfCtx(ctx, mbX, mbY, sliceId, lumaCat,
            component = 0, blk = z, curMb = mbIdx),
            if (nz > 0) 1 else 0)
          if (nz > 0) writeResidual(e, lumaCat, co.lumaAc(z))
          ctx.lumaNz(mbIdx)(z) = nz
        } else ctx.lumaNz(mbIdx)(z) = 0
        z += 1
      }
      if (cbpChroma != 0) {
        val hasCb = co.cbDc.exists(_ != 0)
        e.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 3,
          component = 1, blk = 0, curMb = mbIdx), if (hasCb) 1 else 0)
        ctx.cbDcCbf(mbIdx) = hasCb
        if (hasCb) writeResidual(e, 3, co.cbDc)
        val hasCr = co.crDc.exists(_ != 0)
        e.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 3,
          component = 2, blk = 0, curMb = mbIdx), if (hasCr) 1 else 0)
        ctx.crDcCbf(mbIdx) = hasCr
        if (hasCr) writeResidual(e, 3, co.crDc)
      }
      if (cbpChroma == 2) {
        var b = 0
        while (b < 4) {
          val nz = co.cbAc(b).count(_ != 0)
          e.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 4,
            component = 1, blk = b, curMb = mbIdx),
            if (nz > 0) 1 else 0)
          if (nz > 0) writeResidual(e, 4, co.cbAc(b))
          ctx.cbNz(mbIdx)(b) = nz
          b += 1
        }
        b = 0
        while (b < 4) {
          val nz = co.crAc(b).count(_ != 0)
          e.decision(cbfCtx(ctx, mbX, mbY, sliceId, cat = 4,
            component = 2, blk = b, curMb = mbIdx),
            if (nz > 0) 1 else 0)
          if (nz > 0) writeResidual(e, 4, co.crAc(b))
          ctx.crNz(mbIdx)(b) = nz
          b += 1
        }
      } else {
        var b = 0
        while (b < 4) {
          ctx.cbNz(mbIdx)(b) = 0; ctx.crNz(mbIdx)(b) = 0; b += 1
        }
      }

      mbIdx += 1
      e.terminate(if (mbIdx == endMb) 1 else 0) // end_of_slice_flag
      }
    }
  }

  /** Encoder mirror of [[readPcmSamples]]: write the SOURCE samples
    * raw and copy them into the recon planes (I_PCM is lossless). */
  private def writePcmSamples(w: BitWriter, ctx: PicCtx, mbIdx: Int,
                              srcY: Array[Int], srcCb: Array[Int],
                              srcCr: Array[Int], yP: Array[Byte],
                              cbP: Array[Byte],
                              crP: Array[Byte]): Unit = {
    val mbX = (mbIdx % ctx.wMbs) * 16
    val mbY = (mbIdx / ctx.wMbs) * 16
    val lw = ctx.wMbs * 16
    val cw = ctx.wMbs * 8
    var i = 0
    while (i < 256) {
      val o = (mbY + i / 16) * lw + mbX + i % 16
      w.u(srcY(o) & 0xFF, 8)
      yP(o) = srcY(o).toByte
      i += 1
    }
    val cX = mbX / 2; val cY = mbY / 2
    i = 0
    while (i < 64) {
      val o = (cY + i / 8) * cw + cX + i % 8
      w.u(srcCb(o) & 0xFF, 8); cbP(o) = srcCb(o).toByte; i += 1
    }
    i = 0
    while (i < 64) {
      val o = (cY + i / 8) * cw + cX + i % 8
      w.u(srcCr(o) & 0xFF, 8); crP(o) = srcCr(o).toByte; i += 1
    }
  }
}
