package graft.multimodal

import H264.{BitReader, BitWriter}

/**
 * CAVLC entropy coding + intra prediction + transform/quantization for
 * H.264 I slices (ITU-T Rec. H.264 / ISO 14496-10 — public spec),
 * extending the Annex-B plumbing in [[H264]] past I_PCM to real
 * compressed intra macroblocks:
 *
 *  - [[Cavlc]]: residual_block_cavlc (§9.2) — coeff_token (Table 9-5),
 *    trailing-one signs, level decoding with adaptive suffix length
 *    (§9.2.2), total_zeros (Tables 9-7/9-8/9-9a), run_before
 *    (Table 9-10) — decode AND encode directions;
 *  - [[Intra]]: Intra_4x4 modes 0–8 (§8.3.1), Intra_16x16 modes 0–3
 *    (§8.3.3), chroma modes 0–3 (§8.3.4), all from reconstructed
 *    neighbor samples with spec availability/substitution rules;
 *  - [[Transform]]: 4x4 inverse core transform (§8.5.12.2), luma DC
 *    Hadamard (§8.5.10), chroma DC (§8.5.11), dequant with flat
 *    scaling lists, plus the forward transform/quant pair used by the
 *    fixture encoder (reconstruction goes through the SAME inverse
 *    path a decoder must implement, so encoder recon == decoder
 *    output bit-exactly — the round-trip contract H264Spec pins).
 *
 * SCOPE (stated plainly, continuing `H264.scala:20-30`'s honesty
 * contract): CAVLC I slices only — CABAC, inter prediction (P/B),
 * transform_8x8, scaling matrices and the deblocking filter are NOT
 * implemented. Deblocking in particular means a stream that enables
 * it decodes here to PRE-deblock pixels (fingerprint-stable, not
 * display-exact); the fixture encoder therefore signals
 * disable_deblocking_filter_idc=1 so its output is exact under any
 * conformant decoder too. Table transcription risk is mitigated three
 * ways (H264Spec): structural prefix-freeness checks over every VLC
 * table, encode↔decode round-trips across the full (nC, TotalCoeff,
 * TrailingOnes, escape-level) space, and hand-derived golden vectors
 * decoded bit-exactly.
 */
private[graft] object Cavlc {

  /** One VLC entry: (bitLength, codeValue). */
  type Code = (Int, Int)

  // Table 9-5 coeff_token, keyed [trailingOnes][totalCoeff], one table
  // per nC class. Entry (0,0) marks an invalid combination (T1 > TC).
  private val X: Code = (0, 0)

  /** nC in [0,2). */
  val coeffToken0: Array[Array[Code]] = Array(
    // T1 = 0: TC 0..16
    Array((1, 1), (6, 5), (8, 7), (9, 7), (10, 7), (11, 7), (13, 15),
      (13, 11), (13, 8), (14, 15), (14, 11), (15, 15), (15, 11),
      (16, 15), (16, 11), (16, 7), (16, 4)),
    // T1 = 1
    Array(X, (2, 1), (6, 4), (8, 6), (9, 6), (10, 6), (11, 6),
      (13, 14), (13, 10), (14, 14), (14, 10), (15, 14), (15, 10),
      (15, 1), (16, 14), (16, 10), (16, 6)),
    // T1 = 2
    Array(X, X, (3, 1), (7, 5), (8, 5), (9, 5), (10, 5), (11, 5),
      (13, 13), (13, 9), (14, 13), (14, 9), (15, 13), (15, 9),
      (16, 13), (16, 9), (16, 5)),
    // T1 = 3
    Array(X, X, X, (5, 3), (6, 3), (7, 4), (8, 4), (9, 4), (10, 4),
      (11, 4), (13, 12), (14, 12), (14, 8), (15, 12), (15, 8),
      (16, 12), (16, 8)))

  /** nC in [2,4). */
  val coeffToken1: Array[Array[Code]] = Array(
    Array((2, 3), (6, 11), (6, 7), (7, 7), (8, 7), (8, 4), (9, 7),
      (11, 15), (11, 11), (12, 15), (12, 11), (12, 8), (13, 15),
      (13, 11), (13, 7), (14, 9), (14, 7)),
    Array(X, (2, 2), (5, 7), (6, 10), (6, 6), (7, 6), (8, 6), (9, 6),
      (11, 14), (11, 10), (12, 14), (12, 10), (13, 14), (13, 10),
      (14, 11), (14, 8), (14, 6)),
    Array(X, X, (3, 3), (6, 9), (6, 5), (7, 5), (8, 5), (9, 5),
      (11, 13), (11, 9), (12, 13), (12, 9), (13, 13), (13, 9),
      (13, 6), (14, 10), (14, 5)),
    Array(X, X, X, (4, 5), (4, 4), (5, 6), (6, 8), (6, 4), (7, 4),
      (9, 4), (11, 12), (11, 8), (12, 12), (13, 12), (13, 8),
      (13, 1), (14, 4)))

  /** nC in [4,8). */
  val coeffToken2: Array[Array[Code]] = Array(
    Array((4, 15), (6, 15), (6, 11), (6, 8), (7, 15), (7, 11), (7, 9),
      (7, 8), (8, 15), (8, 11), (9, 15), (9, 11), (9, 8), (10, 13),
      (10, 9), (10, 5), (10, 1)),
    Array(X, (4, 14), (5, 15), (5, 12), (5, 10), (5, 8), (6, 14),
      (6, 10), (7, 14), (8, 14), (8, 10), (9, 14), (9, 10), (9, 7),
      (10, 12), (10, 8), (10, 4)),
    Array(X, X, (4, 13), (5, 14), (5, 11), (5, 9), (6, 13), (6, 9),
      (7, 13), (7, 10), (8, 13), (8, 9), (9, 13), (9, 9), (10, 11),
      (10, 7), (10, 3)),
    Array(X, X, X, (4, 12), (4, 11), (4, 10), (4, 9), (4, 8), (5, 13),
      (6, 12), (7, 12), (8, 12), (8, 8), (9, 12), (10, 10), (10, 6),
      (10, 2)))

  /** chroma DC, 4:2:0 (nC == -1); TC 0..4. */
  val coeffTokenChromaDc: Array[Array[Code]] = Array(
    Array((2, 1), (6, 7), (6, 4), (6, 3), (6, 2)),
    Array(X, (1, 1), (6, 6), (7, 3), (8, 3)),
    Array(X, X, (3, 1), (7, 2), (8, 2)),
    Array(X, X, X, (6, 5), (7, 0)))

  /** Table-9-5 column for an nC value; None → the nC ≥ 8 6-bit FLC. */
  private def coeffTokenTable(nC: Int): Option[Array[Array[Code]]] =
    if (nC == -1) Some(coeffTokenChromaDc)
    else if (nC < 2) Some(coeffToken0)
    else if (nC < 4) Some(coeffToken1)
    else if (nC < 8) Some(coeffToken2)
    else None

  // Tables 9-7 / 9-8 total_zeros for 4x4 blocks, keyed
  // [totalCoeff-1][totalZeros]; row length = 17 - totalCoeff.
  val totalZeros4x4: Array[Array[Code]] = Array(
    Array((1, 1), (3, 3), (3, 2), (4, 3), (4, 2), (5, 3), (5, 2),
      (6, 3), (6, 2), (7, 3), (7, 2), (8, 3), (8, 2), (9, 3), (9, 2),
      (9, 1)),
    Array((3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (4, 5), (4, 4),
      (4, 3), (4, 2), (5, 3), (5, 2), (6, 3), (6, 2), (6, 1), (6, 0)),
    Array((4, 5), (3, 7), (3, 6), (3, 5), (4, 4), (4, 3), (3, 4),
      (3, 3), (4, 2), (5, 3), (5, 2), (6, 1), (5, 1), (6, 0)),
    Array((5, 3), (3, 7), (4, 5), (4, 4), (3, 6), (3, 5), (3, 4),
      (4, 3), (3, 3), (4, 2), (5, 2), (5, 1), (5, 0)),
    Array((4, 5), (4, 4), (4, 3), (3, 7), (3, 6), (3, 5), (3, 4),
      (3, 3), (4, 2), (5, 1), (4, 1), (5, 0)),
    Array((6, 1), (5, 1), (3, 7), (3, 6), (3, 5), (3, 4), (3, 3),
      (3, 2), (4, 1), (3, 1), (6, 0)),
    Array((6, 1), (5, 1), (3, 5), (3, 4), (3, 3), (2, 3), (3, 2),
      (4, 1), (3, 1), (6, 0)),
    Array((6, 1), (4, 1), (5, 1), (3, 3), (2, 3), (2, 2), (3, 2),
      (3, 1), (6, 0)),
    Array((6, 1), (6, 0), (4, 1), (2, 3), (2, 2), (3, 1), (2, 1),
      (5, 1)),
    Array((5, 1), (5, 0), (3, 1), (2, 3), (2, 2), (2, 1), (4, 1)),
    Array((4, 0), (4, 1), (3, 1), (3, 2), (1, 1), (3, 3)),
    Array((4, 0), (4, 1), (2, 1), (1, 1), (3, 1)),
    Array((3, 0), (3, 1), (1, 1), (2, 1)),
    Array((2, 0), (2, 1), (1, 1)),
    Array((1, 0), (1, 1)))

  // Table 9-9(a) total_zeros for chroma DC (4:2:0), keyed
  // [totalCoeff-1][totalZeros]; row length = 4 - totalCoeff.
  val totalZerosChromaDc: Array[Array[Code]] = Array(
    Array((1, 1), (2, 1), (3, 1), (3, 0)),
    Array((1, 1), (2, 1), (2, 0)),
    Array((1, 1), (1, 0)))

  // Table 9-10 run_before, keyed [min(zerosLeft,7)-1][run].
  val runBefore: Array[Array[Code]] = Array(
    Array((1, 1), (1, 0)),
    Array((1, 1), (2, 1), (2, 0)),
    Array((2, 3), (2, 2), (2, 1), (2, 0)),
    Array((2, 3), (2, 2), (2, 1), (3, 1), (3, 0)),
    Array((2, 3), (2, 2), (3, 3), (3, 2), (3, 1), (3, 0)),
    Array((2, 3), (3, 0), (3, 1), (3, 3), (3, 2), (3, 5), (3, 4)),
    Array((3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (3, 2), (3, 1),
      (4, 1), (5, 1), (6, 1), (7, 1), (8, 1), (9, 1), (10, 1),
      (11, 1)))

  /** Longest-prefix VLC read: scan a (len, code) table for the entry
    * matching the next bits. Tables are prefix-free (H264Spec proves
    * it), so at most one entry matches; a corrupt stream that matches
    * none throws, which the degrade-don't-fail Try upstream absorbs. */
  private def readVlc2(r: BitReader,
                       table: Array[Array[Code]]): (Int, Int) = {
    var bits = 0
    var len = 0
    while (len < 17) {
      bits = (bits << 1) | r.u(1)
      len += 1
      var t1 = 0
      while (t1 < table.length) {
        val row = table(t1)
        var tc = 0
        while (tc < row.length) {
          if (row(tc)._1 == len && row(tc)._2 == bits)
            return (t1, tc)
          tc += 1
        }
        t1 += 1
      }
    }
    throw new IllegalArgumentException("no coeff_token match (corrupt)")
  }

  private def readVlc1(r: BitReader, row: Array[Code]): Int = {
    var bits = 0
    var len = 0
    while (len < 12) {
      bits = (bits << 1) | r.u(1)
      len += 1
      var i = 0
      while (i < row.length) {
        if (row(i)._1 == len && row(i)._2 == bits) return i
        i += 1
      }
    }
    throw new IllegalArgumentException("no VLC match (corrupt)")
  }

  /**
   * residual_block_cavlc (§7.3.5.3.2 / §9.2): decode one block of
   * `maxCoeffs` transform levels (16 = standalone 4x4, 15 = AC-only,
   * 4 = chroma DC) using context `nC`. Returns levels in SCAN order
   * (zig-zag position 0 first) and the block's TotalCoeff for the
   * caller's nC bookkeeping.
   */
  def readResidualBlock(r: BitReader, nC: Int,
                        maxCoeffs: Int): (Array[Int], Int) = {
    val out = new Array[Int](maxCoeffs)
    // coeff_token → (TrailingOnes, TotalCoeff)
    val (t1s, tc) = coeffTokenTable(nC) match {
      case Some(t) => readVlc2(r, t)
      case None => // nC >= 8: 6-bit FLC
        val v = r.u(6)
        if (v == 3) (0, 0) else (v & 3, (v >> 2) + 1)
    }
    if (tc == 0) return (out, 0)
    // levels, highest scan index first
    val levels = new Array[Int](tc)
    var suffixLength = if (tc > 10 && t1s < 3) 1 else 0
    var i = 0
    while (i < tc) {
      if (i < t1s) {
        levels(i) = if (r.u(1) == 1) -1 else 1
      } else {
        var prefix = 0
        while (r.u(1) == 0) {
          prefix += 1
          require(prefix <= 32, "level_prefix too long (corrupt)")
        }
        var suffixSize = suffixLength
        if (prefix == 14 && suffixLength == 0) suffixSize = 4
        else if (prefix >= 15) suffixSize = prefix - 3
        var levelCode = math.min(15, prefix) << suffixLength
        if (suffixSize > 0) levelCode += r.u(suffixSize)
        if (prefix >= 15 && suffixLength == 0) levelCode += 15
        if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
        if (i == t1s && t1s < 3) levelCode += 2
        levels(i) =
          if (levelCode % 2 == 0) (levelCode + 2) >> 1
          else -((levelCode + 1) >> 1)
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(levels(i)) > (3 << (suffixLength - 1)) &&
            suffixLength < 6) suffixLength += 1
      }
      i += 1
    }
    // total_zeros
    val totalZeros =
      if (tc == maxCoeffs) 0
      else if (maxCoeffs == 4) readVlc1(r, totalZerosChromaDc(tc - 1))
      else readVlc1(r, totalZeros4x4(tc - 1))
    // run_before per coefficient, last-to-first in scan order
    var zerosLeft = totalZeros
    var pos = tc - 1 + totalZeros // scan index of the highest coeff
    i = 0
    while (i < tc) {
      val run =
        if (zerosLeft == 0) 0
        else if (i == tc - 1) zerosLeft // the rest precede the first coeff
        else readVlc1(r, runBefore(math.min(zerosLeft, 7) - 1))
      out(pos) = levels(i)
      pos -= run + 1
      zerosLeft -= run
      i += 1
    }
    (out, tc)
  }

  private def writeVlc(w: BitWriter, c: Code): Unit = w.u(c._2, c._1)

  /** Encode one residual block (levels in scan order) — the exact
    * inverse of [[readResidualBlock]], used by the fixture encoder. */
  def writeResidualBlock(w: BitWriter, coeffs: Array[Int],
                         nC: Int): Int = {
    val maxCoeffs = coeffs.length
    // gather nonzero levels, highest scan index first
    val idx = coeffs.indices.filter(coeffs(_) != 0).reverse
    val tc = idx.size
    require(tc <= maxCoeffs)
    // trailing ones: up to 3 |level|==1 at the high end
    var t1s = 0
    while (t1s < 3 && t1s < tc &&
        math.abs(coeffs(idx(t1s))) == 1) t1s += 1
    coeffTokenTable(nC) match {
      case Some(t) =>
        val c = t(t1s)(tc)
        require(c._1 > 0, s"invalid coeff_token T1=$t1s TC=$tc")
        writeVlc(w, c)
      case None =>
        w.u(if (tc == 0) 3 else ((tc - 1) << 2) | t1s, 6)
    }
    if (tc == 0) return 0
    var suffixLength = if (tc > 10 && t1s < 3) 1 else 0
    var i = 0
    while (i < tc) {
      val level = coeffs(idx(i))
      if (i < t1s) {
        w.u(if (level < 0) 1 else 0, 1)
      } else {
        var levelCode =
          if (level > 0) 2 * level - 2 else -2 * level - 1
        if (i == t1s && t1s < 3) levelCode -= 2
        if (suffixLength == 0) {
          if (levelCode < 14) {
            w.u(1, levelCode + 1) // prefix = levelCode, then the 1
          } else if (levelCode < 30) {
            w.u(1, 15) // prefix 14
            w.u(levelCode - 14, 4)
          } else {
            // escape: prefix >= 15; levelCode includes the +15 the
            // decoder adds back
            writeEscape(w, levelCode - 15, 0)
          }
        } else {
          if (levelCode < (15 << suffixLength)) {
            val prefix = levelCode >> suffixLength
            w.u(1, prefix + 1)
            w.u(levelCode & ((1 << suffixLength) - 1), suffixLength)
          } else {
            writeEscape(w, levelCode, suffixLength)
          }
        }
        if (suffixLength == 0) suffixLength = 1
        if (math.abs(level) > (3 << (suffixLength - 1)) &&
            suffixLength < 6) suffixLength += 1
      }
      i += 1
    }
    val totalZeros = idx.head - (tc - 1)
    if (tc != maxCoeffs) {
      if (maxCoeffs == 4) writeVlc(w, totalZerosChromaDc(tc - 1)(totalZeros))
      else writeVlc(w, totalZeros4x4(tc - 1)(totalZeros))
    }
    var zerosLeft = totalZeros
    i = 0
    while (i < tc && zerosLeft > 0) {
      if (i < tc - 1) {
        val run = idx(i) - idx(i + 1) - 1
        writeVlc(w, runBefore(math.min(zerosLeft, 7) - 1)(run))
        zerosLeft -= run
      }
      i += 1
    }
    tc
  }

  /** Escape level (prefix ≥ 15): pick the smallest prefix whose
    * suffix (prefix-3 bits) can carry levelCode, mirroring the
    * decoder's `+ (1 << (prefix - 3)) - 4096` extension. */
  private def writeEscape(w: BitWriter, levelCode: Int,
                          suffixLength: Int): Unit = {
    val base = 15 << suffixLength // the decoder's min(15, prefix) term
    var prefix = 15
    while ({
      val ext = if (prefix >= 16) (1 << (prefix - 3)) - 4096 else 0
      val lo = base + ext
      val hi = lo + (1 << (prefix - 3)) - 1
      !(levelCode >= lo && levelCode <= hi)
    }) {
      prefix += 1
      require(prefix <= 32, s"levelCode $levelCode not encodable")
    }
    val ext = if (prefix >= 16) (1 << (prefix - 3)) - 4096 else 0
    w.u(0, prefix) // prefix zeros
    w.u(1, 1)
    w.u(levelCode - base - ext, prefix - 3)
  }
}

/**
 * Integer transform, quantization and QP plumbing (§8.5) with flat
 * scaling lists (scaling matrices are rejected at SPS/PPS parse). All
 * arithmetic is the spec's bit-exact integer form — the encoder's
 * reconstruction uses the SAME dequant/inverse path, which is what
 * makes fixture round-trips exact.
 */
/**
 * Resolved quantization weight matrices for one picture (§8.5.9):
 * `w4` = WeightScale4x4 lists 0-5 (raster 16), `w8` = WeightScale8x8
 * lists 0-1 → spec lists 6 (intra) / 7 (inter) (raster 64). The
 * FLAT matrices (all 16) are the no-scaling-matrix default; SPS/PPS
 * scaling lists (§7.3.2.1.1.1 + the Table 7-2 fallback rules,
 * parsed in [[H264]]) replace them per picture.
 */
private[graft] final class ScalingMatrices(val w4: Array[Array[Int]],
                                           val w8: Array[Array[Int]]) {
  require(w4.length == 6 && w4.forall(_.length == 16), "w4 shape")
  require(w8.length == 2 && w8.forall(_.length == 64), "w8 shape")
}

private[graft] object ScalingMatrices {
  val Flat: ScalingMatrices = new ScalingMatrices(
    Array.fill(6)(Array.fill(16)(16)), Array.fill(2)(Array.fill(64)(16)))

  /** Table 7-3 defaults, RASTER order (the spec lists them in scan
    * order; these are the equivalent matrices). */
  val Default4x4Intra: Array[Int] = Array(
    6, 13, 20, 28,
    13, 20, 28, 32,
    20, 28, 32, 37,
    28, 32, 37, 42)
  val Default4x4Inter: Array[Int] = Array(
    10, 14, 20, 24,
    14, 20, 24, 27,
    20, 24, 27, 30,
    24, 27, 30, 34)

  /** Table 7-4 defaults, RASTER order. */
  val Default8x8Intra: Array[Int] = Array(
    6, 10, 13, 16, 18, 23, 25, 27,
    10, 11, 16, 18, 23, 25, 27, 29,
    13, 16, 18, 23, 25, 27, 29, 31,
    16, 18, 23, 25, 27, 29, 31, 33,
    18, 23, 25, 27, 29, 31, 33, 36,
    23, 25, 27, 29, 31, 33, 36, 38,
    25, 27, 29, 31, 33, 36, 38, 40,
    27, 29, 31, 33, 36, 38, 40, 42)
  val Default8x8Inter: Array[Int] = Array(
    9, 13, 15, 17, 19, 21, 22, 24,
    13, 13, 17, 19, 21, 22, 24, 25,
    15, 17, 19, 21, 22, 24, 25, 27,
    17, 19, 21, 22, 24, 25, 27, 28,
    19, 21, 22, 24, 25, 27, 28, 30,
    21, 22, 24, 25, 27, 28, 30, 32,
    22, 24, 25, 27, 28, 30, 32, 33,
    24, 25, 27, 28, 30, 32, 33, 35)
}

private[graft] object Transform {

  /** Zig-zag scan (§8.5.6 frame scan): scanPos → raster idx in 4x4. */
  val zigzag4x4: Array[Int] =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** 8x8 zig-zag frame scan (Table 8-8): scanPos → raster idx,
    * generated by the standard diagonal walk (the H.264 8x8 frame
    * scan IS the classic zig-zag). */
  val zigzag8x8: Array[Int] = {
    val out = new Array[Int](64)
    var r = 0; var c = 0
    var k = 0
    while (k < 64) {
      out(k) = r * 8 + c
      if (((r + c) & 1) == 0) { // moving up-right
        if (c == 7) r += 1
        else if (r == 0) c += 1
        else { r -= 1; c += 1 }
      } else { // moving down-left
        if (r == 7) c += 1
        else if (c == 0) r += 1
        else { r += 1; c -= 1 }
      }
      k += 1
    }
    out
  }

  /** normAdjust4x4 (Table in §8.5.9): [qp%6][class] where class
    * 0 = positions (0,0),(0,2),(2,0),(2,2); 1 = (1,1),(1,3),(3,1),
    * (3,3); 2 = other. */
  private val normAdjust: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  /** Forward quant multipliers (the public reference-encoder MF
    * table, the exact integer inverse pair of normAdjust). */
  private val mf: Array[Array[Int]] = Array(
    Array(13107, 5243, 8066), Array(11916, 4660, 7490),
    Array(10082, 4194, 6554), Array(9362, 3647, 5825),
    Array(8192, 3355, 5243), Array(7282, 2893, 4559))

  /** Position class for the normAdjust/MF tables (raster idx). */
  private def posClass(idx: Int): Int = {
    val r = idx >> 2; val c = idx & 3
    if (r % 2 == 0 && c % 2 == 0) 0
    else if (r % 2 == 1 && c % 2 == 1) 1
    else 2
  }

  /** Table 8-15: QPc from qPi (identity below 30). */
  private val qpcTab = Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
    36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39)

  def chromaQp(qpY: Int, offset: Int): Int = {
    val qPi = math.max(0, math.min(51, qpY + offset))
    if (qPi < 30) qPi else qpcTab(qPi - 30)
  }

  /** Dequant one AC/standalone coefficient at raster idx (§8.5.12.1)
    * with quant weight `w` (WeightScale4x4 entry; 16 = flat). The
    * general form LevelScale = w · normAdjust with the qP < 24
    * rounding; for w = 16 it reduces EXACTLY to the historical
    * c · normAdjust << (qp/6) shortcut (the product is divisible by
    * 2^4, so the rounding term never carries). */
  def dequant(c: Int, qp: Int, idx: Int, w: Int = 16): Int = {
    val ls = w * normAdjust(qp % 6)(posClass(idx))
    if (qp >= 24) (c * ls) << (qp / 6 - 4)
    else (c * ls + (1 << (3 - qp / 6))) >> (4 - qp / 6)
  }

  /** Inverse 4x4 core transform + (x+32)>>6 rounding (§8.5.12.2);
    * input/output raster order. Output is the residual to add. */
  def inverse4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows
      val d0 = d(i * 4); val d1 = d(i * 4 + 1)
      val d2 = d(i * 4 + 2); val d3 = d(i * 4 + 3)
      val a = d0 + d2; val b = d0 - d2
      val c = (d1 >> 1) - d3; val f = d1 + (d3 >> 1)
      e(i * 4) = a + f; e(i * 4 + 1) = b + c
      e(i * 4 + 2) = b - c; e(i * 4 + 3) = a - f
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) { // columns
      val d0 = e(i); val d1 = e(4 + i); val d2 = e(8 + i)
      val d3 = e(12 + i)
      val a = d0 + d2; val b = d0 - d2
      val c = (d1 >> 1) - d3; val f = d1 + (d3 >> 1)
      out(i) = (a + f + 32) >> 6
      out(4 + i) = (b + c + 32) >> 6
      out(8 + i) = (b - c + 32) >> 6
      out(12 + i) = (a - f + 32) >> 6
      i += 1
    }
    out
  }

  /** 4x4 Hadamard (rows then columns, no scaling) — both the §8.5.10
    * inverse for luma DC and the forward used by the encoder. */
  def hadamard4x4(d: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val d0 = d(i * 4); val d1 = d(i * 4 + 1)
      val d2 = d(i * 4 + 2); val d3 = d(i * 4 + 3)
      val a = d0 + d2; val b = d0 - d2; val c = d1 - d3
      val f = d1 + d3
      e(i * 4) = a + f; e(i * 4 + 1) = b + c
      e(i * 4 + 2) = b - c; e(i * 4 + 3) = a - f
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) {
      val d0 = e(i); val d1 = e(4 + i); val d2 = e(8 + i)
      val d3 = e(12 + i)
      val a = d0 + d2; val b = d0 - d2; val c = d1 - d3
      val f = d1 + d3
      out(i) = a + f; out(4 + i) = b + c
      out(8 + i) = b - c; out(12 + i) = a - f
      i += 1
    }
    out
  }

  /** Luma DC dequant after the inverse Hadamard (§8.5.10); `w0` is
    * WeightScale4x4[list](0,0) (16 = flat). */
  def dequantLumaDc(f: Int, qp: Int, w0: Int = 16): Int = {
    val ls = w0 * normAdjust(qp % 6)(0)
    if (qp >= 36) (f * ls) << (qp / 6 - 6)
    else (f * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  /** Chroma DC: 2x2 Hadamard then §8.5.11 scaling; `w0` as above. */
  def chromaDcTransformDequant(c: Array[Int], qpC: Int,
                               w0: Int = 16): Array[Int] = {
    val f0 = c(0) + c(1) + c(2) + c(3)
    val f1 = c(0) - c(1) + c(2) - c(3)
    val f2 = c(0) + c(1) - c(2) - c(3)
    val f3 = c(0) - c(1) - c(2) + c(3)
    val ls = w0 * normAdjust(qpC % 6)(0)
    Array(f0, f1, f2, f3).map(f => ((f * ls) << (qpC / 6)) >> 5)
  }

  /** Forward 2x2 Hadamard (chroma DC, encoder side). */
  def hadamard2x2(c: Array[Int]): Array[Int] =
    Array(c(0) + c(1) + c(2) + c(3), c(0) - c(1) + c(2) - c(3),
      c(0) + c(1) - c(2) - c(3), c(0) - c(1) - c(2) + c(3))

  /** Forward 4x4 core transform (encoder side): Cf · X · CfT. */
  def forward4x4(x: Array[Int]): Array[Int] = {
    val e = new Array[Int](16)
    var i = 0
    while (i < 4) { // rows: Cf on the right as row transform
      val x0 = x(i * 4); val x1 = x(i * 4 + 1)
      val x2 = x(i * 4 + 2); val x3 = x(i * 4 + 3)
      val s0 = x0 + x3; val s1 = x1 + x2
      val s2 = x1 - x2; val s3 = x0 - x3
      e(i * 4) = s0 + s1; e(i * 4 + 1) = 2 * s3 + s2
      e(i * 4 + 2) = s0 - s1; e(i * 4 + 3) = s3 - 2 * s2
      i += 1
    }
    val out = new Array[Int](16)
    i = 0
    while (i < 4) { // columns
      val x0 = e(i); val x1 = e(4 + i); val x2 = e(8 + i)
      val x3 = e(12 + i)
      val s0 = x0 + x3; val s1 = x1 + x2
      val s2 = x1 - x2; val s3 = x0 - x3
      out(i) = s0 + s1; out(4 + i) = 2 * s3 + s2
      out(8 + i) = s0 - s1; out(12 + i) = s3 - 2 * s2
      i += 1
    }
    out
  }

  /** Forward quant of one core-transform coefficient (intra rounding
    * f = 2^qbits/3 — the public reference-encoder rule). A non-flat
    * quant weight `weight` scales the step up by weight/16 (encoder
    * side is non-normative; Long arithmetic keeps it overflow-safe). */
  def quant(w: Int, qp: Int, idx: Int, weight: Int = 16): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val m = mf(qp % 6)(posClass(idx))
    val m16 =
      if (weight == 16) m.toLong
      else (m.toLong * 16 + weight / 2) / weight
    val v = ((math.abs(w).toLong * m16 + f) >> qbits).toInt
    if (w < 0) -v else v
  }

  /** Forward quant for DC coefficients (doubled rounding, +1 shift —
    * the standard pairing with §8.5.10/§8.5.11 dequant). */
  def quantDc(w: Int, qp: Int, weight: Int = 16): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val m = mf(qp % 6)(0)
    val m16 =
      if (weight == 16) m.toLong
      else (m.toLong * 16 + weight / 2) / weight
    val v = ((math.abs(w).toLong * m16 + 2 * f) >> (qbits + 1)).toInt
    if (w < 0) -v else v
  }

  // ---- 8x8 transform (§8.5.12.3/§8.5.13, High profile) -------------

  /** normAdjust8x8 (§8.5.13.1): [qp%6][class] — the 6-class position
    * pattern below. */
  private val normAdjust8: Array[Array[Int]] = Array(
    Array(20, 18, 32, 19, 25, 24), Array(22, 19, 35, 21, 28, 26),
    Array(26, 23, 42, 24, 33, 31), Array(28, 25, 45, 26, 35, 33),
    Array(32, 28, 51, 30, 40, 38), Array(36, 32, 58, 34, 46, 43))

  /** Forward quant multipliers for 8x8 (the public reference-encoder
    * MF8 table, the integer inverse pair of normAdjust8). */
  private val mf8: Array[Array[Int]] = Array(
    Array(13107, 11428, 20972, 12222, 16777, 15481),
    Array(11916, 10826, 19174, 11058, 14980, 14290),
    Array(10082, 8943, 15978, 9675, 12710, 11985),
    Array(9362, 8228, 14913, 8931, 11984, 11259),
    Array(8192, 7346, 13159, 7740, 10486, 9777),
    Array(7282, 6428, 11570, 6830, 9118, 8640))

  /** Position class for the 8x8 tables, keyed by (row%4, col%4):
    * (0,0)→0; odd,odd→1; (2,2)→2; 0↔odd→3; 0↔2→4; 2↔odd→5. */
  private val posClass8Tab: Array[Int] = Array(
    0, 3, 4, 3,
    3, 1, 5, 1,
    4, 5, 2, 5,
    3, 1, 5, 1)
  private def posClass8(idx: Int): Int =
    posClass8Tab(((idx >> 3) & 3) * 4 + (idx & 3))

  /** Dequant one 8x8 coefficient at raster idx (§8.5.13.1) with
    * quant weight `w` (WeightScale8x8 entry; 16 = flat). */
  def dequant8(c: Int, qp: Int, idx: Int, w: Int = 16): Int = {
    val ls = w * normAdjust8(qp % 6)(posClass8(idx))
    if (qp >= 36) (c * ls) << (qp / 6 - 6)
    else (c * ls + (1 << (5 - qp / 6))) >> (6 - qp / 6)
  }

  /** Inverse 8x8 core transform + (x+32)>>6 rounding (§8.5.12.3);
    * raster in/out. The row/column butterfly is the spec's: even
    * half a 4-point stage, odd half the ±(x>>1)/±(x>>2) ladder. */
  def inverse8x8(d: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](64)
    def pass(src: Array[Int], dst: Array[Int], rowMajor: Boolean,
             round: Boolean): Unit = {
      var i = 0
      while (i < 8) {
        def at(k: Int): Int =
          if (rowMajor) src(i * 8 + k) else src(k * 8 + i)
        val d0 = at(0); val d1 = at(1); val d2 = at(2); val d3 = at(3)
        val d4 = at(4); val d5 = at(5); val d6 = at(6); val d7 = at(7)
        val a0 = d0 + d4
        val a4 = d0 - d4
        val a2 = (d2 >> 1) - d6
        val a6 = d2 + (d6 >> 1)
        val b0 = a0 + a6
        val b2 = a4 + a2
        val b4 = a4 - a2
        val b6 = a0 - a6
        val a1 = -d3 + d5 - d7 - (d7 >> 1)
        val a3 = d1 + d7 - d3 - (d3 >> 1)
        val a5 = -d1 + d7 + d5 + (d5 >> 1)
        val a7 = d3 + d5 + d1 + (d1 >> 1)
        val b1 = a1 + (a7 >> 2)
        val b7 = a7 - (a1 >> 2)
        val b3 = a3 + (a5 >> 2)
        val b5 = (a3 >> 2) - a5
        val o = Array(b0 + b7, b2 + b5, b4 + b3, b6 + b1,
          b6 - b1, b4 - b3, b2 - b5, b0 - b7)
        var k = 0
        while (k < 8) {
          val v = if (round) (o(k) + 32) >> 6 else o(k)
          if (rowMajor) dst(i * 8 + k) = v else dst(k * 8 + i) = v
          k += 1
        }
        i += 1
      }
    }
    pass(d, tmp, rowMajor = true, round = false)
    val out = new Array[Int](64)
    pass(tmp, out, rowMajor = false, round = true)
    out
  }

  /** Forward 8x8 integer transform (encoder side; the public
    * reference-encoder butterfly that pairs with [[inverse8x8]]). */
  def forward8x8(x: Array[Int]): Array[Int] = {
    val tmp = new Array[Int](64)
    def pass(src: Array[Int], dst: Array[Int], rowMajor: Boolean): Unit = {
      var i = 0
      while (i < 8) {
        def at(k: Int): Int =
          if (rowMajor) src(i * 8 + k) else src(k * 8 + i)
        val d0 = at(0); val d1 = at(1); val d2 = at(2); val d3 = at(3)
        val d4 = at(4); val d5 = at(5); val d6 = at(6); val d7 = at(7)
        val a0 = d0 + d7; val a1 = d1 + d6; val a2 = d2 + d5
        val a3 = d3 + d4
        val a4 = d0 - d7; val a5 = d1 - d6; val a6 = d2 - d5
        val a7 = d3 - d4
        val b0 = a0 + a3; val b1 = a1 + a2
        val b2 = a0 - a3; val b3 = a1 - a2
        val b4 = a5 + a6 + ((a4 >> 1) + a4)
        val b5 = a4 - a7 - ((a6 >> 1) + a6)
        val b6 = a4 + a7 - ((a5 >> 1) + a5)
        val b7 = a5 - a6 + ((a7 >> 1) + a7)
        val o = Array(
          b0 + b1,
          b4 + (b7 >> 2),
          b2 + (b3 >> 1),
          b5 + (b6 >> 2),
          b0 - b1,
          b6 - (b5 >> 2),
          (b2 >> 1) - b3,
          -b7 + (b4 >> 2))
        var k = 0
        while (k < 8) {
          if (rowMajor) dst(i * 8 + k) = o(k) else dst(k * 8 + i) = o(k)
          k += 1
        }
        i += 1
      }
    }
    pass(x, tmp, rowMajor = true)
    val out = new Array[Int](64)
    pass(tmp, out, rowMajor = false)
    out
  }

  /** Forward quant of one 8x8 coefficient (qbits is one higher than
    * 4x4; intra rounding f = 2^qbits/3). */
  def quant8(w: Int, qp: Int, idx: Int, weight: Int = 16): Int = {
    val qbits = 16 + qp / 6
    val f = (1 << qbits) / 3
    val m = mf8(qp % 6)(posClass8(idx))
    val m16 =
      if (weight == 16) m.toLong
      else (m.toLong * 16 + weight / 2) / weight
    val v = ((math.abs(w).toLong * m16 + f) >> qbits).toInt
    if (w < 0) -v else v
  }
}

/**
 * Intra prediction (§8.3) over reconstructed neighbor samples. Planes
 * are passed as flat byte arrays with a stride; availability flags
 * come from the macroblock layer (same picture AND same slice —
 * slices decode independently).
 */
private[graft] object Intra {

  @inline private def clip(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /**
   * Intra_4x4 prediction (§8.3.1.2, modes 0–8) of the 4x4 block at
   * plane offset (x0, y0). `availLeft`/`availUp`/`availUpLeft`/
   * `availUpRight` describe the NEIGHBOR SAMPLE rows/columns.
   * Writes 16 predicted samples into `out` (raster).
   */
  def predict4x4(plane: Array[Byte], stride: Int, x0: Int, y0: Int,
                 mode: Int, availLeft: Boolean, availUp: Boolean,
                 availUpLeft: Boolean, availUpRight: Boolean,
                 out: Array[Int]): Unit = {
    // p[x,-1] for x in 0..7 (above + above-right, §8.3.1.2
    // substitution: unavailable above-right copies p[3,-1]) and
    // p[-1,y], p[-1,-1]
    val up = new Array[Int](8)
    if (availUp) {
      var x = 0
      while (x < 4) {
        up(x) = plane((y0 - 1) * stride + x0 + x) & 0xFF; x += 1
      }
      if (availUpRight) {
        while (x < 8) {
          up(x) = plane((y0 - 1) * stride + x0 + x) & 0xFF; x += 1
        }
      } else {
        while (x < 8) { up(x) = up(3); x += 1 }
      }
    }
    val left = new Array[Int](4)
    if (availLeft) {
      var y = 0
      while (y < 4) {
        left(y) = plane((y0 + y) * stride + x0 - 1) & 0xFF; y += 1
      }
    }
    val ul = if (availUpLeft) plane((y0 - 1) * stride + x0 - 1) & 0xFF
             else 0

    def req(ok: Boolean): Unit = require(ok,
      s"intra4x4 mode $mode needs unavailable neighbors (corrupt)")

    mode match {
      case 0 => // Vertical
        req(availUp)
        var i = 0
        while (i < 16) { out(i) = up(i & 3); i += 1 }
      case 1 => // Horizontal
        req(availLeft)
        var i = 0
        while (i < 16) { out(i) = left(i >> 2); i += 1 }
      case 2 => // DC
        val v =
          if (availLeft && availUp)
            (up(0) + up(1) + up(2) + up(3) +
              left(0) + left(1) + left(2) + left(3) + 4) >> 3
          else if (availLeft)
            (left(0) + left(1) + left(2) + left(3) + 2) >> 2
          else if (availUp) (up(0) + up(1) + up(2) + up(3) + 2) >> 2
          else 128
        java.util.Arrays.fill(out, v)
      case 3 => // Diagonal Down Left
        req(availUp)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) =
              if (x == 3 && y == 3) (up(6) + 3 * up(7) + 2) >> 2
              else (up(x + y) + 2 * up(x + y + 1) + up(x + y + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 4 => // Diagonal Down Right
        req(availLeft && availUp && availUpLeft)
        // index -1 reaches p[-1,-1] in both arms (§8.3.1.2.5)
        def pU(i: Int): Int = if (i == -1) ul else up(i)
        def pL4(i: Int): Int = if (i == -1) ul else left(i)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) =
              if (x > y)
                (pU(x - y - 2) + 2 * pU(x - y - 1) + pU(x - y) + 2) >> 2
              else if (x < y)
                (pL4(y - x - 2) + 2 * pL4(y - x - 1) + pL4(y - x) + 2) >> 2
              else (up(0) + 2 * ul + left(0) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 5 => // Vertical Right
        req(availLeft && availUp && availUpLeft)
        // extend p with p[-1,-1] at index handling via helpers
        def pUp(x: Int): Int = if (x == -1) ul else up(x)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * x - y
            out(y * 4 + x) =
              if (z >= 0 && z % 2 == 0)
                (pUp(x - (y >> 1) - 1) + pUp(x - (y >> 1)) + 1) >> 1
              else if (z >= 0)
                (pUp(x - (y >> 1) - 2) + 2 * pUp(x - (y >> 1) - 1) +
                  pUp(x - (y >> 1)) + 2) >> 2
              else if (z == -1) (left(0) + 2 * ul + up(0) + 2) >> 2
              else
                (left(y - 1) + 2 * left(y - 2) +
                  (if (y - 3 == -1) ul else left(y - 3)) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 6 => // Horizontal Down
        req(availLeft && availUp && availUpLeft)
        def pL(y: Int): Int = if (y == -1) ul else left(y)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * y - x
            out(y * 4 + x) =
              if (z >= 0 && z % 2 == 0)
                (pL(y - (x >> 1) - 1) + pL(y - (x >> 1)) + 1) >> 1
              else if (z >= 0)
                (pL(y - (x >> 1) - 2) + 2 * pL(y - (x >> 1) - 1) +
                  pL(y - (x >> 1)) + 2) >> 2
              else if (z == -1) (up(0) + 2 * ul + left(0) + 2) >> 2
              else
                (up(x - 1) + 2 * up(x - 2) +
                  (if (x - 3 == -1) ul else up(x - 3)) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 7 => // Vertical Left
        req(availUp)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            out(y * 4 + x) =
              if (y % 2 == 0)
                (up(x + (y >> 1)) + up(x + (y >> 1) + 1) + 1) >> 1
              else
                (up(x + (y >> 1)) + 2 * up(x + (y >> 1) + 1) +
                  up(x + (y >> 1) + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 8 => // Horizontal Up
        req(availLeft)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = x + 2 * y
            out(y * 4 + x) =
              if (z == 0 || z == 2 || z == 4)
                (left(y + (x >> 1)) + left(y + (x >> 1) + 1) + 1) >> 1
              else if (z == 1 || z == 3)
                (left(y + (x >> 1)) + 2 * left(y + (x >> 1) + 1) +
                  left(y + (x >> 1) + 2) + 2) >> 2
              else if (z == 5) (left(2) + 3 * left(3) + 2) >> 2
              else left(3)
            x += 1
          }
          y += 1
        }
      case other =>
        throw new IllegalArgumentException(s"intra4x4 mode $other")
    }
  }

  /**
   * Intra_8x8 prediction (§8.3.2, High profile): reference samples
   * are loaded with the §8.3.1.2-style above-right substitution,
   * LOW-PASS FILTERED per §8.3.2.2.1 ((a + 2b + c + 2) >> 2 with
   * 3-tap ends), then one of the 9 modes — the same mode set as 4x4
   * with size-8 geometry — fills `out` (64 samples, raster).
   */
  def predict8x8(plane: Array[Byte], stride: Int, x0: Int, y0: Int,
                 mode: Int, availLeft: Boolean, availUp: Boolean,
                 availUpLeft: Boolean, availUpRight: Boolean,
                 out: Array[Int]): Unit = {
    // ---- unfiltered references with substitution ----
    val tr = new Array[Int](16) // p[x,-1], x = 0..15
    if (availUp) {
      var x = 0
      while (x < 8) {
        tr(x) = plane((y0 - 1) * stride + x0 + x) & 0xFF; x += 1
      }
      if (availUpRight) {
        while (x < 16) {
          tr(x) = plane((y0 - 1) * stride + x0 + x) & 0xFF; x += 1
        }
      } else {
        while (x < 16) { tr(x) = tr(7); x += 1 }
      }
    }
    val lf = new Array[Int](8) // p[-1,y]
    if (availLeft) {
      var y = 0
      while (y < 8) {
        lf(y) = plane((y0 + y) * stride + x0 - 1) & 0xFF; y += 1
      }
    }
    val c0 = if (availUpLeft) plane((y0 - 1) * stride + x0 - 1) & 0xFF
             else 0

    // ---- §8.3.2.2.1 reference filtering ----
    val t = new Array[Int](16)
    if (availUp) {
      t(0) =
        if (availUpLeft) (c0 + 2 * tr(0) + tr(1) + 2) >> 2
        else (3 * tr(0) + tr(1) + 2) >> 2
      var x = 1
      while (x < 15) {
        t(x) = (tr(x - 1) + 2 * tr(x) + tr(x + 1) + 2) >> 2; x += 1
      }
      t(15) = (tr(14) + 3 * tr(15) + 2) >> 2
    }
    val l = new Array[Int](8)
    if (availLeft) {
      l(0) =
        if (availUpLeft) (c0 + 2 * lf(0) + lf(1) + 2) >> 2
        else (3 * lf(0) + lf(1) + 2) >> 2
      var y = 1
      while (y < 7) {
        l(y) = (lf(y - 1) + 2 * lf(y) + lf(y + 1) + 2) >> 2; y += 1
      }
      l(7) = (lf(6) + 3 * lf(7) + 2) >> 2
    }
    val c =
      if (!availUpLeft) 0
      else if (availUp && availLeft) (tr(0) + 2 * c0 + lf(0) + 2) >> 2
      else if (availUp) (3 * c0 + tr(0) + 2) >> 2
      else if (availLeft) (3 * c0 + lf(0) + 2) >> 2
      else c0

    def req(ok: Boolean): Unit = require(ok,
      s"intra8x8 mode $mode needs unavailable neighbors (corrupt)")
    // index -1 reaches the filtered corner in both arms
    def pT(i: Int): Int = if (i == -1) c else t(i)
    def pL(i: Int): Int = if (i == -1) c else l(i)

    mode match {
      case 0 => // Vertical
        req(availUp)
        var i = 0
        while (i < 64) { out(i) = t(i & 7); i += 1 }
      case 1 => // Horizontal
        req(availLeft)
        var i = 0
        while (i < 64) { out(i) = l(i >> 3); i += 1 }
      case 2 => // DC
        var st = 0; var sl = 0
        var k = 0
        while (k < 8) { st += t(k); sl += l(k); k += 1 }
        val v =
          if (availLeft && availUp) (st + sl + 8) >> 4
          else if (availLeft) (sl + 4) >> 3
          else if (availUp) (st + 4) >> 3
          else 128
        java.util.Arrays.fill(out, v)
      case 3 => // Diagonal Down Left
        req(availUp)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            out(y * 8 + x) =
              if (x == 7 && y == 7) (t(14) + 3 * t(15) + 2) >> 2
              else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 4 => // Diagonal Down Right
        req(availLeft && availUp && availUpLeft)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            out(y * 8 + x) =
              if (x > y)
                (pT(x - y - 2) + 2 * pT(x - y - 1) + pT(x - y) + 2) >> 2
              else if (x < y)
                (pL(y - x - 2) + 2 * pL(y - x - 1) + pL(y - x) + 2) >> 2
              else (t(0) + 2 * c + l(0) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 5 => // Vertical Right
        req(availLeft && availUp && availUpLeft)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val z = 2 * x - y
            out(y * 8 + x) =
              if (z >= 0 && z % 2 == 0)
                (pT(x - (y >> 1) - 1) + pT(x - (y >> 1)) + 1) >> 1
              else if (z >= 0)
                (pT(x - (y >> 1) - 2) + 2 * pT(x - (y >> 1) - 1) +
                  pT(x - (y >> 1)) + 2) >> 2
              else if (z == -1) (l(0) + 2 * c + t(0) + 2) >> 2
              else
                (pL(y - 2 * x - 1) + 2 * pL(y - 2 * x - 2) +
                  pL(y - 2 * x - 3) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 6 => // Horizontal Down
        req(availLeft && availUp && availUpLeft)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val z = 2 * y - x
            out(y * 8 + x) =
              if (z >= 0 && z % 2 == 0)
                (pL(y - (x >> 1) - 1) + pL(y - (x >> 1)) + 1) >> 1
              else if (z >= 0)
                (pL(y - (x >> 1) - 2) + 2 * pL(y - (x >> 1) - 1) +
                  pL(y - (x >> 1)) + 2) >> 2
              else if (z == -1) (t(0) + 2 * c + l(0) + 2) >> 2
              else
                (pT(x - 2 * y - 1) + 2 * pT(x - 2 * y - 2) +
                  pT(x - 2 * y - 3) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 7 => // Vertical Left
        req(availUp)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            out(y * 8 + x) =
              if (y % 2 == 0)
                (t(x + (y >> 1)) + t(x + (y >> 1) + 1) + 1) >> 1
              else
                (t(x + (y >> 1)) + 2 * t(x + (y >> 1) + 1) +
                  t(x + (y >> 1) + 2) + 2) >> 2
            x += 1
          }
          y += 1
        }
      case 8 => // Horizontal Up
        req(availLeft)
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val z = x + 2 * y
            out(y * 8 + x) =
              if (z < 13 && z % 2 == 0)
                (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
              else if (z < 13)
                (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) +
                  l(y + (x >> 1) + 2) + 2) >> 2
              else if (z == 13) (l(6) + 3 * l(7) + 2) >> 2
              else l(7)
            x += 1
          }
          y += 1
        }
      case other =>
        throw new IllegalArgumentException(s"intra8x8 mode $other")
    }
  }

  /** Intra_16x16 (§8.3.3, modes 0 V / 1 H / 2 DC / 3 Plane) at MB
    * origin (x0, y0); writes 256 samples (raster). */
  def predict16x16(plane: Array[Byte], stride: Int, x0: Int, y0: Int,
                   mode: Int, availLeft: Boolean, availUp: Boolean,
                   out: Array[Int]): Unit = {
    def up(x: Int): Int = plane((y0 - 1) * stride + x0 + x) & 0xFF
    def left(y: Int): Int = plane((y0 + y) * stride + x0 - 1) & 0xFF
    def ul: Int = plane((y0 - 1) * stride + x0 - 1) & 0xFF
    mode match {
      case 0 =>
        require(availUp, "I16x16 vertical needs above (corrupt)")
        var i = 0
        while (i < 256) { out(i) = up(i & 15); i += 1 }
      case 1 =>
        require(availLeft, "I16x16 horizontal needs left (corrupt)")
        var i = 0
        while (i < 256) { out(i) = left(i >> 4); i += 1 }
      case 2 =>
        var s = 0
        val v =
          if (availLeft && availUp) {
            var i = 0
            while (i < 16) { s += up(i) + left(i); i += 1 }
            (s + 16) >> 5
          } else if (availLeft) {
            var i = 0
            while (i < 16) { s += left(i); i += 1 }
            (s + 8) >> 4
          } else if (availUp) {
            var i = 0
            while (i < 16) { s += up(i); i += 1 }
            (s + 8) >> 4
          } else 128
        java.util.Arrays.fill(out, v)
      case 3 =>
        require(availLeft && availUp,
          "I16x16 plane needs left+above (corrupt)")
        var hS = 0; var vS = 0
        var i = 0
        while (i < 8) {
          hS += (i + 1) * (up(8 + i) - (if (6 - i == -1) ul else up(6 - i)))
          vS += (i + 1) *
            (left(8 + i) - (if (6 - i == -1) ul else left(6 - i)))
          i += 1
        }
        val a = 16 * (left(15) + up(15))
        val b = (5 * hS + 32) >> 6
        val c = (5 * vS + 32) >> 6
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            out(y * 16 + x) =
              clip((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case other =>
        throw new IllegalArgumentException(s"intra16x16 mode $other")
    }
  }

  /** Chroma 8x8 (§8.3.4, modes 0 DC / 1 H / 2 V / 3 Plane) at chroma
    * plane origin (x0, y0); writes 64 samples (raster). */
  def predictChroma(plane: Array[Byte], stride: Int, x0: Int, y0: Int,
                    mode: Int, availLeft: Boolean, availUp: Boolean,
                    out: Array[Int]): Unit = {
    def up(x: Int): Int = plane((y0 - 1) * stride + x0 + x) & 0xFF
    def left(y: Int): Int = plane((y0 + y) * stride + x0 - 1) & 0xFF
    def ul: Int = plane((y0 - 1) * stride + x0 - 1) & 0xFF
    mode match {
      case 0 => // DC, per 4x4 sub-block (§8.3.4.1)
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            def sumUp = up(bx * 4) + up(bx * 4 + 1) + up(bx * 4 + 2) +
              up(bx * 4 + 3)
            def sumLeft = left(by * 4) + left(by * 4 + 1) +
              left(by * 4 + 2) + left(by * 4 + 3)
            val v =
              if (bx == by) { // corner blocks: both if available
                if (availLeft && availUp) (sumUp + sumLeft + 4) >> 3
                else if (availLeft) (sumLeft + 2) >> 2
                else if (availUp) (sumUp + 2) >> 2
                else 128
              } else if (bx == 1) { // top-right: prefer above
                if (availUp) (sumUp + 2) >> 2
                else if (availLeft) (sumLeft + 2) >> 2
                else 128
              } else { // bottom-left: prefer left
                if (availLeft) (sumLeft + 2) >> 2
                else if (availUp) (sumUp + 2) >> 2
                else 128
              }
            var y = 0
            while (y < 4) {
              var x = 0
              while (x < 4) {
                out((by * 4 + y) * 8 + bx * 4 + x) = v; x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
      case 1 =>
        require(availLeft, "chroma horizontal needs left (corrupt)")
        var i = 0
        while (i < 64) { out(i) = left(i >> 3); i += 1 }
      case 2 =>
        require(availUp, "chroma vertical needs above (corrupt)")
        var i = 0
        while (i < 64) { out(i) = up(i & 7); i += 1 }
      case 3 =>
        require(availLeft && availUp,
          "chroma plane needs left+above (corrupt)")
        var hS = 0; var vS = 0
        var i = 0
        while (i < 4) {
          hS += (i + 1) * (up(4 + i) - (if (2 - i == -1) ul else up(2 - i)))
          vS += (i + 1) *
            (left(4 + i) - (if (2 - i == -1) ul else left(2 - i)))
          i += 1
        }
        val a = 16 * (left(7) + up(7))
        val b = (17 * hS + 16) >> 5
        val c = (17 * vS + 16) >> 5
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            out(y * 8 + x) =
              clip((a + b * (x - 3) + c * (y - 3) + 16) >> 5)
            x += 1
          }
          y += 1
        }
      case other =>
        throw new IllegalArgumentException(s"chroma mode $other")
    }
  }
}
