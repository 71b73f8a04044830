package graft

import graft.multimodal.{Cavlc, H264, Transform}

/**
 * CAVLC I-slice decode (H264Cavlc/H264Mb): VLC table structure,
 * residual-block codec round-trips, whole-stream encode→decode
 * bit-exactness against the encoder's integer reconstruction, and
 * hand-derived golden vectors (decode-only — built syntax element by
 * syntax element in the test, independent of the encoder, so a table
 * or arithmetic error that cancels in round-trips is still caught).
 */
class CavlcSpec extends SparkSpec {

  // ---- table structure ----------------------------------------------------

  private def assertPrefixFree(name: String,
                               codes: Seq[(Int, Int)]): Unit = {
    for (a <- codes; b <- codes if a != b) {
      val ((la, va), (lb, vb)) = (a, b)
      if (la <= lb)
        assert((vb >> (lb - la)) != va,
          s"$name: ($la,$va) is a prefix of ($lb,$vb)")
    }
    codes.foreach { case (l, v) =>
      assert(l > 0 && v >= 0 && v < (1 << l), s"$name: bad code ($l,$v)")
    }
  }

  test("every VLC table is prefix-free with in-range codes") {
    Seq("coeffToken0" -> Cavlc.coeffToken0,
        "coeffToken1" -> Cavlc.coeffToken1,
        "coeffToken2" -> Cavlc.coeffToken2,
        "coeffTokenChromaDc" -> Cavlc.coeffTokenChromaDc).foreach {
      case (n, t) =>
        assertPrefixFree(n, t.flatten.filter(_._1 > 0).toSeq)
    }
    Cavlc.totalZeros4x4.zipWithIndex.foreach { case (row, i) =>
      assert(row.length == math.min(16, 17 - (i + 1)),
        s"totalZeros4x4 tc=${i + 1} row length ${row.length}")
      assertPrefixFree(s"totalZeros4x4 tc=${i + 1}", row.toSeq)
    }
    Cavlc.totalZerosChromaDc.zipWithIndex.foreach { case (row, i) =>
      assert(row.length == 4 - i) // tz ranges 0 .. 4 - TC
      assertPrefixFree(s"totalZerosChromaDc tc=${i + 1}", row.toSeq)
    }
    Cavlc.runBefore.zipWithIndex.foreach { case (row, i) =>
      assertPrefixFree(s"runBefore zl=${i + 1}", row.toSeq)
    }
    // coeff_token validity pattern: exactly the T1 <= min(TC,3) cells
    Seq(Cavlc.coeffToken0, Cavlc.coeffToken1, Cavlc.coeffToken2)
      .foreach { t =>
        for (t1 <- 0 until 4; tc <- 0 to 16)
          assert((t(t1)(tc)._1 > 0) == (t1 <= math.min(tc, 3)),
            s"validity at T1=$t1 TC=$tc")
      }
  }

  // ---- residual block round-trips -----------------------------------------

  private def roundTrip(coeffs: Array[Int], nC: Int): Unit = {
    val w = new H264.BitWriter()
    val tcW = Cavlc.writeResidualBlock(w, coeffs, nC)
    w.trailingBits()
    val r = new H264.BitReader(w.toBytes)
    val (out, tcR) = Cavlc.readResidualBlock(r, nC, coeffs.length)
    assert(out.toSeq == coeffs.toSeq,
      s"nC=$nC in=${coeffs.mkString(",")} out=${out.mkString(",")}")
    assert(tcW == tcR && tcR == coeffs.count(_ != 0))
  }

  test("residual codec round-trips: sparsity x nC x trailing-one shapes") {
    val rnd = new scala.util.Random(42)
    val nCs = Seq(-1, 0, 1, 2, 3, 4, 7, 8, 20)
    for (nC <- nCs; maxC <- Seq(4, 15, 16); trial <- 0 until 60) {
      if (!(nC == -1 && maxC != 4)) {
        val n = rnd.nextInt(maxC + 1)
        val coeffs = new Array[Int](maxC)
        // place n nonzeros at random scan positions; small magnitudes
        // often (trailing-one shapes), occasionally large
        rnd.shuffle((0 until maxC).toList).take(n).foreach { p =>
          coeffs(p) = (rnd.nextInt(3) match {
            case 0 => 1
            case 1 => rnd.nextInt(9) + 1
            case _ => rnd.nextInt(3000) + 1
          }) * (if (rnd.nextBoolean()) 1 else -1)
        }
        roundTrip(coeffs, nC)
      }
    }
  }

  test("residual codec round-trips: escape levels up to very large magnitudes") {
    for (mag <- Seq(8, 15, 16, 100, 2048, 2064, 4096, 50000, 500000);
         sign <- Seq(1, -1)) {
      // lone big level (suffixLength 0 escape path)
      val a = new Array[Int](16); a(0) = mag * sign
      roundTrip(a, 0)
      // big level after trailing ones (adaptive suffix path)
      val b = new Array[Int](16)
      b(5) = mag * sign; b(6) = -1; b(7) = 1
      roundTrip(b, 0)
      // dense block with escalating magnitudes (suffix escalation)
      val c = (0 until 16).map(i => (i + 1) * mag / 8 + 1).toArray
      roundTrip(c, 4)
    }
  }

  test("residual codec: all-zero, full, and single-coefficient blocks at every nC class") {
    for (nC <- Seq(-1, 0, 2, 4, 8)) {
      val maxC = if (nC == -1) 4 else 16
      roundTrip(new Array[Int](maxC), nC)
      roundTrip(Array.fill(maxC)(1), nC)
      roundTrip(Array.fill(maxC)(-7), nC)
      for (p <- 0 until maxC) {
        val a = new Array[Int](maxC); a(p) = 3
        roundTrip(a, nC)
      }
    }
  }

  // ---- whole-stream: decode == encoder reconstruction ---------------------

  private def gradient(w: Int, h: Int, seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = (x * 255 / math.max(1, w - 1) + rnd.nextInt(24)) & 0xFF
      val g = (y * 255 / math.max(1, h - 1) + rnd.nextInt(24)) & 0xFF
      val b = ((x + y) * 2 + rnd.nextInt(24)) & 0xFF
      (r << 16) | (g << 8) | b
    }
  }

  test("CAVLC encode→decode is bit-exact vs the encoder reconstruction " +
      "(sizes x QPs, I_4x4 + I_16x16 mix)") {
    for ((w, h) <- Seq((16, 16), (48, 32), (56, 40), (64, 64));
         qp <- Seq(10, 26, 38)) {
      val frames = Seq(gradient(w, h, qp), gradient(w, h, qp + 100))
      val (bytes, recon) = H264.encodeCavlc(w, h, frames, qp)
      val decoded = H264.decodeFrames(bytes)
      assert(decoded.size == 2, s"${w}x$h qp=$qp: ${decoded.size} frames")
      decoded.zip(recon).zipWithIndex.foreach {
        case (((dw, dh, dp), (rw, rh, rp)), f) =>
          assert(dw == rw && dh == rh, s"dims $dw x $dh vs $rw x $rh")
          assert(dp.toSeq == rp.toSeq,
            s"${w}x$h qp=$qp frame $f: decoded pixels differ from recon")
      }
    }
  }

  test("multi-slice pictures: prediction and nC contexts sever at " +
      "slice boundaries, decode stays bit-exact, MP4 groups slices " +
      "into one sample per picture") {
    val w = 48; val h = 64 // 3x4 MBs
    val frames = Seq(gradient(w, h, 11), gradient(w, h, 12))
    // 2 MB rows per slice → 2 slices per picture
    val (multi, reconM) = H264.encodeCavlc(w, h, frames, qp = 24,
      mbRowsPerSlice = 2)
    val sliceNals = H264.nalUnits(multi)
      .filter(n => (n(0) & 0x1F) == 5)
    assert(sliceNals.size == 4, s"expected 2 slices x 2 frames, " +
      s"got ${sliceNals.size}")
    val decoded = H264.decodeFrames(multi)
    assert(decoded.size == 2)
    decoded.zip(reconM).foreach { case ((dw, dh, dp), (_, _, rp)) =>
      assert(dw == w && dh == h)
      assert(dp.toSeq == rp.toSeq,
        "multi-slice decode must equal the encoder reconstruction")
    }
    // the slice boundary is load-bearing: the same frames encoded as
    // ONE slice reconstruct differently (row-2 MBs may predict from
    // row-1 there, and mode availability shifts)
    val (_, reconS) = H264.encodeCavlc(w, h, frames, qp = 24)
    assert(reconS.head._3.toSeq != reconM.head._3.toSeq,
      "single- and multi-slice recon coincide — the boundary did " +
        "not sever prediction, so the slice logic went untested")
    // container path: both slices of a picture group into ONE sample
    val mp4 = graft.multimodal.Mp4.fromAnnexB(multi, w, h)
    val pngs = graft.multimodal.FrameDecoder.Auto.frames(mp4)
    assert(pngs.size == 2, s"expected 2 samples, got ${pngs.size}")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pngs.head))
    val got = Array.tabulate(w * h)(i =>
      img.getRGB(i % w, i / w) & 0xFFFFFF)
    assert(got.toSeq == reconM.head._3.toSeq)
  }

  test("CAVLC encode is actually lossy-but-close (sanity that the " +
      "transform path carries real residuals, not a copy)") {
    val w = 48; val h = 48
    val src = gradient(w, h, 7)
    val (bytes, recon) = H264.encodeCavlc(w, h, Seq(src), qp = 26)
    val (_, _, px) = H264.decodeFrames(bytes).head
    def lumaOf(rgb: Int): Int = H264.rgbToYuv(rgb)._1
    val mad = src.indices.map(i =>
      math.abs(lumaOf(src(i)) - lumaOf(px(i)))).sum.toDouble / src.length
    assert(mad > 0.0, "QP 26 must not be lossless on noisy content")
    assert(mad < 12.0, s"decode drifted too far from source: MAD $mad")
    assert(recon.head._3.toSeq == px.toSeq)
  }

  test("CAVLC stream decodes through the FrameDecoder.Auto sniff " +
      "(Annex-B dispatch carries compressed MBs now)") {
    val (bytes, recon) =
      H264.encodeCavlc(32, 32, Seq(gradient(32, 32, 3)), 24)
    val pngs = graft.multimodal.FrameDecoder.Auto.frames(bytes)
    assert(pngs.size == 1)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(pngs.head))
    assert(img.getWidth == 32 && img.getHeight == 32)
    val (_, _, rp) = recon.head
    val got = Array.tabulate(32 * 32)(i =>
      img.getRGB(i % 32, i / 32) & 0xFFFFFF)
    assert(got.toSeq == rp.toSeq, "PNG path must carry recon pixels")
  }

  // ---- golden vectors (decode-only, hand-assembled) ------------------------

  /** Baseline 1-MB 16x16 SPS + PPS (hand-written bits, NOT the
    * encoder's writers) wrapped as Annex-B NALs. */
  private def goldenHeaders(): Array[Byte] = {
    val sps = new H264.BitWriter()
    sps.u(66, 8)  // profile baseline
    sps.u(0, 8)   // constraints
    sps.u(40, 8)  // level 4.0
    sps.ue(0)     // sps id
    sps.ue(0)     // log2_max_frame_num_minus4
    sps.ue(2)     // poc type 2
    sps.ue(0)     // max_num_ref_frames
    sps.u(0, 1)   // gaps allowed
    sps.ue(0)     // pic_width_in_mbs_minus1 → 1 MB
    sps.ue(0)     // pic_height_in_map_units_minus1 → 1 MB
    sps.u(1, 1)   // frame_mbs_only
    sps.u(1, 1)   // direct_8x8
    sps.u(0, 1)   // no crop
    sps.u(0, 1)   // no vui
    sps.trailingBits()
    val pps = new H264.BitWriter()
    pps.ue(0); pps.ue(0) // pps id, sps id
    pps.u(0, 1)  // CAVLC
    pps.u(0, 1)  // no bottom-field order
    pps.ue(0)    // one slice group
    pps.ue(0); pps.ue(0)
    pps.u(0, 1); pps.u(0, 2)
    pps.se(0)    // pic_init_qp 26
    pps.se(0); pps.se(0)
    pps.u(0, 1); pps.u(0, 1); pps.u(0, 1)
    pps.trailingBits()
    (Array[Byte](0, 0, 0, 1, 0x67) ++ H264.rbspToEbsp(sps.toBytes)) ++
      (Array[Byte](0, 0, 0, 1, 0x68) ++ H264.rbspToEbsp(pps.toBytes))
  }

  private def goldenSlice(body: H264.BitWriter => Unit): Array[Byte] = {
    val w = new H264.BitWriter()
    w.ue(0)      // first_mb_in_slice
    w.ue(7)      // slice_type I
    w.ue(0)      // pps id
    w.u(0, 4)    // frame_num
    w.ue(0)      // idr_pic_id
    w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking
    w.se(0)      // slice_qp_delta → QP 26
    body(w)
    w.trailingBits()
    Array[Byte](0, 0, 0, 1, 0x65) ++ H264.rbspToEbsp(w.toBytes)
  }

  test("golden 1: I_16x16 DC, no residual → uniform 128 grey") {
    val stream = goldenHeaders() ++ goldenSlice { w =>
      w.ue(3)    // mb_type: I_16x16, pred DC(2), cbp 0/0
      w.ue(0)    // intra_chroma_pred_mode DC
      w.se(0)    // mb_qp_delta
      w.u(1, 1)  // luma DC coeff_token (nC=0, TC=0): '1'
      // chroma: cbpChroma 0 → nothing
    }
    val frames = H264.decodeFrames(stream)
    assert(frames.size == 1)
    val (w, h, px) = frames.head
    assert(w == 16 && h == 16)
    assert(px.forall(_ == 0x808080),
      s"expected uniform grey, got ${px.distinct.take(4).map(_.toHexString)}")
  }

  test("golden 2: one luma DC level through Hadamard+dequant at QP 26 " +
      "→ uniform 129 (hand-computed)") {
    // DC level +1 at scan 0: coeff_token(nC=0, TC=1, T1=1) = '01',
    // sign '0', total_zeros(TC=1, tz=0) = '1'. Inverse Hadamard of a
    // single corner 1 → all-ones; dequantLumaDc(1, 26) = (208+2)>>2
    // = 52; inverse core transform of d0=52 → (52+32)>>6 = +1 per
    // sample → Y = 129 everywhere; chroma untouched at 128.
    // RGB(129,129,129) = 0x818181.
    val stream = goldenHeaders() ++ goldenSlice { w =>
      w.ue(3)      // I_16x16 DC, cbp 0/0
      w.ue(0)      // chroma DC
      w.se(0)      // qp delta
      w.u(1, 2)    // coeff_token '01'
      w.u(0, 1)    // trailing-one sign +
      w.u(1, 1)    // total_zeros '1' (tz = 0)
    }
    val (w, h, px) = H264.decodeFrames(stream).head
    assert(w == 16 && h == 16)
    assert(px.forall(_ == 0x818181),
      s"expected 0x818181, got ${px.distinct.take(4).map(_.toHexString)}")
  }

  test("golden 3: I_4x4 all-DC with cbp 0 → uniform grey (mode " +
      "signaling + intra-CBP mapping)") {
    val stream = goldenHeaders() ++ goldenSlice { w =>
      w.ue(0) // mb_type: I_NxN
      var i = 0
      while (i < 16) { w.u(1, 1); i += 1 } // prev_mode_flag=1 ×16 → DC
      w.ue(0) // chroma DC
      w.ue(3) // cbp codeNum 3 → intra cbp 0 (Table 9-4)
      // cbp 0 → no mb_qp_delta, no residual
    }
    val (w, h, px) = H264.decodeFrames(stream).head
    assert(w == 16 && h == 16)
    assert(px.forall(_ == 0x808080))
  }

  test("golden 4: one chroma DC level at QP 26 → Cb 130 everywhere " +
      "(hand-computed through the 2x2 Hadamard)") {
    // mb_type 7: I_16x16 pred DC, cbpChroma 1, cbpLuma 0. Luma DC
    // empty ('1'). Cb DC: TC=1 T1=1 trailing one +1: coeff_token
    // (nC=-1) '1', sign '0', chroma total_zeros(TC=1, tz=0) = '1'.
    // Cr DC: empty → coeff_token (nC=-1, TC=0) '01'.
    // dequant: f=[1,1,1,1] ×(16·13)<<4>>5 = 104 → residual
    // (104+32)>>6 = 2 → Cb = 130, Cr = 128, Y = 128.
    // RGB: r = 128; g = round(128 − 0.344136·2) = 127;
    // b = round(128 + 1.772·2) = 132 → 0x807F84.
    val stream = goldenHeaders() ++ goldenSlice { w =>
      w.ue(7)      // I_16x16 DC, cbpChroma 1, cbpLuma 0
      w.ue(0)      // chroma pred DC
      w.se(0)      // qp delta
      w.u(1, 1)    // luma DC: coeff_token '1' (empty)
      w.u(1, 1)    // Cb DC coeff_token '1' (TC=1, T1=1)
      w.u(0, 1)    // sign +
      w.u(1, 1)    // chroma total_zeros '1' (tz=0)
      w.u(1, 2)    // Cr DC coeff_token '01' (TC=0)
    }
    val (w, h, px) = H264.decodeFrames(stream).head
    assert(w == 16 && h == 16)
    assert(px.forall(_ == 0x807F84),
      s"got ${px.distinct.take(4).map(_.toHexString)}")
  }

  test("golden 6: I_4x4 directional chain — DC + horizontal modes " +
      "propagate an in-MB reconstructed residual (hand-computed)") {
    // Round-trips share the prediction code between encoder and
    // decoder, so a wrong-but-symmetric formula would cancel; this
    // vector pins the I_4x4 path end to end BY HAND. One MB, mb_type
    // I_NxN. Block z0: mode DC (no neighbors → 128) with ONE +1 DC
    // level at QP 26 → dequant 1·13<<4 = 208 → residual (208+32)>>6
    // = +3 on every sample → block 0 = 131 uniform. Block z1 signals
    // mode 1 (horizontal, rem coding: flag 0 + rem 1 since pred = 2)
    // and every later block takes its PREDICTED mode (flag 1), which
    // derives as DC where only uniform-131 ups are available and
    // horizontal elsewhere — all 16 blocks reconstruct to 131 iff
    // mode derivation (§8.3.1.1), in-MB availability, the nC context
    // chain (1 → 1 → 0 for blocks z1/z2/z3), the intra-CBP me(v)
    // mapping (cbp 1 → codeNum 29), and the standalone 4x4
    // dequant/transform are all right. Chroma: DC, cbp 0 → 128.
    // Expected: RGB(131,131,131) = 0x838383 everywhere.
    val stream = goldenHeaders() ++ goldenSlice { w =>
      w.ue(0)      // mb_type I_NxN
      w.u(1, 1)    // z0: prev_flag 1 → predicted mode 2 (DC)
      w.u(0, 1); w.u(1, 3) // z1: flag 0, rem 1 → mode 1 (horizontal)
      var z = 2
      while (z < 16) { w.u(1, 1); z += 1 } // all others: predicted
      w.ue(0)      // intra_chroma_pred_mode DC
      w.ue(29)     // cbp codeNum 29 → intra cbp 1 (luma group 0 only)
      w.se(0)      // mb_qp_delta
      // group-0 residuals, z-order: z0 carries TC=1 T1=1 (+1 at
      // scan 0), z1..z3 are empty with nC contexts 1, 1, 0
      w.u(1, 2)    // z0 coeff_token '01' (nC=0, TC=1, T1=1)
      w.u(0, 1)    // trailing-one sign +
      w.u(1, 1)    // total_zeros(TC=1) '1' → tz 0
      w.u(1, 1)    // z1 coeff_token '1' (nC=1, TC=0)
      w.u(1, 1)    // z2 coeff_token '1' (nC=1, TC=0)
      w.u(1, 1)    // z3 coeff_token '1' (nC=0, TC=0)
    }
    val (w, h, px) = H264.decodeFrames(stream).head
    assert(w == 16 && h == 16)
    assert(px.forall(_ == 0x838383),
      s"got ${px.distinct.take(6).map(_.toHexString)}")
  }

  test("golden 5: mb_qp_delta changes the dequant scale (QP wrap rule)") {
    // same as golden 2 but mb_qp_delta = +6 → QP 32: dequantLumaDc(1)
    // = (16·13·1) << (32/6 − 6)… 32/6 = 5 < 6 → (208 + 1) >> 1 = 104;
    // residual (104+32)>>6 = 2 → Y = 130 → 0x828282.
    val stream = goldenHeaders() ++ goldenSlice { w =>
      w.ue(3)
      w.ue(0)
      w.se(6)      // mb_qp_delta +6 → QP 32
      w.u(1, 2)    // coeff_token '01'
      w.u(0, 1)    // sign +
      w.u(1, 1)    // total_zeros 0
    }
    val (_, _, px) = H264.decodeFrames(stream).head
    assert(px.forall(_ == 0x828282),
      s"got ${px.distinct.take(4).map(_.toHexString)}")
  }

  test("fuzz: bit-flipped and truncated CAVLC streams terminate — " +
      "frames or an exception, never a hang (the degrade contract)") {
    val (valid, _) = H264.encodeCavlc(48, 48,
      Seq(gradient(48, 48, 31)), qp = 24)
    val rnd = new scala.util.Random(1234)
    var threw = 0
    // every loop in the decoder is bounded by moreRbspData / require
    // guards, so decoding either yields frames or throws quickly; the
    // assertion is that it RETURNS (a hang would trip the suite
    // timeout) and that any frames have sane dimensions
    def decodeBounded(bytes: Array[Byte]): Unit =
      try {
        H264.decodeFrames(bytes).foreach { case (w, h, px) =>
          assert(w > 0 && w <= 4096 && h > 0 && h <= 4096)
          assert(px.length == w * h)
        }
      } catch {
        case _: Exception => threw += 1 // the Try-skip class upstream
      }
    (0 until 150).foreach { _ =>
      val mutated = valid.clone()
      rnd.nextInt(3) match {
        case 0 => // flip 1-3 bits anywhere (headers included)
          (0 until 1 + rnd.nextInt(3)).foreach { _ =>
            val p = rnd.nextInt(mutated.length)
            mutated(p) = (mutated(p) ^ (1 << rnd.nextInt(8))).toByte
          }
          decodeBounded(mutated)
        case 1 => // truncate mid-stream
          val cut = 5 + rnd.nextInt(mutated.length - 5)
          decodeBounded(java.util.Arrays.copyOf(mutated, cut))
        case 2 => // splice random garbage into the slice payload
          val p = mutated.length / 2 + rnd.nextInt(mutated.length / 3)
          (p until math.min(p + 16, mutated.length)).foreach { i =>
            mutated(i) = rnd.nextInt(256).toByte
          }
          decodeBounded(mutated)
      }
    }
    assert(threw > 0, "mutations never threw — the fuzz is too tame")
  }

  test("Transform: dequant identity (flat lists) and inverse/forward sanity") {
    // the §8.5.12.1 formula with flat lists reduces exactly to
    // c·normAdjust << (qp/6) — spot-check the class-0/1/2 positions
    assert(Transform.dequant(1, 0, 0) == 10)
    assert(Transform.dequant(1, 0, 5) == 16)  // (1,1) class 1
    assert(Transform.dequant(1, 0, 1) == 13)  // other
    assert(Transform.dequant(1, 26, 0) == 13 << 4)
    assert(Transform.dequant(-3, 12, 5) == -3 * 16 * 4)
    // inverse of all-zero is zero; DC-only gives flat residual
    assert(Transform.inverse4x4(new Array[Int](16)).forall(_ == 0))
    val flat = Transform.inverse4x4(Array(64, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0))
    assert(flat.forall(_ == 1), flat.mkString(","))
    // hadamard is its own inverse up to ×16
    val v = Array.tabulate(16)(i => i * 3 - 20)
    val hh = Transform.hadamard4x4(Transform.hadamard4x4(v))
    assert(hh.toSeq == v.map(_ * 16).toSeq)
  }
}
