package graft

import graft.multimodal.{H264, ScalingMatrices, Transform}

/**
 * High-profile transform_8x8 + quantization scaling matrices
 * (ITU-T H.264 §7.3.2.1.1.1, §8.3.2, §8.5.13, Table 7-2/7-3/7-4):
 * hand-derived transform golden vectors, scaling-list parse +
 * fallback goldens, full encode→decode round trips across the
 * feature matrix, and the honest CABAC×8x8 named-error boundary.
 */
class H264Transform8x8Spec extends SparkSpec {

  private def gradient(w: Int, h: Int, seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(w * h)(i =>
      ((i * 31 + seed) & 0xFF) << 16 | (rnd.nextInt(256) << 8) |
        ((i / w) & 0xFF))
  }

  // ---- transform level ----------------------------------------------

  test("inverse8x8 golden vectors: DC impulse and first AC basis " +
      "(hand-derived butterfly)") {
    // DC only: every row-pass output equals d0, likewise columns;
    // final rounding (c + 32) >> 6 → coefficient 64 gives residual 1
    val dc = new Array[Int](64); dc(0) = 64
    assert(Transform.inverse8x8(dc).toSeq == Seq.fill(64)(1))
    // d[1] = 32, one row: odd-ladder a1=0, a3=32, a5=-32, a7=48 →
    // b1=12, b7=48, b3=32+(-32>>2)=24, b5=8+32=40; outputs
    // [b0+b7, b2+b5, b4+b3, b6+b1, b6-b1, b4-b3, b2-b5, b0-b7] =
    // [48, 40, 24, 12, -12, -24, -40, -48] — the integer-DCT first
    // AC basis shape, symmetric and decreasing
    val ac = new Array[Int](64); ac(1) = 32
    val res = Transform.inverse8x8(ac)
    val row0 = Seq(48, 40, 24, 12, -12, -24, -40, -48)
    (0 until 8).foreach { x =>
      // column pass: only row 0 is nonzero → each column is the DC
      // case of the column butterfly: all 8 outputs = row0(x), then
      // (v + 32) >> 6
      (0 until 8).foreach { y =>
        assert(res(y * 8 + x) == (row0(x) + 32) >> 6, s"($x,$y)")
      }
    }
  }

  test("zigzag8x8 is Table 8-8 (the classic zig-zag) and a permutation") {
    assert(Transform.zigzag8x8.take(10).toSeq ==
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(Transform.zigzag8x8.sorted.toSeq == (0 until 64))
    assert(Transform.zigzag8x8.last == 63)
  }

  test("forward8x8 → quant8 → dequant8 → inverse8x8 reconstructs " +
      "within quantization error, flat and weighted") {
    val rnd = new scala.util.Random(11)
    Seq((16, ScalingMatrices.Flat.w8(0)),
        (16, ScalingMatrices.Default8x8Intra)).foreach { case (_, w8) =>
      (0 until 20).foreach { trial =>
        val qp = 8 + rnd.nextInt(30)
        val x = Array.fill(64)(rnd.nextInt(255) - 127)
        val c = Transform.forward8x8(x)
        val d = new Array[Int](64)
        var i = 0
        while (i < 64) {
          val lvl = Transform.quant8(c(i), qp, i, w8(i))
          d(i) = Transform.dequant8(lvl, qp, i, w8(i))
          i += 1
        }
        val back = Transform.inverse8x8(d)
        // quant step at qp q is ~2^(q/6); allow a generous bound that
        // still reds a broken butterfly/table (those are off by 10x+)
        val tol = math.max(4, (1 << (qp / 6)) * 2)
        (0 until 64).foreach { k =>
          assert(math.abs(back(k) - x(k)) <= tol,
            s"trial $trial qp $qp pos $k: ${back(k)} vs ${x(k)}")
        }
      }
    }
  }

  test("dequant8 with flat weight 16 matches the §8.5.13.1 closed " +
      "form across QPs") {
    (0 to 51).foreach { qp =>
      (0 until 64).foreach { idx =>
        val v = Transform.dequant8(7, qp, idx)
        val w = Transform.dequant8(7, qp, idx, 16)
        assert(v == w)
      }
    }
  }

  // ---- scaling list parse + fallback ---------------------------------

  /** A High SPS RBSP with the given scaling-matrix bits appended
    * where seq_scaling_matrix_present sits. */
  private def highSps(writeMatrix: H264.BitWriter => Unit): Array[Byte] = {
    val w = new H264.BitWriter()
    w.u(100, 8); w.u(0, 8); w.u(40, 8) // High, level 4.0
    w.ue(0)          // sps id
    w.ue(1)          // chroma_format_idc 4:2:0
    w.ue(0); w.ue(0) // bit depths
    w.u(0, 1)        // qpprime
    writeMatrix(w)   // seq_scaling_matrix_present + lists
    w.ue(0)          // log2_max_frame_num_minus4
    w.ue(2)          // poc type
    w.ue(0)          // max refs
    w.u(0, 1)        // gaps
    w.ue(3); w.ue(2) // 4x3 MBs
    w.u(1, 1)        // frame_mbs_only
    w.u(1, 1)        // direct_8x8
    w.u(0, 1)        // no crop
    w.u(0, 1)        // no vui
    w.trailingBits()
    w.toBytes
  }

  test("SPS scaling lists: the jump-to-zero form selects the DEFAULT " +
      "matrices and rule-A fallbacks fill the absent lists (Table 7-2)") {
    val sps = H264.parseSps(highSps { w =>
      w.u(1, 1)          // seq_scaling_matrix_present
      w.u(1, 1); w.se(-8) // list 0: delta -8 → nextScale 0 → default
      (1 until 8).foreach(_ => w.u(0, 1))
    })
    val sm = sps.sm.get
    // Table 7-3/7-4 raster corners
    assert(sm.w4(0)(0) == 6 && sm.w4(0)(15) == 42) // default intra 4x4
    assert(sm.w4(1).toSeq == sm.w4(0).toSeq) // list 1 ← list 0
    assert(sm.w4(2).toSeq == sm.w4(0).toSeq)
    assert(sm.w4(3)(0) == 10 && sm.w4(3)(15) == 34) // default inter
    assert(sm.w8(0)(0) == 6 && sm.w8(0)(63) == 42) // default intra 8x8
    assert(sm.w8(1)(0) == 9 && sm.w8(1)(63) == 35) // default inter 8x8
  }

  test("SPS scaling lists: explicit delta-coded values land in RASTER " +
      "positions via the zig-zag scan") {
    // list 0 coded as 16 explicit values 20,21,...,35 in SCAN order
    val sps = H264.parseSps(highSps { w =>
      w.u(1, 1)
      w.u(1, 1)
      var last = 8
      (0 until 16).foreach { j =>
        val v = 20 + j
        w.se(v - last); last = v
      }
      (1 until 8).foreach(_ => w.u(0, 1))
    })
    val w4 = sps.sm.get.w4(0)
    (0 until 16).foreach { j =>
      assert(w4(Transform.zigzag4x4(j)) == 20 + j, s"scan pos $j")
    }
  }

  test("PPS scaling lists: rule B falls back to the SPS matrices; " +
      "without an SPS matrix, rule A falls back to the defaults") {
    def ppsWithMatrix(t8: Boolean): Array[Byte] = {
      val w = new H264.BitWriter()
      w.ue(0); w.ue(0)     // pps id, sps id
      w.u(0, 1); w.u(0, 1) // cavlc, bfpo
      w.ue(0)              // slice groups
      w.ue(0); w.ue(0)
      w.u(0, 1); w.u(0, 2)
      w.se(0); w.se(0); w.se(0)
      w.u(0, 1); w.u(0, 1); w.u(0, 1)
      w.u(if (t8) 1 else 0, 1) // transform_8x8_mode
      w.u(1, 1)                // pic_scaling_matrix_present
      (0 until (if (t8) 8 else 6)).foreach(_ => w.u(0, 1)) // all absent
      w.se(0)                  // second_chroma_qp_index_offset
      w.trailingBits()
      w.toBytes
    }
    // rule B: SPS carries custom list 0 (constant 24s) → PPS list 0
    // inherits it
    val spsWith = H264.parseSps(highSps { w =>
      w.u(1, 1)
      w.u(1, 1); w.se(24 - 8) // list 0 = constant 24 (one delta, then
                              // deltas 0 — coded as 16 zeros)
      (1 until 16).foreach(_ => w.se(0))
      (1 until 8).foreach(_ => w.u(0, 1))
    })
    assert(spsWith.sm.get.w4(0).forall(_ == 24))
    val ruleB = H264.parsePps(ppsWithMatrix(t8 = true),
      id => if (id == 0) Some(spsWith) else None)
    assert(ruleB.transform8x8)
    assert(ruleB.sm.w4(0).forall(_ == 24), "rule B: PPS ← SPS list 0")
    assert(ruleB.sm.w8(0)(0) == 6, "rule B 8x8 ← SPS default intra")
    // rule A: no SPS matrix → defaults
    val ruleA = H264.parsePps(ppsWithMatrix(t8 = false))
    assert(ruleA.sm.w4(0)(0) == 6 && ruleA.sm.w4(3)(0) == 10)
    // and a PPS with NO matrix inherits the SPS matrices wholesale
    val inherit = H264.parsePps({
      val w = new H264.BitWriter()
      w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 1); w.ue(0)
      w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
      w.se(0); w.se(0); w.se(0)
      w.u(0, 1); w.u(0, 1); w.u(0, 1)
      w.trailingBits(); w.toBytes
    }, id => Some(spsWith))
    assert(inherit.sm.w4(0).forall(_ == 24))
  }

  test("scaling-list delta coding round-trips arbitrary value " +
      "sequences, including the 255-wrap edge (property)") {
    val rnd = new scala.util.Random(42)
    (0 until 100).foreach { trial =>
      // values in 1..255 (0 is the jump-to-default escape at j=0 and
      // the repeat-last escape elsewhere — excluded by construction)
      val vals = Array.fill(16)(1 + rnd.nextInt(255))
      val sps = H264.parseSps(highSps { w =>
        w.u(1, 1)
        w.u(1, 1)
        var last = 8
        vals.foreach { v =>
          // delta_scale is se(v) in [-128, 127] with mod-256 wrap
          var d = v - last
          if (d > 127) d -= 256
          if (d < -128) d += 256
          w.se(d); last = v
        }
        (1 until 8).foreach(_ => w.u(0, 1))
      })
      val got = sps.sm.get.w4(0)
      (0 until 16).foreach { j =>
        assert(got(Transform.zigzag4x4(j)) == vals(j),
          s"trial $trial scan pos $j")
      }
      // repeat-last escape: a mid-list jump to 0 repeats the last
      // value for the remaining entries
      val cut = 1 + rnd.nextInt(14)
      val sps2 = H264.parseSps(highSps { w =>
        w.u(1, 1)
        w.u(1, 1)
        var last = 8
        vals.take(cut).foreach { v =>
          var d = v - last
          if (d > 127) d -= 256
          if (d < -128) d += 256
          w.se(d); last = v
        }
        var d0 = 0 - last
        if (d0 < -128) d0 += 256
        w.se(d0) // jump to 0 → repeat last
        (1 until 8).foreach(_ => w.u(0, 1))
      })
      val got2 = sps2.sm.get.w4(0)
      (0 until 16).foreach { j =>
        val expect = if (j < cut) vals(j) else vals(cut - 1)
        assert(got2(Transform.zigzag4x4(j)) == expect,
          s"trial $trial cut $cut pos $j")
      }
    }
  }

  // ---- full bitstream round trips ------------------------------------

  test("encode↔decode bit-exact across the 8x8 × matrices × deblock × " +
      "slices × QP matrix (CAVLC)") {
    val cases = Seq(
      (64, 48, 22, true, false, false, 0),
      (64, 48, 28, false, true, false, 0),
      (80, 64, 30, true, true, false, 0),
      (64, 48, 30, true, true, true, 2), // + deblock + multi-slice...
      (48, 64, 35, true, false, true, 3))
    cases.foreach { case (w, h, qp, t8, smx, db, rows) =>
      val frames = Seq(gradient(w, h, w + qp), gradient(w, h, qp))
      val (bytes, recon) = H264.encodeCavlc(w, h, frames, qp,
        mbRowsPerSlice = rows, deblock = db, transform8x8 = t8,
        scalingMatrix = smx)
      val dec = H264.decodeFrames(bytes)
      assert(dec.size == 2, s"$w x$h qp$qp t8=$t8 sm=$smx db=$db")
      dec.zip(recon).zipWithIndex.foreach { case (((dw, dh, dp),
          (rw, rh, rp)), f) =>
        assert(dw == rw && dh == rh)
        assert(dp.toSeq == rp.toSeq,
          s"$w x$h qp$qp t8=$t8 sm=$smx db=$db rows=$rows frame $f")
      }
      // the feature genuinely changes the stream AND the pixels
      val (plain, plainRecon) = H264.encodeCavlc(w, h, frames, qp,
        mbRowsPerSlice = rows, deblock = db)
      assert(bytes.toSeq != plain.toSeq)
      if (t8 || smx)
        assert(recon.map(_._3.toSeq) != plainRecon.map(_._3.toSeq),
          "8x8/weighted quant must alter reconstruction")
    }
  }

  test("scaling matrices are entropy-agnostic: CABAC and CAVLC with " +
      "the default matrices reconstruct identical pixels") {
    val frames = Seq(gradient(64, 48, 61), gradient(64, 48, 62))
    val (cavlcB, cavlcR) = H264.encodeCavlc(64, 48, frames, 28,
      scalingMatrix = true)
    val (cabacB, cabacR) = H264.encodeCabac(64, 48, frames, 28,
      scalingMatrix = true)
    cavlcR.zip(cabacR).foreach { case ((_, _, p1), (_, _, p2)) =>
      assert(p1.toSeq == p2.toSeq)
    }
    assert(H264.decodeFrames(cavlcB).map(_._3.toSeq) ==
      H264.decodeFrames(cabacB).map(_._3.toSeq))
  }

  test("CABAC x transform_8x8 is a NAMED error (ctx-399+ init tables " +
      "deliberately not invented), caught at the first slice") {
    val frames = Seq(gradient(32, 32, 9))
    val (bytes, _) = H264.encodeCabac(32, 32, frames, 26)
    val nals = H264.nalUnits(bytes)
    // doctor the PPS: same shape as the encoder's (cabac + deblock
    // control) with the transform_8x8 tail appended
    val w = new H264.BitWriter()
    w.ue(0); w.ue(0)     // ids
    w.u(1, 1); w.u(0, 1) // cabac, bfpo
    w.ue(0); w.ue(0); w.ue(0)
    w.u(0, 1); w.u(0, 2)
    w.se(0); w.se(0); w.se(0)
    w.u(1, 1)            // deblocking control present (as encoder)
    w.u(0, 1); w.u(0, 1)
    w.u(1, 1); w.u(0, 1); w.se(0) // transform_8x8 tail
    w.trailingBits()
    val out = new java.io.ByteArrayOutputStream()
    nals.foreach { n =>
      out.write(Array[Byte](0, 0, 0, 1))
      if ((n(0) & 0x1F) == 8) {
        out.write(n(0))
        val e = H264.rbspToEbsp(w.toBytes)
        out.write(e, 0, e.length)
      } else out.write(n)
    }
    val err = intercept[IllegalArgumentException] {
      H264.decodeFrames(out.toByteArray)
    }
    assert(err.getMessage.contains("transform_8x8"), err.getMessage)
  }

  test("second_chroma_qp_index_offset: distinct Cr offsets round-trip " +
      "display-exact under both coders, with deblock and 8x8") {
    val frames = Seq(gradient(64, 48, 71), gradient(64, 48, 72))
    Seq(
      ("cavlc cr+4", H264.encodeCavlc(64, 48, frames, 30,
        chromaQpOffsetCr = 4)),
      ("cavlc cr-6 deblock", H264.encodeCavlc(64, 48, frames, 30,
        deblock = true, chromaQpOffsetCr = -6)),
      ("cavlc cr+5 t8 sm deblock", H264.encodeCavlc(64, 48, frames, 30,
        transform8x8 = true, scalingMatrix = true, deblock = true,
        chromaQpOffsetCr = 5)),
      ("cabac cr+4 deblock", H264.encodeCabac(64, 48, frames, 30,
        deblock = true, chromaQpOffsetCr = 4))
    ).foreach { case (tag, (bytes, recon)) =>
      val dec = H264.decodeFrames(bytes)
      assert(dec.size == 2, tag)
      dec.zip(recon).foreach { case ((_, _, p), (_, _, rp)) =>
        assert(p.toSeq == rp.toSeq, tag)
      }
    }
    // the offset is live (changes pixels), zero is bit-compatible
    // with the tail-less emitter, and the parse reads it back
    val (b4, r4) = H264.encodeCavlc(64, 48, frames, 30,
      chromaQpOffsetCr = 4)
    val (b0, r0) = H264.encodeCavlc(64, 48, frames, 30,
      chromaQpOffsetCr = 0)
    val (bp, _) = H264.encodeCavlc(64, 48, frames, 30)
    assert(b0.toSeq == bp.toSeq)
    assert(r4.map(_._3.toSeq) != r0.map(_._3.toSeq))
    val pps = H264.parsePps(H264.ebspToRbsp(
      H264.nalUnits(b4).find(n => (n(0) & 0x1F) == 8).get, 1))
    assert(pps.chromaQpOffsetCr == 4 && pps.chromaQpOffset == 0)
    assert(!pps.transform8x8, "Cr-only tail must not enable 8x8")
  }

  test("fuzz: mutated/truncated 8x8+matrix and mixed-GOP streams " +
      "throw or decode — never hang or corrupt the JVM") {
    val (bytes8, _) = H264.encodeCavlc(48, 48,
      Seq(gradient(48, 48, 55)), qp = 30, transform8x8 = true,
      scalingMatrix = true, deblock = true)
    val mixed = H264.insertInterFiller(
      H264.encodeCavlc(48, 48, Seq(gradient(48, 48, 56)), qp = 26)._1,
      perGap = 2)
    val rnd = new scala.util.Random(123)
    var threw = 0
    Seq(bytes8, mixed).foreach { base =>
      (0 until 200).foreach { _ =>
        val m = base.clone()
        m(rnd.nextInt(m.length)) =
          (m(rnd.nextInt(m.length)) ^ (1 << rnd.nextInt(8))).toByte
        try { H264.decodeFrames(m); () }
        catch { case _: Exception | _: AssertionError => threw += 1 }
      }
      (1 until 12).foreach { cut =>
        try { H264.decodeFrames(base.take(base.length - cut * 9)); () }
        catch { case _: Exception => () }
      }
    }
    assert(threw > 0, "some mutations must be detected")
  }

  test("the 8x8 fixture population genuinely mixes transform sizes " +
      "and composes with mixed-GOP P filler") {
    val frames = Seq(gradient(64, 64, 3))
    val (bytes, recon) = H264.encodeCavlc(64, 64, frames, 26,
      transform8x8 = true, scalingMatrix = true)
    // mixed GOP on top of 8x8: P_Skip filler + High-profile intra.
    // Since the inter round, the filler pictures DECODE (motion
    // compensation) — each is an exact copy of the High-profile IDR
    // it references, so all 3 pictures carry the same pixels
    val mixed = H264.insertInterFiller(bytes, perGap = 2)
    val dec = H264.decodeFrames(mixed)
    assert(dec.size == 3)
    dec.foreach(f => assert(f._3.toSeq == recon.head._3.toSeq))
  }
}
