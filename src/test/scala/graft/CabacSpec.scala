package graft

import graft.multimodal.{H264, H264Cabac}

/**
 * CABAC entropy coding (ITU-T H.264 §9.3): arithmetic engine golden
 * vectors (hand-derived — independent of the context init table),
 * encode↔decode bit-exactness across sizes × QPs × slice layouts,
 * cross-entropy-coder pixel equality vs CAVLC, and decode-side fuzz.
 */
class CabacSpec extends SparkSpec {

  private def gradient(w: Int, h: Int, seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(w * h)(i =>
      ((i * 31 + seed) & 0xFF) << 16 | (rnd.nextInt(256) << 8) |
        ((i / w) & 0xFF))
  }

  // ---- engine level -------------------------------------------------

  test("engine: encode→decode round-trips arbitrary bin sequences " +
      "through decision/bypass/terminate") {
    val rnd = new scala.util.Random(7)
    (0 until 20).foreach { trial =>
      val n = 50 + rnd.nextInt(400)
      // (kind, ctxIdx, bin): kind 0 decision, 1 bypass
      val bins = (0 until n).map { _ =>
        (rnd.nextInt(2), rnd.nextInt(276), rnd.nextInt(2))
      }
      val qp = rnd.nextInt(52)
      val w = new H264.BitWriter()
      val cmE = new H264Cabac.CtxModel(qp)
      val e = new H264Cabac.Encoder(w, cmE)
      bins.foreach {
        case (0, ctx, b) => e.decision(ctx, b)
        case (_, _, b)   => e.bypass(b)
      }
      e.terminate(1)
      w.alignZero()
      val r = new H264.BitReader(w.toBytes)
      val cmD = new H264Cabac.CtxModel(qp)
      val d = new H264Cabac.Decoder(r, cmD)
      bins.zipWithIndex.foreach {
        case ((0, ctx, b), i) =>
          assert(d.decision(ctx) == b, s"trial $trial decision $i")
        case ((_, _, b), i) =>
          assert(d.bypass() == b, s"trial $trial bypass $i")
      }
      assert(d.terminate() == 1, s"trial $trial terminate")
      // context states must have evolved identically on both sides
      assert(cmD.state.toSeq == cmE.state.toSeq)
      assert(cmD.mps.toSeq == cmE.mps.toSeq)
    }
  }

  test("engine: interleaved end_of_slice terminate(0) bins survive " +
      "round-trip at every position") {
    val w = new H264.BitWriter()
    val cmE = new H264Cabac.CtxModel(26)
    val e = new H264Cabac.Encoder(w, cmE)
    (0 until 64).foreach { i =>
      e.decision(i % 276, i & 1)
      e.terminate(0)
    }
    e.terminate(1)
    w.alignZero()
    val d = new H264Cabac.Decoder(new H264.BitReader(w.toBytes),
      new H264Cabac.CtxModel(26))
    (0 until 64).foreach { i =>
      assert(d.decision(i % 276) == (i & 1), s"bin $i")
      assert(d.terminate() == 0, s"eos $i")
    }
    assert(d.terminate() == 1)
  }

  /**
   * HAND-DERIVED golden vector for the arithmetic DECODER — the
   * engine-conformance check that does not depend on the context
   * init table or on the encoder. Input bytes 0x41 0x9E 0xC0 with a
   * single context variable forced to pStateIdx=10, valMPS=1:
   *
   *   init: codIRange=510, codIOffset = first 9 bits = 0b010000011 = 131
   *   bin 1: qIdx=(510>>6)&3=3 → rLPS=rangeTabLPS[10][3]=142;
   *     range=510-142=368; 131<368 → MPS=1; state→11; no renorm.
   *   bin 2: qIdx=(368>>6)&3=1 → rLPS[11][1]=99; range=368-99=269;
   *     131<269 → MPS=1; state→12; no renorm.
   *   bin 3: qIdx=(269>>6)&3=0 → rLPS[12][0]=77; range=269-77=192;
   *     131<192 → MPS=1; state→13; renorm: range=384,
   *     offset=131·2+next bit(0)=262.
   *   bin 4: qIdx=(384>>6)&3=2 → rLPS[13][2]=105; range=384-105=279;
   *     262<279 → MPS=1; state→14; no renorm.
   *   bin 5: qIdx=(279>>6)&3=0 → rLPS[14][0]=69; range=279-69=210;
   *     262>=210 → LPS=0; offset=262-210=52; range=69; state→11
   *     (transIdxLPS[14]=11, MPS stays 1); renorm twice:
   *     range=276, offset=52·4+bits(01)=209.
   *   bypass: offset=209·2+bit(1)=419 ≥ 276 → 1, offset=143.
   *   bypass: offset=143·2+bit(1)=287 ≥ 276 → 1, offset=11.
   *   terminate: range=274; 11<274 → 0 (no renorm needed).
   */
  test("engine: hand-derived decoder golden vector (table-independent)") {
    val bytes = Array[Byte](0x41, 0x9E.toByte, 0xC0.toByte)
    val cm = new H264Cabac.CtxModel(26)
    val ctxIdx = 100
    cm.state(ctxIdx) = 10
    cm.mps(ctxIdx) = 1
    val d = new H264Cabac.Decoder(new H264.BitReader(bytes), cm)
    assert(d.decision(ctxIdx) == 1, "bin 1 (MPS)")
    assert(cm.state(ctxIdx) == 11)
    assert(d.decision(ctxIdx) == 1, "bin 2 (MPS)")
    assert(cm.state(ctxIdx) == 12)
    assert(d.decision(ctxIdx) == 1, "bin 3 (MPS, renorm)")
    assert(cm.state(ctxIdx) == 13)
    assert(d.decision(ctxIdx) == 1, "bin 4 (MPS)")
    assert(cm.state(ctxIdx) == 14)
    assert(d.decision(ctxIdx) == 0, "bin 5 (LPS)")
    assert(cm.state(ctxIdx) == 11 && cm.mps(ctxIdx) == 1)
    assert(d.bypass() == 1, "bypass 1")
    assert(d.bypass() == 1, "bypass 2")
    assert(d.terminate() == 0, "terminate")
  }

  /**
   * Spec-conformance pin for EncodeTerminate(1) → EncodeFlush
   * (§9.3.4.1.1/9.3.4.1.2): a fresh engine terminating immediately
   * emits EXACTLY 10 bit events (7 flush renorms + PutBit + 2 raw),
   * of which the first is suppressed — hand-derived:
   *   terminate: range=510-2=508, low+=508.
   *   flush: range=2; renorm ×7 — low=508,504,496,480,448,384,256 all
   *   land in [256,512) → outstanding grows to 7, low ends 0;
   *   PutBit((0>>9)&1)=0 (suppressed as first bit) drains outstanding
   *   as seven 1s; WriteBits((0>>7)&3|1)=01.
   *   Written stream: 1111111 01 → 0xFE 0x80 after zero alignment.
   * The old non-conformant path (intermediate renorm before flush)
   * emitted 7 extra bits and fails this byte pin. The decoder reads
   * its 9-bit init preread, returns terminate=1 with no further
   * reads, and must sit exactly at the flush end: byte alignment
   * consumes only the zero padding.
   */
  test("engine: terminate(1) flush is spec-exact (byte pin + decoder " +
      "lands at the flush end)") {
    val w = new H264.BitWriter()
    val e = new H264Cabac.Encoder(w, new H264Cabac.CtxModel(26))
    e.terminate(1)
    w.alignZero()
    assert(w.toBytes.toSeq == Seq(0xFE.toByte, 0x80.toByte))
    val r = new H264.BitReader(w.toBytes)
    val d = new H264Cabac.Decoder(r, new H264Cabac.CtxModel(26))
    assert(d.terminate() == 1)
    r.alignToByte() // the remaining 7 bits must all be zero padding
  }

  test("context init: preCtxState clip keeps every state in [0,62] " +
      "for every QP (structural table sanity)") {
    (0 to 51).foreach { qp =>
      val cm = new H264Cabac.CtxModel(qp)
      (0 until 276).foreach { i =>
        assert(cm.state(i) >= 0 && cm.state(i) <= 62,
          s"qp $qp ctx $i state ${cm.state(i)}")
        assert(cm.mps(i) == 0 || cm.mps(i) == 1)
      }
    }
  }

  // ---- full bitstream level ------------------------------------------

  /**
   * Hand-derived residual_block_cabac vector (§7.3.5.3.3 +
   * §9.3.3.1.3): the chroma-DC block [3, 0, -1, 1] binarizes as
   *   sig(i0)=1@ctx149  last(i0)=0@ctx210  sig(i1)=0@ctx150
   *   sig(i2)=1@ctx151  last(i2)=0@ctx212  [sig(i3) implied]
   * then levels in reverse scan order:
   *   i3: |1|-1=0 → bin0=0@ctx258 (inc=min(4,1+0)=1), sign 0
   *   i2: bin0=0@ctx259 (numEq1=1 → inc 2), sign 1
   *   i0: |3|-1=2 → bin0=1@ctx260 (inc 3), prefix 1,0@ctx262
   *       (inc 5+min(3,numGt1=0)), sign 0
   * The bins are emitted RAW through the engine (independent of
   * writeResidual) and must decode through readResidual — pinning
   * the context schedule itself against the spec derivation.
   */
  test("hand-derived residual block vector decodes through readResidual") {
    val w = new H264.BitWriter()
    val cmE = new H264Cabac.CtxModel(30)
    val e = new H264Cabac.Encoder(w, cmE)
    val bins = Seq((149, 1), (210, 0), (150, 0), (151, 1), (212, 0),
      (258, 0), (259, 0), (260, 1), (262, 1), (262, 0))
    // signs ride bypass: after ctx258-bin → 0, after ctx259-bin → 1,
    // after the ctx262 run → 0
    e.decision(149, 1); e.decision(210, 0); e.decision(150, 0)
    e.decision(151, 1); e.decision(212, 0)
    e.decision(258, 0); e.bypass(0)
    e.decision(259, 0); e.bypass(1)
    e.decision(260, 1); e.decision(262, 1); e.decision(262, 0)
    e.bypass(0)
    e.terminate(1)
    w.alignZero()
    assert(bins.size == 10) // documentation cross-check
    val d = new H264Cabac.Decoder(new H264.BitReader(w.toBytes),
      new H264Cabac.CtxModel(30))
    val (coeffs, n) = H264Cabac.readResidual(d, cat = 3, maxNumCoeff = 4)
    assert(coeffs.toSeq == Seq(3, 0, -1, 1), coeffs.toSeq)
    assert(n == 3)
    assert(d.terminate() == 1)
  }

  test("encode↔decode bit-exact across sizes × QPs × slice layouts") {
    val cases = Seq(
      (16, 16, 20, 0), (48, 32, 26, 0), (64, 48, 32, 2),
      (80, 64, 40, 1), (32, 96, 10, 3))
    cases.foreach { case (w, h, qp, rows) =>
      val frames = Seq(gradient(w, h, w + h + qp),
        gradient(w, h, w * h))
      val (bytes, recon) = H264.encodeCabac(w, h, frames, qp, rows)
      val decoded = H264.decodeFrames(bytes)
      assert(decoded.size == 2, s"${w}x$h qp$qp rows$rows")
      decoded.zip(recon).zipWithIndex.foreach {
        case (((dw, dh, dp), (rw, rh, rp)), f) =>
          assert(dw == rw && dh == rh)
          assert(dp.toSeq == rp.toSeq,
            s"${w}x$h qp$qp rows$rows frame $f pixels differ")
      }
    }
  }

  test("cross-coder pixel equality: CABAC and CAVLC reconstruct " +
      "identical pixels from identical inputs") {
    val frames = Seq(gradient(64, 48, 33), gradient(64, 48, 34))
    val (cavlcBytes, cavlcRecon) = H264.encodeCavlc(64, 48, frames, 28)
    val (cabacBytes, cabacRecon) = H264.encodeCabac(64, 48, frames, 28)
    cavlcRecon.zip(cabacRecon).foreach {
      case ((w1, h1, p1), (w2, h2, p2)) =>
        assert(w1 == w2 && h1 == h2)
        assert(p1.toSeq == p2.toSeq,
          "entropy layer must not change reconstruction")
    }
    // and both bitstreams decode to that same reconstruction
    assert(H264.decodeFrames(cavlcBytes).map(_._3.toSeq) ==
      H264.decodeFrames(cabacBytes).map(_._3.toSeq))
    // the entropy layers are genuinely different encodings
    assert(cavlcBytes.toSeq != cabacBytes.toSeq)
  }

  test("multi-slice CABAC pictures: contexts re-init per slice and " +
      "prediction respects slice boundaries") {
    val frames = Seq(gradient(64, 64, 55))
    val (one, rOne) = H264.encodeCabac(64, 64, frames, 26, 0)
    val (multi, rMulti) = H264.encodeCabac(64, 64, frames, 26, 1)
    assert(H264.decodeFrames(one).head._3.toSeq == rOne.head._3.toSeq)
    assert(H264.decodeFrames(multi).head._3.toSeq ==
      rMulti.head._3.toSeq)
    // slice isolation changes prediction → different pixels is FINE,
    // but both must self-decode exactly (asserted above)
  }

  test("fuzz: mutated/truncated CABAC streams throw or decode — " +
      "never hang or corrupt the JVM") {
    val (bytes, _) = H264.encodeCabac(48, 48,
      Seq(gradient(48, 48, 77)), qp = 30)
    val rnd = new scala.util.Random(99)
    var threw = 0
    (0 until 300).foreach { _ =>
      val mutated = bytes.clone()
      val i = rnd.nextInt(mutated.length)
      mutated(i) = (mutated(i) ^ (1 << rnd.nextInt(8))).toByte
      try { H264.decodeFrames(mutated); () }
      catch { case _: Exception | _: AssertionError => threw += 1 }
    }
    (1 until 20).foreach { cut =>
      val t = bytes.take(bytes.length - cut * 7)
      try { H264.decodeFrames(t); () }
      catch { case _: Exception => () }
    }
    assert(threw > 0, "some mutations must be detected")
  }

  test("I_PCM inside CABAC slices: flush -> raw bytes -> engine " +
      "re-init round-trips bit-exact, mixed with compressed MBs") {
    // every 3rd MB is raw PCM (lossless), the rest CABAC-compressed;
    // the engine flushes before each PCM payload and re-inits after
    // (contexts persisting). Also: PCM as the FIRST and LAST MB of a
    // slice, and composition with deblocking (PCM deblocks at QP 0).
    Seq((48, 48, 3, 0, false), (64, 32, 1, 0, false), // every MB PCM
        (64, 48, 4, 2, false), (48, 64, 3, 0, true)).foreach {
      case (w, h, every, rows, db) =>
        val frames = Seq(gradient(w, h, w + every), gradient(w, h, 7))
        val (bytes, recon) = H264.encodeCabac(w, h, frames, qp = 28,
          mbRowsPerSlice = rows, deblock = db, pcmEvery = every)
        val decoded = H264.decodeFrames(bytes)
        assert(decoded.size == 2, s"${w}x$h every=$every")
        decoded.zip(recon).foreach { case ((dw, dh, dp), (_, _, rp)) =>
          assert(dw == w && dh == h)
          assert(dp.toSeq == rp.toSeq,
            s"${w}x$h every=$every rows=$rows deblock=$db differs")
        }
    }
    // and PCM-adjacent context/prediction state is genuinely
    // exercised: the mixed stream differs from the all-compressed one
    val frames = Seq(gradient(64, 48, 9))
    val (mixed, _) = H264.encodeCabac(64, 48, frames, pcmEvery = 3)
    val (comp, _) = H264.encodeCabac(64, 48, frames)
    assert(mixed.toSeq != comp.toSeq)
  }

  test("legacy guard: a PCM bin in a truncated CABAC stream still " +
      "fails loudly, never hangs") {
    // hand-build: SPS/PPS(cabac) + a slice whose first mb_type decodes
    // as the PCM path — craft by encoding, then decoding with a
    // doctored engine is fragile; instead drive the decoder with a
    // stream whose first mb_type bin0=1 then terminate=1. Encode that
    // bin pattern directly with the engine.
    val frames = Seq(gradient(16, 16, 5))
    val (bytes, _) = H264.encodeCabac(16, 16, frames, qp = 26)
    // locate the slice NAL and rebuild its payload: same header, then
    // engine-encoded bins [mb_type bin0=1, terminate=1(PCM)]
    val nals = H264.nalUnits(bytes)
    val slice = nals.find(n => (n(0) & 0x1F) == 5).get
    val rbsp = H264.ebspToRbsp(slice, 1)
    // slice header for this fixture: ue(0) ue(7) ue(0) u(4) ue(0|1)
    // u(1) u(1) se(0) ue(1) → re-emit verbatim by copying bits until
    // byte alignment (header ends at the alignment-ones run)
    val w = new H264.BitWriter()
    w.ue(0); w.ue(7); w.ue(0); w.u(0, 4); w.ue(0)
    w.u(0, 1); w.u(0, 1); w.se(0); w.ue(1)
    while (!w.byteAligned) w.u(1, 1)
    val cm = new H264Cabac.CtxModel(26)
    val e = new H264Cabac.Encoder(w, cm)
    // mb_type bin0 = 1 (not I_NxN; ctx 3+0: no neighbors), then the
    // PCM terminate bin = 1
    e.decision(3, 1)
    e.terminate(1)
    w.alignZero()
    val sps = nals.find(n => (n(0) & 0x1F) == 7).get
    val pps = nals.find(n => (n(0) & 0x1F) == 8).get
    val out = new java.io.ByteArrayOutputStream()
    Seq(sps, pps).foreach { n =>
      out.write(Array[Byte](0, 0, 0, 1)); out.write(n)
    }
    out.write(Array[Byte](0, 0, 0, 1))
    out.write(slice(0)) // same NAL header byte
    val ebsp = H264.rbspToEbsp(w.toBytes)
    out.write(ebsp, 0, ebsp.length)
    // the stream declares PCM but carries no sample bytes: the decode
    // must throw (reader overrun / corrupt NAL), never hang or return
    // fabricated pixels
    intercept[Exception] {
      H264.decodeFrames(out.toByteArray)
    }
  }
}
