package graft

import graft.multimodal.{H264, H264Deblock, H264Mb}

/**
 * In-loop deblocking filter (§8.7): encode↔decode bit-exactness with
 * the filter ENABLED under both entropy coders, proof the filter
 * actually changes pixels, slice-boundary semantics (idc 0 vs 2),
 * and offset-index clipping.
 */
class H264DeblockSpec extends SparkSpec {

  private def gradient(w: Int, h: Int, seed: Int): Array[Int] = {
    val rnd = new scala.util.Random(seed)
    Array.tabulate(w * h)(i =>
      ((i * 31 + seed) & 0xFF) << 16 | (rnd.nextInt(256) << 8) |
        ((i / w) & 0xFF))
  }

  test("CAVLC with deblocking: decode == encoder recon bit-exact, " +
      "and the filter demonstrably fires") {
    val frames = Seq(gradient(64, 48, 3), gradient(64, 48, 4))
    Seq(20, 30, 40).foreach { qp =>
      val (bytes, recon) = H264.encodeCavlc(64, 48, frames, qp,
        mbRowsPerSlice = 0, deblock = true)
      val decoded = H264.decodeFrames(bytes)
      assert(decoded.size == 2)
      decoded.zip(recon).foreach { case ((w, h, dp), (_, _, rp)) =>
        assert(w == 64 && h == 48)
        assert(dp.toSeq == rp.toSeq, s"qp $qp pixels differ")
      }
      // the filter must actually change SOMETHING vs the unfiltered
      // encode of the same frames (at high QP blocking is strong)
      val (_, reconOff) = H264.encodeCavlc(64, 48, frames, qp)
      if (qp >= 30)
        assert(recon.head._3.toSeq != reconOff.head._3.toSeq,
          s"qp $qp: deblocking changed nothing")
    }
  }

  test("CABAC with deblocking: bit-exact round-trip, single and " +
      "multi-slice (cross-slice filtering under idc 0)") {
    val frames = Seq(gradient(64, 64, 9))
    Seq(0, 1, 2).foreach { rows =>
      val (bytes, recon) = H264.encodeCabac(64, 64, frames, qp = 34,
        mbRowsPerSlice = rows, deblock = true)
      val decoded = H264.decodeFrames(bytes)
      assert(decoded.head._3.toSeq == recon.head._3.toSeq,
        s"rows=$rows")
    }
  }

  test("idc semantics at a slice boundary: 2 skips the cross-slice " +
      "edge, 0 filters it (unit level)") {
    // two vertically stacked MBs in different slices; plant a hard
    // horizontal step exactly at the MB boundary
    val wMbs = 1; val hMbs = 2
    def planes(): (Array[Byte], Array[Byte], Array[Byte]) = {
      // a SMALL step: |p0-q0| must sit under alpha(36)=50 (and under
      // the strong filter's (alpha>>2)+2 gap) — large steps are real
      // edges the filter correctly preserves
      val y = new Array[Byte](16 * 32)
      (0 until 32).foreach { row =>
        val v = if (row < 16) 100 else 112
        (0 until 16).foreach(col => y(row * 16 + col) = v.toByte)
      }
      (y, Array.fill[Byte](8 * 16)(128.toByte),
        Array.fill[Byte](8 * 16)(128.toByte))
    }
    val sliceIds = Array(0, 1) // different slices
    val qps = Array(36, 36)
    def run(idc: Int): Array[Byte] = {
      val (y, cb, cr) = planes()
      H264Deblock.filterPicture(y, cb, cr, wMbs, hMbs, qps,
        chromaQpOffset = 0, sliceIds, Array(idc, idc),
        new Array[Int](2), new Array[Int](2))
      y
    }
    val row15 = 15 * 16
    val row16 = 16 * 16
    val kept = run(2)
    assert((kept(row15) & 0xFF) == 100 && (kept(row16) & 0xFF) == 112,
      "idc=2 must not filter across slices")
    val filtered = run(0)
    assert((filtered(row15) & 0xFF) != 100 ||
      (filtered(row16) & 0xFF) != 112,
      "idc=0 must filter the cross-slice MB edge")
    // same-slice MBs under idc=2 DO filter their shared edge
    val (y2, cb2, cr2) = planes()
    H264Deblock.filterPicture(y2, cb2, cr2, wMbs, hMbs, qps,
      chromaQpOffset = 0, Array(0, 0), Array(2, 2),
      new Array[Int](2), new Array[Int](2))
    assert((y2(row15) & 0xFF) != 100 || (y2(row16) & 0xFF) != 112)
  }

  test("alpha==0 band (low QP + negative offsets) is a no-op; " +
      "offsets clip to [0,51]") {
    val wMbs = 2; val hMbs = 1
    val y = Array.tabulate[Byte](32 * 16)(i => ((i * 37) & 0xFF).toByte)
    val before = y.clone()
    val cb = Array.fill[Byte](16 * 8)(100.toByte)
    val cr = Array.fill[Byte](16 * 8)(100.toByte)
    // qp 10 → indexA ≈ 10 < 16 → alpha 0 everywhere → untouched
    H264Deblock.filterPicture(y, cb, cr, wMbs, hMbs, Array(10, 10),
      0, Array(0, 0), Array(0, 0), new Array[Int](2),
      new Array[Int](2))
    assert(y.toSeq == before.toSeq)
    // absurd positive offsets clip to 51 instead of overrunning
    H264Deblock.filterPicture(y, cb, cr, wMbs, hMbs, Array(51, 51),
      0, Array(0, 0), Array(0, 0), Array(12, 12), Array(12, 12))
  }

  test("I_PCM MBs deblock at QP 0: the filter is a no-op at QP 0 " +
      "(alpha(0)=0), so PCM pixels pass through untouched") {
    // unit level: a stepped plane at mbQp 0 with idc 0 (the shape an
    // all-PCM picture presents — H264.encode's PPS carries no
    // deblocking control, so decode runs the filter path) stays
    // bit-identical; H264Spec's PCM round-trips pin the full path
    val y = Array.tabulate[Byte](16 * 32)(i =>
      (if (i < 16 * 16) 100 else 112).toByte)
    val before = y.clone()
    val cb = Array.fill[Byte](8 * 16)(128.toByte)
    val cr = Array.fill[Byte](8 * 16)(128.toByte)
    H264Deblock.filterPicture(y, cb, cr, 1, 2, Array(0, 0), 0,
      Array(0, 0), Array(0, 0), new Array[Int](2), new Array[Int](2))
    assert(y.toSeq == before.toSeq, "QP-0 filtering must be a no-op")
  }

  test("varying per-MB QP (mb_qp_delta != 0) round-trips bit-exact " +
      "under BOTH entropy coders, with and without deblocking") {
    // real rate-controlled streams change QP per macroblock; the
    // constant-QP fixtures never exercised that decode path. qpAmp
    // drives a triangle wave of per-MB QP targets → nonzero
    // mb_qp_delta elements in both entropy codings.
    val frames = Seq(gradient(64, 48, 41), gradient(64, 48, 42))
    Seq(false, true).foreach { db =>
      val (cavlc, rv) = H264.encodeCavlc(64, 48, frames, qp = 28,
        mbRowsPerSlice = 0, deblock = db, qpAmp = 6)
      assert(H264.decodeFrames(cavlc).map(_._3.toSeq) ==
        rv.map(_._3.toSeq), s"cavlc deblock=$db")
      val (cabac, rb) = H264.encodeCabac(64, 48, frames, qp = 28,
        mbRowsPerSlice = 2, deblock = db, qpAmp = 6)
      assert(H264.decodeFrames(cabac).map(_._3.toSeq) ==
        rb.map(_._3.toSeq), s"cabac deblock=$db")
    }
    // the deltas are real: the varying-QP stream differs from the
    // constant-QP one on identical input
    val (flat, _) = H264.encodeCavlc(64, 48, frames, qp = 28)
    val (varied, _) = H264.encodeCavlc(64, 48, frames, qp = 28,
      qpAmp = 6)
    assert(flat.toSeq != varied.toSeq)
  }

  test("H264Mb PicCtx arrays exist for the filter's neighbors " +
      "(compile-level contract)") {
    val ctx = new H264Mb.PicCtx(2, 2)
    assert(ctx.cbpLumaArr.length == 4 && ctx.chromaModeArr.length == 4)
  }

  test("Table 8-17 tC0 columns pin spot rows of the published table") {
    // (indexA, tC0 for bS=1, bS=2, bS=3) — rows copied digit-for-digit
    // from ITU-T H.264 Table 8-17. These catch any re-transcription
    // drift that fixture round-trips (which share the table between
    // encoder and decoder) structurally cannot.
    val rows = Seq(
      (15, 0, 0, 0), (16, 0, 0, 0),
      (17, 0, 0, 1),  // first nonzero of the bS=3 column
      (20, 0, 0, 1),
      (21, 0, 1, 1),  // first nonzero of the bS=2 column
      (22, 0, 1, 1),
      (23, 1, 1, 1),  // first nonzero of the bS=1 column
      (26, 1, 1, 1), (27, 1, 1, 2), (30, 1, 1, 2),
      (31, 1, 2, 3), (33, 2, 2, 3), (34, 2, 2, 4),
      (36, 2, 3, 4), (37, 3, 3, 5), (38, 3, 4, 6),
      (40, 4, 4, 7), (42, 4, 5, 9), (43, 5, 6, 10),
      (45, 6, 8, 13), (47, 8, 10, 16), (48, 9, 11, 18),
      (49, 10, 13, 20), (50, 11, 15, 23), (51, 13, 17, 25))
    rows.foreach { case (idxA, t1, t2, t3) =>
      assert(H264Deblock.tc0For(1, idxA) == t1, s"bS=1 indexA=$idxA")
      assert(H264Deblock.tc0For(2, idxA) == t2, s"bS=2 indexA=$idxA")
      assert(H264Deblock.tc0For(3, idxA) == t3, s"bS=3 indexA=$idxA")
    }
  }
}
