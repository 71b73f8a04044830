package graft

import graft.multimodal.H264

/**
 * CAVLC B slices: Table 7-14/7-18 partition grammar, two reference
 * lists over POC-ordered anchors, default biprediction (§8.4.2.3.1),
 * spatial direct + B_Skip (§8.4.1.2.2), display-order output
 * (decode order ≠ display order), and the §8.2.1.1 POC msb
 * wraparound. The B-as-L0 cross-check validates the B path against
 * the independently-verified P machinery — an EXTERNAL consistency
 * anchor, not a round-trip that could cancel its own bugs.
 */
class H264BSliceSpec extends SparkSpec {

  private def translated(n: Int, w: Int, h: Int, dx: Int,
                         dy: Int): Seq[Array[Int]] =
    (0 until n).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w + f * dx; val y = i / w + f * dy
        val r = (x * 3 + y * 5) & 0xFF
        val g = (x * 11 + y * 7) & 0xFF
        val b = (x * 2 + y * 13) & 0xFF
        (r << 16) | (g << 8) | b
      }
    }

  private def grad(n: Int, w: Int, h: Int, seed: Int): Seq[Array[Int]] =
    (0 until n).map { f =>
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (((x * 3 + y * 5 + f * 17 + seed) & 0xFF) << 16) |
          ((((x * 7) ^ (y * 2)) + f * 9 & 0xFF) << 8) |
          ((x + y * 3 + f * 4 + seed * 3) & 0xFF)
      }
    }

  private def assertExact(bytes: Array[Byte],
                          recon: Seq[(Int, Int, Array[Int])]): Unit = {
    val dec = H264.decodeFrames(bytes)
    assert(dec.size == recon.size,
      s"decoded ${dec.size}, expected ${recon.size}")
    dec.zip(recon).zipWithIndex.foreach {
      case (((w, h, px), (rw, rh, rpx)), i) =>
        assert(w == rw && h == rh, s"frame $i dims")
        assert(px.toSeq == rpx.toSeq, s"frame $i pixels differ")
    }
  }

  test("cross-check against the P machinery: a B picture coded " +
      "L0-only decodes pixel-identically to the SAME frame coded as " +
      "a P picture") {
    val f3 = translated(3, 64, 48, dx = 2, dy = 1)
    // B stream: display [I0, B1, P2]; B1 forced to L0_16x16 MBs
    // predicting from anchor 0 with a forced MV
    val (bBytes, bRecon) = H264.encodeCavlcB(64, 48, f3, qp = 26,
      bBetween = 2, forcedMv = Seq((6, 2)), bVariantBase = 1)
    assertExact(bBytes, bRecon)
    // P stream over the same first two frames with the same MV: the
    // IDR recon is identical, the prediction source and residual
    // pipeline are identical, so frame 1's pixels must MATCH
    val (pBytes, pRecon) = H264.encodeCavlcP(64, 48, f3.take(2),
      qp = 26, forcedMv = Seq((6, 2)))
    assertExact(pBytes, pRecon)
    assert(bRecon(1)._3.toSeq == pRecon(1)._3.toSeq,
      "B-as-L0 must reproduce the P prediction exactly")
  }

  test("display-order output: decode order is IPB but frames come " +
      "back in display order, bit-exact") {
    val f = grad(7, 48, 32, seed = 5)
    val (bytes, recon) = H264.encodeCavlcB(48, 32, f, qp = 27,
      bBetween = 2, forcedMv = Seq((4, 1), (-3, 2)))
    // the stream really is out of display order: picture 2 (first
    // P anchor) precedes pictures 1..: slice NAL count = 7, and the
    // second slice NAL is a REFERENCE P while B's are non-reference
    val slices = H264.nalUnits(bytes).filter(n => (n(0) & 0x1F) <= 5)
      .filter(n => (n(0) & 0x1F) == 1 || (n(0) & 0x1F) == 5)
    assert(slices.size == 7)
    assert(((slices(1)(0) & 0xFF) >>> 5) != 0, "anchor is a reference")
    assert(((slices(2)(0) & 0xFF) >>> 5) == 0, "B is non-reference")
    assertExact(bytes, recon)
  }

  test("bipred, both-list partitions, sub-partitions, intra-in-B " +
      "and two refs each way round-trip display-exact") {
    val f = translated(7, 80, 48, dx = 1, dy = 2)
    val (bytes, recon) = H264.encodeCavlcB(80, 48, f, qp = 28,
      bBetween = 2, searchRange = 2, partitionCycle = true,
      intraEvery = 5, refsEachWay = 2)
    assertExact(bytes, recon)
  }

  test("spatial direct and B_Skip: a static scene collapses B " +
      "pictures to skips that copy their reference exactly") {
    val still = grad(1, 48, 32, seed = 3).head
    val f = Seq.fill(7)(still)
    val (bytes, recon) = H264.encodeCavlcB(48, 32, f, qp = 26,
      bBetween = 2)
    assertExact(bytes, recon)
    val dec = H264.decodeFrames(bytes)
    // after the first correction step the anchors converge; B
    // pictures between equal anchors are all-B_Skip copies
    assert(dec(4)._3.toSeq == dec(3)._3.toSeq)
    assert(dec(5)._3.toSeq == dec(3)._3.toSeq)
    val bNals = H264.nalUnits(bytes).filter(n => (n(0) & 0xFF) == 0x01)
    assert(bNals.nonEmpty)
    assert(bNals.drop(2).forall(_.length < 20),
      s"late B slices should be skip-tiny: ${bNals.map(_.length)}")
  }

  test("B_Direct_16x16 with residual, deblocking and High-profile " +
      "8x8 compose over B pictures") {
    val f = translated(5, 64, 48, dx = 2, dy = 2)
    // variant base 0 → direct-first: moving content forces direct
    // MBs to carry residual (B_Direct_16x16), deblock ON
    val (bytes, recon) = H264.encodeCavlcB(64, 48, f, qp = 30,
      bBetween = 2, deblock = true)
    assertExact(bytes, recon)
    // 8x8 + scaling matrices across B MBs
    val (b8, r8) = H264.encodeCavlcB(64, 48, f, qp = 30,
      bBetween = 2, partitionCycle = true, transform8x8 = true,
      scalingMatrix = true, deblock = true, intraEvery = 4)
    assertExact(b8, r8)
  }

  test("POC lsb wraparound (§8.2.1.1): a 14-picture GOP under a " +
      "4-bit poc lsb reorders correctly across the wrap") {
    val f = grad(14, 32, 32, seed = 8)
    val (bytes, recon) = H264.encodeCavlcB(32, 32, f, qp = 30,
      bBetween = 2, pocLsbBits = 4, forcedMv = Seq((2, 1)))
    assertExact(bytes, recon)
  }

  test("fixture margin for the q_video_fp_dedup_mp4_bslice oracle: " +
      "planted copies at Hamming 0, distinct contents > 8 bits " +
      "apart (the fingerprint is a B picture)") {
    import graft.multimodal.Multimodal
    val corpus = Multimodal.syntheticMp4Corpus(spark, nContents = 30,
      copies = 2, deblock = true, bSlices = true)
    val hashes = Multimodal.videoHashes(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hashes.size == 60, "every B-coded clip must fingerprint")
    (0 until 30).foreach { c =>
      assert(hashes(c.toLong) == hashes(c + 30L), s"content $c copies")
    }
    val distinct = (0 until 30).map(c => hashes(c.toLong))
    for (i <- distinct.indices; j <- distinct.indices if i < j) {
      val ham = java.lang.Long.bitCount(distinct(i) ^ distinct(j))
      assert(ham > 8, s"contents $i/$j only $ham bits apart")
    }
  }

  test("MP4 container carries the B stream; decode equals Annex-B") {
    import graft.multimodal.Mp4
    val f = translated(6, 64, 48, dx = 1, dy = 1)
    val (bytes, recon) = H264.encodeCavlcB(64, 48, f, qp = 26,
      bBetween = 2, searchRange = 2)
    val mp4 = Mp4.fromAnnexB(bytes, 64, 48)
    val a = H264.decodeFrames(Mp4.demuxToAnnexB(mp4))
    assert(a.map(_._3.toSeq) == recon.map(_._3.toSeq))
  }
}
