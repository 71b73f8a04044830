package graft

import org.apache.spark.sql.functions._

import SparkEntry._

/** Round-16 extensions: I-frame-only decoding of mixed I/P/B H.264
  * streams (the real-world GOP shape), plus the round's other
  * additions. */
private[graft] object RegistryRound16 {

  private[graft] val entries: Seq[Q] = Seq(

    // Mixed I/P/B MP4 (round 16): q_video_fp_dedup_mp4's construction
    // and oracle VERBATIM, but every .mp4 now has the real-world GOP
    // shape — each IDR picture is followed by 3 inter (P) filler
    // pictures (H264.insertInterFiller emits conformant all-P_Skip
    // slices under a second CAVLC PPS; the base stream stays CABAC, so
    // this also exercises per-picture PPS switching). Until this round
    // the FIRST P slice threw ("non-I slice_type unsupported") and the
    // whole file degraded to a skip; now inter slices are skipped at
    // the slice header and the IDR pictures — the ones that carry the
    // fingerprint signal — decode display-exact. Identical oracle =
    // the GOP-structure-agnosticism contract, completing the
    // container (MJPEG/MP4/fMP4) × entropy (I_PCM/CAVLC/CABAC) ×
    // filter (deblock on/off) × GOP (all-IDR/mixed) matrix.
    Q("q_video_fp_dedup_mp4_mixed",
      (s, d) => {
        import graft.multimodal.Multimodal
        Multimodal.videoNearDuplicates(
          Multimodal.syntheticMp4Corpus(s, nContents = 30, copies = 3,
            cabac = true, pFiller = 3), maxHamming = 4)
      },
      Some("""SELECT a.i AS id_a, b.i AS id_b, 0 AS hamming
              FROM generate_series(0, 89) a(i)
                JOIN generate_series(0, 89) b(i)
                ON a.i < b.i AND a.i % 30 = b.i % 30""")))
}
