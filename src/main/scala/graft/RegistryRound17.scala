package graft

import org.apache.spark.sql.functions._

import SparkEntry._

/** Round-17 extensions: native FLAC decode for the audio family
  * (the format LibriSpeech/MLS-class speech corpora actually ship
  * in), PDF and DOCX text extraction for the document family, and
  * EXIF-orientation-normalized image pHash. Each gate shares an
  * existing family's oracle construction — the codec/container
  * agnosticism contract. */
private[graft] object RegistryRound17 {

  private[graft] val entries: Seq[Q] = Seq(

    // FLAC audio near-dup: q_audio_fp_dedup's construction and
    // oracle VERBATIM, but every payload is a real FLAC stream
    // (STREAMINFO + FIXED/CONSTANT subframes + Rice residuals +
    // per-frame stereo-mode choice) decoded by the built-in
    // CRC+MD5-verified graft.multimodal.Flac decoder instead of an
    // external SPI binding. Identical oracle = the losslessness
    // contract: FLAC decode must reproduce the EXACT samples the WAV
    // corpus carries, so the ZCR fingerprints collide at Hamming 0
    // for planted copies exactly as they do for WAV
    Q("q_audio_fp_dedup_flac",
      (s, d) => {
        import graft.multimodal.Multimodal
        Multimodal.audioNearDuplicates(
          Multimodal.syntheticAudioCorpusFlac(s, nContents = 40,
            copies = 3), maxHamming = 4)
      },
      Some("""SELECT a.i AS id_a, b.i AS id_b, 0 AS hamming
              FROM generate_series(0, 119) a(i)
                JOIN generate_series(0, 119) b(i)
                ON a.i < b.i AND a.i % 40 = b.i % 40""")),

    // FLAC constellation matching: q_audio_constellation's planted
    // time-offset fixture and oracle VERBATIM over FLAC payloads —
    // the offset-voting landmark matcher runs on losslessly decoded
    // samples, so the planted pairs land at the same 290 votes and
    // chance pairs at the same ≤24 as the WAV fixture
    Q("q_audio_constellation_flac",
      (s, d) => {
        import graft.multimodal.Multimodal
        Multimodal.audioConstellationMatches(
          Multimodal.syntheticShiftedAudioCorpusFlac(s, nContents = 20,
            nShifted = 10), minVotes = 100)
          .select(col("id_a"), col("id_b"))
      },
      Some("""SELECT i AS id_a, i + 1000 AS id_b
              FROM generate_series(0, 9) t(i)"""))
  )
}
