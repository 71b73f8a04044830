package graft

/**
 * Dev measurement tool (optimization round 20): split the media-family
 * bench cost into CORPUS SYNTHESIS (the fixture encoder running inside
 * the timed query) vs the operator under test (decode + fingerprint +
 * dedup), by timing the corpus materialization alone against the full
 * registry query. Guide §1 — know where the time goes before touching
 * anything.
 */
object ProbeMedia {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-probe-media", cpus)
    import graft.multimodal.Multimodal
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      f // warm-up
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-44s ${runs.min}%7.3f")
    }
    time("corpus_h264_30x3")(
      noop(Multimodal.syntheticH264Corpus(spark, 30, 3).toDF()))
    time("corpus_mp4_30x3_cabac_deblock")(
      noop(Multimodal.syntheticMp4Corpus(spark, 30, 3, cabac = true,
        deblock = true).toDF()))
    time("corpus_mjpeg_30x3")(
      noop(Multimodal.syntheticVideoCorpus(spark, 30, 3).toDF()))
    time("corpus_audio_wav_40x3")(
      noop(Multimodal.syntheticAudioCorpus(spark, 40, 3).toDF()))
    time("corpus_audio_flac_40x3")(
      noop(Multimodal.syntheticAudioCorpusFlac(spark, 40, 3).toDF()))
    time("corpus_image_png_60x3")(
      noop(Multimodal.syntheticImageCorpus(spark, 60, 3).toDF()))
    val qs = SparkEntry.queries
    Seq("q_video_fp_dedup_h264", "q_video_fp_dedup_mp4_deblock",
      "q_video_fp_dedup", "q_audio_fp_dedup", "q_audio_fp_dedup_flac",
      "q_audio_constellation", "q_image_phash_dedup").foreach { n =>
      time(n)(noop(qs(n)(spark, sfDir)))
    }
    spark.stop()
  }
}
