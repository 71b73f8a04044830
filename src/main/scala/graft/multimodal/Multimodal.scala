package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media payload. */
final case class MediaMeta(width: Int, height: Int, sampleRate: Int,
                           nFrames: Int)

/** One media row: opaque bytes + typed metadata. */
final case class MediaRow(media_id: Long, kind: String,
                          bytes: Array[Byte], meta: MediaMeta)

/** Decoded/featurized output row. */
final case class MediaFeatures(media_id: Long, kind: String,
                               width: Int, height: Int,
                               features: Array[Float])

/**
 * Multimodal-column plumbing for a training-data pipeline: image/audio/
 * video as opaque `binary` columns with typed metadata, plus
 * decode / feature-extract / resize / frame-sample stages.
 *
 * The Spark-side plumbing is real and tested: binary columns partition,
 * shuffle and spill like any other; the per-partition batch loop is the
 * idiomatic Scala analog of Python's `mapInPandas` (iterator in, iterator
 * out — no per-row task overhead, bounded memory per batch). The actual
 * codec call is STUBBED — image/audio libraries are not in this
 * container — behind [[Codec.decodeStub]], a deterministic fake keyed on
 * the payload so tests are reproducible. Swap `decodeStub` for a real
 * JNI/javacv codec without touching any of the distributed plumbing.
 *
 * Scale notes: payloads never pass through a shuffle here — featurize is
 * a narrow mapPartitions; downstream joins should carry `media_id` and
 * join features, not bytes. For very large blobs, store pointers
 * (path + offset) in the column and range-read in the partition loop
 * instead of materializing bytes in the row.
 */
object Multimodal {

  /** STUB codec boundary — the only non-real piece, clearly marked. */
  object Codec {
    /**
     * STUB: stands in for a real image/audio decode (e.g. libjpeg /
     * ffmpeg via JNI). Deterministic function of the payload bytes so
     * results are stable across runs and executors.
     */
    def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
      var h = 1125899906842597L // FNV-ish rolling hash of the payload
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      Array.tabulate(dim) { j =>
        val x = h * (j + 1) + 0x9E3779B97F4A7C15L
        // map to [-1, 1) deterministically
        ((x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      }
    }
  }

  /**
   * Feature extraction over the media table: iterator-in/iterator-out per
   * partition (the `mapInPandas` shape), decoding in batches of
   * `batchSize` to bound peak memory per task.
   */
  def featurize(media: Dataset[MediaRow], dim: Int = 16,
                batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real codec would amortize setup
        batch.iterator.map { r =>
          MediaFeatures(r.media_id, r.kind, r.meta.width, r.meta.height,
            Codec.decodeStub(r.bytes, dim))
        }
      }
    }
  }

  /**
   * "Resize": metadata transform + stubbed payload rewrite. The plumbing
   * (projection over binary + struct columns) is the real part.
   */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      // STUB: a real implementation re-encodes bytes; we keep the payload
      // and update typed metadata, which is the schema contract.
      r.copy(meta = r.meta.copy(width = w, height = h))
    }
  }

  /**
   * Frame sampling for video rows: emit one row per sampled frame index —
   * a flatMap (1→N) over the typed Dataset; frame decode itself stubbed.
   */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int)
      : Dataset[(Long, Int, Array[Float])] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      (0 until r.meta.nFrames by everyN).map { f =>
        (r.media_id, f, Codec.decodeStub(r.bytes :+ f.toByte, 8))
      }
    }
  }

  /**
   * Deterministic synthetic media table for tests/demos (no codec libs in
   * the container): payload bytes derived from the id.
   */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val kind = Seq("image", "audio", "video")(
        (id % 3).toInt)
      val bytes = Array.tabulate(128)(j => ((id * 131 + j * 17) % 251).toByte)
      MediaRow(id, kind, bytes,
        MediaMeta(width = 64 + (id % 4).toInt * 32,
          height = 64 + (id % 3).toInt * 32,
          sampleRate = if (kind == "audio") 16000 else 0,
          nFrames = if (kind == "video") 30 else 1))
    }
  }

  /** Column-level helper: payload size histogram — plumbing sanity. */
  def sizeStats(media: DataFrame, bytesCol: String = "bytes"): DataFrame =
    media.agg(
      count(lit(1)).as("n"),
      min(length(col(bytesCol))).as("min_bytes"),
      max(length(col(bytesCol))).as("max_bytes"),
      round(avg(length(col(bytesCol))), 2).as("avg_bytes"))
}
