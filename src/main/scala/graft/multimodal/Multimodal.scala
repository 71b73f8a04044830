package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Pluggable video frame decoder — the binding point for inter-frame
 * codecs (H.264/VP9/AV1) that need an external library the default
 * build deliberately does not carry. Implementations decode a video
 * payload into per-frame IMAGE payloads (any ImageIO-decodable
 * encoding); everything downstream of the frame split — per-frame
 * pHashes, sequence matching, offset voting, persisted indexes,
 * streaming ingest — is codec-agnostic and untouched.
 *
 * Selection: set the JVM system property
 * `graft.video.frameDecoder=com.example.FfmpegFrameDecoder` (on a
 * cluster: `spark.driver.extraJavaOptions` AND
 * `spark.executor.extraJavaOptions`, with the binding jar on the
 * executor classpath) to a class with a no-arg constructor. Unset, the
 * JDK-only [[FrameDecoder.Auto]] sniffing dispatch is used (MJPEG, or
 * the built-in partial H.264 I_PCM path for Annex-B payloads) — the
 * default build stays dependency-free and green. Resolution is
 * memoized per JVM per class name (reflection once, not per row); a
 * misconfigured class fails fast with the class name in the error.
 */
trait FrameDecoder extends Serializable {
  /** Per-frame image payloads, in display order. */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]]
}

object FrameDecoder {
  val PropKey = "graft.video.frameDecoder"

  /** The JDK-only MJPEG path: walk concatenated baseline JPEGs. */
  object Mjpeg extends FrameDecoder {
    def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
      Multimodal.Codec.splitMjpegFrames(bytes)
  }

  /** The built-in H.264 intra path (Annex-B; I/IDR slices; I_PCM,
    * Intra_4x4 and Intra_16x16 macroblocks with CAVLC entropy coding
    * — see [[graft.multimodal.H264]]/[[H264Mb]] for the exact,
    * honestly-stated scope; CABAC and inter-predicted P/B streams
    * still need an external binding via [[PropKey]]). The name keeps
    * the original I_PCM floor for source stability; the decode
    * surface has grown past it. */
  object H264IPcm extends FrameDecoder {
    def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
      H264.framesAsPng(bytes)
  }

  /** The MP4 (ISO-BMFF) path: demux avcC + length-prefixed samples
    * to Annex-B, then the built-in H.264 intra decode. */
  object Mp4File extends FrameDecoder {
    def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
      H264.framesAsPng(Mp4.demuxToAnnexB(bytes))
  }

  /** The default: container-sniffing dispatch — `ftyp` → MP4 demux →
    * H.264, Annex-B start code → H.264, else MJPEG. A corpus can mix
    * containers; the sniff reads ≤16 leading bytes and is
    * deterministic per payload, so fingerprints stay pure functions
    * of the bytes. */
  object Auto extends FrameDecoder {
    def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
      if (Mp4.looksLikeMp4(bytes)) Mp4File.frames(bytes)
      else if (H264.looksLikeAnnexB(bytes)) H264IPcm.frames(bytes)
      else Mjpeg.frames(bytes)
  }

  @volatile private var cached: (String, FrameDecoder) = ("", Auto)

  /** Resolve the configured decoder (memoized per class name). */
  def resolve(): FrameDecoder = sys.props.get(PropKey) match {
    case None | Some("") => Auto
    case Some(cls) =>
      val c = cached
      if (c._1 == cls) c._2
      else {
        val d =
          try Class.forName(cls).getDeclaredConstructor()
            .newInstance().asInstanceOf[FrameDecoder]
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"$PropKey=$cls is not a loadable FrameDecoder", e)
          }
        cached = (cls, d)
        d
      }
  }
}

/**
 * Pluggable AUDIO decode — the [[FrameDecoder]] SPI's twin for the
 * audio family: one binding point turns an opaque audio payload into
 * `(sampleRate, mono samples in [-1, 1])`; everything downstream —
 * RMS features, ZCR fingerprints, constellation landmarks, persisted
 * indexes, streaming ingest — is codec-agnostic and untouched.
 *
 * Built-in paths: WAV/PCM (JDK `javax.sound.sampled`) and FLAC
 * ([[Flac]] — lossless, so the in-stream CRCs + MD5 signature verify
 * every decode; see that module for why FLAC is exempt from the
 * constants-are-never-invented rule). Lossy formats (MP3/AAC/Ogg
 * Vorbis) are NOT decoded natively and never will be faked: their
 * Huffman codebooks and synthesis windows ARE the bitstream — a
 * from-memory transcription decodes real files to garbage while
 * appearing to work (SURVEY §8). Instead they fail
 * with a NAMED error that names this binding point: set the JVM
 * system property `graft.audio.decoder=com.example.Mp3Decoder` (on a
 * cluster: `spark.driver.extraJavaOptions` AND
 * `spark.executor.extraJavaOptions`, binding jar on the executor
 * classpath) to a class with a no-arg constructor. Resolution is
 * memoized per JVM per class name; a misconfigured class fails fast
 * with the class name in the error. The degrade-don't-fail `Try` in
 * the audio entry points turns named errors into row skips.
 */
trait AudioDecoder extends Serializable {
  /** (sampleRate, mono samples in [-1, 1]) decoded from the payload. */
  def samples(bytes: Array[Byte]): (Int, Array[Double])
}

object AudioDecoder {
  val PropKey = "graft.audio.decoder"

  /** The JDK-only WAV/PCM path (16-bit mono little-endian). */
  object Wav extends AudioDecoder {
    def samples(bytes: Array[Byte]): (Int, Array[Double]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
          !fmt.isBigEndian,
          s"expected 16-bit mono little-endian PCM, got $fmt")
        val raw = in.readAllBytes()
        val n = raw.length / 2
        require(n > 0, "empty audio payload")
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          out(i) = ((raw(2 * i) & 0xFF) | (raw(2 * i + 1) << 8))
            .toShort / 32768.0
          i += 1
        }
        (fmt.getSampleRate.toInt, out)
      } finally in.close()
    }
  }

  /** Container sniff for the named-error message (≤16 leading
    * bytes, deterministic per payload). */
  private def formatName(b: Array[Byte]): String =
    if (b.length < 4) "truncated payload"
    else if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') "MP3 (ID3 tag)"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xF6) == 0xF0)
      "AAC (ADTS sync)"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0)
      "MP3 (frame sync)"
    else if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S')
      "Ogg"
    else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' &&
      b(6) == 'y' && b(7) == 'p') "MP4/M4A container"
    else "unrecognized format"

  private[multimodal] def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
      b(11) == 'E'

  /** The default: WAV payloads decode through [[Wav]], FLAC through
    * [[Flac]] (CRC+MD5-verified lossless decode); anything else is a
    * NAMED error pointing at [[PropKey]] — never a fake decode. */
  object Auto extends AudioDecoder {
    def samples(bytes: Array[Byte]): (Int, Array[Double]) =
      if (looksLikeWav(bytes)) Wav.samples(bytes)
      else if (Flac.looksLikeFlac(bytes)) Flac.samples(bytes)
      else throw new IllegalArgumentException(
        s"compressed audio (${formatName(bytes)}) needs an external " +
          s"AudioDecoder binding — set -D$PropKey=<class>; the " +
          "built-in paths are WAV/PCM and FLAC only")
  }

  @volatile private var cached: (String, AudioDecoder) = ("", Auto)

  /** Resolve the configured decoder (memoized per class name). */
  def resolve(): AudioDecoder = sys.props.get(PropKey) match {
    case None | Some("") => Auto
    case Some(cls) =>
      val c = cached
      if (c._1 == cls) c._2
      else {
        val d =
          try Class.forName(cls).getDeclaredConstructor()
            .newInstance().asInstanceOf[AudioDecoder]
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"$PropKey=$cls is not a loadable AudioDecoder", e)
          }
        cached = (cls, d)
        d
      }
  }
}

/**
 * Pluggable IMAGE decode — completes the per-modality SPI trio
 * ([[FrameDecoder]] video, [[AudioDecoder]] audio): one binding
 * point turns an opaque image payload into a `BufferedImage`;
 * everything downstream — RMS/luma features, DCT pHash, resize,
 * near-dup blocking — is format-agnostic and untouched.
 *
 * The built-in path is JDK ImageIO (PNG/JPEG/BMP/GIF). Modern web
 * formats (WebP/AVIF/HEIC/JPEG-XL) are not JDK-decodable; they fail
 * with a NAMED error that sniffs the container and names this
 * binding point — set `graft.image.decoder=com.example.WebpDecoder`
 * (a no-arg-constructor class; on a cluster, both driver and
 * executor extraJavaOptions + the jar on the executor classpath).
 * Resolution is memoized per JVM per class name; the
 * degrade-don't-fail `Try` in the image entry points turns named
 * errors into row skips.
 */
trait ImageDecoder extends Serializable {
  /** Decoded image for the payload; implementations throw on
    * undecodable bytes (callers treat any throw as a skip). */
  def image(bytes: Array[Byte]): java.awt.image.BufferedImage
}

object ImageDecoder {
  val PropKey = "graft.image.decoder"

  /** The JDK path: whatever ImageIO's installed readers accept. */
  object ImageIo extends ImageDecoder {
    def image(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "payload is not a decodable image")
      img
    }
  }

  /** Container sniff for the named-error message (≤16 leading
    * bytes, deterministic per payload). */
  private def modernFormat(b: Array[Byte]): Option[String] =
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' &&
      b(11) == 'P') Some("WebP")
    else if (b.length >= 12 && b(4) == 'f' && b(5) == 't' &&
      b(6) == 'y' && b(7) == 'p') {
      val brand = new String(b, 8, 4, "ISO-8859-1")
      if (brand.startsWith("avi")) Some("AVIF")
      else if (brand.startsWith("hei") || brand.startsWith("hev"))
        Some("HEIC")
      else None
    }
    else if (b.length >= 2 && (b(0) & 0xFF) == 0xFF &&
      (b(1) & 0xFF) == 0x0A) Some("JPEG XL")
    else None

  /** The default: modern-format payloads fail with a NAMED error
    * pointing at [[PropKey]]; everything else tries ImageIO. */
  object Auto extends ImageDecoder {
    def image(bytes: Array[Byte]): java.awt.image.BufferedImage =
      modernFormat(bytes) match {
        case Some(fmt) => throw new IllegalArgumentException(
          s"$fmt image needs an external ImageDecoder binding — set " +
            s"-D$PropKey=<class>; the built-in path is JDK ImageIO " +
            "(PNG/JPEG/BMP/GIF)")
        case None => ImageIo.image(bytes)
      }
  }

  @volatile private var cached: (String, ImageDecoder) = ("", Auto)

  /** Resolve the configured decoder (memoized per class name). */
  def resolve(): ImageDecoder = sys.props.get(PropKey) match {
    case None | Some("") => Auto
    case Some(cls) =>
      val c = cached
      if (c._1 == cls) c._2
      else {
        val d =
          try Class.forName(cls).getDeclaredConstructor()
            .newInstance().asInstanceOf[ImageDecoder]
          catch {
            case e: Exception => throw new IllegalArgumentException(
              s"$PropKey=$cls is not a loadable ImageDecoder", e)
          }
        cached = (cls, d)
        d
      }
  }
}

/** Typed metadata carried alongside an opaque media payload. */
final case class MediaMeta(width: Int, height: Int, sampleRate: Int,
                           nFrames: Int)

/** One media row: opaque bytes + typed metadata. */
final case class MediaRow(media_id: Long, kind: String,
                          bytes: Array[Byte], meta: MediaMeta)

/** Decoded/featurized output row. The two shape fields are per-kind:
  * image → (decoded pixel width, height); audio → (decoded sample rate,
  * decoded sample count); video → (decoded frame width, height). */
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
 * out — no per-row task overhead, bounded memory per batch).
 *
 * Codec status — every modality decodes REAL payloads with the JDK
 * alone, no external dependency:
 *  - IMAGE: `javax.imageio` (PNG/JPEG/BMP/GIF) decodes actual pixels in
 *    [[Codec.decodeImage]] / re-encodes in [[Codec.resizeImage]];
 *  - AUDIO: `javax.sound.sampled` (WAV/PCM) decodes actual samples in
 *    [[Codec.decodeAudio]];
 *  - VIDEO: MJPEG (concatenated baseline JPEG frames — a real
 *    interchange format) splits on SOI/EOI markers and decodes every frame
 *    through ImageIO in [[Codec.decodeVideo]] / [[Codec.splitMjpegFrames]].
 * [[syntheticMedia]] generates real PNG / WAV / MJPEG payloads. H.264
 * decodes natively for I/P/B slices under CAVLC (and I slices under
 * CABAC), and FLAC decodes natively with CRC-8/CRC-16/MD5
 * verification — neither needs an SPI. The remaining documented
 * boundaries each have an SPI escape hatch: CABAC-inter-only H.264
 * plus other inter-frame codecs (VP9, AV1) need an ffmpeg/javacv
 * binding through the [[FrameDecoder]] SPI
 * (`graft.video.frameDecoder`), and LOSSY compressed audio
 * (MP3/AAC/Ogg) a binding through the [[AudioDecoder]] SPI
 * (`graft.audio.decoder`) — every operator of the respective family
 * (featurize, fingerprint dedup, constellation/sequence matching,
 * persisted indexes, streaming ingest) decodes through its SPI.
 * Unset, the JDK-only paths run (MJPEG + native H.264; WAV/PCM +
 * native FLAC) and the build stays dependency-free; lossy compressed
 * audio fails with a NAMED error rather than a fake decode.
 * MultimodalSpec proves both plumbings with fake external decoders.
 *
 * Scale notes: payloads never pass through a shuffle here — featurize is
 * a narrow mapPartitions; downstream joins should carry `media_id` and
 * join features, not bytes. For very large blobs, store pointers
 * (path + offset) in the column and range-read in the partition loop
 * instead of materializing bytes in the row.
 */
object Multimodal {

  /** Codec entry points — all real, JDK-only: ImageIO (images, MJPEG
    * frames), javax.sound.sampled (WAV audio). */
  object Codec {

    /**
     * REAL image decode: `javax.imageio` → pixels → a `dim`-length
     * feature vector of per-vertical-strip mean luminance (Rec. 601
     * weights), normalized to [0, 1]. Deterministic in the pixel data —
     * independent of how the payload was encoded.
     *
     * @return (decodedWidth, decodedHeight, features)
     */
    def decodeImage(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
      val img = ImageDecoder.resolve().image(bytes)
      val w = img.getWidth
      val h = img.getHeight
      val feats = Array.tabulate(dim) { j =>
        val x0 = j * w / dim
        val x1 = math.max(x0 + 1, (j + 1) * w / dim)
        var sum = 0.0
        var n = 0
        var x = x0
        while (x < x1) {
          var y = 0
          while (y < h) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xFF) * 0.299 +
              ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114
            n += 1
            y += 1
          }
          x += 1
        }
        (sum / n / 255.0).toFloat
      }
      (w, h, feats)
    }

    /**
     * 64-bit perceptual image hash (DCT pHash — Zauner 2010,
     * "Implementation and Benchmarking of Perceptual Image Hash
     * Functions", public): decode → 32×32 block-mean luminance grid
     * (area averaging over the ORIGINAL pixels — no interpolation-
     * dependent resampling, so the hash is a pure function of the
     * pixel data) → 2D DCT-II → the 63 lowest-frequency coefficients
     * (8×8 block minus DC) thresholded at their median → packed bits.
     * Same pixels under different containers (PNG vs BMP) hash
     * identically; small perturbations move few bits, so Hamming
     * distance is the near-dup metric — the image analog of SimHash,
     * sharing its Manku blocking downstream.
     */
    def imagePHash(bytes: Array[Byte]): Long = {
      val raw = ImageDecoder.resolve().image(bytes)
      // EXIF-orientation normalization (round 17): a rotated
      // re-upload (orientation 3/6/8 — most phone photos) must hash
      // WITH its tag applied, or it lands far from its original.
      // ImageIO ignores the tag; Exif.orientation walks it out of
      // the JPEG APP1 / PNG eXIf block, defaulting to 1 on anything
      // unparseable.
      val img = Exif.normalize(raw, Exif.orientation(bytes))
      val w = img.getWidth
      val h = img.getHeight
      val n = 32
      // block-mean luminance grid
      val grid = Array.ofDim[Double](n, n)
      var i = 0
      while (i < n) {
        val y0 = i * h / n
        val y1 = math.max(y0 + 1, (i + 1) * h / n)
        var j = 0
        while (j < n) {
          val x0 = j * w / n
          val x1 = math.max(x0 + 1, (j + 1) * w / n)
          var sum = 0.0
          var cnt = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xFF) * 0.299 +
                ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114
              cnt += 1
              x += 1
            }
            y += 1
          }
          grid(i)(j) = sum / cnt
          j += 1
        }
        i += 1
      }
      // separable 2D DCT-II; only the first 8 output rows/cols needed
      val cos = Array.tabulate(8, n)((u, x) =>
        math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)))
      val rows = Array.ofDim[Double](8, n) // DCT over i for u < 8
      var u = 0
      while (u < 8) {
        var j = 0
        while (j < n) {
          var acc = 0.0
          var x = 0
          while (x < n) { acc += grid(x)(j) * cos(u)(x); x += 1 }
          rows(u)(j) = acc
          j += 1
        }
        u += 1
      }
      val coeffs = new Array[Double](63)
      u = 0
      var k = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) {
            var acc = 0.0
            var x = 0
            while (x < n) { acc += rows(u)(x) * cos(v)(x); x += 1 }
            coeffs(k) = acc
            k += 1
          }
          v += 1
        }
        u += 1
      }
      val sortedC = coeffs.sorted
      val median = (sortedC(31) + sortedC(32)) / 2.0
      var bits = 0L
      k = 0
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) {
            if (coeffs(k) > median) bits |= 1L << (u * 8 + v - 1)
            k += 1
          }
          v += 1
        }
        u += 1
      }
      bits
    }

    /** REAL image resize: decode, bilinear-draw into the target raster,
      * re-encode as PNG. */
    def resizeImage(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = ImageDecoder.resolve().image(bytes)
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
      } finally g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      out.toByteArray
    }

    /**
     * REAL audio decode: JDK `javax.sound.sampled` (WAV container, PCM
     * 16-bit) → samples in [-1, 1] → a `dim`-length feature vector of
     * per-segment RMS energy. Deterministic in the sample data.
     *
     * @return (sampleRate, nSamples, features)
     */
    /** Shared sample decode, routed through the [[AudioDecoder]] SPI:
      * `(sampleRate, samples in [-1,1])` — WAV/PCM built in,
      * compressed formats via the `graft.audio.decoder` binding. */
    private def pcmSamples(bytes: Array[Byte]): (Int, Array[Double]) =
      AudioDecoder.resolve().samples(bytes)

    def decodeAudio(bytes: Array[Byte], dim: Int): (Int, Int, Array[Float]) = {
      val (sr, samples) = pcmSamples(bytes)
      val n = samples.length
      val feats = Array.tabulate(dim) { j =>
        val s0 = j * n / dim
        val s1 = math.max(s0 + 1, (j + 1) * n / dim)
        var acc = 0.0
        var k = s0
        while (k < s1) { acc += samples(k) * samples(k); k += 1 }
        math.sqrt(acc / (s1 - s0)).toFloat
      }
      (sr, n, feats)
    }

    /**
     * 64-bit audio fingerprint: the temporal ZERO-CROSSING-RATE
     * profile — 65 equal time segments, bit i set when segment i
     * crosses zero more often than segment i+1. ZCR tracks dominant
     * frequency, so the bit pattern is the clip's coarse melodic/
     * spectral contour: identical samples under any container hash
     * identically, small noise moves few bits (adjacent-segment
     * comparisons only flip where the contour is near-flat), and
     * Hamming distance is the near-dup metric — the audio member of
     * the SimHash/pHash family, sharing their Manku blocking.
     *
     * Deliberately simple: this temporal profile is robust to
     * gain/offset changes but NOT to time-shift or resampling — for
     * those, use the spectral-peak constellation path
     * ([[audioConstellation]] / [[Multimodal
     * .audioConstellationMatches]], the Wang 2003 Shazam construction)
     * whose landmark hashes are shift-invariant by design. Both share
     * the fingerprint-once → block → verify distributed shape.
     */
    def audioFingerprint(bytes: Array[Byte]): Long = {
      val (_, samples) = pcmSamples(bytes)
      val n = samples.length
      val segs = 65
      val zcr = new Array[Int](segs)
      var j = 0
      while (j < segs) {
        // clamp to the sample count: a clip shorter than the segment
        // grid (even 1 sample) yields empty/degenerate segments with
        // zcr 0, never an out-of-bounds read
        val s0 = math.min(math.max(j * n / segs, 1), n)
        val s1 = math.min(math.max(s0 + 1, (j + 1) * n / segs), n)
        var c = 0
        var k = s0
        while (k < s1) {
          if ((samples(k - 1) < 0) != (samples(k) < 0)) c += 1
          k += 1
        }
        zcr(j) = c
        j += 1
      }
      var bits = 0L
      var i = 0
      while (i < 64) {
        if (zcr(i) > zcr(i + 1)) bits |= 1L << i
        i += 1
      }
      bits
    }

    /** In-place iterative radix-2 Cooley–Tukey FFT; length must be a
      * power of two. Plain-JDK, allocation-free beyond the caller's
      * two arrays — fast enough for fingerprinting frames (512-point
      * spectra), not a general DSP library. */
    private def fft(re: Array[Double], im: Array[Double]): Unit = {
      val n = re.length
      // bit-reversal permutation
      var j = 0
      var i = 1
      while (i < n) {
        var bit = n >> 1
        while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
        j |= bit
        if (i < j) {
          val tr = re(i); re(i) = re(j); re(j) = tr
          val ti = im(i); im(i) = im(j); im(j) = ti
        }
        i += 1
      }
      var len = 2
      while (len <= n) {
        val ang = -2.0 * math.Pi / len
        val wr = math.cos(ang)
        val wi = math.sin(ang)
        var base = 0
        while (base < n) {
          var cr = 1.0
          var ci = 0.0
          var k = 0
          while (k < len / 2) {
            val ur = re(base + k); val ui = im(base + k)
            val vr0 = re(base + k + len / 2)
            val vi0 = im(base + k + len / 2)
            val vr = vr0 * cr - vi0 * ci
            val vi = vr0 * ci + vi0 * cr
            re(base + k) = ur + vr; im(base + k) = ui + vi
            re(base + k + len / 2) = ur - vr
            im(base + k + len / 2) = ui - vi
            val ncr = cr * wr - ci * wi
            ci = cr * wi + ci * wr
            cr = ncr
            k += 1
          }
          base += len
        }
        len <<= 1
      }
    }

    /**
     * Spectral-peak constellation landmarks (Wang 2003, the Shazam
     * construction — public method): Hann-windowed `frameSize`-point
     * STFT at `hop`-sample stride, the strongest spectral bin per
     * frame (silent frames skipped), each anchor peak paired with the
     * next `fanout` frames' peaks into `(f1, f2, Δt)` landmark hashes.
     * Returns `(anchorFrame, hash)` pairs.
     *
     * This is the time-shift-robust upgrade over [[audioFingerprint]]:
     * a delayed copy re-emits the SAME hash set (the hash encodes only
     * frequencies and the frame delta), just at shifted anchor times —
     * matching groups by hash and votes on the anchor-time OFFSET, so
     * a constant shift lines every landmark up at one offset. The ZCR
     * profile, whose segment grid moves with the shift, cannot see
     * such a copy at any useful Hamming radius.
     */
    def audioConstellation(bytes: Array[Byte], frameSize: Int = 512,
                           hop: Int = 256, fanout: Int = 5)
        : Array[(Int, Long)] = {
      require((frameSize & (frameSize - 1)) == 0,
        s"frameSize must be a power of two, got $frameSize")
      // the landmark hash packs (peak1 << 15 | peak2 << 6 | k): peak
      // bins reach frameSize/2 - 1 (9 bits ⇒ frameSize ≤ 1024) and k
      // reaches fanout (6 bits ⇒ fanout ≤ 63); beyond either, fields
      // bleed into each other and unrelated landmarks collide silently
      require(frameSize <= 1024,
        s"frameSize > 1024 overflows the 9-bit peak field, got $frameSize")
      require(fanout <= 63 && fanout >= 1,
        s"fanout must be in [1, 63] (6-bit delta field), got $fanout")
      val peaks = spectralPeaks(bytes, frameSize, hop)
      val nFrames = peaks.length
      val out = Array.newBuilder[(Int, Long)]
      var a = 0
      while (a < nFrames) {
        if (peaks(a) >= 0) {
          var k = 1
          while (k <= fanout && a + k < nFrames) {
            if (peaks(a + k) >= 0)
              out += ((a, (peaks(a).toLong << 15) |
                (peaks(a + k).toLong << 6) | k.toLong))
            k += 1
          }
        }
        a += 1
      }
      out.result()
    }

    /** Strongest spectral bin per Hann-windowed STFT frame (−1 =
      * silent frame) — the shared peak extractor behind both
      * constellation hash families. */
    private[multimodal] def spectralPeaks(bytes: Array[Byte],
                                          frameSize: Int,
                                          hop: Int): Array[Int] = {
      val (_, samples) = pcmSamples(bytes)
      val nFrames = math.max(0, (samples.length - frameSize) / hop + 1)
      val peaks = new Array[Int](nFrames) // bin index, -1 = silent
      val re = new Array[Double](frameSize)
      val im = new Array[Double](frameSize)
      var f = 0
      while (f < nFrames) {
        var i = 0
        while (i < frameSize) {
          val w = 0.5 * (1 - math.cos(2 * math.Pi * i / (frameSize - 1)))
          re(i) = samples(f * hop + i) * w
          im(i) = 0.0
          i += 1
        }
        fft(re, im)
        var best = -1
        var bestMag = 1e-6 // silence floor
        var b = 1
        while (b < frameSize / 2) {
          val m = re(b) * re(b) + im(b) * im(b)
          if (m > bestMag) { bestMag = m; best = b }
          b += 1
        }
        peaks(f) = best
        f += 1
      }
      peaks
    }

    /**
     * RATE-INVARIANT constellation landmarks — the tempo/pitch-robust
     * complement to [[audioConstellation]], whose absolute-bin hashes
     * a resampled copy provably breaks (every peak bin scales by the
     * rate, every frame delta by its inverse). Construction (the
     * standard ratio-hash move over Wang 2003's voting core):
     *
     *  1. run-length-compress the per-frame peak sequence into EVENTS
     *     `(ordinal, bin)`, silent runs dropped — a resampled copy
     *     has the SAME event sequence (times scale, the ORDER does
     *     not), and a delayed copy's leading silence vanishes
     *     entirely, so the event ordinal is the rate-invariant time
     *     axis;
     *  2. hash event QUADRUPLES `(i, i+j2, i+j3, i+j4)` on the three
     *     quantized frequency ratios between consecutive members
     *     (pitch-scaling cancels in the ratio; 4 steps per ln-unit
     *     absorbs the ±1-bin rounding a resample introduces) plus the
     *     `(j2, j3, j4)` pattern — three ratios because two were
     *     measured to leave chance collisions within one vote of the
     *     planted level on the fixture corpus, and the third
     *     multiplies chance entropy by ~17× while costing ~40%
     *     planted recall;
     *  3. anchors are emitted as the EVENT ORDINAL, so a rate-r copy
     *     lines its votes up at ordinal offset 0 (a trimmed copy at
     *     the constant ordinal shift) through the unchanged
     *     [[Multimodal.offsetVotedPairs]] core.
     *
     * Trade documented: frequency-ratio hashes carry less entropy
     * than absolute-bin pairs, so chance collisions vote more — the
     * separation comes from the vote CONCENTRATION at one ordinal
     * offset, and `minVotes` should sit well above the diffuse chance
     * level (MultimodalSpec pins the planted/chance margin). Gap
     * ratios were measured and rejected: at the ~4-frame run lengths
     * real segment structure produces, integer rounding flips the
     * ratio for most triples, costing recall without adding
     * discrimination.
     */
    /** Run-length-compressed spectral-peak EVENT bins (silent runs
      * dropped) — the rate-invariant sequence both the ratio-hash
      * candidate stage and its exact verify stage read. Runs shorter
      * than `minRun` frames are boundary flicker (a window straddling
      * two tones), not events: they appear in one encoding of a clip
      * and not its resampled twin, silently shifting every downstream
      * ordinal — measured as the 0.39 match_frac on a true copy before
      * the filter. */
    def eventBins(bytes: Array[Byte], frameSize: Int = 512,
                  hop: Int = 256, minRun: Int = 2): Array[Int] = {
      val peaks = spectralPeaks(bytes, frameSize, hop)
      val evF = Array.newBuilder[Int]
      var i = 0
      var last = Int.MinValue // merge equal neighbors a dropped flicker run exposed
      while (i < peaks.length) {
        var j = i
        while (j < peaks.length && peaks(j) == peaks(i)) j += 1
        if (peaks(i) >= 0 && j - i >= minRun && peaks(i) != last) {
          evF += peaks(i)
          last = peaks(i)
        }
        i = j
      }
      evF.result()
    }

    /** Exact verify for ratio-hash candidates: best-alignment match
      * fraction between two clips' consecutive-event ln-bin-ratio
      * sequences. A resampled copy's ratio sequence is element-wise
      * equal up to ±1-bin rounding (`tol` absorbs it); unrelated
      * clips agree only by chance. Scans ordinal offsets in
      * [-maxLag, maxLag] — the voting stage already established
      * near-alignment, the scan just absorbs leading-event flicker.
      * Hits normalize by the OVERLAP at each offset, floored at
      * (minLen - maxLag): a true copy aligned at a nonzero lag can
      * still reach 1.0 (full-min-length normalization capped it at
      * 1 - |o|/minLen), while the floor keeps a tiny tail overlap
      * from inflating a chance pair's score. */
    def ratioSequenceMatchFrac(a: Array[Int], b: Array[Int],
                               tol: Double = 0.15,
                               maxLag: Int = 4): Double = {
      def deltas(xs: Array[Int]): Array[Double] = {
        val d = new Array[Double](math.max(0, xs.length - 1))
        var i = 0
        while (i < d.length) {
          d(i) = math.log(xs(i + 1).toDouble / xs(i)); i += 1
        }
        d
      }
      val da = deltas(a); val db = deltas(b)
      if (da.isEmpty || db.isEmpty) return 0.0
      var best = 0.0
      var o = -maxLag
      while (o <= maxLag) {
        var hits = 0
        var n = 0
        var i = math.max(0, -o)
        while (i < da.length && i + o < db.length) {
          if (i + o >= 0) {
            n += 1
            if (math.abs(da(i) - db(i + o)) <= tol) hits += 1
          }
          i += 1
        }
        // normalize by THIS offset's overlap n — a tiny-overlap floor
        // is unnecessary here because the lag window bounds the
        // shrinkage: n >= min(|da|,|db|) - maxLag at every offset, so
        // an overlap can never get small enough to inflate a chance
        // pair unless the sequences themselves are ~maxLag short
        if (n > 0) best = math.max(best, hits.toDouble / n)
        o += 1
      }
      best
    }

    def audioConstellationRatio(bytes: Array[Byte], frameSize: Int = 512,
                                hop: Int = 256, eventFanout: Int = 3)
        : Array[(Int, Long)] = {
      require((frameSize & (frameSize - 1)) == 0,
        s"frameSize must be a power of two, got $frameSize")
      require(eventFanout >= 2 && eventFanout <= 8,
        s"eventFanout must be in [2, 8], got $eventFanout")
      val fs = eventBins(bytes, frameSize, hop)
      val out = Array.newBuilder[(Int, Long)]
      def q(x: Double): Long =
        math.max(0L, math.min(255L, math.round(x * 4.0) + 128L))
      var i = 0
      while (i < fs.length) {
        var j2 = 1
        while (j2 <= eventFanout - 1 && i + j2 < fs.length) {
          var j3 = j2 + 1
          while (j3 <= eventFanout && i + j3 < fs.length) {
            var j4 = j3 + 1
            while (j4 <= eventFanout + 1 && i + j4 < fs.length) {
              val h = (j2.toLong << 32) | (j3.toLong << 28) |
                (j4.toLong << 24) |
                (q(math.log(fs(i + j2).toDouble / fs(i))) << 16) |
                (q(math.log(fs(i + j3).toDouble / fs(i + j2))) << 8) |
                q(math.log(fs(i + j4).toDouble / fs(i + j3)))
              out += ((i, h))
              j4 += 1
            }
            j3 += 1
          }
          j2 += 1
        }
        i += 1
      }
      out.result()
    }

    /**
     * REAL video decode for MJPEG payloads (Motion JPEG: concatenated
     * baseline JPEG frames — an actual interchange format, not an
     * invented container). Frames are split by WALKING the JPEG
     * structure, not by scanning for naked FFD8/FFD9 byte pairs:
     * marker-segment payloads (APPn/EXIF/COM/DQT/DHT) are NOT
     * FF-escaped and may contain embedded thumbnails with their own
     * SOI/EOI, so each segment's 2-byte length is honored and skipped;
     * only inside entropy-coded scan data (after SOS), where literal FF
     * is escaped as FF00/RSTn, does EOI terminate the frame.
     *
     * Inter-frame-compressed codecs (H.264/VP9/AV1) still need an
     * external library — that remains the documented boundary; swap
     * this splitter for an ffmpeg/javacv binding without touching the
     * distributed plumbing.
     *
     * @return per-frame payloads, in order
     */
    def splitMjpegFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
      def u8(i: Int): Int = bytes(i) & 0xFF
      val frames = Seq.newBuilder[Array[Byte]]
      var i = 0
      while (i < bytes.length - 1) {
        if (u8(i) == 0xFF && u8(i + 1) == 0xD8) { // SOI: walk one frame
          val start = i
          i += 2
          var inScan = false
          var done = false
          while (!done && i < bytes.length - 1) {
            if (!inScan) {
              // marker sequence: FF <code> [len payload]
              if (u8(i) != 0xFF) { done = true } // corrupt: abandon frame
              else u8(i + 1) match {
                case 0xD9 => // EOI with no scan (degenerate but legal)
                  frames += java.util.Arrays.copyOfRange(bytes, start, i + 2)
                  i += 2; done = true
                case c if c >= 0xD0 && c <= 0xD7 => i += 2 // RSTn: bare
                case 0x01 => i += 2 // TEM: bare marker
                // fill byte: a padding FF BEFORE the real marker — advance
                // one byte so the scanner re-examines from the next FF
                // (advancing 2 would land ON the marker code byte and fail
                // the u8(i) == 0xFF check, abandoning the frame)
                case 0xFF => i += 1
                // every remaining marker is length-prefixed; a payload
                // truncated inside the 2-byte length field drops the
                // frame (the contract for any truncation) instead of
                // reading past the array
                case _ if i + 3 >= bytes.length =>
                  i = bytes.length; done = true
                case 0xDA => // SOS: skip header, enter entropy data
                  val len = (u8(i + 2) << 8) | u8(i + 3)
                  i += 2 + len
                  inScan = true
                case _ => // APPn/COM/DQT/DHT/SOFn...: length-prefixed,
                  // payload may contain ANYTHING (EXIF thumbnails!)
                  val len = (u8(i + 2) << 8) | u8(i + 3)
                  i += 2 + len
              }
            } else {
              // entropy-coded data: FF is escaped (FF00) or RSTn; any
              // other FF <code> ends the scan — EOI ends the frame
              if (u8(i) == 0xFF && u8(i + 1) == 0xD9) {
                frames += java.util.Arrays.copyOfRange(bytes, start, i + 2)
                i += 2; done = true
              } else if (u8(i) == 0xFF && u8(i + 1) != 0x00 &&
                  !(u8(i + 1) >= 0xD0 && u8(i + 1) <= 0xD7)) {
                inScan = false // another marker (e.g. next SOS/DNL)
              } else i += 1
            }
          }
          if (!done) i = bytes.length // truncated trailing frame: drop
        } else i += 1
      }
      frames.result()
    }

    /**
     * REAL video featurization: split MJPEG frames, decode each with
     * ImageIO, average the per-strip luminance features across frames.
     *
     * @return (frameWidth, frameHeight, nFrames, features)
     */
    /** Per-frame image payloads through the CONFIGURED decoder —
      * [[FrameDecoder.Mjpeg]] (JDK-only) unless the
      * `graft.video.frameDecoder` property names an external binding
      * (e.g. ffmpeg/javacv for H.264). Every video operator routes
      * through here, so a binding lights up the whole family without
      * touching the distributed plumbing. */
    def videoFrames(bytes: Array[Byte]): Seq[Array[Byte]] =
      FrameDecoder.resolve().frames(bytes)

    def decodeVideo(bytes: Array[Byte], dim: Int): (Int, Int, Int, Array[Float]) = {
      val frames = videoFrames(bytes)
      require(frames.nonEmpty, "payload contains no video frames")
      val decoded = frames.map(decodeImage(_, dim))
      val (w, h, _) = decoded.head
      val acc = new Array[Float](dim)
      decoded.foreach { case (_, _, f) =>
        var j = 0
        while (j < dim) { acc(j) += f(j); j += 1 }
      }
      (w, h, frames.length, acc.map(_ / frames.length))
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
          r.kind match {
            case "image" =>
              // REAL decode: width/height come from the decoded pixels,
              // not the metadata — proves the payload is an image
              val (w, h, feats) = Codec.decodeImage(r.bytes, dim)
              MediaFeatures(r.media_id, r.kind, w, h, feats)
            case "audio" =>
              // REAL decode: sample rate / count come from the decoded
              // WAV, not the metadata
              val (sr, n, feats) = Codec.decodeAudio(r.bytes, dim)
              MediaFeatures(r.media_id, r.kind, sr, n, feats)
            case "video" =>
              // REAL decode: frame dims come from the decoded JPEGs
              val (w, h, _, feats) = Codec.decodeVideo(r.bytes, dim)
              MediaFeatures(r.media_id, r.kind, w, h, feats)
            case other =>
              // fail fast with the offending kind — a silent fallback
              // would hand an image payload to the wrong codec
              throw new IllegalArgumentException(
                s"unknown media kind '$other' for media_id ${r.media_id}")
          }
        }
      }
    }
  }

  /**
   * Resize: REAL re-encode for images (decode → bilinear scale → PNG);
   * metadata-only transform for audio/video (a per-frame video rescale
   * would chain [[Codec.splitMjpegFrames]] + [[Codec.resizeImage]] the
   * same way — left to callers that need it).
   */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val bytes =
        if (r.kind == "image") Codec.resizeImage(r.bytes, w, h) else r.bytes
      r.copy(bytes = bytes, meta = r.meta.copy(width = w, height = h))
    }
  }

  /**
   * Frame sampling for video rows: emit one row per sampled frame index —
   * a flatMap (1→N) over the typed Dataset. Every sampled frame is REALLY
   * decoded (MJPEG split + ImageIO) into its own feature vector.
   */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int)
      : Dataset[(Long, Int, Array[Float])] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val frames = Codec.videoFrames(r.bytes)
      (0 until frames.length by everyN).map { f =>
        (r.media_id, f, Codec.decodeImage(frames(f), 8)._3)
      }
    }
  }

  /**
   * Deterministic synthetic media table for tests/demos. Image rows carry
   * REAL PNG payloads (deterministic per-pixel pattern, encoded with
   * `javax.imageio`); audio rows carry REAL WAV payloads (id-keyed sine,
   * encoded with `javax.sound.sampled`); video rows carry REAL MJPEG
   * payloads (concatenated per-frame JPEGs).
   */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].map { id =>
      val kind = Seq("image", "audio", "video")(
        (id % 3).toInt)
      val w = 64 + (id % 4).toInt * 32
      val h = 64 + (id % 3).toInt * 32
      val bytes = kind match {
        case "image" => syntheticPng(id, w, h)
        case "audio" => syntheticWav(id)
        case _ => syntheticMjpeg(id, w, h, frames = 6)
      }
      MediaRow(id, kind, bytes,
        MediaMeta(width = w, height = h,
          sampleRate = if (kind == "audio") 16000 else 0,
          nFrames = if (kind == "video") 6 else 1))
    }
  }

  /** A real MJPEG payload: `frames` baseline JPEGs back-to-back, each
    * frame the id-keyed pixel pattern shifted per frame index (so frame
    * features move over time). */
  private def syntheticMjpeg(id: Long, w: Int, h: Int,
                             frames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until frames).foreach { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var x = 0
      while (x < w) {
        var y = 0
        while (y < h) {
          val r = ((id * 31 + f * 23 + x * 7 + y * 13) % 256).toInt
          val g = ((id * 17 + f * 5 + x * 3 + y) % 256).toInt
          val b = ((id + f * 11 + x + y * 11) % 256).toInt
          img.setRGB(x, y, (r << 16) | (g << 8) | b)
          y += 1
        }
        x += 1
      }
      javax.imageio.ImageIO.write(img, "jpg", out)
    }
    out.toByteArray
  }

  /** A real 100 ms WAV (PCM 16-bit mono, 16 kHz): an id-keyed sine —
    * frequency, amplitude AND a small DC offset vary per id, so decoded
    * RMS features are distinct across rows (frequency alone isn't
    * enough: whole-period-aligned frequencies yield identical segment
    * RMS at equal amplitude). */
  private def syntheticWav(id: Long, sampleRate: Int = 16000): Array[Byte] = {
    val freq = 200.0 + (id % 20).toDouble * 50.0
    val amp = 0.2 + (id % 16).toDouble * 0.04
    val dc = (id % 97).toDouble / 1000.0
    val n = sampleRate / 10
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = ((dc + math.sin(2 * math.Pi * freq * i / sampleRate) * amp)
        * 32767).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** A real PNG with an id-keyed pixel pattern (gradient + id stripes). */
  private def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 3 + y) % 256).toInt
        val b = ((id + x + y * 11) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        y += 1
      }
      x += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Perceptual hashes for the image rows: `(media_id, phash)` — the
    * fingerprint-once projection (narrow mapPartitions, payloads never
    * shuffle; store this table and re-block on parameter changes, the
    * [[graft.operators.Dedup.simhashPairsFromFingerprints]] contract).
    * Undecodable payloads are SKIPPED, not thrown — one corrupt image
    * in a crawl-scale corpus must not abort the whole near-dup job
    * (the [[graft.sources.Warc]] degrade-don't-fail discipline). */
  def imageHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image")
      .flatMap(r =>
        scala.util.Try((r.media_id, Codec.imagePHash(r.bytes)))
          .toOption)
      .toDF("media_id", "phash")
  }

  /**
   * Image near-duplicate pairs `(id_a, id_b, hamming)` at perceptual-
   * hash Hamming distance ≤ `maxHamming` — re-encoded, lightly
   * recompressed or subtly retouched copies of the same picture, which
   * byte-level exact dedup cannot see. Fingerprint via [[imageHashes]]
   * (one decode per image, no shuffle), then the SAME Manku multi-chunk
   * blocking as text SimHash ([[graft.operators.Dedup
   * .simhashPairsFromFingerprints]]): O(1) bucket sizes in corpus
   * scale, full recall by pigeonhole, over-cap buckets counted — the
   * image dedup path is the text path with a different fingerprint.
   */
  def imageNearDuplicates(media: Dataset[MediaRow], maxHamming: Int = 4,
                          maxBucket: Int = 1000): DataFrame =
    graft.operators.Dedup.simhashPairsFromFingerprints(
      imageHashes(media), "media_id", "phash", maxHamming, maxBucket)

  /**
   * Deterministic image corpus with planted duplicates: `nContents`
   * distinct high-frequency pixel patterns, each encoded `copies`
   * times under DIFFERENT media_ids (`media_id % nContents` = the
   * content key). Same-content copies are pixel-identical (pHash
   * Hamming 0); distinct contents are far apart (MultimodalSpec
   * asserts pairwise distance on this exact fixture), so the
   * near-dup pair set is a pure function of the id arithmetic —
   * SQL-replayable for the driver's gate.
   */
  def syntheticImageCorpus(spark: SparkSession, nContents: Int,
                           copies: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(nContents.toLong * copies).as[Long].map { id =>
      val content = id % nContents
      val w = 64 + (content % 4).toInt * 16
      val h = 64 + (content % 3).toInt * 16
      MediaRow(id, "image", syntheticPng(content, w, h),
        MediaMeta(w, h, 0, 1))
    }
  }

  /**
   * [[syntheticImageCorpus]] with EXIF-rotated copies: copy set 1
   * stores each content's pixels rotated 90° CCW and tags
   * orientation 6 (rotate-90-CW-to-display), copy set 2 stores them
   * rotated 180° with orientation 3 — the phone-photo re-upload
   * shape. PNG + eXIf chunk keeps the planting LOSSLESS, so after
   * [[Exif.normalize]] every copy's pixels are IDENTICAL to the
   * upright original and the planted pairs sit at pHash Hamming 0 —
   * the q_image_phash_dedup oracle transfers verbatim. (The JPEG
   * APP1 leg of the same walk is pinned in MultimodalSpec, where
   * lossy re-encode keeps it out of the exact oracle.)
   */
  def syntheticImageCorpusExif(spark: SparkSession, nContents: Int,
                               copies: Int): Dataset[MediaRow] = {
    import spark.implicits._
    require(copies <= 3, "fixture defines orientations for 3 copy sets")
    spark.range(nContents.toLong * copies).as[Long].map { id =>
      val content = id % nContents
      val w = 64 + (content % 4).toInt * 16
      val h = 64 + (content % 3).toInt * 16
      val upright = syntheticPng(content, w, h)
      val copySet = (id / nContents).toInt
      val bytes = if (copySet == 0) upright else {
        val o = if (copySet == 1) 6 else 3
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(upright))
        val stored = Exif.denormalize(img, o)
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(stored, "png", out)
        Exif.withOrientationPng(out.toByteArray, o)
      }
      MediaRow(id, "image", bytes, MediaMeta(w, h, 0, 1))
    }
  }

  /** Video fingerprints for the video rows: `(media_id, vfp)` — the
    * DCT pHash ([[Codec.imagePHash]]) of the clip's MIDDLE frame
    * (deterministic representative; re-muxed or re-encoded copies of
    * the same footage keep their frames, so the middle frame matches).
    * Same fingerprint-once contract as [[imageHashes]]; a
    * shot-boundary multi-frame signature is the recall upgrade and
    * swaps in without touching the blocking. */
  def videoHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { r =>
        // corrupt/frameless clips are skipped, not thrown — the
        // imageHashes degrade-don't-fail contract
        scala.util.Try {
          val frames = Codec.videoFrames(r.bytes)
          require(frames.nonEmpty, "no decodable video frames")
          (r.media_id, Codec.imagePHash(frames(frames.length / 2)))
        }.toOption
      }
      .toDF("media_id", "vfp")
  }

  /** Video near-duplicate pairs `(id_a, id_b, hamming)` — the
    * [[imageNearDuplicates]] shape over [[videoHashes]]. */
  def videoNearDuplicates(media: Dataset[MediaRow], maxHamming: Int = 4,
                          maxBucket: Int = 1000): DataFrame =
    graft.operators.Dedup.simhashPairsFromFingerprints(
      videoHashes(media), "media_id", "vfp", maxHamming, maxBucket)

  /** Audio fingerprints for the audio rows: `(media_id, afp)` — same
    * fingerprint-once, skip-corrupt contract as [[imageHashes]]. */
  def audioHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .flatMap(r =>
        scala.util.Try((r.media_id, Codec.audioFingerprint(r.bytes)))
          .toOption)
      .toDF("media_id", "afp")
  }

  /** Audio near-duplicate pairs `(id_a, id_b, hamming)` — re-encoded
    * or lightly noised copies of the same clip; [[audioHashes]] then
    * the shared Manku blocking, exactly the [[imageNearDuplicates]]
    * shape. */
  def audioNearDuplicates(media: Dataset[MediaRow], maxHamming: Int = 4,
                          maxBucket: Int = 1000): DataFrame =
    graft.operators.Dedup.simhashPairsFromFingerprints(
      audioHashes(media), "media_id", "afp", maxHamming, maxBucket)

  /**
   * Offset-voted probe of a NEW audio batch against a PERSISTED
   * landmark index (`(media_id, t, lh)` rows from
   * [[audioConstellationHashes]], appended once per ingested batch) —
   * the constellation member of the incremental family
   * ([[graft.operators.Dedup.simhashProbeIndex]] discipline): history
   * audio is decoded and FFT'd exactly ONCE; per batch it
   * participates through fixed-width index rows restricted to the
   * batch's landmark hashes by a semi-join BEFORE any aggregation,
   * with hot hashes (> `maxBucket` touched index rows) excluded.
   * Returns `(new_id, seen_id, votes)` at `minVotes`+ — a delayed or
   * re-encoded copy of an indexed clip concentrates its votes at one
   * anchor offset exactly as in [[audioConstellationMatches]].
   */
  def audioConstellationProbeIndex(batch: Dataset[MediaRow],
                                   index: DataFrame,
                                   minVotes: Int = 32,
                                   maxBucket: Int = 1000,
                                   frameSize: Int = 512, hop: Int = 256,
                                   fanout: Int = 5): DataFrame =
    offsetVotedProbe(
      audioConstellationHashes(batch, frameSize, hop, fanout)
        .localCheckpoint(true), // three consumers; decode batch once
      index, minVotes, maxBucket)

  /** [[videoSequenceMatches]] in incremental form: a new video batch
    * probes a PERSISTED per-frame pHash index
    * ([[videoFrameHashes]] output, appended per ingested batch) —
    * history clips are never re-decoded, the
    * [[audioConstellationProbeIndex]] discipline frame for frame. */
  def videoSequenceProbeIndex(batch: Dataset[MediaRow],
                              index: DataFrame,
                              minVotes: Int = 5,
                              maxBucket: Int = 1000): DataFrame =
    offsetVotedProbe(videoFrameHashes(batch).localCheckpoint(true),
      index, minVotes, maxBucket)

  /** Shared batch-vs-index offset voting behind the audio and video
    * incremental probes: `bh` is the batch's `(media_id, t, lh)` hash
    * table (checkpointed by the caller), `index` the persisted one.
    * Index rows are restricted to batch-touched hashes by a semi-join
    * BEFORE any aggregation; hot hashes among the touched set are
    * excluded. Returns `(new_id, seen_id, votes ≥ minVotes)`. */
  private def offsetVotedProbe(bh0: DataFrame, index: DataFrame,
                               minVotes: Int, maxBucket: Int)
      : DataFrame = {
    val bh = bh0.select(col("media_id").as("new_id"),
      col("t").as("tn"), col("lh"))
    val touched = index
      .select(col("media_id").as("seen_id"), col("t").as("ts"), col("lh"))
      .join(bh.select(col("lh")).distinct(), Seq("lh"), "left_semi")
    val hot = touched.groupBy(col("lh")).agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxBucket).select(col("lh"))
    bh.join(hot, Seq("lh"), "left_anti")
      .join(touched, Seq("lh"))
      .groupBy(col("new_id"), col("seen_id"),
        (col("tn") - col("ts")).as("off"))
      .agg(count(lit(1)).as("__votes"))
      .groupBy(col("new_id"), col("seen_id"))
      .agg(max(col("__votes")).as("votes"))
      .where(col("votes") >= minVotes)
  }

  /** Landmark table `(media_id, t, lh)` from [[Codec
    * .audioConstellation]]: one narrow mapPartitions over the payloads
    * (bytes never shuffle), ~300 rows of 24 bytes per second of audio
    * — the persisted index form for incremental audio-dup checks. */
  def audioConstellationHashes(media: Dataset[MediaRow],
                               frameSize: Int = 512, hop: Int = 256,
                               fanout: Int = 5): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .flatMap { r =>
        scala.util.Try(
          Codec.audioConstellation(r.bytes, frameSize, hop, fanout)
            .toSeq.map { case (t, h) => (r.media_id, t, h) })
          .getOrElse(Seq.empty)
      }
      .toDF("media_id", "t", "lh")
  }

  /** Shared offset-voting core behind the audio-constellation and
    * video-frame-sequence matchers — input is a `(media_id, t, lh)`
    * hash table (landmark hashes with anchor frames, or per-frame
    * pHashes with frame indices). Hashes shared by two clips become
    * candidate pairs voting for the time offset `ta - tb`; a true
    * (possibly delayed) copy concentrates its votes at ONE offset
    * while chance collisions scatter, so `votes = max per-offset
    * count ≥ minVotes` separates them. The plan is the banded-LSH
    * shape: self-join ON THE HASH (bucket join, no cross product),
    * hot hashes (> `maxBucket` clips — the analog of the empty-doc
    * signature) dropped before the join, two partial-aggregated
    * groupBys after it. `hs` is checkpointed by the callers so both
    * join sides reuse it without re-decoding payloads. */
  private def offsetVotedPairs(hs: DataFrame, minVotes: Int,
                               maxBucket: Int): DataFrame = {
    val hot = hs.groupBy(col("lh")).agg(count(lit(1)).as("__n"))
      .where(col("__n") > maxBucket).select(col("lh"))
    val pruned = hs.join(hot, Seq("lh"), "left_anti")
    val a = pruned.select(col("lh"), col("media_id").as("id_a"),
      col("t").as("ta"))
    val b = pruned.select(col("lh"), col("media_id").as("id_b"),
      col("t").as("tb"))
    a.join(b, Seq("lh")).where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"),
        (col("ta") - col("tb")).as("off"))
      .agg(count(lit(1)).as("__votes"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("__votes")).as("votes"))
      .where(col("votes") >= minVotes)
  }

  /**
   * Time-offset-robust audio duplicate pairs `(id_a, id_b, votes)` by
   * constellation matching (Wang 2003) — [[offsetVotedPairs]] over
   * [[audioConstellationHashes]].
   */
  def audioConstellationMatches(media: Dataset[MediaRow],
                                minVotes: Int = 32,
                                maxBucket: Int = 1000): DataFrame =
    offsetVotedPairs(
      audioConstellationHashes(media).localCheckpoint(true),
      minVotes, maxBucket)

  /** Rate-invariant landmark table `(media_id, t, lh)` from
    * [[Codec.audioConstellationRatio]] — same narrow-map shape and
    * persisted-index role as [[audioConstellationHashes]], but `t` is
    * the EVENT ORDINAL (the index into the run-compressed
    * [[Codec.eventBins]] sequence — a rate-invariant time axis, since
    * resampling stretches frames but preserves the event order), so
    * the shared voting core's `ta - tb` is the constant ordinal
    * offset a resampled copy produces. */
  def audioConstellationRatioHashes(media: Dataset[MediaRow],
                                    frameSize: Int = 512, hop: Int = 256,
                                    eventFanout: Int = 3): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio")
      .flatMap { r =>
        scala.util.Try(
          Codec.audioConstellationRatio(r.bytes, frameSize, hop,
              eventFanout)
            .toSeq.map { case (t, h) => (r.media_id, t, h) })
          .getOrElse(Seq.empty)
      }
      .toDF("media_id", "t", "lh")
  }

  /**
   * Tempo/pitch-robust audio duplicate pairs `(id_a, id_b, votes,
   * match_frac)` — the complement of [[audioConstellationMatches]]:
   * catches RESAMPLED copies (rate/pitch change) the absolute-bin
   * landmarks provably miss. Two stages, the library's LSH discipline
   * (candidates must out-vote chance, then an EXACT check decides):
   *
   *  1. candidates: [[offsetVotedPairs]] over
   *     [[audioConstellationRatioHashes]] at `minVotes` — frequency-
   *     ratio hashes carry less entropy than absolute-bin pairs, so
   *     chance votes sit closer to the planted level than in the
   *     absolute family (measured: planted min 33 vs chance max 29 on
   *     the fixture corpus) and the vote alone is NOT the verdict;
   *  2. verify: candidates' event-bin sequences ([[Codec.eventBins]],
   *     ~one int per spectral run — KBs, and decoded only for
   *     candidate ids via a semi-join, never the corpus) are aligned
   *     by [[Codec.ratioSequenceMatchFrac]]; measured on the fixture
   *     corpus: every resampled copy scores 1.0 (votes 85–113), the
   *     best chance pair 0.61 (votes ≤ 36), so the 0.8 default splits
   *     them with margin on BOTH axes (MultimodalSpec pins both).
   *
   * Payload bytes still never shuffle: the verify decode happens in a
   * narrow map over the candidate-id semi-joined media rows, and only
   * the int sequences enter the join.
   */
  def audioConstellationRatioMatches(media: Dataset[MediaRow],
                                     minVotes: Int = 12,
                                     maxBucket: Int = 1000,
                                     minMatchFrac: Double = 0.8): DataFrame = {
    import media.sparkSession.implicits._
    val cand = offsetVotedPairs(
      audioConstellationRatioHashes(media).localCheckpoint(true),
      minVotes, maxBucket).localCheckpoint(true)
    val ids = cand.select(col("id_a").as("media_id"))
      .unionAll(cand.select(col("id_b").as("media_id"))).distinct()
    val bins = media.join(broadcast(ids), Seq("media_id"), "left_semi")
      .as[MediaRow]
      .map(r => (r.media_id,
        scala.util.Try(Codec.eventBins(r.bytes)).getOrElse(Array.empty[Int])))
      .toDF("media_id", "bins")
    cand
      .join(bins.select(col("media_id").as("id_a"), col("bins").as("__ba")),
        Seq("id_a"))
      .join(bins.select(col("media_id").as("id_b"), col("bins").as("__bb")),
        Seq("id_b"))
      .as[(Long, Long, Long, Array[Int], Array[Int])]
      .map { case (idB, idA, votes, ba, bb) =>
        (idA, idB, votes, Codec.ratioSequenceMatchFrac(ba, bb))
      }
      .toDF("id_a", "id_b", "votes", "match_frac")
      .where(col("match_frac") >= minMatchFrac)
  }

  /** Per-frame pHash sequence `(media_id, t, lh)` for video rows —
    * frame index as the time axis, the frame's 64-bit pHash as the
    * hash. Same skip-corrupt contract and narrow-map shape as
    * [[videoHashes]]; this is the persisted index form for
    * sequence-level (trim/delay-robust) video dedup, where
    * [[videoHashes]]'s single middle frame is the cheap whole-clip
    * fingerprint. */
  def videoFrameHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video")
      .flatMap { r =>
        scala.util.Try {
          val frames = Codec.videoFrames(r.bytes)
          require(frames.nonEmpty, "no decodable video frames")
          frames.zipWithIndex.map { case (fb, i) =>
            (r.media_id, i, Codec.imagePHash(fb)) }
        }.getOrElse(Seq.empty)
      }
      .toDF("media_id", "t", "lh")
  }

  /**
   * Time-offset-robust VIDEO duplicate pairs `(id_a, id_b, votes)`:
   * [[offsetVotedPairs]] over the per-frame pHash sequence — the
   * video analog of [[audioConstellationMatches]], catching
   * trimmed/delayed/intro-prepended copies that the middle-frame
   * fingerprint provably misses (the shifted middle lands on a
   * DIFFERENT source frame; consecutive-frame pHashes in real clips
   * sit well past any useful Hamming radius — MultimodalSpec pins
   * the miss and the catch on one fixture). `votes` = aligned frame
   * count at the best offset, so `minVotes` is the minimum shared-
   * subsequence length that counts as a duplicate.
   */
  def videoSequenceMatches(media: Dataset[MediaRow],
                           minVotes: Int = 5,
                           maxBucket: Int = 1000): DataFrame =
    offsetVotedPairs(videoFrameHashes(media).localCheckpoint(true),
      minVotes, maxBucket)

  /** [[offsetVotedPairs]] over an ALREADY-COMPUTED `(media_id, t,
    * lh)` hash table — for callers (the streaming ingest) that hash
    * once and reuse the table across within-batch and vs-history
    * stages. The table should be checkpointed/persisted by the
    * caller. */
  def sequencePairsFromHashes(hashes: DataFrame, minVotes: Int,
                              maxBucket: Int = 1000): DataFrame =
    offsetVotedPairs(hashes, minVotes, maxBucket)

  /** [[offsetVotedProbe]] over an already-computed batch hash table —
    * the hash-table-level incremental probe shared by
    * [[audioConstellationProbeIndex]] / [[videoSequenceProbeIndex]]
    * and the streaming ingest. */
  def sequenceProbeFromHashes(batchHashes: DataFrame, index: DataFrame,
                              minVotes: Int,
                              maxBucket: Int = 1000): DataFrame =
    offsetVotedProbe(batchHashes, index, minVotes, maxBucket)

  /**
   * Deterministic audio corpus with planted duplicates: `nContents`
   * distinct tone SEQUENCES (64 segments, content-keyed frequency per
   * segment — the ZCR profile is the content's signature), each
   * encoded `copies` times under different media_ids
   * (`media_id % nContents` = content). Same-content copies are
   * sample-identical (fingerprint Hamming 0); distinct contents are
   * far apart (MultimodalSpec pins the margin on this exact fixture),
   * so the near-dup pair set is pure id arithmetic.
   */
  def syntheticAudioCorpus(spark: SparkSession, nContents: Int,
                           copies: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(nContents.toLong * copies).as[Long].map { id =>
      val content = id % nContents
      MediaRow(id, "audio", toneSequenceWav(content),
        MediaMeta(0, 0, 16000, 1))
    }
  }

  /**
   * [[syntheticAudioCorpus]] with every payload FLAC-encoded
   * ([[Flac.fromPcm16]]) instead of WAV-wrapped — SAME tone
   * sequences, so every downstream fingerprint is sample-identical
   * to the WAV corpus (FLAC is lossless) and the q_audio_fp_dedup
   * oracle transfers VERBATIM. This is the codec-agnosticism
   * contract for the audio family: the LibriSpeech/MLS-class corpora
   * real pipelines ingest ship as FLAC.
   */
  def syntheticAudioCorpusFlac(spark: SparkSession, nContents: Int,
                               copies: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(nContents.toLong * copies).as[Long].map { id =>
      val content = id % nContents
      MediaRow(id, "audio",
        Flac.fromPcm16(toneSequencePcm(content), 16000),
        MediaMeta(0, 0, 16000, 1))
    }
  }

  /**
   * Deterministic video corpus with planted duplicates — the
   * [[syntheticImageCorpus]] construction over real MJPEG payloads
   * (`media_id % nContents` = content; copies are byte-identical, so
   * middle-frame pHashes collide at Hamming 0; MultimodalSpec pins
   * the distinct-content margin on this exact fixture).
   */
  def syntheticVideoCorpus(spark: SparkSession, nContents: Int,
                           copies: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(nContents.toLong * copies).as[Long].map { id =>
      val content = id % nContents
      val w = 64 + (content % 4).toInt * 16
      val h = 64 + (content % 3).toInt * 16
      MediaRow(id, "video", syntheticMjpeg(content, w, h, frames = 5),
        MediaMeta(w, h, 0, 5))
    }
  }

  /**
   * Deterministic H.264 video corpus with planted duplicates — the
   * [[syntheticVideoCorpus]] construction, but each payload is a
   * spec-valid Annex-B H.264 stream of all-I_PCM IDR frames
   * ([[H264.encode]]) carrying the SAME per-content pixel pattern as
   * the MJPEG fixture. Decoded through [[FrameDecoder.Auto]]'s
   * sniffing dispatch — every video operator (pHash, sequence match,
   * offset voting, incremental probe) runs on it unchanged, which is
   * the codec-agnosticism the SPI promises.
   */
  def syntheticH264Corpus(spark: SparkSession, nContents: Int,
                          copies: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(nContents.toLong * copies).as[Long].map { id =>
      val content = id % nContents
      val w = 64 + (content % 4).toInt * 16
      val h = 64 + (content % 3).toInt * 16
      MediaRow(id, "video", syntheticH264(content, w, h, frames = 5),
        MediaMeta(w, h, 0, 5))
    }
  }

  /**
   * H.264 analog of [[syntheticShiftedVideoCorpus]]: Annex-B streams
   * are concatenative just like MJPEG (each fixture frame is a
   * self-contained IDR picture and parameter sets may repeat), so the
   * intro-prepended copy is the byte concat of two valid streams —
   * and the SAME offset-voting matcher finds the planted 3-frame
   * shift with no codec-specific code.
   */
  def syntheticShiftedH264Corpus(spark: SparkSession, nContents: Int,
                                 nShifted: Int): Dataset[MediaRow] = {
    import spark.implicits._
    require(nShifted <= nContents, "shifted copies need a source")
    val ids = spark.range(nContents.toLong)
      .union(spark.range(1000L, 1000L + nShifted)).as[Long]
    ids.map { id =>
      val content = if (id >= 1000L) id - 1000L else id
      val w = 64 + (content % 4).toInt * 16
      val h = 64 + (content % 3).toInt * 16
      val body = syntheticH264(content, w, h, frames = 8)
      val bytes = if (id >= 1000L)
        syntheticH264(5000L + content, w, h, frames = 3) ++ body
      else body
      MediaRow(id, "video", bytes, MediaMeta(w, h, 0,
        if (id >= 1000L) 11 else 8))
    }
  }

  /** The [[syntheticMjpeg]] per-frame pixel pattern — shared by the
    * MJPEG, Annex-B and MP4 fixture encoders so the planted-duplicate
    * structure (and oracle) is identical across containers. */
  private def fixtureFrames(id: Long, w: Int, h: Int,
                            frames: Int): Seq[Array[Int]] =
    (0 until frames).map { f =>
      val px = new Array[Int](w * h)
      var x = 0
      while (x < w) {
        var y = 0
        while (y < h) {
          val r = ((id * 31 + f * 23 + x * 7 + y * 13) % 256).toInt
          val g = ((id * 17 + f * 5 + x * 3 + y) % 256).toInt
          val b = ((id + f * 11 + x + y * 11) % 256).toInt
          px(y * w + x) = (r << 16) | (g << 8) | b
          y += 1
        }
        x += 1
      }
      px
    }

  /** The [[syntheticMjpeg]] pixel pattern, H.264-encoded (I_PCM). */
  private[graft] def syntheticH264(id: Long, w: Int, h: Int,
                                   frames: Int): Array[Byte] =
    H264.encode(w, h, fixtureFrames(id, w, h, frames))

  /** The same pixel pattern as a REAL .mp4 file: CAVLC- or (with
    * `cabac = true`) CABAC-compressed intra macroblocks
    * ([[H264.encodeCavlc]]/[[H264.encodeCabac]]) muxed into ISO-BMFF
    * with avcC + length-prefixed samples ([[Mp4.fromAnnexB]]) — the
    * shape actual video files arrive in. Deterministic bytes, so
    * planted copies stay byte-identical and fingerprint at distance
    * 0 just like the MJPEG/Annex-B fixtures. */
  private[graft] def syntheticMp4(id: Long, w: Int, h: Int,
                                  frames: Int,
                                  cabac: Boolean = false,
                                  deblock: Boolean = false,
                                  pFiller: Int = 0,
                                  transform8x8: Boolean = false,
                                  scalingMatrix: Boolean = false,
                                  pSlices: Boolean = false,
                                  weighted: Boolean = false,
                                  bSlices: Boolean = false,
                                  bTemporalWeighted: Boolean = false)
      : Array[Byte] = {
    require(!(cabac && transform8x8),
      "CABAC x transform_8x8 unsupported (see H264 scope)")
    require(!((pSlices || bSlices) && cabac),
      "CABAC inter slices unsupported (see H264 scope)")
    val px = fixtureFrames(id, w, h, frames)
    val annexB =
      if (bSlices)
        // the classic broadcast GOP: I B B P B(…) — non-reference B
        // pictures between P anchors, two POC-ordered lists, spatial
        // direct + B_Skip, biprediction; decode order ≠ display
        // order, so the decoder's POC reordering is load-bearing for
        // the fingerprint (the middle frame IS a B picture)
        H264.encodeCavlcB(w, h, px, qp = 26, bBetween = 2,
          deblock = deblock,
          forcedMv = Seq((5, 2), (-3, 1), (2, -2)),
          partitionCycle = true, intraEvery = 7, refsEachWay = 2,
          directTemporal = bTemporalWeighted,
          weightedBi = bTemporalWeighted)._1
      else if (pSlices)
        // a REAL IPPP stream: frame 0 IDR, the rest motion-compensated
        // P pictures (planted fractional global MVs exercise the
        // §8.4.2.2 interpolation; the partition cycle covers Tables
        // 7-13/7-17; intraEvery is the refresh pattern; deblock
        // composes the inter §8.7.2.1 bS path; transform8x8 /
        // scalingMatrix compose the High-profile inter residual)
        H264.encodeCavlcP(w, h, px, qp = 26, deblock = deblock,
          forcedMv = Seq((5, 2), (-3, 1), (2, -2), (7, 3)),
          partitionCycle = true, intraEvery = 7,
          transform8x8 = transform8x8,
          scalingMatrix = scalingMatrix, weighted = weighted)._1
      else if (cabac) H264.encodeCabac(w, h, px, qp = 26,
        deblock = deblock, scalingMatrix = scalingMatrix)._1
      else H264.encodeCavlc(w, h, px, qp = 26, deblock = deblock,
        transform8x8 = transform8x8, scalingMatrix = scalingMatrix)._1
    // pFiller > 0: the real-world MIXED stream shape — each IDR
    // followed by that many all-P_Skip filler pictures
    // (H264.insertInterFiller); since the inter round the fillers
    // DECODE (motion compensation) as exact copies of their IDR
    // reference, so planted copies stay fingerprint-identical
    val withFiller =
      if (pFiller > 0) H264.insertInterFiller(annexB, pFiller)
      else annexB
    Mp4.fromAnnexB(withFiller, w, h)
  }

  /**
   * MP4 analog of [[syntheticShiftedH264Corpus]]: unlike Annex-B, MP4
   * files do NOT byte-concatenate, so the intro-prepended copy is
   * built the way a real re-edit is — the intro FRAMES are prepended
   * before encoding and the whole sequence is CAVLC-encoded and muxed
   * as one file. Each IDR frame is intra-only, so a body frame's
   * reconstruction is a pure function of its own pixels regardless of
   * position in the stream — the shifted copy's body frames decode
   * bit-identically to the source's, and the SAME offset-voting
   * matcher finds the planted 3-frame shift through the container
   * demux with no codec- or container-specific code.
   *
   * `fragmented = true` muxes each clip as an fMP4 instead
   * ([[Mp4.fromAnnexBFragmented]] — moof/tfhd/trun sample tables, the
   * DASH/streaming shape): identical pixels and oracle, third
   * container for the agnosticism contract.
   */
  def syntheticShiftedMp4Corpus(spark: SparkSession, nContents: Int,
                                nShifted: Int,
                                fragmented: Boolean = false)
      : Dataset[MediaRow] = {
    import spark.implicits._
    require(nShifted <= nContents, "shifted copies need a source")
    val ids = spark.range(nContents.toLong)
      .union(spark.range(1000L, 1000L + nShifted)).as[Long]
    ids.map { id =>
      val content = if (id >= 1000L) id - 1000L else id
      val w = 64 + (content % 4).toInt * 16
      val h = 64 + (content % 3).toInt * 16
      val body = fixtureFrames(content, w, h, frames = 8)
      val frames = if (id >= 1000L)
        fixtureFrames(5000L + content, w, h, frames = 3) ++ body
      else body
      val annexB = H264.encodeCavlc(w, h, frames, qp = 26)._1
      val bytes = if (fragmented)
        Mp4.fromAnnexBFragmented(annexB, w, h)
      else Mp4.fromAnnexB(annexB, w, h)
      MediaRow(id, "video", bytes, MediaMeta(w, h, 0, frames.size))
    }
  }

  /** [[syntheticH264Corpus]] with every payload a real MP4 file of
    * compressed H.264 — decoded through [[FrameDecoder.Auto]]'s
    * ftyp sniff and the container demux, no external binding.
    * `cabac = true` switches the entropy layer to CABAC (the
    * High-profile shape); pixels and oracle are identical. */
  def syntheticMp4Corpus(spark: SparkSession, nContents: Int,
                         copies: Int,
                         cabac: Boolean = false,
                         deblock: Boolean = false,
                         pFiller: Int = 0,
                         transform8x8: Boolean = false,
                         scalingMatrix: Boolean = false,
                         pSlices: Boolean = false,
                         weighted: Boolean = false,
                         bSlices: Boolean = false,
                         bTemporalWeighted: Boolean = false)
      : Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(nContents.toLong * copies).as[Long].map { id =>
      val content = id % nContents
      val w = 64 + (content % 4).toInt * 16
      val h = 64 + (content % 3).toInt * 16
      MediaRow(id, "video",
        syntheticMp4(content, w, h, frames = 5, cabac, deblock,
          pFiller, transform8x8, scalingMatrix, pSlices, weighted,
          bSlices, bTemporalWeighted),
        MediaMeta(w, h, 0, 5))
    }
  }

  /**
   * Video corpus with planted TIME-OFFSET duplicates — the
   * [[syntheticShiftedAudioCorpus]] construction for video: ids
   * `0 until nContents` are distinct 8-frame MJPEG clips; ids
   * `1000 + c` for `c < nShifted` are id `c`'s clip with a 3-frame
   * content-keyed intro prepended (MJPEG is frame-concatenative, so
   * the byte concat IS a valid clip). Every content frame recurs at a
   * constant frame offset of exactly 3 — the case [[videoHashes]]'s
   * middle-frame fingerprint provably misses (the shifted middle
   * lands on a different source frame).
   */
  def syntheticShiftedVideoCorpus(spark: SparkSession, nContents: Int,
                                  nShifted: Int): Dataset[MediaRow] = {
    import spark.implicits._
    require(nShifted <= nContents, "shifted copies need a source")
    val ids = spark.range(nContents.toLong)
      .union(spark.range(1000L, 1000L + nShifted)).as[Long]
    ids.map { id =>
      val content = if (id >= 1000L) id - 1000L else id
      val w = 64 + (content % 4).toInt * 16
      val h = 64 + (content % 3).toInt * 16
      val body = syntheticMjpeg(content, w, h, frames = 8)
      val bytes = if (id >= 1000L)
        syntheticMjpeg(5000L + content, w, h, frames = 3) ++ body
      else body
      MediaRow(id, "video", bytes, MediaMeta(w, h, 0,
        if (id >= 1000L) 11 else 8))
    }
  }

  /** A real 1 s WAV whose frequency steps through a content-keyed
    * pattern: segment s of 64 plays one of 12 tones chosen by a
    * content-seeded mix — a coarse "melody" the ZCR fingerprint
    * reads back. */
  private def toneSequenceWav(content: Long,
                              sampleRate: Int = 16000): Array[Byte] =
    wavFromPcm(toneSequencePcm(content, sampleRate), sampleRate)

  private[multimodal] def toneSequencePcm(content: Long,
                                          sampleRate: Int = 16000): Array[Byte] = {
    val segs = 64
    val n = sampleRate
    val perSeg = n / segs
    val pcm = new Array[Byte](n * 2)
    var s = 0
    while (s < segs) {
      val mix = content * 1315423911L + s * 2654435761L
      val tone = math.floorMod(mix ^ (mix >>> 17), 12L)
      val freq = 300.0 + tone * 90.0
      var i = 0
      while (i < perSeg) {
        val k = s * perSeg + i
        val v = (math.sin(2 * math.Pi * freq * i / sampleRate) * 0.6
          * 32767).toInt
        pcm(2 * k) = (v & 0xFF).toByte
        pcm(2 * k + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      s += 1
    }
    pcm
  }

  /** 16-bit mono little-endian PCM bytes → a real WAV container. */
  private def wavFromPcm(pcm: Array[Byte], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Content-keyed melody PCM for the constellation fixture: 64 equal
    * segments, each playing one of 128 tone steps (vs
    * [[toneSequenceWav]]'s 12 — fine enough that two DIFFERENT
    * contents almost never put the same spectral peak in the same
    * segment, keeping chance constellation agreement near zero). */
  private def melodyPcm(content: Long,
                        sampleRate: Int = 16000): Array[Byte] = {
    val segs = 64
    val n = sampleRate
    val perSeg = n / segs
    val pcm = new Array[Byte](n * 2)
    var s = 0
    while (s < segs) {
      val mix = content * 2246822519L + s * 3266489917L
      val tone = math.floorMod(mix ^ (mix >>> 15), 128L)
      val freq = 300.0 + tone * 18.0
      var i = 0
      while (i < perSeg) {
        val k = s * perSeg + i
        val v = (math.sin(2 * math.Pi * freq * i / sampleRate) * 0.6
          * 32767).toInt
        pcm(2 * k) = (v & 0xFF).toByte
        pcm(2 * k + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      s += 1
    }
    pcm
  }

  /**
   * Audio corpus with planted TIME-OFFSET duplicates — the case the
   * ZCR profile fingerprint provably misses (a shift moves its segment
   * grid, flipping far more than `maxHamming` bits) and spectral-peak
   * constellations catch by construction: ids `0 until nContents` are
   * distinct melodies; ids `1000 + c` for `c < nShifted` are the same
   * melody as id `c` with 4096 samples (16 hops at the default 256) of
   * leading silence, so every landmark recurs at a constant frame
   * offset of exactly 16.
   */
  def syntheticShiftedAudioCorpus(spark: SparkSession, nContents: Int,
                                  nShifted: Int,
                                  noiseLsb: Int = 0): Dataset[MediaRow] = {
    import spark.implicits._
    require(nShifted <= nContents, "shifted copies need a source")
    val ids = spark.range(nContents.toLong)
      .union(spark.range(1000L, 1000L + nShifted)).as[Long]
    ids.map { id =>
      val content = if (id >= 1000L) id - 1000L else id
      val melody = melodyPcm(content)
      val pcm = if (id >= 1000L) {
        // copies optionally carry deterministic ±noiseLsb sample noise
        // (a crude re-encode stand-in: the spectral peak must survive)
        if (noiseLsb > 0) {
          var i = 0
          var state = content * 6364136223846793005L + 1442695040888963407L
          while (i < melody.length - 1) {
            state = state * 6364136223846793005L + 1442695040888963407L
            val n = ((state >>> 33) % (2L * noiseLsb + 1)).toInt - noiseLsb
            val v = math.max(-32768, math.min(32767,
              (((melody(i) & 0xFF) | (melody(i + 1) << 8)).toShort: Int)
                + n))
            melody(i) = (v & 0xFF).toByte
            melody(i + 1) = ((v >> 8) & 0xFF).toByte
            i += 2
          }
        }
        new Array[Byte](4096 * 2) ++ melody
      } else melody
      MediaRow(id, "audio", wavFromPcm(pcm, 16000),
        MediaMeta(0, 0, 16000, 1))
    }
  }

  /**
   * [[syntheticShiftedAudioCorpus]] (noise-free form) with every
   * payload FLAC-encoded — same melodies, same 4096-sample leading
   * silence on the 1000+c copies, so the constellation offset-voting
   * oracle transfers VERBATIM (lossless decode ⇒ identical STFT ⇒
   * identical landmarks and votes).
   */
  def syntheticShiftedAudioCorpusFlac(spark: SparkSession,
                                      nContents: Int,
                                      nShifted: Int): Dataset[MediaRow] = {
    import spark.implicits._
    require(nShifted <= nContents, "shifted copies need a source")
    val ids = spark.range(nContents.toLong)
      .union(spark.range(1000L, 1000L + nShifted)).as[Long]
    ids.map { id =>
      val content = if (id >= 1000L) id - 1000L else id
      val melody = melodyPcm(content)
      val pcm =
        if (id >= 1000L) new Array[Byte](4096 * 2) ++ melody else melody
      MediaRow(id, "audio", Flac.fromPcm16(pcm, 16000),
        MediaMeta(0, 0, 16000, 1))
    }
  }

  /** 2-second, 32-segment melody PCM (content-keyed, 128 tone steps):
    * the RATIO-constellation fixture — longer segments (~4 STFT frames
    * each) make the run-length event sequence sparse enough that gap
    * ratios carry signal, which the 1-second/64-segment fixtures'
    * one-frame-per-segment geometry cannot. */
  private def melodyPcmLong(content: Long,
                            sampleRate: Int = 16000): Array[Byte] = {
    val segs = 32
    val n = sampleRate * 2
    val perSeg = n / segs
    val pcm = new Array[Byte](n * 2)
    var s = 0
    while (s < segs) {
      val mix = content * 2246822519L + s * 3266489917L
      val tone = math.floorMod(mix ^ (mix >>> 15), 128L)
      val freq = 300.0 + tone * 18.0
      var i = 0
      while (i < perSeg) {
        val k = s * perSeg + i
        val v = (math.sin(2 * math.Pi * freq * i / sampleRate) * 0.6
          * 32767).toInt
        pcm(2 * k) = (v & 0xFF).toByte
        pcm(2 * k + 1) = ((v >> 8) & 0xFF).toByte
        i += 1
      }
      s += 1
    }
    pcm
  }

  /** Nearest-neighbor PCM resample by `rate` (>1 = faster + pitched
    * up): output sample j reads input sample round(j·rate) — the
    * playback-rate-change model (tempo AND pitch scale together, the
    * classic radio/speed-adjusted re-upload). 16-bit mono LE. */
  private def resamplePcm(pcm: Array[Byte], rate: Double): Array[Byte] = {
    val nIn = pcm.length / 2
    val nOut = (nIn / rate).toInt
    val out = new Array[Byte](nOut * 2)
    var j = 0
    while (j < nOut) {
      val src = math.min(nIn - 1, math.round(j * rate).toInt)
      out(2 * j) = pcm(2 * src)
      out(2 * j + 1) = pcm(2 * src + 1)
      j += 1
    }
    out
  }

  /**
   * Audio corpus with planted RESAMPLED duplicates — the case the
   * absolute-bin constellation provably misses (a rate change scales
   * every peak bin and every frame delta, so no landmark hash
   * survives) and [[audioConstellationRatioMatches]] catches by
   * construction: ids `0 until nContents` are distinct 2-second
   * melodies; ids `2000 + c` for `c < nResampled` are the same
   * melodies played at `ratePct/100` speed (nearest-neighbor
   * resample — pitch and tempo scale together, the re-upload model).
   */
  def syntheticResampledAudioCorpus(spark: SparkSession, nContents: Int,
                                    nResampled: Int,
                                    ratePct: Int = 110): Dataset[MediaRow] = {
    import spark.implicits._
    require(nResampled <= nContents, "resampled copies need a source")
    val ids = spark.range(nContents.toLong)
      .union(spark.range(2000L, 2000L + nResampled)).as[Long]
    ids.map { id =>
      val content = if (id >= 2000L) id - 2000L else id
      val melody = melodyPcmLong(content)
      val pcm =
        if (id >= 2000L) resamplePcm(melody, ratePct / 100.0) else melody
      MediaRow(id, "audio", wavFromPcm(pcm, 16000),
        MediaMeta(0, 0, 16000, 1))
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
