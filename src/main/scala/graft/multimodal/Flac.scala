package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/**
 * FLAC (Free Lossless Audio Codec) decoder + fixture encoder, written
 * from the PUBLIC format specification (RFC 9639 / the xiph.org
 * format document). FLAC is the one compressed audio format the
 * repo's "constants are never invented" rule permits natively: unlike
 * MP3/AAC, whose Huffman codebooks and synthesis windows ARE the
 * bitstream, every FLAC parameter rides in-stream — Rice parameters,
 * LPC coefficients, shifts and precisions are all read from the file;
 * the only fixed constants are the four tiny FIXED-predictor
 * polynomials (differences of orders 1..4), the CRC-8/CRC-16
 * polynomials (x^8+x^2+x+1, x^16+x^15+x^2+1) and the UTF-8-style
 * coded-number scheme, each of which is self-checking against the
 * in-stream CRCs and the STREAMINFO MD5.
 *
 * Losslessness gives this module a verification anchor no other codec
 * here has: PCM → [[encode]] → [[decodePcm]] must be BIT-IDENTICAL,
 * and every decode verifies the frame CRCs plus the whole-stream MD5
 * signature, so a transcription slip in the fixed predictors or CRC
 * polys fails loudly rather than degrading quality silently.
 *
 * Decoder scope (the RFC "streamable subset" and beyond):
 *  - any blocking strategy (fixed/variable), any block-size coding;
 *  - CONSTANT / VERBATIM / FIXED (orders 0-4) / LPC (orders 1-32)
 *    subframes, wasted-bits, inter-channel decorrelation
 *    (left-side / right-side / mid-side) and 1..8 independent
 *    channels;
 *  - Rice and Rice2 residual methods, multi-partition, escape codes;
 *  - bit depths up to 24 (side channels up to 25 bits). 32-bit FLAC
 *    is a NAMED error — the Long-width residual path real 32-bit
 *    material needs is out of scope until a fixture demands it.
 *
 * The encoder is fixture-grade but CONFORMANT: fixed 4096-sample
 * blocking, CONSTANT/FIXED/VERBATIM subframe choice by exact cost,
 * per-frame stereo decorrelation choice (independent/left-side/
 * right-side/mid-side, whichever codes smallest — so round-trip
 * fixtures exercise every decode path), optimal Rice parameters over
 * partition orders 0..4, and a real MD5 signature.
 *
 * Reference behaviors modeled on the published spec only; the
 * reference engine (parquery) has no audio surface — this extends the
 * training-data-pipeline audio family (SURVEY §8).
 */
private[graft] object Flac {

  // ---------------------------------------------------------------
  // bit I/O (MSB-first, as the FLAC spec reads)
  // ---------------------------------------------------------------

  final class BitReader(val buf: Array[Byte]) {
    private var pos = 0 // absolute bit position
    private[multimodal] def bytePos: Int = {
      require((pos & 7) == 0, "unaligned byte position")
      pos >> 3
    }
    def bitsLeft: Long = buf.length.toLong * 8 - pos
    def u(n: Int): Int = uLong(n).toInt
    private[multimodal] def uLong(n: Int): Long = {
      require(n >= 0 && n <= 57, s"read width $n")
      require(bitsLeft >= n, "FLAC bitstream truncated")
      var v = 0L
      var k = n
      while (k > 0) {
        val byteIdx = pos >> 3
        val bitOff = pos & 7
        val avail = 8 - bitOff
        val take = math.min(avail, k)
        val bits = (buf(byteIdx) >> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | bits
        pos += take
        k -= take
      }
      v
    }
    /** n-bit two's-complement signed read. */
    def s(n: Int): Int = {
      if (n == 0) return 0
      val v = uLong(n)
      if ((v & (1L << (n - 1))) != 0) (v - (1L << n)).toInt else v.toInt
    }
    /** count 0 bits up to and consuming the terminating 1. */
    def unary(): Int = {
      var q = 0
      while ({ require(bitsLeft >= 1, "FLAC bitstream truncated"); u(1) == 0 }) q += 1
      q
    }
    private[multimodal] def alignByte(): Unit = pos = (pos + 7) & ~7
  }

  final class BitWriter {
    private val out = ArrayBuffer[Byte]()
    private var acc = 0
    private var nAcc = 0
    def u(v: Long, n: Int): Unit = {
      require(n >= 0 && n <= 57, s"write width $n")
      var k = n
      while (k > 0) {
        val take = math.min(8 - nAcc, k)
        val bits = ((v >>> (k - take)) & ((1L << take) - 1)).toInt
        acc = (acc << take) | bits
        nAcc += take
        k -= take
        if (nAcc == 8) { out += acc.toByte; acc = 0; nAcc = 0 }
      }
    }
    def s(v: Int, n: Int): Unit = u(v.toLong & ((1L << n) - 1), n)
    def unary(q: Int): Unit = { var i = 0; while (i < q) { u(0, 1); i += 1 }; u(1, 1) }
    def alignZero(): Unit = if (nAcc > 0) u(0, 8 - nAcc)
    /** byte-aligned snapshot of everything written so far. */
    def bytes: Array[Byte] = {
      require(nAcc == 0, "unaligned")
      out.toArray
    }
    def size: Int = { require(nAcc == 0, "unaligned"); out.length }
  }

  // ---------------------------------------------------------------
  // CRCs (poly constants from the spec; both init 0, MSB-first)
  // ---------------------------------------------------------------

  private val crc8Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF; k += 1 }
      t(i) = c; i += 1
    }
    t
  }
  private val crc16Tab: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF else (c << 1) & 0xFFFF; k += 1 }
      t(i) = c; i += 1
    }
    t
  }
  def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc8Tab(c ^ (b(i) & 0xFF)); i += 1 }
    c
  }
  def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0; var i = from
    while (i < until) { c = crc16Tab((c >> 8) ^ (b(i) & 0xFF)) ^ ((c << 8) & 0xFFFF); i += 1 }
    c
  }

  // ---------------------------------------------------------------
  // decoded PCM
  // ---------------------------------------------------------------

  /** Exact decoded audio: `data(channel)(i)` are raw integer samples
    * at `bps` bits (signed). */
  final case class Pcm(sampleRate: Int, channels: Int, bps: Int,
                       data: Array[Array[Int]]) {
    def nSamples: Int = if (data.isEmpty) 0 else data(0).length
  }

  def looksLikeFlac(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C'

  // ---------------------------------------------------------------
  // decoder
  // ---------------------------------------------------------------

  private val fixedBlockSizes = Array(0, 192, 576, 1152, 2304, 4608,
    -1, -2, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val fixedSampleRates = Array(-1, 88200, 176400, 192000, 8000,
    16000, 22050, 24000, 32000, 44100, 48000, 96000, -2, -3, -4, 0)
  private val sampleSizes = Array(0, 8, 12, -1, 16, 20, 24, 32)

  def decodePcm(bytes: Array[Byte]): Pcm = {
    require(looksLikeFlac(bytes), "not a FLAC stream (no fLaC marker)")
    val r = new BitReader(bytes)
    r.u(32) // marker
    // metadata blocks; STREAMINFO is mandatory and first (§8.1)
    var last = false
    var first = true
    var sampleRate = 0; var channels = 0; var bps = 0
    var totalSamples = 0L
    var md5 = new Array[Byte](16)
    while (!last) {
      last = r.u(1) == 1
      val typ = r.u(7)
      val len = r.u(24)
      if (first) {
        require(typ == 0, "FLAC: first metadata block is not STREAMINFO")
        require(len == 34, s"FLAC: STREAMINFO length $len != 34")
        r.u(16); r.u(16) // min/max block size
        r.u(24); r.u(24) // min/max frame size
        sampleRate = r.u(20)
        channels = r.u(3) + 1
        bps = r.u(5) + 1
        totalSamples = r.uLong(36)
        (0 until 16).foreach(i => md5(i) = r.u(8).toByte)
        require(sampleRate > 0, "FLAC: sample rate 0")
        require(bps <= 24,
          s"FLAC: $bps-bit audio unsupported (named boundary; up to 24-bit decodes)")
        first = false
      } else {
        (0 until len).foreach(_ => r.u(8)) // skip PADDING/SEEKTABLE/VORBIS_COMMENT/...
      }
    }
    val chans = Array.fill(channels)(new ArrayBuffer[Int]())
    var decoded = 0L
    while ((totalSamples == 0L && r.bitsLeft >= 16) ||
        (totalSamples > 0L && decoded < totalSamples)) {
      val got = decodeFrame(r, sampleRate, channels, bps, chans)
      decoded += got
    }
    if (totalSamples > 0L)
      require(decoded == totalSamples,
        s"FLAC: decoded $decoded of $totalSamples samples")
    val data = chans.map(_.toArray)
    if (md5.exists(_ != 0)) {
      val actual = md5Of(data, bps)
      require(java.util.Arrays.equals(actual, md5),
        "FLAC: MD5 signature mismatch (corrupt stream or decode bug)")
    }
    Pcm(sampleRate, channels, bps, data)
  }

  /** MD5 over the interleaved little-endian sample bytes (§9). */
  private def md5Of(data: Array[Array[Int]], bps: Int): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = (bps + 7) / 8
    val n = if (data.isEmpty) 0 else data(0).length
    val row = new Array[Byte](data.length * bytesPer)
    var i = 0
    while (i < n) {
      var c = 0
      while (c < data.length) {
        val v = data(c)(i)
        var b = 0
        while (b < bytesPer) { row(c * bytesPer + b) = ((v >> (8 * b)) & 0xFF).toByte; b += 1 }
        c += 1
      }
      d.update(row)
      i += 1
    }
    d.digest()
  }

  /** Decode one frame, append samples per channel, return block size. */
  private def decodeFrame(r: BitReader, siRate: Int, siChannels: Int,
                          siBps: Int, out: Array[ArrayBuffer[Int]]): Int = {
    r.alignByte()
    val startByte = r.bytePos
    require(r.u(14) == 0x3FFE, "FLAC: lost frame sync")
    r.u(1) // reserved (a conformant stream writes 0)
    r.u(1) // blocking strategy (the coded number below covers both)
    val bsBits = r.u(4)
    val srBits = r.u(4)
    val chBits = r.u(4)
    val szBits = r.u(3)
    require(r.u(1) == 0, "FLAC: frame header reserved bit set")
    readCodedNumber(r) // frame/sample number (ordering not enforced)
    val blockSize = bsBits match {
      case 0 => throw new IllegalArgumentException("FLAC: reserved block size code")
      case 6 => r.u(8) + 1
      case 7 => r.u(16) + 1
      case b => fixedBlockSizes(b)
    }
    srBits match {
      case 12 => r.u(8)
      case 13 | 14 => r.u(16)
      case 15 => throw new IllegalArgumentException("FLAC: invalid sample rate code")
      case _ => ()
    }
    val headerEnd = r.bytePos
    val wantCrc8 = r.u(8)
    require(crc8(r.buf, startByte, headerEnd) == wantCrc8,
      "FLAC: frame header CRC-8 mismatch")
    val bps = if (szBits == 0) siBps else {
      val b = sampleSizes(szBits)
      require(b > 0, "FLAC: reserved sample size code")
      b
    }
    require(bps <= 24, s"FLAC: $bps-bit frame unsupported")
    val (nCh, decor) =
      if (chBits <= 7) (chBits + 1, -1)
      else if (chBits <= 10) (2, chBits - 8) // 0=left-side 1=right-side 2=mid-side
      else throw new IllegalArgumentException("FLAC: reserved channel assignment")
    require(nCh == siChannels,
      s"FLAC: frame channel count $nCh != STREAMINFO $siChannels")
    val chData = Array.ofDim[Int](nCh, blockSize)
    var c = 0
    while (c < nCh) {
      // the side channel carries one extra bit (§9.2.2)
      val extra = decor match {
        case 0 if c == 1 => 1 // left-side: ch1 = side
        case 1 if c == 0 => 1 // right-side (side-right): ch0 = side
        case 2 if c == 1 => 1 // mid-side: ch1 = side
        case _ => 0
      }
      decodeSubframe(r, blockSize, bps + extra, chData(c))
      c += 1
    }
    r.alignByte()
    val frameEnd = r.bytePos
    val wantCrc16 = r.u(16)
    require(crc16(r.buf, startByte, frameEnd) == wantCrc16,
      "FLAC: frame CRC-16 mismatch")
    // undo inter-channel decorrelation (§4.2)
    decor match {
      case 0 => // left-side: right = left - side
        var i = 0
        while (i < blockSize) { chData(1)(i) = chData(0)(i) - chData(1)(i); i += 1 }
      case 1 => // right-side: left = side + right
        var i = 0
        while (i < blockSize) {
          val side = chData(0)(i)
          chData(0)(i) = side + chData(1)(i)
          i += 1
        }
      case 2 => // mid-side
        var i = 0
        while (i < blockSize) {
          val side = chData(1)(i)
          val m = (chData(0)(i) << 1) | (side & 1)
          chData(0)(i) = (m + side) >> 1
          chData(1)(i) = (m - side) >> 1
          i += 1
        }
      case _ => ()
    }
    c = 0
    while (c < nCh) { out(c) ++= chData(c); c += 1 }
    blockSize
  }

  /** UTF-8-style coded frame/sample number, up to 36 bits (§9.1.5). */
  def readCodedNumber(r: BitReader): Long = {
    val b0 = r.u(8)
    var ones = 0
    while (ones < 8 && ((b0 << ones) & 0x80) != 0) ones += 1
    require(ones != 1 && ones <= 7, "FLAC: malformed coded number")
    if (ones == 0) b0.toLong
    else {
      var v = (b0 & (0x7F >> ones)).toLong
      var k = 1
      while (k < ones) {
        val b = r.u(8)
        require((b & 0xC0) == 0x80, "FLAC: bad coded-number continuation")
        v = (v << 6) | (b & 0x3F)
        k += 1
      }
      v
    }
  }

  def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    require(v >= 0 && v < (1L << 36), s"coded number $v out of range")
    if (v < 0x80) w.u(v, 8)
    else {
      // find the byte count: n continuation bytes carry 6 bits each,
      // the lead byte carries (6 - n) bits (0 bits when n == 6)
      var cont = 1
      while (cont < 6 && v >= (1L << (6 * cont + (6 - cont)))) cont += 1
      val leadMarker = (0xFF << (7 - cont)) & 0xFF
      w.u(leadMarker | ((v >>> (6 * cont)) & (0x7F >> (cont + 1))), 8)
      var k = cont - 1
      while (k >= 0) { w.u(0x80 | ((v >>> (6 * k)) & 0x3F), 8); k -= 1 }
    }
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int,
                             out: Array[Int]): Unit = {
    require(r.u(1) == 0, "FLAC: subframe padding bit set")
    val typ = r.u(6)
    val wasted =
      if (r.u(1) == 1) r.unary() + 1 else 0
    val eff = bps - wasted
    require(eff > 0, "FLAC: wasted bits exceed sample size")
    if (typ == 0) { // CONSTANT
      val v = r.s(eff)
      java.util.Arrays.fill(out, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < n) { out(i) = r.s(eff); i += 1 }
    } else if ((typ & 0x38) == 0x08 && (typ & 7) <= 4) { // FIXED
      val order = typ & 7
      var i = 0
      while (i < order) { out(i) = r.s(eff); i += 1 }
      decodeResidual(r, n, order, out)
      restoreFixed(out, n, order)
    } else if ((typ & 0x20) != 0) { // LPC
      val order = (typ & 0x1F) + 1
      var i = 0
      while (i < order) { out(i) = r.s(eff); i += 1 }
      val precision = r.u(4) + 1
      require(precision <= 15, "FLAC: invalid QLP precision code")
      val shift = r.s(5)
      require(shift >= 0, "FLAC: negative LPC shift")
      val coefs = new Array[Int](order)
      i = 0
      while (i < order) { coefs(i) = r.s(precision); i += 1 }
      decodeResidual(r, n, order, out)
      i = order
      while (i < n) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j).toLong * out(i - 1 - j); j += 1 }
        out(i) += (acc >> shift).toInt
        i += 1
      }
    } else throw new IllegalArgumentException(
      s"FLAC: reserved subframe type $typ")
    if (wasted > 0) {
      var i = 0
      while (i < n) { out(i) = out(i) << wasted; i += 1 }
    }
  }

  /** The four FIXED predictors are the difference polynomials of
    * orders 1..4 (§9.2.5) — the only predictor constants in FLAC. */
  private def restoreFixed(s: Array[Int], n: Int, order: Int): Unit = {
    var i = order
    order match {
      case 0 => ()
      case 1 => while (i < n) { s(i) += s(i - 1); i += 1 }
      case 2 => while (i < n) { s(i) += 2 * s(i - 1) - s(i - 2); i += 1 }
      case 3 => while (i < n) { s(i) += 3 * s(i - 1) - 3 * s(i - 2) + s(i - 3); i += 1 }
      case 4 => while (i < n) { s(i) += 4 * s(i - 1) - 6 * s(i - 2) + 4 * s(i - 3) - s(i - 4); i += 1 }
      case _ => throw new IllegalArgumentException(s"FIXED order $order")
    }
  }

  private def decodeResidual(r: BitReader, n: Int, order: Int,
                             out: Array[Int]): Unit = {
    val method = r.u(2)
    require(method <= 1, s"FLAC: reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = r.u(4)
    val parts = 1 << partOrder
    require(n % parts == 0, "FLAC: partition order does not divide block size")
    val perPart = n / parts
    require(perPart > order,
      "FLAC: predictor order exceeds partition size")
    var p = 0
    var idx = order
    while (p < parts) {
      val cnt = if (p == 0) perPart - order else perPart
      require(cnt >= 0, "FLAC: predictor order exceeds partition")
      val param = r.u(pBits)
      if (param == escape) {
        val raw = r.u(5)
        var i = 0
        while (i < cnt) { out(idx) = if (raw == 0) 0 else r.s(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < cnt) {
          val q = r.unary()
          val rem = if (param == 0) 0 else r.u(param)
          val u = (q.toLong << param) | rem
          out(idx) = ((u >>> 1) ^ -(u & 1L)).toInt // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  /** [[AudioDecoder]]-shaped surface: mono downmix in [-1, 1]. */
  def samples(bytes: Array[Byte]): (Int, Array[Double]) = {
    val pcm = decodePcm(bytes)
    val n = pcm.nSamples
    require(n > 0, "empty FLAC stream")
    val scale = (1L << (pcm.bps - 1)).toDouble * pcm.channels
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      var acc = 0L
      var c = 0
      while (c < pcm.channels) { acc += pcm.data(c)(i); c += 1 }
      out(i) = acc / scale
      i += 1
    }
    (pcm.sampleRate, out)
  }

  // ---------------------------------------------------------------
  // encoder (fixture-grade, conformant)
  // ---------------------------------------------------------------

  private val niceBlockCodes: Map[Int, Int] = Map(
    192 -> 1, 576 -> 2, 1152 -> 3, 2304 -> 4, 4608 -> 5, 256 -> 8,
    512 -> 9, 1024 -> 10, 2048 -> 11, 4096 -> 12, 8192 -> 13,
    16384 -> 14, 32768 -> 15)

  def encode(pcm: Pcm, blockSize: Int = 4096): Array[Byte] = {
    require(pcm.channels >= 1 && pcm.channels <= 2,
      s"encoder supports 1-2 channels, got ${pcm.channels}")
    require(Seq(8, 16, 24).contains(pcm.bps), s"encoder bps ${pcm.bps}")
    require(blockSize >= 16 && blockSize <= 32768, s"block size $blockSize")
    val n = pcm.nSamples
    require(n > 0, "empty input")
    val lim = 1 << (pcm.bps - 1)
    pcm.data.foreach(ch => require(ch.forall(v => v >= -lim && v < lim),
      s"sample out of ${pcm.bps}-bit range"))
    val frames = ArrayBuffer[Array[Byte]]()
    var off = 0
    var frameNo = 0L
    var minF = Int.MaxValue; var maxF = 0
    while (off < n) {
      val bs = math.min(blockSize, n - off)
      val fb = encodeFrame(pcm, off, bs, frameNo)
      minF = math.min(minF, fb.length); maxF = math.max(maxF, fb.length)
      frames += fb
      off += bs
      frameNo += 1
    }
    val w = new BitWriter
    w.u('f', 8); w.u('L', 8); w.u('a', 8); w.u('C', 8)
    // STREAMINFO, marked last
    w.u(1, 1); w.u(0, 7); w.u(34, 24)
    w.u(blockSize, 16); w.u(blockSize, 16)
    w.u(minF, 24); w.u(maxF, 24)
    w.u(pcm.sampleRate, 20)
    w.u(pcm.channels - 1, 3)
    w.u(pcm.bps - 1, 5)
    w.u(n, 36)
    md5Of(pcm.data, pcm.bps).foreach(b => w.u(b & 0xFF, 8))
    val head = w.bytes
    val outBuf = new java.io.ByteArrayOutputStream(
      head.length + frames.map(_.length).sum)
    outBuf.write(head)
    frames.foreach(outBuf.write)
    outBuf.toByteArray
  }

  private def encodeFrame(pcm: Pcm, off: Int, bs: Int,
                          frameNo: Long): Array[Byte] = {
    val w = new BitWriter
    w.u(0x3FFE, 14) // sync
    w.u(0, 1) // reserved
    w.u(0, 1) // fixed blocking
    val (bsCode, bsTail) = niceBlockCodes.get(bs) match {
      case Some(c) => (c, -1)
      case None => (7, bs - 1)
    }
    w.u(bsCode, 4)
    w.u(0, 4) // sample rate: from STREAMINFO
    // channel assignment: pick the cheapest of the four stereo modes
    val chosen: (Int, Array[Array[Int]]) =
      if (pcm.channels == 1)
        (0, Array(pcm.data(0).slice(off, off + bs)))
      else {
        val l = pcm.data(0).slice(off, off + bs)
        val r = pcm.data(1).slice(off, off + bs)
        val side = Array.tabulate(bs)(i => l(i) - r(i))
        val mid = Array.tabulate(bs)(i => (l(i) + r(i)) >> 1)
        val cL = subframeCost(l); val cR = subframeCost(r)
        val cS = subframeCost(side); val cM = subframeCost(mid)
        val modes = Seq(
          (1, cL + cR, Array(l, r)),           // independent
          (8, cL + cS, Array(l, side)),        // left-side
          (9, cS + cR, Array(side, r)),        // right-side (side first)
          (10, cM + cS, Array(mid, side)))     // mid-side
        val best = modes.minBy(_._2)
        (best._1, best._3)
      }
    w.u(chosen._1, 4)
    val szCode = pcm.bps match { case 8 => 1; case 16 => 4; case 24 => 6 }
    w.u(szCode, 3)
    w.u(0, 1) // reserved
    writeCodedNumber(w, frameNo)
    if (bsTail >= 0) w.u(bsTail, 16)
    w.u(crc8(w.bytes, 0, w.size), 8)
    var c = 0
    while (c < chosen._2.length) {
      val extra =
        if (pcm.channels == 2 && ((chosen._1 == 8 && c == 1) ||
          (chosen._1 == 9 && c == 0) || (chosen._1 == 10 && c == 1))) 1
        else 0
      encodeSubframe(w, chosen._2(c), pcm.bps + extra)
      c += 1
    }
    w.alignZero()
    w.u(crc16(w.bytes, 0, w.size), 16)
    w.bytes
  }

  /** Order-2 sum-of-abs-residual proxy used only to pick the stereo
    * mode (the per-subframe choice below is exact-cost). */
  private def subframeCost(s: Array[Int]): Long = {
    var acc = 0L
    var i = 2
    while (i < s.length) { acc += math.abs(s(i).toLong - 2 * s(i - 1) + s(i - 2)); i += 1 }
    acc
  }

  private def fixedResidual(s: Array[Int], order: Int): Array[Int] = {
    val n = s.length
    val r = new Array[Int](n - order)
    var i = order
    while (i < n) {
      r(i - order) = order match {
        case 0 => s(i)
        case 1 => s(i) - s(i - 1)
        case 2 => s(i) - 2 * s(i - 1) + s(i - 2)
        case 3 => s(i) - 3 * s(i - 1) + 3 * s(i - 2) - s(i - 3)
        case _ => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4)
      }
      i += 1
    }
    r
  }

  /** Exact Rice cost (bits) of one partition at parameter k. */
  private def riceCost(res: Array[Int], from: Int, until: Int, k: Int): Long = {
    var bits = 0L
    var i = from
    while (i < until) {
      val z = zigzag(res(i))
      bits += (z >>> k) + 1 + k
      i += 1
    }
    bits
  }
  @inline private def zigzag(v: Int): Long = {
    val l = v.toLong
    (l << 1) ^ (l >> 63)
  }

  /** Best (param, cost) for one partition; params 0..14 (method 0). */
  private def bestRice(res: Array[Int], from: Int, until: Int): (Int, Long) = {
    var bestK = 0; var bestC = Long.MaxValue
    var k = 0
    while (k <= 14) {
      val c = riceCost(res, from, until, k)
      if (c < bestC) { bestC = c; bestK = k }
      k += 1
    }
    (bestK, bestC)
  }

  /** Residual plan: partition order + per-partition params + bit cost. */
  private def planResidual(res: Array[Int], bs: Int, order: Int)
      : (Int, Array[Int], Long) = {
    var best: (Int, Array[Int], Long) = null
    var po = 0
    while (po <= 4) {
      val parts = 1 << po
      if (bs % parts == 0 && bs / parts > order) {
        val perPart = bs / parts
        val params = new Array[Int](parts)
        var cost = 6L + 4L * parts // method+order header + param fields
        var p = 0
        while (p < parts) {
          val from = if (p == 0) 0 else p * perPart - order
          val until = (p + 1) * perPart - order
          val (k, c) = bestRice(res, from, until)
          params(p) = k; cost += c
          p += 1
        }
        if (best == null || cost < best._3) best = (po, params, cost)
      }
      po += 1
    }
    best
  }

  private def encodeSubframe(w: BitWriter, s: Array[Int], bps: Int): Unit = {
    val n = s.length
    val const = s.forall(_ == s(0))
    if (const) {
      w.u(0, 1); w.u(0, 6); w.u(0, 1)
      w.s(s(0), bps)
      return
    }
    // exact-cost choice among FIXED orders (with optimal Rice plans)
    // and VERBATIM
    var bestOrder = -1
    var bestPlan: (Int, Array[Int], Long) = null
    var bestBits = n.toLong * bps // VERBATIM cost
    var o = 0
    while (o <= 4 && o < n) {
      val res = fixedResidual(s, o)
      val plan = planResidual(res, n, o)
      if (plan != null) {
        val bits = o.toLong * bps + plan._3
        if (bits < bestBits) { bestBits = bits; bestOrder = o; bestPlan = plan }
      }
      o += 1
    }
    if (bestOrder < 0) { // VERBATIM wins (noise-like content)
      w.u(0, 1); w.u(1, 6); w.u(0, 1)
      var i = 0
      while (i < n) { w.s(s(i), bps); i += 1 }
      return
    }
    w.u(0, 1); w.u(0x08 | bestOrder, 6); w.u(0, 1)
    var i = 0
    while (i < bestOrder) { w.s(s(i), bps); i += 1 }
    val res = fixedResidual(s, bestOrder)
    val (po, params, _) = bestPlan
    w.u(0, 2) // method 0 (4-bit Rice)
    w.u(po, 4)
    val parts = 1 << po
    val perPart = n / parts
    var p = 0
    while (p < parts) {
      val from = if (p == 0) 0 else p * perPart - bestOrder
      val until = (p + 1) * perPart - bestOrder
      val k = params(p)
      w.u(k, 4)
      var j = from
      while (j < until) {
        val z = zigzag(res(j))
        w.unary((z >>> k).toInt)
        if (k > 0) w.u(z & ((1L << k) - 1), k)
        j += 1
      }
      p += 1
    }
  }

  /** 16-bit mono little-endian PCM bytes → FLAC (the fixture bridge
    * from the WAV builders). */
  def fromPcm16(pcmBytes: Array[Byte], sampleRate: Int): Array[Byte] = {
    val n = pcmBytes.length / 2
    val s = new Array[Int](n)
    var i = 0
    while (i < n) {
      s(i) = ((pcmBytes(2 * i) & 0xFF) | (pcmBytes(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    encode(Pcm(sampleRate, 1, 16, Array(s)))
  }
}
