package graft.multimodal

import java.awt.image.BufferedImage

/**
 * EXIF orientation: parse (JPEG APP1 and PNG eXIf), apply, and plant.
 * Most phone photos carry their rotation as an EXIF tag (values 3/6/8
 * — the camera writes the sensor's native scan order and tags how to
 * display it); `javax.imageio` ignores the tag, so without this a
 * rotated re-upload of the same picture pHashes far from its original
 * and defeats `q_image_phash_dedup`. [[Multimodal.Codec.imagePHash]]
 * normalizes through [[orientation]]/[[normalize]] before hashing, so
 * the eight orientations of one photo collide.
 *
 * Format walks are from the public specs: JPEG marker segments (ISO
 * 10918/JEITA EXIF: APP1 = `Exif\0\0` + a TIFF block; IFD0 tag 0x0112
 * is Orientation), TIFF byte order/IFD layout, and the PNG `eXIf`
 * chunk (PNG 1.2 extension: the same TIFF block, CRC-32 chunk
 * framing). Anything unparseable degrades to orientation 1 (display
 * as stored) — a corrupt EXIF block must not fail the hash path.
 */
private[graft] object Exif {

  /** Orientation tag 1..8 from a JPEG/PNG payload; 1 when absent or
    * unparseable (display-as-stored, the tag's own default). */
  def orientation(bytes: Array[Byte]): Int =
    try {
      if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF &&
          (bytes(1) & 0xFF) == 0xD8) fromJpeg(bytes)
      else if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
          bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
        fromPng(bytes)
      else 1
    } catch { case scala.util.control.NonFatal(_) => 1 }

  private def fromJpeg(b: Array[Byte]): Int = {
    var p = 2
    while (p + 4 <= b.length) {
      if ((b(p) & 0xFF) != 0xFF) return 1
      val marker = b(p + 1) & 0xFF
      if (marker == 0xDA || marker == 0xD9) return 1 // SOS/EOI: no APP1
      val len = ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
      if (marker == 0xE1 && len >= 8 + 6 &&
          b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
          b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0)
        return fromTiff(b, p + 10, math.min(b.length, p + 2 + len))
      p += 2 + len
    }
    1
  }

  private def fromPng(b: Array[Byte]): Int = {
    var p = 8
    while (p + 8 <= b.length) {
      val len = ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
        ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
      // PNG caps chunk length at 2^31-1, so a negative read is a
      // corrupt chunk — and `p += 12 + len` with len = -12 would
      // stop advancing (an executor HANG, which no exception guard
      // catches). len > file size is equally impossible and would
      // overflow p past Int.MaxValue. Bail to the neutral answer.
      if (len < 0 || len > b.length) return 1
      val typ = new String(b, p + 4, 4, "US-ASCII")
      if (typ == "eXIf") return fromTiff(b, p + 8,
        math.min(b.length, p + 8 + len))
      if (typ == "IEND") return 1
      p += 12 + len // length + type + data + crc
    }
    1
  }

  /** Walk a TIFF block's IFD0 for tag 0x0112 (Orientation, SHORT). */
  private def fromTiff(b: Array[Byte], base: Int, end: Int): Int = {
    if (base + 8 > end) return 1
    val little = b(base) == 'I' && b(base + 1) == 'I'
    val big = b(base) == 'M' && b(base + 1) == 'M'
    if (!little && !big) return 1
    def u16(o: Int): Int =
      if (little) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    def u32(o: Int): Long =
      if (little) (u16(o) & 0xFFFFL) | ((u16(o + 2) & 0xFFFFL) << 16)
      else ((u16(o) & 0xFFFFL) << 16) | (u16(o + 2) & 0xFFFFL)
    if (u16(base + 2) != 42) return 1
    val ifd = base + u32(base + 4).toInt
    if (ifd + 2 > end) return 1
    val n = u16(ifd)
    var i = 0
    while (i < n) {
      val e = ifd + 2 + 12 * i
      if (e + 12 > end) return 1
      if (u16(e) == 0x0112 && u16(e + 2) == 3 && u32(e + 4) == 1L) {
        val v = u16(e + 8)
        return if (v >= 1 && v <= 8) v else 1
      }
      i += 1
    }
    1
  }

  /** The minimal TIFF block carrying one Orientation entry
    * (little-endian, IFD0 at offset 8, no next IFD). */
  private def tiffBlock(orientation: Int): Array[Byte] = {
    require(orientation >= 1 && orientation <= 8, s"bad $orientation")
    Array[Byte](
      'I', 'I', 42, 0, // byte order + magic
      8, 0, 0, 0, // IFD0 offset
      1, 0, // one entry
      0x12, 0x01, // tag 0x0112
      3, 0, // type SHORT
      1, 0, 0, 0, // count
      orientation.toByte, 0, 0, 0, // value (padded)
      0, 0, 0, 0) // next IFD: none
  }

  /** Insert an APP1 Exif segment right after SOI in a JPEG payload. */
  def withOrientationJpeg(jpeg: Array[Byte], orientation: Int): Array[Byte] = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xFF) == 0xFF &&
      (jpeg(1) & 0xFF) == 0xD8, "not a JPEG payload")
    val tiff = tiffBlock(orientation)
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = payload.length + 2
    val seg = Array[Byte](0xFF.toByte, 0xE1.toByte,
      ((len >> 8) & 0xFF).toByte, (len & 0xFF).toByte) ++ payload
    jpeg.take(2) ++ seg ++ jpeg.drop(2)
  }

  /** Insert an eXIf chunk right after IHDR in a PNG payload. */
  def withOrientationPng(png: Array[Byte], orientation: Int): Array[Byte] = {
    require(png.length >= 33 && (png(0) & 0xFF) == 0x89 &&
      png(1) == 'P', "not a PNG payload")
    val tiff = tiffBlock(orientation)
    val typ = "eXIf".getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(typ); crc.update(tiff)
    val c = crc.getValue
    val chunk = Array[Byte](
      ((tiff.length >> 24) & 0xFF).toByte, ((tiff.length >> 16) & 0xFF).toByte,
      ((tiff.length >> 8) & 0xFF).toByte, (tiff.length & 0xFF).toByte) ++
      typ ++ tiff ++ Array[Byte](
      ((c >> 24) & 0xFF).toByte, ((c >> 16) & 0xFF).toByte,
      ((c >> 8) & 0xFF).toByte, (c & 0xFF).toByte)
    // IHDR is always the first chunk: 8 (sig) + 25 (len+type+13+crc)
    png.take(33) ++ chunk ++ png.drop(33)
  }

  /** Apply the display transform for orientation `o` — the mapping
    * table is EXIF's own definition of the eight values. */
  def normalize(img: BufferedImage, o: Int): BufferedImage = {
    if (o <= 1 || o > 8) return img
    val w = img.getWidth
    val h = img.getHeight
    val swap = o >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    // bulk raster I/O: per-pixel getRGB/setRGB goes through the
    // ColorModel per SAMPLE — on a phone-photo-sized input that is
    // 10-50× slower than one bulk read + index arithmetic, and this
    // sits in the pHash dedup hot path
    val src = img.getRGB(0, 0, w, h, null, 0, w)
    val dst = new Array[Int](ow * oh)
    var dy = 0
    while (dy < oh) {
      var dx = 0
      while (dx < ow) {
        val (sx, sy) = o match {
          case 2 => (w - 1 - dx, dy)
          case 3 => (w - 1 - dx, h - 1 - dy)
          case 4 => (dx, h - 1 - dy)
          case 5 => (dy, dx)
          case 6 => (dy, h - 1 - dx)
          case 7 => (w - 1 - dy, h - 1 - dx)
          case _ => (w - 1 - dy, dx) // 8
        }
        dst(dy * ow + dx) = src(sy * w + sx)
        dx += 1
      }
      dy += 1
    }
    out.setRGB(0, 0, ow, oh, dst, 0, ow)
    out
  }

  /** Inverse of [[normalize]]: produce the STORED image that displays
    * as `img` under orientation `o` — the fixture's planting leg. */
  def denormalize(img: BufferedImage, o: Int): BufferedImage =
    normalize(img, o match {
      case 6 => 8
      case 8 => 6
      case other => other // 1-5 and 7 are involutions
    })
}
