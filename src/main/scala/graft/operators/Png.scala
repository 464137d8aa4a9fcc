package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal real PNG codec in pure JDK (no external libraries): 8-bit
  * non-interlaced truecolor (RGB) and truecolor+alpha (RGBA), all five
  * scanline filter types. Implemented from the public PNG specification
  * (W3C PNG, second edition / RFC 2083): signature, IHDR/IDAT/IEND
  * chunk layout, zlib-wrapped DEFLATE pixel stream
  * (`java.util.zip.Deflater`/`Inflater`), and the None/Sub/Up/Average/
  * Paeth filter reconstruction (spec §9, including the Paeth predictor
  * tie-breaking order).
  *
  * This makes the multimodal image path REAL: pipelines carry genuine
  * PNG bytes through the binary column and the decoder reconstructs
  * exact pixels; JPEG/BMP/GIF/TIFF ride `javax.imageio` and audio/video
  * ride [[Wav]]/[[Avi]] — every decode path in [[Multimodal]] is real.
  */
object Png {

  private val Signature = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  // -------------------------------------------------------------- encode

  /** Encode 8-bit pixels (RGB if channels=3, RGBA if 4, row-major,
    * interleaved) as a PNG. `filterType` selects the scanline filter
    * applied to every row (0-4); -1 cycles `row % 5` so round-trip tests
    * exercise every reconstruction path. */
  def encode(img: Image, filterType: Int = 0): Array[Byte] = {
    require(img.channels == 3 || img.channels == 4,
      s"channels must be 3 or 4, got ${img.channels}")
    require(img.pixels.length == img.width * img.height * img.channels,
      "pixel buffer size mismatch")
    val bpp = img.channels
    val stride = img.width * bpp
    val raw = new Array[Byte]((stride + 1) * img.height)
    var y = 0
    while (y < img.height) {
      val ft = if (filterType == -1) y % 5 else filterType
      raw(y * (stride + 1)) = ft.toByte
      var x = 0
      while (x < stride) {
        val cur = img.pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) img.pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) img.pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = filtered.toByte
        x += 1
      }
      y += 1
    }

    val out = new ByteArrayOutputStream()
    out.write(Signature)
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(img.width).putInt(img.height)
    ihdr.put(8.toByte) // bit depth
    ihdr.put((if (bpp == 3) 2 else 6).toByte) // color type
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/no-interlace
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", deflate(raw))
    writeChunk(out, "IEND", Array.empty)
    out.toByteArray
  }

  // -------------------------------------------------------------- decode

  /** Decode a PNG produced by any conforming encoder, limited to 8-bit
    * non-interlaced color types 2 (RGB) and 6 (RGBA). Returns exact
    * reconstructed pixels. */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length > 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
      "not a PNG (bad signature)")
    var pos = 8
    var width = 0; var height = 0; var channels = 0
    val idat = new ByteArrayOutputStream()
    var seenEnd = false
    while (!seenEnd && pos + 8 <= bytes.length) {
      val len = ByteBuffer.wrap(bytes, pos, 4).getInt
      require(len >= 0 && pos + 8 + len.toLong <= bytes.length,
        s"bad chunk length $len at offset $pos") // a negative length would
      // stall the walk forever; decoders run in executor tasks
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      ctype match {
        case "IHDR" =>
          val b = ByteBuffer.wrap(bytes, dataOff, len)
          width = b.getInt; height = b.getInt
          val depth = b.get(); val color = b.get()
          b.get(); b.get() // compression, filter method (always 0)
          val interlace = b.get()
          require(depth == 8, s"unsupported bit depth $depth (only 8)")
          require(color == 2 || color == 6, s"unsupported color type $color")
          require(interlace == 0, "interlaced PNG not supported")
          channels = if (color == 2) 3 else 4
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => seenEnd = true
        case _ => // ancillary chunk: skip
      }
      pos = dataOff + len + 4 // + CRC
    }
    require(width > 0 && height > 0 && channels > 0, "missing IHDR")
    // corrupted dimensions must not drive a huge allocation: the raw
    // buffer can never legitimately exceed the compressed stream by more
    // than deflate's theoretical max ratio ~1032:1
    require(width.toLong * height * channels < (1L << 31)
      && width.toLong * height <= 1032L * math.max(1, idat.size()),
      s"implausible dimensions ${width}x$height for ${idat.size()} IDAT bytes")

    val stride = width * channels
    val raw = inflate(idat.toByteArray, (stride + 1) * height)
    val px = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      var x = 0
      while (x < stride) {
        val f = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= channels) px(y * stride + x - channels) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= channels && y > 0) px((y - 1) * stride + x - channels) & 0xff else 0
        val recon = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + (left + up) / 2
          case 4 => f + paeth(left, up, ul)
          case other => throw new IllegalArgumentException(s"bad filter $other")
        }
        px(y * stride + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    Image(width, height, channels, px)
  }

  /** Header-only sniff (width, height, channels) without inflating pixel
    * data — the cheap path for metadata extraction over a media column. */
  def sniff(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    if (bytes == null || bytes.length < 33 ||
      Signature.indices.exists(i => bytes(i) != Signature(i))) None
    else {
      val b = ByteBuffer.wrap(bytes, 16, 10)
      val w = b.getInt; val h = b.getInt
      val depth = b.get(); val color = b.get()
      if (depth != 8 || (color != 2 && color != 6)) None
      else Some((w, h, if (color == 2) 3 else 4))
    }

  /** Nearest-neighbor resample — a REAL resize over decoded pixels. */
  def resizeNearest(img: Image, tw: Int, th: Int): Image = {
    val out = new Array[Byte](tw * th * img.channels)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * img.height / th).toInt
      var x = 0
      while (x < tw) {
        val sx = (x.toLong * img.width / tw).toInt
        var c = 0
        while (c < img.channels) {
          out((y * tw + x) * img.channels + c) =
            img.pixels((sy * img.width + sx) * img.channels + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Image(tw, th, img.channels, out)
  }

  /** Area (box-average) resample with integer-exact arithmetic — the
    * anti-aliasing downscale filter. The source is cropped to the largest
    * block-aligned region (block = `(width/tw) × (height/th)` source
    * pixels per target pixel) and each target component is the floor
    * average of its block. Every step is integer (sum + one floor
    * division), so an oracle can replay it in closed form — no float
    * rounding to diverge on. */
  def resizeArea(img: Image, tw: Int, th: Int): Image = {
    val bw = img.width / tw
    val bh = img.height / th
    require(bw >= 1 && bh >= 1,
      s"area resample needs tw<=width, th<=height (got ${tw}x$th from ${img.width}x${img.height})")
    val c = img.channels
    val area = bw * bh
    val out = new Array[Byte](tw * th * c)
    var ty = 0
    while (ty < th) {
      var tx = 0
      while (tx < tw) {
        var ch = 0
        while (ch < c) {
          var s = 0L
          var by = 0
          while (by < bh) {
            var bx = 0
            while (bx < bw) {
              s += img.pixels(((ty * bh + by) * img.width + tx * bw + bx) * c + ch) & 0xff
              bx += 1
            }
            by += 1
          }
          out((ty * tw + tx) * c + ch) = (s / area).toByte
          ch += 1
        }
        tx += 1
      }
      ty += 1
    }
    Image(tw, th, c, out)
  }

  // ------------------------------------------------------------- helpers

  /** Paeth predictor with the spec's tie-break order (left, up, upleft). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: ByteArrayOutputStream, ctype: String,
                         data: Array[Byte]): Unit = {
    out.write(ByteBuffer.allocate(4).putInt(data.length).array())
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb)
    out.write(data)
    val crc = new CRC32()
    crc.update(tb)
    crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var off = 0
    while (off < expected && !inf.finished()) {
      val n = inf.inflate(out, off, expected - off)
      if (n == 0 && inf.needsInput()) throw new IllegalArgumentException(
        "truncated IDAT stream")
      off += n
    }
    inf.end()
    require(off == expected, s"IDAT inflated to $off bytes, expected $expected")
    out
  }
}
