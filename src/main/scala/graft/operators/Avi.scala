package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal real AVI (RIFF) container codec in pure JDK, for uncompressed
  * RGB24 ("DIB") video frames: `RIFF('AVI ' LIST('hdrl' 'avih' ...
  * LIST('strl' 'strh' 'strf')) LIST('movi' '00db'×frames))`, written and
  * demuxed from the public RIFF/AVI container description (the same
  * chunk machinery as [[Wav]]; biCompression=0 / BI_RGB frames).
  *
  * This makes VIDEO frame-sampling real at the container level: the
  * demuxer walks the movi list and returns exact frame payloads
  * ([[Multimodal.sampleVideoFrames]] is the DataFrame-level operator).
  * Compressed codecs (H.264 & co) remain honestly out of scope: they
  * need external decoder libraries; the container/demux plumbing here
  * is the Spark-side part a real pipeline exercises.
  */
object Avi {

  final case class Video(width: Int, height: Int, fps: Int,
                         frames: Seq[Array[Byte]])

  private val FrameHeader = "00db" // stream 0, uncompressed DIB

  /** Encode RGB24 frames (each `width*height*3` bytes) as an AVI. */
  def encode(v: Video): Array[Byte] = {
    require(v.frames.nonEmpty, "at least one frame")
    val frameSize = v.width * v.height * 3
    v.frames.foreach(f => require(f.length == frameSize,
      s"frame size ${f.length} != $frameSize"))

    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + data.length + (data.length & 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
        .put(kind.getBytes("US-ASCII")).put(body)
      b.array()
    }

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / v.fps) // microseconds per frame
      .putInt(frameSize * v.fps) // max bytes per sec
      .putInt(0).putInt(0)
      .putInt(v.frames.length)
      .putInt(0).putInt(1) // streams
      .putInt(frameSize)
      .putInt(v.width).putInt(v.height)
      .putInt(0).putInt(0).putInt(0).putInt(0)

    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0)
      .putInt(1).putInt(v.fps) // rate/scale: fps frames per second
      .putInt(0).putInt(v.frames.length)
      .putInt(frameSize).putInt(-1).putInt(0)
      .putShort(0).putShort(0)
      .putShort(v.width.toShort).putShort(v.height.toShort)

    val strf = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40) // BITMAPINFOHEADER size
      .putInt(v.width).putInt(v.height)
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0) // BI_RGB (uncompressed)
      .putInt(frameSize)
      .putInt(0).putInt(0).putInt(0).putInt(0)

    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi",
      v.frames.map(f => chunk(FrameHeader, f)).reduce(_ ++ _))

    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = new ByteArrayOutputStream()
    val riff = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes("US-ASCII")).putInt(body.length)
    out.write(riff.array()); out.write(body)
    out.toByteArray
  }

  /** Demux an AVI: header metadata + every uncompressed frame payload.
    * Walks LIST trees, skips unknown chunks, rejects compressed streams
    * loudly (biCompression != 0 needs a real codec). */
  def decode(bytes: Array[Byte]): Video = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val b = new Array[Byte](n); buf.get(b); new String(b, "US-ASCII")
    }
    require(buf.remaining() >= 12 && ascii(4) == "RIFF", "not a RIFF stream")
    buf.getInt
    require(ascii(4) == "AVI ", "not an AVI stream")

    var width = 0; var height = 0; var fps = 0
    val frames = Seq.newBuilder[Array[Byte]]

    def walk(end: Int): Unit =
      while (buf.position() + 8 <= end) {
        val id = ascii(4)
        val len = buf.getInt
        require(len >= 0 && buf.position() + len.toLong <= bytes.length,
          s"bad chunk length $len for '$id'") // negative lengths would walk
        // backwards forever; the demuxer runs in executor tasks
        val dataEnd = buf.position() + len
        id match {
          case "LIST" =>
            ascii(4) // list kind; recurse into hdrl/strl/movi alike
            walk(dataEnd)
          case "avih" =>
            val usPerFrame = buf.getInt
            if (usPerFrame > 0) fps = 1000000 / usPerFrame
            buf.position(buf.position() + 28)
            width = buf.getInt; height = buf.getInt
          case "strf" =>
            buf.getInt; buf.getInt; buf.getInt // size, w, h
            buf.getShort; buf.getShort
            val compression = buf.getInt
            require(compression == 0,
              s"compressed AVI stream (fourcc $compression) needs a codec")
          case s if s == FrameHeader || s == "00dc" =>
            require(len >= 0 && len <= buf.remaining(),
              s"frame chunk length $len exceeds stream (${buf.remaining()} left)")
            val f = new Array[Byte](len)
            buf.get(f)
            frames += f
          case _ => // ancillary chunk (idx1, INFO, ...)
        }
        buf.position(dataEnd + (len & 1))
      }

    walk(bytes.length)
    val fs = frames.result()
    require(width > 0 && height > 0, "missing avih header")
    require(fs.nonEmpty, "no frames in movi list")
    Video(width, height, fps, fs)
  }

  /** `n` evenly spaced frames (first frame always included): index i of
    * n maps to frame ⌊i·total/n⌋ — the keyframe-free uniform sampling a
    * feature pipeline uses. */
  def sampleFrames(v: Video, n: Int): Seq[(Int, Array[Byte])] = {
    require(n > 0, "n must be positive")
    val take = math.min(n, v.frames.length)
    (0 until take).map { i =>
      val idx = (i.toLong * v.frames.length / take).toInt
      (idx, v.frames(idx))
    }
  }
}
