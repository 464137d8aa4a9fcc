package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal real WAV (RIFF/PCM) codec in pure JDK: 16-bit little-endian
  * PCM, mono or interleaved multi-channel. Implemented from the public
  * RIFF/WAVE format description (the canonical 44-byte header: RIFF
  * chunk, fmt  subchunk with audioFormat=1/PCM, data subchunk), tolerant
  * of extra ancillary chunks on decode.
  *
  * Together with [[Png]] and [[Avi]] this makes every multimodal payload
  * type REAL — audio pipelines carry genuine WAV bytes and the decoder
  * recovers exact samples.
  */
object Wav {

  final case class Audio(sampleRate: Int, channels: Int,
                         samples: Array[Short])

  /** Encode PCM16 samples (interleaved if multi-channel) as a WAV file. */
  def encode(a: Audio): Array[Byte] = {
    require(a.channels >= 1, "at least one channel")
    val dataLen = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    val byteRate = a.sampleRate * a.channels * 2
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(a.channels.toShort)
      .putInt(a.sampleRate)
      .putInt(byteRate)
      .putShort((a.channels * 2).toShort) // block align
      .putShort(16.toShort) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a PCM16 WAV (any conforming encoder; non-PCM or non-16-bit
    * streams are rejected loudly; unknown chunks are skipped). */
  def decode(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44, "too short for a WAV header")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val b = new Array[Byte](n); buf.get(b); new String(b, "US-ASCII")
    }
    require(ascii(4) == "RIFF", "not a RIFF stream")
    buf.getInt // riff size (unreliable in the wild; ignored)
    require(ascii(4) == "WAVE", "not a WAVE stream")
    var sampleRate = 0; var channels = 0
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = ascii(4)
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"bad chunk length $len for '$id'") // negative lengths would walk
      // backwards forever; decoders run in executor tasks
      id match {
        case "fmt " =>
          val fmtEnd = buf.position() + len
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"unsupported audio format $audioFormat (only PCM)")
          channels = buf.getShort
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          val bits = buf.getShort
          require(bits == 16, s"unsupported bit depth $bits (only 16)")
          buf.position(fmtEnd)
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          require(len >= 0 && len <= buf.remaining(),
            s"data chunk length $len exceeds stream (${buf.remaining()} left)")
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = buf.getShort; i += 1 }
          samples = out
        case _ =>
          buf.position(buf.position() + len + (len & 1)) // chunks are word-aligned
      }
    }
    require(samples != null, "missing data chunk")
    Audio(sampleRate, channels, samples)
  }

  /** Header-only sniff: (sampleRate, channels, nSamples). */
  def sniff(bytes: Array[Byte]): Option[(Int, Int, Int)] =
    try {
      val a = decode(bytes) // WAV headers are cheap; full decode is fine at sniff sizes
      Some((a.sampleRate, a.channels, a.samples.length))
    } catch { case _: Exception => None }

  /** Per-frame energy (sum of squared samples, exact integer math) —
    * the fbank-precursor framing an audio pipeline computes. Tail
    * samples short of a full frame form a final partial frame. */
  def frameEnergies(a: Audio, frameLen: Int): Array[Long] = {
    require(frameLen > 0, "frameLen must be positive")
    val n = a.samples.length
    val frames = (n + frameLen - 1) / frameLen
    val out = new Array[Long](frames)
    var i = 0
    while (i < n) {
      val s = a.samples(i).toLong
      out(i / frameLen) += s * s
      i += 1
    }
    out
  }

  /** Zero-crossing count: adjacent samples with differing sign bit
    * (negative vs non-negative) — integer-exact. */
  def zeroCrossings(a: Audio): Long = {
    var zc = 0L
    var i = 1
    while (i < a.samples.length) {
      if ((a.samples(i) < 0) != (a.samples(i - 1) < 0)) zc += 1
      i += 1
    }
    zc
  }
}
