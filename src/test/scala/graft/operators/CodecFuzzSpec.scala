package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Fuzz the pure-JDK codecs: random bytes and truncations of valid
  * streams must fail FAST with an exception — never hang, loop, or
  * return fabricated data. (Decoders run inside executor tasks; a hang
  * there stalls a whole stage.) */
class CodecFuzzSpec extends AnyFunSuite {

  private val validPng = Png.encode(Png.Image(9, 7, 3,
    Array.tabulate(9 * 7 * 3)(i => (i * 31 % 256).toByte)), filterType = -1)
  private val validWav = Wav.encode(Wav.Audio(16000, 1,
    Array.tabulate(200)(i => (i * 313 % 65536 - 32768).toShort)))
  private val validAvi = Avi.encode(Avi.Video(4, 3, 10,
    (0 until 3).map(f => Array.tabulate(36)(j => ((f * 77 + j) % 256).toByte))))

  private def fuzzOne(name: String, decode: Array[Byte] => Any,
                      valid: Array[Byte]): Unit = {
    val rnd = new scala.util.Random(42)
    // pure random buffers
    for (len <- Seq(0, 1, 7, 44, 200, 4096)) {
      val junk = Array.fill(len)(rnd.nextInt(256).toByte)
      intercept[Exception](decode(junk))
    }
    // every truncation of a valid stream (stepped for speed)
    for (cut <- 0 until valid.length by 7) {
      try decode(java.util.Arrays.copyOf(valid, cut))
      catch { case _: Exception => } // must throw or return; never hang
    }
    // single-byte corruptions of the header region
    for (i <- 0 until math.min(64, valid.length)) {
      val bad = valid.clone
      bad(i) = (bad(i) ^ 0xff).toByte
      try decode(bad) catch { case _: Exception => }
    }
    // the valid stream itself still decodes after all that
    decode(valid)
  }

  test("PNG decoder: random/truncated/corrupt input fails fast")(
    fuzzOne("png", Png.decode, validPng))

  test("WAV decoder: random/truncated/corrupt input fails fast")(
    fuzzOne("wav", Wav.decode, validWav))

  test("AVI demuxer: random/truncated/corrupt input fails fast")(
    fuzzOne("avi", Avi.decode, validAvi))

  test("negative chunk lengths in unknown-chunk paths reject, never loop") {
    // craft an UNKNOWN chunk id with length -8: a skip of len+(len&1)
    // exactly cancels the 8 header bytes — the walk would spin forever
    // without the length guard (single-byte fuzz flips can't build this)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def be32(v: Int) = le32(v).reverse

    val wavBad = validWav.take(12) ++ "JUNK".getBytes ++ le32(-8) ++
      validWav.drop(12)
    intercept[IllegalArgumentException](Wav.decode(wavBad))

    val aviBad = validAvi.take(12) ++ "JUNK".getBytes ++ le32(-8) ++
      validAvi.drop(12)
    intercept[IllegalArgumentException](Avi.decode(aviBad))

    // PNG lengths are big-endian; insert after the IHDR chunk (8+25 bytes)
    val pngBad = validPng.take(33) ++ be32(-12) ++ "juNk".getBytes ++
      validPng.drop(33)
    intercept[IllegalArgumentException](Png.decode(pngBad))
  }
}
