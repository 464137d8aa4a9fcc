package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-codec tests for [[Wav]] (no Spark session needed). */
class WavSpec extends AnyFunSuite {

  private def mkSamples(n: Int, seed: Long): Array[Short] =
    Array.tabulate(n)(i => (((seed * 7 + i * 13) % 65536) - 32768).toShort)

  test("round trip preserves exact samples, rate, channels") {
    for ((n, ch, sr) <- Seq((512, 1, 16000), (300, 2, 44100), (1, 1, 8000))) {
      val a = Wav.Audio(sr, ch, mkSamples(n * ch, n))
      val d = Wav.decode(Wav.encode(a))
      assert(d.sampleRate == sr && d.channels == ch)
      assert(d.samples.sameElements(a.samples))
    }
  }

  test("decoder skips unknown ancillary chunks") {
    val a = Wav.Audio(16000, 1, mkSamples(64, 3))
    val enc = Wav.encode(a)
    // splice a LIST chunk between fmt and data (byte 36 is the data header)
    val list = "LIST".getBytes ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes
    val spliced = enc.take(36) ++ list ++ enc.drop(36)
    assert(Wav.decode(spliced).samples.sameElements(a.samples))
  }

  test("rejects non-PCM and truncated streams loudly") {
    intercept[IllegalArgumentException](Wav.decode("RIFFjunk".getBytes))
    val good = Wav.encode(Wav.Audio(16000, 1, mkSamples(64, 1)))
    val nonPcm = good.clone
    nonPcm(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException](Wav.decode(nonPcm))
    assert(Wav.sniff("not audio".getBytes) == None)
    assert(Wav.sniff(good) == Some((16000, 1, 64)))
  }

  test("frame energies and zero crossings, hand-checked") {
    val a = Wav.Audio(16000, 1, Array[Short](3, -4, 5, 0, -2))
    // frames of 2: [9+16, 25+0, 4]
    assert(Wav.frameEnergies(a, 2).toSeq == Seq(25L, 25L, 4L))
    // sign flips: 3/-4, -4/5, 0/-2 (0 counts as non-negative)
    assert(Wav.zeroCrossings(a) == 3L)
  }

  test("synthWav corpus: decode inverts the generator") {
    for (docId <- 0L until 8L) {
      val a = Wav.decode(Multimodal.synthWav(docId))
      assert(a.samples.length == Multimodal.wavLen(docId))
      a.samples.indices.foreach { i =>
        assert(a.samples(i).toInt == Multimodal.wavSample(docId, i))
      }
    }
  }
}
