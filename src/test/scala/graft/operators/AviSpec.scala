package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-container tests for [[Avi]] (no Spark session needed). */
class AviSpec extends AnyFunSuite {

  private def mkFrame(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(j => ((seed * 17 + j * 5) % 256).toByte)

  test("round trip preserves dimensions, fps, and exact frame bytes") {
    val frames = (0 until 5).map(mkFrame(6, 4, _))
    val v = Avi.Video(6, 4, 10, frames)
    val d = Avi.decode(Avi.encode(v))
    assert(d.width == 6 && d.height == 4 && d.fps == 10)
    assert(d.frames.length == 5)
    d.frames.zip(frames).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("odd-length frames survive RIFF word alignment") {
    // 3x3 RGB = 27 bytes per frame (odd) — chunk padding must not leak
    val frames = (0 until 3).map(mkFrame(3, 3, _))
    val d = Avi.decode(Avi.encode(Avi.Video(3, 3, 5, frames)))
    d.frames.zip(frames).foreach { case (a, b) =>
      assert(a.length == 27 && a.sameElements(b))
    }
  }

  test("sampleFrames: evenly spaced, first frame included, n capped at total") {
    val v = Avi.Video(2, 2, 10, (0 until 10).map(mkFrame(2, 2, _)))
    assert(Avi.sampleFrames(v, 4).map(_._1) == Seq(0, 2, 5, 7))
    assert(Avi.sampleFrames(v, 20).map(_._1) == (0 until 10))
    val v3 = Avi.Video(2, 2, 10, (0 until 3).map(mkFrame(2, 2, _)))
    assert(Avi.sampleFrames(v3, 4).map(_._1) == Seq(0, 1, 2))
  }

  test("rejects non-AVI and compressed streams loudly") {
    intercept[IllegalArgumentException](Avi.decode("RIFFxxxx".getBytes))
    val good = Avi.encode(Avi.Video(2, 2, 10, Seq(mkFrame(2, 2, 1))))
    // flip biCompression (strf offset: find 'strf' then +8 header +16)
    val idx = good.indexOfSlice("strf".getBytes)
    val bad = good.clone
    bad(idx + 8 + 16) = 1
    intercept[IllegalArgumentException](Avi.decode(bad))
  }

  test("synthAvi corpus: demux inverts the generator") {
    for (docId <- 0L until 6L) {
      val v = Avi.decode(Multimodal.synthAvi(docId))
      assert(v.frames.length == Multimodal.aviFrames(docId))
      v.frames.zipWithIndex.foreach { case (f, fi) =>
        f.indices.foreach { j =>
          assert((f(j) & 0xff) == Multimodal.aviPixel(docId, fi, j))
        }
      }
    }
  }
}
