package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-codec tests for [[Png]] (no Spark session needed). */
class PngSpec extends AnyFunSuite {

  private def mkPixels(w: Int, h: Int, ch: Int, seed: Long): Array[Byte] = {
    val px = new Array[Byte](w * h * ch)
    var i = 0
    while (i < px.length) {
      px(i) = (((seed * 31 + i * 7) ^ (i >> 3)) % 256).toByte
      i += 1
    }
    px
  }

  test("round trip preserves exact pixels for every filter type") {
    for (ft <- Seq(0, 1, 2, 3, 4, -1)) { // -1 = cycle filters per row
      val img = Png.Image(23, 17, 3, mkPixels(23, 17, 3, ft + 100L))
      val decoded = Png.decode(Png.encode(img, filterType = ft))
      assert(decoded.width == 23 && decoded.height == 17 && decoded.channels == 3)
      assert(decoded.pixels.sameElements(img.pixels), s"filter $ft")
    }
  }

  test("RGBA round trip") {
    val img = Png.Image(9, 5, 4, mkPixels(9, 5, 4, 7L))
    val decoded = Png.decode(Png.encode(img, filterType = -1))
    assert(decoded.channels == 4)
    assert(decoded.pixels.sameElements(img.pixels))
  }

  test("1x1 and single-row/column edge shapes") {
    for ((w, h) <- Seq((1, 1), (1, 13), (13, 1))) {
      val img = Png.Image(w, h, 3, mkPixels(w, h, 3, w * 100L + h))
      assert(Png.decode(Png.encode(img, filterType = -1)).pixels
        .sameElements(img.pixels))
    }
  }

  test("sniff reads header without decoding; rejects non-PNG") {
    val img = Png.Image(31, 22, 3, mkPixels(31, 22, 3, 5L))
    assert(Png.sniff(Png.encode(img)) == Some((31, 22, 3)))
    assert(Png.sniff("not a png at all".getBytes) == None)
    assert(Png.sniff(null) == None)
  }

  test("nearest-neighbor resize picks the exact source pixels") {
    val img = Png.Image(4, 4, 3, mkPixels(4, 4, 3, 9L))
    val r = Png.resizeNearest(img, 2, 2)
    assert(r.width == 2 && r.height == 2)
    // target (x,y) samples source (x*4/2, y*4/2) = (0,0),(2,0),(0,2),(2,2)
    for ((tx, ty) <- Seq((0, 0), (1, 0), (0, 1), (1, 1)); c <- 0 until 3) {
      val sx = tx * 2; val sy = ty * 2
      assert(r.pixels((ty * 2 + tx) * 3 + c) ==
        img.pixels((sy * 4 + sx) * 3 + c))
    }
  }

  test("corrupt streams are rejected loudly") {
    val good = Png.encode(Png.Image(8, 8, 3, mkPixels(8, 8, 3, 1L)))
    intercept[IllegalArgumentException](Png.decode("junk".getBytes))
    val truncated = java.util.Arrays.copyOf(good, good.length - 20)
    intercept[Exception](Png.decode(truncated))
  }

  test("synthPng corpus: decode inverts the generator for every doc/filter") {
    for (docId <- 0L until 10L) {
      val img = Png.decode(Multimodal.synthPng(docId))
      val (w, h) = Multimodal.pngDims(docId)
      assert(img.width == w && img.height == h)
      (0 until w * h * 3).foreach { i =>
        assert((img.pixels(i) & 0xff) == Multimodal.pngPixel(docId, i))
      }
    }
  }
}
