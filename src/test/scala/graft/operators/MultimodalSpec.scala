package graft.operators

import graft.SparkSpec

/** JPEG (ImageIO) path: dimensions exact, lossy pixel drift bounded. */
class MultimodalSpec extends SparkSpec {

  test("synthJpeg: real JFIF bytes, exact dims, bounded mean-luma drift") {
    import spark.implicits._
    val docs = (0L until 20L).toDF("doc_id")
    val out = Multimodal.decodeJpeg(Multimodal.asJpegTable(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    (0L until 20L).foreach { id =>
      val (w, h) = Multimodal.pngDims(id)
      val (gw, gh, luma) = out(id)
      assert(gw == w && gh == h)
      // true mean luma of the generator pixels; JPEG is lossy but the DC
      // (mean) component survives well — bound the drift
      val trueMean = (0 until w * h).map { k =>
        0.299 * Multimodal.pngPixel(id, 3L * k) +
          0.587 * Multimodal.pngPixel(id, 3L * k + 1) +
          0.114 * Multimodal.pngPixel(id, 3L * k + 2)
      }.sum / (w * h)
      assert(math.abs(luma - trueMean) < 8.0,
        s"doc $id: jpeg mean luma $luma vs source $trueMean")
    }
    // the payload really is JPEG: JFIF/SOI marker
    val bytes = Multimodal.synthJpeg(5L)
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
  }
}
