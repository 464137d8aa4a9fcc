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

  test("BMP round trip is lossless and agrees with the closed-form pixels") {
    for (id <- Seq(0L, 7L, 31L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.synthBmp(id)))
      val (w, h) = Multimodal.pngDims(id)
      assert(img.getWidth == w && img.getHeight == h)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      }
      val exp = (0 until w * h).map(k => (
        Multimodal.pngPixel(id, 3L * k), Multimodal.pngPixel(id, 3L * k + 1),
        Multimodal.pngPixel(id, 3L * k + 2)))
      assert((sr, sg, sb) ==
        (exp.map(_._1.toLong).sum, exp.map(_._2.toLong).sum, exp.map(_._3.toLong).sum),
        s"doc $id: BMP pixels drifted — the codec must be lossless")
      // the payload really is BMP
      val bytes = Multimodal.synthBmp(id)
      assert(bytes(0) == 'B' && bytes(1) == 'M')
    }
  }

  test("TIFF round trip is lossless and agrees with the closed-form pixels") {
    for (id <- Seq(0L, 7L, 31L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.synthTiff(id)))
      val (w, h) = Multimodal.pngDims(id)
      assert(img != null && img.getWidth == w && img.getHeight == h)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      }
      val exp = (0 until w * h).map(k => (
        Multimodal.pngPixel(id, 3L * k), Multimodal.pngPixel(id, 3L * k + 1),
        Multimodal.pngPixel(id, 3L * k + 2)))
      assert((sr, sg, sb) ==
        (exp.map(_._1.toLong).sum, exp.map(_._2.toLong).sum, exp.map(_._3.toLong).sum),
        s"doc $id: TIFF pixels drifted — the codec must be lossless")
      // the payload really is TIFF (II*\0 little-endian or MM\0* big-endian)
      val b = Multimodal.synthTiff(id)
      assert((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))
    }
  }

  test("dHash: groupmates collide, perturbed mates stay near, strangers stay far") {
    import spark.implicits._
    // seeds=8 so tiny fixtures still share groups: 1 and 9 are exact
    // duplicates (same seed, neither perturbed); 2 and 10 likewise;
    // 0 and 8 share a seed but 0 is perturbed (doc%5==0) → near-dup;
    // cross-seed pairs are random-distance
    val docs = (0L to 15L).toDF("doc_id")
    val hashes = Multimodal.dhash56(
      Multimodal.asPngTableGrouped(docs, seeds = 8))
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(9L) && hs(2L) == hs(10L),
      "unperturbed groupmates must hash identically")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0L), hs(8L)) <= 6,
      s"perturbed groupmate too far: ${ham(hs(0L), hs(8L))}")
    assert(ham(hs(1L), hs(2L)) > 6,
      s"different seeds suspiciously close: ${ham(hs(1L), hs(2L))}")

    // the generic banding finds exactly the brute-force pairs
    val got = Dedup.hammingPairs(hashes, "doc_id", "dhash", 56, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (a, ha) <- hs.toSeq; (b, hb) <- hs.toSeq
      if a < b && ham(ha, hb) <= 3
    } yield (a, b, ham(ha, hb).toLong)).toSet
    assert(got == want, s"banding diverged from brute force: $got vs $want")
    assert(want.nonEmpty, "fixture must produce at least one pair")
  }

  test("audio fingerprint: groupmates collide; banding == brute force") {
    import spark.implicits._
    val docs = (0L to 15L).toDF("doc_id")
    val hashes = Multimodal.audioFingerprint56(
      Multimodal.asWavTableGrouped(docs, seeds = 8))
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hs(1L) == hs(9L), "unperturbed groupmates must hash identically")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0L), hs(8L)) <= 8,
      s"perturbed groupmate too far: ${ham(hs(0L), hs(8L))}")
    val got = Dedup.hammingPairs(hashes, "doc_id", "afp", 56, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (a, ha) <- hs.toSeq; (b, hb) <- hs.toSeq
      if a < b && ham(ha, hb) <= 3
    } yield (a, b, ham(ha, hb).toLong)).toSet
    assert(got == want && want.nonEmpty,
      s"banding diverged from brute force: $got vs $want")
  }

  test("video near-dup: perturbed frame tolerated, pairs == brute-force set overlap") {
    import spark.implicits._
    val docs = (0L to 15L).toDF("doc_id")
    val fh = Multimodal.videoFrameHashes(
      Multimodal.asAviTableGrouped(docs, seeds = 8))
    val sets = fh.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    // doc 0 is perturbed on frame 0 only; 8 shares its seed → all OTHER
    // frames still match, so the pair clears minShared = 2
    assert(sets(0L).intersect(sets(8L)).size >= 2,
      "perturbed groupmates must still share non-perturbed frames")
    val got = Multimodal.videoNearDups(fh, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq
      if a < b
      n = sa.intersect(sb).size if n >= 2
    } yield (a, b, n.toLong)).toSet
    assert(got == want && want.nonEmpty,
      s"posting join diverged from brute-force set overlap: $got vs $want")
  }

  test("GIF gray round trip is lossless and agrees with the closed-form pixels") {
    for (id <- Seq(0L, 7L, 31L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.synthGif(id)))
      val (w, h) = Multimodal.pngDims(id)
      assert(img.getWidth == w && img.getHeight == h)
      var s = 0L
      for (y <- 0 until h; x <- 0 until w) s += img.getRGB(x, y) & 0xff
      val exp = (0 until w * h).map(k => (id * 31 + k * 7) % 256).sum
      assert(s == exp, s"doc $id: GIF grays drifted — palette must be exact")
      // the payload really is GIF
      val bytes = Multimodal.synthGif(id)
      assert(new String(bytes.take(6), "US-ASCII").startsWith("GIF8"))
    }
  }
}
