package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.embeddingNearDup]] — the corpus-dimensioned LSH layout,
  * the default entry point since round 6 —
  * against brute-force truth and the fixed-layout twin. Vectors are
  * deterministic (seeded scala.util.Random per id), with planted
  * near-duplicate pairs at cosine ≈ 0.95 so the high-threshold regime
  * (where the scaled layout's linearity claim lives) has real positives. */
class EmbeddingNearDupSpec extends SparkSpec {
  import spark.implicits._

  /** n base unit vectors + a jittered near-copy of every 10th one. */
  private def corpus(n: Int, dims: Int = 32) = {
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      val v = Array.fill(dims)(r.nextGaussian().toFloat)
      val norm = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / norm)
    }
    val base = (0 until n).map(i => (i.toLong, vec(i)))
    val dups = (0 until n by 10).map { i =>
      val b = vec(i)
      val j = vec(i + 1000000) // independent jitter direction
      val mixed = b.zip(j).map { case (x, y) => x + 0.2f * y }
      val norm = math.sqrt(mixed.map(x => x * x.toDouble).sum).toFloat
      ((n + i).toLong, mixed.map(_ / norm))
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("scaled layout matches brute-force truth at a high threshold") {
    val emb = corpus(300)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(Dedup.embeddingNearDupBrute(emb, "vec_id", "embedding", 0.8))
    assert(truth.nonEmpty, "planted near-dups must survive the threshold")
    val fixed = pairs(Dedup.embeddingNearDupFixed(emb, "vec_id", "embedding", 0.8, dims = 32))
    val scaled = pairs(Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.8,
      dims = 32))
    assert(fixed == truth, s"fixed layout diverged: ${fixed.diff(truth)} / ${truth.diff(fixed)}")
    assert(scaled == truth, s"scaled layout diverged: missing ${truth.diff(scaled).take(5)}")
  }

  test("layout solver: cost-optimal over the feasible grid, never worse than the occupancy rule") {
    // round 7: the solver minimizes estimated candidate volume
    // (lshLayoutCost) over planes × radius instead of pinning
    // per-bucket occupancy at 16 with the caller's radius verbatim.
    // Pin the INVARIANTS, not the chosen constants:
    for (n <- Seq(100L, 2000L, 20000L, 200000L, 1L << 40);
         theta <- Seq(0.6, 0.8, 0.9)) {
      val (planes, tables, radius) = Dedup.lshLayout(n, theta, 16, 1e-6, 2, 48)
      assert(planes >= 1 && planes <= 20 && radius >= 0 && radius <= 2)
      assert(tables >= 2 && tables <= 48)
      // (a) the miss bound holds for the chosen triple
      assert(Dedup.lshMissRate(planes, tables, theta, radius) <= 1e-6)
      // (b) chosen cost is the grid minimum: no feasible (p, r) pair
      // with its compensating table count beats it
      val chosen = Dedup.lshLayoutCost(n, planes, radius, tables)
      for (p <- 1 to 20; r <- 0 to math.min(2, p)) {
        val t = (2 to 48).find(t => Dedup.lshMissRate(p, t, theta, r) <= 1e-6)
        t.foreach { t =>
          assert(chosen <= Dedup.lshLayoutCost(n, p, r, t) * (1 + 1e-9),
            s"n=$n θ=$theta: chosen ($planes,$radius,$tables)=$chosen beaten by ($p,$r,$t)")
        }
      }
    }
    // the old occupancy rule's 210k/θ=0.8 pick (planes 14, r 2, 26
    // tables) is strictly beaten — the layout that filled a disk at the
    // 100× probe can no longer be chosen
    val (p8, t8, r8) = Dedup.lshLayout(210000L, 0.8, 16, 1e-6, 2, 48)
    assert(Dedup.lshLayoutCost(210000L, p8, r8, t8) <
      Dedup.lshLayoutCost(210000L, 14, 2, 26) / 2,
      s"solver pick ($p8,$r8,$t8) should at least halve the occupancy layout's volume")
  }

  test("layout solver: the miss target HOLDS at every (n, θ) — the cap backs off planes, never recall") {
    // the sf1 regression: at n=50k / θ=0.45 the old clamp left the
    // effective per-pair miss rate ~5e-4 and dropped a true pair; the
    // solver must now deliver ≤ missTarget everywhere, trading planes
    // (candidate volume) instead
    // probeRadius 0 included: single-probe layouts need far more table
    // compensation, which is where the old 4-plane floor + min() clamp
    // silently degraded the bound (review finding, round 6) — the
    // solver now backs planes off as far as 1 before it may fail, and
    // failing is a THROW, never a degraded layout
    for (n <- Seq(1000L, 50000L, 5000000L, 1L << 40);
         theta <- Seq(0.45, 0.6, 0.8, 0.95);
         probe <- Seq(0, 1, 2)) {
      val (planes, tables, radius) = Dedup.lshLayout(n, theta, 16, 1e-6, probe, 48)
      val miss = Dedup.lshMissRate(planes, tables, theta, radius)
      assert(tables <= 48 && planes >= 1 && radius <= probe)
      assert(miss <= 1e-6,
        f"n=$n θ=$theta probe=$probe planes=$planes tables=$tables radius=$radius miss=$miss%.2e")
    }
    // a genuinely infeasible corner refuses to ship a bad layout
    assertThrows[IllegalArgumentException] {
      Dedup.lshLayout(1L << 40, 0.45, 16, 1e-12, 0, 4)
    }
    // and sparse thresholds stay CHEAP: θ=0.95 at huge n compensates
    // well inside the cap for a 1e-6 bound
    val (_, tSparse, _) = Dedup.lshLayout(1L << 40, 0.95, 16, 1e-6, 2, 48)
    assert(tSparse <= 32, s"sparse-threshold compensation blew up: $tSparse")
  }

  test("hardNegatives: band contract, self-exclusion, exact-mode truth") {
    val emb = corpus(200)
    val out = Similarity.hardNegatives(emb, "vec_id", "embedding",
      col("vec_id") % 10 === 0, loRank = 3, hiRank = 7)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) >= 3 && r.getLong(2) <= 7))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
    // every anchor yields exactly the 5-rank band (corpus >> hiRank)
    val per = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(per.values.forall(_ == 5), per.toMap)
    // rank ordering consistent with cosine: within an anchor, cos is
    // non-increasing with rank
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("slim pair-dedup path (tables > threshold) matches the carried-signature path") {
    // 16 tables crosses SlimDedupTables, so candidates dedup via the
    // DISTINCT strategy; 8 tables uses the first-colliding-table chain —
    // both must produce the identical exact-verified pair set (the
    // dense-regime layouts pick 40+ tables, so this path is the one the
    // sf1 θ=0.45 run exercises)
    val emb = corpus(300)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val chained = pairs(Dedup.embeddingNearDupFixed(emb, "vec_id", "embedding", 0.8,
      dims = 32, tables = 8, planes = 5))
    val slim = pairs(Dedup.embeddingNearDupFixed(emb, "vec_id", "embedding", 0.8,
      dims = 32, tables = 16, planes = 5))
    val truth = pairs(Dedup.embeddingNearDupBrute(emb, "vec_id", "embedding", 0.8))
    assert(chained == truth)
    assert(slim == truth,
      s"slim dedup diverged: ${slim.diff(truth)} / ${truth.diff(slim)}")
  }

  test("knownCount skips the count action and parameterizes identically") {
    val emb = corpus(300)
    val n = emb.count()
    val a = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.8,
      dims = 32).orderBy("id_a", "id_b").collect().toSeq
    val b = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.8,
      dims = 32, knownCount = Some(n)).orderBy("id_a", "id_b").collect().toSeq
    assert(a == b)
  }
}
