package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed Bloom filters over a key column — the membership pre-filter
  * of an incremental-ingest pipeline (the Bloom-dedup deployment the
  * public CCNet/Dolma-style curation stacks use for paragraph/document
  * dedup): keep a compact standing filter over the already-ingested
  * corpus, test each incoming shard against it row-locally, and pay the
  * exact confirm join ONLY for probable hits. No false negatives, so
  * composing prefilter + exact confirm is EXACT — output ≡ the plain
  * anti/semi join, which is what lets [[newRowsVia]] gate hash-green
  * against an oracle that never heard of Bloom filters.
  *
  * Layout: the filter is PARTITIONED into `buckets` independent bitsets
  * keyed by a hash of the value, as a (bucket, bits ARRAY<BIGINT>)
  * table. One bucket's bitset is `bitsPerBucket` bits (a few KiB); the
  * TABLE scales with the corpus (total bits ≈ bitsPerKey × n) while
  * every row and every probe stays bounded. At test scale the table
  * broadcasts; at 100 TB it stops fitting in one executor and the probe
  * becomes a shuffle equi-join on `bucket` — same plan shape, no
  * all-pairs anywhere, which is the reason for bucketing instead of one
  * giant bitset (a monolithic 1.2 GB/billion-key array can neither
  * broadcast nor build in one task).
  *
  * Determinism: positions come from double hashing (Kirsch &
  * Mitzenmacher 2006, "Less Hashing, Same Performance") over two
  * xxhash64 salts — pos_i = (h1 + i·h2) mod bits — and the bitset build
  * is `bit_or`, associative/commutative, so any partitioning and any
  * ingest order produce the identical filter table bit-for-bit.
  *
  * Everything is builtin/codegen'd: xxhash64, shiftleft, bit_or,
  * element_at — the k probe terms are unrolled at plan-build time (k is
  * a literal), no UDF, no lambda in the hot path.
  */
object Bloom {

  private def h1(v: Column) = xxhash64(lit("bloom_h1"), v)
  private def h2(v: Column) = xxhash64(lit("bloom_h2"), v)

  /** Bucket routing for a key — public because probes and specs must
    * address the SAME bucket a build would (a re-implemented copy that
    * drifts from the build salt probes garbage). */
  def bucketOf(v: Column, buckets: Int): Column =
    pmod(xxhash64(lit("bloom_bkt"), v), lit(buckets.toLong)).cast("int")

  /** i-th probe position within a bucket's bitset. Both hashes reduce
    * into a 31-bit domain BEFORE combining, so h1' + i·h2' can never
    * overflow a long (ANSI mode throws on wrap — the combine must be
    * provably in range, not "wraps the same way on both sides"). */
  private def pos(v: Column, i: Int, bits: Int): Column = {
    val m31 = lit(1L << 31)
    pmod(pmod(h1(v), m31) + lit(i.toLong) * pmod(h2(v), m31), lit(bits.toLong))
  }

  /** Build the standing filter table: one row per non-empty bucket,
    * `bits` a dense ARRAY<BIGINT> of `bitsPerBucket`/64 words. NULL keys
    * carry no identity and are skipped (a NULL never matches an exact
    * join either, so [[newRowsVia]] stays exact).
    *
    * Plan: keys explode to k (bucket, word, mask) rows, but `bit_or`
    * folds them map-side, so the ONE shuffle moves ≤ partitions ×
    * buckets × words rows of two ints and a long — corpus-size-
    * independent per partition, exactly like the sketch rollups. */
  def buildFilter(df: DataFrame, keyCol: String, buckets: Int,
                  bitsPerBucket: Int = 8192, k: Int = 5): DataFrame = {
    require(bitsPerBucket % 64 == 0, "bitsPerBucket must be a multiple of 64")
    require(k >= 1 && buckets >= 1)
    val words = bitsPerBucket / 64
    val v = col(keyCol)
    val probes = (0 until k).map { i =>
      val p = pos(v, i, bitsPerBucket)
      struct((p / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (p % 64).cast("int")).as("mask"))
    }
    df.filter(v.isNotNull)
      .select(bucketOf(v, buckets).as("bucket"),
        explode(array(probes: _*)).as("pr"))
      .groupBy(col("bucket"), col("pr.word").as("word"))
      .agg(call_function("bit_or", col("pr.mask")).as("mask"))
      .groupBy("bucket")
      .agg(map_from_entries(collect_list(struct(col("word"), col("mask"))))
        .as("wm"))
      .select(col("bucket"),
        expr(s"transform(sequence(0, ${words - 1}, 1), " +
          "w -> coalesce(wm[w], 0L))").as("bits"))
  }

  /** Membership probe against a `bits` array column (same geometry as
    * the build): k unrolled bit tests, all codegen'd. NULL keys and a
    * NULL bits column (bucket absent from the filter — nothing was ever
    * inserted there) are both definite misses. */
  def mightContain(key: Column, bits: Column, bitsPerBucket: Int = 8192,
                   k: Int = 5): Column = {
    val terms = (0 until k).map { i =>
      val p = pos(key, i, bitsPerBucket)
      element_at(bits, (p / 64).cast("int") + lit(1))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          (p % 64).cast("int"))) =!= lit(0L)
    }
    when(key.isNull || bits.isNull, lit(false))
      .otherwise(terms.reduce(_ && _))
  }

  /** Exact incremental "which shard rows are NEW" via the Bloom
    * pre-filter: rows whose bucket filter says "definitely absent" pass
    * straight through (no false negatives), and only probable hits —
    * true duplicates plus the fp· |shard| tail — pay the exact anti-join
    * against the standing keys. Output ≡ `shard ANTI JOIN standing` on
    * `keyCol`, unconditionally; the filter only moves WORK, never the
    * answer. At 100 TB the win is the anti-join probe side shrinking
    * from |shard| to |hits|, with the standing KEY INDEX read only by
    * the confirm join's equi-shuffle. */
  def newRowsVia(standingFilter: DataFrame, standingKeys: DataFrame,
                 shard: DataFrame, keyCol: String, buckets: Int,
                 bitsPerBucket: Int = 8192, k: Int = 5): DataFrame = {
    // filter columns ride under collision-proof names — a shard with its
    // own `bits`/`bucket` column must not become ambiguous (review)
    val probed = shard
      .withColumn("__bkt", bucketOf(col(keyCol), buckets))
      .join(standingFilter.select(col("bucket").as("__bkt"),
        col("bits").as("__bits")), Seq("__bkt"), "left")
      .withColumn("__hit",
        mightContain(col(keyCol), col("__bits"), bitsPerBucket, k))
      .drop("__bkt", "__bits")
      // both branches below read this frame — persist so the shard scan
      // and the k-hash probe run ONCE (the family convention; session
      // eviction via OperatorCache)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val definiteNew = probed.filter(!col("__hit")).drop("__hit")
    val confirmNew = probed.filter(col("__hit")).drop("__hit")
      .join(standingKeys.select(col(keyCol)).distinct(),
        Seq(keyCol), "left_anti")
    definiteNew.unionByName(confirmNew)
  }
}
