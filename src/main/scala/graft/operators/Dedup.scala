package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora (SURVEY §7.5).
  *
  * Scale stance: every variant is a pure DataFrame plan — hash-partitioned
  * by the dedup key (exact) or by LSH band/bucket (minhash), so shuffle
  * volume is O(corpus + candidate pairs) with no driver materialization.
  * The brute-force pair joins exist as correctness oracles/baselines; at
  * 100 TB only the banded/bucketed paths run (the standard MinHash-LSH
  * sharding — candidate generation is a band-key equi-join that AQE can
  * skew-split if a bucket explodes).
  *
  * Cross-engine determinism: [[CrossHash.hash56]] is a 56-bit hash built
  * from md5 hex (identical in Spark and DuckDB), so even SimHash results
  * are oracle-checkable bit-for-bit. MinHash uses Spark's codegen'd
  * xxhash64 (the DuckDB oracle for LSH dedup is brute-force Jaccard, not
  * the sketch itself).
  */
object Dedup {

  /** Exact dedup: one surviving row id per duplicate group (min id wins),
    * plus the group size. Single hash-aggregate shuffle on the key columns.
    */
  def exact(df: DataFrame, keys: Seq[String], idCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(idCol, "n_copies")

  /** Distinct word n-gram shingles of a text column, e.g. n=2 →
    * ["a b", "b c", ...]. Documents shorter than n words yield an empty
    * array (guarded — Spark's `sequence(0, -1)` would count backwards). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    val ngrams = transform(sequence(lit(0), size(words) - n),
      i => concat_ws(" ", slice(words, i + lit(1), lit(n))))
    when(size(words) >= n, array_distinct(ngrams))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact Jaccard similarity of two distinct-element array columns,
    * union-free: `|A∩B| / (|A| + |B| − |A∩B|)` — one hash-set probe pass
    * per pair instead of two (the pair-verify joins are quadratic; the
    * per-pair kernel cost is what shows up at scale). Integer arithmetic,
    * so the DuckDB oracle (same formula) matches bit-for-bit. */
  def jaccard(a: Column, b: Column): Column = {
    val ni = size(array_intersect(a, b))
    ni.cast("double") / (size(a) + size(b) - ni).cast("double")
  }

  /** Sorted distinct xxhash64 values of an array of shingles — pair
    * verification runs a two-pointer merge over long arrays
    * ([[graft.functions.SortedIntersectCount]]) instead of per-pair
    * hash-set intersects of string arrays (cheaper hashing; a 64-bit
    * collision altering a count has probability ~(n²/2⁶⁵) ≈ 4e-9 over
    * this corpus, far below the oracle-mismatch noise floor). Sorting
    * happens once per document, not per pair. */
  private def hashedShingles(sh: Column): Column =
    array_sort(array_distinct(transform(sh, s => xxhash64(s))))

  /** Union-free Jaccard over pre-sorted distinct hash arrays. */
  private def jaccardSorted(a: Column, b: Column): Column = {
    val ni = call_function("sorted_intersect_count", a, b)
    ni.cast("double") / (size(a) + size(b) - ni).cast("double")
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline (all distributed, no driver loops):
    *   1. shingle: distinct word n-grams per doc;
    *   2. minhash: `numHashes` permutations approximated by
    *      `min(xxhash64(seed_j, shingle))` (one-permutation-per-seed, the
    *      standard trick) — computed as a single nested `transform`, fully
    *      codegen'd;
    *   3. band: signature split into `bands` bands of `rowsPerBand`;
    *      band-key = xxhash64(band_id, slice) → explode to (doc, band, key);
    *   4. candidates: self-equi-join on (band, key) with id< id (shuffle
    *      hash join on the band key — this is the only pair-producing join
    *      and its size is O(true near-dups) for well-chosen b, r);
    *   5. verify: exact Jaccard on the candidates, filter ≥ `threshold`.
    *
    * With b=32, r=4: P(miss | j=0.8) = (1-0.8⁴)³² ≈ 5e-8 — the sketch is
    * effectively exact above the threshold, so the brute-force oracle
    * agrees.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b
    */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, numHashes: Int = 128, bands: Int = 32,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val r = numHashes / bands

    graft.functions.GraftFunctions.register(df.sparkSession)
    // one xxhash64 per shingle, then the whole signature in one fused
    // codegen'd loop (graft.functions.MinHashes) — the interpreted
    // higher-order-function formulation was the bench's dominant cost
    val withHs = df.select(col(idCol).as("id"),
      hashedShingles(shingles(col(textCol), shingleN)).as("hs"))
      .filter(size(col("hs")) > 0)

    val withMh = withHs.withColumn("mh", call_function("minhashes", col("hs"), lit(numHashes)))

    // band keys only travel through the candidate join — the shingle
    // arrays are re-joined afterwards (candidates are rare; shipping the
    // arrays ×bands through the shuffle is the expensive wrong plan)
    val banded = withMh.select(col("id"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(mh, b * $r + 1, $r)))"))
        .as(Seq("band", "bkey")))

    val candidates = banded.as("a").join(banded.as("b"), Seq("band", "bkey"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")

    candidates
      .join(withHs.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(withHs.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("jaccard", jaccardSorted(col("hs_a"), col("hs_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Brute-force n-gram Jaccard pairs — the exact counterpart of
    * [[minhashLsh]] (its oracle), restricted to `queryPred` on the left
    * side to bound the O(n·m) join at bench scale. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, threshold: Double = 0.5,
      queryPred: Column = lit(true)): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val withSh = df.select(col(idCol).as("id"),
      hashedShingles(shingles(col(textCol), shingleN)).as("sh"))
      .filter(size(col("sh")) > 0)
    val left = withSh.filter(queryPred).select(
      col("id").as("id_a"), col("sh").as("sh_a"))
    val right = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    left.join(right, col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccardSorted(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 56-bit SimHash of whitespace tokens, built entirely from commutative
    * aggregations (explode words × bits → per-bit vote sums → weighted
    * recombine), so the result is independent of row/partition order and
    * reproducible bit-for-bit in the DuckDB oracle via [[CrossHash]].
    *
    * @return (id, simhash)
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // per-doc fused pass (graft.functions.Simhash56): the per-bit vote sum
    // is commutative, so this equals the relational explode(tokens × bits)
    // → groupBy formulation (the DuckDB oracle's shape) without its
    // 56×|corpus|-row shuffle
    df.select(col(idCol).as("id"),
      call_function("simhash56",
        transform(split(col(textCol), " "), t => CrossHash.hash56(t))).as("simhash"))
  }

  /** SimHash near-dup pairs: hamming distance ≤ maxHamming. Quadratic
    * verify join (the banded variant would bucket on simhash prefixes at
    * scale); `queryPred` bounds the left side. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, queryPred: Column = lit(true)): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    val a = sh.filter(queryPred)
      .select(col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Embedding near-duplicates: pairs with cosine ≥ threshold.
    * Brute-force pair join (exact); the LSH-bucketed path for scale is
    * [[Similarity.lshTopK]]'s bucketing applied to pairs. */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    val a = e.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = e.select(col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(Similarity.cosine(col("v_a"), col("v_b")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
