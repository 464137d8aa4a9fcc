package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Group-level MinHash sketch union via a typed [[Aggregator]] (the custom-
  * aggregate extension point, SURVEY §2.7): the elementwise minimum of
  * per-document MinHash signatures over a group IS the signature of the
  * union of their shingle sets — so corpus-level similarity (e.g. between
  * `source` partitions of a training corpus) is estimable without ever
  * materializing the union.
  *
  * Merge is commutative/associative → partial aggregation (map-side
  * combine) applies; state is a fixed `Array[Long]` per group, so driver
  * and shuffle volume are O(groups × numHashes) regardless of corpus size.
  */
object MinHashAgg {

  final class UnionSketch(numHashes: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = {
      var i = 0
      val n = math.min(buf.length, sig.length)
      while (i < n) { if (sig(i) < buf(i)) buf(i) = sig(i); i += 1 }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Typed column aggregating signature arrays by elementwise min. */
  def unionSketch(numHashes: Int): TypedColumn[Array[Long], Array[Long]] =
    new UnionSketch(numHashes).toColumn

  /** Jaccard estimate between two sketches: fraction of matching
    * components (the standard MinHash estimator). */
  def estimateJaccard(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), c => c))
      .cast("double") / size(a).cast("double")

  /** Per-group union sketches of a text corpus: (group, sketch).
    * Shingles hash through [[CrossHash.hash56]] (not xxhash64) so the
    * whole sketch — input hashes AND the SplitMix64 permutations — is
    * replayable bit-for-bit in the DuckDB oracle (`source_similarity`
    * gate), the same differential-testing upgrade as `dedup_simhash`. */
  def groupSketches(df: DataFrame, groupCol: String, textCol: String,
                    shingleN: Int = 2, numHashes: Int = 128): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sigs = df.select(col(groupCol).as("grp"),
      call_function("minhashes",
        array_sort(array_distinct(transform(
          Dedup.shingles(col(textCol), shingleN), s => CrossHash.hash56(s)))),
        lit(numHashes)).as("sig"))
    import df.sparkSession.implicits._
    sigs.as[(String, Array[Long])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(unionSketch(numHashes).name("sketch"))
      .toDF("grp", "sketch")
  }

  /** Estimated pairwise Jaccard similarity between groups (e.g. corpus
    * sources) from their union sketches — |groups|² tiny result. */
  def groupSimilarity(df: DataFrame, groupCol: String, textCol: String,
                      shingleN: Int = 2, numHashes: Int = 128): DataFrame = {
    val sk = groupSketches(df, groupCol, textCol, shingleN, numHashes)
    val a = sk.select(col("grp").as("grp_a"), col("sketch").as("sk_a"))
    val b = sk.select(col("grp").as("grp_b"), col("sketch").as("sk_b"))
    // matches/numHashes is an exact dyadic double (numHashes is a power of
    // two) — no rounding, so the oracle compares bit-identical values.
    // The sketch frame is one row per group by construction; broadcast()
    // declares that (the CartesianJoinGuard escape hatch) and plans the
    // pairwise triangle as a broadcast loop instead of a cartesian.
    a.join(broadcast(b), col("grp_a") < col("grp_b"))
      .withColumn("est_jaccard", estimateJaccard(col("sk_a"), col("sk_b")))
      .select("grp_a", "grp_b", "est_jaccard")
  }
}
