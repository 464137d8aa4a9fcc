package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that share word
  * n-grams with an evaluation/benchmark set — the standard pre-training
  * hygiene step (the GPT-3/PaLM-style "13-gram overlap" rule, n
  * configurable).
  *
  * Scale shape (the part that matters at 100 TB): the benchmark side is
  * eval-set-sized (thousands of documents), so its distinct hashed
  * n-grams are BROADCAST; the corpus side explodes to hashed n-grams and
  * probes the broadcast set map-side. The corpus is never shuffled — the
  * only exchange is the final distinct on *matched* doc ids (output-
  * sized, tiny). N-grams travel as xxhash64 longs, never strings (8
  * bytes/gram; a 64-bit collision flagging an extra doc has probability
  * ~|bench grams|·|corpus grams|/2⁶⁴ — immaterial next to the rule's own
  * false-positive rate).
  */
object Decontaminate {

  /** Distinct ids of `docs` rows sharing at least one distinct word
    * `n`-gram with any text in `bench`. */
  def contaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                      bench: DataFrame, benchTextCol: String,
                      n: Int): DataFrame = {
    val corpusGrams = docs.select(col(idCol).as("id"),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gh"))
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
    corpusGrams.join(broadcast(benchGrams), Seq("gh"), "left_semi")
      .select(col("id").as(idCol)).distinct()
  }

  /** `docs` minus the contaminated rows (anti-join on the id — the id set
    * is small, so this is a broadcast anti-join in practice). */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    bench: DataFrame, benchTextCol: String,
                    n: Int): DataFrame =
    docs.join(
      broadcast(contaminatedIds(docs, idCol, textCol, bench, benchTextCol, n)),
      Seq(idCol), "left_anti")

  /** Bloom-filter variant of [[contaminatedIds]] for when the benchmark
    * n-gram set outgrows an exact broadcast (a multi-benchmark sweep at
    * 100 TB: hundreds of millions of grams × 8 bytes): the grams compress
    * into a fixed-size Bloom sketch (`-ln(fpp)/ln²2 ≈ 14.4` bits/gram at
    * fpp 1e-3) built once and broadcast, and the corpus probes it
    * map-side. GUARANTEE: no false negatives — the result is a superset
    * of [[contaminatedIds]]'s, with FP-rate-bounded extra ids (spec
    * asserts both); acceptable for a removal list, where over-removal by
    * 0.1 % is the safe direction. Spec-backed, not gated: the sketch's
    * bit layout is insertion-order-dependent, so there is no engine-
    * independent oracle. */
  def bloomContaminatedIds(docs: DataFrame, idCol: String, textCol: String,
                           bench: DataFrame, benchTextCol: String,
                           n: Int, fpp: Double = 0.001): DataFrame = {
    // two actions consume benchGrams (the size probe, then the sketch
    // build) — persist so the shingle explode + distinct runs once
    val benchGrams = bench
      .select(explode(Dedup.shingles(col(benchTextCol), n)).as("g"))
      .select(xxhash64(col("g")).as("gh")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val expected = math.max(benchGrams.count(), 1L)
    val bf = benchGrams.stat.bloomFilter("gh", expected, fpp)
    benchGrams.unpersist()
    val bfBc = docs.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((gh: Long) => bfBc.value.mightContainLong(gh))
    docs.select(col(idCol).as("id"),
      explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col("id"), xxhash64(col("g")).as("gh"))
      .filter(mightContain(col("gh")))
      .select(col("id").as(idCol)).distinct()
  }
}
