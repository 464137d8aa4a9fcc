package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (the salting pattern from the 100 TB
  * design brief; complements AQE's runtime skew-join splitting with a
  * plan-level technique usable when AQE can't help — e.g. a skewed
  * aggregation key or a build side too large to split at runtime).
  *
  * Salting an equi-join on key K with factor S:
  *   - fact side: each row gets a deterministic salt in [0, S) — the key
  *     becomes (K, salt), spreading one hot key over S reducers;
  *   - dim side: each row is replicated S times, once per salt value, so
  *     every (K, salt) partition finds its match.
  * Shuffle cost: |fact| + S·|dim| instead of a single reducer absorbing
  * the hot key's entire partition. Correctness is join-semantics
  * preserving for inner/left joins on the fact side.
  */
object SkewJoin {

  /** Deterministic per-row salt (hash of the whole fact row's key + a
    * uniform spreader column), NOT rand() — reruns produce identical
    * partitioning, keeping pipelines replayable. */
  def saltCol(spread: Column, saltFactor: Int): Column =
    pmod(xxhash64(spread), lit(saltFactor)).cast("int")

  /** Inner/left equi-join `fact ⋈ dim ON fact(key) = dim(key)` with the
    * hot-key shuffle spread over `saltFactor` partitions.
    *
    * @param spreadCol a fact column with per-row variation (an id/line
    *                  number) used to spread rows of the same key
    */
  def salted(fact: DataFrame, dim: DataFrame, key: String,
             spreadCol: String, saltFactor: Int = 16,
             joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(joinType),
      "salting preserves semantics for fact-side inner/left joins")
    val saltedFact = fact.withColumn("__salt", saltCol(col(spreadCol), saltFactor))
    val saltedDim = dim
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial aggregate on (key, salt),
    * then final combine on key — the manual form of map-side combine for
    * aggregates Spark can't partially compute automatically. Here for
    * count/sum shapes. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     spreadCol: String, saltFactor: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(col(spreadCol), saltFactor))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").cast("long").as("n"), sum("__s").as("total"))
}
