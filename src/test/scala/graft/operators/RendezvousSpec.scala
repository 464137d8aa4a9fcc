package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sampling.rendezvousShard]] — exact replay, the minimal-movement
  * law vs hash-mod placement, balance, and the zero-exchange plan. */
class RendezvousSpec extends SparkSpec {
  import spark.implicits._

  private def keys = spark.range(20000).select(col("id").as("k"))

  test("exact Scala replay of the argmax for sample keys") {
    val got = keys.limit(50)
      .select(col("k"), Sampling.rendezvousShard(col("k"), 7).as("s"))
      .as[(Long, Long)].collect()
    got.foreach { case (k, s) =>
      val exp = (0 until 7)
        .map(sid => (CrossHash.scalaHash56(s"hrw:$sid:$k"), sid.toLong))
        .max._2
      assert(s == exp, s"key $k")
    }
  }

  test("n -> n+1 moves only INTO the new shard, ~1/(n+1) of keys; pmod moves ~n/(n+1)") {
    val df = keys
      .withColumn("s8", Sampling.rendezvousShard(col("k"), 8))
      .withColumn("s9", Sampling.rendezvousShard(col("k"), 9))
      .withColumn("m8", pmod(xxhash64(col("k")), lit(8)))
      .withColumn("m9", pmod(xxhash64(col("k")), lit(9)))
      .cache()
    try {
      assert(df.filter(col("s9") =!= col("s8") && col("s9") =!= 8L).isEmpty,
        "a moved key must land on the NEW shard")
      val n = df.count().toDouble
      val hrwMoved = df.filter(col("s9") =!= col("s8")).count() / n
      val modMoved = df.filter(col("m9") =!= col("m8")).count() / n
      // E[hrw] = 1/9 ~ 0.111 (binomial sd ~ 0.002 at 20k);
      // E[mod] = 8/9 ~ 0.889
      assert(hrwMoved > 0.09 && hrwMoved < 0.14, s"hrw moved $hrwMoved")
      assert(modMoved > 0.8, s"mod moved $modMoved")
    } finally df.unpersist()
  }

  test("balance: every shard holds ~1/n of keys") {
    val byShard = keys
      .select(Sampling.rendezvousShard(col("k"), 8).as("s"))
      .groupBy("s").count().as[(Long, Long)].collect().toMap
    assert(byShard.keySet == (0L until 8L).toSet)
    byShard.values.foreach { c =>
      assert(math.abs(c - 2500.0) / 2500.0 < 0.15, s"shard count $c")
    }
  }

  test("assignment is a pure projection — zero exchanges in the plan") {
    val plan = keys.select(Sampling.rendezvousShard(col("k"), 16).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
  }
}
