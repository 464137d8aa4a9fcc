package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted join/aggregation equivalence with the unsalted plans. */
class SkewJoinSpec extends SparkSpec {

  test("salted join == plain join (inner and left), hot key spread") {
    import spark.implicits._
    // one hot key (90% of fact rows) + a tail
    val fact = ((1 to 900).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "row_id")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (99L, "unmatched"))
      .toDF("k", "label")

    val plain = fact.join(dim, Seq("k"), "inner")
      .groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val saltedJ = SkewJoin.salted(fact, dim, "k", "row_id", saltFactor = 8)
      .groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(saltedJ == plain)

    val plainLeft = fact.join(dim, Seq("k"), "left").count()
    val saltedLeft = SkewJoin.salted(fact, dim, "k", "row_id", 8, "left").count()
    assert(saltedLeft == plainLeft)

    // the hot key's rows really are spread over multiple salt values
    val spread = fact.filter(col("k") === 1L)
      .select(SkewJoin.saltCol(col("row_id"), 8)).distinct().count()
    assert(spread > 4)
  }

  test("salted two-phase aggregation == direct aggregation") {
    import spark.implicits._
    val df = ((1 to 500).map(i => (1L, i.toDouble)) ++
      (1 to 50).map(i => (2L, i.toDouble))).toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = SkewJoin.saltedCountSum(
      df.withColumn("rid", monotonically_increasing_id()), "k", "v", "rid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted.map(t => (t._1, t._2)) == direct.map(t => (t._1, t._2)))
    // double sums: order differs across plans; compare with tolerance
    val dm = direct.map(t => t._1 -> t._3).toMap
    salted.foreach { case (k, _, tot) => assert(math.abs(tot - dm(k)) < 1e-6) }
  }
}
