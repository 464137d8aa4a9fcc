package graft.operators

import graft.SparkSpec

/** As-of join semantics: inclusivity at equal timestamps, left-outer
  * nulls, row-level value preservation, tiebreaks. */
class AsOfJoinSpec extends SparkSpec {

  test("latest right row at or before each left time, per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 10L, "l3"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 100.0), (1L, 10L, 200.0), (1L, 15L, 300.0),
      (2L, 50L, 999.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v"))
      .orderBy("k", "t")
      .collect().map(r => (r.getString(2), if (r.isNullAt(3)) null else r.getDouble(3)))
    // l1: t=10 → right t=10 (inclusive); l2: t=20 → t=15; l3: no prior → null
    assert(out.toSeq == Seq(("l1", 200.0), ("l2", 300.0), ("l3", null)))
  }

  test("null right values are preserved as the row (not skipped)") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, Some(100.0)), (1L, 8L, Option.empty[Double]))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("v")).collect()
    // the t=8 row IS the as-of match even though v is null
    assert(out.head.isNullAt(2))
  }

  test("tiebreak picks the latest among equal-time right rows") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 7L, "first"), (1L, 10L, 9L, "second"))
      .toDF("k", "t", "seq", "tag")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "t", "t", Seq("tag"),
      tiebreak = Some("seq")).collect()
    assert(out.head.getString(2) == "second")
  }
}
