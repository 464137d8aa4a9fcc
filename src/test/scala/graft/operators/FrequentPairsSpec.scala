package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sequences.frequentPairs]] — hand-checked support and lift,
  * duplicate events collapsing per basket, and the row-local pair plan. */
class FrequentPairsSpec extends SparkSpec {
  import spark.implicits._

  test("support counts baskets, duplicates collapse, lift is exact") {
    // baskets: u1={a,b}, u2={a,b}, u3={a,c}, u4={b} → nb=4
    // pairs: (a,b)=2, (a,c)=1; counts: a=3, b=3, c=1
    val ev = Seq(
      (1L, "a"), (1L, "b"), (1L, "a"), // dup a collapses
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "b")).toDF("user_id", "event_type")
    val got = Sequences.frequentPairs(ev, "user_id", "event_type")
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Long)].collect().toSeq
    // lift(a,b) = 2*4e6/(3*3) = 888888 (floor); lift(a,c) = 1*4e6/3 = 1333333
    assert(got == Seq(("a", "b", 2L, 888888L), ("a", "c", 1L, 1333333L)))
  }

  test("minSupport prunes, null baskets and items drop") {
    val ev = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")),
      (Some(2L), Some("a")), (Some(2L), Some("b")),
      (Some(3L), Some("a")), (Some(3L), Some("c")),
      (None, Some("a")), (Some(5L), None)).toDF("user_id", "event_type")
    val got = Sequences.frequentPairs(ev, "user_id", "event_type",
      minSupport = 2L)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 2L, 1000000L))) // 2*3e6/(3*2)=1e6: independent
  }

  test("plan: pairs generate row-locally — no basket self-join") {
    val ev = (0 until 400).map(i => (i.toLong % 40, s"t${i % 7}"))
      .toDF("user_id", "event_type")
    val plan = Sequences.frequentPairs(ev, "user_id", "event_type")
      .queryExecution.optimizedPlan.toString
    // the only joins are the two item-count equi-joins + the 1-row nb
    assert(!plan.contains("item = item"),
      s"baskets must not self-join on basket:\n$plan")
    assert(plan.contains("Generate"), s"expected the row-local explode:\n$plan")
  }
}
