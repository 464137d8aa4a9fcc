package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** k-anonymity suppression and the k/l audit profile vs plain-Scala
  * group accounting.
  */
class PrivacySpec extends SparkSpec {

  import spark.implicits._

  test("kAnonymize keeps exactly the rows of classes with >= k members") {
    val df = Seq(
      ("US", "A", 1), ("US", "A", 2), ("US", "A", 3),
      ("US", "B", 4), ("FR", "A", 5), ("FR", "A", 6)
    ).toDF("country", "seg", "id")
    val out = Privacy.kAnonymize(df, Seq("country", "seg"), 2L)
      .select("id").collect().map(_.getInt(0)).toSet
    assert(out === Set(1, 2, 3, 5, 6)) // the (US,B) singleton is suppressed
    // suppression preserves the full row, nothing else
    assert(Privacy.kAnonymize(df, Seq("country", "seg"), 2L).columns.toSeq
      === df.columns.toSeq)
  }

  test("kAnonymize fuzz: surviving class sizes all >= k, totals match") {
    val rnd = new Random(5)
    for (trial <- 0 until 10) {
      val k = 2 + rnd.nextInt(4)
      val rows = (0 until 300).map { i =>
        (s"c${rnd.nextInt(8)}", s"s${rnd.nextInt(6)}", i)
      }
      val exact = rows.groupBy(r => (r._1, r._2))
        .filter(_._2.size >= k).values.flatten.map(_._3).toSet
      val got = Privacy.kAnonymize(
        rows.toDF("country", "seg", "id"), Seq("country", "seg"), k.toLong)
        .select("id").collect().map(_.getInt(0)).toSet
      assert(got === exact, s"trial $trial k=$k")
    }
  }

  test("anonymityProfile: n, l, and the joint verdict") {
    val df = Seq(
      // class (US,A): n=3, sensitive {10,10,20} -> l=2 -> kept at k=3
      ("US", "A", 10), ("US", "A", 10), ("US", "A", 20),
      // class (US,B): n=3 but uniform sensitive -> l=1 -> NOT kept
      ("US", "B", 7), ("US", "B", 7), ("US", "B", 7),
      // class (FR,A): n=2 < k -> NOT kept despite l=2
      ("FR", "A", 1), ("FR", "A", 2)
    ).toDF("country", "seg", "sens")
    val out = Privacy.anonymityProfile(df, Seq("country", "seg"),
      col("sens"), k = 3L, minL = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(out === Seq(
      ("FR", "A", 2L, 2L, false),
      ("US", "A", 3L, 2L, true),
      ("US", "B", 3L, 1L, false)))
  }
}
