package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** tf·idf cosine pairs vs a driver-side brute-force replica: the
  * posting-join formulation must produce exactly the pairs and cosines
  * the dense computation does, including the w = 0 prune being a no-op
  * on the answer (ubiquitous grams carry zero idf weight). */
class TfidfCosineSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // every doc opens with "zz filler", so that gram has df = N and
    // idf exactly 0. 0 and 1 share a long run (high cosine); 2 is
    // unrelated; 3 shares ONLY the zero-weight opener with the others;
    // 4 duplicates 0 exactly (cos = 1)
    (0L, "zz filler the data table scan fast join group key value sort x"),
    (1L, "zz filler the data table scan fast join group key value merge b"),
    (2L, "zz filler quick brown fox jumps over lazy dog again and again"),
    (3L, "zz filler aa bb cc dd ee ff gg hh ii jj kk"),
    (4L, "zz filler the data table scan fast join group key value sort x")
  ).toDF("doc_id", "text")

  private def brute(n: Int, theta: Double): Set[(Long, Long, Double)] = {
    val rows = docs.collect().map(r => r.getLong(0) -> r.getString(1))
    def grams(t: String) = t.split(" ").sliding(n).map(_.mkString(" "))
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val gs = rows.map { case (id, t) => id -> grams(t) }.toMap
    val df = gs.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size).toMap
    val nDocs = rows.length.toDouble
    def w(g: Map[String, Long]) = g.map { case (k, tf) =>
      k -> math.round(math.log(nDocs / df(k)) * 1000) * tf }
    val ws = gs.view.mapValues(w).toMap
    (for {
      (a, wa) <- ws.toSeq; (b, wb) <- ws.toSeq if a != b
      num = wa.keySet.intersect(wb.keySet).toSeq
        .map(k => wa(k) * wb(k)).sum.toDouble
      na = math.sqrt(wa.values.map(v => v * v).sum.toDouble)
      nb = math.sqrt(wb.values.map(v => v * v).sum.toDouble)
      if na > 0 && nb > 0 && num / (na * nb) >= theta
    } yield (a, b,
      BigDecimal(num / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)).toSet
  }

  test("posting-join cosine == dense brute force (pairs and values)") {
    val got = Dedup.tfidfCosinePairs(docs, "doc_id", "text",
      shingleN = 2, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = brute(2, 0.2)
    assert(got == want, s"got $got\nwant $want")
    assert(want.exists { case (a, b, c) => Set(a, b) == Set(0L, 4L) && c == 1.0 },
      "exact duplicates must score cos 1.0")
    assert(want.exists { case (a, b, _) => Set(a, b) == Set(0L, 1L) },
      "the high-overlap pair must qualify")
  }

  test("queryPred bounds the probe side asymmetrically") {
    val got = Dedup.tfidfCosinePairs(docs, "doc_id", "text",
      shingleN = 2, threshold = 0.2, queryPred = col("id") === 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.forall(_._1 == 0L), s"probe side leaked: $got")
    assert(got.contains((0L, 4L)) && got.contains((0L, 1L)))
  }

  test("a doc sharing only zero-weight grams pairs with nothing") {
    // doc 3 overlaps others only via grams present in all docs (idf 0);
    // the w > 0 prune drops those postings and doc 3 must still be
    // EXACTLY absent (not approximately — zero terms contribute zero)
    val got = Dedup.tfidfCosinePairs(docs, "doc_id", "text",
      shingleN = 2, threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!got.exists { case (a, b) => a == 3L || b == 3L },
      s"zero-idf-only overlap produced a pair: $got")
  }
}
