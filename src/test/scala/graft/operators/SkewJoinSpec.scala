package graft.operators

import org.apache.spark.sql.Row
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

  test("grid-salted pair join == plain join, exactly once per pair") {
    import spark.implicits._
    // cell 7 is a mega-cell (300 of 400 rows); cells 0-5 are a tail
    val left = (0 until 400)
      .map(i => (i, if (i < 300) 7 else i % 6)).toDF("a_id", "cell")
    val right = (0 until 400)
      .map(i => (i + 1000, if (i < 300) 7 else i % 6)).toDF("b_id", "cell")
    val plain = left.join(right, "cell")
      .select("cell", "a_id", "b_id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    // boundFloor=16 forces the mega-cell onto the grid (sf ≈ 300/64 after
    // the 4×-mean auto bound) — output must be the SAME multiset
    val grid = SkewJoin.gridSalted(left, right, "cell",
        col("a_id"), col("b_id"), boundFloor = 16L)
      .select("cell", "a_id", "b_id").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(grid.sorted == plain.sorted) // same pairs, no dup, no loss
    // sanity — the data really is skewed: tail residues 0-3 hold 17 rows
    // and 4-5 hold 16, so 300² hub pairs + 4·17² + 2·16² tail pairs
    assert(plain.size == 300 * 300 + 4 * 17 * 17 + 2 * 16 * 16)
  }

  test("grid-salted join with no hot key is the plain join plan") {
    import spark.implicits._
    val left = (0 until 60).map(i => (i, i % 6)).toDF("a_id", "cell")
    val right = (0 until 60).map(i => (i, i % 6)).toDF("b_id", "cell")
    val out = SkewJoin.gridSalted(left, right, "cell",
      col("a_id"), col("b_id"), boundFloor = 1024L)
    // uniform occupancy (10 per cell) under the floor: no salt columns,
    // no generate/explode anywhere in the plan — bit-identical plain join
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("generate"))
    assert(out.count() == 600)
  }

  test("quantizer operators: forced hot-cell salting leaves output unchanged") {
    import spark.implicits._
    // a planted hub: 120 near-identical vectors (one dominant cell) plus
    // 80 spread vectors — with the conf floor forced to 8, the hub cell
    // salts; outputs must equal the unsalted (default-conf) runs
    val emb = ((0 until 120).map { i =>
      (i.toLong, Array.tabulate(8)(d => (10f + (i % 3) * 0.001f) * (d + 1)))
    } ++ (120 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 7) % 17 - 8).toFloat))
    }).toDF("vec_id", "embedding")
    def all(): (Seq[Row], Seq[Row], Seq[Row]) = (
      Similarity.semDedup(emb, "vec_id", "embedding")
        .orderBy("vec_id").collect().toSeq,
      Similarity.knnGraph(emb, "vec_id", "embedding", k = 3)
        .orderBy("id_a", "id_b").collect().toSeq,
      Similarity.bitextMine(emb, "vec_id", "embedding",
        sideA = col("vec_id") % 2 === 0, k = 3)
        .orderBy("id_a").collect().toSeq)
    val base = all()
    spark.conf.set(Similarity.HotCellBoundKey, "8")
    try assert(all() == base)
    finally spark.conf.unset(Similarity.HotCellBoundKey)
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
