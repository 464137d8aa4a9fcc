package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The fused quantizer kernels ([[CentroidCosines]], [[NearestCentroid]])
  * against their compositional twins — both the codegen and interpreted
  * paths must agree with K separate `vec_cosine` + `round` + struct-max
  * expressions, because the oracle replays THAT formulation. */
class CentroidKernelSpec extends SparkSpec {

  private def df(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  private val centroids: Seq[(Int, Seq[Float])] = Seq(
    0 -> Seq(1f, 0f, 0f, 0f),
    2 -> Seq(0f, 1f, 0f, 0f), // gap in cids (cell 1 lost its members)
    5 -> Seq(0.5f, 0.5f, 0.5f, 0.5f))
  private val flat = centroids.flatMap(_._2).toArray
  private val cids = centroids.map(_._1).toArray

  test("centroid_cosines equals per-centroid vec_cosine bit-for-bit") {
    GraftFunctions.register(spark)
    val vecs = Seq(
      1L -> Array(0.3f, -0.7f, 0.2f, 0.9f),
      2L -> Array(1f, 1f, 1f, 1f),
      3L -> Array(-0.1f, 0.01f, 0.5f, -0.5f))
    val fused = df(vecs)
      .select(col("id"), call_function("centroid_cosines",
        col("v"), typedlit(flat), lit(4)).as("cs"))
      .orderBy("id")
      .collect().map(_.getSeq[Double](1))
    val single = df(vecs)
      .select(col("id"), array(centroids.map { case (_, c) =>
        call_function("vec_cosine", col("v"), typedlit(c)) }: _*).as("cs"))
      .orderBy("id")
      .collect().map(_.getSeq[Double](1))
    assert(fused.toSeq.map(_.toSeq) == single.toSeq.map(_.toSeq))
  }

  test("nearest_centroid argmax matches struct-max incl. round-6 ties") {
    GraftFunctions.register(spark)
    val vecs = Seq(
      1L -> Array(0.9f, 0.1f, 0f, 0f),   // clear cell 0
      2L -> Array(0f, 0.8f, 0.1f, 0.1f), // clear cell 2
      3L -> Array(1f, 1f, 0f, 0f),       // cos 1/√2 ties ALL THREE → highest cid
      4L -> Array(1f, 1f, 1f, 1f))       // exact match of centroid 5
    val out = df(vecs)
      .select(col("id"), element_at(typedlit(cids),
        call_function("nearest_centroid", col("v"), typedlit(flat), lit(4)) + 1)
        .as("cell"))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    assert(out == Seq(0, 2, 5, 5))
    // compositional twin: struct-max over round-6 cosines
    val twin = df(vecs)
      .select(col("id"), array_max(array(centroids.map { case (cid, c) =>
        struct(round(call_function("vec_cosine", col("v"), typedlit(c)), 6).as("cos"),
          lit(cid).as("cid")) }: _*)).getField("cid").as("cell"))
      .orderBy("id").collect().map(_.getInt(1)).toSeq
    assert(out == twin)
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val vec = Array(0.3f, -0.7f, 0.2f, 0.9f)
    def floatLit(a: Array[Float]) =
      Literal.create(a, ArrayType(FloatType, containsNull = false))
    val cc = CentroidCosines(floatLit(vec), floatLit(flat), Literal(4))
      .eval(null).asInstanceOf[ArrayData].toDoubleArray().toSeq
    val viaDf = df(Seq(1L -> vec))
      .select(call_function("centroid_cosines",
        col("v"), typedlit(flat), lit(4)).as("cs"))
      .collect().head.getSeq[Double](0).toSeq
    assert(cc == viaDf)
    val nc = NearestCentroid(floatLit(vec), floatLit(flat), Literal(4))
      .eval(null).asInstanceOf[Int]
    val twin = df(Seq(1L -> vec))
      .select(array_max(array(centroids.map { case (cid, c) =>
        struct(round(call_function("vec_cosine", col("v"), typedlit(c)), 6).as("cos"),
          lit(cid).as("cid")) }: _*)).getField("cid"))
      .collect().head.getInt(0)
    assert(cids(nc) == twin)
  }

  test("null vector yields null scores and a null cell") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", ArrayType(FloatType))))
    val d = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, null)), schema)
    val out = d.select(
      call_function("centroid_cosines", col("v"), typedlit(flat), lit(4)),
      call_function("nearest_centroid", col("v"), typedlit(flat), lit(4)))
      .collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
