package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  test("zvalue: interleave is monotone per dimension, hand-checked bits") {
    import spark.implicits._
    // 2 cols, 2 bits each, ranges [0,3]: zvalue(x, y) interleaves
    // x bits at even positions, y bits at odd
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L))
      .toDF("x", "y")
    val z = df.select(col("x"), col("y"),
      ZOrder.zvalue(Seq(col("x"), col("y")), Seq((0L, 3L), (0L, 3L)),
        bitsPerCol = 2)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) == 0L)
    assert(z((3L, 0L)) == 5L) // x bits -> positions 0,2
    assert(z((0L, 3L)) == 10L) // y bits -> positions 1,3
    assert(z((3L, 3L)) == 15L)
    assert(z((2L, 1L)) == 6L) // x=10b -> pos2, y=01b -> pos1
  }

  test("z-order clustering skips files on the SECOND dimension where row-major sort cannot") {
    import spark.implicits._
    // a 64x64 grid of points; query: a narrow band in y
    val grid = (for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y))
      .toDF("x", "y")

    def filesTouched(clustered: org.apache.spark.sql.DataFrame): Long = {
      val dir = tmpDir("zorder")
      clustered.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir).filter(col("y") between (10, 13))
        .select(input_file_name().as("f")).distinct().count()
    }

    val rowMajor = filesTouched(
      grid.repartitionByRange(16, col("x"), col("y"))
        .sortWithinPartitions("x", "y"))
    val zOrdered = filesTouched(ZOrder.cluster(grid, Seq("x", "y"), 16))
    // row-major: every x-range file contains all y values -> all 16 files
    // have matching rows; z-order confines the y-band to a subset
    assert(rowMajor == 16, s"expected row-major to touch all files, got $rowMajor")
    assert(zOrdered <= 8, s"z-order should confine the band, touched $zOrdered of 16")
    // same rows either way
    assert(ZOrder.cluster(grid, Seq("x", "y"), 16).count() == 64 * 64)
  }

  test("engine compactStorage zorderBy end-to-end") {
    import spark.implicits._
    val e = new graft.engine.Engine(spark, tmpDir("graft-zo"))
    e.createStream("pts", graft.schema.StreamSchema(Seq(
      graft.schema.PhysicalField("x", graft.types.FlinkType.FBigInt),
      graft.schema.PhysicalField("y", graft.types.FlinkType.FBigInt))))
    e.appendRows("pts",
      (for { x <- 0L until 32L; y <- 0L until 32L } yield (x, y)).toDF("x", "y"))
    e.compactStorage("pts", targetFiles = 8, zorderBy = Seq("x", "y"))
    assert(e.readStream("pts").count() == 1024)
    intercept[IllegalArgumentException] {
      e.compactStorage("pts", 2, sortBy = Seq("x"), zorderBy = Seq("y"))
    }
  }
}
