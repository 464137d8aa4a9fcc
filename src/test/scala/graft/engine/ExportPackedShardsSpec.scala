package graft.engine

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.{PhysicalField, StreamSchema}
import graft.types.FlinkType.{FBigInt, FString}

/** [[Engine.exportPackedShards]]: physical token-budget sharding —
  * directory layout, budget bound, file-per-shard, lossless round-trip. */
class ExportPackedShardsSpec extends SparkSpec {
  import spark.implicits._

  test("budgeted shards: layout, bound, one file per shard, round-trip") {
    val e = new Engine(spark, tmpDir("graft-packex"))
    e.createStream("corpus", StreamSchema(Seq(
      PhysicalField("doc_id", FBigInt),
      PhysicalField("body", FString),
      PhysicalField("n_tokens", FBigInt))))
    val rows = (1L to 400L).map(i => (i, s"doc $i", 50L + i % 37))
    e.appendRows("corpus", rows.toDF("doc_id", "body", "n_tokens"))

    val out = tmpDir("graft-packex-out") + "/shards"
    val budget = 2000L
    e.exportPackedShards("corpus", out, "doc_id", "n_tokens", budget, groups = 4)

    // layout: pack_group=G/shard=S directories
    val groupDirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("pack_group=")).toSeq
    assert(groupDirs.size == 4, s"expected 4 pack groups, got $groupDirs")
    val shardDirs = groupDirs.flatMap(g => Files.list(g).iterator().asScala
      .filter(_.getFileName.toString.startsWith("shard=")))
    assert(shardDirs.nonEmpty)
    // one data file per shard (repartition by the shard key)
    shardDirs.foreach { s =>
      val files = Files.list(s).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      assert(files.size == 1, s"shard $s has ${files.size} files")
    }

    // round-trip: every row present once, with its assignment columns
    // (partition-dir values parse back as int — normalize to long)
    val back = spark.read.parquet(out)
      .withColumn("shard", col("shard").cast("long"))
      .withColumn("pack_group", col("pack_group").cast("int"))
    assert(back.count() == 400)
    assert(back.select("doc_id").distinct().count() == 400)

    // budget bound: a shard overshoots by AT MOST its last (= largest
    // possible) document; every non-final shard is at least budget-full
    val sums = back.groupBy("pack_group", "shard")
      .agg(sum("n_tokens").as("toks"), max("n_tokens").as("mx"))
      .collect()
    sums.foreach { r =>
      assert(r.getLong(2) <= budget + r.getLong(3),
        s"shard ${r.getLong(1)} sum ${r.getLong(2)} exceeds budget+maxdoc")
    }
    val lastShard = back.groupBy("pack_group").agg(max("shard").as("last"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    sums.filter(r => r.getLong(1) < lastShard(r.getInt(0)))
      .foreach(r => assert(r.getLong(2) >= budget - 86L, // max doc size
        s"non-final shard ${r.getLong(1)} underfull: ${r.getLong(2)}"))
  }
}
