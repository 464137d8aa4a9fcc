package graft.engine

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

import org.apache.spark.sql.functions.{col, input_file_name, max, min}

import graft.SparkSpec
import graft.schema._
import graft.types.FlinkType._

/** End-to-end lifecycle over a temp catalog — the engine analog of the
  * reference's one functional scenario (seed → run → test → cleanup,
  * /root/reference/tests/functional/adapter/simple/test_simple_project.py:48-70)
  * plus the lifecycle operators L1-L9 it exercises only piecemeal.
  */
class EngineSpec extends SparkSpec {

  private def newEngine(ns: Option[String] = None): Engine =
    new Engine(spark, tmpDir("graft-engine"), namespace = ns)

  private def writeCsv(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("seed → run → test loop (functional scenario analog)") {
    val e = newEngine()
    // fixtures.py:17-25 seed shape: id,name
    val csv = writeCsv(tmpDir("seed"), "seed.csv",
      "id,name\n1,Alice\n2,Bob\n3,\n")
    assert(e.seed("my_seed", csv) == Created)

    // model: CHAR_LENGTH over the seed (fixtures.py:27)
    assert(e.createModel("my_model",
      "SELECT id, name, CHAR_LENGTH(name) AS name_len FROM my_seed") == Created)
    val rows = e.preview("SELECT * FROM my_model ORDER BY id")
    assert(rows.size == 3)

    // not_null test on name → 1 failure (row 3 has empty name -> null)
    val failures = e.runTest("not_null_my_model_name",
      "SELECT name FROM my_model WHERE name IS NULL")
    assert(failures == 1L)

    // cleanup removes everything (operations.sql:90-104)
    e.cleanup()
    assert(e.catalog.list().isEmpty)
  }

  test("seed type inference + column_types override + stringified cast (impl.py:150-172,516-531,560-566)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed2"), "s.csv",
      "id,price,flag,day\n1,10.5,true,2024-01-02\n2,20.25,false,2024-01-03\n")
    e.seed("typed_seed", csv, columnTypes = Map("price" -> "DOUBLE", "bogus" -> "NOPE"))
    val d = e.catalog.get("typed_seed").get
    val byName = d.schema.fields.collect { case PhysicalField(n, t) => n -> t }.toMap
    assert(byName("id") == FDecimal(10, 0))   // number → DECIMAL(10, 0)
    assert(byName("price") == FDouble)        // override applied
    assert(byName("flag") == FBoolean)
    assert(byName("day") == FDate)
    val rows = e.preview("SELECT * FROM typed_seed ORDER BY id")
    assert(rows.map(_.get(1)) == Seq(10.5, 20.25)) // cast from strings, not CSV parse
  }

  test("has_changed drives skip/rebuild (impl.py:402-417, table.sql:29-41)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed3"), "s.csv", "k,v\na,1\nb,2\n")
    e.seed("src", csv)
    val sql = "SELECT k, CAST(v AS BIGINT) AS v FROM src"
    assert(e.createModel("m", sql) == Created)
    assert(e.createModel("m", sql) == Unchanged)          // identical spec → skip
    assert(e.createModel("m", sql, fullRefresh = true) == Updated)
    assert(e.createModel("m", sql + " WHERE v > 1") == Updated) // sql changed
    assert(e.preview("SELECT * FROM m").size == 1)
  }

  test("change-stream reads compact to latest row per PK (handler.py:87-94 batch analog)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed4"), "s.csv", "k,v\na,1\nb,2\n")
    e.seed("updates", csv)
    e.createModel("state",
      "SELECT k, CAST(v AS BIGINT) AS v FROM updates",
      ModelConfig(primaryKey = Seq("k")))
    // new arrivals: a→10 (update), c→3 (insert)
    import spark.implicits._
    e.appendRows("state", Seq(("a", 10L), ("c", 3L)).toDF("k", "v"))
    val rows = e.preview("SELECT k, v FROM state ORDER BY k")
    assert(rows.map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("a", 10L), ("b", 2L), ("c", 3L)))
    // uncompacted read still has all 4 events
    assert(e.readStream("state", compact = false).count() == 4)
  }

  test("time-travel: readStreamAsOf returns the compacted state at an earlier epoch") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed-tt"), "s.csv", "k,v\na,1\nb,2\n")
    e.seed("tt", csv)
    e.catalog.put(e.catalog.get("tt").get.copy(
      schema = e.catalog.get("tt").get.schema.copy(primaryKey = Seq("k"))))
    val epochAfterSeed = e.catalog.get("tt").get.writeEpoch
    import spark.implicits._
    e.appendRows("tt", Seq(("a", "10"), ("c", "3")).toDF("k", "v"))

    // current state: a updated, c inserted
    assert(e.readStream("tt").count() == 3)
    // as-of the seed epoch: the original two rows with original values
    val past = e.readStreamAsOf("tt", epochAfterSeed)
      .collect().map(r => (r.getString(0), r.getDecimal(1).longValue())).sorted
    assert(past.toSeq == Seq(("a", 1L), ("b", 2L)))
    // as-of epoch 0 (before any write): empty
    assert(e.readStreamAsOf("tt", 0L).isEmpty)
  }

  test("drop cascades to consumer pipelines (impl.py:197-257)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed5"), "s.csv", "k,v\na,1\n")
    e.seed("base", csv)
    e.createModel("mid", "SELECT k, v FROM base")
    e.createModel("leaf", "SELECT count(*) AS n FROM mid")
    assert(e.catalog.consumers("mid").map(_.name) == Seq("leaf"))
    e.dropStream("base", cascade = true)
    assert(e.catalog.list().isEmpty) // base → mid → leaf all dropped
  }

  test("rename rewrites consumer pipeline SQL via identifiers (impl.py:277-352 done properly)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed6"), "s.csv", "k,v\na,1\n")
    e.seed("old_name", csv)
    e.createModel("consumer", "SELECT k FROM old_name WHERE v <> '0'")
    e.renameStream("old_name", "new_name")
    assert(!e.catalog.exists("old_name"))
    assert(e.catalog.exists("new_name"))
    val c = e.catalog.get("consumer").get
    assert(c.sql.get.contains("FROM new_name"))
    assert(c.sources == Seq("new_name"))
    // consumer still runs after rename
    e.runPipeline("consumer")
    assert(e.preview("SELECT * FROM consumer").size == 1)
  }

  test("truncate keeps schema, empties data (impl.py:259-275)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed7"), "s.csv", "k,v\na,1\nb,2\n")
    e.seed("t", csv)
    e.truncate("t")
    assert(e.preview("SELECT * FROM t").isEmpty)
    assert(e.catalog.get("t").get.schema.fields.size == 2)
    // seeding again into the truncated stream works (seed.sql reset path)
    e.seed("t", csv)
    assert(e.preview("SELECT * FROM t").size == 2)
  }

  test("namespace prefixing ns__name (adapters.sql:17-28)") {
    val e = newEngine(ns = Some("dev"))
    val csv = writeCsv(tmpDir("seed8"), "s.csv", "k,v\na,1\n")
    e.seed("s", csv)
    assert(e.catalog.exists("dev__s"))
    assert(e.catalog.qualify("s") == "dev__s")
    // models can reference the short name; the def is stored qualified
    e.createModel("m", "SELECT k FROM s")
    assert(e.catalog.get("dev__m").get.sources.isEmpty
      || e.catalog.get("dev__m").get.sources == Seq("dev__s"))
    assert(e.preview("SELECT * FROM dev__m").size == 1)
  }

  test("run-operations: stop/delete pipelines, delete streams (operations.sql:17-111)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed9"), "s.csv", "k,v\na,1\n")
    e.seed("s1", csv)
    e.createModel("p1", "SELECT k FROM s1")
    e.stopPipelines(Some(Seq("p1")))
    assert(!e.catalog.get("p1").get.active)
    e.deletePipelines(Some(Seq("p1")))
    assert(e.catalog.get("p1").get.sql.isEmpty) // stream survives
    e.deleteStreams(Some(Seq("p1", "missing")), skipErrors = true)
    assert(!e.catalog.exists("p1"))
    intercept[IllegalArgumentException] {
      e.deleteStreams(Some(Seq("missing")), skipErrors = false)
    }
  }

  test("materialize_tests=true persists the test as a model (test_as_table.sql:17-49)") {
    val e = new Engine(spark, tmpDir("graft-engine"), materializeTests = true)
    val csv = writeCsv(tmpDir("seed10"), "s.csv", "k,v\na,\nb,2\n")
    e.seed("s", csv)
    val failures = e.runTest("assert_v_not_null", "SELECT v FROM s WHERE v IS NULL")
    assert(failures == 1L)
    assert(e.catalog.exists("assert_v_not_null")) // persisted as stream+pipeline
  }

  test("test severity thresholds: error_if / warn_if / pass (get_test_sql contract)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed11"), "s.csv", "k,v\na,\nb,\nc,3\n")
    e.seed("s", csv)
    val nullsSql = "SELECT v FROM s WHERE v IS NULL" // 2 failures
    assert(e.runTestJudged("t_default", nullsSql).status == e.TestError)
    assert(e.runTestJudged("t_warnonly", nullsSql,
      warnIf = "> 0", errorIf = "> 5").status == e.TestWarn)
    assert(e.runTestJudged("t_tolerant", nullsSql,
      warnIf = "> 2", errorIf = "> 5") == e.TestResult(2L, e.TestPass))
    // limit caps the counted failures (dbt's limit config, test.sql:21,32)
    assert(e.runTestJudged("t_limited", nullsSql, limit = Some(1)).failures == 1L)
  }

  test("schema inference errors on unanalyzable SQL (impl.py:496-499)") {
    val e = newEngine()
    intercept[Exception](e.inferSchema("SELECT * FROM does_not_exist"))
  }

  test("compaction order survives >4096 write partitions (epoch not bit-packed with row id)") {
    val e = newEngine()
    import spark.implicits._
    e.createStream("wide", StreamSchema(
      Seq(PhysicalField("k", FPrimaryKey(FString)), PhysicalField("v", FBigInt))))
    // epoch 2 (after the empty init write): k=a written across 4500
    // partitions — under a packed epoch<<45 + monotonically_increasing_id
    // layout, partitions ≥4096 overflow into the epoch field
    e.appendRows("wide",
      Seq(("a", 1L)).toDF("k", "v").union(
        (1 to 2000).map(i => (s"k$i", i.toLong)).toDF("k", "v")).repartition(4500))
    // epoch 3: the update that must win compaction
    e.appendRows("wide", Seq(("a", 2L)).toDF("k", "v"))
    val a = e.readStream("wide").filter("k = 'a'").collect()
    assert(a.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L)))
    // as-of the 4500-partition epoch: original value, all rows present
    assert(e.readStreamAsOf("wide", 2L).filter("k = 'a'").head().getLong(1) == 1L)
    assert(e.readStreamAsOf("wide", 2L).count() == 2001L)
  }

  test("tombstone delete clears a key; earlier epochs still see it (handler.py:87-94 empty-after)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed-del"), "s.csv", "k,v\na,1\nb,2\n")
    e.seed("del", csv)
    e.catalog.put(e.catalog.get("del").get.copy(
      schema = e.catalog.get("del").get.schema.copy(primaryKey = Seq("k"))))
    val beforeDelete = e.catalog.get("del").get.writeEpoch
    import spark.implicits._
    e.deleteKeys("del", Seq("a").toDF("k"))
    // compacted current state: a is gone
    assert(e.readStream("del").collect().map(_.getString(0)).toSeq == Seq("b"))
    // time travel to before the delete: a still there
    assert(e.readStreamAsOf("del", beforeDelete).count() == 2)
    // raw change stream keeps the tombstone row visible as an event
    assert(e.readStream("del", compact = false).count() == 3)
    // re-inserting after a delete resurrects the key
    e.appendRows("del", Seq(("a", "9")).toDF("k", "v"))
    val back = e.preview("SELECT k, v FROM del ORDER BY k")
    assert(back.map(_.getString(0)) == Seq("a", "b"))
    // tombstones need a PK
    intercept[IllegalArgumentException] {
      e.createStream("nopk", StreamSchema(Seq(PhysicalField("x", FString))))
      e.deleteKeys("nopk", Seq("x").toDF("x"))
    }
  }

  test("compactStorage: physical rewrite — fewer files, identical rows and time travel") {
    import spark.implicits._
    val e = newEngine()
    e.createStream("cmp", StreamSchema(
      Seq(PhysicalField("k", FString), PhysicalField("v", FInt))))
    (1 to 8).foreach(i => e.appendRows("cmp", Seq((s"k$i", i)).toDF("k", "v")))
    val dataDir = Paths.get(e.catalog.dataPath("cmp"))
    locally { import scala.jdk.CollectionConverters._
      val before = Files.walk(dataDir).iterator().asScala
        .count(_.toString.endsWith(".parquet"))
      assert(before >= 8, s"expected >=8 files from 8 appends, got $before")
      val rawBefore = e.readStream("cmp", compact = false).collect().toSet
      val asOf3Before = e.readStreamAsOf("cmp", 3L, compact = false).count()
      e.compactStorage("cmp", targetFiles = 2)
      val after = Files.walk(dataDir).iterator().asScala
        .count(_.toString.endsWith(".parquet"))
      assert(after <= 2, s"expected <=2 files after compaction, got $after")
      assert(e.readStream("cmp", compact = false).collect().toSet == rawBefore)
      assert(e.readStreamAsOf("cmp", 3L, compact = false).count() == asOf3Before)
    }
  }

  test("sorted compaction clusters files for data-skipping; describeStream reports stats") {
    import spark.implicits._
    val e = newEngine()
    e.createStream("lay", StreamSchema(
      Seq(PhysicalField("k", FBigInt), PhysicalField("v", FString))))
    // interleaved appends: every file initially spans the whole key range
    (0 until 4).foreach { i =>
      e.appendRows("lay", (0L until 100L).map(j => (j * 4 + i, s"v$i$j"))
        .toDF("k", "v"))
    }
    val before = e.describeStream("lay")
    assert(before.rows == 400 && before.files >= 4 && before.bytes > 0)
    assert(before.writeEpoch >= 4 && !before.hasPipeline)

    e.compactStorage("lay", targetFiles = 4, sortBy = Seq("k"))
    val after = e.describeStream("lay")
    assert(after.rows == 400 && after.files <= 4)
    // range clustering: each file now holds a disjoint k-range, so a
    // point predicate's min/max pruning can touch one file (verify via
    // per-file key ranges: non-overlapping)
    val ranges = spark.read.parquet(e.catalog.dataPath("lay"))
      .select(col("k"), input_file_name().as("f"))
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"file ranges overlap after sorted compaction: $ranges")
      case _ =>
    }
    // contents unchanged
    assert(e.readStream("lay").count() == 400)
  }

  test("vacuum: drops superseded change-stream history, keeps state from the horizon on") {
    import spark.implicits._
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed-vac"), "s.csv", "k,v\na,1\nb,2\n")
    e.seed("vac", csv)
    e.catalog.put(e.catalog.get("vac").get.copy(
      schema = e.catalog.get("vac").get.schema.copy(primaryKey = Seq("k"))))
    e.appendRows("vac", Seq(("a", "10")).toDF("k", "v")) // supersedes a,1
    e.deleteKeys("vac", Seq("b").toDF("k")) // b gone
    val horizon = e.catalog.get("vac").get.writeEpoch
    e.appendRows("vac", Seq(("c", "3")).toDF("k", "v")) // after horizon
    val currentBefore = e.preview("SELECT k, v FROM vac ORDER BY k")

    e.vacuum("vac", horizon)
    // current state identical
    assert(e.preview("SELECT k, v FROM vac ORDER BY k") == currentBefore)
    // as-of at the horizon identical (a=10, b deleted)
    assert(e.readStreamAsOf("vac", horizon).collect()
      .map(r => (r.getString(0), r.get(1).toString)).toSeq == Seq(("a", "10")))
    // history physically gone: raw rows = live-at-horizon (1) + later (1);
    // b's tombstone and both superseded rows are dropped
    assert(e.readStream("vac", compact = false).count() == 2)
    // vacuum needs a PK
    intercept[IllegalArgumentException] {
      e.createStream("vnopk", StreamSchema(Seq(PhysicalField("x", FString))))
      e.vacuum("vnopk", 1L)
    }
  }

  test("exportStream: JSONL shards partitioned by a split column round-trip") {
    import spark.implicits._
    val e = newEngine()
    e.createStream("exp", StreamSchema(Seq(
      PhysicalField("doc_id", FBigInt), PhysicalField("text", FString),
      PhysicalField("split", FString))))
    val rows = (1L to 40L).map(i =>
      (i, s"doc $i", if (i % 4 == 0) "val" else "train"))
    e.appendRows("exp", rows.toDF("doc_id", "text", "split"))

    val out = tmpDir("export")
    e.exportStream("exp", out, format = "json",
      partitionBy = Seq("split"), shardsPerPartition = 2)
    // hive-style split=... directories exist
    assert(Files.exists(Paths.get(out, "split=train")))
    assert(Files.exists(Paths.get(out, "split=val")))
    // round trip: JSONL read-back equals the compacted stream contents
    val back = spark.read.schema("doc_id LONG, text STRING, split STRING")
      .json(out)
    assert(back.count() == 40)
    assert(back.select("doc_id", "text", "split")
      .except(e.readStream("exp")).isEmpty)
    intercept[IllegalArgumentException] {
      e.exportStream("exp", out, format = "avro")
    }
  }

  test("seed infers TIME(3) for HH:mm:ss columns and stores nanos-of-day (impl.py:150-172 agate time)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed-time"), "s.csv",
      "id,at,note\n1,12:34:56.123,x\n2,00:00:01,y\n")
    e.seed("timed", csv)
    val byName = e.catalog.get("timed").get.schema.fields
      .collect { case PhysicalField(n, t) => n -> t }.toMap
    assert(byName("at") == FTime(3))
    assert(byName("note") == FString) // non-time strings stay STRING
    val rows = e.preview("SELECT id, at FROM timed ORDER BY id")
    assert(rows.map(_.getLong(1)) ==
      Seq((12L * 3600 + 34 * 60 + 56) * 1000000000L + 123000000L, 1000000000L))
  }

  test("runTest rewrites dialect exactly once (backslash literals survive)") {
    val e = newEngine()
    val csv = writeCsv(tmpDir("seed-bs"), "s.csv", "k\n1\nx\n")
    e.seed("bs", csv)
    // Flink dialect: backslash is raw, so '\d' is the digit class. A second
    // rewrite would turn it into the two-char literal \d and match nothing.
    assert(e.runTest("digits", raw"SELECT k FROM bs WHERE k RLIKE '\d'") == 1L)
    // the materialize-tests path (createModel) must also rewrite only once
    val em = new Engine(spark, tmpDir("graft-engine-mt"), materializeTests = true)
    em.seed("bs", csv)
    assert(em.runTest("digits_mt", raw"SELECT k FROM bs WHERE k RLIKE '\d'") == 1L)
  }

  test("appendRowsDeduped: ingest-time near-dup curation against the standing stream") {
    import spark.implicits._
    val e = newEngine()
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    e.createStream("corpus", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long", nullable = false).add("text", "string")))

    // first ingest into an empty stream: nothing to collide with
    val d0 = e.appendRowsDeduped("corpus",
      Seq((1L, "alpha beta gamma delta epsilon"),
        (2L, "totally different words entirely here")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(d0 == 0L)
    assert(e.readStream("corpus").count() == 2)

    // second ingest: one exact dup of doc 1, one near-dup of doc 2 (one
    // word changed), one novel doc — only the novel row may land
    val d1 = e.appendRowsDeduped("corpus",
      Seq((10L, "alpha beta gamma delta epsilon"),
        (11L, "totally different words entirely again"),
        (12L, "fresh content nothing like the others")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(d1 == 2L)
    assert(e.readStream("corpus").select("doc_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 12L))
    // repeated-ingest hygiene: each call unpersists its probe frames —
    // a long-running engine must not accumulate blocks per ingest
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore)

    // round 9: the ingest path maintains persisted MinHash index
    // siblings — band postings (rows × 32 bands) bucketed on the probe
    // key, plus the hashed-shingle signatures the exact verify reads —
    // so the standing corpus is never re-shingled per ingest
    val post = e.catalog.get(e.mhPostingsName("corpus"))
    assert(post.nonEmpty, "postings index stream missing")
    assert(post.get.properties("bucket_by") == "band,bkey")
    assert(e.readStream(e.mhPostingsName("corpus")).count() == 3L * 32)
    assert(e.readStream(e.mhSignaturesName("corpus")).count() == 3L)
  }

  test("appendRowsDedupedEmbedding: ingest-time vector dedup against the standing stream") {
    import spark.implicits._
    val e = newEngine()
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    e.createStream("vecs", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", "array<float>")))
    def vec(k: Int): Array[Float] =
      Array.tabulate(8)(d => if (d == k) 5f else 0.1f)

    val d0 = e.appendRowsDedupedEmbedding("vecs",
      Seq((1L, vec(0)), (2L, vec(1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, dims = 8)
    assert(d0 == 0L)
    assert(e.readStream("vecs").count() == 2)

    // second shard: a jittered copy of vector 1 (cos ≈ 1), one novel —
    // only the novel row may land
    val d1 = e.appendRowsDedupedEmbedding("vecs",
      Seq((10L, vec(0).map(_ + 0.01f)), (11L, vec(2)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, dims = 8)
    assert(d1 == 1L)
    assert(e.readStream("vecs").select("vec_id").as[Long].collect().sorted
      .toSeq == Seq(1L, 2L, 11L))
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore)

    // round 9 (VERDICT r8 task 2): the ingest path maintains a persisted
    // postings index — the standing corpus is never re-signatured per
    // ingest. The sibling stream carries the layout epoch in properties
    // and exactly rows × tables posting rows.
    val idx = e.catalog.get(e.lshIndexName("vecs"))
    assert(idx.nonEmpty, "postings index stream missing")
    val tables = idx.get.properties("lsh_tables").toInt
    assert(idx.get.properties("lsh_n").toLong == 3L)
    assert(e.readStream(e.lshIndexName("vecs")).count() == 3L * tables)
    // the index is bucketed on the probe key, so the per-ingest postings
    // join plans with no exchange on the corpus side
    assert(idx.get.properties("bucket_by") == "tbl,bucket")
  }

  test("appendRowsDedupedEmbedding: a stale index layout triggers a one-pass epoch rebuild") {
    import spark.implicits._
    val e = newEngine()
    e.createStream("vecs2", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", "array<float>")))
    def vec(k: Int): Array[Float] =
      Array.tabulate(8)(d => if (d == k) 5f else 0.1f)
    assert(e.appendRowsDedupedEmbedding("vecs2",
      Seq((1L, vec(0)), (2L, vec(1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, dims = 8) == 0L)

    // tamper the pinned layout (as if the solver had moved across an
    // epoch boundary): the next ingest must re-solve, rebuild the
    // postings from the corpus in one pass, and re-pin the solver layout
    val idxName = e.lshIndexName("vecs2")
    val d0 = e.catalog.get(idxName).get
    e.catalog.put(d0.copy(properties = d0.properties +
      ("lsh_planes" -> "19", "lsh_tables" -> "2", "lsh_radius" -> "0")))

    val dropped = e.appendRowsDedupedEmbedding("vecs2",
      Seq((10L, vec(0).map(_ + 0.01f)), (11L, vec(2)))
        .toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, dims = 8)
    assert(dropped == 1L, "rebuilt index must still catch the near-dup")
    val d1 = e.catalog.get(idxName).get
    val solver = graft.operators.Dedup.lshLayout(2L, 0.8,
      targetOccupancy = 16, missTarget = 1e-6, probeRadius = 2, maxTables = 512)
    assert((d1.properties("lsh_planes").toInt, d1.properties("lsh_tables").toInt,
      d1.properties("lsh_radius").toInt) == solver,
      "epoch rebuild must re-pin the solver layout")
    assert(d1.properties("lsh_n").toLong == 3L)
    assert(e.readStream(idxName).count() ==
      3L * d1.properties("lsh_tables").toInt,
      "rebuild + survivor append must leave exactly rows×tables postings")

    // a config change (threshold) is also an epoch boundary: the pinned
    // fingerprint no longer matches, so the ingest rebuilds rather than
    // probing with the wrong layout
    assert(e.appendRowsDedupedEmbedding("vecs2",
      Seq((20L, vec(3))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.9, dims = 8) == 0L)
    val d2 = e.catalog.get(idxName).get
    assert(d2.properties("lsh_threshold") == "0.9")
    assert(d2.properties("lsh_n").toLong == 4L)
  }

  test("out-of-band writes to a deduped stream force an index rebuild") {
    import spark.implicits._
    val e = newEngine()
    e.createStream("oob", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long", nullable = false).add("text", "string")))
    assert(e.appendRowsDeduped("oob",
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text") == 0L)
    // out-of-band: a row lands via plain appendRows — the index never
    // saw it, but the epoch pin notices on the next deduped ingest
    e.appendRows("oob",
      Seq((2L, "totally different words entirely here")).toDF("doc_id", "text"))
    val d = e.appendRowsDeduped("oob",
      Seq((10L, "totally different words entirely here")).toDF("doc_id", "text"),
      "doc_id", "text")
    assert(d == 1L,
      "a near-dup of the out-of-band row must be caught (stale-index hole)")
    // embedding twin: same detector
    e.createStream("oobv", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", "array<float>")))
    def vec(k: Int): Array[Float] =
      Array.tabulate(8)(dd => if (dd == k) 5f else 0.1f)
    assert(e.appendRowsDedupedEmbedding("oobv",
      Seq((1L, vec(0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, dims = 8) == 0L)
    e.appendRows("oobv", Seq((2L, vec(1))).toDF("vec_id", "embedding"))
    assert(e.appendRowsDedupedEmbedding("oobv",
      Seq((10L, vec(1).map(_ + 0.01f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, dims = 8) == 1L,
      "a near-dup of the out-of-band vector must be caught")

    // lifecycle: rename carries the managed siblings (the next ingest
    // probes the EXISTING index — a renamed stream must not re-bootstrap
    // and orphan the old one); cascade drop takes them out
    e.renameStream("oobv", "oobv2")
    assert(e.catalog.get(e.lshIndexName("oobv")).isEmpty)
    assert(e.catalog.get(e.lshIndexName("oobv2")).nonEmpty)
    assert(e.appendRowsDedupedEmbedding("oobv2",
      Seq((11L, vec(1).map(_ + 0.02f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, dims = 8) == 1L)
    e.dropStream("oobv2")
    assert(e.catalog.get(e.lshIndexName("oobv2")).isEmpty,
      "cascade drop must take the index sibling")
    e.dropStream("oob")
    assert(e.catalog.get(e.mhPostingsName("oob")).isEmpty &&
      e.catalog.get(e.mhSignaturesName("oob")).isEmpty)
  }

  test("managed index-sibling suffixes are reserved names (ADVICE r9)") {
    val e = newEngine()
    val st = StreamSchema.fromStruct(new org.apache.spark.sql.types.StructType()
      .add("id", "long", nullable = false))
    // a colliding user stream would be truncated/overwritten by the next
    // deduped ingest's props check and blindly carried by rename
    assertThrows[IllegalArgumentException] { e.createStream("foo__mhpost", st) }
    assertThrows[IllegalArgumentException] { e.createStream("foo__mhsig", st) }
    assertThrows[IllegalArgumentException] { e.createStream("foo__lshidx", st) }
    assertThrows[IllegalArgumentException] { e.createStream("foo__annidx", st) }
    assertThrows[IllegalArgumentException] {
      e.createModel("foo__lshidx", "SELECT 1 AS x")
    }
    assertThrows[IllegalArgumentException] {
      e.seed("foo__mhpost", writeCsv(tmpDir("rs"), "s.csv", "id\n1\n"))
    }
    e.createStream("plain", st)
    assertThrows[IllegalArgumentException] {
      e.renameStream("plain", "plain__mhsig")
    }
    assert(e.catalog.exists("plain"), "failed rename must not move the stream")
  }

  test("out-of-band writes to an index SIBLING force a rebuild (ADVICE r9)") {
    import spark.implicits._
    val e = newEngine()
    e.createStream("sib", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long", nullable = false).add("text", "string")))
    assert(e.appendRowsDeduped("sib",
      Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text") == 0L)
    // corrupt the POSTINGS sibling directly (the main stream is
    // untouched, so the main-epoch pin alone would not notice): an
    // empty postings index would silently miss every near-dup
    e.truncate(e.mhPostingsName("sib"))
    assert(e.appendRowsDeduped("sib",
      Seq((10L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text") == 1L,
      "a near-dup must be caught after sibling corruption (rebuild)")
    // the signatures sibling is pinned too
    e.truncate(e.mhSignaturesName("sib"))
    assert(e.appendRowsDeduped("sib",
      Seq((11L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      "doc_id", "text") == 1L)

    // embedding twin: truncate __lshidx, the next ingest must rebuild
    e.createStream("sibv", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", "array<float>")))
    def vec(k: Int): Array[Float] =
      Array.tabulate(8)(d => if (d == k) 5f else 0.1f)
    assert(e.appendRowsDedupedEmbedding("sibv",
      Seq((1L, vec(0))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, dims = 8) == 0L)
    e.truncate(e.lshIndexName("sibv"))
    assert(e.appendRowsDedupedEmbedding("sibv",
      Seq((10L, vec(0).map(_ + 0.01f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, dims = 8) == 1L,
      "a near-dup must be caught after index corruption (rebuild)")
  }

  test("index siblings auto-compact on the configured cadence") {
    import spark.implicits._
    val e = newEngine()
    e.createStream("cvecs", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", "long", nullable = false)
        .add("embedding", "array<float>")))
    def vec(k: Int): Array[Float] =
      Array.tabulate(8)(d => if (d == k) 5f else 0.1f)
    def fileNames(name: String): Set[String] =
      Option(new java.io.File(e.catalog.dataPath(name)).listFiles())
        .map(_.map(_.getName).filter(_.startsWith("part-")).toSet)
        .getOrElse(Set.empty)
    spark.conf.set("spark.graft.index.compactEvery", "4")
    try {
      val idxName = e.lshIndexName("cvecs")
      // ingest 1: empty-write (epoch 1) + bootstrap postings (2) +
      // survivor append (3) — under the cadence, nothing compacts
      e.appendRowsDedupedEmbedding("cvecs",
        Seq((0L, vec(0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.8, dims = 8)
      val before = fileNames(idxName)
      assert(before.nonEmpty)
      // ingest 2's append is index epoch 4 → the cadence fires and the
      // sibling is REWRITTEN in place: every pre-existing part file is
      // replaced (a long-lived micro-batch stream cannot go
      // metadata-bound on append file sets)
      e.appendRowsDedupedEmbedding("cvecs",
        Seq((1L, vec(1))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.8, dims = 8)
      val after = fileNames(idxName)
      assert(after.nonEmpty && (after & before).isEmpty,
        s"index not rewritten: ${(after & before).size} original files survive")
      // correctness is untouched by the physical rewrite: a dup of an
      // early vector is still caught against the compacted index
      assert(e.appendRowsDedupedEmbedding("cvecs",
        Seq((100L, vec(0).map(_ + 0.01f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.8, dims = 8) == 1L)
    } finally spark.conf.unset("spark.graft.index.compactEvery")
  }

  /** Round-4 verdict item #7: the single-writer `liveRewrites` contract,
    * adversarially tested. Two ingests against ONE stream run on separate
    * threads; each shard is novel against the standing index but
    * near-duplicates the OTHER shard. Un-serialized, both would probe the
    * pre-write index and both would land; the per-stream ingest lock must
    * serialize them so exactly one survivor lands per duplicate group and
    * epochs stay unique — never a corrupt index. */
  /** The scan→swap window of a storage rewrite must hold the same
    * ingest lock as writes: un-serialized, an append committing between
    * compactStorage's scan and its directory swap is wiped by the swap
    * (the appended rows vanish while the epoch bump survives). */
  test("concurrent appendRows during compactStorage cannot lose rows") {
    import spark.implicits._
    val e = newEngine()
    e.createStream("rw", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("id", "long", nullable = false)))
    e.appendRows("rw", (1L to 500L).toDF("id"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val appends = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit =
          (1 to 5).foreach(i => e.appendRows("rw",
            (1000L * i to 1000L * i + 49L).toDF("id")))
      })
      val compacts = pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = (1 to 5).foreach(_ => e.compactStorage("rw", 2))
      })
      appends.get(120, java.util.concurrent.TimeUnit.SECONDS)
      compacts.get(120, java.util.concurrent.TimeUnit.SECONDS)
    } finally pool.shutdown()
    assert(e.readStream("rw").count() == 500L + 5 * 50,
      "rows lost to a rewrite racing an append")
  }

  test("concurrent appendRowsDeduped ingests serialize: cross-shard near-dups cannot both land") {
    import spark.implicits._
    val e = newEngine()
    e.createStream("ccorpus", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long", nullable = false).add("text", "string")))
    e.appendRows("ccorpus",
      Seq((1L, "seed document standing in the index")).toDF("doc_id", "text"))

    // shard A and shard B: novel vs the seed, exact dups of each other,
    // plus one genuinely novel row each
    val shardA = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "unique to shard a nothing shared here")).toDF("doc_id", "text")
    val shardB = Seq(
      (20L, "alpha beta gamma delta epsilon zeta"),
      (21L, "only shard b carries this sentence")).toDF("doc_id", "text")

    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fa = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = e.appendRowsDeduped("ccorpus", shardA, "doc_id", "text")
      })
      val fb = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = e.appendRowsDeduped("ccorpus", shardB, "doc_id", "text")
      })
      val (da, db) = (fa.get(60, java.util.concurrent.TimeUnit.SECONDS),
        fb.get(60, java.util.concurrent.TimeUnit.SECONDS))
      // exactly ONE of the cross-shard duplicates was dropped — by
      // whichever ingest serialized second
      assert(da + db == 1L, s"cross-shard dedup lost: dropped A=$da B=$db")
    } finally pool.shutdown()

    val ids = e.readStream("ccorpus").select("doc_id").as[Long]
      .collect().sorted.toSeq
    // seed + both novel rows + exactly one of {10, 20}
    assert(ids.length == 4 && ids.contains(1L) && ids.contains(11L) &&
      ids.contains(21L) && (ids.contains(10L) ^ ids.contains(20L)),
      s"index corrupted by concurrent ingest: $ids")
    // epochs must be unique per write — duplicate epochs would scramble
    // the change-stream fold's arrival order
    val epochs = spark.read.parquet(e.catalog.dataPath("ccorpus"))
      .select("__graft_epoch").distinct().count()
    assert(epochs == 3L, s"expected 3 distinct write epochs, got $epochs")
  }

  test("interrupted OPTIMIZE rewrites repair on the next read (both storage layouts)") {
    import spark.implicits._
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val e = newEngine()

    // --- non-bucketed: crash simulated between the two atomic moves ---
    e.createStream("plainst", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("k", "long", nullable = false).add("v", "string")))
    e.appendRows("plainst", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val dataDir = e.catalog.dataPath("plainst")
    // stage = byte-identical raw store (internal columns included),
    // exactly what rewriteStorage writes before the swap
    spark.read.parquet(dataDir).write.parquet(dataDir + ".rewrite")
    Files.move(Paths.get(dataDir), Paths.get(dataDir + ".old"),
      StandardCopyOption.ATOMIC_MOVE) // crash: data dir gone, stage complete
    assert(e.readStream("plainst").orderBy("k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "b")))
    assert(!Files.exists(Paths.get(dataDir + ".rewrite")))
    assert(!Files.exists(Paths.get(dataDir + ".old")))

    // --- bucketed: crash simulated mid-saveAsTable (table truncated) ---
    e.createStream("bucketst", StreamSchema.fromStruct(
      new org.apache.spark.sql.types.StructType()
        .add("k", "long", nullable = false).add("v", "string")),
      Map("bucket_by" -> "k", "bucket_count" -> "2"))
    e.appendRows("bucketst", Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v"))
    val bDir = e.catalog.dataPath("bucketst")
    spark.read.parquet(bDir).write.parquet(bDir + ".rewrite")
    // the crash state: a complete stage next to a gutted table dir
    Using.resource(Files.list(Paths.get(bDir))) { s =>
      s.iterator().asScala.toSeq.filter(_.toString.contains("part-"))
        .foreach(Files.delete)
    }
    assert(e.readStream("bucketst").orderBy("k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "x"), (2L, "y"), (3L, "z")))
    assert(!Files.exists(Paths.get(bDir + ".rewrite")))
    // and the repaired store is still the bucketed table (no exchange lost)
    assert(spark.catalog.tableExists(e.bucketTableName("bucketst")))

    // a stage WITHOUT _SUCCESS is a dead partial write: dropped, live
    // data untouched
    Files.createDirectories(Paths.get(bDir + ".rewrite"))
    Files.writeString(Paths.get(bDir + ".rewrite", "part-junk"), "junk")
    assert(e.readStream("bucketst").count() == 3)
    assert(!Files.exists(Paths.get(bDir + ".rewrite")))
  }

  test("close() evicts the registry binding; the registry cannot grow across create/close cycles") {
    // round 11 — VERDICT r10 "what's wrong" item 1: Engine.registry had
    // no removal path, so every constructed engine leaked for the
    // process lifetime
    val before = Engine.registry.size()
    val e = newEngine()
    assert(Engine.registry.size() == before + 1)
    e.registerViews() // binds RootConfKey to this engine's root
    assert(spark.conf.get(Engine.RootConfKey) == e.root)
    e.close()
    assert(Engine.registry.size() == before, "close must evict")
    assert(spark.conf.getOption(Engine.RootConfKey).isEmpty,
      "close must unbind the session conf so bound() cannot resurrect")
    e.close() // idempotent

    // churn: N create/close cycles leave the registry size unchanged
    (1 to 5).foreach { _ => newEngine().close() }
    assert(Engine.registry.size() == before)

    // latest-wins: closing an OLDER instance must not evict the newer
    // engine that took the same root
    val e2 = new Engine(spark, e.root)
    val e3 = new Engine(spark, e.root)
    e2.close()
    assert(Engine.registry.get(e.root) eq e3,
      "an older instance's close must leave the newer binding")
    e3.close()
    assert(Engine.registry.size() == before)
  }
}
