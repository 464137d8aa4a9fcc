package graft.engine

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.schema._
import graft.types.FlinkType._

/** ProjectRunner: the reference's ACTUAL example_project model files
  * (read from /root/reference at test time, never copied) materialize
  * through the engine, configs and all. Plus dependency ordering and
  * ref() resolution on a synthetic project.
  */
class ProjectRunnerSpec extends SparkSpec {

  private val refModels =
    "/root/reference/example_project/example/models/example"

  test("the reference example_project's model files run unmodified") {
    assume(Files.exists(Paths.get(refModels)), "reference checkout not present")
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-proj"))
    val runner = new ProjectRunner(e)

    // the two raw input streams the quickstart assumes exist
    e.createStream("envoy_raw", StreamSchema(Seq(PhysicalField("value", FString))))
    e.appendRows("envoy_raw", Seq(
      """[2023-01-02T03:04:05Z] "GET /p HTTP/1.1" 200 - 10 20 5 4 "a" "ua" "r" "auth" "uh"""")
      .toDF("value"))
    e.createStream("_events", StreamSchema(Seq(
      PhysicalField("resource_type", FString),
      PhysicalField("audit_event_type", FString),
      PhysicalField("timestamp", FBigInt))))
    e.appendRows("_events",
      Seq(("pipeline", "created", 1672628645000L))
        .toDF("resource_type", "audit_event_type", "timestamp"))

    val results = runner.run(refModels)
    assert(results.keySet ==
      Set("http_events", "events_count", "http_events_bytes_sent"))
    assert(results.values.forall(_ == Created))

    // configs were honored: watermark + PKs landed in the catalog defs
    val he = e.catalog.get("http_events").get
    assert(he.schema.watermarks.map(_.name) == Seq("timestamp"))
    assert(he.properties.get("start_position.envoy_raw").contains("earliest"))
    val ec = e.catalog.get("events_count").get
    assert(ec.schema.primaryKey == Seq("resource_type", "audit_event_type"))
    assert(e.catalog.get("http_events_bytes_sent").get.schema.primaryKey == Seq("method"))

    // and the data flowed
    assert(e.preview("SELECT method FROM http_events").head.getString(0) == "GET")
    assert(e.preview("SELECT count_observed FROM events_count").head.getLong(0) == 1L)
  }

  test("dependency ordering + ref() resolution") {
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-proj2"))
    val runner = new ProjectRunner(e)
    e.createStream("raw", StreamSchema(Seq(PhysicalField("x", FBigInt))))
    e.appendRows("raw", Seq(1L, 2L, 3L).toDF("x"))

    val dir = tmpDir("models")
    // zz_summary sorts AFTER a_base alphabetically but depends on it via ref()
    Files.write(Paths.get(dir, "zz_summary.sql"),
      "SELECT count(*) AS n FROM {{ ref('a_base') }}".getBytes)
    Files.write(Paths.get(dir, "a_base.sql"),
      """{{ config(output_stream={"schema_v2": {"constraints": {"primary_key": ["x"]}}}) }}
        |SELECT x FROM raw WHERE x > 1""".stripMargin.getBytes)

    val results = runner.run(dir)
    assert(results.values.forall(_ == Created))
    assert(e.preview("SELECT n FROM zz_summary").head.getLong(0) == 2L)
    assert(e.catalog.get("a_base").get.schema.primaryKey == Seq("x"))

    // second run: unchanged specs are skipped (the dbt idempotency contract)
    val again = runner.run(dir)
    assert(again.values.forall(_ == Unchanged))
  }

  test("node selection: name, +name, name+, +name+ over the model graph") {
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-sel"))
    val runner = new ProjectRunner(e)
    e.createStream("raw_sel", StreamSchema(Seq(PhysicalField("x", FBigInt))))
    e.appendRows("raw_sel", Seq(1L, 2L, 3L).toDF("x"))

    val dir = tmpDir("models-sel")
    // chain: base -> mid -> top, plus an unrelated island
    Files.write(Paths.get(dir, "base.sql"),
      "SELECT x FROM raw_sel".getBytes)
    Files.write(Paths.get(dir, "mid.sql"),
      "SELECT x FROM {{ ref('base') }} WHERE x > 1".getBytes)
    Files.write(Paths.get(dir, "top.sql"),
      "SELECT count(*) AS n FROM {{ ref('mid') }}".getBytes)
    Files.write(Paths.get(dir, "island.sql"),
      "SELECT x * 2 AS y FROM raw_sel".getBytes)

    // bare name: just that node (deps must pre-exist)
    assert(runner.run(dir, select = Seq("base")).keySet == Set("base"))
    // +name: node plus ancestors
    assert(runner.run(dir, select = Seq("+mid")).keySet == Set("base", "mid"))
    // name+: node plus descendants
    assert(runner.run(dir, select = Seq("mid+")).keySet == Set("mid", "top"))
    // +name+ and unions
    assert(runner.run(dir, select = Seq("+mid+")).keySet ==
      Set("base", "mid", "top"))
    assert(runner.run(dir, select = Seq("island", "top")).keySet ==
      Set("island", "top"))
    // a node chosen by an earlier selector must not truncate a later
    // selector's graph walk: "mid" is already chosen, but +top still
    // reaches base THROUGH mid
    assert(runner.run(dir, select = Seq("mid", "+top")).keySet ==
      Set("base", "mid", "top"))
    assert(runner.run(dir, select = Seq("mid", "base+")).keySet ==
      Set("base", "mid", "top"))
    // everything when unselected
    assert(runner.run(dir).keySet == Set("base", "mid", "top", "island"))
    intercept[IllegalArgumentException] {
      runner.run(dir, select = Seq("nope"))
    }
  }

  test("incremental materialization: append-only runs + unique_key merge (beyond-reference)") {
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-proj3"))
    val runner = new ProjectRunner(e)
    e.createStream("src_inc", StreamSchema(Seq(
      PhysicalField("k", FString), PhysicalField("v", FBigInt),
      PhysicalField("seq", FBigInt))))
    e.appendRows("src_inc",
      Seq(("a", 1L, 1L), ("b", 2L, 2L)).toDF("k", "v", "seq"))

    val dir = tmpDir("models-inc")
    // the canonical dbt incremental idiom: the filter block only exists
    // on append runs (render-time removal, since {{ this }} has no
    // stream yet on the first build)
    Files.write(Paths.get(dir, "state.sql"),
      """{{ config(materialized='incremental', unique_key='k') }}
        |SELECT k, v, seq FROM src_inc
        |{% if is_incremental() %}
        |WHERE seq > (SELECT coalesce(max(seq), -1) FROM {{ this }})
        |{% endif %}""".stripMargin.getBytes)

    // first build: full
    assert(runner.run(dir)("state") == Created)
    assert(e.preview("SELECT k, v FROM state ORDER BY k")
      .map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 1L), ("b", 2L)))

    // new + updated rows arrive; incremental run appends only seq > max
    e.appendRows("src_inc",
      Seq(("a", 10L, 3L), ("c", 3L, 4L)).toDF("k", "v", "seq"))
    assert(runner.run(dir)("state") == Updated)
    // unique_key=k → PK compaction merges: a updated, c inserted
    assert(e.preview("SELECT k, v FROM state ORDER BY k")
      .map(r => (r.getString(0), r.getLong(1))) ==
      Seq(("a", 10L), ("b", 2L), ("c", 3L)))
    // append-only: the old rows were NOT reprocessed (4 events total)
    assert(e.readStream("state", compact = false).count() == 4)

    // full refresh rebuilds from scratch: all 4 source rows reprocessed
    // in one batch (compacted read still folds to 3 keys)
    assert(runner.run(dir, fullRefresh = true)("state") == Updated)
    assert(e.readStream("state", compact = false).count() == 4)
    assert(e.preview("SELECT count(*) AS n FROM state").head.getLong(0) == 3L)
  }

  test("the reference's functional scenario at project level: seed -> run -> schema.yml tests") {
    val e = new Engine(spark, tmpDir("graft-proj5"))
    val runner = new ProjectRunner(e)

    // fixtures.py:17-23 seed
    val seedDir = tmpDir("seeds")
    Files.write(Paths.get(seedDir, "my_seed.csv"),
      "name,age\nAdam,31\nGeorge,27\nLily,59\n".getBytes)
    e.seed("my_seed", s"$seedDir/my_seed.csv")

    // fixtures.py:26-28 model + fixtures.py:31-39 yml, verbatim shapes
    val dir = tmpDir("models-fn")
    Files.write(Paths.get(dir, "my_model.sql"),
      "select CHAR_LENGTH(name) as name_length from {{ ref('my_seed') }}".getBytes)
    Files.write(Paths.get(dir, "my_model.yml"),
      """version: 2
        |models:
        |  - name: my_model
        |    columns:
        |      - name: name_length
        |        tests:
        |          - not_null
        |          - unique
        |""".stripMargin.getBytes)

    assert(runner.run(dir)("my_model") == Created)
    val results = runner.runTests(dir)
    assert(results("not_null_my_model_name_length").status == e.TestPass)
    // Adam(4) George(6) Lily(4) → duplicate length 4 → unique test errors
    val uniq = results("unique_my_model_name_length")
    assert(uniq.failures == 1L && uniq.status == e.TestError)

    // cleanup run-operation ends the scenario (test_simple_project.py:48-70)
    e.cleanup()
    assert(e.catalog.list().isEmpty)
  }

  test("dependency ordering holds under a namespace (qualified vs bare spellings)") {
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-proj-ns"), namespace = Some("dev"))
    val runner = new ProjectRunner(e)
    e.createStream("raw", StreamSchema(Seq(PhysicalField("x", FBigInt))))
    e.appendRows("raw", Seq(1L, 2L, 3L).toDF("x"))

    val dir = tmpDir("models-ns")
    // zz_summary sorts after a_base but depends on it — with a namespace
    // the ref resolves to the bare name while the catalog stores dev__a_base;
    // dep detection must match either spelling or a_base builds too late
    Files.write(Paths.get(dir, "zz_summary.sql"),
      "SELECT count(*) AS n FROM {{ ref('a_base') }}".getBytes)
    Files.write(Paths.get(dir, "a_base.sql"),
      "SELECT x FROM raw WHERE x > 1".getBytes)
    // and one model spelling its dep QUALIFIED by hand
    Files.write(Paths.get(dir, "zz_squared.sql"),
      "SELECT x * x AS xx FROM dev__a_base".getBytes)

    val results = runner.run(dir)
    assert(results.values.forall(_ == Created))
    assert(e.preview("SELECT n FROM dev__zz_summary").head.getLong(0) == 2L)
    assert(e.preview("SELECT count(*) AS c FROM dev__zz_squared").head.getLong(0) == 2L)
  }

  test("runProject walks seeds/ before models/ (dbt project layout)") {
    val e = new Engine(spark, tmpDir("graft-proj-seeds"))
    val runner = new ProjectRunner(e)
    val root = tmpDir("proj-root")
    Files.createDirectories(Paths.get(root, "seeds"))
    Files.createDirectories(Paths.get(root, "models"))
    Files.write(Paths.get(root, "seeds", "people.csv"),
      "name,age\nAdam,31\nLily,59\n".getBytes)
    Files.write(Paths.get(root, "models", "adults.sql"),
      "SELECT name FROM {{ ref('people') }} WHERE age >= 18".getBytes)

    val results = runner.runProject(root)
    assert(results("people") == Created)
    assert(results("adults") == Created)
    assert(e.preview("SELECT name FROM adults ORDER BY name")
      .map(_.getString(0)) == Seq("Adam", "Lily"))
    // idempotent second build: seed refreshes, unchanged model skips
    val again = runner.runProject(root)
    assert(again("adults") == Unchanged)
  }

  test("unknown materializations error like the reference's unsupported macro") {
    val e = new Engine(spark, tmpDir("graft-proj4"))
    val runner = new ProjectRunner(e)
    val dir = tmpDir("models-bad")
    Files.write(Paths.get(dir, "bad.sql"),
      "{{ config(materialized='view') }}\nSELECT 1 AS x".getBytes)
    intercept[IllegalArgumentException](runner.run(dir))
  }

  test("seed column_types from yml properties override inference (impl.py:516-531)") {
    val e = new Engine(spark, tmpDir("graft-seedtypes"))
    val runner = new ProjectRunner(e)
    val root = tmpDir("proj-seedtypes")
    val seeds = Paths.get(root, "seeds")
    Files.createDirectories(seeds)
    Files.createDirectories(Paths.get(root, "models"))
    Files.write(seeds.resolve("prices.csv"), "sku,amount\na,1.5\nb,2.25\n".getBytes)
    Files.write(seeds.resolve("schema.yml"),
      """seeds:
        |  - name: prices
        |    config:
        |      column_types:
        |        amount: DECIMAL(8, 2)
        |        bogus_column: NO_SUCH_TYPE
        |""".stripMargin.getBytes)

    assert(runner.runProject(root)("prices") == Created)
    val d = e.catalog.get("prices").get
    // amount: DOUBLE inferred, DECIMAL declared; unknown override strings
    // fall back to inferred silently (impl.py:521-527)
    assert(d.schema.fields.find(_.name == "amount").get ==
      PhysicalField("amount", FDecimal(8, 2)))
    val row = e.preview("SELECT amount FROM prices ORDER BY sku").head
    assert(row.schema("amount").dataType ==
      org.apache.spark.sql.types.DecimalType(8, 2))
    assert(row.getDecimal(0) == new java.math.BigDecimal("1.50"))
  }

  test("declared schema_v2.fields bypass inference (impl.py:490-500)") {
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-declared"))
    val runner = new ProjectRunner(e)
    e.createStream("raw_amt", StreamSchema(Seq(PhysicalField("x", FDouble))))
    e.appendRows("raw_amt", Seq(1.25, 2.5).toDF("x"))

    val dir = tmpDir("models-declared")
    // avg(x) infers DOUBLE; the declared field pins DECIMAL(10, 2)
    Files.write(Paths.get(dir, "amounts.sql"),
      """{{ config(output_stream={"schema_v2": {"fields": [
        |  {"name": "amt", "type": "DECIMAL(10, 2)"}]}}) }}
        |SELECT avg(x) AS amt FROM raw_amt""".stripMargin.getBytes)

    assert(runner.run(dir)("amounts") == Created)
    val d = e.catalog.get("amounts").get
    assert(d.schema.fields == Seq(PhysicalField("amt", FDecimal(10, 2))))
    // the materialized data is cast to the declared type, not the inferred one
    val row = e.preview("SELECT amt FROM amounts").head
    assert(row.schema("amt").dataType ==
      org.apache.spark.sql.types.DecimalType(10, 2))
    assert(row.getDecimal(0) == new java.math.BigDecimal("1.88"))
  }

  test("schema.yml data_type hints override inferred column types (impl.py:663-669)") {
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-hints"))
    val runner = new ProjectRunner(e)
    e.createStream("raw_vals", StreamSchema(Seq(PhysicalField("x", FDouble))))
    e.appendRows("raw_vals", Seq(3.0, 4.5).toDF("x"))

    val dir = tmpDir("models-hints")
    Files.write(Paths.get(dir, "totals.sql"),
      "SELECT sum(x) AS total, count(*) AS n FROM raw_vals".getBytes)
    Files.write(Paths.get(dir, "schema.yml"),
      """models:
        |  - name: totals
        |    columns:
        |      - name: total
        |        data_type: DECIMAL(12, 3)
        |      - name: n
        |""".stripMargin.getBytes)

    assert(runner.run(dir)("totals") == Created)
    val d = e.catalog.get("totals").get
    // hinted column overridden; unhinted column keeps its inferred type
    assert(d.schema.fields.head == PhysicalField("total", FDecimal(12, 3)))
    assert(d.schema.fields(1).name == "n")
    val row = e.preview("SELECT total, n FROM totals").head
    assert(row.schema("total").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 3))
    assert(row.getDecimal(0) == new java.math.BigDecimal("7.500"))
  }

  test("graft config namespace passes bucketing through to the stream def (round 4)") {
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-proj-bkt"))
    val runner = new ProjectRunner(e)
    e.createStream("src_bkt", StreamSchema(Seq(
      PhysicalField("k", FBigInt), PhysicalField("v", FString))))
    e.appendRows("src_bkt", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))

    val dir = tmpDir("models-bkt")
    Files.write(Paths.get(dir, "bucketed.sql"),
      """{{ config(graft={'bucket_by': 'k', 'bucket_count': '4'}) }}
        |SELECT k, v FROM src_bkt""".stripMargin.getBytes)
    assert(runner.run(dir)("bucketed") == Created)

    val d = e.catalog.get("bucketed").get
    assert(d.properties.get("bucket_by").contains("k"))
    assert(d.properties.get("bucket_count").contains("4"))
    // the materialized stream really is table-backed with the bucket spec
    assert(spark.catalog.tableExists(e.bucketTableName("bucketed")))
    assert(e.readStream("bucketed").orderBy("k").as[(Long, String)]
      .collect().toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    e.dropStream("bucketed")
    assert(!spark.catalog.tableExists(e.bucketTableName("bucketed")))
  }

  test("a training-data curation project runs end-to-end through the model surface") {
    import spark.implicits._
    // The library's two halves meeting: the reference's dbt-style
    // project workflow (models + ref() + configs + tests) expressing a
    // corpus-curation DAG in plain SQL — score, dedup-by-content,
    // redact, split — over the driver's documents table. A reference
    // user's day-one curation project, no Scala API required.
    val e = new Engine(spark, tmpDir("graft-curproj"))
    val runner = new ProjectRunner(e)
    e.createStream("raw_docs", StreamSchema(Seq(
      PhysicalField("doc_id", FBigInt), PhysicalField("text", FString),
      PhysicalField("source", FString))))
    val raw = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "source")
    e.appendRows("raw_docs", raw)

    val dir = tmpDir("curation-models")
    Files.write(Paths.get(dir, "scored_docs.sql"),
      """SELECT doc_id, text, source,
        |  CHAR_LENGTH(text) AS n_chars,
        |  size(split(text, ' ')) AS n_tokens
        |FROM raw_docs
        |WHERE size(split(text, ' ')) >= 5""".stripMargin.getBytes)
    Files.write(Paths.get(dir, "clean_docs.sql"),
      """{{ config(output_stream={"schema_v2": {"constraints": {"primary_key": ["doc_id"]}}}) }}
        |SELECT doc_id, regexp_replace(text, '[0-9]+', '<NUM>') AS text,
        |  source, n_chars, n_tokens
        |FROM (SELECT *,
        |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |      FROM {{ ref('scored_docs') }})
        |WHERE rn = 1""".stripMargin.getBytes)
    Files.write(Paths.get(dir, "doc_splits.sql"),
      """SELECT doc_id, source,
        |  CASE WHEN pmod(xxhash64(doc_id), 10) < 8 THEN 'train'
        |       WHEN pmod(xxhash64(doc_id), 10) = 8 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM {{ ref('clean_docs') }}""".stripMargin.getBytes)

    val results = runner.run(dir)
    assert(results.keySet == Set("scored_docs", "clean_docs", "doc_splits"))
    assert(results.values.forall(_ == Created))
    // idempotency: unchanged model specs skip on re-run
    assert(runner.run(dir).values.forall(_ == Unchanged))

    // the DAG computed what the equivalent direct plan computes
    val expectScored = raw
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"text", " ")) >= 5)
    assert(e.preview("SELECT count(*) AS n FROM scored_docs").head.getLong(0)
      == expectScored.count())
    val expectClean = expectScored.select(
      org.apache.spark.sql.functions.md5($"text")).distinct().count()
    assert(e.preview("SELECT count(*) AS n FROM clean_docs").head.getLong(0)
      == expectClean)
    assert(e.catalog.get("clean_docs").get.schema.primaryKey == Seq("doc_id"))
    // redaction landed: no digits survive in clean text
    assert(e.runTest("digits_redacted",
      "SELECT doc_id FROM clean_docs WHERE text RLIKE '[0-9]'") == 0L)
    // split covers every clean doc and is deterministic three-way
    val splits = e.preview(
      "SELECT split, count(*) AS n FROM doc_splits GROUP BY split")
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    assert(splits.values.sum == expectClean)
    assert(splits("train") > splits.getOrElse("val", 0L))
    // dbt-style schema test over the materialized output
    assert(e.runTest("split_not_null",
      "SELECT doc_id FROM doc_splits WHERE split IS NULL") == 0L)
  }
}
