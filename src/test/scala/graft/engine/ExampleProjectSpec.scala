package graft.engine

import graft.SparkSpec
import graft.schema._
import graft.types.FlinkType._

/** The switch test: the reference's own example project (the three models
  * under /root/reference/example_project/example/models/example/) runs on
  * this engine with the MODEL SQL VERBATIM — only the Jinja config blocks
  * are translated to [[ModelConfig]] (watermarks, primary keys), exactly
  * the mapping a dbt adapter for this engine would perform.
  */
class ExampleProjectSpec extends SparkSpec {

  // http_events.sql:41-46 — the grok pattern, character-for-character
  private val grokPattern =
    """\[%{TIMESTAMP_ISO8601:timestamp}\] "%{DATA:method} %{DATA:original_path} %{DATA:protocol}" %{DATA:response_code} %{DATA:response_flags} %{NUMBER:bytes_rcvd} %{NUMBER:bytes_sent} %{NUMBER:duration} %{DATA:upstream_svc_time} "%{DATA:x_forwarded_for}" "%{DATA:useragent}" "%{DATA:request_id}" "%{DATA:authority}" "%{DATA:upstream_host}""""

  // http_events.sql:22-47 minus the config block
  private val httpEventsSql =
    s"""SELECT
       |  TO_TIMESTAMP(CAST(envoy['timestamp'] AS STRING), 'yyyy-MM-dd''T''HH:mm:ss''Z''') AS `timestamp`,
       |  CAST(envoy['method']            AS STRING) AS `method`,
       |  CAST(envoy['original_path']     AS STRING) AS original_path,
       |  CAST(envoy['protocol']          AS STRING) AS protocol,
       |  CAST(envoy['response_code']     AS INT)    AS response_code,
       |  CAST(envoy['response_flags']    AS STRING) AS response_flags,
       |  CAST(envoy['bytes_rcvd']        AS INT)    AS bytes_rcvd,
       |  CAST(envoy['bytes_sent']        AS INT)    AS bytes_sent,
       |  CAST(envoy['duration']          AS INT)    AS duration,
       |  CAST(envoy['upstream_svc_time'] AS INT)    AS upstream_svc_time,
       |  CAST(envoy['x_forwarded_for']   AS STRING) AS x_forwarded_for,
       |  CAST(envoy['useragent']         AS STRING) AS useragent,
       |  CAST(envoy['request_id']        AS STRING) AS request_id,
       |  CAST(envoy['authority']         AS STRING) AS authority,
       |  CAST(envoy['upstream_host']     AS STRING) AS upstream_host
       |FROM (
       |    SELECT
       |      grok(
       |        `value`,
       |        '${grokPattern.replace("'", "''")}'
       |      ) AS envoy
       |    FROM envoy_raw
       |)""".stripMargin

  // events_count.sql:18-25 minus the config block
  private val eventsCountSql =
    """select
      |    coalesce(resource_type, '__UNKNOWN__') as resource_type,
      |    coalesce(audit_event_type, '__UNKNOWN__') as audit_event_type,
      |    count(1) as count_observed,
      |    min(to_timestamp_ltz(`timestamp`, 3)) as min_timestamp,
      |    max(to_timestamp_ltz(`timestamp`, 3)) as max_timestamp
      |from (select * from _events)
      |group by resource_type, audit_event_type""".stripMargin

  // http_events_bytes_sent.sql:11-24 minus the config block
  private val bytesSentSql =
    s"""SELECT coalesce(CAST(envoy['method'] AS STRING), '__UNKNOWN__')  AS `method`,
       |       SUM(CAST(envoy['bytes_sent'] AS INT)) AS `total_bytes_sent`
       |FROM (
       |         SELECT grok(
       |                        `value`,
       |                        '${grokPattern.replace("'", "''")}'
       |                    ) AS envoy
       |         FROM envoy_raw)
       |GROUP BY envoy['method']""".stripMargin

  private def envoyLine(ts: String, method: String, path: String, code: Int,
                        rcvd: Int, sent: Int): String =
    s"""[$ts] "$method $path HTTP/1.1" $code - $rcvd $sent 5 4 "10.0.0.1" "curl/8.0" "req-1" "svc.example" "10.0.0.9:8080""""

  test("reference example project: all three models materialize with verbatim SQL") {
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-example"))

    // envoy_raw: raw-line stream the quickstart ingests (schema: value STRING)
    e.createStream("envoy_raw", StreamSchema(Seq(PhysicalField("value", FString))))
    e.appendRows("envoy_raw", Seq(
      envoyLine("2023-01-02T03:04:05Z", "GET", "/products/1", 200, 100, 500),
      envoyLine("2023-01-02T03:04:06Z", "GET", "/products/2", 200, 100, 700),
      envoyLine("2023-01-02T03:04:07Z", "POST", "/cart", 201, 300, 50),
      "this line does not match the grok pattern at all"
    ).toDF("value"))

    // _events: the audit-event stream events_count reads (epoch-millis ts)
    e.createStream("_events", StreamSchema(Seq(
      PhysicalField("resource_type", FString),
      PhysicalField("audit_event_type", FString),
      PhysicalField("timestamp", FBigInt))))
    e.appendRows("_events", Seq(
      ("pipeline", "created", 1672628645000L),
      ("pipeline", "activated", 1672628646000L),
      (null, "created", 1672628647000L)
    ).toDF("resource_type", "audit_event_type", "timestamp"))

    // http_events (watermark from the config block, http_events.sql:6-11)
    assert(e.createModel("http_events", httpEventsSql, ModelConfig(
      watermarks = Seq(Watermark("timestamp",
        "`timestamp` - INTERVAL '0.001' SECOND")))) == Created)
    val rows = e.preview(
      "SELECT method, original_path, response_code, bytes_sent FROM http_events ORDER BY original_path")
    assert(rows.size == 4) // 3 parsed + 1 all-null (grok miss)
    val parsed = rows.filter(!_.isNullAt(0))
    assert(parsed.map(r => (r.getString(0), r.getInt(3))).toSet ==
      Set(("GET", 500), ("GET", 700), ("POST", 50)))
    assert(rows.count(_.isNullAt(0)) == 1)

    // events_count (PK + watermark config, events_count.sql:5-13)
    assert(e.createModel("events_count", eventsCountSql, ModelConfig(
      primaryKey = Seq("resource_type", "audit_event_type"),
      watermarks = Seq(Watermark("min_timestamp",
        "min_timestamp - interval '0.100' SECOND")))) == Created)
    val counts = e.preview(
      "SELECT resource_type, audit_event_type, count_observed FROM events_count ORDER BY 1, 2")
    assert(counts.map(r => (r.getString(0), r.getString(1), r.getLong(2))) == Seq(
      ("__UNKNOWN__", "created", 1L),
      ("pipeline", "activated", 1L),
      ("pipeline", "created", 1L)))

    // http_events_bytes_sent (PK method, http_events_bytes_sent.sql:4-8)
    assert(e.createModel("http_events_bytes_sent", bytesSentSql,
      ModelConfig(primaryKey = Seq("method"))) == Created)
    val sent = e.preview(
      "SELECT method, total_bytes_sent FROM http_events_bytes_sent ORDER BY method")
    assert(sent.map(r => (r.getString(0),
      if (r.isNullAt(1)) None else Some(r.getLong(1)))) == Seq(
      ("GET", Some(1200L)), ("POST", Some(50L)),
      ("__UNKNOWN__", None)).sortBy(_._1)) // SUM of the grok-miss row's NULL

    // change-stream semantics: new events arrive, re-run, PK-compacted read
    e.appendRows("_events",
      Seq(("pipeline", "created", 1672628650000L)).toDF(
        "resource_type", "audit_event_type", "timestamp"))
    e.runPipeline("events_count")
    val after = e.preview(
      "SELECT count_observed FROM events_count WHERE resource_type = 'pipeline' AND audit_event_type = 'created'")
    assert(after.map(_.getLong(0)) == Seq(2L))

    // idempotency: unchanged spec is skipped (README.md:95-98 behavior)
    assert(e.createModel("http_events", httpEventsSql, ModelConfig(
      watermarks = Seq(Watermark("timestamp",
        "`timestamp` - INTERVAL '0.001' SECOND")))) == Unchanged)
  }

  test("http_events watermark reaches the streaming plan") {
    val e = new Engine(spark, tmpDir("graft-example2"))
    e.createStream("envoy_raw", StreamSchema(Seq(PhysicalField("value", FString))))
    e.createModel("http_events", httpEventsSql, ModelConfig(
      watermarks = Seq(Watermark("timestamp",
        "`timestamp` - INTERVAL '0.001' SECOND"))))
    val d = e.catalog.get("http_events").get
    assert(d.schema.watermarks.head.delayThreshold.contains("0.001 seconds"))
    assert(d.sources == Seq("envoy_raw"))
  }

  test("a model's SQL can invoke a graft table function (round 10: SQL-reachable operators)") {
    import spark.implicits._
    val e = new Engine(spark, tmpDir("graft-tvf-model"))
    e.createStream("docs", StreamSchema(Seq(
      PhysicalField("doc_id", FBigInt), PhysicalField("text", FString))))
    e.appendRows("docs", Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here")).toDF("doc_id", "text"))
    // the reference's whole surface is SQL text — a dedup stage must be
    // expressible as a model's SELECT, not only via the Scala API
    assert(e.createModel("dup_pairs",
      """SELECT id_a, id_b, jaccard
        |FROM minhash_pairs('docs', 'doc_id', 'text', 0.5)""".stripMargin)
      == Created)
    val rows = e.readStream("dup_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, 2L, 1.0)))
    // dependency tracking sees THROUGH the TVF: the model's source list
    // carries the stream named in the literal argument, so rename /
    // cascade-drop semantics hold for TVF-shaped pipelines too
    assert(e.catalog.get("dup_pairs").get.sources
      == Seq(e.catalog.qualify("docs")))
    e.dropStream("docs") // cascade must take the TVF consumer
    assert(e.catalog.get("dup_pairs").isEmpty)
  }
}
