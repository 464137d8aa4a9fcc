package graft

/** The `spark.sql.extensions=graft.GraftExtensions` path: native
  * functions must be available to plain `spark.sql` with NO
  * GraftFunctions.register call. `newSession()` gives a sessionState
  * with no temp functions (so a prior register() in another spec can't
  * mask a broken injection) but the same extensions. */
class ExtensionsSpec extends SparkSpec {

  test("injected functions resolve in a fresh session without register()") {
    val fresh = spark.newSession()
    val cos = fresh.sql(
      """SELECT vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))"""
        .stripMargin).head().getDouble(0)
    assert(cos == 1.0)
    val mh = fresh.sql(
      "SELECT size(minhashes(array(CAST(7 AS BIGINT)), 16))").head().getInt(0)
    assert(mh == 16)
    val grokked = fresh.sql(
      """SELECT grok('x=42', '%{INT:v}')['v']""").head().getString(0)
    assert(grokked == "42")
    val sigs = fresh.sql(
      """SELECT size(plane_sigs(array(CAST(0.5 AS FLOAT)), 'hp0:', 6, 1))"""
    ).head().getInt(0)
    assert(sigs == 1)
  }

  test("DESCRIBE FUNCTION sees the injected registration") {
    val fresh = spark.newSession()
    val desc = fresh.sql("DESCRIBE FUNCTION vec_cosine")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("vec_cosine"))
  }

  test("table functions resolve from plain SQL (round 10: SQL-reachable operators)") {
    import spark.implicits._
    // the TVFs have no imperative register() path — they exist ONLY via
    // the extension injection, so resolving here proves the injection.
    // (temp views are per-session, so the views and the queries share
    // the suite session.)
    val fresh = spark
    Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here"))
      .toDF("doc_id", "text").createOrReplaceTempView("tvf_docs")
    val pairs = fresh.sql(
      """SELECT id_a, id_b, jaccard
        |FROM minhash_pairs('tvf_docs', 'doc_id', 'text', 0.5)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 1.0)))
    Seq((0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("tvf_vecs")
    val top = fresh.sql(
      """SELECT n_id FROM ann_topk('tvf_vecs', 'vec_id', 'embedding',
        |  'vec_id = 0', 1)""".stripMargin).collect().map(_.getLong(0))
    assert(top.toSeq == Seq(1L))
    // every registered graft TVF parses + analyzes (smoke)
    assert(fresh.sql(
      "SELECT count(*) AS n FROM text_quality('tvf_docs')").head().getLong(0) == 3L)
    assert(fresh.sql(
      """SELECT count(*) AS n
        |FROM dedup_exact('tvf_docs', 'doc_id', 'text')""".stripMargin)
      .head().getLong(0) == 2L)
    assert(fresh.sql(
      """SELECT count(*) AS n
        |FROM semdedup('tvf_vecs', 'vec_id', 'embedding', 0.99)""".stripMargin)
      .head().getLong(0) == 3L)
    assert(fresh.sql(
      """SELECT count(*) AS n FROM ann_ivf_topk('tvf_vecs', 'vec_id',
        |  'embedding', 'vec_id = 0', 2, 4)""".stripMargin)
      .head().getLong(0) >= 1L)
    // a non-literal table argument is a loud analysis error, not a
    // silent empty result
    assertThrows[Exception] {
      fresh.sql("SELECT * FROM minhash_pairs(doc_id, 'a', 'b', 0.5)")
        .queryExecution.analyzed
    }
  }
}
