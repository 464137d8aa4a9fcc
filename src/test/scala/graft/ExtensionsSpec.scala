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
}
