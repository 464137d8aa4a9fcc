package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[UrlCuration]] — normal-form rules, idempotence, registered-domain
  * extraction, and the plan shapes (normalize = zero exchanges,
  * dedup = one hash shuffle on the canonical URL). */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("url")
      .select(UrlCuration.normalizeUrl(col("url")).as("n"))
      .as[String].head()

  test("normal form: case, default port, fragment, tracking, param sort, slash") {
    assert(norm("HTTPS://WWW.Ex.COM:443/A/B/?z=2&utm_source=f&a=1#frag")
      === "https://www.ex.com/A/B?a=1&z=2")
    assert(norm("http://ex.com:80/") === "http://ex.com/")
    // non-default port survives; path case is significant
    assert(norm("https://ex.com:8443/Q?b=1") === "https://ex.com:8443/Q?b=1")
    // all params tracking -> query dropped entirely
    assert(norm("https://ex.com/p?utm_a=1&utm_b=2&ref=x") === "https://ex.com/p")
    // empty path -> '/'
    assert(norm("https://ex.com?a=1") === "https://ex.com/?a=1")
    // xref is NOT ref (anchored kill-list)
    assert(norm("https://ex.com/p?xref=1") === "https://ex.com/p?xref=1")
  }

  test("normalization is idempotent on its own output") {
    val urls = Seq(
      "HTTPS://WWW.Ex.COM:443/A/?z=2&utm_source=f&a=1#x",
      "http://a.b.co.uk:80/p/q/?ref=r&b=2&a=1",
      "https://ex.com:8443/Q#only-frag",
      "https://ex.com")
    val once = urls.toDF("url")
      .select(UrlCuration.normalizeUrl(col("url")).as("n")).as[String].collect()
    val twice = once.toSeq.toDF("url")
      .select(UrlCuration.normalizeUrl(col("url")).as("n")).as[String].collect()
    assert(once.toSeq === twice.toSeq)
  }

  test("registered domain: eTLD+1 with two-label public suffixes") {
    val got = Seq("www.news.bbc.co.uk", "a.example.com", "example.com",
      "deep.sub.x.com.au", "localhost")
      .toDF("h").select(UrlCuration.registeredDomain(col("h")).as("d"))
      .as[String].collect().toSeq
    assert(got === Seq("bbc.co.uk", "example.com", "example.com", "x.com.au", ""))
  }

  test("urlDedup merges normalization-equivalent fetches; plan has one shuffle") {
    val docs = Seq(
      (1L, "https://ex.com/p?a=1&b=2&utm_c=1"),
      (2L, "HTTPS://EX.com:443/p/?b=2&a=1#f"),   // same canonical as 1
      (3L, "https://ex.com/p?a=1&b=3")            // different
    ).toDF("doc_id", "url")
    val out = UrlCuration.urlDedup(docs, "doc_id", "url")
      .orderBy("url_norm").collect()
    assert(out.length === 2)
    assert(out(0).getString(0) === "https://ex.com/p?a=1&b=2")
    assert(out(0).getLong(1) === 1L && out(0).getLong(2) === 2L)
    assert(out(1).getLong(2) === 1L)
    val exchanges = UrlCuration.urlDedup(docs, "doc_id", "url")
      .queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, "urlDedup must shuffle exactly once (on url_norm)")
  }

  test("normalized() is shuffle-free (row-local expression chain)") {
    val docs = Seq((1L, "https://ex.com/p?a=1")).toDF("doc_id", "url")
    val plan = UrlCuration.normalized(docs, "doc_id", "url")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("domainCap keeps at most cap docs per registered domain, deterministically") {
    val docs = (0L until 200L).map(i =>
      (i, s"https://${if (i % 4 == 0) "only" else "farm"}.ex${i % 2}.com/p/$i"))
      .toDF("doc_id", "url")
    val out = UrlCuration.domainCap(docs, "doc_id", "url", cap = 10, salt = "t")
    val byDom = out.groupBy("registered_domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom.values.forall(_ <= 10))
    // deterministic across reruns
    val again = UrlCuration.domainCap(docs, "doc_id", "url", cap = 10, salt = "t")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === out.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
