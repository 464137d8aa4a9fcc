package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** grok(value, pattern) semantics — the non-ANSI scalar the reference's
  * shipped models rely on (http_events.sql:41-46 pattern shape). */
class GrokSpec extends AnyFunSuite {

  test("envoy-style access-log line (http_events.sql:41-46 analog)") {
    val pattern = """\[%{TIMESTAMP_ISO8601:timestamp}\] "%{DATA:method} %{DATA:original_path} %{DATA:protocol}" %{DATA:response_code} %{DATA:response_flags} %{NUMBER:bytes_rcvd} %{NUMBER:bytes_sent}"""
    val line = """[2023-01-02T03:04:05.678Z] "GET /api/v1/thing HTTP/1.1" 200 - 123 4567"""
    val m = Grok.eval(line, pattern).getOrElse(fail("no match"))
    assert(m("timestamp") == "2023-01-02T03:04:05.678Z")
    assert(m("method") == "GET")
    assert(m("original_path") == "/api/v1/thing")
    assert(m("protocol") == "HTTP/1.1")
    assert(m("response_code") == "200")
    assert(m("bytes_rcvd") == "123")
    assert(m("bytes_sent") == "4567")
  }

  test("no match returns None (reference grok yields NULL)") {
    assert(Grok.eval("not a log line", "%{IPV4:ip} -").isEmpty)
    assert(Grok.eval(null, "%{NUMBER:n}").isEmpty)
  }

  test("unnamed tokens match but do not capture") {
    val m = Grok.eval("a 42 b", "%{WORD} %{NUMBER:n} %{WORD:w}").get
    assert(m == Map("n" -> "42", "w" -> "b"))
  }

  test("IPV4 / UUID / LOGLEVEL base patterns") {
    assert(Grok.eval("host 10.1.2.3 up", "%{IPV4:ip}").get("ip") == "10.1.2.3")
    assert(Grok.eval("id=550e8400-e29b-41d4-a716-446655440000",
      "%{UUID:u}").get("u") == "550e8400-e29b-41d4-a716-446655440000")
    assert(Grok.eval("level=WARN msg", "%{LOGLEVEL:l}").get("l") == "WARN")
  }

  test("unknown pattern name throws") {
    intercept[IllegalArgumentException](Grok.compile("%{NOPE:x}"))
  }

  test("compiled patterns are cached") {
    val p = "%{NUMBER:n}"
    assert(Grok.eval("1", p).isDefined)
    assert(Grok.eval("2", p).get("n") == "2")
  }
}
