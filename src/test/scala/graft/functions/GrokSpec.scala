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

  test("widened base patterns: apache common-log style line") {
    val line = """10.1.2.3 - frank [10/Oct/2000:13:55:36 -0700] "GET /apache_pb.gif HTTP/1.0" 200 2326"""
    val p = """%{IPORHOST:ip} - %{USER:user} \[%{HTTPDATE:ts}\] "%{WORD:verb} %{URIPATH:path} %{DATA:proto}" %{NUMBER:code} %{NUMBER:bytes}"""
    val m = Grok.eval(line, p).getOrElse(fail("no match"))
    assert(m("ip") == "10.1.2.3")
    assert(m("user") == "frank")
    assert(m("ts") == "10/Oct/2000:13:55:36 -0700")
    assert(m("verb") == "GET")
    assert(m("path") == "/apache_pb.gif")
    assert(m("code") == "200")
  }

  test("widened base patterns: email, mac, ipv6, month/day") {
    assert(Grok.eval("mail bob.smith+x@example.co.uk end",
      "%{EMAILADDRESS:e}").get("e") == "bob.smith+x@example.co.uk")
    assert(Grok.eval("if0 00:1A:2b:3C:4d:5E up", "%{MAC:m}").get("m") == "00:1A:2b:3C:4d:5E")
    assert(Grok.eval("addr 2001:db8:0:1:1:1:1:1 ok", "%{IPV6:i}").get("i") ==
      "2001:db8:0:1:1:1:1:1")
    assert(Grok.eval("on Tuesday in March", "%{DAY:d}.*%{MONTH:m}").get("m") == "March")
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
