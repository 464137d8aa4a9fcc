package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.{Matcher, Pattern}
import scala.collection.mutable

/** `grok(value, pattern)` — the one non-ANSI scalar function the reference's
  * shipped models use (Decodable built-in; see
  * /root/reference/example_project/example/models/example/http_events.sql:41-46).
  * Expands `%{SYNTAX:name}` tokens into capturing groups using a base-pattern
  * library re-derived from the public grok pattern definitions, applies the
  * regex (unanchored, logstash-style `find`), and returns
  * `Map(name -> captured)`; null when the line does not match.
  *
  * Implemented as a plain Scala function wrapped in a UDF; the compiled regex
  * is cached per pattern string (thread-safe, per-JVM) so repeated rows pay
  * only the match cost. At 100 TB scale this is a per-row regex — the cache
  * avoids recompilation, and the UDF stays fully distributed (no driver work).
  */
object Grok {

  /** Base patterns, re-expressed from the public grok library semantics.
    * All inner groups are non-capturing so user captures keep their index.
    */
  val basePatterns: Map[String, String] = {
    val base10num = "(?:[+-]?(?:[0-9]+(?:\\.[0-9]+)?|\\.[0-9]+))"
    val year = "(?:\\d{4})"
    val monthnum = "(?:0?[1-9]|1[0-2])"
    val monthday = "(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])"
    val hour = "(?:2[0123]|[01]?[0-9])"
    val minute = "(?:[0-5][0-9])"
    val second = "(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)"
    val tz = "(?:Z|[+-]" + hour + "(?::?" + minute + ")?)"
    val ipv4 =
      "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
    Map(
      "WORD" -> "\\b\\w+\\b",
      "NOTSPACE" -> "\\S+",
      "SPACE" -> "\\s*",
      "DATA" -> ".*?",
      "GREEDYDATA" -> ".*",
      "INT" -> "(?:[+-]?(?:[0-9]+))",
      "BASE10NUM" -> base10num,
      "NUMBER" -> base10num,
      "POSINT" -> "\\b(?:[1-9][0-9]*)\\b",
      "YEAR" -> year,
      "MONTHNUM" -> monthnum,
      "MONTHDAY" -> monthday,
      "HOUR" -> hour,
      "MINUTE" -> minute,
      "SECOND" -> second,
      "ISO8601_TIMEZONE" -> tz,
      "TIMESTAMP_ISO8601" ->
        (year + "-" + monthnum + "-" + monthday + "[T ]" + hour + ":?" + minute +
          "(?::?" + second + ")?" + tz + "?"),
      "IPV4" -> ipv4,
      "IP" -> ipv4,
      "HOSTNAME" ->
        "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b",
      "UUID" -> "[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
      "LOGLEVEL" ->
        "(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo?(?:rmation)?|INFO?(?:RMATION)?|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
      "QUOTEDSTRING" -> "(?:\"(?:\\\\.|[^\\\\\"])*\")",
      "QS" -> "(?:\"(?:\\\\.|[^\\\\\"])*\")",
      "PATH" -> "(?:/[^\\s?*]*)+",
      // widened set, same re-derivation from the public grok definitions
      "USERNAME" -> "[a-zA-Z0-9._-]+",
      "USER" -> "[a-zA-Z0-9._-]+",
      "EMAILADDRESS" -> ("[a-zA-Z0-9!#$%&'*+\\-/=?^_`{|}~.]+@" +
        "\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b"),
      "MONTH" ->
        "\\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\\b",
      "DAY" ->
        "(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
      "MONTHNUM2" -> "(?:0[1-9]|1[0-2])",
      "HTTPDATE" ->
        "(?:(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9]))/(?:\\b(?:[Jj]an(?:uary|uar)?|[Ff]eb(?:ruary|ruar)?|[Mm](?:a|ä)?r(?:ch|z)?|[Aa]pr(?:il)?|[Mm]a(?:y|i)?|[Jj]un(?:e|i)?|[Jj]ul(?:y|i)?|[Aa]ug(?:ust)?|[Ss]ep(?:tember)?|[Oo](?:c|k)?t(?:ober)?|[Nn]ov(?:ember)?|[Dd]e(?:c|z)(?:ember)?)\\b)/(?:\\d{4}):(?:2[0123]|[01]?[0-9]):?(?:[0-5][0-9])(?::?(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?))? (?:Z|[+-](?:2[0123]|[01]?[0-9])(?::?(?:[0-5][0-9]))?|[+-]\\d{4})",
      "MAC" -> "(?:[A-Fa-f0-9]{2}[:-]){5}[A-Fa-f0-9]{2}",
      "IPV6" ->
        "(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}|(?:[0-9A-Fa-f]{1,4}:)*::(?:[0-9A-Fa-f]{1,4}:)*(?:[0-9A-Fa-f]{1,4})?",
      "IPORHOST" ->
        "(?:(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)|\\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\\.?\\b)",
      "URIPATH" -> "(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\\-]*)+",
      "URIPARAM" -> "\\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\\-\\[\\]<>]*"
    )
  }

  /** A compiled grok pattern: the regex plus capture names in group order. */
  final case class Compiled(regex: Pattern, names: Array[String])

  private val tokenRe =
    Pattern.compile("%\\{(\\w+)(?::([\\w.\\[\\]@-]+))?\\}")

  def compile(grokPattern: String): Compiled = {
    val m = tokenRe.matcher(grokPattern)
    val sb = new StringBuilder
    val names = mutable.ArrayBuffer[String]()
    var last = 0
    while (m.find()) {
      sb.append(grokPattern.substring(last, m.start()))
      val syntax = m.group(1)
      val name = Option(m.group(2))
      val body = basePatterns.getOrElse(
        syntax,
        throw new IllegalArgumentException(s"unknown grok pattern %{$syntax}"))
      name match {
        case Some(n) => names += n; sb.append("(").append(body).append(")")
        case None => sb.append("(?:").append(body).append(")")
      }
      last = m.end()
    }
    sb.append(grokPattern.substring(last))
    Compiled(Pattern.compile(sb.toString), names.toArray)
  }

  private val cache = new ConcurrentHashMap[String, Compiled]()

  private def cached(p: String): Compiled = {
    val hit = cache.get(p)
    if (hit != null) hit
    else { val c = compile(p); cache.putIfAbsent(p, c); c }
  }

  /** Core evaluation: null (None) when no match, else name -> capture. */
  def eval(value: String, pattern: String): Option[Map[String, String]] = {
    if (value == null || pattern == null) return None
    val c = cached(pattern)
    val m: Matcher = c.regex.matcher(value)
    if (!m.find()) None
    else {
      val b = Map.newBuilder[String, String]
      var i = 0
      while (i < c.names.length) {
        val g = m.group(i + 1)
        if (g != null) b += (c.names(i) -> g)
        i += 1
      }
      Some(b.result())
    }
  }
}
