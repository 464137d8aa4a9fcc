package graft.engine

/** Dialect fixups applied to pipeline/preview SQL before execution — the
  * single place Flink-dialect text (what the reference's models are
  * written in) is adapted to Spark's parser.
  *
  * Two gaps, handled in one literal/comment-aware scan:
  *
  * 1. `!=` → `<>` — the reference rewrites `!=` because its dialect
  *    rejects it (/root/reference/dbt/adapters/decodable/impl.py:637-639).
  *    Spark accepts both; we keep the hook live (and, unlike the
  *    reference's blanket `str.replace`, never touch string literals).
  * 2. String literals: Flink/standard SQL collapse `''` to `'` and treat
  *    backslashes as raw characters. Spark's default lexer instead
  *    processes backslash escapes (`'\['` → `[` — silently corrupting
  *    grok patterns), and its `escapedStringLiterals=true` mode keeps
  *    backslashes raw but no longer collapses `''`. Neither matches, so
  *    each literal is decoded with Flink rules and re-emitted in Spark's
  *    default dialect (backslashes doubled, quotes re-doubled).
  *
  * Line (`--`) and block (slash-star) comments are passed through
  * untouched — an apostrophe in a comment must not open a literal.
  */
object SqlDialect {

  def rewrite(sql: String): String = {
    val out = new StringBuilder(sql.length + 16)
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        // decode a Flink literal: '' is an escaped quote, backslash is raw
        val value = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = sql.charAt(i)
          if (ch == '\'') {
            if (i + 1 < n && sql.charAt(i + 1) == '\'') { value.append('\''); i += 2 }
            else { closed = true; i += 1 }
          } else { value.append(ch); i += 1 }
        }
        // re-emit in Spark's default dialect
        out.append('\'')
        value.toString.foreach {
          case '\\' => out.append("\\\\")
          case '\'' => out.append("''")
          case ch => out.append(ch)
        }
        out.append('\'')
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val end = sql.indexOf('\n', i)
        val stop = if (end < 0) n else end + 1
        out.append(sql.substring(i, stop)); i = stop
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val end = sql.indexOf("*/", i + 2)
        val stop = if (end < 0) n else end + 2
        out.append(sql.substring(i, stop)); i = stop
      } else if (c == '!' && i + 1 < n && sql.charAt(i + 1) == '=') {
        out.append("<>"); i += 2
      } else {
        out.append(c); i += 1
      }
    }
    out.toString
  }
}
