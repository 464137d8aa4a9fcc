package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** Flink→Spark dialect rewrites: != outside literals only, literal
  * re-encoding (backslashes raw, '' collapsed), comment transparency. */
class SqlDialectSpec extends AnyFunSuite {

  test("!= becomes <> outside literals, never inside") {
    assert(SqlDialect.rewrite("SELECT 1 WHERE a != b") == "SELECT 1 WHERE a <> b")
    assert(SqlDialect.rewrite("SELECT '!=' AS op WHERE a != b") ==
      "SELECT '!=' AS op WHERE a <> b")
  }

  test("backslashes in literals survive (Spark default would eat them)") {
    // Flink text '\[' must reach the engine as backslash-bracket:
    // re-emitted as '\\[' for Spark's default lexer
    assert(SqlDialect.rewrite("""SELECT grok(v, '\[%{NUMBER:n}\]')""") ==
      """SELECT grok(v, '\\[%{NUMBER:n}\\]')""")
  }

  test("doubled quotes collapse per standard SQL and re-escape for Spark") {
    // Flink 'yyyy''T''' means yyyy'T' — re-emitted with Spark's '' escape
    assert(SqlDialect.rewrite("SELECT to_timestamp(x, 'dd''T''')") ==
      "SELECT to_timestamp(x, 'dd''T''')")
    // mixed: backslash AND quote in one literal
    assert(SqlDialect.rewrite("""SELECT 'a\b''c'""") == """SELECT 'a\\b''c'""")
  }

  test("comments pass through untouched, apostrophes in them do not open literals") {
    val sql =
      """SELECT 1 -- don't touch != here
        |/* block with 'quotes' and != */
        |WHERE a != 2""".stripMargin
    val out = SqlDialect.rewrite(sql)
    assert(out.contains("-- don't touch != here"))
    assert(out.contains("/* block with 'quotes' and != */"))
    assert(out.endsWith("WHERE a <> 2"))
  }

  test("unterminated literal degrades gracefully") {
    assert(SqlDialect.rewrite("SELECT 'abc") == "SELECT 'abc'")
  }
}
