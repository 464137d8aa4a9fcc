package graft.engine

/** Dialect fixups applied to user SQL before execution.
  *
  * The reference rewrites `!=` to `<>` because its dialect rejects `!=`
  * (/root/reference/dbt/adapters/decodable/impl.py:637-639). Spark accepts
  * both, so the rewrite is semantically a no-op here, but we keep the hook
  * live: it is the single place future dialect gaps get patched.
  */
object SqlDialect {
  def rewrite(sql: String): String = sql.replace("!=", "<>")
}
