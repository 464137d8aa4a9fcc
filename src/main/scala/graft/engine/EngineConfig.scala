package graft.engine

import org.apache.spark.sql.SparkSession

import graft.sources.Connectors.{Earliest, Latest, StartPosition}

/** Engine bootstrap configuration — the analog of the reference's profile
  * credentials (`DecodableAdapterCredentials`,
  * /root/reference/dbt/adapters/decodable/connections.py:36-57), minus the
  * remote-account plumbing that collapses in a single-process engine
  * (profile/account/api_url → the catalog root directory).
  *
  * Key aliases mirror `_ALIASES` (connections.py:51-57): `timeout`,
  * `timeout_ms`, `request_timeout` → `request_timeout_ms`; `namespace` →
  * `local_namespace`.
  */
final case class EngineConfig(
    catalogRoot: String,
    localNamespace: Option[String] = None,
    materializeTests: Boolean = false,
    previewStart: StartPosition = Earliest,
    requestTimeoutMs: Long = 60000L) {

  def build(spark: SparkSession): Engine =
    new Engine(spark, catalogRoot, localNamespace, materializeTests, requestTimeoutMs)
}

object EngineConfig {
  private val Aliases = Map(
    "timeout" -> "request_timeout_ms",
    "timeout_ms" -> "request_timeout_ms",
    "request_timeout" -> "request_timeout_ms",
    "namespace" -> "local_namespace")

  /** Build from a flat key-value profile (e.g. parsed properties). */
  def fromMap(props: Map[String, String]): EngineConfig = {
    val norm = props.map { case (k, v) => Aliases.getOrElse(k, k) -> v }
    EngineConfig(
      catalogRoot = norm.getOrElse("catalog_root",
        throw new IllegalArgumentException("engine profile requires 'catalog_root'")),
      localNamespace = norm.get("local_namespace").filter(_.nonEmpty),
      materializeTests = norm.get("materialize_tests").exists(_.toBoolean),
      previewStart = norm.get("preview_start") match {
        case Some("latest") => Latest
        case Some("earliest") | None => Earliest
        case Some(other) =>
          throw new IllegalArgumentException(s"unknown preview_start '$other'")
      },
      requestTimeoutMs = norm.get("request_timeout_ms").map(_.toLong).getOrElse(60000L))
  }
}
