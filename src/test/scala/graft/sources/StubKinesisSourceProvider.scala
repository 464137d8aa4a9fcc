package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.streaming.Source
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructType}

/** TEST-ONLY stub of the spark-sql-kinesis source interface (the qubole
  * connector's `StreamSourceProvider` + `DataSourceRegister` shape,
  * dialect `startingposition` ∈ {TRIM_HORIZON, LATEST, AT_TIMESTAMP}):
  * registered via META-INF/services under the short name `stub-kinesis`
  * and injected into [[Connectors]]'s provider table through its test
  * seam, so ConnectorsSpec can assert `Connectors.open` maps
  * stream/region/start-position options onto the provider — the real jar
  * cannot run in this sandbox (no AWS endpoint, no egress), but the
  * option-mapping contract is the engine's own code and IS testable.
  *
  * [[StubKinesisSourceProvider.lastOptions]] captures the option map the
  * engine hands the source at `load()` (Spark resolves the schema
  * eagerly via [[sourceSchema]]); [[createSource]] would only run at
  * query start, which the mapping test never does.
  */
class StubKinesisSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "stub-kinesis"

  private val fixed = new StructType().add("data", StringType)

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    StubKinesisSourceProvider.lastOptions = parameters
    (shortName(), schema.getOrElse(fixed))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    StubKinesisSourceProvider.lastOptions = parameters
    throw new UnsupportedOperationException(
      "test stub: no live kinesis behind this provider")
  }
}

object StubKinesisSourceProvider {
  /** The most recent option map Spark delivered to the provider. */
  @volatile var lastOptions: Map[String, String] = Map.empty
}
