package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.Engine
import graft.schema.StreamSchema

/** Connector catalog — the engine analog of the reference's connector set
  * `datagen | kafka | kinesis | rest | s3`
  * (/root/reference/decodable/client/api.py:38-44) with connection types
  * source/sink (api.py:46-48), mapped onto Spark's own source formats:
  *
  * | reference | here | notes |
  * |---|---|---|
  * | datagen  | `rate` source | rows/sec generator, remapped through a projection |
  * | kafka    | `kafka` source/sink | passes options through; needs the kafka connector jar + brokers at runtime |
  * | kinesis  | — | third-party connector; declared unsupported (the reference itself just names it) |
  * | rest     | direct DataFrame append | [[Engine.appendRows]] — the seed-ingest path (impl.py:502-574) |
  * | s3       | file source (parquet/csv/json on s3a://) | start positions: full replay vs `latestFirst` |
  *
  * Start positions (api.py:22-35, `earliest`/`latest`): Kafka →
  * `startingOffsets`; file sources → replay-all vs `latestFirst=true`.
  */
object Connectors {

  sealed trait StartPosition { def kafkaOffsets: String }
  case object Earliest extends StartPosition { val kafkaOffsets = "earliest" }
  case object Latest extends StartPosition { val kafkaOffsets = "latest" }

  final case class ConnectorSpec(
      connector: String,
      properties: Map[String, String] = Map.empty,
      startPosition: StartPosition = Earliest)

  val Supported: Set[String] = Set("datagen", "kafka", "rest", "s3", "file")

  /** Open a streaming source for a connector spec. The returned frame is
    * unbounded; bind it to a stream with [[bindSource]]. */
  def open(spark: SparkSession, spec: ConnectorSpec): DataFrame = spec.connector match {
    case "datagen" =>
      val rps = spec.properties.getOrElse("rows.per.second", "100")
      spark.readStream.format("rate").option("rowsPerSecond", rps).load()
    case "kafka" =>
      val reader = spark.readStream.format("kafka")
        .option("startingOffsets", spec.startPosition.kafkaOffsets)
      spec.properties.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
    case "s3" | "file" =>
      val path = spec.properties.getOrElse("path",
        throw new IllegalArgumentException("file/s3 connector requires 'path'"))
      val format = spec.properties.getOrElse("format", "parquet")
      val schema = spec.properties.getOrElse("schema",
        throw new IllegalArgumentException(
          "file/s3 streaming source requires an explicit 'schema' (DDL string)"))
      val reader = spark.readStream.format(format).schema(schema)
      val positioned =
        if (spec.startPosition == Latest) reader.option("latestFirst", "true") else reader
      positioned.load(path)
    case "rest" =>
      throw new IllegalArgumentException(
        "rest connector has no continuous source; append events with Engine.appendRows " +
          "(the reference's seed-ingest path)")
    case other =>
      throw new IllegalArgumentException(
        s"unsupported connector '$other' (supported: ${Supported.mkString(", ")})")
  }

  /** Bind a connector source to a catalog stream: project the source frame
    * onto the stream's declared schema columns and continuously append —
    * the analog of a source connection feeding a stream
    * (client.py:433-501). Returns the running query. */
  def bindSource(engine: Engine, name: String, source: DataFrame,
                 checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = engine.catalog.get(name).getOrElse(
      throw new IllegalArgumentException(s"stream '$name' not found")).schema
    val cols = schema.toStruct.fieldNames.toSeq
    source.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => engine.appendRows(name, batch) }
      .start()
  }

  /** Batch read of an external file table (the s3 connector's bounded
    * form; `s3a://` URIs work unchanged when the hadoop-aws jars are on
    * the cluster classpath). */
  def readBatch(spark: SparkSession, path: String, format: String = "parquet",
                schema: Option[StreamSchema] = None): DataFrame = {
    val reader = spark.read.format(format)
    schema.map(s => reader.schema(s.toStruct)).getOrElse(reader).load(path)
  }
}
