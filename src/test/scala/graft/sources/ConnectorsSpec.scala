package graft.sources

import graft.SparkSpec
import graft.engine.Engine
import graft.schema._
import graft.types.FlinkType._

/** Connector catalog (SURVEY §2.1 S4/S5): datagen → stream binding,
  * file-source streaming, unsupported-connector errors. */
class ConnectorsSpec extends SparkSpec {

  test("datagen (rate) source binds to a stream and feeds rows (S4)") {
    val e = new Engine(spark, tmpDir("graft-conn"))
    e.createStream("gen", StreamSchema(Seq(
      PhysicalField("timestamp", FTimestampLtz(3)),
      PhysicalField("value", FBigInt))))
    val src = Connectors.open(spark,
      Connectors.ConnectorSpec("datagen", Map("rows.per.second" -> "500")))
    assert(src.isStreaming)
    val q = Connectors.bindSource(e, "gen", src, tmpDir("ckpt"))
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = e.readStream("gen").count()
      }
      assert(n > 0, "datagen produced no rows within 30s")
    } finally q.stop()
  }

  test("file source streams with explicit schema; earliest replays all (S5)") {
    import spark.implicits._
    val dir = tmpDir("filesrc")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(s"$dir/data")
    val src = Connectors.open(spark, Connectors.ConnectorSpec("file",
      Map("path" -> s"$dir/data", "schema" -> "id BIGINT, v STRING")))
    assert(src.isStreaming)
    val e = new Engine(spark, tmpDir("graft-conn2"))
    e.createStream("ingested", StreamSchema(Seq(
      PhysicalField("id", FBigInt), PhysicalField("v", FString))))
    val q = Connectors.bindSource(e, "ingested", src, tmpDir("ckpt2"))
    try {
      q.processAllAvailable()
      assert(e.readStream("ingested").count() == 2)
    } finally q.stop()
  }

  test("unsupported / invalid connectors error clearly") {
    intercept[IllegalArgumentException](
      Connectors.open(spark, Connectors.ConnectorSpec("kinesis")))
    intercept[IllegalArgumentException](
      Connectors.open(spark, Connectors.ConnectorSpec("rest")))
    intercept[IllegalArgumentException](
      Connectors.open(spark, Connectors.ConnectorSpec("file"))) // missing path
  }
}
