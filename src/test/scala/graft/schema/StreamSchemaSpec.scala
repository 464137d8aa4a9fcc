package graft.schema

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.types.FlinkType
import graft.types.FlinkType._

/** Analog of /root/reference/tests/unit/decodable/client/test_schema.py:
  * field factory kinds, SchemaV2 hash/eq, plus our watermark-expression
  * parsing (SURVEY §2.5 ST1).
  */
class StreamSchemaSpec extends AnyFunSuite {

  private val schema = StreamSchema(
    fields = Seq(
      PhysicalField("id", FNotNull(FBigInt)),
      PhysicalField("name", FString),
      MetadataField("ktime", "timestamp", FTimestampLtz(3)),
      ComputedField("name_upper", "upper(name)")),
    watermarks = Seq(Watermark("ktime", "`ktime` - INTERVAL '0.001' SECOND")),
    primaryKey = Seq("id"))

  test("physical struct: physical+metadata stored, computed applied on read") {
    val st = schema.toStruct
    assert(st.fieldNames.toSeq == Seq("id", "name", "ktime"))
    assert(st("id").dataType == LongType && !st("id").nullable)
    assert(st("ktime").dataType == TimestampType)
  }

  test("primary key from constraint list and from PRIMARY KEY wrapper") {
    assert(schema.primaryKeyColumns == Seq("id"))
    assert(schema.isChangeStream)
    val wrapped = StreamSchema(Seq(
      PhysicalField("k", FPrimaryKey(FString)), PhysicalField("v", FInt)))
    assert(wrapped.primaryKeyColumns == Seq("k"))
    assert(StreamSchema(Seq(PhysicalField("v", FInt))).primaryKeyColumns.isEmpty)
  }

  test("watermark delay parsing (http_events.sql:6-11 / events_count.sql:5-9 shapes)") {
    assert(Watermark("ts", "`ts` - INTERVAL '0.001' SECOND").delayThreshold
      .contains("0.001 seconds"))
    // lowercase `interval` appears in events_count.sql:7
    assert(Watermark("ts", "`ts` - interval '0.100' second").delayThreshold
      .contains("0.100 seconds"))
    assert(Watermark("ts", "`ts` - INTERVAL '5' MINUTE").delayThreshold
      .contains("5 minutes"))
    assert(Watermark("ts", "some_other_expr(ts)").delayThreshold.isEmpty)
  }

  test("content hash is stable and change-sensitive (test_schema.py hash/eq analog)") {
    val same = StreamSchema(
      fields = Seq(
        PhysicalField("id", FNotNull(FBigInt)),
        PhysicalField("name", FString),
        MetadataField("ktime", "timestamp", FTimestampLtz(3)),
        ComputedField("name_upper", "upper(name)")),
      watermarks = Seq(Watermark("ktime", "`ktime` - INTERVAL '0.001' SECOND")),
      primaryKey = Seq("id"))
    assert(schema.contentHash == same.contentHash)
    assert(schema.contentHash !=
      same.copy(primaryKey = Nil).contentHash)
    assert(schema.contentHash !=
      same.copy(fields = same.fields.tail).contentHash)
  }

  test("fromStruct renders nullability as NOT NULL") {
    val st = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", StringType, nullable = true)))
    val ss = StreamSchema.fromStruct(st)
    assert(ss.fields == Seq(
      PhysicalField("a", FNotNull(FInt)), PhysicalField("b", FString)))
  }
}
