package graft.types

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.types._

import FlinkType._

/** Mirrors the reference's unit layer for the type system
  * (/root/reference/tests/unit/decodable/client/test_types.py) plus
  * property tests for parse∘render = id.
  */
class FlinkTypeSpec extends AnyFunSuite {

  test("scalar round-trips (test_types.py:20-29 analog)") {
    val cases = Seq(
      "CHAR(5)", "VARCHAR(10)", "STRING", "BINARY(3)", "VARBINARY(7)", "BYTES",
      "DECIMAL(12, 4)", "DEC(12, 4)", "NUMERIC(12, 4)", "TINYINT", "SMALLINT",
      "INT", "BIGINT", "FLOAT", "DOUBLE", "BOOLEAN", "DATE", "TIME(3)",
      "TIMESTAMP(3) WITHOUT TIME ZONE", "TIMESTAMP(3) WITH TIME ZONE",
      "TIMESTAMP_LTZ(3)", "INTERVAL", "MULTISET")
    cases.foreach { s =>
      val t = parse(s).getOrElse(fail(s"did not parse: $s"))
      assert(t.render == s, s"render mismatch for $s")
    }
  }

  test("parsing is uppercase-only (test_types.py:28-29)") {
    assert(parse("string").isEmpty)
    assert(parse("int").isEmpty)
    assert(parse("Varchar(10)").isEmpty)
  }

  test("DECIMAL defaults: DECIMAL == DECIMAL(10) == DECIMAL(10, 0) (test_types.py:51-58)") {
    assert(parse("DECIMAL").contains(FDecimal(10, 0)))
    assert(parse("DECIMAL(10)").contains(FDecimal(10, 0)))
    assert(parse("DECIMAL(10, 0)").contains(FDecimal(10, 0)))
    assert(parse("DEC").contains(FDec(10, 0)))
    assert(parse("NUMERIC(5)").contains(FNumeric(5, 0)))
  }

  test("synonym equivalence (test_types.py:60-81)") {
    def eqv(a: String, b: String) =
      equivalent(parse(a).get, parse(b).get)
    assert(eqv("VARCHAR(2147483647)", "STRING"))
    assert(!eqv("VARCHAR(10)", "STRING"))
    assert(eqv("VARBINARY(2147483647)", "BYTES"))
    assert(eqv("DECIMAL(10, 2)", "DEC(10, 2)"))
    assert(eqv("DECIMAL(10, 2)", "NUMERIC(10, 2)"))
    assert(!eqv("DECIMAL(10, 2)", "DECIMAL(10, 3)"))
    assert(eqv("FLOAT", "DOUBLE")) // deliberate reference synonym types.py:433-435
    assert(eqv("TIMESTAMP(3) WITH TIME ZONE", "TIMESTAMP_LTZ(3)"))
    assert(!eqv("TIMESTAMP(3) WITHOUT TIME ZONE", "TIMESTAMP_LTZ(3)"))
    // element-wise through compounds (test_types.py:68-71)
    assert(eqv("ARRAY<VARCHAR(2147483647)>", "ARRAY<STRING>"))
    assert(eqv("MAP<STRING, FLOAT>", "MAP<VARCHAR(2147483647), DOUBLE>"))
  }

  test("NOT NULL / PRIMARY KEY wrappers (types.py:64-91,743-762)") {
    assert(parse("INT NOT NULL").contains(FNotNull(FInt)))
    assert(parse("STRING PRIMARY KEY").contains(FPrimaryKey(FString)))
    assert(parse("VARCHAR(5) NOT NULL").get.render == "VARCHAR(5) NOT NULL")
    assert(equivalent(parse("FLOAT NOT NULL").get, parse("DOUBLE NOT NULL").get))
  }

  test("TIMESTAMP WITH LOCAL TIME ZONE full spelling (types.py:586-597)") {
    assert(parse("TIMESTAMP(9) WITH LOCAL TIME ZONE").contains(FTimestampLtz(9)))
    // bare TIMESTAMP(p) defaults to WITHOUT (types.py:556-563)
    assert(parse("TIMESTAMP(3)").contains(FTimestamp(3, timezone = false)))
  }

  test("compound types: arrays both spellings, nested maps, ROW") {
    assert(parse("ARRAY<INT>").contains(FArray(FInt)))
    assert(parse("INT ARRAY").contains(FTArray(FInt)))
    assert(equivalent(parse("INT ARRAY").get, parse("ARRAY<INT>").get))
    assert(parse("MAP<STRING, INT>").contains(FMap(FString, FInt)))
    // bracket-aware nesting — the reference's greedy regex got this wrong
    assert(parse("MAP<MAP<STRING, INT>, BIGINT>")
      .contains(FMap(FMap(FString, FInt), FBigInt)))
    assert(parse("ARRAY<MAP<STRING, INT>>").contains(FArray(FMap(FString, FInt))))
    // ROW fully implemented (reference TODO at types.py:733)
    assert(parse("ROW<a INT, b STRING>")
      .contains(FRow(Seq("a" -> FInt, "b" -> FString))))
  }

  test("Spark bijection") {
    assert(parse("STRING").get.toSpark == StringType)
    assert(parse("DECIMAL(12, 4)").get.toSpark == DecimalType(12, 4))
    assert(parse("TIMESTAMP_LTZ(3)").get.toSpark == TimestampType)
    assert(parse("TIMESTAMP(3)").get.toSpark == TimestampNTZType)
    assert(parse("ARRAY<BIGINT>").get.toSpark == ArrayType(LongType))
    assert(parse("ROW<a INT, b STRING>").get.toSpark ==
      StructType(Seq(StructField("a", IntegerType), StructField("b", StringType))))
    assert(fromSpark(DecimalType(5, 2)) == FDecimal(5, 2))
    assert(fromSpark(StringType) == FString)
  }

  // generator of valid renderable types for the property test
  private val leafGen: Gen[FlinkType] = Gen.oneOf(
    Gen.choose(1, 100).map(FChar(_)), Gen.choose(1, 1000).map(FVarchar(_)),
    Gen.const(FString), Gen.const(FBytes), Gen.choose(1, 100).map(FBinary(_)),
    Gen.zip(Gen.choose(1, 38), Gen.choose(0, 10)).map { case (p, s) => FDecimal(p, s) },
    Gen.oneOf(FTinyInt, FSmallInt, FInt, FBigInt, FFloat, FDouble, FBoolean,
      FDate, FInterval, FMultiset),
    Gen.choose(0, 9).map(FTime(_)),
    Gen.zip(Gen.choose(0, 9), Gen.oneOf(true, false)).map { case (p, tz) => FTimestamp(p, tz) },
    Gen.choose(0, 9).map(FTimestampLtz(_)))

  private def typeGen(depth: Int): Gen[FlinkType] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      4 -> leafGen,
      1 -> Gen.lzy(typeGen(depth - 1).map(FArray(_))),
      1 -> Gen.lzy(Gen.zip(typeGen(depth - 1), typeGen(depth - 1)).map { case (k, v) => FMap(k, v) }),
      1 -> Gen.lzy(typeGen(depth - 1).map(FNotNull(_))))

  test("property: parse(render(t)) == t over 500 generated types") {
    (1 to 500).foreach { i =>
      val t = typeGen(2).pureApply(Gen.Parameters.default, Seed(i.toLong))
      assert(parse(t.render).contains(t), s"round-trip failed for ${t.render}")
    }
  }
}
