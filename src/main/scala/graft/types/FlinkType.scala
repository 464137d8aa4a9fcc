package graft.types

import org.apache.spark.sql.types._

/** The engine's SQL type lattice: the Flink SQL scalar/compound types the
  * reference accepts for stream schemas, re-expressed as a Scala ADT with a
  * bijection to Spark [[DataType]]s.
  *
  * Semantics re-derived from /root/reference/decodable/client/types.py:
  *   - string round-trip via `parse` / `render` (types.py:40-61 dispatch);
  *   - parse is case-sensitive UPPERCASE (test_types.py:28-29);
  *   - synonym equality (types.py:26-35): `VARCHAR(2147483647)` ≡ `STRING`
  *     (types.py:132-134), `VARBINARY(2147483647)` ≡ `BYTES`
  *     (types.py:205-207), `DECIMAL` ≡ `DEC` ≡ `NUMERIC` (types.py:290-293),
  *     `FLOAT` ≡ `DOUBLE` (types.py:433-435, deliberate in the reference),
  *     `TIMESTAMP(p) WITH TIME ZONE` ≡ `TIMESTAMP_LTZ(p)` (types.py:546-548);
  *     compound types compare element-wise (test_types.py:68-71);
  *   - defaults: `DECIMAL` == `DECIMAL(10)` == `DECIMAL(10, 0)`
  *     (test_types.py:51-58);
  *   - `T NOT NULL` and `T PRIMARY KEY` wrap any type (types.py:64-91,743-762);
  *   - `ROW` is declared-but-unimplemented in the reference (types.py:733
  *     TODO); we implement it fully (`ROW<name type, ...>`) — an improvement.
  *
  * Equality: case classes give structural equality on the exact spelling;
  * synonym-aware comparison goes through [[FlinkType.equivalent]] /
  * [[FlinkType#canonical]] so that `render` still round-trips the original
  * spelling (as the reference does by keeping distinct classes).
  */
sealed trait FlinkType {
  /** Flink SQL string form (reference `__repr__`). */
  def render: String

  /** Synonym-canonical form: synonyms map to one representative, recursively. */
  def canonical: FlinkType = this

  /** The Spark type this stream column materializes as. */
  def toSpark: DataType

  override def toString: String = render
}

object FlinkType {
  val MaxLength: Int = Int.MaxValue // 2147483647, Flink's max VARCHAR/VARBINARY

  // --- strings ---
  final case class FChar(length: Int) extends FlinkType {
    def render = s"CHAR($length)"
    def toSpark: DataType = CharType(length)
  }
  final case class FVarchar(length: Int) extends FlinkType {
    def render = s"VARCHAR($length)"
    override def canonical: FlinkType = if (length == MaxLength) FString else this
    def toSpark: DataType = if (length == MaxLength) StringType else VarcharType(length)
  }
  case object FString extends FlinkType {
    def render = "STRING"
    def toSpark: DataType = StringType
  }

  // --- binaries ---
  final case class FBinary(length: Int) extends FlinkType {
    def render = s"BINARY($length)"
    def toSpark: DataType = BinaryType
  }
  final case class FVarbinary(length: Int) extends FlinkType {
    def render = s"VARBINARY($length)"
    override def canonical: FlinkType = if (length == MaxLength) FBytes else this
    def toSpark: DataType = BinaryType
  }
  case object FBytes extends FlinkType {
    def render = "BYTES"
    def toSpark: DataType = BinaryType
  }

  // --- exact numerics ---
  sealed trait DecimalLike extends FlinkType {
    def precision: Int
    def scale: Int
    override def canonical: FlinkType = FDecimal(precision, scale)
    def toSpark: DataType = DecimalType(precision, scale)
  }
  final case class FDecimal(precision: Int = 10, scale: Int = 0) extends DecimalLike {
    def render = s"DECIMAL($precision, $scale)"
  }
  final case class FDec(precision: Int = 10, scale: Int = 0) extends DecimalLike {
    def render = s"DEC($precision, $scale)"
  }
  final case class FNumeric(precision: Int = 10, scale: Int = 0) extends DecimalLike {
    def render = s"NUMERIC($precision, $scale)"
  }

  case object FTinyInt extends FlinkType { def render = "TINYINT"; def toSpark: DataType = ByteType }
  case object FSmallInt extends FlinkType { def render = "SMALLINT"; def toSpark: DataType = ShortType }
  case object FInt extends FlinkType { def render = "INT"; def toSpark: DataType = IntegerType }
  case object FBigInt extends FlinkType { def render = "BIGINT"; def toSpark: DataType = LongType }

  // --- approximate numerics (reference equates FLOAT ≡ DOUBLE; we keep the
  // synonym in `canonical` but materialize Spark-exact types) ---
  case object FFloat extends FlinkType {
    def render = "FLOAT"
    override def canonical: FlinkType = FDouble
    def toSpark: DataType = FloatType
  }
  case object FDouble extends FlinkType { def render = "DOUBLE"; def toSpark: DataType = DoubleType }

  case object FBoolean extends FlinkType { def render = "BOOLEAN"; def toSpark: DataType = BooleanType }

  // --- date/time ---
  case object FDate extends FlinkType { def render = "DATE"; def toSpark: DataType = DateType }
  /** No Spark TIME type exists; materialized as nanos-of-day BIGINT. */
  final case class FTime(precision: Int) extends FlinkType {
    def render = s"TIME($precision)"
    def toSpark: DataType = LongType
  }
  final case class FTimestamp(precision: Int, timezone: Boolean) extends FlinkType {
    def render = s"TIMESTAMP($precision) ${if (timezone) "WITH" else "WITHOUT"} TIME ZONE"
    override def canonical: FlinkType =
      if (timezone) FTimestampLtz(precision) else this
    def toSpark: DataType = if (timezone) TimestampType else TimestampNTZType
  }
  final case class FTimestampLtz(precision: Int) extends FlinkType {
    def render = s"TIMESTAMP_LTZ($precision)"
    def toSpark: DataType = TimestampType
  }

  // --- compound ---
  /** `ARRAY<T>` prefix spelling. */
  final case class FArray(elem: FlinkType) extends FlinkType {
    def render = s"ARRAY<${elem.render}>"
    override def canonical: FlinkType = FArray(elem.canonical)
    def toSpark: DataType = ArrayType(elem.toSpark)
  }
  /** `T ARRAY` postfix spelling (types.py:680-697); canonicalizes to FArray. */
  final case class FTArray(elem: FlinkType) extends FlinkType {
    def render = s"${elem.render} ARRAY"
    override def canonical: FlinkType = FArray(elem.canonical)
    def toSpark: DataType = ArrayType(elem.toSpark)
  }
  final case class FMap(key: FlinkType, value: FlinkType) extends FlinkType {
    def render = s"MAP<${key.render}, ${value.render}>"
    override def canonical: FlinkType = FMap(key.canonical, value.canonical)
    def toSpark: DataType = MapType(key.toSpark, value.toSpark)
  }
  /** `ROW<name type, ...>` — fully implemented (reference left it TODO). */
  final case class FRow(fields: Seq[(String, FlinkType)]) extends FlinkType {
    def render = s"ROW<${fields.map { case (n, t) => s"$n ${t.render}" }.mkString(", ")}>"
    override def canonical: FlinkType = FRow(fields.map { case (n, t) => (n, t.canonical) })
    def toSpark: DataType = StructType(fields.map { case (n, t) => StructField(n, t.toSpark) })
  }
  /** Bare `MULTISET` keyword as in the reference (types.py:795-807); a typed
    * `MULTISET<T>` materializes as a count-map. */
  case object FMultiset extends FlinkType {
    def render = "MULTISET"
    def toSpark: DataType = MapType(StringType, IntegerType)
  }
  case object FInterval extends FlinkType {
    def render = "INTERVAL"
    def toSpark: DataType = DayTimeIntervalType()
  }

  // --- wrappers ---
  final case class FNotNull(inner: FlinkType) extends FlinkType {
    def render = s"${inner.render} NOT NULL"
    override def canonical: FlinkType = FNotNull(inner.canonical)
    def toSpark: DataType = inner.toSpark
  }
  final case class FPrimaryKey(inner: FlinkType) extends FlinkType {
    def render = s"${inner.render} PRIMARY KEY"
    override def canonical: FlinkType = FPrimaryKey(inner.canonical)
    def toSpark: DataType = inner.toSpark
  }

  /** Synonym-aware equality (reference `FieldType.__eq__`, types.py:26-35). */
  def equivalent(a: FlinkType, b: FlinkType): Boolean = a.canonical == b.canonical

  // =====================================================================
  // Parser. Candidate order mirrors the reference dispatch (types.py:42-53):
  // NotNull → strings → binaries → numerics → datetimes → compound →
  // boolean → interval → multiset → PrimaryKey. Uppercase-only, fullmatch.
  // =====================================================================

  private val CharRe = """CHAR\((\d+)\)""".r
  private val VarcharRe = """VARCHAR\((\d+)\)""".r
  private val BinaryRe = """BINARY\((\d+)\)""".r
  private val VarbinaryRe = """VARBINARY\((\d+)\)""".r
  private val DecimalRe = """DECIMAL(?:\((\d+)(?:, (\d+))?\))?""".r
  private val DecRe = """DEC(?:\((\d+)(?:, (\d+))?\))?""".r
  private val NumericRe = """NUMERIC(?:\((\d+)(?:, (\d+))?\))?""".r
  private val TimeRe = """TIME\((\d+)\)""".r
  private val TimestampRe = """TIMESTAMP\((\d+)\)(?: (WITH|WITHOUT) TIME ZONE)?""".r
  private val TimestampLtzRe = """TIMESTAMP_LTZ\((\d+)\)""".r
  private val TimestampLocalFullRe = """TIMESTAMP\((\d+)\) WITH LOCAL TIME ZONE""".r
  private val NotNullRe = """(.*) NOT NULL""".r
  private val PrimaryKeyRe = """(.*) PRIMARY KEY""".r
  private val ArrayRe = """ARRAY<(.*)>""".r
  private val TArrayRe = """(.*) ARRAY""".r
  private val MapRe = """MAP<(.*)>""".r
  private val RowRe = """ROW<(.*)>""".r

  def parse(s: String): Option[FlinkType] =
    parseNotNull(s)
      .orElse(parseString(s))
      .orElse(parseBinary(s))
      .orElse(parseNumeric(s))
      .orElse(parseDateTime(s))
      .orElse(parseCompound(s))
      .orElse(if (s == "BOOLEAN") Some(FBoolean) else None)
      .orElse(if (s == "INTERVAL") Some(FInterval) else None)
      .orElse(if (s == "MULTISET") Some(FMultiset) else None)
      .orElse(parsePrimaryKey(s))

  /** Parse or throw — the analog of `SchemaField.get_field_type` raising a
    * compiler error on unknown types (schema.py:42-48). */
  def parseOrThrow(s: String): FlinkType =
    parse(s).getOrElse(throw new IllegalArgumentException(s"Type '$s' not recognized"))

  private def parseNotNull(s: String): Option[FlinkType] = s match {
    case NotNullRe(inner) => parse(inner).map(FNotNull(_))
    case _ => None
  }

  private def parsePrimaryKey(s: String): Option[FlinkType] = s match {
    case PrimaryKeyRe(inner) => parse(inner).map(FPrimaryKey(_))
    case _ => None
  }

  private def parseString(s: String): Option[FlinkType] = s match {
    case CharRe(n) => Some(FChar(n.toInt))
    case VarcharRe(n) => Some(FVarchar(n.toInt))
    case "STRING" => Some(FString)
    case _ => None
  }

  private def parseBinary(s: String): Option[FlinkType] = s match {
    case BinaryRe(n) => Some(FBinary(n.toInt))
    case VarbinaryRe(n) => Some(FVarbinary(n.toInt))
    case "BYTES" => Some(FBytes)
    case _ => None
  }

  private def decArgs(p: String, sc: String): (Int, Int) =
    (Option(p).map(_.toInt).getOrElse(10), Option(sc).map(_.toInt).getOrElse(0))

  private def parseNumeric(s: String): Option[FlinkType] = s match {
    case DecimalRe(p, sc) => val (pp, ss) = decArgs(p, sc); Some(FDecimal(pp, ss))
    case DecRe(p, sc) => val (pp, ss) = decArgs(p, sc); Some(FDec(pp, ss))
    case NumericRe(p, sc) => val (pp, ss) = decArgs(p, sc); Some(FNumeric(pp, ss))
    case "TINYINT" => Some(FTinyInt)
    case "SMALLINT" => Some(FSmallInt)
    case "INT" => Some(FInt)
    case "BIGINT" => Some(FBigInt)
    case "FLOAT" => Some(FFloat)
    case "DOUBLE" => Some(FDouble)
    case _ => None
  }

  private def parseDateTime(s: String): Option[FlinkType] = s match {
    case "DATE" => Some(FDate)
    case TimeRe(p) => Some(FTime(p.toInt))
    case TimestampLtzRe(p) => Some(FTimestampLtz(p.toInt))
    case TimestampLocalFullRe(p) => Some(FTimestampLtz(p.toInt))
    case TimestampRe(p, tz) => Some(FTimestamp(p.toInt, tz == "WITH"))
    case _ => None
  }

  private def parseCompound(s: String): Option[FlinkType] = s match {
    case ArrayRe(inner) => parse(inner).map(FArray(_))
    case MapRe(body) =>
      splitTop(body).flatMap {
        case Seq(k, v) => for { kt <- parse(k); vt <- parse(v) } yield FMap(kt, vt)
        case _ => None
      }
    case RowRe(body) =>
      splitTop(body).flatMap { parts =>
        val fields = parts.map { p =>
          val i = p.indexOf(' ')
          if (i <= 0) None
          else parse(p.substring(i + 1)).map(t => (p.substring(0, i), t))
        }
        if (fields.forall(_.isDefined)) Some(FRow(fields.flatten)) else None
      }
    case TArrayRe(inner) => parse(inner).map(FTArray(_))
    case _ => None
  }

  /** Split `a, b, c` at top level, respecting `<...>` and `(...)` nesting —
    * bracket-aware where the reference used a greedy regex (types.py:715-728),
    * so nested `MAP<MAP<A, B>, C>` and `MAP<DECIMAL(10, 2), INT>` parse
    * correctly. */
  private def splitTop(s: String): Option[Seq[String]] = {
    val parts = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '<' | '(' => depth += 1
        case '>' | ')' => depth -= 1; if (depth < 0) return None
        case ',' if depth == 0 =>
          // the reference's spelling is always ", " — accept with or without space
          parts += s.substring(start, i).trim
          start = i + 1
        case _ =>
      }
      i += 1
    }
    if (depth != 0) None
    else {
      parts += s.substring(start).trim
      Some(parts.result()).filter(_.forall(_.nonEmpty))
    }
  }

  // =====================================================================
  // Spark → Flink (for schema-from-SQL inference display, SURVEY §2.1 S7)
  // =====================================================================

  def fromSpark(dt: DataType): FlinkType = dt match {
    case StringType => FString
    case CharType(n) => FChar(n)
    case VarcharType(n) => FVarchar(n)
    case BinaryType => FBytes
    case d: DecimalType => FDecimal(d.precision, d.scale)
    case ByteType => FTinyInt
    case ShortType => FSmallInt
    case IntegerType => FInt
    case LongType => FBigInt
    case FloatType => FFloat
    case DoubleType => FDouble
    case BooleanType => FBoolean
    case DateType => FDate
    case TimestampType => FTimestampLtz(6)
    case TimestampNTZType => FTimestamp(6, timezone = false)
    case ArrayType(e, _) => FArray(fromSpark(e))
    case MapType(k, v, _) => FMap(fromSpark(k), fromSpark(v))
    case st: StructType => FRow(st.fields.toSeq.map(f => (f.name, fromSpark(f.dataType))))
    case _: DayTimeIntervalType | _: YearMonthIntervalType => FInterval
    case other => throw new IllegalArgumentException(s"No Flink mapping for Spark type $other")
  }
}
