package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The engine's SQL function surface:
  *
  *   - `grok(value, pattern)` — Decodable built-in (SURVEY §2.2 P6).
  *   - `to_timestamp_ltz(epoch, 3)` — Flink name used by the reference's
  *     example models (events_count.sql:22-23).
  *   - sketch/similarity kernels (`vec_cosine`, `minhashes`,
  *     `plane_sigs`, `sorted_intersect_count`, `simhash56`) — native
  *     codegen'd Catalyst expressions.
  *
  * Two registration paths over ONE builder table: [[register]] binds on
  * an existing session (idempotent; called by every operator entry
  * point), [[injectAll]] binds at session build via
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Everything else the reference's SQL surface needs is a Spark SQL
  * builtin (SURVEY §2.2 P11).
  */
object GraftFunctions {

  /** Column-API version of grok (native expression; requires [[register]]
    * on the active session, which all entry points call). */
  def grok(value: Column, pattern: Column): Column =
    call_function("grok", value, pattern)

  private def intLit(fn: String, e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn $name must be an integer literal, got $other")
  }

  /** name → (expression class for ExpressionInfo, builder). */
  private val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("vec_cosine", classOf[VectorCosine], { args =>
      require(args.length == 2, "vec_cosine(a, b) takes two array<float> args")
      VectorCosine(args.head, args(1))
    }),
    ("minhashes", classOf[MinHashes], { args =>
      require(args.length == 2, "minhashes(hashes, numHashes) takes two args")
      MinHashes(args.head, intLit("minhashes", args(1), "numHashes"))
    }),
    ("plane_sigs", classOf[PlaneSignatures], { args =>
      require(args.length == 4,
        "plane_sigs(vec, seedsJoined, planes, dims) takes four args")
      val seeds = args(1) match {
        case Literal(s: UTF8String, _) => s.toString.split('\u0001').toSeq
        case other => throw new IllegalArgumentException(
          s"plane_sigs seeds must be a string literal, got $other")
      }
      PlaneSignatures(args.head, seeds,
        intLit("plane_sigs", args(2), "planes"),
        intLit("plane_sigs", args(3), "dims"))
    }),
    ("sorted_intersect_count", classOf[SortedIntersectCount], { args =>
      require(args.length == 2, "sorted_intersect_count(a, b) takes two args")
      SortedIntersectCount(args.head, args(1))
    }),
    ("simhash56", classOf[Simhash56], { args =>
      require(args.length == 1, "simhash56(hashes) takes one arg")
      Simhash56(args.head)
    }),
    ("grok", classOf[GrokExtract], { args =>
      require(args.length == 2, "grok(value, pattern) takes two string args")
      GrokExtract(args.head, args(1))
    }),
    ("centroid_cosines", classOf[CentroidCosines], { args =>
      require(args.length == 3,
        "centroid_cosines(vec, flatCentroids, dims) takes three args")
      CentroidCosines(args.head, args(1), args(2))
    }),
    ("nearest_centroid", classOf[NearestCentroid], { args =>
      require(args.length == 3,
        "nearest_centroid(vec, flatCentroids, dims) takes three args")
      NearestCentroid(args.head, args(1), args(2))
    }),
    ("nfc_normalize", classOf[NfcNormalize], { args =>
      require(args.length == 1, "nfc_normalize(str) takes one string arg")
      NfcNormalize(args.head)
    }),
    ("ascii_normalize", classOf[AsciiNormalize], { args =>
      require(args.length == 1, "ascii_normalize(str) takes one string arg")
      AsciiNormalize(args.head)
    }),
    ("lang_mixture_counts", classOf[LangMixtureCounts], { args =>
      require(args.length == 1,
        "lang_mixture_counts(str) takes one string arg")
      LangMixtureCounts(args.head)
    }),
    ("multi_match", classOf[MultiMatch], { args =>
      require(args.length == 2,
        "multi_match(text, patternsJoined) takes two args")
      val pats = args(1) match {
        case Literal(s: UTF8String, _) => s.toString.split('\u0001').toSeq
        case other => throw new IllegalArgumentException(
          s"multi_match patterns must be a string literal, got $other")
      }
      MultiMatch(args.head, pats)
    }),
    ("multi_match_counts", classOf[MultiMatchCounts], { args =>
      require(args.length == 2,
        "multi_match_counts(text, patternsJoined) takes two args")
      val pats = args(1) match {
        case Literal(s: UTF8String, _) => s.toString.split('\u0001').toSeq
        case other => throw new IllegalArgumentException(
          s"multi_match_counts patterns must be a string literal, got $other")
      }
      MultiMatchCounts(args.head, pats)
    }))

  /** Idempotently register all functions on a session. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    // Flink TO_TIMESTAMP_LTZ(epoch, precision): precision 3 = millis, 0 =
    // seconds, 6/9 = micros/nanos (nanos floor-divided to Spark's micro
    // range, matching Math.floorDiv for negative epochs too).
    spark.udf.register("to_timestamp_ltz",
      (epoch: java.lang.Long, precision: Int) =>
        if (epoch == null) null
        else {
          val micros: Long = precision match {
            case 0 => epoch * 1000000L
            case 3 => epoch * 1000L
            case 6 => epoch.longValue
            case 9 => Math.floorDiv(epoch, 1000L)
            case p => throw new IllegalArgumentException(s"precision $p")
          }
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L)
        })
  }

  /** Inject the native expressions at session build
    * (`spark.sql.extensions=graft.GraftExtensions`). The
    * `to_timestamp_ltz` alias is a Scala UDF (closure), which the
    * extension hook cannot carry — sessions needing it call
    * [[register]], as every engine entry point does. */
  def injectAll(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, name), builder))
    }
}
