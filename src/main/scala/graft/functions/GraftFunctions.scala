package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Session-level registration of the engine's SQL function surface:
  *
  *   - `grok(value, pattern)` — Decodable built-in (SURVEY §2.2 P6).
  *   - `to_timestamp_ltz(epoch, 3)` — Flink name used by the reference's
  *     example models (events_count.sql:22-23); maps to `timestamp_millis`.
  *
  * Everything else the reference's SQL surface needs is a Spark SQL builtin
  * (SURVEY §2.2 P11).
  */
object GraftFunctions {

  /** Column-API version of grok (native expression; requires [[register]]
    * on the active session, which all entry points call). */
  def grok(value: Column, pattern: Column): Column =
    call_function("grok", value, pattern)

  /** Idempotently register all functions on a session. */
  def register(spark: SparkSession): Unit = {
    // native Catalyst expression (codegen'd) — see VectorCosine
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine",
      { args =>
        require(args.length == 2, "vec_cosine(a, b) takes two array<float> args")
        VectorCosine(args.head, args(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhashes",
      { args =>
        require(args.length == 2, "minhashes(hashes, numHashes) takes two args")
        val n = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhashes numHashes must be an integer literal, got $other")
        }
        MinHashes(args.head, n)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "plane_sigs",
      { args =>
        require(args.length == 4,
          "plane_sigs(vec, seedsJoined, planes, dims) takes four args")
        import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
        import org.apache.spark.unsafe.types.UTF8String
        val seeds = args(1) match {
          case Literal(s: UTF8String, _) => s.toString.split('\u0001').toSeq
          case other => throw new IllegalArgumentException(
            s"plane_sigs seeds must be a string literal, got $other")
        }
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"plane_sigs $name must be an integer literal, got $other")
        }
        PlaneSignatures(args.head, seeds,
          intLit(args(2), "planes"), intLit(args(3), "dims"))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      { args =>
        require(args.length == 2, "sorted_intersect_count(a, b) takes two args")
        SortedIntersectCount(args.head, args(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash56",
      { args =>
        require(args.length == 1, "simhash56(hashes) takes one arg")
        Simhash56(args.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "grok",
      { args =>
        require(args.length == 2, "grok(value, pattern) takes two string args")
        GrokExtract(args.head, args(1))
      },
      "built-in")
    // Flink TO_TIMESTAMP_LTZ(epoch, precision): precision 3 = millis, 0 =
    // seconds, 6/9 = micros/nanos (nanos truncated to Spark's micro range).
    spark.udf.register("to_timestamp_ltz",
      (epoch: java.lang.Long, precision: Int) =>
        if (epoch == null) null
        else {
          val micros: Long = precision match {
            case 0 => epoch * 1000000L
            case 3 => epoch * 1000L
            case 6 => epoch.longValue
            case 9 => epoch / 1000L
            case p => throw new IllegalArgumentException(s"precision $p")
          }
          java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L)
        })
  }
}
