package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.HeavyHitters.{MGBuffer, MisraGries}

/** Continuous heavy-hitter tracking over a streaming text column — the
  * ingest-time frequency monitor of a training-data pipeline (boilerplate
  * bursts, crawler loops, template spam show up as sudden heavy hitters
  * long before a batch `top_terms` pass would run).
  *
  * Design: tokens are exploded row-locally and bucketed by token hash —
  * ALL occurrences of a token land in one bucket, so the per-bucket
  * Misra-Gries summary (the SAME [[graft.operators.HeavyHitters.MisraGries]]
  * machinery the batch path uses, fed token-at-a-time) keeps the global
  * superset guarantee: a token with true global frequency > N/(k+1)
  * concentrates its whole mass in its bucket, N_b ≤ N, so it must
  * survive that bucket's k counters. Emissions carry the bucket's exact
  * token total so a consumer can apply the global bar.
  *
  * Scale shape: ONE shuffle of the token stream (hash-bucket exchange —
  * the same movement a streaming `groupBy(token)` would pay, but state
  * is `buckets · k` counters instead of a counter per distinct token;
  * at 100 TB the token domain is billions of keys and per-key state is
  * the thing that dies first). Buckets ∝ cores bounds both state and
  * per-task update cost; `GroupStateTimeout.NoTimeout` because bucket
  * cardinality is fixed by construction — state cannot grow with the
  * stream.
  *
  * Emissions (update-per-trigger): one row per tracked counter,
  * `(bucket, tok, cnt_lb, bucket_n)` — `cnt_lb` is the MG lower bound
  * (true in-bucket count ∈ [cnt_lb, cnt_lb + N_b/(k+1)]), `bucket_n`
  * the bucket's exact token total so far.
  */
object StreamingHeavyHitters {

  final case class Emission(bucket: Int, tok: String, cnt_lb: Long,
                            bucket_n: Long)

  /** @param stream  streaming frame with a string column `textCol`
    * @param k       counters per bucket (global bar: freq > N/(k+1))
    * @param buckets token-hash partition count (∝ cores, bounds state)
    */
  def track(stream: DataFrame, textCol: String, k: Int,
            buckets: Int = 8, sep: String = " "): DataFrame = {
    val session = stream.sparkSession
    import session.implicits._
    implicit val bufEnc = Encoders.kryo[MGBuffer]
    val agg = new MisraGries(k, sep)
    stream
      .select(explode(split(col(textCol).cast("string"), // row-local
        java.util.regex.Pattern.quote(sep), -1)).as("tok"))
      .select(pmod(xxhash64(col("tok")), lit(buckets)).cast("int")
        .as("bucket"), col("tok"))
      .as[(Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[MGBuffer, Emission](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (bucket, toks, state) =>
          val buf = if (state.exists) state.get else agg.zero
          // feed token-at-a-time: MisraGries.reduce tokenizes its input,
          // and a bare token re-tokenizes to itself under any separator
          toks.foreach { case (_, t) => agg.reduce(buf, if (t == null) "" else t) }
          state.update(buf)
          val n = buf.n
          buf.counters.toSeq.sortBy(_._1).iterator
            .map { case (t, c) => Emission(bucket, t, c, n) }
      }
      .toDF()
  }
}
