package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-token ("heavy hitter") extraction with a bounded-memory
  * Misra-Gries summary (Misra & Gries 1982; merge rule from Agarwal et
  * al., "Mergeable Summaries", PODS'12 — public literature).
  *
  * Why not `groupBy(token)`: at 100 TB the token domain is billions of
  * distinct keys, so the exact group-by (the `top_terms` gate) shuffles
  * the whole exploded token stream. The MG summary holds AT MOST `k`
  * counters per partition, merges associatively (map-side combine
  * applies), and guarantees every token with true frequency
  * > N/(k+1) survives the sketch — so the true heavy hitters can be
  * recovered EXACTLY afterwards by one candidate-restricted count over
  * ≤ k distinct keys. Two corpus-linear passes, neither of which
  * shuffles more than k counters / k keys.
  *
  * Determinism: the final output is the exact count of every token
  * whose true frequency clears the N/(k+1) bar. The MG guarantee makes
  * the candidate set a superset of those tokens regardless of partition
  * order, so the output is independent of the sketch's internal state —
  * which is what lets a DuckDB oracle verify a sketch-routed plan
  * value-for-value (`heavy_hitters` gate).
  */
object HeavyHitters {

  /** MG buffer: capped counter map + total tokens processed. Mutable —
    * Spark's ObjectHashAggregate keeps typed-agg buffers deserialized
    * within a partition (same contract [[MinHashAgg]] relies on). */
  final class MGBuffer(val counters: mutable.HashMap[String, Long],
                       var n: Long) extends Serializable

  /** Final summary: candidate tokens (≤ k) + exact total token count. */
  final case class MGSummary(candidates: Seq[String], n: Long)

  /** Typed MG aggregator over raw text rows: tokenization happens INSIDE
    * `reduce`, so the exploded token stream never leaves its partition —
    * only k-entry summaries move in the merge.
    */
  final class MisraGries(k: Int, sep: String = " ")
    extends Aggregator[String, MGBuffer, MGSummary] {
    require(k > 0, "k must be positive")

    override def zero: MGBuffer = new MGBuffer(mutable.HashMap.empty, 0L)

    override def reduce(buf: MGBuffer, text: String): MGBuffer = {
      if (text == null) return buf // string_split(NULL) unnests to no rows
      // split(sep, -1) keeps interior/trailing empties — the same token
      // stream as Spark's split() and DuckDB's string_split()
      val toks = text.split(java.util.regex.Pattern.quote(sep), -1)
      var i = 0
      while (i < toks.length) {
        insert(buf.counters, toks(i))
        i += 1
      }
      buf.n += toks.length
      buf
    }

    /** Classic MG step: increment if tracked, open a counter if space,
      * else decrement ALL counters by 1 (amortized O(1): total decrement
      * work is bounded by total insertions). */
    private def insert(c: mutable.HashMap[String, Long], tok: String): Unit =
      c.get(tok) match {
        case Some(v) => c.update(tok, v + 1)
        case None if c.size < k => c.update(tok, 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          c.mapValuesInPlace((_, v) => v - 1)
          c.foreach { case (t, v) => if (v <= 0) dead += t }
          dead.foreach(c.remove)
      }

    /** Mergeable-summaries rule: pointwise sum, then subtract the
      * (k+1)-th largest count from everything and drop the non-positive
      * rest. Errors add, so the union guarantee stays ≤ N/(k+1). */
    override def merge(a: MGBuffer, b: MGBuffer): MGBuffer = {
      b.counters.foreach { case (t, v) =>
        a.counters.update(t, a.counters.getOrElse(t, 0L) + v)
      }
      a.n += b.n
      if (a.counters.size > k) {
        val cut = a.counters.values.toArray.sorted(Ordering[Long].reverse)(k)
        val dead = mutable.ArrayBuffer.empty[String]
        a.counters.mapValuesInPlace((_, v) => v - cut)
        a.counters.foreach { case (t, v) => if (v <= 0) dead += t }
        dead.foreach(a.counters.remove)
      }
      a
    }

    override def finish(buf: MGBuffer): MGSummary =
      MGSummary(buf.counters.keys.toSeq.sorted, buf.n)

    // buffer is an opaque mutable sketch → kryo; output is a product
    override def bufferEncoder: Encoder[MGBuffer] = Encoders.kryo[MGBuffer]
    override def outputEncoder: Encoder[MGSummary] = Encoders.product[MGSummary]
  }

  def misraGries(k: Int): TypedColumn[String, MGSummary] =
    new MisraGries(k).toColumn

  /** Exact heavy hitters via the two-pass MG recipe: (1) one sketch pass
    * collects the ≤ k candidates and the exact token total N (a single
    * k-bounded driver fetch, same class of metadata collect as the IVF
    * centroids); (2) one restore pass counts ONLY candidate tokens and
    * keeps those with `count · (k+1) > N` — integer arithmetic, no
    * float threshold.
    *
    * @return (tok, cnt) — every token with true frequency > N/(k+1)
    */
  def exactHeavyHitters(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val summary = df.select(col(textCol).cast("string")).as[String]
      .select(misraGries(k).name("mg"))
      .head()
    val toks = df.select(explode(split(col(textCol), " ")).as("tok"))
    toks.filter(col("tok").isin(summary.candidates: _*))
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > summary.n)
  }
}
