package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.operators.Sampling
import graft.operators.Sampling.BKBuf

/** Continuous per-group uniform sampling — the streaming twin of
  * [[Sampling.quotaPerGroupAgg]], and the KMV ("k minimum values")
  * construction from the distinct-counting literature (Bar-Yossef et
  * al. 2002): keep the k smallest salted-hash values per group. Because
  * membership depends only on a row's HASH, not on arrival order or
  * time, the maintained set is at every moment EXACTLY the sample the
  * batch operator would draw from the rows seen so far — a streaming
  * sample with a batch differential, where a reservoir sampler's
  * RNG-vs-arrival-order state can never line up with a batch twin.
  *
  * The same hash-order invariance makes the state replay-immune under
  * at-least-once delivery: a re-delivered record maps to the identical
  * (hash, id) pair and [[BKBuf.insertDistinct]] drops it, so duplicates
  * can't evict legitimate members (the plain batch heap counts rows by
  * design; the streaming path must not).
  *
  * Scale shape: one shuffle keyed by group (the same exchange a
  * streaming groupBy pays); state is a fixed k-slot heap per group —
  * O(groups · k) total regardless of stream length, hence
  * `GroupStateTimeout.NoTimeout`. Emissions re-state the group's full
  * current sample each trigger (update mode): `(group, id, h)`, h the
  * sampling hash so downstream can re-verify membership order.
  */
object StreamingSample {

  final case class Emission(group: String, id: Long, h: Long)

  /** @param stream streaming (or batch — differential seam) frame
    * @param k      sample size per group
    * @param salt   [[Sampling.hashBucket]] salt; use the same salt as
    *               the batch twin to make the outputs comparable */
  def bottomK(stream: DataFrame, groupCol: String, idCol: String, k: Int,
              salt: String): DataFrame = {
    val session = stream.sparkSession
    import session.implicits._
    implicit val bufEnc = Encoders.kryo[BKBuf]
    stream
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        Sampling.hashBucket(col(idCol), salt, 1 << 30).as("h"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BKBuf, Emission](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (group, rows, state) =>
          val buf = if (state.exists) state.get else new BKBuf(k)
          rows.foreach { case (_, id, h) => buf.insertDistinct(h, id) }
          state.update(buf)
          buf.sortedMembers.iterator.map { case (h, id) =>
            Emission(group, id, h)
          }
      }
      .toDF()
  }
}
