package graft.streaming

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sequences
import graft.operators.Sequences.{FunnelState, StepEvent}

/** The incremental funnel ([[Sequences.funnelStateful]]) differentially
  * against the batch fold, across multiple micro-batches under the
  * per-user nondecreasing-time delivery contract, plus the fold kernel's
  * equivalence to the batch column fold on random event logs.
  */
class StreamingFunnelSpec extends SparkSpec {

  private val steps = Seq("view", "click", "purchase")

  test("funnelAdvance kernel == batch column fold on random logs") {
    import spark.implicits._
    val rnd = new Random(19)
    for (trial <- 0 until 10) {
      val types = steps ++ Seq("noise")
      val evs = (0 until 250).map { _ =>
        (rnd.nextInt(20).toLong, rnd.nextInt(40).toLong,
          types(rnd.nextInt(types.size)))
      }
      val batchByUser = Sequences.funnel(
        evs.toDF("user_id", "ts", "event_type"), steps)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      // kernel applied all-at-once per user must induce the same step counts
      val kernelReach = evs
        .filter(e => steps.contains(e._3))
        .groupBy(_._1).values.map { u =>
        Sequences.funnelAdvance(steps.size, Sequences.initialFunnelState,
          u.map(e => StepEvent(e._1, e._2, steps.indexOf(e._3)))).reached
      }.toSeq
      val kernelCounts = (1 to steps.size)
        .map(s => kernelReach.count(_ >= s).toLong)
      assert((1 to steps.size).map(s => batchByUser(s.toLong)) === kernelCounts,
        s"trial $trial")
    }
  }

  test("streaming funnel across micro-batches == batch fold (ordered delivery)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(29)
    // random log, then delivered in event-time order split into 4 waves —
    // the per-key nondecreasing cross-batch contract
    val evs = (0 until 300).map { k =>
      (rnd.nextInt(15).toLong, k.toLong /* strictly increasing time */,
        (steps ++ Seq("noise"))(rnd.nextInt(4)))
    }
    val stepped = evs.collect {
      case (u, t, ty) if steps.contains(ty) =>
        StepEvent(u, t, steps.indexOf(ty))
    }
    val batchReach = stepped.groupBy(_.u).map { case (u, es) =>
      u -> Sequences.funnelAdvance(steps.size,
        Sequences.initialFunnelState, es).reached
    }

    val src = MemoryStream[StepEvent]
    val q = Sequences.funnelStateful(src.toDS(), steps.size)
      .toDF("u", "reached")
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode("update").start()
    try {
      stepped.grouped(math.max(1, stepped.size / 4 + 1)).foreach { wave =>
        src.addData(wave)
        q.processAllAvailable()
      }
      // reached is monotone per user: max == final state
      val got = spark.sql(
        "SELECT u, max(reached) FROM funnel_state GROUP BY u")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === batchReach)
      // and the query really ran as MULTIPLE stateful micro-batches
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "expected the waves to arrive in separate micro-batches")
    } finally q.stop()
  }

  /** ST6 under failure (round-4 verdict item #3): the mapGroupsWithState
    * store must survive a query restart. Wave 1 commits, the query stops,
    * wave 2 arrives while it is DOWN, and wave 3 after the restart — user
    * 1's final reach of 3 is only possible if (a) the restarted query
    * resumed source offsets from the checkpoint (wave 2 was never
    * processed by the first incarnation) and (b) the per-user FunnelState
    * from wave 1 was restored from the state store, since each later wave
    * alone cannot advance past step 1. */
  test("funnelStateful state + offsets survive a checkpoint restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = tmpDir("graft-funnel-ckpt")
    val src = MemoryStream[StepEvent]
    val plan = Sequences.funnelStateful(src.toDS(), steps.size)
      .toDF("u", "reached")
    // update-mode emissions are monotone per user: fold max driver-side
    val got = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    def start() = plan.writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach { r =>
          got.merge(r.getLong(0), Int.box(r.getInt(1)),
            (a: Integer, x: Integer) => Int.box(math.max(a, x)))
        }
        ()
      }
      .start()

    val q1 = start()
    src.addData(StepEvent(1L, 10L, 0), StepEvent(2L, 10L, 0)) // wave 1
    q1.processAllAvailable()
    q1.stop() // simulated crash
    src.addData(StepEvent(1L, 20L, 1), StepEvent(2L, 20L, 0)) // while down
    val q2 = start()
    src.addData(StepEvent(1L, 30L, 2), StepEvent(2L, 30L, 1)) // wave 3
    q2.processAllAvailable()
    q2.stop()

    // u1: 0@10, 1@20, 2@30 -> reached 3; u2: repeated step 0 never
    // re-advances, 1@30 -> reached 2 — both require restored state
    assert(got.get(1L) == 3, s"u1 state lost across restart: $got")
    assert(got.get(2L) == 2, s"u2 state lost across restart: $got")
    // differential: identical to the batch fold over the full log
    val full = Seq(
      StepEvent(1L, 10L, 0), StepEvent(2L, 10L, 0),
      StepEvent(1L, 20L, 1), StepEvent(2L, 20L, 0),
      StepEvent(1L, 30L, 2), StepEvent(2L, 30L, 1))
    val batch = full.groupBy(_.u).map { case (u, es) =>
      u -> Sequences.funnelAdvance(steps.size,
        Sequences.initialFunnelState, es).reached
    }
    assert(batch.forall { case (u, r) => got.get(u) == r })
  }

  test("cross-batch strict-> boundary: an equal-timestamp step never advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[StepEvent]
    val q = Sequences.funnelStateful(src.toDS(), steps.size)
      .toDF("u", "reached")
      .writeStream.format("memory").queryName("funnel_eq")
      .outputMode("update").start()
    try {
      src.addData(StepEvent(1L, 10L, 0)) // view at t=10 -> reached 1
      q.processAllAvailable()
      src.addData(StepEvent(1L, 10L, 1)) // click at the SAME t: no advance
      q.processAllAvailable()
      src.addData(StepEvent(1L, 11L, 1)) // click strictly later: advance
      q.processAllAvailable()
      val got = spark.sql(
        "SELECT max(reached) FROM funnel_eq WHERE u = 1")
        .collect()(0).getInt(0)
      assert(got === 2)
    } finally q.stop()
  }
}
