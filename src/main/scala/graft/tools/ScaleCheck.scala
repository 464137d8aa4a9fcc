package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Scale-behavior experiment (not a gate): replicate the sf0.1 documents
  * corpus K× with shifted ids and time the dedup candidate generators at
  * 1× vs K×, warm. The claim under test is the PLAN claim — banded
  * equi-joins keep candidate volume near-linear in corpus size (each
  * replica block collides within itself, not across the full cross
  * square). Results are recorded in PERF.md.
  *
  * `runMain graft.tools.ScaleCheck <sfDir> <K>`
  * `runMain graft.tools.ScaleCheck skew <sfDir> [hotFrac]` — adversarial
  * skew probe (see [[skewMain]]).
  */
object ScaleCheck {

  /** Adversarial-skew probe for the candidate equi-joins: plant ONE hot
    * key holding `hotFrac` (default 10%) of the corpus — every planted
    * row carries identical text, so all its LSH band keys collide into
    * one bucket — then measure the banded self-join with AQE skew-split
    * off vs on, recording wall time and PER-TASK duration spread from a
    * SparkListener. The claim under test (PERF.md): the skewed bucket
    * does not serialize into one straggler task; AQE splits it and the
    * max task duration stays within a small factor of the median.
    * Local runs scale the skew thresholds down (4 MB / factor 2) the
    * same way a 100 TB deployment leaves them at the 256 MB defaults —
    * the mechanism, not the constants, is what's probed. */
  private def skewMain(args: Array[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val hotFrac = args.lift(1).map(_.toDouble).getOrElse(0.1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-skewcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val durations = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) durations.add(e.taskInfo.duration)
    })
    def measure(what: String)(f: => Long): Unit = {
      durations.clear()
      val t0 = System.nanoTime()
      val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      val ds = durations.asScala.map(_.longValue).toSeq.sorted
      val mx = ds.lastOption.getOrElse(0L)
      val p50 = if (ds.nonEmpty) ds(ds.size / 2) else 0L
      println(f"[skew] $what: $secs%.2f s wall, ${ds.size} tasks, " +
        f"p50 task $p50 ms, max task $mx ms, out=$out")
    }

    val rep = args.lift(2).map(_.toInt).getOrElse(10)
    val single = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val base = (0 until rep).map(i => single.select(
      (col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionAll _)
    val every = math.max(1, math.round(1.0 / hotFrac)).toInt
    val viral = single.orderBy("doc_id").select("text").head().getString(0)
    val docs = base.withColumn("text",
      when(pmod(col("doc_id"), lit(every)) === 0, lit(viral))
        .otherwise(col("text")))
      .persist()
    val total = docs.count()
    println(s"[skew] corpus $total docs, 1/$every identical-text (hot bucket)")

    // untimed warmup so codegen/JIT doesn't contaminate the first setting
    Dedup.minhashLsh(docs, "doc_id", "text", 2, 128, 32, 0.5).count()
    Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).count()

    for (skewOn <- Seq(false, true)) {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      // scale the trigger thresholds to local data volumes (the 100 TB
      // deployment uses the 256 MB defaults; the split mechanism is the
      // same)
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      measure(s"minhash_lsh hot-bucket aqeSkew=$skewOn")(
        Dedup.minhashLsh(docs, "doc_id", "text", 2, 128, 32, 0.5).count())
      measure(s"simhash hot-bucket aqeSkew=$skewOn")(
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).count())
    }

    // the mitigation the curation pipelines actually deploy: EXACT
    // dedup collapse first (identical texts fold to one representative
    // via content hash), near-dup LSH over representatives only — the
    // degenerate bucket disappears at the source instead of being
    // split after the fact (membership of the collapsed docs is then
    // one broadcast join back, output-sized)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    measure("minhash_lsh after exact-collapse") {
      val reps = docs.withColumn("__h", xxhash64(col("text")))
        .groupBy("__h").agg(min("doc_id").as("doc_id"), first("text").as("text"))
        .drop("__h")
      Dedup.minhashLsh(reps, "doc_id", "text", 2, 128, 32, 0.5).count()
    }

    // the salted two-phase aggregate vs a naive hot-key groupBy: the
    // events table with user_id skewed the same way
    val ev = Tables.events(spark, sf).select(
      when(pmod(col("event_id"), lit(every)) === 0, lit(0L))
        .otherwise(col("user_id")).as("user_id"),
      col("value"), col("event_id")).persist()
    ev.count()
    measure("salted count+sum on hot key")(
      graft.operators.SkewJoin.saltedCountSum(
        ev, "user_id", "value", spreadCol = "event_id").count())
    measure("naive count+sum on hot key")(
      ev.groupBy("user_id").agg(count(lit(1)), sum("value")).count())
    ev.unpersist()
    docs.unpersist()
    spark.stop()
  }

  /** `runMain graft.tools.ScaleCheck rank [nRows] [k]` — the global-rank
    * probe: time [[graft.operators.Ranks.globalRowNumber]] (bucketed
    * two-pass) against the naive `row_number() OVER (ORDER BY ...)`
    * single-partition window at n and K×n rows, and record the max task
    * duration of each — the naive plan's one-task sort is the scale
    * ceiling the bucketed plan removes. Deterministic synthetic values
    * (hash of the row id, heavy duplication via % to exercise tie
    * handling across bucket boundaries). */
  private def rankMain(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-rankcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null)
          maxTask.getAndUpdate(m => math.max(m, e.taskInfo.duration))
    })
    def probe(rows: Long, what: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val df = spark.range(rows).select(col("id"),
        pmod(hash(col("id")), lit(rows / 50 + 1)).cast("long").as("v"))
      maxTask.set(0)
      val t0 = System.nanoTime()
      val cnt = f(df).agg(sum("rank")).collect()(0) // force full rank column
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[rank] $what n=$rows: $sec%.2f s, max task ${maxTask.get()} ms, checksum $cnt")
    }
    for (rows <- Seq(n, n * k)) {
      // warmup codegen at the smaller size only
      if (rows == n) probe(rows, "warmup")(df =>
        graft.operators.Ranks.globalRowNumber(df, "v", "id", 64))
      probe(rows, "bucketed")(df =>
        graft.operators.Ranks.globalRowNumber(df, "v", "id", 64))
      probe(rows, "naive-window")(df =>
        df.withColumn("rank",
          row_number().over(Window.orderBy(col("v"), col("id"))).cast("long")))
    }
    spark.stop()
  }

  /** `runMain graft.tools.ScaleCheck emb <sfDir> [K]` — the
    * embedding-LSH layout probe behind [[graft.operators.Dedup.embeddingNearDup]]
    * (the corpus-dimensioned DEFAULT since round 6) vs the pinned
    * [[graft.operators.Dedup.embeddingNearDupFixed]] layout:
    * replicate the embeddings corpus K× under per-replica orthogonal
    * rotations (intra-replica cosines exact, cross-replica ≈ noise —
    * the ScaleData scheme), plant a jittered near-copy of every 20th
    * vector (cosine ≈ 0.98, θ = 0.8 positives), then time the FIXED
    * layout (6 planes regardless of corpus) against the SCALED layout
    * (planes ~ log₂(n/occupancy), tables recall-compensated) at 1× and
    * K×. The claim under test (PERF.md round 5): fixed-layout candidate
    * volume is Θ(n²/2^planes) — super-linear wall time at K× — while
    * the scaled layout holds per-bucket occupancy constant and stays
    * ~linear, with identical output (both are exact after the cosine
    * verify; the planted pairs bound recall). */
  private def embMain(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-embcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Dedup

    val base = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    val dims = 64
    def rotated(n: Int): DataFrame =
      (0 until n).map { i =>
        if (i == 0) base
        else {
          val dim = size(col("embedding"))
          base.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
            transform(sequence(lit(0), dim - 1), j =>
              element_at(col("embedding"), pmod(j + lit(7 * i), dim) + 1) *
                when(pmod(xxhash64(lit(i) * lit(1000003L) + j), lit(2)) === 0,
                  lit(1.0f)).otherwise(lit(-1.0f))).as("embedding"))
        }
      }.reduce(_ unionAll _)
    // plant: every 20th vector gets a near-copy (id + 50M) mixed with
    // 20% of an orthogonal-ish partner vector -> cosine ~ 0.98
    def planted(df: DataFrame): DataFrame = {
      val pick = df.filter(pmod(col("vec_id"), lit(20)) === 0)
      val jit = pick.select((col("vec_id") + lit(50000000L)).as("vec_id"),
        transform(col("embedding"), (x, j) =>
          x + lit(0.04f) * sin(col("vec_id") * lit(0.7) + j).cast("float"))
          .as("embedding"))
      df.unionAll(jit)
    }
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[emb] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (n <- Seq(1, k)) {
      val emb = planted(rotated(n)).persist()
      val total = emb.count()
      println(s"[emb] corpus x$n = $total vecs")
      if (n == 1) { // warmup codegen once
        Dedup.embeddingNearDupFixed(emb, "vec_id", "embedding", 0.8, dims).count()
        Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.8, dims,
          knownCount = Some(total)).count()
      }
      // the fixed layout is the documented Θ(n²·probes/2^planes)
      // BASELINE — above ~50k vectors its candidate join writes a
      // >50 GB shuffle on a single host (it filled this probe box's
      // disk at 210k), and its quadratic curve is already on record at
      // 10× (PERF.md round 5/6); only the default layout's claim needs
      // data beyond that
      val pf =
        if (total <= 50000)
          time(s"fixed-layout x$n (6 planes, 8 tables)")(
            Dedup.embeddingNearDupFixed(emb, "vec_id", "embedding", 0.8, dims).count())
        else { println(s"[emb] fixed-layout x$n: SKIPPED (quadratic baseline, corpus > 50k)"); -1L }
      val ps = time(s"default (corpus-dimensioned) layout x$n")(
        Dedup.embeddingNearDup(emb, "vec_id", "embedding", 0.8, dims,
          knownCount = Some(total)).count())
      println(s"[emb] pairs x$n: fixed=$pf scaled=$ps" +
        (if (pf >= 0) " (must match; both exact-verified)" else ""))
      emb.unpersist()
    }
    spark.stop()
  }

  /** `runMain graft.tools.ScaleCheck cellskew [background] [hub]` —
    * hot-quantizer-cell probe (round 7; VERDICT r6 item 2): plant ONE
    * hub cell holding `hub` near-identical vectors (a near-duplicate
    * cluster — every one lands in the same coarse-quantizer cell) inside
    * a `background`-vector corpus, then run [[Similarity.semDedup]]'s
    * within-cell verify join with hot-cell grid salting OFF (bound
    * forced above the hub) vs ON (default). The claim (SkewJoin
    * .gridSalted scaladoc): the hub's occ² candidate product spreads
    * over ~(occ/bound)² reducers, so max task duration drops by the
    * grid factor while wall time holds or improves and the OUTPUT IS
    * IDENTICAL (asserted here, not just spec'd). */
  private def cellskewMain(args: Array[String]): Unit = {
    import scala.jdk.CollectionConverters._
    val nBg = args.headOption.map(_.toInt).getOrElse(20000)
    val nHub = args.lift(1).map(_.toInt).getOrElse(30000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-cellskewcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      // the probe simulates the 100 TB condition: a corpus too large to
      // broadcast, so the pair join runs as a shuffle join keyed on the
      // cell — the layout where one hub cell serializes into a single
      // reducer. (AQE's skew splitter does NOT rescue this: it triggers
      // on INPUT partition bytes, and a hub cell is kilobytes of input
      // that joins into occ² OUTPUT pairs.)
      .config("spark.sql.autoBroadcastJoinThreshold", -1)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Similarity

    val dims = 16
    // background: spread pseudo-random vectors (many cells); hub: one
    // dominant direction with ±1e-3 jitter — a single cell, cosine ≈ 1
    val bg = spark.range(nBg).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), j =>
        (pmod(xxhash64(col("id") * lit(1000003L) + j), lit(1024)) - lit(512))
          .cast("float")).as("embedding"))
    val hub = spark.range(nBg, nBg.toLong + nHub).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)), j =>
        ((j + 1).cast("double") * lit(100.0) +
          sin(col("id") * lit(0.37) + j) * lit(0.1)).cast("float"))
        .as("embedding"))
    val emb = bg.unionAll(hub)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = emb.count()

    val durations = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) {
          durations.add(e.taskInfo.duration)
          byStage.merge(e.stageId, e.taskInfo.duration,
            (a, b) => math.max(a, b))
        }
    })
    def run(): (Long, Long) = {
      val out = Similarity.semDedup(emb, "vec_id", "embedding",
          knownCount = Some(total))
        .agg(sum(when(col("kept"), 1L).otherwise(0L)),
          expr("bit_xor(xxhash64(vec_id, kept))"))
        .head()
      (out.getLong(0), out.getLong(1))
    }
    def measure(what: String): (Long, Long) = {
      durations.clear(); byStage.clear()
      val t0 = System.nanoTime()
      val r = run()
      val secs = (System.nanoTime() - t0) / 1e9
      val ds = durations.asScala.map(_.longValue).toSeq.sorted
      val mx = ds.lastOption.getOrElse(0L)
      val p50 = if (ds.nonEmpty) ds(ds.size / 2) else 0L
      println(f"[cellskew] $what: $secs%.2f s wall, ${ds.size} tasks, " +
        f"p50 task $p50 ms, MAX task $mx ms, kept=${r._1}")
      val top = byStage.asScala.toSeq.sortBy(-_._2).take(3)
        .map { case (s, d) => s"stage $s max ${d}ms" }.mkString(", ")
      println(s"[cellskew]   slowest stages: $top")
      r
    }
    if (sys.env.contains("SPARK_GRAFT_GRID_DEBUG")) {
      val plan = Similarity.semDedup(emb, "vec_id", "embedding",
        knownCount = Some(total)).queryExecution.executedPlan.toString
      println("[cellskew] join nodes: " + "(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin|CartesianProduct|BroadcastNestedLoopJoin)".r
        .findAllIn(plan).toSeq.groupBy(identity).view.mapValues(_.size).toMap)
    }
    run() // codegen + cache warmup, both layouts share it
    spark.conf.set(Similarity.HotCellBoundKey, Long.MaxValue.toString)
    val off = measure(s"salting OFF (hub=$nHub in one cell, one reducer owns occ²)")
    spark.conf.unset(Similarity.HotCellBoundKey)
    val on = measure("salting ON  (default bound: grid spreads the hub)")
    require(off == on, s"grid salting changed output: off=$off on=$on")
    println(s"[cellskew] outputs identical (kept count + row checksum)")
    spark.stop()
  }

  /** `runMain graft.tools.ScaleCheck quota [nRows] [groups] [k]` — the
    * per-group quota probe behind
    * [[graft.operators.Sampling.quotaPerGroupAgg]]: window `row_number`
    * vs the bounded-heap typed aggregator at n and 10n rows, recording
    * wall time and max task duration. The claim (the operator's
    * scaladoc): the window plan sorts every group's FULL row set inside
    * the exchange, while the heap keeps ≤ k candidates per
    * (partition, group) so only `partitions × groups × k` pairs cross
    * the shuffle — the gap widens with rows-per-group. */
  private def quotaMain(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val groups = args.lift(1).map(_.toInt).getOrElse(20)
    val k = args.lift(2).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-quotacheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.{col, pmod}
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null)
          maxTask.getAndUpdate(m => math.max(m, e.taskInfo.duration))
    })
    import graft.operators.Sampling
    def df(rows: Long) = spark.range(rows).select(
      pmod(col("id"), org.apache.spark.sql.functions.lit(groups))
        .cast("string").as("g"), col("id"))
    def probe(rows: Long, what: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      maxTask.set(0)
      val t0 = System.nanoTime()
      val cnt = f(df(rows)).count()
      println(f"[quota] $what n=$rows: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        f"max task ${maxTask.get()} ms, out=$cnt")
    }
    // warmup codegen at the small size
    probe(n, "warmup-agg")(d => Sampling.quotaPerGroupAgg(d, Seq("g"), "id", k, "q"))
    probe(n, "warmup-win")(d => Sampling.quotaPerGroup(d, Seq("g"), "id", k, "q"))
    for (rows <- Seq(n, n * 10)) {
      probe(rows, "window-sort")(d => Sampling.quotaPerGroup(d, Seq("g"), "id", k, "q"))
      probe(rows, "bounded-heap")(d => Sampling.quotaPerGroupAgg(d, Seq("g"), "id", k, "q"))
    }
    spark.stop()
  }

  /** URL-curation scale probe: synthetic URLs over `spark.range`, 1× vs
    * 10× — normalize must scale linearly (shuffle-free map), urlDedup
    * tracks the one url_norm shuffle, domainCap the bounded-heap
    * aggregate (candidate volume capped at partitions × domains × cap
    * regardless of rows-per-domain — the skewed mega-domain case). */
  private def urlMain(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-urlcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators.UrlCuration
    // distinct canonical urls keyed on id/3, 1000 registered domains
    // (exampleN.com) with example0.com a mega-domain holding half the
    // corpus (the SEO-farm skew case)
    def df(rows: Long) = spark.range(rows).select(col("id"),
      concat(lit("HTTPS://WWW.Example"),
        when(col("id") % 2 === 0, lit("0"))
          .otherwise(pmod(col("id"), lit(1000)).cast("string")),
        lit(".com:443/p/"), (col("id") / 3).cast("long").cast("string"),
        when(col("id") % 2 === 0, lit("/?b=2&a=1&utm_x="))
          .otherwise(lit("/?a=1&b=2&utm_x=")),
        col("id").cast("string")).as("url"))
    def probe(rows: Long, what: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      // aggregate over a hash of EVERY output column — count() alone
      // lets the optimizer prune a pure projection to nothing
      val out = f(df(rows))
      val cnt = out.select(xxhash64(out.columns.map(col): _*).as("h"))
        .agg(count(lit(1)), max(col("h"))).head().getLong(0)
      println(f"[url] $what n=$rows: ${(System.nanoTime() - t0) / 1e9}%.2f s, out=$cnt")
    }
    probe(n, "warmup")(d => UrlCuration.normalized(d, "id", "url"))
    for (rows <- Seq(n, n * 10)) {
      probe(rows, "normalize")(d => UrlCuration.normalized(d, "id", "url"))
      probe(rows, "url-dedup")(d => UrlCuration.urlDedup(d, "id", "url"))
      probe(rows, "domain-cap")(d => UrlCuration.domainCap(d, "id", "url",
        cap = 100, salt = "u"))
    }
    spark.stop()
  }

  /** Distinct-count probe: exact count(DISTINCT) per group vs the HLL
    * sketch rollup, 1× vs 10× — the exact plan's expand+dedup shuffle
    * moves every (group, key) pair; the sketch shuffle moves
    * ≤ partitions × groups × 2^lgK bytes regardless of rows. Also times
    * answering the GLOBAL distinct from the already-built per-group
    * sketch table (union of kilobytes) vs a fresh corpus scan. */
  private def hllMain(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-hllcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    // generation is free in this probe, so WALL TIME under-reports the
    // exact plan's cost on real IO-bound data — the scale-relevant
    // metric is SHUFFLE VOLUME: exact distinct shuffles every distinct
    // (group, key) pair (grows with the corpus), the sketch shuffles
    // ≤ partitions × groups × 2^lgK bytes (flat)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleBytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def df(rows: Long) = spark.range(rows).select(
      (col("id") % 20).cast("string").as("g"),
      // high-cardinality keys: ~rows/3 distinct
      (xxhash64(col("id")) % (rows / 3)).as("k"))
    def time(what: String)(f: => Long): Unit = {
      shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      // the listener bus is ASYNC: task-end events (and their metrics)
      // drain after the job returns — give them time before reading
      Thread.sleep(1500)
      println(f"[hll] $what: $secs%.2f s, " +
        f"shuffle=${shuffleBytes.get() / 1024.0 / 1024.0}%.1f MiB, out=$out")
    }
    // every thunk forces the AGGREGATE VALUES (a bare count() lets the
    // optimizer prune the count_distinct/sketch expressions entirely —
    // the first probe draft "measured" an empty plan)
    def exactPerGroup(rows: Long): Long =
      df(rows).groupBy("g").agg(count_distinct(col("k")).as("d"))
        .agg(sum("d")).head().getLong(0)
    // warmup
    exactPerGroup(n)
    Sketches.distinctSketch(df(n), Seq("g"), "k")
      .agg(sum(length(col("sketch")))).head()
    for (rows <- Seq(n, n * 10)) {
      time(s"exact-distinct n=$rows")(exactPerGroup(rows))
      val sk = Sketches.distinctSketch(df(rows), Seq("g"), "k")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"sketch-table n=$rows")(
        sk.agg(sum(length(col("sketch")))).head().getLong(0))
      time(s"global-from-sketches n=$rows")(
        Sketches.rollup(sk, Nil).select("estimate").head().getLong(0))
      time(s"global-exact-rescan n=$rows")(
        df(rows).agg(count_distinct(col("k"))).head().getLong(0))
      sk.unpersist()
    }
    spark.stop()
  }

  /** `ScaleCheck qsketch [n]` — quantile sketch vs exact percentile:
    * wall time + shuffle volume at n and 10n rows. Exact quantiles sort
    * (or at best aggregate per distinct value — corpus-sized either
    * way); the log-linear sketch shuffles ≤ partitions × groups × 1025
    * bucket rows regardless of n, and answering the GLOBAL quantile
    * from the persisted per-group sketch table touches ≤ groups × 1025
    * rows — the raw corpus is never rescanned. */
  private def qsketchMain(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-qsketchcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          shuffleBytes.addAndGet(e.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def df(rows: Long) = spark.range(rows).select(
      (col("id") % 20).cast("string").as("g"),
      // heavy-tailed positive values
      (pmod(xxhash64(col("id")), lit(1L << 36)) + 1).as("v"))
    def time(what: String)(f: => Any): Unit = {
      shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val out = f
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1500) // async listener bus — let task metrics drain
      println(f"[qsketch] $what: $secs%.2f s, " +
        f"shuffle=${shuffleBytes.get() / 1024.0 / 1024.0}%.1f MiB, out=$out")
    }
    def exactPerGroup(rows: Long) =
      df(rows).groupBy("g")
        .agg(expr("percentile(v, array(0.5, 0.99))").as("p"))
        .agg(sum(element_at(col("p"), 2))).head().getDouble(0)
    exactPerGroup(n) // warmup
    Sketches.quantileSketch(df(n), Seq("g"), "v")
      .agg(sum("cnt")).head()
    for (rows <- Seq(n, n * 10)) {
      time(s"exact-percentile n=$rows")(exactPerGroup(rows))
      val sk = Sketches.quantileSketch(df(rows), Seq("g"), "v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // NOTE: the count() goes INSIDE the timed thunk — interpolating it
      // into the label would materialize the persist before the timer
      time(s"sketch-build n=$rows")(s"bucketRows=${sk.count()}")
      time(s"global-from-sketches n=$rows")(
        Sketches.sketchQuantiles(Sketches.mergeQuantileSketch(sk, Nil),
          Nil, Seq(0.5, 0.99)).agg(sum("est")).head().getDouble(0))
      time(s"global-exact-rescan n=$rows")(
        df(rows).agg(expr("percentile(v, 0.99)")).head().getDouble(0))
      sk.unpersist()
    }
    spark.stop()
  }

  /** `runMain graft.tools.ScaleCheck bitext [sfDir] [K]` — scale probe
    * for [[graft.operators.Similarity.bitextMine]]. The knob under test
    * is the quantizer grain: with a FIXED cell count, per-cell
    * occupancy grows ∝ n so the cross-side candidate product grows
    * ∝ n² — while cells ∝ √n balances the two real cost terms
    * (assignment is n·cells·d, candidates are n·occupancy·d; √n
    * equalizes them at n^1.5, the standard IVF deployment curve).
    * Mined output legitimately differs between grains (the margin
    * normalizer sees a different candidate neighborhood — bitext cells
    * are a retrieval scope, not a recall-compensated sketch), so the
    * probe records wall time AND pair counts at 1× and K× for both
    * grains; the claim is the COST curve, not output identity. */
  private def bitextMain(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-bitextcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Similarity

    val base = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    // replicate with sign/rotation scrambles (the embMain recipe):
    // replicas are near-orthogonal, so cross-side structure stays
    // within-replica — corpus growth adds content, not a degenerate
    // all-pairs blob. The 1M id offset is even, preserving the
    // parity-based side split in every replica.
    def rotated(n: Int): DataFrame =
      (0 until n).map { i =>
        if (i == 0) base
        else {
          val dim = size(col("embedding"))
          base.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
            transform(sequence(lit(0), dim - 1), j =>
              element_at(col("embedding"), pmod(j + lit(7 * i), dim) + 1) *
                when(pmod(xxhash64(lit(i) * lit(1000003L) + j), lit(2)) === 0,
                  lit(1.0f)).otherwise(lit(-1.0f))).as("embedding"))
        }
      }.reduce(_ unionAll _)
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bitext] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (n <- Seq(1, k)) {
      val emb = rotated(n).persist()
      val total = emb.count()
      println(s"[bitext] corpus x$n = $total vecs")
      val grains = Seq(
        "fixed-16-cells" -> 16,
        "cells-sqrt-n" -> math.max(16, math.sqrt(total.toDouble / 2).toInt))
      for ((label, cells) <- grains) {
        if (n == 1) // warmup codegen once per grain
          Similarity.bitextMine(emb, "vec_id", "embedding",
            col("vec_id") % 2 === 0, nCentroids = cells).count()
        val mined = time(s"$label x$n (cells=$cells)")(
          Similarity.bitextMine(emb, "vec_id", "embedding",
            col("vec_id") % 2 === 0, nCentroids = cells).count())
        println(s"[bitext] mined pairs $label x$n = $mined")
      }
      // drops the operator-pinned ranked frames AND emb in one sweep
      // (different grains share no plan subtree, so nothing mid-loop
      // depended on eviction — this is end-of-iteration hygiene)
      graft.operators.OperatorCache.clear(spark)
    }
    spark.stop()
  }

  /** Time named `SparkEntry.queries` gates against an arbitrary SF
    * directory (the round-6 verdict's sf10 probe: materialize K× data
    * with [[ScaleData]], then read per-gate cost ratios across decades).
    * One warm pass at sf0.001 pays codegen + JIT (a gate's plan and
    * generated classes are SF-invariant), then each gate is timed once
    * at the target — magnitude across decades is what's probed, not
    * millisecond precision. Operator-pinned caches are cleared between
    * gates so a standing index built at one gate never subsidizes the
    * next.
    *
    * `runMain graft.tools.ScaleCheck gates <sfDir> [gate1,gate2,...]`
    */
  private def gatesMain(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("target/sf1")
    val defaultGates = Seq("dedup_minhash_lsh", "tfidf_cosine_pairs",
      "containment_pairs", "edit_distance_pairs", "embedding_neardup",
      "ann_pq_topk", "knn_graph", "bitext_mine", "incremental_dedup_bloom",
      "triangle_counts")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(defaultGates)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-gatescheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-pass dir is overridable (ADVICE r7): on a host without the
    // default path the single timed run would silently include
    // codegen/JIT cost, skewing the cross-decade ratios this tool
    // exists to measure — so a skipped/failed warm pass WARNS loudly
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR",
      "/root/testdata/sf0.001")
    if (!new java.io.File(warmDir).isDirectory)
      println(s"[gates] WARN: warm dir $warmDir missing — timed runs " +
        "include codegen/JIT cost (set SPARK_GRAFT_WARM_DIR)")
    for (name <- names if {
      val known = graft.SparkEntry.queries.contains(name)
      if (!known) println(s"[gates] $name: UNKNOWN gate name, skipped")
      known
    }) {
      val fn = graft.SparkEntry.queries(name)
      if (new java.io.File(warmDir).isDirectory)
        try fn(spark, warmDir).count() catch { case e: Throwable =>
          println(s"[gates] WARN: warm pass for $name failed " +
            s"(${e.getClass.getSimpleName}) — timed run includes codegen")
        }
      graft.operators.OperatorCache.clear(spark)
      val t0 = System.nanoTime()
      val rows =
        try fn(spark, sf).count()
        catch { case e: Throwable =>
          println(s"[gates] $name @ $sf: ERROR ${e.getClass.getName}: ${e.getMessage}")
          -1L
        }
      if (rows >= 0)
        println(f"[gates] $name @ $sf: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$rows")
      graft.operators.OperatorCache.clear(spark)
    }
    spark.stop()
  }

  /** Hierarchical-quantizer scale probe (round 9 — VERDICT r8 item 1):
    * `runMain graft.tools.ScaleCheck hier [nList] [d]` (default
    * `2000000,20000000,40000000` and d=16). Synthesizes n deterministic
    * pseudo-random vectors ON THE FLY (hash-based coordinates — no
    * materialization, the generator re-evaluates per scan), resolves
    * the AUTO quantizer (flat √n codebook below the 4096 cap, the
    * two-level hierarchy above it), and measures
    *
    *   - train seconds (centroid collects + the distributed sub-Lloyd),
    *   - assign+occupancy seconds (one corpus pass + one cell aggregate),
    *   - Σ occ² — the within-cell candidate volume every family
    *     operator (semDedup / knnGraph / bitextMine / ivf probing) pays,
    *   - the CAPPED-FLAT floor n²/4096 (uniform occupancy is the best
    *     case a 4096-cell codebook can do — real skew only raises it),
    *
    * and prints per-n lines plus consecutive-point growth slopes. The
    * claim under test: Σ occ² grows ~n^1.5 under the auto path (cells
    * track √n through the hierarchy) while any capped layout grows n²;
    * past the ~16.8M-vector crossover the ratio floor/measured exceeds
    * 1 and widens with n. PERF.md records the measured curve. */
  private def hierMain(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(2000000L, 20000000L, 40000000L))
    val d = args.lift(1).map(_.toInt).getOrElse(16)
    // optional sub-broadcast cap override (bytes): force 0 to exercise
    // the past-the-cap shuffle-hash degrade at probe scale (round 10 —
    // the n^1.5 curve must hold without the broadcast)
    val subCap = args.lift(2).map(_.toLong)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-hiercheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .config(graft.plans.QuantizerCellGuard.ModeKey, "fail")
      .getOrCreate()
    subCap.foreach(c => spark.conf.set(
      graft.operators.Similarity.SubBroadcastCapKey, c.toString))
    subCap.foreach(c => println(s"[hier] sub-broadcast cap forced to $c B"))
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val results = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    for (n <- ns) {
      val emb = spark.range(n).select(col("id").as("n_id"),
        expr(s"transform(sequence(0, ${d - 1}), j -> " +
          "CAST((pmod(xxhash64(id, j), 2001) - 1000) / 1000.0 AS FLOAT))")
          .as("v"))
      val t0 = System.nanoTime()
      val q = graft.operators.Similarity.buildQuantizer("hierProbe", 0,
        emb, Some(n))
      val trainSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val occ = q.assign(emb).groupBy("cell").count()
        .agg(sum(col("count") * col("count")).as("sumsq"),
          max("count").as("mx"), count(lit(1)).as("cells")).head()
      val assignSec = (System.nanoTime() - t1) / 1e9
      val sumsq = occ.getLong(0)
      val layout = q match {
        case h: graft.operators.Similarity.HierQuantizer =>
          s"hier(k1=${h.top.size},k2=${h.k2})"
        case f: graft.operators.Similarity.FlatQuantizer =>
          s"flat(${f.centroids.size})"
      }
      val floor = n.toDouble * n.toDouble / 4096.0
      println(f"[hier] n=$n d=$d layout=$layout liveCells=${occ.getLong(2)} " +
        f"train=$trainSec%.1f s assign+occ=$assignSec%.1f s " +
        f"sumsq=$sumsq%.3e maxocc=${occ.getLong(1)} " +
        f"flat4096_floor=$floor%.3e ratio=${floor / sumsq}%.2f")
      results += ((n, sumsq.toDouble))
      graft.operators.OperatorCache.clear(spark)
    }
    results.toSeq.sliding(2).foreach {
      case Seq((n1, s1), (n2, s2)) if n2 > n1 =>
        val slope = math.log(s2 / s1) / math.log(n2.toDouble / n1)
        println(f"[hier] slope n=$n1→$n2: candidate growth ~n^$slope%.2f " +
          "(capped flat = n^2.00, √n-ideal = n^1.50)")
      case _ => ()
    }
    spark.stop()
  }

  /** Incremental-ingest dedup scale probe (round 9 — VERDICT r8 item 2):
    * `runMain graft.tools.ScaleCheck ingest [corpusList] [shard] [d]`
    * (default `200000,2000000` / 20000 / 64 — standing corpus 10× and
    * 100× the shard). For each corpus size n it materializes a synthetic
    * engine stream of n deterministic vectors, lets the FIRST deduped
    * ingest bootstrap the persisted `__lshidx` postings stream (reported
    * separately — that pass is the one-per-epoch cost), then times ONE
    * steady-state `appendRowsDedupedEmbedding` of a mixed shard (half
    * exact duplicates of corpus vectors, half novel). Alongside it times
    * the round-8 inline path (`embeddingIncrementalNearDupsManaged`,
    * which re-signatures the standing corpus per call) on the same
    * shard, probe-only — a LOWER bound on the old per-ingest cost.
    *
    * The claim under test: the indexed ingest is ~flat as the corpus
    * grows 10×→100× the shard (its per-ingest work is shard signatures +
    * a postings read), while the inline path grows ~linearly with the
    * corpus (its per-ingest work IS the corpus signature pass). PERF.md
    * records the measured pair. */
  private def ingestMain(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 2000000L))
    val shardN = args.lift(1).map(_.toLong).getOrElse(20000L)
    val d = args.lift(2).map(_.toInt).getOrElse(64)
    val threshold = 0.9
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ingestcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def vecOf(src: org.apache.spark.sql.Column) =
      expr(s"transform(sequence(0, ${d - 1}), j -> " +
        "CAST((pmod(xxhash64(__src, j), 2001) - 1000) / 1000.0 AS FLOAT))")
    for (n <- ns) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-ingestcheck").toString
      val e = new graft.engine.Engine(spark, root)
      e.createStream("corpus", graft.schema.StreamSchema.fromStruct(
        new org.apache.spark.sql.types.StructType()
          .add("vec_id", "long", nullable = false)
          .add("embedding", s"array<float>")))
      e.appendRows("corpus", spark.range(n)
        .select(col("id").as("vec_id"), col("id").as("__src"))
        .withColumn("embedding", vecOf(col("__src"))).drop("__src"))
      // mixed shard: ids n..n+shard; first half duplicates corpus vector
      // (same generator seed), second half novel (unseen seeds)
      def shard(offset: Long) = spark.range(shardN)
        .select((col("id") + n + offset).as("vec_id"),
          when(col("id") < shardN / 2, col("id") + offset)
            .otherwise(col("id") + n + offset).as("__src"))
        .withColumn("embedding", vecOf(col("__src"))).drop("__src")
      val t0 = System.nanoTime()
      val dBoot = e.appendRowsDedupedEmbedding("corpus", shard(0),
        "vec_id", "embedding", threshold, d)
      val bootSec = (System.nanoTime() - t0) / 1e9
      val idx = e.catalog.get(e.lshIndexName("corpus")).get
      val t1 = System.nanoTime()
      val dSteady = e.appendRowsDedupedEmbedding("corpus", shard(shardN),
        "vec_id", "embedding", threshold, d)
      val steadySec = (System.nanoTime() - t1) / 1e9
      // round-8 inline path, probe-only (no append — a lower bound)
      val existing = e.readStream("corpus").select(col("vec_id"), col("embedding"))
      val t2 = System.nanoTime()
      val (pairs, cleanup) =
        graft.operators.Dedup.embeddingIncrementalNearDupsManaged(
          existing, shard(2 * shardN), "vec_id", "embedding", threshold, d)
      val inlinePairs = pairs.count()
      val inlineSec = (System.nanoTime() - t2) / 1e9
      cleanup()
      println(f"[ingest] corpus=$n shard=$shardN d=$d " +
        f"layout=(p=${idx.properties("lsh_planes")},t=${idx.properties("lsh_tables")}," +
        f"r=${idx.properties("lsh_radius")}) bootstrap=$bootSec%.1f s " +
        f"(dropped=$dBoot) indexed_ingest=$steadySec%.1f s (dropped=$dSteady) " +
        f"inline_probe=$inlineSec%.1f s (pairs=$inlinePairs) " +
        f"inline/indexed=${inlineSec / steadySec}%.1fx")
      graft.operators.OperatorCache.clear(spark)
    }
    spark.stop()
  }

  /** TEXT twin of [[ingestMain]] (round 9 — the MinHash `__mhpost`/
    * `__mhsig` index): `runMain graft.tools.ScaleCheck ingesttext
    * [corpusList] [shard]` (default `200000,2000000` / 20000).
    * Synthetic documents (24 hash-derived tokens; half of each shard
    * exactly duplicates a corpus document, half is novel), engine
    * stream + one bootstrap ingest, then ONE timed steady-state
    * `appendRowsDeduped` vs the inline
    * `incrementalNearDupsManaged` probe (which re-shingles +
    * re-minhashes the standing corpus per call). */
  private def ingestTextMain(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 2000000L))
    val shardN = args.lift(1).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ingesttextcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def textOf(src: org.apache.spark.sql.Column) =
      expr("array_join(transform(sequence(0, 23), j -> " +
        "concat('w', pmod(xxhash64(__src, j), 50000))), ' ')")
    for (n <- ns) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-ingesttextcheck").toString
      val e = new graft.engine.Engine(spark, root)
      e.createStream("corpus", graft.schema.StreamSchema.fromStruct(
        new org.apache.spark.sql.types.StructType()
          .add("doc_id", "long", nullable = false)
          .add("text", "string")))
      e.appendRows("corpus", spark.range(n)
        .select(col("id").as("doc_id"), col("id").as("__src"))
        .withColumn("text", textOf(col("__src"))).drop("__src"))
      def shard(offset: Long) = spark.range(shardN)
        .select((col("id") + n + offset).as("doc_id"),
          when(col("id") < shardN / 2, col("id") + offset)
            .otherwise(col("id") + n + offset).as("__src"))
        .withColumn("text", textOf(col("__src"))).drop("__src")
      val t0 = System.nanoTime()
      val dBoot = e.appendRowsDeduped("corpus", shard(0), "doc_id", "text")
      val bootSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val dSteady = e.appendRowsDeduped("corpus", shard(shardN), "doc_id", "text")
      val steadySec = (System.nanoTime() - t1) / 1e9
      val existing = e.readStream("corpus").select(col("doc_id"), col("text"))
      val t2 = System.nanoTime()
      val (pairs, cleanup) =
        graft.operators.Dedup.incrementalNearDupsManaged(
          existing, shard(2 * shardN), "doc_id", "text")
      val inlinePairs = pairs.count()
      val inlineSec = (System.nanoTime() - t2) / 1e9
      cleanup()
      println(f"[ingesttext] corpus=$n shard=$shardN bootstrap=$bootSec%.1f s " +
        f"(dropped=$dBoot) indexed_ingest=$steadySec%.1f s (dropped=$dSteady) " +
        f"inline_probe=$inlineSec%.1f s (pairs=$inlinePairs) " +
        f"inline/indexed=${inlineSec / steadySec}%.1fx")
      graft.operators.OperatorCache.clear(spark)
    }
    spark.stop()
  }

  /** ANN recall curve (round 11): `runMain graft.tools.ScaleCheck
    * recall [corpusList] [d] [k] [nQueries]` (default `200000,2000000`
    * / 32 / 10 / 48). For each corpus size and each of two data
    * geometries — CLUSTERED (256 planted centers + noise, the shape
    * embedding corpora actually have) and UNIFORM (adversarial for a
    * coarse quantizer: cell boundaries cut neighborhoods arbitrarily) —
    * build the persisted index once, compute exact ground truth with
    * [[graft.operators.Similarity.bruteForceTopK]], then measure
    * recall@k ([[graft.operators.Similarity.recallAtK]]) of the
    * index-served search at nProbe ∈ {1, 2, 4, 8}, with per-search
    * wall time. PQ is NOT swept separately: its error-bound prune makes
    * `pqTopK ≡ ivfTopK` row-for-row (Similarity.scala pqFinal
    * contract), which the probe verifies at one point instead.
    *
    * The claim under test: recall is a nProbe-tunable contract, not a
    * fixed property — the curve tells an operator what nProbe buys at
    * their data's geometry, and the measured search times give the
    * recall/latency exchange rate. Candidate volume grows ~nProbe·√n,
    * so the recall KNOB costs linearly in nProbe while recall
    * approaches 1 geometrically on clustered data. */
  private def recallMain(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 2000000L))
    val d = args.lift(1).map(_.toInt).getOrElse(32)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val nQ = args.lift(3).map(_.toInt).getOrElse(48)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-recallcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Similarity
    // clustered: center(id % 256) + 0.25·noise(id) — tight enough that
    // true neighbors share a center, loose enough that rankings differ
    // per row; uniform: pure hash noise (no structure to exploit)
    def vecExpr(clustered: Boolean): String = {
      val center = s"(pmod(xxhash64(pmod(id, 256), j), 2001) - 1000) / 1000.0"
      val noise = s"(pmod(xxhash64(id, j + 7777), 2001) - 1000) / 1000.0"
      val body = if (clustered) s"$center + 0.25 * ($noise)" else noise
      s"transform(sequence(0, ${d - 1}), j -> CAST($body AS FLOAT))"
    }
    for (n <- ns; clustered <- Seq(true, false)) {
      val layout = if (clustered) "clustered" else "uniform"
      val root = java.nio.file.Files
        .createTempDirectory("graft-recallcheck").toString
      val e = new graft.engine.Engine(spark, root)
      e.createStream("corpus", graft.schema.StreamSchema.fromStruct(
        new org.apache.spark.sql.types.StructType()
          .add("vec_id", "long", nullable = false)
          .add("embedding", "array<float>")))
      e.appendRows("corpus", spark.range(n)
        .select(col("id").as("vec_id"),
          expr(vecExpr(clustered)).as("embedding")))
      val t0 = System.nanoTime()
      e.ensureAnnIndex("corpus", "vec_id", "embedding")
      val buildSec = (System.nanoTime() - t0) / 1e9
      val kind = e.catalog.get(e.annIndexName("corpus")).get
        .properties.getOrElse("ann_kind", "?")
      val corpus = e.readStream("corpus")
      val tTruth = System.nanoTime()
      val truth = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        col("vec_id") < nQ, k).persist()
      val truthN = truth.count()
      val truthSec = (System.nanoTime() - tTruth) / 1e9
      require(truthN == nQ.toLong * k, s"truth rows $truthN != ${nQ * k}")
      val curve = Seq(1, 2, 4, 8).map { nProbe =>
        val t = System.nanoTime()
        val approx = e.annTopKIndexedServe("corpus", "vec_id", "embedding",
          col("vec_id") < nQ, k, nProbe).persist()
        approx.count()
        val searchSec = (System.nanoTime() - t) / 1e9
        val r = Similarity.recallAtK(approx, truth, k)
          .agg(avg("recall")).head().getDouble(0)
        approx.unpersist()
        (nProbe, r, searchSec)
      }
      // the pq ≡ ivf contract, verified at one sweep point: identical
      // (q_id, n_id) sets → identical recall by construction
      val ivf2 = e.annTopKIndexedServe("corpus", "vec_id", "embedding",
        col("vec_id") < nQ, k, nProbe = 2)
      val pq2 = e.annTopKIndexedServe("corpus", "vec_id", "embedding",
        col("vec_id") < nQ, k, nProbe = 2, method = "pq")
      val pqDiff = ivf2.select("q_id", "n_id")
        .exceptAll(pq2.select("q_id", "n_id")).count()
      require(pqDiff == 0, s"pq ≢ ivf at nProbe=2: $pqDiff rows differ")
      // cardinality too: exceptAll is one-directional (extra/duplicate
      // pq rows would still leave ivf a subset)
      val pqN = pq2.count(); val ivfN = ivf2.count()
      require(pqN == ivfN, s"pq ≢ ivf at nProbe=2: $pqN vs $ivfN rows")
      truth.unpersist()
      val curveStr = curve.map { case (p, r, s) =>
        f"nProbe=$p recall=$r%.3f (${s}%.1f s)"
      }.mkString("  ")
      println(f"[recall] corpus=$n d=$d layout=$layout kind=$kind k=$k " +
        f"queries=$nQ build=$buildSec%.1f s truth=$truthSec%.1f s " +
        f"$curveStr pq≡ivf@2: ok")
      graft.operators.OperatorCache.clear(spark)
    }
    spark.stop()
  }

  /** Filtered-search scale probe (round 11):
    * `runMain graft.tools.ScaleCheck filtered [corpusList] [d] [nQ]`
    * (default `200000,2000000` / 32 / 32). Builds a clustered corpus
    * with a `label` metadata column (pmod 100 → selectivity predicates
    * `label < s` select s%), one persisted index, then for each
    * selectivity in {1%, 10%, 50%}: timed filtered serve at nProbe=2,
    * plus measured filtered recall at nProbe 2 and 8 against FILTERED
    * brute force. Claims under test: (a) filtered-search cost stays
    * index-served (probe + eligible semi-join — never a re-encode or a
    * corpus re-shuffle) at 10× corpus; (b) recall at fixed nProbe drops
    * as the filter thins probed cells, and widening nProbe restores it
    * — the measured form of the "widen nProbe for selective filters"
    * guidance on [[graft.engine.Engine.annTopKIndexedServe]]. */
  private def filteredMain(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 2000000L))
    val d = args.lift(1).map(_.toInt).getOrElse(32)
    val nQ = args.lift(2).map(_.toInt).getOrElse(32)
    val k = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-filteredcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Similarity
    val vecExpr = {
      val center = s"(pmod(xxhash64(pmod(id, 256), j), 2001) - 1000) / 1000.0"
      val noise = s"(pmod(xxhash64(id, j + 7777), 2001) - 1000) / 1000.0"
      s"transform(sequence(0, ${d - 1}), j -> CAST($center + 0.25 * ($noise) AS FLOAT))"
    }
    for (n <- ns) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-filteredcheck").toString
      val e = new graft.engine.Engine(spark, root)
      e.createStream("corpus", graft.schema.StreamSchema.fromStruct(
        new org.apache.spark.sql.types.StructType()
          .add("vec_id", "long", nullable = false)
          .add("embedding", "array<float>")
          .add("label", "int")))
      e.appendRows("corpus", spark.range(n)
        .select(col("id").as("vec_id"), expr(vecExpr).as("embedding"),
          pmod(col("id"), lit(100)).cast("int").as("label")))
      val t0 = System.nanoTime()
      e.ensureAnnIndex("corpus", "vec_id", "embedding")
      val buildSec = (System.nanoTime() - t0) / 1e9
      val corpus = e.readStream("corpus")
      for (sel <- Seq(1, 10, 50)) {
        val pred = Some(col("label") < sel)
        val tS = System.nanoTime()
        val served = e.annTopKIndexedServe("corpus", "vec_id", "embedding",
          col("vec_id") < nQ, k, nProbe = 2, corpusPred = pred)
        val servedN = served.count()
        val serveSec = (System.nanoTime() - tS) / 1e9
        val truth = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
          col("vec_id") < nQ, k,
          corpusPred = col("label") < sel).persist()
        truth.count()
        def recallAt(nProbe: Int): Double = {
          val approx = e.annTopKIndexedServe("corpus", "vec_id",
            "embedding", col("vec_id") < nQ, k, nProbe, corpusPred = pred)
          val r = Similarity.recallAtK(approx, truth, k)
            .agg(avg("recall")).head()
          if (r.isNullAt(0)) 1.0 else r.getDouble(0)
        }
        val r2 = recallAt(2)
        val r8 = recallAt(8)
        truth.unpersist()
        println(f"[filtered] corpus=$n d=$d sel=$sel%% nProbe=2 " +
          f"serve=$serveSec%.1f s rows=$servedN " +
          f"recall@2=$r2%.3f recall@8=$r8%.3f (build=$buildSec%.1f s)")
      }
      graft.operators.OperatorCache.clear(spark)
    }
    spark.stop()
  }

  /** Persisted-ANN-index scale probe (round 10 — VERDICT r9 item 1):
    * `runMain graft.tools.ScaleCheck annidx [corpusList] [d]` (default
    * `200000,2000000` / 32). For each corpus size n: materialize an
    * engine stream of n deterministic vectors, time `ensureAnnIndex`
    * (the once-per-epoch build: quantizer train + corpus assign+encode),
    * then time THREE repeat `annTopKIndexed` query batches (32 queries,
    * k=10, nProbe=3) and ONE inline `ivfTopK` on the same queries — the
    * inline path re-pays train+assign per call. The claim under test:
    * repeat-query cost stops scaling with the corpus once the index
    * stands (probe + cell-join only; candidates grow ~nProbe·√n), while
    * the inline call stays corpus-linear. PERF.md records the pair. */
  private def annidxMain(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 2000000L))
    val d = args.lift(1).map(_.toInt).getOrElse(32)
    // optional 3rd arg: sub-centroid broadcast cap override (round 11 —
    // VERDICT r10 item 2: the 20M point crosses the flat-codebook cap,
    // so the index carries the HIER quantizer; cap 0 forces the
    // past-broadcast shuffle-hash degrade plan, as `ScaleCheck hier`
    // does)
    val subCap = args.lift(2).map(_.toLong)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-annidxcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    subCap.foreach(c => spark.conf.set(
      graft.operators.Similarity.SubBroadcastCapKey, c.toString))
    graft.functions.GraftFunctions.register(spark)
    for (n <- ns) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-annidxcheck").toString
      val e = new graft.engine.Engine(spark, root)
      e.createStream("corpus", graft.schema.StreamSchema.fromStruct(
        new org.apache.spark.sql.types.StructType()
          .add("vec_id", "long", nullable = false)
          .add("embedding", "array<float>")))
      e.appendRows("corpus", spark.range(n)
        .select(col("id").as("vec_id"),
          expr(s"transform(sequence(0, ${d - 1}), j -> " +
            "CAST((pmod(xxhash64(id, j), 2001) - 1000) / 1000.0 AS FLOAT))")
            .as("embedding")))
      val t0 = System.nanoTime()
      e.ensureAnnIndex("corpus", "vec_id", "embedding")
      val buildSec = (System.nanoTime() - t0) / 1e9
      val annKind = e.catalog.get(e.annIndexName("corpus")).get
        .properties.getOrElse("ann_kind", "?")
      val reps = (1 to 3).map { _ =>
        val t = System.nanoTime()
        val c = e.annTopKIndexed("corpus", "vec_id", "embedding",
          col("vec_id") < 32, k = 10, nProbe = 3).count()
        require(c > 0, "indexed search returned nothing")
        (System.nanoTime() - t) / 1e9
      }
      // inline contrast is corpus-linear BY CONSTRUCTION (per-call Lloyd
      // retrain; 6.5→124 s across 200k→2M, round 10) — at ≥4M re-measuring
      // it buys nothing and costs ~hour-scale, so the point is skipped
      // and the indexed columns carry the comparison
      val inlineSec = if (n >= 4000000L) Double.NaN else {
        val t1 = System.nanoTime()
        graft.operators.Similarity.ivfTopK(
          e.readStream("corpus"), "vec_id", "embedding",
          col("vec_id") < 32, k = 10, nProbe = 3).count()
        (System.nanoTime() - t1) / 1e9
      }
      // shard ingest under the STANDING codebooks: cost must be
      // shard-sized, ~flat in corpus size (assign+encode the shard,
      // append to __annidx — no retrain, no corpus pass)
      val shard = spark.range(n, n + 10000).select(col("id").as("vec_id"),
        expr(s"transform(sequence(0, ${d - 1}), j -> " +
          "CAST((pmod(xxhash64(id, j), 2001) - 1000) / 1000.0 AS FLOAT))")
          .as("embedding"))
      val t2 = System.nanoTime()
      e.appendRowsAnnIndexed("corpus", shard, "vec_id", "embedding")
      val ingestSec = (System.nanoTime() - t2) / 1e9
      val med = reps.sorted.apply(1)
      println(f"[annidx] corpus=$n d=$d kind=$annKind build=$buildSec%.1f s " +
        f"indexed_query=${reps.map(r => f"$r%.1f").mkString("/")} s " +
        f"(median=$med%.1f) inline_query=$inlineSec%.1f s " +
        f"inline/indexed=${inlineSec / med}%.1fx " +
        f"shard10k_ingest=$ingestSec%.1f s")
      graft.operators.OperatorCache.clear(spark)
    }
    spark.stop()
  }

  /** [[graft.engine.Engine.forgetRows]] at scale (round 11): forget 1%
    * of a corpus carrying BOTH standing index families (MinHash dedup +
    * ANN) and prove the cost class — a rewrite-bound pass over the main
    * store plus an anti-join rewrite per sibling, NEVER a retrain. The
    * claims under test (PERF.md): forget_sec grows ~linearly with the
    * corpus while staying well under the ANN build cost it avoids; both
    * families stay LIVE through the forget (post-forget `ensureAnnIndex`
    * is a no-op and the next deduped ingest is shard-sized, not a
    * bootstrap); the repeat indexed query costs the same after as
    * before; a zero-match forget costs one predicate scan, no rewrite.
    *
    * `runMain graft.tools.ScaleCheck forget [n1,n2] [dims]`
    */
  private def forgetMain(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 2000000L))
    val d = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-forgetcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val textExpr = "concat('tok', id, ' a', id % 97, ' b', id % 89, " +
      "' c', id % 83, ' d', id % 79, ' e', id % 73)"
    def vecExpr = s"transform(sequence(0, ${d - 1}), j -> " +
      "CAST((pmod(xxhash64(id, j), 2001) - 1000) / 1000.0 AS FLOAT))"
    for (n <- ns) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-forgetcheck").toString
      val e = new graft.engine.Engine(spark, root)
      e.createStream("corpus", graft.schema.StreamSchema.fromStruct(
        new org.apache.spark.sql.types.StructType()
          .add("vec_id", "long", nullable = false)
          .add("text", "string")
          .add("embedding", "array<float>")))
      e.appendRows("corpus", spark.range(n)
        .select(col("id").as("vec_id"), expr(textExpr).as("text"),
          expr(vecExpr).as("embedding")))
      // bootstrap both families; the ANN build time is the retrain cost
      // a forget-as-rebuild design would pay on every takedown
      e.appendRowsDeduped("corpus",
        spark.range(n, n + 1).select(col("id").as("vec_id"),
          expr(textExpr).as("text"), expr(vecExpr).as("embedding")),
        "vec_id", "text", threshold = 0.5)
      val t0 = System.nanoTime()
      e.ensureAnnIndex("corpus", "vec_id", "embedding")
      val annBuildSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val preHits = e.annTopKIndexed("corpus", "vec_id", "embedding",
        col("vec_id") < 32, k = 10, nProbe = 3).count()
      val preQuerySec = (System.nanoTime() - t1) / 1e9
      require(preHits > 0)
      // the measured takedown: 1% of the corpus, both indexes standing
      val t2 = System.nanoTime()
      val forgotten = e.forgetRows("corpus", col("vec_id") % 100 === 0)
      val forgetSec = (System.nanoTime() - t2) / 1e9
      require(forgotten >= n / 100,
        s"expected ~${n / 100} forgotten, got $forgotten")
      val t3 = System.nanoTime()
      require(!e.ensureAnnIndex("corpus", "vec_id", "embedding"),
        "forget must leave the ANN index LIVE")
      val ensureSec = (System.nanoTime() - t3) / 1e9
      val t4 = System.nanoTime()
      val hits = e.annTopKIndexed("corpus", "vec_id", "embedding",
        col("vec_id") < 32, k = 10, nProbe = 3)
        .select("n_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect()
      val postQuerySec = (System.nanoTime() - t4) / 1e9
      require(hits.nonEmpty && hits.forall(_ % 100 != 0),
        "forgotten vectors must not serve")
      // dedup family stayed live too: the next ingest is shard-sized
      val t5 = System.nanoTime()
      val dropped = e.appendRowsDeduped("corpus",
        spark.range(n + 1, n + 10001).select(col("id").as("vec_id"),
          expr(textExpr).as("text"), expr(vecExpr).as("embedding")),
        "vec_id", "text", threshold = 0.5)
      val ingestSec = (System.nanoTime() - t5) / 1e9
      // zero-match forget: one pushed predicate scan, no rewrite
      val t6 = System.nanoTime()
      require(e.forgetRows("corpus", col("vec_id") < 0) == 0L)
      val noopSec = (System.nanoTime() - t6) / 1e9
      println(f"[forget] corpus=$n d=$d ann_build=$annBuildSec%.1f s " +
        f"forget1pct=$forgetSec%.1f s (forgotten=$forgotten) " +
        f"post_ensure=$ensureSec%.2f s (live) " +
        f"query_pre=$preQuerySec%.1f s post=$postQuerySec%.1f s " +
        f"ingest10k=$ingestSec%.1f s (dropped=$dropped) " +
        f"noop_forget=$noopSec%.2f s")
      graft.operators.OperatorCache.clear(spark)
    }
    spark.stop()
  }

  /** Combined-index ingest probe (round 11 — VERDICT r10 item 1):
    * `runMain graft.tools.ScaleCheck combined [corpusList] [d]` (default
    * `200000,2000000` / 32). One stream carries BOTH the MinHash dedup
    * siblings and the ANN retrieval index. The claim under test: a
    * deduped ingest's cost stays SHARD-sized as the corpus grows — the
    * unified sibling maintenance encodes the survivors into the
    * standing `__annidx` under frozen codebooks, so the ANN index stays
    * live (`ensureAnnIndex` right after must be a no-op, and the repeat
    * query must run at index-served cost). Before round 11 the same
    * ingest left the ANN index stale and the next search re-paid the
    * corpus-linear build (the `build` column is that cost, for
    * contrast). */
  private def combinedMain(args: Array[String]): Unit = {
    val ns = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(200000L, 2000000L))
    val d = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-combinedcheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val textExpr = "concat('tok', id, ' a', id % 97, ' b', id % 89, " +
      "' c', id % 83, ' d', id % 79, ' e', id % 73)"
    def vecExpr = s"transform(sequence(0, ${d - 1}), j -> " +
      "CAST((pmod(xxhash64(id, j), 2001) - 1000) / 1000.0 AS FLOAT))"
    for (n <- ns) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-combinedcheck").toString
      val e = new graft.engine.Engine(spark, root)
      e.createStream("corpus", graft.schema.StreamSchema.fromStruct(
        new org.apache.spark.sql.types.StructType()
          .add("vec_id", "long", nullable = false)
          .add("text", "string")
          .add("embedding", "array<float>")))
      e.appendRows("corpus", spark.range(n)
        .select(col("id").as("vec_id"), expr(textExpr).as("text"),
          expr(vecExpr).as("embedding")))
      // bootstrap both families: one corpus pass each
      val t0 = System.nanoTime()
      val d0 = e.appendRowsDeduped("corpus",
        spark.range(n, n + 1).select(col("id").as("vec_id"),
          expr(textExpr).as("text"), expr(vecExpr).as("embedding")),
        "vec_id", "text", threshold = 0.5)
      val mhBootSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      e.ensureAnnIndex("corpus", "vec_id", "embedding")
      val annBuildSec = (System.nanoTime() - t1) / 1e9
      // the measured ingest: 10k rows, 1k text-dups of existing docs +
      // 9k novel — through the dedup path, onto the ANN-indexed stream
      val dups = spark.range(1000).select(
        (col("id") + 900000000L).as("vec_id"), expr(textExpr).as("text"),
        expr(vecExpr).as("embedding"))
      val novel = spark.range(n + 1, n + 9001).select(
        col("id").as("vec_id"), expr(textExpr).as("text"),
        expr(vecExpr).as("embedding"))
      val t2 = System.nanoTime()
      val dropped = e.appendRowsDeduped("corpus", dups.unionAll(novel),
        "vec_id", "text", threshold = 0.5)
      val ingestSec = (System.nanoTime() - t2) / 1e9
      require(dropped >= 1000, s"expected the 1000 dups dropped, got $dropped")
      // the ANN index must still be LIVE — zero rebuild work
      val t3 = System.nanoTime()
      val rebuilt = e.ensureAnnIndex("corpus", "vec_id", "embedding")
      val ensureSec = (System.nanoTime() - t3) / 1e9
      require(!rebuilt, "combined ingest must keep the ANN index live")
      val t4 = System.nanoTime()
      val hits = e.annTopKIndexed("corpus", "vec_id", "embedding",
        col("vec_id") < 32, k = 10, nProbe = 3).count()
      val querySec = (System.nanoTime() - t4) / 1e9
      require(hits > 0)
      println(f"[combined] corpus=$n d=$d mh_bootstrap=$mhBootSec%.1f s " +
        f"(dropped=$d0) ann_build=$annBuildSec%.1f s " +
        f"combined_ingest10k=$ingestSec%.1f s (dropped=$dropped) " +
        f"post_ingest_ensure=$ensureSec%.2f s (live) " +
        f"indexed_query=$querySec%.1f s")
      graft.operators.OperatorCache.clear(spark)
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("annidx")) return annidxMain(args.drop(1))
    if (args.headOption.contains("recall")) return recallMain(args.drop(1))
    if (args.headOption.contains("filtered")) return filteredMain(args.drop(1))
    if (args.headOption.contains("combined")) return combinedMain(args.drop(1))
    if (args.headOption.contains("forget")) return forgetMain(args.drop(1))
    if (args.headOption.contains("ingest")) return ingestMain(args.drop(1))
    if (args.headOption.contains("ingesttext")) return ingestTextMain(args.drop(1))
    if (args.headOption.contains("hier")) return hierMain(args.drop(1))
    if (args.headOption.contains("gates")) return gatesMain(args.drop(1))
    if (args.headOption.contains("bitext")) return bitextMain(args.drop(1))
    if (args.headOption.contains("qsketch")) return qsketchMain(args.drop(1))
    if (args.headOption.contains("skew")) return skewMain(args.drop(1))
    if (args.headOption.contains("cellskew")) return cellskewMain(args.drop(1))
    if (args.headOption.contains("rank")) return rankMain(args.drop(1))
    if (args.headOption.contains("emb")) return embMain(args.drop(1))
    if (args.headOption.contains("quota")) return quotaMain(args.drop(1))
    if (args.headOption.contains("url")) return urlMain(args.drop(1))
    if (args.headOption.contains("hll")) return hllMain(args.drop(1))
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scalecheck")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val offset = 1000000L
    // K replicas with disjoint id ranges; texts repeat, so near-dup pairs
    // WITHIN a replica replicate K× and pairs ACROSS replicas add the
    // duplicated-content block — output grows ~K² per duplicated doc pair
    // ONLY for genuinely duplicated content, while candidate volume from
    // banding stays proportional to colliding content, not corpus²
    def replicated(n: Int): DataFrame =
      (0 until n).map(i => base.select(
        (col("doc_id") + lit(i * offset)).as("doc_id"), col("text")))
        .reduce(_ unionAll _)

    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (n <- Seq(1, k)) {
      val docs = replicated(n).persist()
      val rows = docs.count()
      println(s"[scale] corpus x$n = $rows docs")
      // warmup pass at n=1 only (JIT/codegen)
      if (n == 1) { Dedup.minhashLsh(docs, "doc_id", "text", 2, 128, 32, 0.5).count() }
      val mh = time(s"minhash_lsh x$n")(
        Dedup.minhashLsh(docs, "doc_id", "text", 2, 128, 32, 0.5).count())
      println(s"[scale] minhash pairs x$n = $mh")
      val sh = time(s"simhash x$n")(
        Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10).count())
      println(s"[scale] simhash pairs x$n = $sh")
      val nj = time(s"ngram_ppjoin x$n")(
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", shingleN = 3,
          threshold = 0.3, queryPred = col("id") % 10 === 0).count())
      println(s"[scale] ngram pairs x$n = $nj")
      val ct = time(s"containment x$n")(
        Dedup.containmentPairs(docs, "doc_id", "text", shingleN = 3,
          threshold = 0.5, queryPred = col("id") % 10 === 0).count())
      println(s"[scale] containment pairs x$n = $ct")
      // ed-join: the Levenshtein verify must track candidate volume
      // (replica-cross copies are ed=0 pairs, so output grows ~K² for
      // duplicated content) — the DP never runs outside the block
      val ed = time(s"edit_distance x$n")(
        Dedup.editDistancePairs(docs, "doc_id", "text", shingleN = 3,
          blockJaccard = 0.3, maxEdits = 6).count())
      println(s"[scale] edit pairs x$n = $ed")
      // corpus-linear diagnostics: cost must scale ~n (no pair terms at all)
      time(s"dup_ngram_frac x$n")(
        Dedup.dupNgramFraction(docs, "doc_id", "text", 4).count())
      time(s"boilerplate x$n")(
        graft.operators.TextAnalysis.removeBoilerplate(docs).count())
      time(s"mask_spans x$n")(
        Dedup.maskDuplicatedSpans(docs, "doc_id", "text", 8).count())
      // incremental ingest: a FIXED-size incoming shard probed against
      // the n× standing index — cost must track one index scan plus
      // shard-proportional candidates, never index×index pairs (the
      // full-re-dedup alternative is the minhash_lsh x$n line above)
      val shard = base.select(
        (col("doc_id") + lit(50000000L)).as("doc_id"), col("text"))
      val ic = time(s"incremental_dedup shard-vs-x$n")(
        Dedup.incrementalNearDups(docs, shard, "doc_id", "text",
          2, 128, 32, 0.5).count())
      println(s"[scale] incremental pairs shard-vs-x$n = $ic")
      docs.unpersist()
    }

    // ANN paths over a Kx embedding corpus: queries stay fixed (10), the
    // corpus grows — brute force must grow linearly, the bucketed paths
    // with corpus-side bucketing only (no pair blowup: top-k output is
    // fixed at |Q|·k regardless of corpus size)
    val embBase = Tables.load(spark, sf, "embeddings").select("vec_id", "embedding")
    def embReplicated(n: Int): DataFrame =
      (0 until n).map(i => embBase.select(
        (col("vec_id") + lit(i * offset)).as("vec_id"), col("embedding")))
        .reduce(_ unionAll _)
    import graft.operators.Similarity
    for (n <- Seq(1, k)) {
      val emb = embReplicated(n).persist()
      println(s"[scale] embeddings x$n = ${emb.count()} vecs")
      if (n == 1) { Similarity.lshTopK(emb, "vec_id", "embedding",
        col("vec_id") < 10, 5, 64, 6).count() }
      time(s"ann_brute x$n")(Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", col("vec_id") < 10, 5).count())
      time(s"ann_lsh x$n")(Similarity.lshTopK(
        emb, "vec_id", "embedding", col("vec_id") < 10, 5, 64, 6).count())
      time(s"ann_ivf x$n")(Similarity.ivfTopK(
        emb, "vec_id", "embedding", col("vec_id") < 10, 5, 16, 3).count())
      // SemDedup's honest scale story: cluster count grows WITH the
      // corpus (cells stay constant-sized, so the intra-cell pair join
      // stays corpus-linear) — fixed nCentroids at 10× would square the
      // within-cell comparisons instead
      time(s"semdedup x$n (centroids=${16 * n})")(Similarity.semDedup(
        emb, "vec_id", "embedding", nCentroids = 16 * n, threshold = 0.4).count())
      emb.unpersist()
    }
    spark.stop()
  }
}
