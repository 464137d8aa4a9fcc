package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: one COMPACT JSON line on stdout (the driver
  * contract — `queries` carries only the 30 headline medians, because
  * the driver's scrape window truncated the full sweep map two rounds
  * running: BENCH_r04 a cut-off `tail`, BENCH_r05 `parsed: null`) and
  * the full record — same fields plus the per-gate `sweep` map —
  * written to `SPARK_GRAFT_BENCH_OUT` (default `target/bench_last.json`).
  *
  * Two tiers (round-4 verdict #8): a FULL SWEEP (every gate, single
  * timed run — coverage, not precision) and a HEADLINE subset (the 30
  * heaviest gates of this sweep, re-run 3× and reported as per-gate
  * medians) — round-over-round comparisons should read `headline`,
  * where ×3 medians suppress the host variance that drowns 150
  * sub-second one-shot lines.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the sql_* gates resolve graft table functions (round 10)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warmup pass: run the WHOLE matrix at the smallest
    // available SF first. A gate's plan is identical at every SF, so its
    // generated code is identical too — the warmup pays janino
    // compilation (Spark's generated-class cache is keyed by source) and
    // C2 JIT of every kernel, and the timed loop below measures the
    // query, not the compiler. Falls back to a minimal warmup when no
    // smaller SF directory exists.
    val warmDir = Seq("/root/testdata/sf0.001")
      .find(d => new java.io.File(d).isDirectory && d != sfDir)
    warmDir match {
      case Some(wd) =>
        SparkEntry.queries.foreach { case (_, fn) =>
          try fn(spark, wd).count() catch { case _: Throwable => }
        }
      case None =>
        try SparkEntry.queries.get("scan_project").foreach(_(spark, sfDir).count())
        catch { case _: Throwable => }
    }
    // drop every block the warmup persisted: the timed loop must
    // recompute ALL data (what the warmup bought is compiled code and
    // JIT profiles, never cached results). Measured (round 4): warming
    // the heavy gates at the bench SF itself bought nothing further —
    // their remaining seconds are genuine computation, not compilation.
    spark.catalog.clearCache()

    def timeGate(name: String,
                 fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH ERROR $name: ${e.getClass.getName}: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      if (ok) sec else -sec // negative seconds = error marker
    }

    // ---- contention canary (round 8 — VERDICT r7 item 6) -------------
    // A fixed trivial gate timed 3× BEFORE the sweep and 3× AFTER the
    // headline loop: its work is constant, so a shift between the two
    // medians measures the HOST, not the code — r7's driver run needed
    // manual adjudication against a quiet-host rerun (pagerank 4.71 s
    // contended vs 1.63 s quiet, same binaries). `contended` self-
    // qualifies round-over-round deltas without that manual step.
    val canaryName = "scan_project"
    // a FAILING run is -1.0 (unavailable), never abs()'d into the median
    // (round 9 — ADVICE r8: a transient error in one phase would
    // otherwise yield a bogus median and could flip `contended` either
    // way, and the failure never reached `errors`)
    def canaryMedian(): Double =
      SparkEntry.queries.get(canaryName) match {
        case Some(fn) =>
          val ts = (1 to 3).map { _ =>
            spark.catalog.clearCache(); timeGate(canaryName, fn)
          }
          if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(1)
        case None => -1.0
      }
    // both canary phases must measure WARM-cache state: the sweep has
    // read everything by the `after` phase, so the `before` phase pays
    // one untimed scan at the bench SF first (round 9 — ADVICE r8: cold
    // page-cache I/O on a slow disk could shift before/after toward the
    // 1.5× contention threshold without any real external load)
    SparkEntry.queries.get(canaryName).foreach { fn =>
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    val canaryBefore = canaryMedian()

    // ---- interleaved canaries (round 11 — VERDICT r10 item 7) --------
    // BENCH_r10's host drifted 0.173→0.224 MID-sweep: gates caught in
    // the drift read 2-3× their quiet cost while a mean-of-two-endpoints
    // canary could not localize it and `contended` stayed false. A
    // single canary run now lands every 16 sweep gates / every 4
    // headline gates (~0.3 s each — noise against a 250+ s sweep), each
    // gate records the canary SEGMENT it ran under (`sweep_canary` in
    // the file record, `headline_canary` on stdout), and `contended`
    // trips on >1.2× before/after drift OR >1.5× spread across ALL
    // canary points — one noisy segment can no longer hide.
    val canaryLog = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    if (canaryBefore > 0) canaryLog += ("before" -> canaryBefore)
    var segCanary = canaryBefore
    def canaryPoint(label: String): Unit =
      SparkEntry.queries.get(canaryName).foreach { fn =>
        spark.catalog.clearCache()
        // min of two runs: the canary is fixed work, so the MIN is the
        // least-noise estimate of host capability at this instant — a
        // single ~0.15 s sample flips on one GC pause (ADVICE r11),
        // while real contention inflates both runs
        val t = Seq(timeGate(canaryName, fn), timeGate(canaryName, fn))
          .filter(_ > 0) match {
            case Nil => -1.0
            case ts  => ts.min
          }
        if (t > 0) { canaryLog += (label -> t); segCanary = t }
      }

    // ---- tier 1: full sweep, every gate once -------------------------
    val sweepCanary = scala.collection.mutable.LinkedHashMap[String, Double]()
    val results = SparkEntry.queries.zipWithIndex.map { case ((name, fn), i) =>
      if (i > 0 && i % 16 == 0) canaryPoint(s"sweep:$i")
      sweepCanary(name) = segCanary
      name -> timeGate(name, fn)
    }

    // ---- tier 2: headline = 30 heaviest, ×3, medians -----------------
    // selected from THIS sweep (self-maintaining as the matrix grows);
    // caches cleared per iteration so every run recomputes its data
    val headlineNames = results.toSeq.filter(_._2 > 0).sortBy(-_._2)
      .take(30).map(_._1)
    val headlineCanary = scala.collection.mutable.LinkedHashMap[String, Double]()
    val headline = headlineNames.zipWithIndex.map { case (name, i) =>
      if (i > 0 && i % 4 == 0) canaryPoint(s"headline:$i")
      headlineCanary(name) = segCanary
      val fn = SparkEntry.queries(name)
      val ts = (1 to 3).map { _ => spark.catalog.clearCache(); timeGate(name, fn) }
      val median =
        if (ts.exists(_ < 0)) -ts.map(math.abs).sorted.apply(1)
        else ts.sorted.apply(1)
      name -> median
    }

    val canaryAfter = canaryMedian()
    if (canaryAfter > 0) canaryLog += ("after" -> canaryAfter)
    // contended = host drift: >1.2× between the endpoint medians (the
    // r10 sweep drifted 30% and stayed under the old 1.5× bar), or
    // >1.5× spread across the interleaved points. The interleaved
    // points are SINGLE runs (~0.3 s — a 3× median at every point
    // would be real sweep time), so with enough of them the spread is
    // taken on a 1-high/1-low trimmed set: one GC/JIT hiccup in one
    // sample must not flip a quiet run to contended, while genuine
    // drift (many elevated points, as in r10) still trips it
    val canaryVals = canaryLog.map(_._2)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // the contended checks run on the INTERLEAVED points only — they
    // share one estimator (min-of-2); the endpoints are 3-run medians,
    // and mixing the two estimators inflates the spread on a quiet host
    val interVals = canaryLog.collect {
      case (l, v) if l != "before" && l != "after" => v
    }.toSeq
    val spreadVals =
      if (interVals.size >= 6) interVals.sorted.slice(1, interVals.size - 1)
      else interVals
    // drift = SUSTAINED host-speed change (r10's 0.173→0.224 class):
    // first-half median vs second-half median — endpoint samples alone
    // flip on one fast/slow outlier
    val halves =
      if (interVals.size >= 6) {
        val (a, b) = interVals.splitAt(interVals.size / 2)
        (median(a), median(b))
      } else (canaryBefore, canaryAfter)
    val contended = (halves._1 > 0 && halves._2 > 0 &&
      math.max(halves._1, halves._2) /
        math.max(1e-9, math.min(halves._1, halves._2)) > 1.2) ||
      (spreadVals.size >= 2 && spreadVals.max /
        math.max(1e-9, spreadVals.min) > 1.5)

    def jmap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def jpairs(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "[\"" + k + "\"," + v + "]" }
        .mkString("[", ",", "]")
    val errs = (results ++ headline).collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .toSeq.distinct.mkString("[", ",", "]")
    val total = results.map { case (_, v) => math.abs(v) }.sum
    val headlineTotal = headline.map { case (_, v) => math.abs(v) }.sum
    // canary-NORMALIZED totals (round 9 — VERDICT r8 item 5): the canary
    // is fixed work, so its median IS a host-speed unit — r8 vs the
    // quiet-host r7 rerun read a uniform 1.23× across 212 unchanged
    // gates, which a before/after drift check cannot see. Dividing the
    // totals by the mean canary makes round-over-round deltas computable
    // on a steadily-loaded host without a quiet rerun (PERF.md documents
    // the convention). -1.0 = canary unavailable, normalization skipped.
    // the host-speed unit is the MEDIAN over every canary point — the
    // endpoint mean undercounts when one endpoint lands a fast/slow
    // outlier (the r11 close run's 0.098 'before' vs a 0.14 field)
    // canary_unit keeps its r9/r10 semantics (endpoint mean of two
    // 3-run medians) so cross-round canary-normalized comparisons stay
    // apples-to-apples; the ROBUST unit — median over every interleaved
    // point (min-of-2 each) — rides alongside as canary_unit_robust
    // (the interleaved points use a different estimator, so the two
    // units are NOT interchangeable)
    val canaryUnit =
      if (canaryBefore > 0 && canaryAfter > 0)
        (canaryBefore + canaryAfter) / 2
      else -1.0
    val canaryUnitRobust =
      if (interVals.size >= 3) median(interVals) else canaryUnit
    val totalNorm = if (canaryUnit > 0) total / canaryUnit else -1.0
    val headlineNorm = if (canaryUnit > 0) headlineTotal / canaryUnit else -1.0
    // stdout gets a COMPACT line (round-5 verdict: the driver's scrape
    // window truncated the 193-entry sweep map, leaving BENCH_r05.json
    // with parsed:null) — `queries` on stdout carries only the 30
    // headline medians (~1.5 KB); the full sweep map lives in the file.
    val common = s""""value":$total,"unit":"sec"""" +
      s""","queries":${jmap(headline)},"headline_total":$headlineTotal""" +
      s""","sweep_gates":${results.size},"errors":$errs,"sf":"$sfDir"""" +
      s""","canary_before":$canaryBefore,"canary_after":$canaryAfter""" +
      s""","contended":$contended,"canary_unit":$canaryUnit""" +
      s""","canary_unit_robust":$canaryUnitRobust""" +
      s""","total_per_canary":$totalNorm,"headline_per_canary":$headlineNorm""" +
      s""","canaries":${jpairs(canaryLog)}""" +
      s""","headline_canary":${jmap(headlineCanary)}"""
    val stdoutJson = s"""{"metric":"total",$common}"""
    val fileJson = s"""{"metric":"total",$common,"sweep":${jmap(results)}""" +
      s""","sweep_canary":${jmap(sweepCanary)}}"""
    // file first (canonical; survives stdout truncation), then stdout
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_last.json")
    try {
      val p = java.nio.file.Paths.get(out)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (fileJson + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"BENCH WARN: could not write $out: ${e.getMessage}")
    }
    println(stdoutJson)
    spark.stop()
  }
}
