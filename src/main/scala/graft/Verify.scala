package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // micros (not INT96) so DuckDB reads our result parquet losslessly
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      // the scale lints ride the optimizer (SinglePartitionWindowGuard)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // round 6: every gate runs with the single-partition-window guard
      // FAILING, not warning — a future gate that serializes its input
      // into one task breaks correctness here, before it ships
      .config(graft.plans.SinglePartitionWindowGuard.ModeKey,
        sys.env.getOrElse("SPARK_GRAFT_WINDOW_GUARD", "fail"))
      // ...and the cartesian-join guard (round 6 cont.): a non-equi join
      // between unbounded sides fails the run before it ships
      .config(graft.plans.CartesianJoinGuard.ModeKey,
        sys.env.getOrElse("SPARK_GRAFT_CARTESIAN_GUARD", "fail"))
      // ...and the quantizer-cell guard (round 7): a quantizer-family
      // operator whose cell count sits far below the √n-ideal (the
      // constant-cells Θ(n²/cells) regression class) fails the run
      .config(graft.plans.QuantizerCellGuard.ModeKey,
        sys.env.getOrElse("SPARK_GRAFT_QUANTIZER_GUARD", "fail"))
      // unused broadcast-exemption fingerprints FAIL at the audited small
      // scales (sf0.001–0.1, where every fingerprinted site is known to
      // exist) and stay warnings at 10×+ where the planner legitimately
      // drops broadcasts past their size threshold (round 10 — ADVICE r9)
      .config(graft.plans.BroadcastGenerateGuard.StrictUnusedKey,
        sys.env.getOrElse("SPARK_GRAFT_BCAST_STRICT",
          if (args(0).matches(""".*sf0\.(001|01|1)/?$""")) "fail" else "warn"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Lint liveness self-check: a conf typo or a dropped extensions line
    // would silently turn the machine check back into a review check, so
    // prove the guard actually throws in THIS session before trusting a
    // clean run — optimize (never execute) a deliberately unbounded
    // single-partition window over a real file scan.
    if (spark.conf.get(graft.plans.SinglePartitionWindowGuard.ModeKey) == "fail") {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.row_number
      val threw =
        try {
          spark.read.parquet(s"$sfDir/region.parquet")
            .withColumn("rn", row_number().over(Window.orderBy("r_regionkey")))
            .queryExecution.optimizedPlan
          false
        } catch { case _: IllegalStateException => true }
      require(threw, "SinglePartitionWindowGuard is configured to fail " +
        "but did not fire on a known-bad plan — the lint is inert")
    }
    if (spark.conf.get(graft.plans.CartesianJoinGuard.ModeKey) == "fail") {
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      val threw =
        try {
          r.as("a").join(r.as("b"),
            org.apache.spark.sql.functions.col("a.r_regionkey") <
              org.apache.spark.sql.functions.col("b.r_regionkey"))
            .queryExecution.optimizedPlan
          false
        } catch { case _: IllegalStateException => true }
      require(threw, "CartesianJoinGuard is configured to fail but did " +
        "not fire on a known-bad plan — the lint is inert")
    }
    if (spark.conf.get(graft.plans.QuantizerCellGuard.ModeKey) == "fail") {
      // liveness: drive a REAL entry point (not the guard object) with a
      // knowingly-degenerate explicit cell count — 4 cells on a claimed
      // 10M-row corpus (ideal ≈ 3163) must throw at resolve time,
      // before any quantizer work runs
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val threw =
        try {
          graft.operators.Similarity.semDedup(emb, "vec_id", "embedding",
            nCentroids = 4, knownCount = Some(10000000L))
          false
        } catch { case _: IllegalStateException => true }
      require(threw, "QuantizerCellGuard is configured to fail but did " +
        "not fire on a known-degenerate cell count — the lint is inert")
    }
    // Broadcast-over-Generate lint liveness (round 7): a tiny frame
    // exploded ×1000 joined to a real file scan MUST be flagged — the
    // explode-blind estimate makes it the broadcast build, which is
    // exactly the 12.9-GiB-at-sf1 class the guard exists to stop. The
    // lint itself runs on every gate in the loop below (fail mode: an
    // offending gate throws before its result is written, so check.py
    // reds it).
    {
      val tiny = spark.range(4)
        .selectExpr("id", "explode(sequence(0L, 999L)) AS k")
      val corpus = spark.read.parquet(s"$sfDir/orders.parquet")
        .selectExpr("o_orderkey", "o_orderkey % 1000 AS k")
      val bad = corpus.join(tiny, "k")
      require(graft.plans.BroadcastGenerateGuard.offenders(bad).nonEmpty,
        "BroadcastGenerateGuard did not flag a known-bad exploded " +
          "broadcast build — the lint is inert")
    }
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated gate filter for fast local iteration
    // (tools/check.py compares whatever oracle_sql.json lists, so the
    // dump below filters identically). Unset = the driver's full run.
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    def selected(name: String): Boolean = only.forall(_.contains(name))
    SparkEntry.queries.filter(kv => selected(kv._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        graft.plans.BroadcastGenerateGuard.check(name, df)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // a SPARK_GRAFT_ONLY run must MERGE into an existing oracle map, not
    // clobber it down to the filtered subset — otherwise one fast
    // single-gate iteration silently invalidates a full dump's compare
    // set (tools/check.py and correctness_json.py read this file)
    val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
    val existing: Map[String, String] =
      if (only.nonEmpty && Files.exists(oraclePath)) {
        try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(Files.readString(oraclePath))
          import scala.jdk.CollectionConverters._
          node.fields().asScala
            .map(e => e.getKey -> e.getValue.asText()).toMap
        } catch { case e: Throwable =>
          // LOUD (round 10 — ADVICE r9): a corrupted oracle file silently
          // reverting a filtered run to clobber semantics is exactly the
          // bug the merge exists to prevent — shout, then rebuild the
          // filtered subset only (the full-dump compare set is lost and
          // the operator must re-run an unfiltered Verify)
          System.err.println(s"[verify] WARNING: existing oracle_sql.json " +
            s"failed to parse (${e.getMessage}) — the filtered run will " +
            "write ONLY its own gates; re-run a full Verify to restore " +
            "the complete compare set")
          Map.empty
        }
      } else Map.empty
    // prune merged keys for gates since removed/renamed: a stale entry
    // would make check.py compare a key no current query dumps
    val json = (existing.filter(kv => SparkEntry.oracleSql.contains(kv._1))
        ++ SparkEntry.oracleSql.filter(kv => selected(kv._1)))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(oraclePath, json)
    spark.stop()
  }
}
