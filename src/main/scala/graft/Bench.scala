package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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
    // a failed query must NOT masquerade as a fast one: its entry is
    // negated (negative seconds = error marker) and listed in `errors`
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"BENCH ERROR $name: ${e.getClass.getName}: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.map(math.abs).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
