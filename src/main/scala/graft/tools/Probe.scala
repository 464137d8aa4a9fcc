package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only perf probe for operator plans (not part of the engine API). */
object Probe {
  /** `runMain graft.tools.Probe explain <sf> <query...>` → formatted plans;
    * `runMain graft.tools.Probe sql <statement>` → parse/eval a statement
    * under both string-literal modes. */
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("explain")) return explainMain(args.drop(1))
    if (args.headOption.contains("sql")) return sqlMain(args.drop(1).mkString(" "))
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import graft.operators.Dedup
    graft.functions.GraftFunctions.register(spark)
    val n = 2; val numHashes = 128; val bands = 32; val r = numHashes / bands
    val withHs = docs.select(col("doc_id").as("id"),
      array_distinct(transform(Dedup.shingles(col("text"), n), s => xxhash64(s))).as("hs"))
      .filter(size(col("hs")) > 0)
    val withMh = withHs.withColumn("mh",
      call_function("minhashes", col("hs"), lit(numHashes)))
    timed("minhash compute")(withMh.select(count(lit(1))).collect())
    val banded = withMh.select(col("id"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(mh, b * $r + 1, $r)))"))
        .as(Seq("band", "bkey")))
    timed("banded count")(println("banded=" + banded.count()))
    timed("bucket histogram")(
      banded.groupBy("band", "bkey").count().groupBy()
        .agg(max("count").as("max_bucket"), sum(col("count") * col("count")).as("sum_sq"))
        .show())
    val candidates = banded.as("a").join(banded.as("b"), Seq("band", "bkey"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    timed("candidate pairs raw")(println("cand=" + candidates.count()))
    timed("candidate pairs dedup")(println("cand distinct=" + candidates.dropDuplicates("id_a", "id_b").count()))
    spark.stop()
  }

  private def sqlMain(stmt: String): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("false", "true").foreach { mode =>
      spark.conf.set("spark.sql.parser.escapedStringLiterals", mode)
      val out = try spark.sql(stmt).collect().mkString("; ")
      catch { case e: Throwable => s"ERROR: ${e.getMessage.take(200)}" }
      println(s"[sqlprobe] escaped=$mode -> $out")
    }
    spark.stop()
  }

  private def explainMain(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSet
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Queries.all.filter(q => names.isEmpty || names(q.name)).foreach { q =>
      println(s"\n=================== ${q.name} ===================")
      q.fn(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
