package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph computation as repeated co-partitioned joins: weighted
  * PageRank by power iteration (Brin & Page 1998) over an edge DataFrame.
  *
  * This is the engine's iterative-dataflow operator class — the same loop
  * shape serves label propagation and connected components (see
  * [[Dedup.duplicateClusters]] for the union-find variant).
  *
  * Scale notes (100 TB edge lists):
  *   - the transition matrix (edge weights normalized per source) is built
  *     once and persisted; every iteration reuses the same partitioning of
  *     the edge frame, so iteration cost is one shuffle of the rank vector
  *     (|V| rows, not |E|) onto the edge partitioning plus one aggregation
  *     by destination;
  *   - lineage is truncated with localCheckpoint every few iterations —
  *     without it the plan doubles per iteration and the optimizer, not the
  *     cluster, becomes the bottleneck;
  *   - dangling mass (sources with no out-edges) is dropped, matching the
  *     unrolled relational formulation the oracle replays; the teleport
  *     term keeps ranks strictly positive.
  */
object PageRank {

  /** @param edges (src, dst, weight>0) multi-edges allowed (summed)
    * @param nodes single-column frame naming every vertex (defines N and
    *              guarantees rank rows for sink-only vertices)
    */
  def run(
      edges: DataFrame,
      nodes: DataFrame,
      iterations: Int = 3,
      damping: Double = 0.85,
      checkpointEvery: Int = 4): DataFrame = {
    val (ranks, cleanup) = runWithCleanup(edges, nodes, iterations, damping, checkpointEvery)
    // eager localCheckpoint materializes the final ranks (n rows — tiny
    // next to the cached edge frames), so the caches can be released
    // immediately instead of leaking one persisted pair per call; callers
    // wanting lazy lineage use runWithCleanup directly
    val out = ranks.localCheckpoint(true)
    cleanup()
    out
  }

  /** [[run]] plus the unpersist handle for the vertex and transition frames
    * it pins (the [[Sequences.rfmSegmentsWithCleanup]] convention): call
    * the handle after the result is consumed — the returned rank frame
    * still reads both cached frames lazily, so unpersisting earlier would
    * silently recompute the edge normalization per downstream action. */
  def runWithCleanup(
      edges: DataFrame,
      nodes: DataFrame,
      iterations: Int = 3,
      damping: Double = 0.85,
      checkpointEvery: Int = 4): (DataFrame, () => Unit) = {
    require(iterations >= 0, "iterations must be >= 0")
    val spark = edges.sparkSession
    val nodeCol = nodes.columns.head
    val v = nodes.select(col(nodeCol).as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = v.count()
    require(n > 0, "empty vertex set")

    val Seq(srcC, dstC, wC) = edges.columns.take(3).toSeq
    // non-positive/null/NaN weights would make a source's normalizer zero
    // or NaN and poison every rank downstream of it — drop them here
    // (NaN needs its own test: Spark orders NaN above every number, so
    // `NaN > 0` is TRUE and the comparison alone doesn't exclude it)
    val byEdge = edges
      .filter(col(wC).cast("double") > 0 && !isnan(col(wC).cast("double")))
      .groupBy(col(srcC).as("src"), col(dstC).as("dst"))
      .agg(sum(col(wC).cast("double")).as("w"))
    val outW = byEdge.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    // row-stochastic transition frame, persisted across iterations
    val p = byEdge.join(outW, "src")
      .select(col("src"), col("dst"), (col("w") / col("wsum")).as("p"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    p.count() // materialize once so iterations don't re-shuffle the build

    val teleport = (1.0 - damping) / n
    var ranks = v.select(col("node"), lit(1.0 / n).as("rank"))
    for (i <- 1 to iterations) {
      val contrib = p.join(ranks, p("src") === ranks("node"))
        .groupBy(col("dst"))
        .agg(sum(col("rank") * col("p")).as("inflow"))
      ranks = v.join(contrib, v("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(teleport) + lit(damping) * coalesce(col("inflow"), lit(0.0)))
            .as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint(true)
    }
    (ranks, () => { v.unpersist(); p.unpersist(); () })
  }
}
