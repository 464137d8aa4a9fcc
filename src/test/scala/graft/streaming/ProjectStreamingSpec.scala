package graft.streaming

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.engine.{Engine, ProjectRunner}

/** Round-6 continuous-DAG soak: a full ProjectRunner model DAG
  * (CSV seed → projection model → aggregating dependent model →
  * schema.yml tests) executed through StreamingEngine activation
  * (impl.py:218 activation-state semantics), with the pipelines STOPPED
  * AND CHECKPOINT-RESTARTED between every stage while new data keeps
  * arriving upstream — then proven equal to the one-shot batch run of
  * the same project over the same final inputs.
  *
  * What each assertion pins:
  *   - restart-resume, not restart-replay: after stage-wise restarts the
  *     RAW (uncompacted) projection stream holds exactly one row per
  *     seed row — a checkpoint loss would double-process and fail here
  *     before the equality even runs;
  *   - aggregate state survives the stop: the update-mode GROUP BY
  *     resumes its state store across bounded runs, so counts keep
  *     growing instead of restarting from the post-stop data;
  *   - batch ≡ streaming at the DAG level: the same project, run once in
  *     batch over the final seed contents, matches both models row for
  *     row (PK compaction folds the update-mode re-emissions).
  * The harsher kill — sink side effect lands, offset does NOT commit,
  * replay absorbed by PK compaction — is pinned separately in
  * [[StatefulStreamingSpec]]; this spec composes the lifecycle across a
  * real multi-model DAG.
  */
class ProjectStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def writeProject(root: String, seedRows: Seq[(Long, Long)]): Unit = {
    Files.createDirectories(Paths.get(s"$root/seeds"))
    Files.createDirectories(Paths.get(s"$root/models"))
    Files.writeString(Paths.get(s"$root/seeds/ratings.csv"),
      "k,v\n" + seedRows.map { case (k, v) => s"$k,$v" }.mkString("\n") + "\n")
    // both models declared INACTIVE so the project build creates them
    // empty (stream + registered pipeline SQL) and only activation —
    // streaming here, the batch materializer in the twin — populates
    // them. The twin project omits the flag to materialize in batch.
    Files.writeString(Paths.get(s"$root/models/scaled.sql"),
      """{{ config(pipeline={'execution': {'active': false}}) }}
        |SELECT CAST(k AS BIGINT) AS k, CAST(v * 2 AS BIGINT) AS v2 FROM ratings""".stripMargin)
    Files.writeString(Paths.get(s"$root/models/totals.sql"),
      """{{ config(unique_key='bucket', pipeline={'execution': {'active': false}}) }}
        |SELECT k % 2 AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v2) AS BIGINT) AS s
        |FROM {{ ref('scaled') }} GROUP BY k % 2""".stripMargin)
    Files.writeString(Paths.get(s"$root/models/schema.yml"),
      """models:
        |  - name: scaled
        |    columns:
        |      - name: k
        |        tests: [not_null]
        |      - name: v2
        |        tests: [not_null]
        |  - name: totals
        |    columns:
        |      - name: bucket
        |        tests: [not_null]
        |""".stripMargin)
  }

  private def batchProject(root: String, seedRows: Seq[(Long, Long)]): Unit = {
    Files.createDirectories(Paths.get(s"$root/seeds"))
    Files.createDirectories(Paths.get(s"$root/models"))
    Files.writeString(Paths.get(s"$root/seeds/ratings.csv"),
      "k,v\n" + seedRows.map { case (k, v) => s"$k,$v" }.mkString("\n") + "\n")
    Files.writeString(Paths.get(s"$root/models/scaled.sql"),
      "SELECT CAST(k AS BIGINT) AS k, CAST(v * 2 AS BIGINT) AS v2 FROM ratings")
    Files.writeString(Paths.get(s"$root/models/totals.sql"),
      """{{ config(unique_key='bucket') }}
        |SELECT k % 2 AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v2) AS BIGINT) AS s
        |FROM {{ ref('scaled') }} GROUP BY k % 2""".stripMargin)
  }

  test("seed -> model -> dependent model -> test DAG: stage-wise restarts equal the batch run") {
    val wave1 = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
    val wave2 = Seq((5L, 50L), (6L, 60L))
    val wave3 = Seq((7L, 70L))

    // --- streaming side -------------------------------------------
    val proj = tmpDir("graft-proj-stream")
    writeProject(proj, wave1)
    val e = new Engine(spark, tmpDir("graft-proj-stream-root"))
    val runner = new ProjectRunner(e)
    val se = new StreamingEngine(e)

    val applied = runner.runProject(proj)
    assert(applied.keySet == Set("ratings", "scaled", "totals"), applied)
    // inactive models were created EMPTY — only activation populates
    assert(e.preview("SELECT * FROM scaled").isEmpty)

    // stage 1: projection catches up on the seed, then stops
    se.refreshAvailable("scaled")
    assert(e.preview("SELECT * FROM scaled").size == wave1.size)

    // new upstream data lands while the pipeline is DOWN
    e.appendRows("ratings", wave2.toDF("k", "v"))
    // stage 2: checkpoint restart — must process ONLY the delta
    se.refreshAvailable("scaled")
    val raw = e.readStream("scaled", compact = false)
    assert(raw.count() == wave1.size + wave2.size,
      "restart re-processed committed offsets (checkpoint resume broken)")

    // stage 3: the dependent aggregate catches up over scaled
    se.refreshAvailable("totals")
    val mid = e.preview("SELECT bucket, n, s FROM totals ORDER BY bucket")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(mid == Seq((0L, 3L, 240L), (1L, 3L, 180L)), mid)

    // another wave while BOTH pipelines are down; each restarts from
    // its checkpoint in turn — the aggregate's state store must resume
    // (a state reset would report counts of the delta only)
    e.appendRows("ratings", wave3.toDF("k", "v"))
    se.refreshAvailable("scaled")
    se.refreshAvailable("totals")

    // activation-state semantics on the catalog (impl.py:218): a live
    // activation flips active; deactivate flips it back
    val q = se.activate("totals")
    assert(se.isActive("totals"))
    assert(e.catalog.get("totals").exists(_.active))
    se.deactivate("totals")
    assert(!se.isActive("totals"))
    assert(e.catalog.get("totals").exists(!_.active))
    assert(!q.isActive)

    // schema.yml generic tests over the streamed materializations
    val tests = runner.runTests(s"$proj/models")
    assert(tests.size == 3)
    assert(tests.values.forall(_.failures == 0L), tests)

    // --- batch twin over the same final inputs --------------------
    val bproj = tmpDir("graft-proj-batch")
    batchProject(bproj, wave1 ++ wave2 ++ wave3)
    val be = new Engine(spark, tmpDir("graft-proj-batch-root"))
    new ProjectRunner(be).runProject(bproj)

    def snap(eng: Engine, sql: String): Seq[Seq[Any]] =
      eng.preview(sql).map(_.toSeq)
    assert(snap(e, "SELECT k, v2 FROM scaled ORDER BY k") ==
      snap(be, "SELECT k, v2 FROM scaled ORDER BY k"))
    assert(snap(e, "SELECT bucket, n, s FROM totals ORDER BY bucket") ==
      snap(be, "SELECT bucket, n, s FROM totals ORDER BY bucket"))
    val fin = e.preview("SELECT bucket, n, s FROM totals ORDER BY bucket")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fin == Seq((0L, 3L, 240L), (1L, 4L, 320L)), fin)
  }
}
