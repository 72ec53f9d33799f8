package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.run.Ledger

/** Checkpoint-resume semantics of the per-stage lineage ledger (north
  * rule: runs resumable from checkpoint with per-partition lineage +
  * metrics). A crashed run leaves done stages marked and the failed
  * stage unmarked; the re-run skips the former and recomputes only the
  * latter, and the ledger's metrics rows carry the lineage.
  */
class LedgerSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-ledger-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("completed stages are skipped on resume; a failed stage re-runs") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ledger").toString
    var aRuns = 0
    var bRuns = 0

    def stageA(l: Ledger): String = l.stage("a") { out =>
      aRuns += 1
      spark.range(10).toDF("v").write.mode("overwrite").parquet(out)
      (10L, 10L)
    }
    def stageB(l: Ledger, fail: Boolean): String = l.stage("b") { out =>
      bRuns += 1
      if (fail) throw new RuntimeException("simulated crash")
      spark.range(5).toDF("v").write.mode("overwrite").parquet(out)
      (10L, 5L)
    }

    // run 1: stage a completes, stage b crashes mid-run
    val l1 = new Ledger(spark, base, inputVersion = "v1")
    stageA(l1)
    intercept[RuntimeException] { stageB(l1, fail = true) }
    assert(aRuns == 1 && bRuns == 1)
    assert(l1.doneStages() == Set("a"))

    // run 2 (resume): a is skipped, b recomputes and completes
    val l2 = new Ledger(spark, base, inputVersion = "v1")
    val aPath = stageA(l2)
    val bPath = stageB(l2, fail = false)
    assert(aRuns == 1, "completed stage must not recompute on resume")
    assert(bRuns == 2, "failed stage must recompute on resume")
    assert(l2.doneStages() == Set("a", "b"))
    assert(spark.read.parquet(aPath).count() == 10)
    assert(spark.read.parquet(bPath).count() == 5)

    // run 3: everything done — full skip
    val l3 = new Ledger(spark, base, inputVersion = "v1")
    stageA(l3); stageB(l3, fail = false)
    assert(aRuns == 1 && bRuns == 2)

    // a NEW input version invalidates the resume state (lineage is
    // versioned): both stages recompute
    val l4 = new Ledger(spark, base, inputVersion = "v2")
    stageA(l4); stageB(l4, fail = false)
    assert(aRuns == 2 && bRuns == 3)

    // metrics/lineage rows: one done row per (stage, version) with wall
    // time and row counts recorded
    val rows = spark.read.parquet(s"$base/_ledger")
      .as[graft.schema.LedgerRow].collect()
    assert(rows.count(r => r.stage == "a" && r.inputVersion == "v1") == 1)
    assert(rows.count(r => r.stage == "b" && r.inputVersion == "v2") == 1)
    assert(rows.forall(r => r.state == "done" && r.wallMs >= 0))
    val b1 = rows.find(r => r.stage == "b" && r.inputVersion == "v1").get
    assert(b1.rowsIn == 10L && b1.rowsOut == 5L)
  }

  test("PipelineMain kill-resume: a run crashed mid-pipeline resumes to " +
      "outputs content-identical to an uninterrupted run") {
    import graft.run.{PipelineMain, ResumeBench}
    val out = java.nio.file.Files.createTempDirectory("graft_killresume").toString
    PipelineMain.run(spark, 15, s"$out/fresh", 16, resume = false)
    intercept[PipelineMain.SimulatedCrash] {
      PipelineMain.run(spark, 15, s"$out/killed", 16, resume = false,
        abortAfter = Some("series_points"))
    }
    PipelineMain.run(spark, 15, s"$out/killed", 16, resume = true)
    for (stage <- Seq("series_points", "profiles", "discovery"))
      assert(ResumeBench.contentHash(spark, s"$out/fresh/$stage") ==
        ResumeBench.contentHash(spark, s"$out/killed/$stage"),
        s"stage $stage differs after resume")
  }
}
