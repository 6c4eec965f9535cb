package graft

import org.apache.spark.sql.functions._
import graft.ops.{CalibrationIndex, Classifier}

/** The persisted calibration store's durability drills: crash-window
  * healing around compact, content-tag replay idempotency — the
  * store-discipline pins StreamingSpec's metric-equality drills
  * assume. */
class CalibrationIndexSpec extends SparkSpec {
  import spark.implicits._

  private val b1 = Seq((1L, 0.91, 1.0), (2L, 0.34, 0.0), (3L, 0.91, 1.0))
  private val b2 = Seq((4L, 0.34, 1.0), (5L, 0.77, 0.0), (6L, 0.91, 0.0))

  private def curveOf(idx: String) =
    CalibrationIndex.prCurve(spark, idx)
      .orderBy("thr").collect().map(_.toSeq).toSeq

  test("crash mid-compact heals: the scoreagg table renamed aside is restored; metrics unchanged") {
    val idx = tmpDir() + "/calx"
    CalibrationIndex.append(spark, b1.toDF("id", "p", "y"), idx,
      "p", "y", batchTag = Some("b1"))
    CalibrationIndex.append(spark, b2.toDF("id", "p", "y"), idx,
      "p", "y", batchTag = Some("b2"))
    val before = curveOf(idx)
    // simulate swapInPlace dying right after moving the live table
    // aside (no commit of the staged replacement)
    val live = new java.io.File(s"$idx/scoreagg")
    val aside = new java.io.File(s"$idx/.scoreagg.swap_old")
    assert(live.renameTo(aside), "test setup: could not stage the crash")
    CalibrationIndex.compact(spark, idx)
    assert(live.exists() && !aside.exists(),
      "recoverSwap must restore scoreagg before compacting")
    assert(curveOf(idx) == before,
      "the curve must survive the crash + heal + compact")
    // the healed, compacted store still accretes
    CalibrationIndex.append(spark,
      Seq((9L, 0.77, 1.0)).toDF("id", "p", "y"), idx, "p", "y",
      batchTag = Some("b3"))
    val oneShot = Classifier.prCurve(
      (b1 ++ b2 ++ Seq((9L, 0.77, 1.0))).toDF("id", "p", "y"), "p", "y")
      .orderBy("thr").collect().map(_.toSeq).toSeq
    assert(curveOf(idx) == oneShot,
      "post-heal append must fold with compacted history")
  }

  test("content-tag appends (no explicit batchTag) are replay-idempotent") {
    val idx = tmpDir() + "/calc"
    val batch = b1.toDF("id", "p", "y")
    CalibrationIndex.append(spark, batch, idx, "p", "y")
    val once = curveOf(idx)
    // an at-least-once redelivery of the SAME batch derives the same
    // content tag and overwrites its own partition — counts unchanged
    CalibrationIndex.append(spark, batch, idx, "p", "y")
    assert(curveOf(idx) == once,
      "a content-tagged replay must not double-count")
    // a DIFFERENT batch accretes normally
    CalibrationIndex.append(spark, b2.toDF("id", "p", "y"), idx, "p", "y")
    val oneShot = Classifier.prCurve((b1 ++ b2).toDF("id", "p", "y"),
      "p", "y").orderBy("thr").collect().map(_.toSeq).toSeq
    assert(curveOf(idx) == oneShot)
  }

  test("an all-null batch writes nothing; the store stays readable") {
    val idx = tmpDir() + "/caln"
    CalibrationIndex.append(spark, b1.toDF("id", "p", "y"), idx, "p", "y",
      batchTag = Some("b1"))
    val before = curveOf(idx)
    CalibrationIndex.append(spark,
      Seq((7L, Option.empty[Double], Option.empty[Double]))
        .toDF("id", "p", "y"), idx, "p", "y", batchTag = Some("b2"))
    assert(curveOf(idx) == before, "an empty aggregate must be a no-op")
  }
}
