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

  test("tag-window reads: drift between windows == one-shot PSI over the batches; a missing tag fails loud") {
    val idx = tmpDir() + "/calw"
    CalibrationIndex.append(spark, b1.toDF("id", "p", "y"), idx,
      "p", "y", batchTag = Some("w1"))
    CalibrationIndex.append(spark, b2.toDF("id", "p", "y"), idx,
      "p", "y", batchTag = Some("w2"))
    val fromStore = CalibrationIndex.drift(spark, idx,
      Seq("w1"), Seq("w2")).collect().head.toSeq
    val oneShot = Classifier.scoreDrift(b1.toDF("id", "p", "y"),
      b2.toDF("id", "p", "y"), "p").collect().head.toSeq
    assert(fromStore == oneShot,
      s"store-window drift diverged: $fromStore vs $oneShot")
    // the composite dashboard read returns every metric, long-format,
    // each equal to its individually-derived value over the windows
    val report = CalibrationIndex.monitorReport(spark, idx,
        Seq("w1"), Seq("w2"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    val d1 = b1.toDF("id", "p", "y"); val d2 = b2.toDF("id", "p", "y")
    def v(df: org.apache.spark.sql.DataFrame, c: String): Any = {
      val r = df.select(c).collect().head
      if (r.isNullAt(0)) null else r.getDouble(0)
    }
    assert(report == Map(
      "auc_ref" -> v(Classifier.rocAuc(d1, "p", "y"), "auc"),
      "auc_cur" -> v(Classifier.rocAuc(d2, "p", "y"), "auc"),
      "ece_cur" -> v(Classifier.calibrationError(d2, "p", "y"), "ece"),
      "brier_cur" -> v(Classifier.brierScore(d2, "p", "y"), "brier"),
      "psi" -> v(Classifier.scoreDrift(d1, d2, "p"), "psi"),
      "ks" -> v(Classifier.scoreDriftKs(d1, d2, "p"), "ks")),
      s"monitor report diverged: $report")
    // the KS statistic derives from the same windows
    assert(CalibrationIndex.driftKs(spark, idx, Seq("w1"), Seq("w2"))
        .collect().head.toSeq ==
      Classifier.scoreDriftKs(b1.toDF("id", "p", "y"),
        b2.toDF("id", "p", "y"), "p").collect().head.toSeq,
      "store-window KS diverged from the one-shot")
    // a misspelled / never-landed tag must not read as an empty-but-
    // valid window
    val e = intercept[IllegalArgumentException] {
      CalibrationIndex.drift(spark, idx, Seq("w1"), Seq("nope"))
    }
    assert(e.getMessage.contains("no landed batch"), e.getMessage)
    // whole-store reliability / operating-point reads fold to the
    // one-shot metric over the concatenated batches
    val both = (b1 ++ b2).toDF("id", "p", "y")
    assert(CalibrationIndex.reliability(spark, idx).orderBy("bin")
      .collect().map(_.toSeq).toSeq ==
      Classifier.reliability(both, "p", "y").orderBy("bin")
        .collect().map(_.toSeq).toSeq)
    assert(CalibrationIndex.bestThreshold(spark, idx)
      .collect().map(_.toSeq).toSeq ==
      Classifier.bestThreshold(both, "p", "y")
        .collect().map(_.toSeq).toSeq)
  }

  test("grouped store: per-source reads fold to the one-shot grouped metrics; window drift per source; compactBy changes nothing") {
    val idx = tmpDir() + "/calg"
    val g1 = Seq((1L, "a", 0.91, 1.0), (2L, "b", 0.34, 0.0),
      (3L, "a", 0.91, 1.0))
    val g2 = Seq((4L, "b", 0.34, 1.0), (5L, "a", 0.77, 0.0),
      (6L, "b", 0.91, 0.0))
    CalibrationIndex.appendBy(spark, g1.toDF("id", "g", "p", "y"), idx,
      "g", "p", "y", batchTag = Some("w1"))
    CalibrationIndex.appendBy(spark, g2.toDF("id", "g", "p", "y"), idx,
      "g", "p", "y", batchTag = Some("w2"))
    val both = (g1 ++ g2).toDF("id", "g", "p", "y")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).toSeq
    def checkAll(): Unit = {
      assert(rows(CalibrationIndex.prCurveBy(spark, idx, "g")) ==
        rows(Classifier.prCurveBy(both, "g", "p", "y")),
        "grouped store curve diverged from the one-shot")
      assert(rows(CalibrationIndex.rocAucBy(spark, idx, "g")) ==
        rows(Classifier.rocAucBy(both, "g", "p", "y")),
        "grouped store AUC diverged")
      assert(rows(CalibrationIndex.eceBy(spark, idx, "g")) ==
        rows(Classifier.calibrationErrorBy(both, "g", "p", "y")),
        "grouped store ECE diverged")
      assert(rows(CalibrationIndex.brierBy(spark, idx, "g")) ==
        rows(Classifier.brierScoreBy(both, "g", "p", "y")),
        "grouped store Brier diverged")
      assert(rows(CalibrationIndex.reliabilityBy(spark, idx, "g")) ==
        rows(Classifier.reliabilityBy(both, "g", "p", "y")),
        "grouped store reliability diverged")
      assert(rows(CalibrationIndex.bestThresholdBy(spark, idx, "g")) ==
        rows(Classifier.bestThresholdBy(both, "g", "p", "y")),
        "grouped store operating points diverged")
    }
    checkAll()
    // the two window tags drift per source, equal to the one-shot
    assert(rows(CalibrationIndex.driftBy(spark, idx, "g",
        Seq("w1"), Seq("w2"))) ==
      rows(Classifier.scoreDriftBy(g1.toDF("id", "g", "p", "y"),
        g2.toDF("id", "g", "p", "y"), "g", "p")),
      "grouped window drift diverged from the one-shot")
    assert(rows(CalibrationIndex.driftKsBy(spark, idx, "g",
        Seq("w1"), Seq("w2"))) ==
      rows(Classifier.scoreDriftKsBy(g1.toDF("id", "g", "p", "y"),
        g2.toDF("id", "g", "p", "y"), "g", "p")),
      "grouped window KS diverged from the one-shot")
    // the per-source dashboard: one row per (group, metric), each
    // equal to its individually-derived grouped value
    val d1 = g1.toDF("id", "g", "p", "y")
    val d2 = g2.toDF("id", "g", "p", "y")
    def metricMap(df: org.apache.spark.sql.DataFrame, v: String,
                  name: String) =
      df.collect().map(r => (r.getString(0), name) ->
        (if (r.isNullAt(r.fieldIndex(v))) null
         else r.getAs[Any](v))).toMap
    val report = CalibrationIndex.monitorReportBy(spark, idx, "g",
        Seq("w1"), Seq("w2"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    val expected =
      metricMap(Classifier.rocAucBy(d1, "g", "p", "y"), "auc", "auc_ref") ++
      metricMap(Classifier.rocAucBy(d2, "g", "p", "y"), "auc", "auc_cur") ++
      metricMap(Classifier.calibrationErrorBy(d2, "g", "p", "y"), "ece",
        "ece_cur") ++
      metricMap(Classifier.brierScoreBy(d2, "g", "p", "y"), "brier",
        "brier_cur") ++
      metricMap(Classifier.scoreDriftBy(d1, d2, "g", "p"), "psi", "psi") ++
      metricMap(Classifier.scoreDriftKsBy(d1, d2, "g", "p"), "ks", "ks")
    assert(report == expected,
      s"grouped monitor report diverged: $report vs $expected")
    // a wrong group column name is loud, not a schema surprise
    val e = intercept[IllegalArgumentException] {
      CalibrationIndex.prCurveBy(spark, idx, "source")
    }
    assert(e.getMessage.contains("no group column"), e.getMessage)
    // ... and so is a never-landed window tag on the grouped reads
    val e2 = intercept[IllegalArgumentException] {
      CalibrationIndex.driftKsBy(spark, idx, "g", Seq("w1"), Seq("nope"))
    }
    assert(e2.getMessage.contains("no landed batch"), e2.getMessage)
    // compact folds to one row per (group, thr); every answer holds
    CalibrationIndex.compactBy(spark, idx, "g")
    checkAll()
    assert(CalibrationIndex.currentAggregateBy(spark, idx, "g")
      .count() ==
      Classifier.scoreAggregateBy(both, "g", "p", "y").count(),
      "compactBy must fold to one row per (group, thr)")
  }

  test("default content tags are id-bearing: two distinct batches sharing a score/label aggregate ACCRETE, not overwrite") {
    val idx = tmpDir() + "/cali"
    // identical (p, y) multisets, different ids — before the id-bearing
    // tag these collapsed to one partition and the store undercounted
    CalibrationIndex.append(spark, b1.toDF("id", "p", "y"), idx, "p", "y")
    CalibrationIndex.append(spark,
      b1.map { case (i, p, y) => (i + 100L, p, y) }.toDF("id", "p", "y"),
      idx, "p", "y")
    val oneShot = Classifier.prCurve(
      (b1 ++ b1.map { case (i, p, y) => (i + 100L, p, y) })
        .toDF("id", "p", "y"), "p", "y")
      .orderBy("thr").collect().map(_.toSeq).toSeq
    assert(curveOf(idx) == oneShot,
      "distinct id-bearing batches with equal aggregates must accrete")
  }

  test("appendBy is loud on a group column above the cardinality budget") {
    val idx = tmpDir() + "/calbud"
    val wide = spark.range(CalibrationIndex.maxGroups + 1)
      .select(concat(lit("url_"), col("id")).as("g"),
        lit(0.5).as("p"), lit(1.0).as("y"))
    val e = intercept[IllegalArgumentException] {
      CalibrationIndex.appendBy(spark, wide, idx, "g", "p", "y",
        batchTag = Some("b1"))
    }
    assert(e.getMessage.contains("group cardinality"), e.getMessage)
    // nothing landed — the guard fires before the write
    assert(!new java.io.File(s"$idx/scoreaggby").exists(),
      "a rejected batch must not create the store")
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
