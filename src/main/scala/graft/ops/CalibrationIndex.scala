package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental CLASSIFIER-CALIBRATION store — the monitoring half of
  * the deploy loop: a quality filter is trained offline
  * ([[Classifier.fitLogistic]]), frozen into the streaming funnel
  * (`EventStream.curateSink(logit = ...)`), and then WATCHED — each
  * scored micro-batch lands its bounded per-score aggregate here, and
  * the PR curve / ROC AUC of the deployed filter derive on read from
  * the accumulated store, so calibration drift is visible without
  * ever re-scanning a byte of the corpus.
  *
  * Store discipline (structurally [[DigestIndex]]): one table
  * `scoreagg/`, rows `(batch_tag, thr, n, pos)` — each batch appends
  * its [[Classifier.scoreAggregate]], at most 10^scale + 1 rows
  * (score ∈ [0,1], loudly guarded). The accumulated state is a pure
  * ADDITIVE monoid — component-wise sums per `thr` — so batch order
  * is irrelevant, duplicate-tag rows only ever double counts (and the
  * tag discipline prevents that), and [[compact]] can fold history to
  * one row per score without changing any answer. No per-batch probe
  * exists (metrics always need the WHOLE folded aggregate), so there
  * are no bucket directories: reads scan the store — which is
  * batches × curve points, never corpus-sized.
  *
  * Replay safety: batches land in tag-scoped partitions via dynamic
  * overwrite, so an at-least-once retry overwrites exactly its own
  * partition — same `(appId-batchId)` scheme as every other sink. */
object CalibrationIndex {

  private def aggPath(p: String) = p + "/scoreagg"

  /** Append one batch's per-score aggregate. An empty (or all-null)
    * batch writes nothing — never a schema-less directory. */
  def append(spark: SparkSession, batch: DataFrame, indexPath: String,
             score: String, label: String, scale: Int = 6,
             batchTag: Option[String] = None): Unit = {
    val summary = Classifier
      .scoreAggregate(batch, score, label, scale)
      .localCheckpoint(true) // bounded rows; score once, write once
    if (summary.isEmpty) return
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layout.healTable(fs, new Path(aggPath(indexPath)))
    val tag = batchTag.getOrElse(
      Layout.contentTag(summary, Seq("thr", "n", "pos")))
    summary
      .select(lit(tag).as("batch_tag"), col("thr"), col("n"), col("pos"))
      .repartition(1) // one file per batch — the aggregate is tiny
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_tag").parquet(aggPath(indexPath))
  }

  /** The accumulated `(thr, n, pos)` aggregate with the monoid fold
    * applied — the store's canonical export. */
  def currentAggregate(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(aggPath(indexPath))
      .groupBy(col("thr"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))

  /** PR curve of everything scored so far — identical to
    * [[Classifier.prCurve]] over the concatenated batches
    * (StreamingSpec pins it). */
  def prCurve(spark: SparkSession, indexPath: String): DataFrame =
    Classifier.prCurveFromAggregate(
      spark.read.parquet(aggPath(indexPath))
        .select("thr", "n", "pos"))

  /** ROC AUC of everything scored so far — identical to
    * [[Classifier.rocAuc]] over the concatenated batches. */
  def rocAuc(spark: SparkSession, indexPath: String): DataFrame =
    Classifier.rocAucFromAggregate(
      spark.read.parquet(aggPath(indexPath))
        .select("thr", "n", "pos"))

  /** Expected calibration error of everything scored so far —
    * identical to [[Classifier.calibrationError]] over the
    * concatenated batches (the all-integer fold). */
  def ece(spark: SparkSession, indexPath: String,
          bins: Int = 10): DataFrame =
    Classifier.eceFromAggregate(
      spark.read.parquet(aggPath(indexPath))
        .select("thr", "n", "pos"), bins)

  /** Brier score of everything scored so far — identical to
    * [[Classifier.brierScore]] over the concatenated batches. */
  def brier(spark: SparkSession, indexPath: String): DataFrame =
    Classifier.brierFromAggregate(
      spark.read.parquet(aggPath(indexPath))
        .select("thr", "n", "pos"))

  /** Steady-state maintenance once every tag is behind the retry
    * horizon: fold history to ONE row per score (the additive monoid)
    * under a single `batch_tag=folded` partition, through the
    * stage-and-swap discipline. Every read answer is unchanged. */
  def compact(spark: SparkSession, indexPath: String): Unit = {
    val live = new Path(aggPath(indexPath))
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Layout.recoverSwap(fs, live)
    val folded = spark.read.parquet(live.toString)
      .groupBy(col("thr"))
      .agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
      .select(lit("folded").as("batch_tag"), col("thr"), col("n"),
        col("pos"))
      .localCheckpoint(true)
    val tmp = Layout.stagingPath(live, "compact_tmp")
    fs.delete(tmp, true) // stale staging from a crashed run
    folded.repartition(1)
      .write.partitionBy("batch_tag").parquet(tmp.toString)
    Layout.swapInPlace(fs, tmp, live)
  }
}
