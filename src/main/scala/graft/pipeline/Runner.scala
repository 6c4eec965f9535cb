package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.meta.AuditLog
import graft.ops.Upsert
import graft.state.Checkpoint

/** Incremental pipeline runner reproducing the reference's `pipeline()`
  * control flow (reference: etl_project/pipelines/stock_bars.py:33-134):
  *
  *   target exists?
  *     yes -> read checkpoint -> re-extract from watermark date
  *            (INCLUSIVE — the overlap day is re-read and idempotently
  *            deduped by the upsert, stock_bars.py:42-57) -> upsert
  *     no  -> full extract -> create + insert
  *   then: save checkpoint = max(order column) as ISO string
  *   then: analysis transform (isolated failure domain — it runs and
  *         logs even if the load stage failed, stock_bars.py:126-134)
  *
  * Each stage is wrapped in its own try/catch that appends to the audit
  * log, mirroring the reference's two try/except domains. Operators stay
  * pure `DataFrame => DataFrame`; only this runner touches storage.
  *
  * Scale: the incremental path reads only `orderCol >= watermark` — with
  * the target partitioned/sorted on the order column that predicate
  * prunes files, so a daily run touches one day of data, not 100 TB.
  */
class Runner(spark: SparkSession, checkpoint: Checkpoint, audit: AuditLog) {

  /** One incremental load round. `source` is the already-extracted batch
    * (the reference's API extract); returns rows now in the target. */
  def loadIncremental(source: DataFrame, targetPath: String, table: String,
                      keys: Seq[String], orderCol: String): Long = {
    try {
      audit.log(s"$table: load starting")
      val exists = new java.io.File(targetPath).exists()
      val batch = checkpoint.get(table) match {
        case Some(wm) if exists =>
          // inclusive re-extraction from the watermark's date, like the
          // reference's start=checkpoint_date[:10] slice
          val fromDate = wm.substring(0, 10)
          source.filter(col(orderCol) >= lit(fromDate))
        case _ => source
      }
      val merged =
        if (exists) Upsert.upsert(spark.read.parquet(targetPath), batch, keys)
        else batch
      // write via temp + swap so the overwrite never reads its own input
      val tmp = targetPath + ".tmp"
      merged.write.mode(SaveMode.Overwrite).parquet(tmp)
      val target = new java.io.File(targetPath)
      if (target.exists()) scala.reflect.io.Directory(target).deleteRecursively()
      new java.io.File(tmp).renameTo(target)
      val wm = spark.read.parquet(targetPath)
        .agg(max(col(orderCol).cast("string"))).collect()(0).getString(0)
      if (wm != null) checkpoint.save(table, wm)
      val n = spark.read.parquet(targetPath).count()
      audit.log(s"$table: load complete, $n rows, watermark $wm")
      n
    } catch {
      case e: Exception =>
        audit.log(s"$table: load FAILED: ${e.getMessage}")
        throw e
    }
  }

  /** The analysis stage: its own failure domain, like the reference's
    * second try/except (stock_bars.py:126-134). */
  def runAnalysis(name: String, out: String)(body: => DataFrame): Boolean =
    try {
      audit.log(s"$name: analysis starting")
      body.write.mode(SaveMode.Overwrite).parquet(out)
      audit.log(s"$name: analysis complete")
      true
    } catch {
      case e: Exception =>
        audit.log(s"$name: analysis FAILED: ${e.getMessage}")
        false
    }
}
