package graft.meta

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only pipeline audit log, mirroring the reference's
  * `metadata(timestamp DateTime, log_message Text)` table and its
  * one-row-per-event writes
  * (reference: etl_project/metadata/log_metadata.py:20-38).
  *
  * Each `log` call appends one parquet row with the engine clock
  * (`current_timestamp()`), never rewriting history — the append-mode
  * analogue of the reference's INSERT-per-event.
  */
class AuditLog(spark: SparkSession, dir: String) {
  def log(message: String): Unit = {
    import spark.implicits._
    Seq(message).toDF("log_message")
      .select(current_timestamp().as("timestamp"), col("log_message"))
      .write.mode(SaveMode.Append).parquet(dir)
  }

  def read(): org.apache.spark.sql.DataFrame = spark.read.parquet(dir)
}
