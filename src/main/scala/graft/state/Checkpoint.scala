package graft.state

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental-load watermark state, mirroring the reference's
  * `check_points(table_name PK, latest_timestamp)` table and its
  * get/save semantics (reference: etl_project/utilities/utilities.py:8-49).
  *
  * State is a tiny keyed parquet directory, partitioned by table name so
  * a save for one table never rewrites another's row — the same
  * upsert-on-PK contract the reference got from ON CONFLICT. Watermarks
  * are ISO-8601 *strings* compared lexicographically, exactly like the
  * reference's string max (SURVEY §7.4 string-timestamp caveat).
  */
class Checkpoint(spark: SparkSession, dir: String) {

  private def path(table: String) = s"$dir/table_name=$table"

  /** Latest watermark for `table`, if any
    * (reference: utilities/utilities.py:8-22). Existence is probed via
    * the Hadoop FileSystem API so the state store works on any
    * supported storage (local, HDFS, S3A), not just the local FS. */
  def get(table: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else spark.read.parquet(p.toString)
      .agg(max(col("latest_timestamp"))).collect()(0).getString(0) match {
      case null => None
      case s => Some(s)
    }
  }

  /** Upsert the watermark row for `table`
    * (reference: utilities/utilities.py:24-49). */
  def save(table: String, latest: String): Unit = {
    import spark.implicits._
    Seq(latest).toDF("latest_timestamp")
      .write.mode(SaveMode.Overwrite).parquet(path(table))
  }
}
