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
    * (reference: utilities/utilities.py:8-22). */
  def get(table: String): Option[String] = {
    val p = new java.io.File(path(table))
    if (!p.exists()) None
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
