package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flatten / project / rename / cast / filter operators — the reference's
  * pandas-side restructuring surface (SURVEY §2.2), as pure
  * `DataFrame => DataFrame` functions. All are narrow (no shuffle):
  * at 100 TB they run map-side inside whole-stage codegen, and the
  * filters/projections push down into the parquet scan.
  */
object Restructure {

  /** F1: flatten a map<symbol -> array<struct bar>> into one row per bar
    * with the symbol injected as a column
    * (reference: etl_project/assets/assets.py:54-68). Implemented as
    * `explode(map)` then struct expansion — Spark's Generate operator,
    * fully distributed (the reference loops in driver memory).
    */
  def flattenMapOfArrays(df: DataFrame, mapCol: String,
                         keyName: String): DataFrame =
    df.select(explode(col(mapCol)).as(Seq(keyName, "_bars")))
      .select(col(keyName), explode(col("_bars")).as("_bar"))
      .select(col(keyName), col("_bar.*"))

  /** F2: bulk column rename (reference: etl_project/assets/assets.py:79-91).
    * The reference's raw-feed map: single-letter fields -> bar schema. */
  val barRenameMap: Map[String, String] = Map(
    "c" -> "close", "h" -> "high", "l" -> "low",
    "n" -> "number_of_trades", "o" -> "open", "t" -> "timestamp",
    "v" -> "volume", "vw" -> "volume_weighted_avg_price",
    "symbol" -> "stock")

  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** F3: string -> timestamp (reference: etl_project/assets/assets.py:76). */
  def castTs(c: Column): Column = to_timestamp(c)

  /** F4: (string -> timestamp) -> date
    * (reference: etl_project/assets/sql/transform/stock_bars_analysis.sql:18). */
  def castDate(c: Column): Column = to_date(to_timestamp(c))

  /** F6: canonical projection / column reorder
    * (reference: etl_project/assets/assets.py:105-107). */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** F7: equality filter (reference: etl_project/utilities/utilities.py:11-15).
    * Pushes into the scan (check PushedFilters). */
  def filterEq(df: DataFrame, c: String, v: Any): DataFrame =
    df.filter(col(c) === lit(v))

  /** F8: incremental watermark filter — rows at or after the checkpoint
    * (reference: etl_project/pipelines/stock_bars.py:42-57). At scale this
    * is the partition-pruning predicate: with the fact table partitioned
    * or sorted by the order column, Catalyst prunes whole files. */
  def filterFrom(df: DataFrame, c: String, watermark: Column): DataFrame =
    df.filter(col(c) >= watermark)
}
