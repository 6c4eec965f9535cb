package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Restructure

/** S1: the reference's only real upstream source — the market-data JSON
  * payload `{"bars": {symbol: [bar, ...]}}` returned by the bars API
  * (reference: etl_project/connectors/alpaca_api.py:25-38, flattened at
  * assets/assets.py:54-68 and renamed at assets/assets.py:79-91).
  *
  * The reference hits the API per run and flattens in driver memory; the
  * Spark-first shape is a schema-pinned JSON *scan* over captured payload
  * files (one JSON document per line/file) — at 100 TB of landed payload
  * this is a splittable distributed read with the map explosion running
  * as a Generate operator inside the scan stage, not a driver loop.
  * Schema is pinned ([[Tables.rawBarsPayloadSchema]]); inference over
  * semi-structured feeds is unsafe and costs an extra pass.
  */
object JsonSource {

  /** Read captured bars-API payload JSON with the pinned payload
    * schema. Default is line-delimited (one document per line,
    * splittable); pass `multiLine = true` for pretty-printed
    * one-document-per-FILE captures — without it a multi-line document
    * parses line-by-line into nulls. `FAILFAST` makes that loud: a
    * malformed line throws instead of silently dropping the batch. */
  def readBarsJson(spark: SparkSession, path: String,
                   multiLine: Boolean = false): DataFrame =
    spark.read
      .option("mode", "FAILFAST")
      .option("multiLine", multiLine)
      .schema(Tables.rawBarsPayloadSchema).json(path)

  /** Canonical column order of the reference's stock_bars frame before
    * dimension enrichment (reference: assets/assets.py:105-107 minus the
    * joined company column). */
  val barColumns: Seq[String] = Seq(
    "stock", "timestamp", "open", "high", "low", "close",
    "volume", "volume_weighted_avg_price", "number_of_trades")

  /** Payload -> one row per bar with reference column names: explode the
    * symbol map, expand the bar struct, bulk-rename the single-letter
    * feed fields (assets/assets.py:54-91). */
  def barsFromPayload(payload: DataFrame): DataFrame =
    Restructure.project(
      Restructure.renameAll(
        Restructure.flattenMapOfArrays(payload, "bars", "symbol"),
        Restructure.barRenameMap),
      barColumns)

  /** Full S1 path: scan captured payload files -> stock_bars frame. */
  def readBars(spark: SparkSession, path: String,
               multiLine: Boolean = false): DataFrame =
    barsFromPayload(readBarsJson(spark, path, multiLine))
}
