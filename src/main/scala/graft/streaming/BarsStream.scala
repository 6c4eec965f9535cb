package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The S1 ingest chain as a stream: landed bars-API payloads
  * ([[graft.io.BarsHttpClient.fetchAndLand]], one file per fetch) are
  * picked up by a file-source stream, parsed with the SAME pinned
  * payload schema and map explosion as the batch scan
  * ([[graft.io.JsonSource.barsFromPayload]]), and upserted into the
  * bars table on the reference PK per micro-batch — the weekly batch
  * loop (reference: pipelines/stock_bars.py:33-134) becomes a
  * continuously-running query whose "watermark" is the source
  * checkpoint's processed-file log.
  *
  * Scale notes: the parse + explode are map-side over the file scan —
  * payload bytes never shuffle; only the exploded bar rows reach the
  * upsert. The sink's full-table merge-and-swap suits the reference's
  * compact bars table; see [[EventStream.upsertSink]]'s cost contract
  * for when to switch to partition-scoped merges.
  */
object BarsStream {

  /** Streaming twin of `JsonSource.readBars`. The batch scan uses
    * FAILFAST; here the mode goes to `from_json` directly (a type-
    * corrupt bar field must throw, not land as a silent null — the
    * default PERMISSIVE parse would pass it), and the residual case
    * FAILFAST does NOT cover — a well-formed document with no `bars`
    * at all — raises explicitly. Either way a bad line fails the
    * micro-batch loudly rather than vanishing from the feed. */
  def parsedBars(spark: SparkSession, landDir: String): DataFrame = {
    val parsed = spark.readStream.text(landDir)
      .select(col("value"),
        from_json(col("value"), graft.io.Tables.rawBarsPayloadSchema,
          Map("mode" -> "FAILFAST")).as("j"))
      .filter(
        when(col("j").isNull || col("j.bars").isNull,
          raise_error(concat(lit("malformed bars payload line: "),
            substring(col("value"), 1, 120))))
          .otherwise(lit(true)))
    graft.io.JsonSource.barsFromPayload(parsed.select(col("j.bars").as("bars")))
  }

  /** Land-dir stream -> parse -> per-micro-batch upsert on
    * (stock, timestamp), the reference PK (assets/assets.py:150-164).
    * Restart-safe via the source checkpoint + idempotent upsert; the
    * PK columns are never null in a parsed payload (the map key and the
    * bar's own field), satisfying the upsert sink's non-null-key
    * exactly-once contract. */
  def ingest(spark: SparkSession, landDir: String, targetPath: String,
             checkpointDir: String): StreamingQuery =
    parsedBars(spark, landDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(EventStream.upsertSink(targetPath, Seq("stock", "timestamp")))
      .start()
}
