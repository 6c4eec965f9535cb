package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Parquet table access for the driver-generated testdata star schema
  * (TESTDATA.md). Schemas live in the parquet footers; explicit
  * `StructType`s are declared only for the external-format inputs
  * (CSV dimension, raw JSON bars) where inference would be unsafe.
  *
  * Scale note: `spark.read.parquet` on a directory of files yields
  * splittable columnar scans — at 100 TB the same call fans out to
  * row-group-granular tasks, with column pruning and predicate
  * pushdown supplied by Catalyst (see `PushedFilters` in explain).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS) (TESTDATA.md fixture), which
    // Spark's reader rejects outright. Read nanos as raw Long and convert
    // to a microsecond timestamp with integer arithmetic (the data is
    // µs-precision, so `div 1000` is lossless; double math would not be,
    // ns epochs exceed 2^53). The DuckDB oracle casts ns -> µs the same way.
    //
    // The nanosAsLong conf is set session-wide ON PURPOSE and not
    // restored: the physical scan consults it at planning/execution, not
    // at DataFrame creation, so save-and-restore here would break the
    // deferred read. Engine-wide contract: ns-precision parquet columns
    // surface as Long and callers convert explicitly (as done here).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
      else df
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Dimension-table schema mirroring the reference's company CSV
    * (reference: etl_project/data/top_tech_stock_symbol.csv:1). */
  val dimCsvSchema: StructType = StructType(Seq(
    StructField("Company", StringType),
    StructField("Symbol", StringType),
    StructField("Exchange", StringType)))

  /** Fact schema mirroring the reference's stock_bars table
    * (reference: etl_project/assets/assets.py:150-164). `timestamp`
    * deliberately stays a String: it is part of the PK and the
    * watermark is a lexicographic max over ISO-8601 text. */
  val stockBarsSchema: StructType = StructType(Seq(
    StructField("stock", StringType, nullable = false),
    StructField("company", StringType),
    StructField("timestamp", StringType, nullable = false),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", LongType),
    StructField("volume_weighted_avg_price", DoubleType),
    StructField("number_of_trades", LongType)))

  /** Raw per-symbol bar record as produced by the upstream JSON feed
    * (reference: etl_project/assets/assets.py:81-88): map of
    * symbol -> array of bars with single-letter field names. */
  val rawBarSchema: StructType = StructType(Seq(
    StructField("c", DoubleType), StructField("h", DoubleType),
    StructField("l", DoubleType), StructField("n", LongType),
    StructField("o", DoubleType), StructField("t", StringType),
    StructField("v", LongType), StructField("vw", DoubleType)))

  val rawBarsPayloadSchema: StructType = StructType(Seq(
    StructField("bars", MapType(StringType, ArrayType(rawBarSchema)))))

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}
