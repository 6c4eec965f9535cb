package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.{Enrich, Restructure}

/** Restructuring + enrichment tests over the reference's own raw-feed
  * shape (map[symbol -> bars], single-letter fields) and dimension CSV
  * (reference: etl_project/assets/assets.py:54-107). */
class RestructureSpec extends SparkSpec {
  import spark.implicits._

  test("flatten map-of-arrays injects the key as a column (F1)") {
    val df = Seq(
      Map(
        "TSLA" -> Seq((252.0, 255.0, 245.0, 5000L, 250.0, "2025-10-01", 1000000L, 251.5)),
        "AAPL" -> Seq(
          (177.0, 178.0, 174.0, 8000L, 175.0, "2025-10-01", 2000000L, 176.5),
          (179.0, 180.0, 176.0, 8100L, 177.0, "2025-10-02", 2100000L, 178.0)))
    ).toDF("bars")
      .select(col("bars").cast(
        "map<string,array<struct<c:double,h:double,l:double,n:bigint,o:double,t:string,v:bigint,vw:double>>>"))
    val flat = Restructure.flattenMapOfArrays(df, "bars", "symbol")
    assert(flat.count() == 3)
    assert(flat.columns.toSeq == Seq("symbol", "c", "h", "l", "n", "o", "t", "v", "vw"))
    assert(flat.filter($"symbol" === "AAPL").count() == 2)
  }

  test("bulk rename maps raw feed fields to the bars schema (F2)") {
    val raw = Seq((252.0, 255.0, 245.0, 5000L, 250.0, "2025-10-01", 1000000L, 251.5, "TSLA"))
      .toDF("c", "h", "l", "n", "o", "t", "v", "vw", "symbol")
    val renamed = Restructure.renameAll(raw, Restructure.barRenameMap)
    assert(renamed.columns.toSet == Set("close", "high", "low", "number_of_trades",
      "open", "timestamp", "volume", "volume_weighted_avg_price", "stock"))
  }

  test("dimension CSV scan + enrichment join + drop (S2/J1/F5)") {
    val csv = tmpDir() + "/dim.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv),
      "Company,Symbol,Exchange\nApple,AAPL,NASDAQ\nTesla,TSLA,NASDAQ\nSalesforce,CRM,NYSE\n")
    val dim = Tables.readCsv(spark, csv, Tables.dimCsvSchema)
    assert(dim.count() == 3)
    val facts = Seq(("AAPL", 177.0), ("TSLA", 252.0), ("ZZZZ", 1.0))
      .toDF("stock", "close")
    val out = Enrich.enrich(facts, dim, "stock", "Symbol",
      dropDimCols = Seq("Exchange"))
    assert(out.columns.toSet == Set("stock", "close", "Company"))
    assert(out.count() == 2) // inner join drops ZZZZ
    // the Symbol-list projection (assets.py:17-26)
    val symbols = dim.select("Symbol").as[String].collect().sorted.mkString(",")
    assert(symbols == "AAPL,CRM,TSLA")
  }

  test("incremental filter is inclusive of the watermark (F8)") {
    val df = Seq(("2025-01-01", 1), ("2025-01-02", 2), ("2025-01-03", 3))
      .toDF("ts", "v")
    val out = Restructure.filterFrom(df, "ts", lit("2025-01-02"))
    assert(out.select("v").as[Int].collect().sorted.toSeq == Seq(2, 3))
  }

  test("conformSchema: adds typed nulls, up-casts, rejects lossy and extra") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("stock", StringType), StructField("volume", LongType),
      StructField("close", DoubleType)))
    val batch = Seq(("TSLA", 7)).toDF("stock", "volume") // int volume, no close
    val out = graft.ops.Restructure.conformSchema(batch, target)
    assert(out.columns.toSeq == Seq("stock", "volume", "close"))
    assert(out.schema("volume").dataType == LongType)   // int -> long upcast
    val row = out.collect()(0)
    assert(row.getLong(1) == 7L && row.isNullAt(2))     // missing -> typed null
    // lossy cast (string -> long) fails loudly
    intercept[IllegalArgumentException] {
      graft.ops.Restructure.conformSchema(
        Seq(("x", "oops")).toDF("stock", "volume"), target)
    }
    // extra batch columns are rejected, never silently dropped
    intercept[IllegalArgumentException] {
      graft.ops.Restructure.conformSchema(
        Seq(("x", 1L, 2.0, true)).toDF("stock", "volume", "close", "rogue"), target)
    }
  }
}
