package graft

import org.apache.spark.sql.functions._
import graft.io.{JsonSource, Tables}
import graft.ops.Enrich

/** S1 end-to-end: a captured bars-API payload file through the pinned-
  * schema JSON scan, map explosion, rename, and dimension enrichment —
  * the reference's extract + initial_transform replayed from disk
  * (reference: etl_project/assets/assets.py:54-107). */
class JsonSourceSpec extends SparkSpec {
  import spark.implicits._

  private val payload =
    """{"bars": {
      |  "TSLA": [{"c": 252.0, "h": 255.0, "l": 245.0, "n": 5000, "o": 250.0,
      |            "t": "2025-10-01T05:00:00Z", "v": 1000000, "vw": 251.5}],
      |  "AAPL": [{"c": 177.0, "h": 178.0, "l": 174.0, "n": 8000, "o": 175.0,
      |            "t": "2025-10-01T05:00:00Z", "v": 2000000, "vw": 176.5},
      |           {"c": 179.0, "h": 180.0, "l": 176.0, "n": 8100, "o": 177.0,
      |            "t": "2025-10-02T05:00:00Z", "v": 2100000, "vw": 178.0}]
      |}}""".stripMargin.replaceAll("\n", " ")

  test("payload file -> stock_bars frame -> enriched, reference shape") {
    val dir = tmpDir()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/payload.json"), payload)
    val bars = JsonSource.readBars(spark, s"$dir/payload.json")
    assert(bars.columns.toSeq == JsonSource.barColumns)
    assert(bars.count() == 3)
    val tsla = bars.filter($"stock" === "TSLA").head()
    assert(tsla.getAs[Double]("close") == 252.0)
    assert(tsla.getAs[Long]("volume") == 1000000L)
    assert(tsla.getAs[String]("timestamp") == "2025-10-01T05:00:00Z")

    // dimension merge + company rename (assets.py:93-107)
    val csv = s"$dir/dim.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(csv),
      "Company,Symbol,Exchange\nApple,AAPL,NASDAQ\nTesla,TSLA,NASDAQ\n")
    val dim = Tables.readCsv(spark, csv, Tables.dimCsvSchema)
    val enriched = Enrich.enrich(bars, dim, "stock", "Symbol",
      dropDimCols = Seq("Exchange"))
      .withColumnRenamed("Company", "company")
    assert(enriched.count() == 3)
    assert(enriched.filter($"stock" === "AAPL")
      .select("company").distinct().as[String].head() == "Apple")
  }

  test("missing/extra fields degrade safely under the pinned schema") {
    val dir = tmpDir()
    // one bar lacks vw and carries an unknown field: schema-pinned read
    // yields null for the missing column and drops the unknown one
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/partial.json"),
      """{"bars": {"MSFT": [{"c": 1.0, "h": 2.0, "l": 0.5, "n": 10, "o": 0.9, "t": "2025-10-01T05:00:00Z", "v": 100, "junk": 7}]}}""")
    val bars = JsonSource.readBars(spark, s"$dir/partial.json")
    assert(bars.count() == 1)
    val r = bars.head()
    assert(r.isNullAt(r.fieldIndex("volume_weighted_avg_price")))
    assert(!bars.columns.contains("junk"))
  }
}
