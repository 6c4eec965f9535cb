package graft

import graft.io.JdbcClient
import org.apache.spark.sql.DataFrame

/** End-to-end JDBC connector contract against embedded Derby (the only
  * database in the test environment; the client is dialect-portable).
  * Mirrors the reference's three scenarios — insert, overwrite, upsert
  * (etl_project_tests/connectors/test_postgresql.py:76-168) — on the
  * same stock-bars-shaped rows with a composite (stock, timestamp) key. */
class JdbcClientSpec extends SparkSpec {
  import spark.implicits._

  private val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").toString
  private val client = new JdbcClient(s"jdbc:derby:$dbDir/db;create=true")

  private def bars(rows: (String, String, String, Double, Double, Double,
      Double, Long, Double, Long)*): DataFrame =
    rows.toSeq.toDF("stock", "company", "ts", "open_p", "high_p", "low_p",
      "close_p", "volume", "vwap", "n_trades")

  private val tsla = ("TSLA", "Tesla Inc", "2025-10-01T10:00:00Z",
    250.0, 255.0, 245.0, 252.0, 1000000L, 251.5, 5000L)
  private val aapl = ("AAPL", "Apple Inc", "2025-10-01T10:00:00Z",
    170.0, 172.0, 168.0, 171.0, 800000L, 170.8, 4200L)

  test("insert creates the table and appends; select_all round-trips") {
    client.dropTable("stock_data_test")
    assert(!client.tableExists("stock_data_test"))
    client.insert(bars(tsla, aapl), "stock_data_test")
    val got = client.selectAll(spark, "stock_data_test")
    assert(got.count() == 2)
    assert(got.select("stock").as[String].collect().sorted.toSeq ==
      Seq("AAPL", "TSLA"))
    // append, not replace: a second insert doubles the rows
    client.insert(bars(tsla), "stock_data_test")
    assert(client.selectAll(spark, "stock_data_test").count() == 3)
  }

  test("overwrite drops and recreates: new contents exactly the new frame") {
    client.dropTable("stock_data_test")
    client.insert(bars(tsla, aapl), "stock_data_test")
    val goog = ("GOOG", "Alphabet Inc", "2025-10-01T10:00:00Z",
      2800.0, 2820.0, 2780.0, 2810.0, 600000L, 2805.0, 3000L)
    client.overwrite(bars(goog), "stock_data_test")
    val got = client.selectAll(spark, "stock_data_test")
    assert(got.count() == 1)
    assert(got.select("stock").as[String].head() == "GOOG")
  }

  test("upsert: conflict rows update, new rows insert, others survive") {
    client.dropTable("stock_data_test")
    client.upsert(spark, bars(tsla, aapl), "stock_data_test",
      Seq("stock", "ts")) // first call: table absent -> plain insert
    val tslaUpd = tsla.copy(_7 = 260.0, _9 = 255.0, _10 = 5100L)
    val msft = ("MSFT", "Microsoft Corp", "2025-10-01T10:00:00Z",
      300.0, 305.0, 295.0, 302.0, 700000L, 301.0, 3500L)
    client.upsert(spark, bars(tslaUpd, msft), "stock_data_test",
      Seq("stock", "ts"))
    val got = client.selectAll(spark, "stock_data_test")
      .select("stock", "company", "close_p")
      .as[(String, String, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq("AAPL", "MSFT", "TSLA"))
    assert(got.find(_._1 == "TSLA").get._3 == 260.0, "conflict row updated")
    assert(got.find(_._1 == "AAPL").get._3 == 171.0, "untouched row survives")
    assert(got.find(_._1 == "MSFT").get._2 == "Microsoft Corp", "new row inserted")
    // idempotent re-application (the retry story): same batch, same table
    client.upsert(spark, bars(tslaUpd, msft), "stock_data_test",
      Seq("stock", "ts"))
    assert(client.selectAll(spark, "stock_data_test").count() == 3)
    // the transactional swap cleans its staging table up
    assert(!client.tableExists("stock_data_test_graft_stage"))
  }

  test("upsert heals a crashed predecessor's stale staging table") {
    client.dropTable("t_heal")
    client.dropTable("t_heal_graft_stage")
    client.insert(bars(tsla, aapl), "t_heal")
    // crash residue: a stale staging table with a DIFFERENT shape (an
    // older run of an older schema died between stage and swap) — the
    // next upsert must replace it, not trip over it
    client.insert(spark.range(3).selectExpr("id AS wrong_shape"),
      "t_heal_graft_stage")
    val msft = ("MSFT", "Microsoft Corp", "2025-10-01T10:00:00Z",
      300.0, 305.0, 295.0, 302.0, 700000L, 301.0, 3500L)
    client.upsert(spark, bars(msft), "t_heal", Seq("stock", "ts"))
    assert(client.selectAll(spark, "t_heal").count() == 3)
    assert(!client.tableExists("t_heal_graft_stage"))
  }

  test("partitioned read splits the scan without changing its contents") {
    client.dropTable("bars_part")
    client.insert(spark.range(100).selectExpr("id", "id * 2 AS v"), "bars_part")
    val got = client.selectAllPartitioned(spark, "bars_part", "id",
      lower = 0L, upper = 100L, numPartitions = 4)
    assert(got.rdd.getNumPartitions == 4)
    assert(got.count() == 100)
    assert(got.agg(org.apache.spark.sql.functions.sum("v")).as[Long].head() ==
      2L * 99 * 100 / 2)
  }
}
