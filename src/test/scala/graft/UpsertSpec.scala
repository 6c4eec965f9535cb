package graft

import org.apache.spark.sql.functions._
import graft.ops.Upsert

/** Load-semantics tests replicating the reference's own connector tests
  * (reference: etl_project_tests/connectors/test_postgresql.py:76-168)
  * with the same fixture rows (FIXTURES.md A.1), plus the idempotence
  * property its incremental overlap silently relies on. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def bars = Seq(
    ("TSLA", "Tesla Inc", "2025-10-01T10:00:00Z", 250.0, 255.0, 245.0, 252.0,
      1000000L, 251.5, 5000L),
    ("AAPL", "Apple Inc", "2025-10-01T10:00:00Z", 175.0, 178.0, 174.0, 177.0,
      2000000L, 176.5, 8000L)
  ).toDF("stock", "company", "timestamp", "open", "high", "low", "close",
    "volume", "volume_weighted_avg_price", "number_of_trades")

  test("insert: 2 fixture rows -> count 2, both tickers present") {
    val out = Upsert.insert(bars.limit(0), bars)
    assert(out.count() == 2)
    assert(out.select("stock").as[String].collect().toSet == Set("TSLA", "AAPL"))
  }

  test("upsert: modified TSLA close 252->260 + new MSFT -> 2 changes, TSLA.close==260") {
    val incoming = Seq(
      ("TSLA", "Tesla Inc", "2025-10-01T10:00:00Z", 250.0, 255.0, 245.0, 260.0,
        1000000L, 251.5, 5000L),
      ("MSFT", "Microsoft", "2025-10-01T10:00:00Z", 300.0, 305.0, 298.0, 303.0,
        1500000L, 301.0, 6000L)
    ).toDF(bars.columns: _*)
    val out = Upsert.upsert(bars, incoming, Seq("stock", "timestamp"))
    assert(out.count() == 3) // TSLA updated, AAPL kept, MSFT added
    val tsla = out.filter($"stock" === "TSLA").select("close").as[Double].head()
    assert(tsla == 260.0)
  }

  test("overwrite: target holds exactly the new rows (test_postgresql.py:86-108)") {
    val dir = tmpDir() + "/bars"
    bars.write.mode("overwrite").parquet(dir)
    val newData = Seq(
      ("GOOG", "Alphabet Inc", "2025-10-01T10:00:00Z", 2800.0, 2820.0, 2780.0,
        2810.0, 600000L, 2805.0, 3000L)
    ).toDF(bars.columns: _*)
    Upsert.overwrite(spark.read.parquet(dir), newData)
      .write.mode("overwrite").parquet(dir + ".new")
    // (write to a sibling then swap stands in for the committer's
    // atomic replace; writing over a path being read is illegal)
    val out = spark.read.parquet(dir + ".new")
    assert(out.count() == 1)
    assert(out.select("stock").as[String].head() == "GOOG")
  }

  test("upsert within-batch duplicates resolve deterministically (value order, not row order)") {
    val dupBatch = Seq(
      ("TSLA", "Tesla Inc", "2025-10-02T10:00:00Z", 1.0, 1.0, 1.0, 111.0, 1L, 1.0, 1L),
      ("TSLA", "Tesla Inc", "2025-10-02T10:00:00Z", 1.0, 1.0, 1.0, 999.0, 1L, 1.0, 1L)
    ).toDF(bars.columns: _*)
    val a = Upsert.upsert(bars, dupBatch, Seq("stock", "timestamp"))
      .filter($"timestamp" === "2025-10-02T10:00:00Z")
      .select("close").as[Double].head()
    val b = Upsert.upsert(bars, dupBatch.repartition(5), Seq("stock", "timestamp"))
      .filter($"timestamp" === "2025-10-02T10:00:00Z")
      .select("close").as[Double].head()
    assert(a == b)
  }

  test("upsert idempotence: applying the same batch twice == once") {
    val incoming = bars.withColumn("close", $"close" + 1.0)
    val once = Upsert.upsert(bars, incoming, Seq("stock", "timestamp"))
    val twice = Upsert.upsert(once, incoming, Seq("stock", "timestamp"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("upsert: NULL keys never conflict (Postgres unique-index semantics)") {
    // two distinct existing null-key rows + one incoming: ON CONFLICT
    // backs onto a unique index where NULL != NULL, so all three rows
    // survive — a window dedup would group null=null and keep one
    val existing = Seq(
      (Option.empty[String], "2025-10-01", 1.0),
      (Option.empty[String], "2025-10-01", 2.0),
      (Option("TSLA"), "2025-10-01", 3.0)
    ).toDF("stock", "timestamp", "close")
    val incoming = Seq(
      (Option.empty[String], "2025-10-01", 4.0),
      (Option("TSLA"), "2025-10-01", 5.0)
    ).toDF("stock", "timestamp", "close")
    val out = Upsert.upsert(existing, incoming, Seq("stock", "timestamp"))
    assert(out.count() == 4)
    assert(out.filter($"stock".isNull).count() == 3)
    assert(out.filter($"stock" === "TSLA").select("close")
      .as[Double].head() == 5.0) // non-null keys still conflict-replace
  }

  test("upsert property: random batches keyed on (stock,timestamp) never duplicate keys") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 1 + rnd.nextInt(20)
      val existing = (1 to n).map { i =>
        (s"S${rnd.nextInt(5)}", s"2025-10-${10 + rnd.nextInt(5)}", rnd.nextDouble())
      }.toDF("stock", "timestamp", "close")
      val incoming = (1 to n).map { i =>
        (s"S${rnd.nextInt(5)}", s"2025-10-${10 + rnd.nextInt(5)}", rnd.nextDouble())
      }.toDF("stock", "timestamp", "close")
      val out = Upsert.upsert(existing.dropDuplicates("stock", "timestamp"),
        incoming.dropDuplicates("stock", "timestamp"), Seq("stock", "timestamp"))
      val dups = out.groupBy("stock", "timestamp").count().filter($"count" > 1).count()
      assert(dups == 0)
      // incoming rows always win
      val inKeys = incoming.dropDuplicates("stock", "timestamp")
      val joined = out.as("o").join(inKeys.as("i"), Seq("stock", "timestamp"))
        .filter($"o.close" =!= $"i.close").count()
      assert(joined == 0)
    }
  }
}
