package graft

import org.apache.spark.sql.functions._
import graft.ops.Windows

/** Window-analysis edge cases the reference never tested (SURVEY §5):
  * first-row NULL propagation, NULLIF zero-guard, short frames, and a
  * hand-computed golden fixture for the full analysis chain
  * (reference: etl_project/assets/sql/transform/stock_bars_analysis.sql). */
class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    // (stock, tie, ts, close)
    ("A", 1L, "2025-01-01", 100.0),
    ("A", 2L, "2025-01-02", 110.0),
    ("A", 3L, "2025-01-03", 0.0),
    ("A", 4L, "2025-01-04", 50.0),
    ("B", 5L, "2025-01-01", 10.0)
  ).toDF("stock", "event_id", "ts", "value")

  test("lag: first row per partition is NULL") {
    val out = Windows.withPrev(series, "stock", "ts", "event_id", "value")
      .orderBy("stock", "ts")
    val rows = out.collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("prev_value"))) // A first
    assert(rows(4).isNullAt(rows(4).fieldIndex("prev_value"))) // B first
    assert(rows(1).getDouble(rows(1).fieldIndex("prev_value")) == 100.0)
  }

  test("daily return: nullif guards division by zero prev_close") {
    val out = Windows.withPrev(series, "stock", "ts", "event_id", "value")
      .withColumn("r", Windows.dailyReturn($"value", $"prev_value"))
      .orderBy("stock", "ts").collect()
    // row 3 (A, 2025-01-04): prev = 0.0 -> nullif -> NULL, no error (ANSI mode!)
    assert(out(3).isNullAt(out(3).fieldIndex("r")))
    // row 1: (110-100)/100 = 0.1
    assert(out(1).getDouble(out(1).fieldIndex("r")) == 0.1)
  }

  test("rsi: golden values on hand-computed fixture") {
    val out = Windows.rsi(series, "stock", "ts", "event_id", "value", n = 14)
    val a = out.filter($"stock" === "A").orderBy("event_id").collect()
    val idx = a(0).fieldIndex("rsi")
    // row0: no prev -> NULL gain/loss -> empty frame avg -> NULL rsi
    assert(a(0).isNullAt(idx))
    // row1: avg_gain=10, avg_loss=0 (monotone up) -> RSI=100
    assert(a(1).getDouble(idx) == 100.0)
    // row2: avg_gain=(10+0)/2=5, avg_loss=(0+110)/2=55
    //       -> 100 - 100/(1+1/11) = 8.3333...
    assert(a(2).getDouble(idx) == 8.3333)
    // row3: avg_gain=(10+0+50)/3=20, avg_loss=110/3
    //       -> 100 - 100*11/17 = 35.29411...
    assert(a(3).getDouble(idx) == 35.2941)
    // single-row partition B: NULL
    val b = out.filter($"stock" === "B").collect()(0)
    assert(b.isNullAt(b.fieldIndex("rsi")))
  }

  test("drawdown: running peak, relative drop, zero-peak guard") {
    val out = Windows.drawdown(series, "stock", "ts", "event_id", "value")
    val a = out.filter($"stock" === "A").orderBy("event_id").collect()
    val pi = a(0).fieldIndex("peak"); val di = a(0).fieldIndex("drawdown")
    assert(a.map(_.getDouble(pi)).toSeq == Seq(100.0, 110.0, 110.0, 110.0))
    assert(a(0).getDouble(di) == 0.0 && a(1).getDouble(di) == 0.0)
    assert(a(2).getDouble(di) == -1.0)          // (0-110)/110
    assert(a(3).getDouble(di) == -0.545455)     // (50-110)/110, HALF_UP 6dp
    // NEGATIVE series (PnL-style): |peak| keeps the drawdown <= 0 —
    // dividing by the raw negative peak would flip the sign and report
    // the drop as +1.0
    val neg = Seq(("D", 1L, "2025-01-01", -10.0), ("D", 2L, "2025-01-02", -20.0))
      .toDF("stock", "event_id", "ts", "value")
    val no = Windows.drawdown(neg, "stock", "ts", "event_id", "value")
      .orderBy("event_id").collect()
    assert(no(0).getDouble(no(0).fieldIndex("drawdown")) == 0.0)
    assert(no(1).getDouble(no(1).fieldIndex("drawdown")) == -1.0)
    // zero first value -> peak 0 -> NULLIF guard -> NULL drawdown
    val z = Seq(("C", 1L, "2025-01-01", 0.0), ("C", 2L, "2025-01-02", 5.0))
      .toDF("stock", "event_id", "ts", "value")
    val zo = Windows.drawdown(z, "stock", "ts", "event_id", "value")
      .orderBy("event_id").collect()
    assert(zo(0).isNullAt(zo(0).fieldIndex("drawdown")))
    assert(zo(1).getDouble(zo(1).fieldIndex("drawdown")) == 0.0)
  }

  test("rsi/drawdown: reserved working columns rejected") {
    intercept[IllegalArgumentException] {
      Windows.rsi(series.withColumn("rsi", lit(1)), "stock", "ts", "event_id", "value")
    }
    intercept[IllegalArgumentException] {
      Windows.drawdown(series.withColumn("peak", lit(1)), "stock", "ts", "event_id", "value")
    }
  }

  test("full analysis: golden values on hand-computed fixture") {
    val out = Windows.barAnalysis(series, "stock", "ts", "event_id", "value")
    val a = out.filter($"stock" === "A").orderBy("event_id").collect()
    // daily_return: null, 0.1, (0-110)/110=-1.0, null(prev=0)
    assert(a(0).isNullAt(a(0).fieldIndex("daily_return")))
    assert(a(1).getDouble(a(1).fieldIndex("daily_return")) == 0.1)
    assert(a(2).getDouble(a(2).fieldIndex("daily_return")) == -1.0)
    assert(a(3).isNullAt(a(3).fieldIndex("daily_return")))
    // moving_avg_5 row2 = avg(100,110,0) = 70
    assert(a(2).getDouble(a(2).fieldIndex("moving_avg_5")) == 70.0)
    // stddev_5: 1-value frame -> NULL (sample stddev)
    assert(a(0).isNullAt(a(0).fieldIndex("stddev_5")))
    // stddev of (0.1, -1.0) sample = sqrt(((0.55)^2)*2/1) ~ 0.7778.. round2 = 0.78
    assert(a(2).getDouble(a(2).fieldIndex("stddev_5")) == 0.78)
    // single-row partition B: everything except value/mavg NULL
    val b = out.filter($"stock" === "B").collect()(0)
    assert(b.isNullAt(b.fieldIndex("daily_return")))
    assert(b.getDouble(b.fieldIndex("moving_avg_5")) == 10.0)
  }

  test("short partitions (<5 rows) never throw and frames shrink") {
    val out = Windows.barAnalysis(series, "stock", "ts", "event_id", "value")
    assert(out.count() == 5)
  }

  test("gap fill: missing days synthesized, forward-filled, flagged") {
    val daily = Seq(
      ("A", "2025-01-01", 10.0),
      ("A", "2025-01-03", 30.0), // Jan 2 missing
      ("A", "2025-01-06", 60.0), // Jan 4-5 missing
      ("B", "2025-02-01", 1.0)   // single-day span: no synthesis
    ).toDF("k", "d", "v").withColumn("d", to_date($"d"))
    val out = Windows.gapFill(daily, "k", "d", "v")
      .orderBy("k", "d")
      .select($"k", $"d".cast("string"), $"v_filled", $"is_filled")
      .as[(String, String, Double, Long)].collect()
    assert(out.length == 7, "span A = 6 days, span B = 1 day")
    assert(out.toSeq == Seq(
      ("A", "2025-01-01", 10.0, 0L),
      ("A", "2025-01-02", 10.0, 1L), // carried from Jan 1
      ("A", "2025-01-03", 30.0, 0L),
      ("A", "2025-01-04", 30.0, 1L),
      ("A", "2025-01-05", 30.0, 1L),
      ("A", "2025-01-06", 60.0, 0L),
      ("B", "2025-02-01", 1.0, 0L)))
  }

  test("gap fill: an observed NULL-valued row is NOT marked synthesized") {
    val daily = Seq(
      ("A", "2025-01-01", Option(10.0)),
      ("A", "2025-01-02", Option.empty[Double]), // observed, value null
      ("A", "2025-01-04", Option(40.0))          // Jan 3 truly missing
    ).toDF("k", "d", "v").withColumn("d", to_date($"d"))
    val out = Windows.gapFill(daily, "k", "d", "v")
      .orderBy("d").select($"d".cast("string"), $"v_filled", $"is_filled")
      .as[(String, Double, Long)].collect()
    assert(out.toSeq == Seq(
      ("2025-01-01", 10.0, 0L),
      ("2025-01-02", 10.0, 0L), // real observation: filled value, flag 0
      ("2025-01-03", 10.0, 1L), // synthesized row: flag 1
      ("2025-01-04", 40.0, 0L)))
  }

  test("rsi: a NULL mid-series value is skipped, not a zero-change day") {
    val s = Seq(
      ("X", 1L, "2025-01-01T10:00:00", Option(10.0)),
      ("X", 2L, "2025-01-02T10:00:00", Option.empty[Double]),
      ("X", 3L, "2025-01-03T10:00:00", Option(12.0))
    ).toDF("stock", "event_id", "ts", "value")
      .withColumn("ts", to_timestamp($"ts"))
    val out = Windows.rsi(s, "stock", "ts", "event_id", "value", n = 14)
      .orderBy("event_id").select("rsi").as[Option[Double]].collect()
    // row 1: no prev -> null gain/loss -> frame avg over zero rows -> null RSI
    assert(out(0).isEmpty)
    // row 2 (null value): nothing to contribute -> still null RSI
    assert(out(1).isEmpty)
    // row 3: prev is the NULL row -> gain/loss null again -> RSI stays
    // null rather than reading the gap as "no change" (RSI 50)
    assert(out(2).isEmpty)
  }
}
