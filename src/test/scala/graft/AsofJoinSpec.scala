package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions.to_timestamp_ntz

/** As-of join semantics: latest-at-or-before match per key, inclusive at
  * equal timestamps, null when no prior right row, and left rows pass
  * through unchanged. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("latest-at-or-before, inclusive ties, null when none prior") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "ts", "px")
    val trades = Seq(
      ("A", 5L, 100L),   // before any quote -> null
      ("A", 20L, 101L),  // exactly at a quote -> inclusive (2.0)
      ("A", 25L, 102L),  // between -> 2.0
      ("A", 99L, 103L),  // after all -> 3.0
      ("B", 14L, 104L),  // before B's quote -> null
      ("B", 16L, 105L)   // -> 9.0
    ).toDF("sym", "ts", "trade_id")

    val out = AsofJoin.asofJoin(trades, quotes, "sym", "ts", "ts", Seq("px"))
      .select("trade_id", "asof_px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out == Map(
      100L -> None, 101L -> Some(2.0), 102L -> Some(2.0),
      103L -> Some(3.0), 104L -> None, 105L -> Some(9.0)))
  }

  test("differential: random data matches a naive per-row reference") {
    val rnd = new scala.util.Random(7)
    val quotes = Seq.fill(300)((s"k${rnd.nextInt(20)}", rnd.nextInt(1000).toLong,
      rnd.nextDouble())).groupBy(t => (t._1, t._2)) // unique per (key, ts)
      .map(_._2.head).toSeq
    val trades = Seq.tabulate(500)(i =>
      (s"k${rnd.nextInt(25)}", rnd.nextInt(1000).toLong, i.toLong))
    val expected = trades.map { case (k, ts, id) =>
      val prior = quotes.filter(q => q._1 == k && q._2 <= ts)
      id -> (if (prior.isEmpty) None else Some(prior.maxBy(_._2)._3))
    }.toMap
    val got = AsofJoin.asofJoin(
      trades.toDF("sym", "ts", "trade_id"), quotes.toDF("sym", "ts", "px"),
      "sym", "ts", "ts", Seq("px"))
      .select("trade_id", "asof_px").as[(Long, Option[Double])]
      .collect().toMap
    assert(got == expected)
  }

  test("forward and nearest directions match naive references") {
    val rnd = new scala.util.Random(13)
    val quotes = Seq.fill(300)((s"k${rnd.nextInt(20)}", rnd.nextInt(1000).toLong,
      rnd.nextDouble())).groupBy(t => (t._1, t._2))
      .map(_._2.head).toSeq
    val trades = Seq.tabulate(500)(i =>
      (s"k${rnd.nextInt(25)}", rnd.nextInt(1000).toLong, i.toLong))
    def run(dir: String) = AsofJoin.asofJoin(
      trades.toDF("sym", "ts", "trade_id"), quotes.toDF("sym", "ts", "px"),
      "sym", "ts", "ts", Seq("px"), direction = dir)
      .select("trade_id", "asof_px").as[(Long, Option[Double])]
      .collect().toMap

    val fwdExpected = trades.map { case (k, ts, id) =>
      val after = quotes.filter(q => q._1 == k && q._2 >= ts)
      id -> (if (after.isEmpty) None else Some(after.minBy(_._2)._3))
    }.toMap
    assert(run("forward") == fwdExpected)

    val nearExpected = trades.map { case (k, ts, id) =>
      val prior = quotes.filter(q => q._1 == k && q._2 <= ts)
      val after = quotes.filter(q => q._1 == k && q._2 > ts)
      val b = if (prior.isEmpty) None else Some(prior.maxBy(_._2))
      val f = if (after.isEmpty) None else Some(after.minBy(_._2))
      id -> ((b, f) match {
        case (None, None) => None
        case (Some(q), None) => Some(q._3)
        case (None, Some(q)) => Some(q._3)
        // backward wins ties (pandas merge_asof nearest semantics)
        case (Some(bq), Some(fq)) =>
          Some(if (ts - bq._2 <= fq._2 - ts) bq._3 else fq._3)
      })
    }.toMap
    assert(run("nearest") == nearExpected)
  }

  test("a matched row's NULL value stays NULL (no farther-row bleed-through)") {
    // the matched row (ts=10) has px=NULL; an ignoreNulls carry over the
    // bare value column would leak ts=0's 5.0 — pandas/DuckDB return NULL
    val quotes = Seq(("A", 0L, Some(5.0)), ("A", 10L, None))
      .toDF("sym", "ts", "px")
    val trades = Seq(("A", 10L, 100L)).toDF("sym", "ts", "trade_id")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val out = AsofJoin.asofJoin(trades, quotes, "sym", "ts", "ts",
          Seq("px"), direction = dir)
        .select("asof_px").as[Option[Double]].head()
      assert(out.isEmpty, s"$dir leaked a farther row's value: $out")
    }
  }

  test("null keys and null timestamps never match (SQL/ASOF semantics)") {
    val quotes = Seq(
      (Option("A"), Option(10L), 1.0),
      (Option("A"), Option.empty[Long], 99.0), // null right ts: excluded
      (Option.empty[String], Option(5L), 77.0) // null right key: excluded
    ).toDF("sym", "ts", "px")
    val trades = Seq(
      (Option("A"), Option(20L), 1L),          // matches the real quote
      (Option("A"), Option.empty[Long], 2L),   // null left ts -> unmatched
      (Option.empty[String], Option(20L), 3L)  // null left key -> unmatched
    ).toDF("sym", "ts", "trade_id")
    val out = AsofJoin.asofJoin(trades, quotes, "sym", "ts", "ts", Seq("px"))
      .select("trade_id", "asof_px").as[(Long, Option[Double])]
      .collect().toMap
    assert(out == Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("nearest with TIMESTAMP_NTZ is zone-independent across a DST gap") {
    // America/Los_Angeles springs forward 2024-03-10 02:00->03:00. NTZ
    // wall-clock distances: backward 90 min, forward 100 min -> backward.
    // Casting NTZ through the session zone instead would give the
    // forward candidate a PDT offset (distance shrinks to 40 min) and
    // pick the wrong row.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val left = Seq(("k", "2024-03-10T01:30:00")).toDF("k", "ts")
        .withColumn("ts", to_timestamp_ntz($"ts"))
      val right = Seq(("k", "2024-03-10T00:00:00", 1.0),
                      ("k", "2024-03-10T03:10:00", 2.0)).toDF("k", "rts", "v")
        .withColumn("rts", to_timestamp_ntz($"rts"))
      val out = AsofJoin.asofJoin(left, right, "k", "ts", "rts",
        Seq("v"), direction = "nearest")
      assert(out.select("asof_v").as[Double].head() == 1.0)
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("reserved working columns are rejected, including _rts") {
    val quotes = Seq(("A", 10L, 1.0)).toDF("sym", "ts", "_rts")
    val trades = Seq(("A", 5L, 100L)).toDF("sym", "ts", "trade_id")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(trades, quotes, "sym", "ts", "ts", Seq("_rts"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("plans one exchange for both sides (no range cross-product)") {
    val quotes = Seq(("A", 10L, 1.0)).toDF("sym", "ts", "px")
    val trades = Seq(("A", 5L, 100L)).toDF("sym", "ts", "trade_id")
    val plan = AsofJoin.asofJoin(trades, quotes, "sym", "ts", "ts", Seq("px"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    val exchanges = plan.linesIterator.count(_.matches(raw"\(\d+\) Exchange( .*)?"))
    assert(exchanges == 1, s"asof join should shuffle once:\n$plan")
    assert(!plan.toLowerCase.contains("cartesian") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
