package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import java.sql.Timestamp

/** Structured Streaming transforms driven synchronously by MemoryStream:
  * windowed agg with watermark + per-key running state. */
class StreamingSpec extends SparkSpec {

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("windowed aggregation groups by 5-minute tumbling windows") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(1), 2, "click", 2.0),
      Event(3, ts(6), 3, "click", 4.0),
      Event(4, ts(1), 4, "view", 8.0))
    val q = EventStream.windowedAgg(mem.toDF())
      .writeStream.format("memory").queryName("agg_out")
      .outputMode(OutputMode.Complete()).start()
    q.processAllAvailable()
    val out = spark.table("agg_out")
      .select("event_type", "n", "total").as[(String, Long, Double)]
      .collect().toSet
    q.stop()
    assert(out == Set(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 8.0)))
  }

  test("streaming rollup sink: micro-batches fold into the rollup, replays are idempotent") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val rollup = s"$dir/rollup"
    val mem = MemoryStream[Event]
    val q = EventStream.rollupSink(mem.toDF(), rollup, "ts",
        Seq("event_type"), "value", appId = "spec-stream")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 10.0),
        Event(2, ts(1), 2, "click", 20.0),
        Event(3, ts(2), 3, "view", 5.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(3), 4, "click", 30.0))
      q.processAllAvailable()
      val got = spark.read.parquet(rollup)
      val clicks = got.filter($"event_type" === "click")
      assert(clicks.select("n").as[Long].head() == 3L)
      assert(clicks.select($"sum_v".cast("double")).as[Double].head() == 60.0)
      assert(got.filter($"event_type" === "view").select("n").as[Long].head() == 1L)

      // at-least-once replay: re-applying the LAST batch with its id is
      // a per-group no-op (the last_batch guard discards the partials)
      val lastId = got.agg(org.apache.spark.sql.functions.max("last_batch"))
        .head().getLong(0)
      val replay = Seq(Event(4, ts(3), 4, "click", 30.0)).toDF()
        .withColumn("_dt_src", org.apache.spark.sql.functions.to_date($"ts"))
      graft.pipeline.IncrementalAgg.maintain(spark, replay, rollup,
        "_dt_src", Seq("event_type"), "value", Some(lastId), "spec-stream")
      val after = spark.read.parquet(rollup).filter($"event_type" === "click")
      assert(after.select("n").as[Long].head() == 3L,
        "replayed batch double-counted")
      assert(after.select($"sum_v".cast("double")).as[Double].head() == 60.0)

      // a NEW lineage (fresh checkpoint -> batch ids restart at 0) must
      // MERGE, not read as a replay of the old lineage's higher ids
      graft.pipeline.IncrementalAgg.maintain(spark, replay, rollup,
        "_dt_src", Seq("event_type"), "value", Some(0L), "spec-stream-v2")
      val relin = spark.read.parquet(rollup).filter($"event_type" === "click")
      assert(relin.select("n").as[Long].head() == 4L,
        "new lineage's batch was discarded as a stale replay")
      // ... and its own replay is again a no-op
      graft.pipeline.IncrementalAgg.maintain(spark, replay, rollup,
        "_dt_src", Seq("event_type"), "value", Some(0L), "spec-stream-v2")
      assert(spark.read.parquet(rollup).filter($"event_type" === "click")
        .select("n").as[Long].head() == 4L)
    } finally q.stop()
  }

  test("rollup sink edge states: null dates survive merges, null-value sums recover") {
    import spark.implicits._
    val dir = tmpDir()
    val rollup = s"$dir/rollup"
    def b(rows: Seq[(Option[java.sql.Date], String, Option[Double])]) =
      rows.toDF("d", "k", "v")
    val d1 = Some(java.sql.Date.valueOf("2025-10-01"))
    // batch 0: a null-date group and a group whose values are ALL null
    graft.pipeline.IncrementalAgg.maintain(spark,
      b(Seq((None, "a", Some(5.0)), (d1, "b", None))), rollup,
      "d", Seq("k"), "v", Some(0L), "edge")
    // batch 1: more data for both groups
    graft.pipeline.IncrementalAgg.maintain(spark,
      b(Seq((None, "a", Some(7.0)), (d1, "b", Some(10.0)))), rollup,
      "d", Seq("k"), "v", Some(1L), "edge")
    val out = spark.read.parquet(rollup)
    val nullDt = out.filter($"dt".isNull && $"k" === "a")
    assert(nullDt.select("n").as[Long].head() == 2L,
      "null-date partition history was erased by the touched-dates filter")
    assert(nullDt.select($"sum_v".cast("double")).as[Double].head() == 12.0)
    val bRow = out.filter($"k" === "b")
    assert(bRow.select("n").as[Long].head() == 2L)
    assert(bRow.select($"sum_v".cast("double")).as[Double].head() == 10.0,
      "null sum partial poisoned the merged sum")
    assert(bRow.select($"min_v").as[Double].head() == 10.0)
  }

  test("file-stream ingest upserts each micro-batch into the target") {
    import spark.implicits._
    val dir = tmpDir()
    val src = s"$dir/landing"; new java.io.File(src).mkdirs()
    val target = s"$dir/target"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("stock",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("close",
        org.apache.spark.sql.types.DoubleType)))

    // land a single parquet FILE (the streaming file source does not
    // recurse into write-created directories)
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$dir/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$src/$name.parquet"))
    }

    land(Seq(("TSLA", "2025-10-01", 252.0), ("AAPL", "2025-10-01", 177.0))
      .toDF("stock", "ts", "close"), "batch1")
    val q = EventStream.fileIngest(spark, src, schema, target,
      s"$dir/cp", Seq("stock", "ts"))
    q.processAllAvailable()
    assert(spark.read.parquet(target).count() == 2)

    // second file: one update (TSLA close), one new row
    land(Seq(("TSLA", "2025-10-01", 260.0), ("MSFT", "2025-10-01", 303.0))
      .toDF("stock", "ts", "close"), "batch2")
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(target)
    assert(out.count() == 3)
    assert(out.filter($"stock" === "TSLA").select("close").as[Double].head() == 260.0)
  }

  test("ingest restart: a new query on the same checkpoint never reprocesses") {
    import spark.implicits._
    import graft.io.BarsHttpClient
    val dir = tmpDir()
    val land = s"$dir/landing"
    def bar(o: Double, t: String) = BarsTestFeed.bar(o, 1, t)
    def landBody(body: String, name: String): Unit =
      new BarsHttpClient("k", "s", (_, _) => (200, body))
        .fetchAndLand(spark, land, "X", "1Day", "2025-10-01", fileName = name)
    landBody(s"""{"bars":{"TSLA":[${bar(250.0, "2025-10-01T10:00:00Z")}]},"next_page_token":null}""",
      "f0.jsonl")
    val q1 = graft.streaming.BarsStream.ingest(spark, land, s"$dir/bars", s"$dir/cp")
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(s"$dir/bars").count() == 1)
    // make reprocessing OBSERVABLE: mutate the already-ingested row in
    // the target. If the restarted query re-read f0, its upsert would
    // overwrite this back to 251.0 — the PK dedup alone cannot reveal a
    // broken source checkpoint, a changed value can.
    val poked = spark.read.parquet(s"$dir/bars")
      .withColumn("close", org.apache.spark.sql.functions
        .when($"stock" === "TSLA", 999.0).otherwise($"close"))
      .localCheckpoint(true)
    poked.write.mode("overwrite").parquet(s"$dir/bars")
    // land more while no query runs; restart from the SAME checkpoint
    landBody(s"""{"bars":{"MSFT":[${bar(300.0, "2025-10-01T10:00:00Z")}]},"next_page_token":null}""",
      "f1.jsonl")
    val q2 = graft.streaming.BarsStream.ingest(spark, land, s"$dir/bars", s"$dir/cp")
    q2.processAllAvailable()
    q2.stop()
    val out = spark.read.parquet(s"$dir/bars")
    assert(out.count() == 2)
    assert(out.select("stock").as[String].collect().sorted.toSeq ==
      Seq("MSFT", "TSLA"))
    assert(out.filter($"stock" === "TSLA").select("close").as[Double].head() == 999.0,
      "restart re-read an already-processed landing file")
  }

  test("bars payload stream: fetches land, parse through the pinned schema, upsert") {
    import spark.implicits._
    import graft.io.BarsHttpClient
    val dir = tmpDir()
    val land = s"$dir/landing"
    def bar(o: Double, t: String) = BarsTestFeed.bar(o, 1, t)
    def clientFor(body: String) =
      new BarsHttpClient("k", "s", (_, _) => (200, body))
    // fetch 1: two symbols, one bar each
    clientFor(s"""{"bars":{"TSLA":[${bar(250.0, "2025-10-01T10:00:00Z")}],"AAPL":[${bar(170.0, "2025-10-01T10:00:00Z")}]},"next_page_token":null}""")
      .fetchAndLand(spark, land, "TSLA,AAPL", "1Day", "2025-10-01",
        fileName = "fetch-0.jsonl")
    val q = graft.streaming.BarsStream.ingest(spark, land, s"$dir/bars",
      s"$dir/cp")
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/bars").count() == 2)
      // fetch 2 under a NEW file name: revised TSLA close + a new day
      clientFor(s"""{"bars":{"TSLA":[${bar(260.0, "2025-10-01T10:00:00Z")},${bar(262.0, "2025-10-02T10:00:00Z")}]},"next_page_token":null}""")
        .fetchAndLand(spark, land, "TSLA", "1Day", "2025-10-01",
          fileName = "fetch-1.jsonl")
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/bars")
      assert(out.count() == 3, "overlap bar deduped, new day added")
      assert(out.filter($"stock" === "TSLA" &&
          $"timestamp" === "2025-10-01T10:00:00Z")
        .select("close").as[Double].head() == 261.0, "re-fetched bar won")
      assert(out.columns.toSeq == graft.io.JsonSource.barColumns,
        "streaming parse must yield the batch scan's exact frame")
    } finally q.stop()
    // a malformed landed line fails the batch loudly (FAILFAST parity),
    // never silently drops from the feed
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$land/fetch-2.jsonl"), "not json at all\n")
    val q2 = graft.streaming.BarsStream.ingest(spark, land, s"$dir/bars2",
      s"$dir/cp2")
    try {
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q2.processAllAvailable()
        q2.awaitTermination(10000)
      }
      assert(e.getMessage.contains("malformed bars payload") ||
        Option(e.getCause).exists(_.toString.contains("malformed bars payload")),
        s"wrong failure: $e")
    } finally q2.stop()
  }

  test("session windows close on gap + watermark (streaming sessionization)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionWindows(mem.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    // user 1: two events 5 min apart -> one session; user 2: one event
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(0), 2, "view", 8.0))
    q.processAllAvailable()
    // an event far in the future advances the watermark past the gap,
    // closing all three sessions above
    mem.addData(Event(4, Timestamp.valueOf("2024-01-01 02:00:00"), 3, "click", 0.0))
    q.processAllAvailable()
    val out = spark.table("sess_out")
      .select("user_id", "n_events", "total").as[(Long, Long, Double)]
      .collect().toSet
    q.stop()
    assert(out.contains((1L, 2L, 3.0)), s"user 1 session wrong: $out")
    assert(out.contains((2L, 1L, 8.0)), s"user 2 session wrong: $out")
    // and the session bounds honor the gap: start at first event,
    // end = last event + gap
    val u1 = spark.table("sess_out").filter($"user_id" === 1).head()
    assert(u1.getAs[Timestamp]("session_start") == ts(0))
    assert(u1.getAs[Timestamp]("session_end") == ts(35))
  }

  test("mapGroupsWithState keeps running per-key stats across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.runningStats(mem.toDS())
      .writeStream.format("memory").queryName("state_out")
      .outputMode(OutputMode.Update()).start()
    mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "click", 2.0))
    q.processAllAvailable()
    mem.addData(Event(3, ts(2), 1, "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("state_out").as[EventStream.TypeStats].collect()
    q.stop()
    val last = rows.filter(_.n == 3)
    assert(last.length == 1 && last(0).total == 7.0 && last(0).lastValue == 4.0)
  }

  test("stateful sessions emit once the watermark passes last+gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.statefulSessions(mem.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("ssess_out")
      .outputMode(OutputMode.Append()).start()
    // user 1: two events 5 min apart (one session) + an event 2h later
    // (a second session); nothing may emit before the watermark moves
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, Timestamp.valueOf("2024-01-01 02:00:00"), 1, "click", 4.0))
    q.processAllAvailable()
    // user 2's event pushes the watermark to 05:50 -> both u1 sessions
    // are past last+gap and flush (batch or timeout path)
    mem.addData(Event(4, Timestamp.valueOf("2024-01-01 06:00:00"), 2, "view", 8.0))
    q.processAllAvailable()
    val flushed = spark.table("ssess_out")
      .select("user_id", "n_events", "total").as[(Long, Long, Double)]
      .collect().toSet
    assert(flushed == Set((1L, 2L, 3.0), (1L, 1L, 4.0)), s"got $flushed")
    // and u2's own session flushes once the watermark passes ITS gap
    mem.addData(Event(5, Timestamp.valueOf("2024-01-01 09:00:00"), 2, "view", 1.0))
    q.processAllAvailable()
    val all = spark.table("ssess_out")
      .select("user_id", "n_events", "total").as[(Long, Long, Double)]
      .collect().toSet
    q.stop()
    assert(all.contains((2L, 1L, 8.0)), s"u2 flush missing: $all")
  }

  test("late within-watermark events merge into one past session") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    // gap (5 min) SHORTER than the 10-min watermark: late events can
    // arrive that are gap-distant from every open session yet must
    // still merge with EACH OTHER, not emit as singleton sessions
    val q = EventStream.statefulSessions(mem.toDS(), gapMs = 5L * 60 * 1000)
      .writeStream.format("memory").queryName("ssess_late")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Event(1, Timestamp.valueOf("2024-01-01 01:00:00"), 1, "click", 1.0))
    q.processAllAvailable() // watermark -> 00:50
    // two late events at 00:52/00:53: within watermark, > 5 min before
    // the 01:00 session -> they form ONE separate session together
    mem.addData(
      Event(2, Timestamp.valueOf("2024-01-01 00:52:00"), 1, "click", 2.0),
      Event(3, Timestamp.valueOf("2024-01-01 00:53:00"), 1, "click", 4.0))
    q.processAllAvailable()
    // far-future event flushes everything
    mem.addData(Event(4, Timestamp.valueOf("2024-01-01 03:00:00"), 2, "view", 0.0))
    q.processAllAvailable()
    val out = spark.table("ssess_late")
      .filter($"user_id" === 1)
      .select("n_events", "total").as[(Long, Double)].collect().toSet
    q.stop()
    assert(out == Set((2L, 6.0), (1L, 1.0)), s"late events not merged: $out")
  }

  test("stream-stream interval join attributes clicks within the horizon") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[EventStream.Impression]
    val clicks = MemoryStream[EventStream.Click]
    val q = EventStream.attributeClicks(imps.toDF(), clicks.toDF(),
        horizon = "30 minutes")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    imps.addData(
      EventStream.Impression(100, ts(0), 1),
      EventStream.Impression(101, ts(5), 2))
    // click 10 min after user 1's impression: attributed; user 2 clicks
    // 50 min later: outside the horizon; user 3 never saw an impression
    clicks.addData(
      EventStream.Click(900, ts(10), 1),
      EventStream.Click(901, ts(55), 2),
      EventStream.Click(902, ts(20), 3))
    q.processAllAvailable()
    val out = spark.table("attr_out").select("i_id", "c_id")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(out == Set((100L, 900L)), s"got $out")
  }

  test("streaming dedup suppresses redelivered keys across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.dedupStream(mem.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    mem.addData(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "view", 2.0))
    q.processAllAvailable()
    // same event_id redelivered in a later micro-batch (within watermark)
    mem.addData(Event(1, ts(2), 1, "click", 1.0), Event(3, ts(3), 3, "click", 4.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id")
      .as[Long].collect().sorted.toSeq
    q.stop()
    assert(ids == Seq(1L, 2L, 3L), s"got $ids")
  }

  test("streaming near-dup sink finds cross-batch dups against the index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.nearDupSink(mem.toDF().toDF("doc_id", "text"),
        s"$dir/idx", s"$dir/pairs", "text", "doc_id", appId = "spec-neardup")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog " * 8
      // batch 1: two unrelated docs — no pairs, and the empty pair set
      // must not create a schema-less pairs directory
      mem.addData((0L, base),
        (1L, "completely different words about spark engines " * 10))
      q.processAllAvailable()
      assert(!new java.io.File(s"$dir/pairs").exists())
      // batch 2: a near-dup of doc 0 arrives — the pair is found
      // against the INDEX (doc 0 was never re-read or re-hashed)
      mem.addData((10L, base + "extra tail tokens appended here"))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/pairs")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.contains((0L, 10L)), s"cross-batch dup missed: $got")
      assert(got.forall { case (_, b) => b == 10L },
        "only pairs involving the new batch may be emitted")
    } finally q.stop()
  }

  test("streaming semantic-dup sink finds cross-batch dups against the embed index") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    def vect(seed: Long, mut: Boolean = false): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      val base = Array.fill(16)(rnd.nextGaussian().toFloat)
      if (mut) base.map(x => (x * 1.1f) + 0.01f) else base
    }
    val mem = MemoryStream[(Long, Array[Float])]
    val q = EventStream.semanticDupSink(
        mem.toDF().toDF("vec_id", "embedding"),
        s"$dir/idx", s"$dir/pairs", "embedding", "vec_id",
        appId = "spec-semdup", threshold = 0.9)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // batch 1: two unrelated vectors — no pairs, and the empty pair
      // set must not create a schema-less pairs directory
      mem.addData((0L, vect(0)), (1L, vect(1)))
      q.processAllAvailable()
      assert(!new java.io.File(s"$dir/pairs").exists())
      // batch 2: a high-cosine mutant of vector 0 arrives — the pair
      // is found against the INDEX (vector 0 never re-hashed)
      mem.addData((10L, vect(0, mut = true)))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/pairs")
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got.contains((0L, 10L)), s"cross-batch semantic dup missed: $got")
      assert(got.forall { case (_, b) => b == 10L },
        "only pairs involving the new batch may be emitted")
    } finally q.stop()
  }

  test("streaming ANN ingest: appended vectors searchable across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    def vect(seed: Long, mut: Boolean = false): Array[Float] = {
      val rnd = new scala.util.Random(seed)
      val base = Array.fill(32)(rnd.nextGaussian().toFloat)
      if (mut) base.map(x => (x * 1.05f) + 0.01f) else base
    }
    // train/build on a base corpus; the stream only ever APPENDS
    val corpus = ((0L until 5L).map(i => (i, vect(i))) ++
      (200L until 240L).map(i => (i, vect(i)))).toDF("vec_id", "embedding")
    graft.ops.PqDiskIndex.build(spark, corpus, s"$dir/pq",
      "embedding", "vec_id", m = 4, ksub = 8, iters = 2, nlist = 8,
      numFiles = 4)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = EventStream.annIngestSink(mem.toDF().toDF("vec_id", "embedding"),
        s"$dir/pq", "embedding", "vec_id", appId = "spec-ann")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((100L, vect(0, mut = true)), (101L, vect(1, mut = true)))
      q.processAllAvailable()
      mem.addData((102L, vect(2, mut = true)))
      q.processAllAvailable()
      val hits = graft.ops.PqDiskIndex.search(spark,
          corpus.filter($"vec_id" < 3), s"$dir/pq", "embedding", "vec_id",
          k = 3, cands = 16, nprobe = 8)
        .collect().groupBy(_.getLong(0))
      for (qid <- 0L until 3L)
        assert(hits(qid).exists(_.getLong(1) == 100L + qid),
          s"streamed partner of query $qid not searchable: ${hits(qid).toSeq}")
    } finally q.stop()
  }

  test("streaming exact-dedup sink keeps first arrivals across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.exactDedupSink(mem.toDF().toDF("doc_id", "text"),
        s"$dir/didx", s"$dir/kept", "text", "doc_id", appId = "spec-xd")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((5L, "alpha body"), (7L, "alpha body"), (6L, "beta body"))
      q.processAllAvailable()
      // a cross-batch redelivery of known content and one fresh doc
      mem.addData((1L, "alpha body"), (9L, "gamma body"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$dir/kept")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(5L, 6L, 9L),
        s"first-arrival set wrong: $kept")
      // the accumulated groups still see every copy
      val groups = graft.ops.DigestIndex.currentGroups(spark, s"$dir/didx")
        .as[(Long, Long)].collect().toMap
      assert(groups(1L) == 3L && groups(6L) == 1L && groups(9L) == 1L,
        s"groups wrong: $groups")
    } finally q.stop()
  }

  test("streaming curation funnel == batch funnel over the same batches; replay-idempotent") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    // pick ids by their deterministic draw value so the keep set is
    // provably non-empty AND the sampling stage actually drops someone
    val hm = (1L to 40L).toDF("doc_id")
      .withColumn("h", graft.functions.PortableHash.hashMod($"doc_id", 100))
      .as[(Long, Long)].collect().toMap
    val in = (1L to 40L).filter(hm(_) < 50)   // survives the 50% draw
    val out = (1L to 40L).filter(hm(_) >= 50) // drawn out
    val good1 = "the cat sat on the mat and the dog lay by the door"
    val good2 = "a bird in the hand is worth two in the bush they say"
    val good3 = "to be or not to be that is the question for the ages"
    val drawn = "all that glitters is not gold and all is well that ends well"
    val contam = "the quick brown fox jumps over the lazy dog again and again"
    val junk = "%%% !!! ;;; ,,, ... ???"
    // monotone ingest: each content's smallest id arrives in its
    // earliest batch (the regime where first-arrival == min-id rep)
    val b1 = Seq((in(0), good1), (in(1), good2), (out(0), junk),
      (in(2), contam))
    val b2 = Seq((in(3), good1), (in(4), good3), (out(1), drawn),
      (in(5), good2))
    val bench = Seq((900L, "see the quick brown fox jumps over it"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.curateSink(mem.toDF().toDF("doc_id", "text"),
        s"$dir/didx", s"$dir/kept", "text", "doc_id",
        appId = "spec-cf", benchmark = bench)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
    // the batch funnel (q_curate_incremental's shape) over the same
    // two batches on its own store
    val all = (b1 ++ b2).toDF("doc_id", "text")
    val qual = graft.ops.TextOps.qualityScore(all, "text")
      .filter($"quality" >= 0.3)
    val b1ids = b1.map(_._1).toSet
    graft.ops.DigestIndex.appendAndDedup(spark,
      qual.filter($"doc_id".isInCollection(b1ids)), s"$dir/didx2",
      "text", "doc_id", batchTag = Some("hist"))
    graft.ops.DigestIndex.appendAndDedup(spark,
      qual.filter(!$"doc_id".isInCollection(b1ids)), s"$dir/didx2",
      "text", "doc_id", batchTag = Some("daily"))
    val reps = graft.ops.DigestIndex.currentGroups(spark, s"$dir/didx2")
      .select($"id".as("doc_id"))
    val deduped = qual.join(reps, Seq("doc_id"), "left_semi")
    val contaminated = graft.ops.DedupOps
      .contaminationScan(deduped, bench, "text", "doc_id", w = 3)
      .select("doc_id")
    val expected = deduped.join(contaminated, Seq("doc_id"), "left_anti")
      .filter(graft.functions.PortableHash.hashMod($"doc_id", 100) < 50)
      .select("doc_id").as[Long].collect().toSet
    assert(expected == Set(in(0), in(1), in(4)),
      s"batch-funnel fixture drifted: $expected") // quality+dedup+decontam+draw all bit
    assert(streamed == expected,
      s"streamed=$streamed batch=$expected")
    // at-least-once replay: a NEW lineage re-delivers the same batches
    // under the same appId — every stage overwrites its own tag
    // partitions, so the keep set and the store are unchanged
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStream.curateSink(mem2.toDF().toDF("doc_id", "text"),
        s"$dir/didx", s"$dir/kept", "text", "doc_id",
        appId = "spec-cf", benchmark = bench)
      .option("checkpointLocation", s"$dir/ckpt2").start()
    try {
      mem2.addData(b1: _*); q2.processAllAvailable()
      mem2.addData(b2: _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet == expected,
      "replayed funnel changed the keep set")
    assert(graft.ops.DigestIndex.currentGroups(spark, s"$dir/didx")
      .count() == 5, "replay double-appended the digest store")
  }

  test("curation funnel under NON-monotone ids: stream keeps FIRST ARRIVAL, batch fold keeps MIN id — the documented divergence") {
    // curateSink's documented contract (EventStream.scala): the stream
    // keeps the first-SEEN copy of each content; the batch funnel's
    // store fold resolves the global-min-id representative. The two
    // agree exactly when each content's smallest id arrives in its
    // earliest batch (monotone ingest). This case drives the OTHER
    // regime — a smaller id arriving LATER — and pins that (a) both
    // keep exactly one copy, (b) the stream keeps the earlier-seen
    // LARGER id while the fold resolves the later-arriving SMALLER id.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val hm = (1L to 60L).toDF("doc_id")
      .withColumn("h", graft.functions.PortableHash.hashMod($"doc_id", 100))
      .as[(Long, Long)].collect().toMap
    val survivors = (1L to 60L).filter(hm(_) < 50)
    val small = survivors.head       // arrives LAST
    val big = survivors.last         // arrives FIRST
    assert(small < big)
    val dup = "the cat sat on the mat and the dog lay by the door"
    val bench = Seq((900L, "nothing here overlaps the corpus at all"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.curateSink(mem.toDF().toDF("doc_id", "text"),
        s"$dir/didx", s"$dir/kept", "text", "doc_id",
        appId = "spec-nm", benchmark = bench)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((big, dup)); q.processAllAvailable()
      mem.addData((small, dup)); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed == Set(big),
      s"stream must keep the first-arrival (larger) id: $streamed")
    // the batch funnel over its own store: the min-lattice fold
    // resolves the SMALLER id even though it arrived later
    graft.ops.DigestIndex.appendAndDedup(spark,
      Seq((big, dup)).toDF("doc_id", "text"), s"$dir/didx2",
      "text", "doc_id", batchTag = Some("b0"))
    graft.ops.DigestIndex.appendAndDedup(spark,
      Seq((small, dup)).toDF("doc_id", "text"), s"$dir/didx2",
      "text", "doc_id", batchTag = Some("b1"))
    val folded = graft.ops.DigestIndex.currentGroups(spark, s"$dir/didx2")
      .select($"id").as[Long].collect().toSet
    assert(folded == Set(small),
      s"store fold must resolve the global-min id: $folded")
  }

  test("curation funnel optional stages: gopher rules + a frozen classifier + a frozen DSIR model gate the stream (the q_curate_full stack)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    // on-domain docs: clear every Gopher A1.1 rule (53 words, mean len
    // ~4.7, five distinct stopwords); distinct texts so exact dedup
    // never collapses them
    val a1 = "the quick brown fox jumps over lazy dogs near river " +
      "banks and that gentle stream will have carried those with small " +
      "stones beyond reach while evening light fades softly into night " +
      "air above quiet fields where birds settle down among tall grass " +
      "waiting for morning sun to rise again over distant eastern hills"
    val a2 = a1.replace("hills", "peaks")
    // off-domain doc: PASSES gopher (60 words, stopword skeleton) but
    // its content vocabulary never appears in the target corpus
    val b = Seq.fill(6)(Seq("the", "zorp", "and", "blick", "that",
      "grum", "with", "flarn", "have", "plim")).flatten.mkString(" ")
    val short = "too few words" // fails the Gopher word-count floor
    // stop-SPARSE doc: passes gopher (60 words, carries the stopword
    // minimum) and is built from the TARGET's own content vocabulary
    // (DSIR scores it positive) — only the learned classifier, fit to
    // separate stop-dense from stop-sparse prose, can drop it
    val c = ("the and " + Seq("quick", "brown", "fox", "jumps", "lazy",
      "dogs", "river", "banks", "gentle", "stream", "carried", "small",
      "stones", "beyond", "reach", "evening", "light", "fades",
      "softly", "night", "quiet", "fields", "birds", "settle", "tall",
      "grass", "waiting", "morning", "rise", "again", "distant",
      "eastern", "hills", "peaks", "banks", "stream", "fox", "dogs",
      "light", "grass", "fields", "night", "small", "reach", "rise",
      "morning", "birds", "tall", "quick", "brown", "jumps", "lazy",
      "gentle", "stones", "evening", "softly", "quiet", "settle")
      .mkString(" ")).trim
    val raw = Seq((1L, a1), (2L, a2), (3L, b)).toDF("doc_id", "text")
    val target = Seq((10L, a1), (11L, a2)).toDF("doc_id", "text")
    val model = graft.ops.Mixing.importanceModel(raw, target, "text")
    // the frozen model separates the domains at logweight 0; the
    // stop-sparse doc c IS on-domain (target vocabulary), so DSIR
    // passes it — the classifier stage must be what drops it
    val wts = graft.ops.Mixing
      .applyImportanceWeights(Seq((1L, a1), (2L, a2), (3L, b), (4L, c))
          .toDF("doc_id", "text"), model, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(wts(1L) > 0 && wts(2L) > 0 && wts(3L) < 0 && wts(4L) > 0,
      s"model: $wts")
    // classifier fit OFFLINE: stop-dense prose = positive class
    val train = graft.ops.Classifier.textFeatures(
      Seq((1L, a1, 1.0), (2L, a2, 1.0), (3L, c, 0.0),
        (4L, c.replace("peaks", "banks"), 0.0))
        .toDF("doc_id", "text", "y"), "text")
    val lw = graft.ops.Classifier.fitLogistic(train,
      graft.ops.Classifier.textFeatureCols, "y", iters = 30, lr = 0.5)
    // frozen threshold CALIBRATED offline between the classes (the
    // q_curate_full median stance — a frozen fit's scores sit in a
    // narrow band, so the deployment picks the cut, not 0.5)
    val lp = graft.ops.Classifier.scoreLogistic(
        graft.ops.Classifier.textFeatures(
          Seq((21L, a1), (23L, a2), (25L, c)).toDF("doc_id", "text"),
          "text"),
        graft.ops.Classifier.textFeatureCols, lw.toSeq)
      .select("doc_id", "p").as[(Long, Double)].collect().toMap
    assert(lp(21L) > lp(25L) && lp(23L) > lp(25L),
      s"classifier fixture drifted: $lp")
    val minP = (math.min(lp(21L), lp(23L)) + lp(25L)) / 2
    val bench = Seq((900L, "benchmark phrase sharing nothing else"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.curateSink(mem.toDF().toDF("doc_id", "text"),
        s"$dir/didx", s"$dir/kept", "text", "doc_id",
        appId = "spec-st", benchmark = bench, minQuality = 0.0,
        samplePct = 100, gopher = true, dsir = Some((model, 0.0)),
        logit = Some((lw.toSeq, minP)))
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((21L, a1), (22L, short)); q.processAllAvailable()
      mem.addData((23L, a2), (24L, b), (25L, c)); q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(21L, 23L),
      s"gopher must drop 22, DSIR must drop 24, the classifier must " +
        s"drop 25: $kept")
  }

  test("curation funnel logit stage: a frozen classifier gates the stream; streamed == batch keep set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    // stop-dense docs (classifier positives) vs a stopword-free doc;
    // the fit runs OFFLINE on labeled examples of the same shape
    val good1 = ("the cat sat on the mat and looked at the dog " * 4).trim
    val good2 = ("a bird is in the tree and sings to the sun " * 4).trim
    val bad = ("zorp blick grum flarn plim vex quux corge grault " * 4).trim
    val train = graft.ops.Classifier.textFeatures(
      Seq((1L, good1, 1.0), (2L, good2, 1.0), (3L, bad, 0.0),
        (4L, bad + " extra", 0.0)).toDF("doc_id", "text", "y"), "text")
    val w = graft.ops.Classifier.fitLogistic(train,
      graft.ops.Classifier.textFeatureCols, "y", iters = 30, lr = 0.5)
    // the frozen model separates the stream batch at p = 0.5
    val batchKeep = graft.ops.Classifier.scoreLogistic(
        graft.ops.Classifier.textFeatures(
          Seq((21L, good1), (22L, bad), (23L, good2))
            .toDF("doc_id", "text"), "text"),
        graft.ops.Classifier.textFeatureCols, w.toSeq)
      .filter(org.apache.spark.sql.functions.col("p") >= 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(batchKeep == Set(21L, 23L), s"fixture drifted: $batchKeep")
    val bench = Seq((900L, "benchmark phrase sharing nothing else"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.curateSink(mem.toDF().toDF("doc_id", "text"),
        s"$dir/didx", s"$dir/kept", "text", "doc_id",
        appId = "spec-lg", benchmark = bench, minQuality = 0.0,
        samplePct = 100, logit = Some((w.toSeq, 0.5)))
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((21L, good1), (22L, bad), (23L, good2))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == batchKeep,
      s"streamed keep set diverged from the frozen batch score: $kept")
  }

  test("curation funnel c4 stage: line cleanup runs first, landed text is the cleaned text, streamed == batch keep set") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    // doc 1: two proper lines + a cookie-notice line -> kept, cleaned
    val d1 = "the quick brown fox jumps over the lazy dog today.\n" +
      "a second proper sentence with enough words here.\n" +
      "we use cookies to improve your experience."
    // doc 2: '{' code marker -> the document drops wholesale
    val d2 = "function f() { return 1; }\na normal sentence here today."
    // doc 3: no line survives (no terminal punctuation anywhere)
    val d3 = "no punctuation on this line\nnor on this one"
    val bench = Seq((900L, "benchmark unrelated phrase tokens"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.curateSink(mem.toDF().toDF("doc_id", "text"),
        s"$dir/didx", s"$dir/kept", "text", "doc_id",
        appId = "spec-c4", benchmark = bench, minQuality = 0.0,
        samplePct = 100, c4 = true)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((1L, d1), (2L, d2), (3L, d3)); q.processAllAvailable()
    } finally q.stop()
    val kept = spark.read.parquet(s"$dir/kept")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // batch twin: with minQuality=0, no dups, no benchmark overlap and
    // a 100% draw, the funnel keep set IS the c4 keep set
    val batchKeep = graft.ops.TextOps.c4Filters(
        Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text"),
        "text", "doc_id")
      .select("doc_id", "clean_text").as[(Long, String)].collect().toMap
    assert(kept.keySet == batchKeep.keySet && kept.keySet == Set(1L),
      s"streamed keep set diverged from the batch twin: " +
        s"${kept.keySet} vs ${batchKeep.keySet}")
    assert(kept(1L) == batchKeep(1L) && !kept(1L).contains("cookie"),
      "landed text must be the CLEANED text, boilerplate stripped")
  }

  test("curation funnel fuzzy stage: a rephrased eval leak passes the binary scan and the Jaccard stage drops it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // benchmark doc, and a REPHRASED leak: every 4th token replaced —
    // every 5-gram contains an edit (binary scan at w=5 sees nothing)
    // while 3 of every 4 3-grams survive (jaccard ~ 1/7 at length)
    val benchTxt = (1 to 24).map(i => s"tok$i").mkString(" ")
    val leakTxt = (1 to 24)
      .map(i => if (i % 4 == 0) s"edit$i" else s"tok$i").mkString(" ")
    val cleanTxt = (1 to 24).map(i => s"other$i").mkString(" ")
    val bench = Seq((900L, benchTxt)).toDF("doc_id", "text")
    def runFunnel(sub: String, fuzzy: Option[(Int, Double)]): Set[Long] = {
      val dir = tmpDir()
      val mem = MemoryStream[(Long, String)]
      val q = EventStream.curateSink(mem.toDF().toDF("doc_id", "text"),
          s"$dir/didx", s"$dir/kept", "text", "doc_id",
          appId = s"spec-fz$sub", benchmark = bench, minQuality = 0.0,
          w = 5, samplePct = 100, fuzzy = fuzzy)
        .option("checkpointLocation", s"$dir/ckpt").start()
      try {
        mem.addData((1L, leakTxt), (2L, cleanTxt)); q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(s"$dir/kept")
        .select("doc_id").as[Long].collect().toSet
    }
    // without the fuzzy stage the rephrased leak sails through
    assert(runFunnel("a", None) == Set(1L, 2L),
      "fixture drifted: the binary scan should pass the rephrased leak")
    // with it, the leak drops and the unrelated doc is untouched
    assert(runFunnel("b", Some((3, 0.1))) == Set(2L),
      "the Jaccard stage must drop the rephrased leak only")
  }

  test("deploy loop end-to-end: ONE stream gated by the frozen classifier AND monitored by the calibration sink") {
    // the full production loop in one drill: fit offline, freeze the
    // weights, gate the ingest stream with them (curateSink logit
    // stage) while a SECOND query on the same stream lands every
    // scored doc's calibration aggregate — the deployed filter's PR
    // curve derives from the store and matches the batch metric over
    // everything that flowed
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val good1 = ("the cat sat on the mat and looked at the dog " * 4).trim
    val good2 = ("a bird is in the tree and sings to the sun " * 4).trim
    val bad = ("zorp blick grum flarn plim vex quux corge grault " * 4).trim
    val train = graft.ops.Classifier.textFeatures(
      Seq((1L, good1, 1.0), (2L, good2, 1.0), (3L, bad, 0.0),
        (4L, bad + " extra", 0.0)).toDF("doc_id", "text", "y"), "text")
    val w = graft.ops.Classifier.fitLogistic(train,
      graft.ops.Classifier.textFeatureCols, "y", iters = 30, lr = 0.5)
    val mem = MemoryStream[(Long, String, Double)]
    val stream = mem.toDF().toDF("doc_id", "text", "y")
    // gate leg: the funnel keeps classifier-positives
    val qGate = EventStream.curateSink(stream.select("doc_id", "text"),
        s"$dir/didx", s"$dir/kept", "text", "doc_id",
        appId = "spec-dl", minQuality = 0.0, samplePct = 100,
        benchmark = Seq((900L, "benchmark phrase sharing nothing else"))
          .toDF("doc_id", "text"),
        logit = Some((w.toSeq, 0.5)))
      .option("checkpointLocation", s"$dir/ckptA").start()
    // monitor leg: SAME frozen weights score every incoming doc
    // map-side (textFeatures + scoreLogistic are streaming-safe
    // projections); the sink lands the bounded aggregate per batch
    val scored = graft.ops.Classifier.scoreLogistic(
      graft.ops.Classifier.textFeatures(stream, "text"),
      graft.ops.Classifier.textFeatureCols, w.toSeq)
    val qMon = EventStream.calibrationSink(scored.select("doc_id", "p", "y"),
        s"$dir/cal", "p", "y", appId = "spec-dlm")
      .option("checkpointLocation", s"$dir/ckptB").start()
    try {
      mem.addData((21L, good1, 1.0), (22L, bad, 0.0))
      qGate.processAllAvailable(); qMon.processAllAvailable()
      mem.addData((23L, good2, 1.0))
      qGate.processAllAvailable(); qMon.processAllAvailable()
    } finally { qGate.stop(); qMon.stop() }
    val kept = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(21L, 23L),
      s"the frozen gate must keep the classifier positives: $kept")
    val streamedCurve = graft.ops.CalibrationIndex
      .prCurve(spark, s"$dir/cal")
      .orderBy("thr").collect().map(_.toSeq).toSeq
    val batchCurve = graft.ops.Classifier.prCurve(
        graft.ops.Classifier.scoreLogistic(
          graft.ops.Classifier.textFeatures(
            Seq((21L, good1, 1.0), (22L, bad, 0.0), (23L, good2, 1.0))
              .toDF("doc_id", "text", "y"), "text"),
          graft.ops.Classifier.textFeatureCols, w.toSeq), "p", "y")
      .orderBy("thr").collect().map(_.toSeq).toSeq
    assert(streamedCurve == batchCurve,
      "the monitored curve must equal the batch metric over the flow")
  }

  test("deploy-loop ACTUATION: batch-1 monitoring recalibrates the gate for batch 2 and the keep set provably shifts") {
    // the arrow the monitoring store exists for: the deployed gate's
    // scores + ground-truth labels accrete in the calibration store;
    // the measured F1-optimal operating point is read back and FROZEN
    // as the gate's new minP; a doc the old gate mis-kept now drops.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val good1 = ("the cat sat on the mat and looked at the dog " * 4).trim
    val good2 = ("a bird is in the tree and sings to the sun " * 4).trim
    val mixed = ("the cat sat on the mat zorp blick grum vex " * 4).trim
    val bad = ("zorp blick grum flarn plim vex quux corge grault " * 4).trim
    val train = graft.ops.Classifier.textFeatures(
      Seq((1L, good1, 1.0), (2L, good2, 1.0), (3L, bad, 0.0),
        (4L, bad + " extra", 0.0)).toDF("doc_id", "text", "y"), "text")
    val w = graft.ops.Classifier.fitLogistic(train,
      graft.ops.Classifier.textFeatureCols, "y", iters = 30, lr = 0.5)
    def scoreOf(t: String): Double = graft.ops.Classifier.scoreLogistic(
        graft.ops.Classifier.textFeatures(
          Seq((0L, t)).toDF("doc_id", "text"), "text"),
        graft.ops.Classifier.textFeatureCols, w.toSeq)
      .select("p").head().getDouble(0)
    val (pG1, pG2, pMix, pBad) =
      (scoreOf(good1), scoreOf(good2), scoreOf(mixed), scoreOf(bad))
    val oldMinP = 0.5
    // the mixed doc is the gate's mistake: above the deployed 0.5 but
    // labeled negative in production feedback
    assert(pG1 >= oldMinP && pG2 >= oldMinP && pMix >= oldMinP &&
      pMix < math.min(pG1, pG2) && pBad < oldMinP,
      s"fixture drifted: $pG1 $pG2 $pMix $pBad")
    // batch 1: labeled production feedback streams through the SAME
    // frozen weights into the calibration store
    val mem1 = MemoryStream[(Long, String, Double)]
    val scored1 = graft.ops.Classifier.scoreLogistic(
      graft.ops.Classifier.textFeatures(
        mem1.toDF().toDF("doc_id", "text", "y"), "text"),
      graft.ops.Classifier.textFeatureCols, w.toSeq)
    val q1 = EventStream.calibrationSink(
        scored1.select("doc_id", "p", "y"), s"$dir/calib", "p", "y",
        appId = "spec-recal-mon")
      .option("checkpointLocation", s"$dir/ckptM").start()
    try {
      mem1.addData((11L, good1, 1.0), (12L, good2, 1.0),
        (13L, mixed, 0.0), (14L, bad, 0.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // ACTUATION: the store's measured operating point becomes the new
    // frozen minP (the q_recalibrate_gate read)
    val newMinP = graft.ops.CalibrationIndex
      .bestThreshold(spark, s"$dir/calib")
      .select("thr").head().getDouble(0)
    assert(newMinP > pMix && newMinP <= math.min(pG1, pG2),
      s"the recalibrated gate must exclude the mis-kept doc: $newMinP")
    // batch 2 through the OLD gate and through the RE-FROZEN gate
    def runGate(minP: Double, sub: String): Set[Long] = {
      val mem = MemoryStream[(Long, String)]
      val q = EventStream.curateSink(mem.toDF().toDF("doc_id", "text"),
          s"$dir/$sub/didx", s"$dir/$sub/kept", "text", "doc_id",
          appId = s"spec-recal-$sub", minQuality = 0.0, samplePct = 100,
          benchmark = Seq((900L, "benchmark phrase sharing nothing else"))
            .toDF("doc_id", "text"),
          logit = Some((w.toSeq, minP)))
        .option("checkpointLocation", s"$dir/$sub/ckpt").start()
      try {
        mem.addData((21L, good1), (22L, mixed), (23L, bad))
        q.processAllAvailable()
      } finally q.stop()
      spark.read.parquet(s"$dir/$sub/kept")
        .select("doc_id").as[Long].collect().toSet
    }
    assert(runGate(oldMinP, "old") == Set(21L, 22L),
      "the pre-upgrade gate keeps the mis-scored doc")
    assert(runGate(newMinP, "new") == Set(21L),
      "the recalibrated gate must drop exactly the mis-kept doc")
  }

  test("deploy-loop actuation PER SOURCE: grouped store -> per-source re-freeze -> each source gated at ITS threshold") {
    // the multi-source actuation loop: batch-1 labeled feedback lands
    // PER SOURCE in the grouped store; bestThresholdBy reads each
    // source's F1-optimal operating point; the per-source map freezes
    // into the gate (logitBy) and batch 2 gates each source at its
    // OWN bar — including a source with no calibrated threshold,
    // which must drop wholesale.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val good1 = ("the cat sat on the mat and looked at the dog " * 4).trim
    val good2 = ("a bird is in the tree and sings to the sun " * 4).trim
    val mixed = ("the cat sat on the mat zorp blick grum vex " * 4).trim
    val bad = ("zorp blick grum flarn plim vex quux corge grault " * 4).trim
    val train = graft.ops.Classifier.textFeatures(
      Seq((1L, good1, 1.0), (2L, good2, 1.0), (3L, bad, 0.0),
        (4L, bad + " extra", 0.0)).toDF("doc_id", "text", "y"), "text")
    val w = graft.ops.Classifier.fitLogistic(train,
      graft.ops.Classifier.textFeatureCols, "y", iters = 30, lr = 0.5)
    // batch 1, two sources with DIFFERENT label regimes: source A's
    // feedback says the mixed band is bad (argmax sits above pMix);
    // source B's says the mixed band is good (argmax sits at/below
    // pMix) — so the recalibrated gates must genuinely differ
    val mem1 = MemoryStream[(Long, String, String, Double)]
    val scored1 = graft.ops.Classifier.scoreLogistic(
      graft.ops.Classifier.textFeatures(
        mem1.toDF().toDF("doc_id", "src", "text", "y"), "text"),
      graft.ops.Classifier.textFeatureCols, w.toSeq)
    val q1 = EventStream.calibrationSinkBy(
        scored1.select("doc_id", "src", "p", "y"), s"$dir/calib",
        "src", "p", "y", appId = "spec-recalg-mon")
      .option("checkpointLocation", s"$dir/ckptM").start()
    try {
      mem1.addData(
        (11L, "A", good1, 1.0), (12L, "A", good2, 1.0),
        (13L, "A", mixed, 0.0), (14L, "A", bad, 0.0),
        (15L, "B", good1, 1.0), (16L, "B", mixed, 1.0),
        (17L, "B", bad, 0.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // per-source re-freeze: read each source's measured operating
    // point from the grouped store (the q_recalibrate_gate_grouped
    // read), collect the bounded map
    val minPBy = graft.ops.CalibrationIndex
      .bestThresholdBy(spark, s"$dir/calib", "src")
      .select("src", "thr").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    def scoreOf(t: String): Double = graft.ops.Classifier.scoreLogistic(
        graft.ops.Classifier.textFeatures(
          Seq((0L, t)).toDF("doc_id", "text"), "text"),
        graft.ops.Classifier.textFeatureCols, w.toSeq)
      .select("p").head().getDouble(0)
    val pMix = scoreOf(mixed)
    assert(minPBy("A") > pMix && minPBy("B") <= pMix,
      s"fixture drifted: per-source gates must differ: $minPBy pMix=$pMix")
    // batch 2: B and C carry text-DISTINCT variants (exact dedup
    // would otherwise collapse cross-source copies to first arrival)
    // suffixed with a STOPWORD — the suffix nudges scores UP, the
    // safe direction for B's keep decision (asserted below)
    assert(scoreOf(mixed + " the") >= minPBy("B") &&
      scoreOf(bad + " the") < minPBy("B") &&
      scoreOf(good1 + " the") >= minPBy("B"),
      "fixture drifted: suffixed B docs must sit on the same side")
    val mem2 = MemoryStream[(Long, String, String)]
    val q2 = EventStream.curateSink(
        mem2.toDF().toDF("doc_id", "src", "text"),
        s"$dir/didx", s"$dir/kept", "text", "doc_id",
        appId = "spec-recalg", minQuality = 0.0, samplePct = 100,
        benchmark = Seq((900L, "benchmark phrase sharing nothing else"))
          .toDF("doc_id", "text"),
        logitBy = Some((w.toSeq, "src", minPBy)))
      .option("checkpointLocation", s"$dir/ckptG").start()
    try {
      mem2.addData(
        (21L, "A", good1), (22L, "A", mixed), (23L, "A", bad),
        (24L, "B", good1 + " the"), (25L, "B", mixed + " the"),
        (26L, "B", bad + " the"),
        (27L, "C", good1 + " the the"))
      q2.processAllAvailable()
    } finally q2.stop()
    val kept = spark.read.parquet(s"$dir/kept")
      .select("doc_id").as[Long].collect().toSet
    // A drops its mixed doc (strict gate), B keeps it (lenient gate),
    // C — no calibrated threshold — drops wholesale
    assert(kept == Set(21L, 24L, 25L),
      s"per-source gates must differ per source: $kept")
  }

  test("streaming calibration sink: accumulated aggregate derives the one-shot prCurve and rocAuc; replay changes nothing") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    // scored-and-labeled rows as a deployed filter would emit them;
    // duplicate scores across batches so the monoid fold is exercised
    val b1 = Seq((1L, 0.91, 1.0), (2L, 0.34, 0.0), (3L, 0.91, 1.0))
    val b2 = Seq((4L, 0.34, 1.0), (5L, 0.77, 0.0), (6L, 0.91, 0.0))
    val mem = MemoryStream[(Long, Double, Double)]
    val q = EventStream.calibrationSink(
        mem.toDF().toDF("doc_id", "p", "y"),
        s"$dir/cal", "p", "y", appId = "spec-cal")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("thr").collect().map(_.toSeq).toSeq
    val oneShot = (b1 ++ b2).toDF("doc_id", "p", "y")
    assert(rows(graft.ops.CalibrationIndex.prCurve(spark, s"$dir/cal"))
        == rows(graft.ops.Classifier.prCurve(oneShot, "p", "y")),
      "accumulated PR curve diverged from the one-shot")
    val aucGot = graft.ops.CalibrationIndex.rocAuc(spark, s"$dir/cal")
      .collect().map(_.toSeq).toSeq
    val aucExp = graft.ops.Classifier.rocAuc(oneShot, "p", "y")
      .collect().map(_.toSeq).toSeq
    assert(aucGot == aucExp, s"AUC diverged: $aucGot vs $aucExp")
    // the two landed micro-batches ARE drift windows: PSI between
    // their tag partitions == the one-shot PSI between the batches
    assert(graft.ops.CalibrationIndex.drift(spark, s"$dir/cal",
        Seq("spec-cal-0"), Seq("spec-cal-1"))
        .collect().map(_.toSeq).toSeq ==
      graft.ops.Classifier.scoreDrift(b1.toDF("doc_id", "p", "y"),
          b2.toDF("doc_id", "p", "y"), "p")
        .collect().map(_.toSeq).toSeq,
      "streamed window drift diverged from the one-shot PSI")
    // at-least-once replay under the same appId: tag partitions
    // overwrite themselves — metrics unchanged
    val mem2 = MemoryStream[(Long, Double, Double)]
    val q2 = EventStream.calibrationSink(
        mem2.toDF().toDF("doc_id", "p", "y"),
        s"$dir/cal", "p", "y", appId = "spec-cal")
      .option("checkpointLocation", s"$dir/ckpt2").start()
    try {
      mem2.addData(b1: _*); q2.processAllAvailable()
      mem2.addData(b2: _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(rows(graft.ops.CalibrationIndex.prCurve(spark, s"$dir/cal"))
        == rows(graft.ops.Classifier.prCurve(oneShot, "p", "y")),
      "replay changed the accumulated curve")
    // the other store-derived monitors agree with their one-shot twins
    assert(graft.ops.CalibrationIndex.ece(spark, s"$dir/cal")
        .collect().map(_.toSeq).toSeq ==
      graft.ops.Classifier.calibrationError(oneShot, "p", "y")
        .collect().map(_.toSeq).toSeq,
      "accumulated ECE diverged from the one-shot")
    assert(graft.ops.CalibrationIndex.brier(spark, s"$dir/cal")
        .collect().map(_.toSeq).toSeq ==
      graft.ops.Classifier.brierScore(oneShot, "p", "y")
        .collect().map(_.toSeq).toSeq,
      "accumulated Brier diverged from the one-shot")
    // compact folds to one row per score; every answer unchanged
    graft.ops.CalibrationIndex.compact(spark, s"$dir/cal")
    assert(rows(graft.ops.CalibrationIndex.prCurve(spark, s"$dir/cal"))
        == rows(graft.ops.Classifier.prCurve(oneShot, "p", "y")),
      "compact changed the curve")
    assert(graft.ops.CalibrationIndex
        .currentAggregate(spark, s"$dir/cal").count() == 3,
      "compact must fold to one row per distinct score")
    // the domain guard holds on the streaming path too: an
    // out-of-[0,1] score kills the batch loudly, not silently
    val mem3 = MemoryStream[(Long, Double, Double)]
    val q3 = EventStream.calibrationSink(
        mem3.toDF().toDF("doc_id", "p", "y"),
        s"$dir/cal2", "p", "y", appId = "spec-cal3")
      .option("checkpointLocation", s"$dir/ckpt3").start()
    try {
      mem3.addData((9L, 3.7, 1.0))
      intercept[Exception] { q3.processAllAvailable() }
      assert(q3.exception.isDefined, "out-of-domain score must fail loud")
    } finally q3.stop()
  }

  test("grouped calibration sink: per-source store reads equal the one-shot grouped metrics over the flow") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val b1 = Seq((1L, "a", 0.91, 1.0), (2L, "b", 0.34, 0.0),
      (3L, "a", 0.91, 1.0))
    val b2 = Seq((4L, "b", 0.34, 1.0), (5L, "a", 0.77, 0.0),
      (6L, "b", 0.91, 0.0))
    val mem = MemoryStream[(Long, String, Double, Double)]
    val q = EventStream.calibrationSinkBy(
        mem.toDF().toDF("doc_id", "g", "p", "y"),
        s"$dir/calg", "g", "p", "y", appId = "spec-calg")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val both = (b1 ++ b2).toDF("doc_id", "g", "p", "y")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(df.columns.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).toSeq
    assert(rows(graft.ops.CalibrationIndex.prCurveBy(spark,
        s"$dir/calg", "g")) ==
      rows(graft.ops.Classifier.prCurveBy(both, "g", "p", "y")),
      "streamed grouped curve diverged from the batch metric")
    // per-source drift between the two landed micro-batch windows
    assert(rows(graft.ops.CalibrationIndex.driftBy(spark,
        s"$dir/calg", "g", Seq("spec-calg-0"), Seq("spec-calg-1"))) ==
      rows(graft.ops.Classifier.scoreDriftBy(
        b1.toDF("doc_id", "g", "p", "y"),
        b2.toDF("doc_id", "g", "p", "y"), "g", "p")),
      "streamed per-source window drift diverged from the one-shot")
  }

  test("streaming components sink: accumulated labels == one-shot CC") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val mem = MemoryStream[(Long, Long)]
    val q = EventStream.componentsSink(mem.toDF().toDF("id_a", "id_b"),
        s"$dir/cidx", appId = "spec-cc")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // batch 2's (3,10) bridges batch 1's two components — the merge
      // must happen against the STORE, not within any single batch
      mem.addData((1L, 2L), (2L, 3L), (10L, 11L))
      q.processAllAvailable()
      mem.addData((3L, 10L), (20L, 21L))
      q.processAllAvailable()
      val got = graft.ops.ComponentsIndex.currentLabels(spark, s"$dir/cidx")
        .as[(Long, Long)].collect().toMap
      val full = graft.ops.DedupOps.connectedComponents(
        Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 10L), (20L, 21L))
          .toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == full, s"streamed=$got one-shot=$full")
      assert(got(11L) == 1L)
    } finally q.stop()
  }

  test("streaming components sink survives a chain-shaped batch by DEFAULT") {
    // a 40-link verbatim-overlap chain in ONE micro-batch exceeds the
    // propagation round budget; the default sink config must ride the
    // auto star fallback instead of killing the streaming query
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val mem = MemoryStream[(Long, Long)]
    val q = EventStream.componentsSink(mem.toDF().toDF("id_a", "id_b"),
        s"$dir/cidx", appId = "spec-chain")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      mem.addData((700L until 740L).map(i => (i, i + 1)): _*)
      q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"chain batch killed the stream: ${q.exception}")
      val labels = graft.ops.ComponentsIndex
        .currentLabels(spark, s"$dir/cidx")
        .as[(Long, Long)].collect().toMap
      assert(labels.size == 41 && (700L to 740L).forall(labels(_) == 700L),
        s"chain not fully contracted: ${labels.filter(_._2 != 700L)}")
    } finally q.stop()
  }

  test("streaming dedup-cluster sink: documents in, maintained labels out") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val mem = MemoryStream[(Long, String)]
    val q = EventStream.dedupClusterSink(mem.toDF().toDF("doc_id", "text"),
        s"$dir/idx", s"$dir/cidx", "text", "doc_id", appId = "spec-dc")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog " * 8
      mem.addData((0L, base),
        (1L, "completely different words about spark engines " * 10))
      q.processAllAvailable()
      // no pairs yet — the label store must not even exist
      assert(!new java.io.File(s"$dir/cidx/byid").exists())
      // two near-dups of doc 0 arrive in separate batches: the second
      // pair is found against the INDEX and must land in doc 0's
      // existing cluster, labeled by the smallest member
      mem.addData((10L, base + "extra tail tokens appended here"))
      q.processAllAvailable()
      mem.addData((20L, base + "another slightly different tail"))
      q.processAllAvailable()
      val got = graft.ops.ComponentsIndex.currentLabels(spark, s"$dir/cidx")
        .as[(Long, Long)].collect().toMap
      assert(got.get(10L).contains(0L) && got.get(20L).contains(0L),
        s"cross-batch cluster incomplete: $got")
      assert(!got.contains(1L), s"unrelated doc joined a cluster: $got")
    } finally q.stop()
  }

  test("streaming heavy-hitter sink: merged partials + recount == one-shot") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val mem = MemoryStream[Option[String]]
    val q = EventStream.heavyHitterSketchSink(mem.toDF().toDF("item"),
        s"$dir/hh", "item", appId = "spec-hh", k = 32)
      .option("checkpointLocation", s"$dir/ckpt").start()
    // the hot item is split across batches so NEITHER batch alone is
    // decisive — only the merged summary + recount sees it heavy
    val b1 = Seq.fill(120)(Some("hot")) ++ (0 until 200).map(i => Some(s"a$i"))
    val b2 = Seq.fill(150)(Some("hot")) ++ Seq.fill(90)(Some("warm")) ++
      (0 until 240).map(i => Some(s"b$i"))
    val b3 = Seq(None, None) // all-null batch: no tag partition
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      val horizon = (b1 ++ b2 ++ b3).toDF("item")
      val got = graft.ops.HeavyHitters.heavyHittersFromSketches(
        spark.read.parquet(s"$dir/hh"), horizon, "item", theta = 0.1)
        .collect().map(_.toString).toSeq
      val oneShot = graft.ops.HeavyHitters.heavyHitters(
        horizon, "item", theta = 0.1)
        .collect().map(_.toString).toSeq
      assert(got == oneShot && got.nonEmpty)
      assert(got.exists(_.contains("hot")), s"cross-batch heavy item lost: $got")
      // the all-null batch must not have landed a tag partition
      val tags = new java.io.File(s"$dir/hh").listFiles()
        .map(_.getName).filter(_.startsWith("batch_tag=")).toSet
      assert(tags.size == 2, s"expected 2 tag partitions, got $tags")
      // a too-ambitious theta (below the sink's capacity floor) must
      // fail LOUDLY, not silently return a non-superset answer
      intercept[IllegalArgumentException] {
        graft.ops.HeavyHitters.heavyHittersFromSketches(
          spark.read.parquet(s"$dir/hh"), horizon, "item", theta = 0.01)
      }
    } finally q.stop()
  }

  test("streaming quantile-sketch sink: merged partials == one-shot sketch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = tmpDir()
    val mem = MemoryStream[Double]
    val q = EventStream.quantileSketchSink(mem.toDF().toDF("v"),
        s"$dir/sketch", "v", appId = "spec-qsk")
      .option("checkpointLocation", s"$dir/ckpt").start()
    val b1 = (1 to 400).map(_ / 7.0)
    val b2 = (1 to 300).map(i => 50.0 + i / 3.0)
    val b3 = Seq(-5.0, 0.0) // quantizes below 1: all dropped
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
      val ps = Seq(0.1, 0.5, 0.9, 0.99)
      // reading back the landed partials and merging must reproduce
      // the sketch (and thus the quantiles) of the whole stream in one
      // pass — the mergeability contract, end-to-end through the sink
      val got = graft.ops.Quantiles.quantilesFromSketch(
        spark.read.parquet(s"$dir/sketch"), ps)
        .collect().map(_.toString).toSeq
      val oneShot = graft.ops.Quantiles.sketchQuantiles(
        (b1 ++ b2 ++ b3).toDF("v"), "v", ps)
        .collect().map(_.toString).toSeq
      assert(got == oneShot)
      // the all-dropped batch must not have landed a tag partition
      val tags = new java.io.File(s"$dir/sketch").listFiles()
        .map(_.getName).filter(_.startsWith("batch_tag=")).toSet
      assert(tags.size == 2, s"expected 2 tag partitions, got $tags")
    } finally q.stop()
  }
}
