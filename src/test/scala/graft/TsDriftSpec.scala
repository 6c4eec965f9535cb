package graft

import org.apache.spark.sql.functions._

/** Testdata-drift early warning. The driver regenerates /root/testdata
  * under the repo between rounds; in round 9 `events.ts` flipped
  * TIMESTAMP -> TIMESTAMP_NTZ and two keys (q_sessionize,
  * q_range_frame) failed ANALYSIS — but only in the driver's gate,
  * because nothing in-repo exercised the other flavor. This spec
  * analyzes EVERY query key against an events table of each timestamp
  * flavor, so the next type drift fails loudly here first.
  *
  * Analysis-only on purpose: `queryExecution.analyzed` resolves every
  * expression (which is where type mismatches like
  * DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE surface) without running
  * the query. Keys with eager driver-side construction (clustering
  * seeds, pagerank rounds) execute their small sf0.001 jobs as part of
  * DataFrame construction — that cost is theirs by design. */
class TsDriftSpec extends SparkSpec {

  test("every query key analyzes under both TIMESTAMP and TIMESTAMP_NTZ events") {
    val src = "/root/testdata/sf0.001"
    for (flavor <- Seq("timestamp", "timestamp_ntz")) {
      // variant dir: symlink every table except events, rewrite events
      // with ts cast to the flavor (UTC session: the cast between the
      // two flavors is value-preserving, so plans that DO execute at
      // construction see identical data)
      val dir = java.nio.file.Files.createTempDirectory(s"ts_drift_$flavor")
      dir.toFile.deleteOnExit()
      for (n <- graft.io.Tables.names if n != "events")
        java.nio.file.Files.createSymbolicLink(
          dir.resolve(s"$n.parquet"),
          java.nio.file.Paths.get(s"$src/$n.parquet"))
      graft.io.Tables.read(spark, src, "events")
        .withColumn("ts", col("ts").cast(flavor))
        .write.parquet(dir.resolve("events.parquet").toString)
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try {
            fn(spark, dir.toString).queryExecution.analyzed
            None
          } catch {
            case e: Throwable =>
              Some(s"$name [$flavor]: ${e.toString.linesIterator.next()}")
          }
      }
      assert(failures.isEmpty,
        s"keys failing analysis under $flavor events:\n${failures.mkString("\n")}")
    }
  }

  test("NTZ gap arithmetic is session-timezone-independent " +
      "(sessionize/range_frame across a DST transition)") {
    // events.ts IS TIMESTAMP_NTZ in current testdata; the hazard
    // (ADVICE r10) was cast("timestamp") reinterpreting NTZ wall-clock
    // values per-session-zone before unix_micros. The real testdata
    // spans Jan 2024 only (no DST edge — every zone agrees on gaps up
    // to a constant), so this fixture straddles America/New_York's
    // 2024-03-10 spring-forward: 01:50 -> 03:05 wall-clock is a 75-min
    // gap (new session; outside a 1-h range frame) but only 15 min of
    // NY civil time. The old LTZ round-trip flipped both decisions
    // under a NY session; the timestamp_ntz route must not.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ts_dst")
    dir.toFile.deleteOnExit()
    for (n <- graft.io.Tables.names if n != "events")
      java.nio.file.Files.createSymbolicLink(
        dir.resolve(s"$n.parquet"),
        java.nio.file.Paths.get(s"/root/testdata/sf0.001/$n.parquet"))
    Seq(
      (1L, "2024-03-10 01:20:00", 7L, "view", 1.0, "{}"),
      (2L, "2024-03-10 01:50:00", 7L, "view", 2.0, "{}"),
      (3L, "2024-03-10 03:05:00", 7L, "view", 4.0, "{}"),
      (4L, "2024-03-10 03:20:00", 7L, "view", 8.0, "{}"))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp_ntz")).drop("ts_s")
      .write.parquet(dir.resolve("events.parquet").toString)
    for (key <- Seq("q_sessionize", "q_range_frame")) {
      val utc = SparkEntry.queries(key)(spark, dir.toString).collect().toSeq
      val prev = spark.conf.get("spark.sql.session.timeZone")
      val nyc =
        try {
          spark.conf.set("spark.sql.session.timeZone", "America/New_York")
          SparkEntry.queries(key)(spark, dir.toString).collect().toSeq
        } finally spark.conf.set("spark.sql.session.timeZone", prev)
      assert(nyc == utc, s"$key drifts under America/New_York")
    }
    // the fixture itself must exercise the edge: 01:50 -> 03:05 starts
    // a new session in wall-clock terms
    val sess = SparkEntry.queries("q_sessionize")(spark, dir.toString)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(sess(2L) == 1L && sess(3L) == 2L,
      s"fixture lost its DST-edge session split: $sess")
  }
}
