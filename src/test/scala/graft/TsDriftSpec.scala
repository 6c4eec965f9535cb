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
}
