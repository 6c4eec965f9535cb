package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.meta.AuditLog
import graft.ops.Windows
import graft.pipeline.Runner
import graft.state.Checkpoint

/** End-to-end usage demo: the reference's full pipeline lifecycle
  * (extract -> incremental load with checkpoint -> window analysis ->
  * audit log; reference: etl_project/pipelines/stock_bars.py:33-134)
  * run against the events testdata, split into two incremental batches
  * to exercise the full-vs-incremental branch and overlap dedup.
  *
  * Usage: runMain graft.PipelineDemo [sfDir] [workDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cp = new Checkpoint(spark, s"$work/checkpoints")
    val audit = new AuditLog(spark, s"$work/audit")
    val runner = new Runner(spark, cp, audit)
    val events = Tables.read(spark, sfDir, "events")
      .select("event_type", "event_id", "ts", "value")
    val keys = Seq("event_type", "event_id")

    // batch 1: first 20 days -> full load path
    val b1 = events.filter(col("ts") < lit("2024-01-21").cast("timestamp"))
    val n1 = runner.loadIncremental(b1, s"$work/events", "events", keys, "ts")
    println(s"[demo] full load: $n1 rows, checkpoint=${cp.get("events")}")

    // batch 2: everything from day 18 on -> incremental path with overlap
    val b2 = events.filter(col("ts") >= lit("2024-01-18").cast("timestamp"))
    val n2 = runner.loadIncremental(b2, s"$work/events", "events", keys, "ts")
    println(s"[demo] incremental load: $n2 rows, checkpoint=${cp.get("events")}")

    // analysis stage over the loaded table (isolated failure domain)
    val ok = runner.runAnalysis("events_analysis", s"$work/events_analysis") {
      Windows.barAnalysis(spark.read.parquet(s"$work/events"),
        "event_type", "ts", "event_id", "value")
    }
    val analyzed = spark.read.parquet(s"$work/events_analysis").count()
    println(s"[demo] analysis ok=$ok rows=$analyzed")
    println(s"[demo] audit trail:")
    audit.read().orderBy("timestamp")
      .collect().foreach(r => println(s"  ${r.get(0)}  ${r.get(1)}"))
    val total = spark.read.parquet(s"$work/events").count()
    val expected = events.count()
    println(s"[demo] final=$total expected=$expected match=${total == expected}")
    spark.stop()
  }
}
