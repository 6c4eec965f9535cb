package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.meta.AuditLog
import graft.pipeline.{PipelineConfig, Runner, SqlScripts}
import graft.state.Checkpoint

/** End-to-end usage demo: the reference's full pipeline lifecycle
  * (config load -> extract -> incremental load with checkpoint ->
  * templated-SQL analysis -> audit log; reference:
  * etl_project/pipelines/stock_bars.py:22-134) run against the events
  * testdata, split into two incremental batches to exercise the
  * full-vs-incremental branch and overlap dedup.
  *
  * Table names, load method, and the analysis SQL directory all come
  * from the YAML config (S6, conf/events_pipeline.yaml), and the
  * analysis stage executes every `.sql` template in the configured
  * directory (S5), exactly like the reference's Jinja-over-directory
  * runner (assets/assets.py:166-170).
  *
  * Usage: runMain graft.PipelineDemo [sfDir] [workDir] [configPath]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val work = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val configPath = args.lift(2).getOrElse("conf/events_pipeline.yaml")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = PipelineConfig.load(spark, configPath)
    val table = cfg("config.source_table_name")
    val loadMethod = cfg.getOrElse("config.load_method", "upsert")
    println(s"[demo] config '${cfg("name")}': table=$table method=$loadMethod")

    val cp = new Checkpoint(spark, s"$work/${cfg("config.checkpoint_table_name")}")
    val audit = new AuditLog(spark, s"$work/audit")
    val runner = new Runner(spark, cp, audit)
    val events = Tables.read(spark, sfDir, "events")
      .select("event_type", "event_id", "ts", "value")
    val keys = Seq("event_type", "event_id")

    // batch 1: first 20 days -> full load path
    val b1 = events.filter(col("ts") < lit("2024-01-21").cast("timestamp"))
    val n1 = runner.loadIncremental(b1, s"$work/$table", table, keys, "ts")
    println(s"[demo] full load: $n1 rows, checkpoint=${cp.get(table)}")

    // batch 2: everything from day 18 on -> incremental path with overlap
    val b2 = events.filter(col("ts") >= lit("2024-01-18").cast("timestamp"))
    val n2 = runner.loadIncremental(b2, s"$work/$table", table, keys, "ts")
    println(s"[demo] incremental load: $n2 rows, checkpoint=${cp.get(table)}")

    // analysis stage: run every .sql template in the configured dir
    // against the loaded table (isolated failure domain, like the
    // reference's second try/except)
    spark.read.parquet(s"$work/$table").createOrReplaceTempView(table)
    try {
      audit.log(s"$table: sql-script analysis starting")
      val ran = SqlScripts.run(spark, cfg("config.analysis_sql_dir"),
        Map("table" -> table))
      audit.log(s"$table: sql-script analysis complete (${ran.size} scripts)")
      val analyzed = spark.table(s"${table}_analysis").count()
      println(s"[demo] analysis scripts=${ran.map(_._1).mkString(",")} rows=$analyzed")
    } catch {
      case e: Exception =>
        audit.log(s"$table: sql-script analysis FAILED: ${e.getMessage}")
        println(s"[demo] analysis FAILED: ${e.getMessage}")
    }

    println(s"[demo] audit trail:")
    audit.read().orderBy("timestamp")
      .collect().foreach(r => println(s"  ${r.get(0)}  ${r.get(1)}"))
    val total = spark.read.parquet(s"$work/$table").count()
    val expected = events.count()
    println(s"[demo] final=$total expected=$expected match=${total == expected}")
    spark.stop()
  }
}
