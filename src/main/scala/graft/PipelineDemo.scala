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

    // Serving publish: the reference's final hop — the analysis result
    // lands in the relational store through the JDBC connector
    // (drop-and-recreate, the CTAS semantics of
    // stock_bars_analysis.sql:2-3; connector mirrors
    // connectors/postgresql.py). Derby embedded stands in for Postgres.
    try {
      val jdbc = new graft.io.JdbcClient(s"jdbc:derby:$work/serving;create=true")
      jdbc.overwrite(spark.table(s"${table}_analysis"), s"${table}_analysis")
      val served = jdbc.selectAll(spark, s"${table}_analysis").count()
      println(s"[demo] published $served rows to the JDBC serving store")
      audit.log(s"$table: analysis published to serving store ($served rows)")
    } catch {
      case e: Exception => println(s"[demo] serving publish FAILED: ${e.getMessage}")
    }

    // S1 live-extract demo: the paginated HTTP client against an
    // offline scripted transport (two pages, split mid-symbol), landed,
    // scanned, and loaded through the same incremental runner. Its own
    // failure domain, like every other stage: the audit trail and the
    // final verification below must print regardless.
    try {
      import graft.io.BarsHttpClient
      def bar(o: Double, n: Long, t: String) =
        s"""{"c":${o + 1},"h":$o,"l":$o,"n":$n,"o":$o,"t":"$t","v":${n * 10},"vw":$o}"""
      val pages = Map(
        Option.empty[String] ->
          s"""{"bars":{"TSLA":[${bar(250.0, 1, "2025-10-01T10:00:00Z")}]},"next_page_token":"p2"}""",
        Option("p2") ->
          s"""{"bars":{"TSLA":[${bar(252.0, 2, "2025-10-02T10:00:00Z")}],"AAPL":[${bar(170.0, 3, "2025-10-01T10:00:00Z")}]},"next_page_token":null}""")
      val client = new BarsHttpClient("demo-key", "demo-secret",
        (url, _) => (200, pages("(?:\\?|&)page_token=([^&]+)".r
          .findFirstMatchIn(url).map(_.group(1)))))
      val barsFrame = runner.extractBars(client, s"$work/bars_landing",
        "TSLA,AAPL", "1Day", "2025-10-01")
      val nb = runner.loadIncremental(barsFrame, s"$work/stock_bars",
        "stock_bars", Seq("stock", "timestamp"), "timestamp")
      println(s"[demo] bars extract: paginated fetch -> $nb bars loaded " +
        s"(reference client would have truncated to page 1)")
    } catch {
      case e: Exception => println(s"[demo] bars extract FAILED: ${e.getMessage}")
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
