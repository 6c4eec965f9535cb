package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.pipeline.{PipelineConfig, SqlScripts}

/** S5 (templated-SQL directory runner) + S6 (YAML pipeline config). */
class SqlScriptsSpec extends SparkSpec {

  test("statement splitter: quotes and comments never split") {
    val stmts = SqlScripts.splitStatements(
      """-- leading comment; with semicolon
        |SELECT 'a;b' AS x; -- trailing; comment
        |SELECT 2
        |""".stripMargin)
    assert(stmts == Seq("SELECT 'a;b' AS x", "SELECT 2"))
    // bracketed comments: a ';' or quote inside /* */ is inert
    val br = SqlScripts.splitStatements(
      "SELECT 1; /* step two; don't split */ SELECT 2")
    assert(br == Seq("SELECT 1", "/* step two; don't split */ SELECT 2"))
    // bracketed comments NEST in Spark SQL (3.0+): the inner close must
    // not end the outer comment, so the commented-out ';' stays inert
    val nested = SqlScripts.splitStatements(
      "SELECT 1 /* outer /* inner */ ; still comment */; SELECT 2")
    assert(nested == Seq(
      "SELECT 1 /* outer /* inner */ ; still comment */", "SELECT 2"))
  }

  test("render substitutes {{ var }} and fails fast on unbound names") {
    assert(SqlScripts.render("SELECT * FROM {{table}} WHERE {{ table }}.x=1",
      Map("table" -> "t")) == "SELECT * FROM t WHERE t.x=1")
    intercept[RuntimeException] {
      SqlScripts.render("SELECT {{ nope }}", Map.empty)
    }
  }

  test("flagship .sql file run == q_full_analysis (identical rows)") {
    val dir = tmpDir()
    Tables.read(spark, "/root/testdata/sf0.001", "events")
      .select("event_type", "event_id", "ts", "value")
      .createOrReplaceTempView("ev_file")
    // two files to prove filename ordering: 01_ creates, 02_ reads
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/01_analysis.sql"),
      "DROP TABLE IF EXISTS flagship_out;\n" +
        "CREATE TABLE flagship_out AS\n" +
        AnalysisSql.flagshipSql("{{ table }}") + ";\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/02_read.sql"),
      "SELECT count(*) AS n FROM flagship_out")
    val ran = SqlScripts.run(spark, dir, Map("table" -> "ev_file"))
    assert(ran.map(_._1) == Seq("01_analysis.sql", "02_read.sql"))

    val fromFile = spark.table("flagship_out")
    val direct = CoreQueries.queries("q_full_analysis")(
      spark, "/root/testdata/sf0.001")
    assert(fromFile.count() == direct.count())
    assert(fromFile.exceptAll(direct.selectExpr(fromFile.columns: _*)).count() == 0)
    assert(direct.selectExpr(fromFile.columns: _*).exceptAll(fromFile).count() == 0)
    spark.sql("DROP TABLE IF EXISTS flagship_out")
  }

  test("config: reference-shaped yaml parses to dotted keys") {
    val cfg = PipelineConfig.parse(
      """name: alpaca
        |config:
        |  stock_symbol_relative_path: etl_project/data/top_tech_stock_symbol.csv
        |  load_method: upsert   # inline comment
        |  source_table_name: "stock_bars"
        |  checkpoint_table_name: check_points
        |""".stripMargin)
    assert(cfg("name") == "alpaca")
    assert(cfg("config.load_method") == "upsert")
    assert(cfg("config.source_table_name") == "stock_bars")
    assert(cfg.get("config.missing").isEmpty)
    intercept[NoSuchElementException] { cfg("config.missing") }
    // YAML comment rules: '#' with no preceding whitespace is VALUE text
    val frag = PipelineConfig.parse(
      "url: jdbc:mysql://host/db#shard1  # the real comment\n")
    assert(frag("url") == "jdbc:mysql://host/db#shard1")
  }

  test("config: the checked-in pipeline yaml loads and is complete") {
    val cfg = PipelineConfig.load(spark, "conf/events_pipeline.yaml")
    assert(cfg("name") == "events")
    assert(cfg("config.source_table_name") == "events_bars")
    assert(cfg("config.analysis_sql_dir") == "conf/sql")
    // and the configured sql dir contains runnable scripts
    assert(SqlScripts.listScripts(spark, cfg("config.analysis_sql_dir"))
      .map(_.getName).contains("01_events_analysis.sql"))
  }
}
