package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY §2/§7.5: each key is one
  * implemented operator run over the driver testdata; `oracleSql` holds the
  * DuckDB twin for the hash-compare gate. Keys without an oracle entry are
  * non-SQL-expressible (approximate / side-effecting) and are covered by
  * ScalaTest instead.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's full window-analytics CTAS
    * (stock_bars_analysis.sql:4-35) over the events series. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q_full_analysis")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ ExtQueries.queries ++ RelQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ ExtQueries.oracle ++ RelQueries.oracle
}
