package graft

/** The flagship window-analysis query as Spark-dialect SQL text — the
  * single source for both the S4 literal-SQL path
  * ([[RelQueries]] `q_full_analysis_sql`) and the S5 templated-SQL
  * script files (reference: etl_project/assets/sql/transform/
  * stock_bars_analysis.sql:1-35, which the reference executes verbatim
  * against Postgres via its script runner, assets/assets.py:166-170).
  */
object AnalysisSql {

  /** Guarded HALF_UP rounding in Spark SQL — delegates to the ONE
    * parity-critical definition ([[graft.functions.Rounding.sqlRound]])
    * with the DOUBLE cast Spark's BIGINT-returning `floor` needs. */
  def sparkRound(expr: String, n: Int): String =
    graft.functions.Rounding.sqlRound(expr, n, castDouble = true)

  /** The full analysis SELECT over `table`, which must expose
    * (event_type, event_id, ts, value). Mirrors stock_bars_analysis.sql
    * including its double-rounding of the pct column (sql:21 then :31). */
  def flagshipSql(table: String): String = {
    val ret = sparkRound("(value - prev_value) / nullif(prev_value, 0.0)", 3)
    s"""WITH prev AS (
       |  SELECT event_type, event_id, ts, CAST(ts AS DATE) AS dt, value,
       |         LAG(value, 1) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_value
       |  FROM $table),
       |ret AS (
       |  SELECT *, $ret AS daily_return FROM prev)
       |SELECT event_type, event_id, dt, value, prev_value, daily_return,
       |       ${sparkRound("daily_return * 100", 1)} AS daily_return_pct,
       |       ${sparkRound("AVG(value) OVER w", 2)} AS moving_avg_5,
       |       ${sparkRound("STDDEV_SAMP(daily_return) OVER w", 2)} AS stddev_5
       |FROM ret
       |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
       |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
       |ORDER BY event_type, ts, event_id""".stripMargin
  }
}
