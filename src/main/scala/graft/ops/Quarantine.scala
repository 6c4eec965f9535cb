package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level quarantine routing — the DQ counterpart of
  * [[graft.ops]]'s q_dq_checks metrics: instead of one gating verdict,
  * every row is tagged with the names of the rules it violates, and the
  * pipeline splits into a clean stream and a quarantine stream (the
  * standard bad-row sidetable pattern: load proceeds, violations are
  * preserved with full context for triage instead of failing the run or
  * silently dropping).
  *
  * Map-side only: rules are plain column predicates evaluated in one
  * projection; no shuffle, no second scan — `split` returns two lazy
  * filters over the SAME tagged plan, so a caller writing both streams
  * scans the input once per sink (or once total with a persisted tag
  * stage).
  */
object Quarantine {

  /** Tag every row with a comma-joined list of violated rule names
    * (empty string = clean). Rule predicates should be true WHEN
    * VIOLATED. Null predicate results (from null inputs) count as not
    * violated — route null-handling through an explicit isNull rule. */
  def tag(df: DataFrame, rules: Seq[(String, Column)],
          reasonsCol: String = "reasons"): DataFrame = {
    require(rules.nonEmpty, "quarantine: at least one rule")
    // the delimiter is load-bearing: a comma inside a rule name would
    // make the reasons list unparseable downstream
    val bad = rules.map(_._1).filter(n => n.isEmpty || n.contains(","))
    require(bad.isEmpty,
      s"quarantine: rule names must be non-empty and comma-free: $bad")
    Reserved.requireAbsent(df, "quarantineTag", Seq(reasonsCol))
    df.withColumn(reasonsCol,
      concat_ws(",", rules.map { case (n, c) => when(c, lit(n)) }: _*))
  }

  /** (clean, quarantined) split over one tagged plan. */
  def split(df: DataFrame, rules: Seq[(String, Column)],
            reasonsCol: String = "reasons"): (DataFrame, DataFrame) = {
    val tagged = tag(df, rules, reasonsCol)
    (tagged.filter(col(reasonsCol) === "").drop(reasonsCol),
      tagged.filter(col(reasonsCol) =!= ""))
  }
}
