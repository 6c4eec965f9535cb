package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1: fact ⋈ small-dimension enrichment join
  * (reference: etl_project/assets/assets.py:93-102 — pandas inner merge
  * against a 10-row company dimension, then drop the duplicate key and
  * rename).
  *
  * Scale: the dimension side is broadcast explicitly — at 100 TB the
  * fact side never shuffles for this join (`BroadcastHashJoinExec`,
  * zero exchanges on the probe side). Left/semi/anti variants fall out
  * of the same call for engine completeness (SURVEY §2.3).
  */
object Enrich {
  def enrich(fact: DataFrame, dim: DataFrame, factKey: String,
             dimKey: String, joinType: String = "inner",
             dropDimCols: Seq[String] = Nil): DataFrame = {
    // the dim-side key is dropped unconditionally below; under right or
    // full joins that would make dim-only rows' keys irrecoverable.
    // Normalize the way Spark's JoinType does (case-insensitive,
    // underscores stripped) so valid spellings keep working.
    val jt = joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")
    require(Seq("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti").contains(jt),
      s"enrich: joinType '$joinType' would lose the dropped dim key " +
        "for unmatched dim rows; use a plain join for right/full")
    val joined = fact.join(broadcast(dim),
      fact(factKey) === dim(dimKey), joinType)
    (dropDimCols :+ dimKey).foldLeft(joined)((d, c) => d.drop(dim(c)))
  }
}
