package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff: classify every primary key across two versions of a
  * table as `added` / `removed` / `changed` (unchanged rows are
  * omitted). The data-engineering regression tool: diff today's load
  * against yesterday's, diff a backfill against production, assert a
  * migration is a no-op.
  *
  * One full outer join on the PK — a single co-partitioned shuffle of
  * both snapshots, the minimum any content diff can do without a
  * pre-shared layout (bucket both snapshots by the PK to drop even
  * that). Non-PK columns are compared as a struct with null-safe
  * equality, so a column flipping to/from NULL registers as changed. */
object Diff {

  /** @param pk primary-key columns (same names both sides); all other
    *           columns (the intersection, in `oldDf`'s order) are the
    *           compared payload. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   pk: Seq[String]): DataFrame = {
    require(pk.nonEmpty)
    Reserved.requireAbsent(oldDf, "snapshotDiff",
      Seq("_v_old", "_v_new", "change_type"))
    Reserved.requireAbsent(newDf, "snapshotDiff",
      Seq("_v_old", "_v_new", "change_type"))
    // case-INSENSITIVE intersection, matching Spark's resolver: a
    // case-sensitive contains() would silently drop a differently-cased
    // column from the payload and report its changes as 'unchanged'
    val newLower = newDf.columns.map(_.toLowerCase).toSet
    val payload = oldDf.columns.filterNot(pk.contains)
      .filter(c => newLower.contains(c.toLowerCase)).toSeq
    // struct built BEFORE the join: a PK absent from one side yields a
    // NULL struct there (join-filled), never a struct of nulls; the
    // lit marker keeps the struct non-empty when every column is a PK
    def packed(df: DataFrame, tag: String) = df.select(
      pk.map(col) :+ struct(payload.map(col) :+ lit(1).as("_present"): _*)
        .as(s"_v_$tag"): _*)
    packed(oldDf, "old").join(packed(newDf, "new"), pk, "full_outer")
      .withColumn("change_type",
        when(col("_v_old").isNull, "added")
          .when(col("_v_new").isNull, "removed")
          .when(!(col("_v_old") <=> col("_v_new")), "changed")
          .otherwise("unchanged"))
      .filter(col("change_type") =!= "unchanged")
      .select(pk.map(col) :+ col("change_type"): _*)
  }
}
