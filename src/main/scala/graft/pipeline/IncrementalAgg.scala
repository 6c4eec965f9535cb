package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable partial aggregates for incrementally-maintained rollup
  * tables: the aggregate table stores only states that merge
  * associatively across batches — count, decimal-exact sum, min, max.
  * Ratios (avg = sum/n) derive at read time; storing them would make
  * the partials non-mergeable and force full recomputes.
  *
  * Scale story: a daily batch touching d dates re-aggregates d
  * partitions of the rollup table, never the full history — the
  * aggregate-table analogue of Runner.loadIncremental's dynamic
  * partition overwrite. At 100 TB of detail, the rollup stays
  * maintainable in O(batch) work per run.
  */
object IncrementalAgg {

  private def groupCols(keys: Seq[String]) = col("dt") +: keys.map(col)

  /** Per-(dt, keys) partial states of a raw batch. `dateCol` must be a
    * DATE column (it becomes the `dt` partition column of the stored
    * rollup). The sum runs in DECIMAL so merge order can never shift a
    * bit of the stored state. */
  def partials(batch: DataFrame, dateCol: String, keys: Seq[String],
               valueCol: String): DataFrame =
    batch.groupBy(col(dateCol).as("dt") +: keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,6)")).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge stored partials with a batch's partials (same schema): one
    * hash aggregation, every state column combined with its own merge
    * function. */
  def merge(stored: DataFrame, fresh: DataFrame, keys: Seq[String]): DataFrame =
    stored.unionByName(fresh)
      .groupBy(groupCols(keys): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Read-side finalization: the derived metrics the partials support. */
  def finalized(rollup: DataFrame): DataFrame =
    rollup.withColumn("avg_v",
      (col("sum_v") / col("n")).cast("double"))
}
