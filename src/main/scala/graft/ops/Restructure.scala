package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Flatten / project / rename / cast / filter operators — the reference's
  * pandas-side restructuring surface (SURVEY §2.2), as pure
  * `DataFrame => DataFrame` functions. All are narrow (no shuffle):
  * at 100 TB they run map-side inside whole-stage codegen, and the
  * filters/projections push down into the parquet scan.
  */
object Restructure {

  /** F1: flatten a map<symbol -> array<struct bar>> into one row per bar
    * with the symbol injected as a column
    * (reference: etl_project/assets/assets.py:54-68). Implemented as
    * `explode(map)` then struct expansion — Spark's Generate operator,
    * fully distributed (the reference loops in driver memory).
    */
  def flattenMapOfArrays(df: DataFrame, mapCol: String,
                         keyName: String): DataFrame = {
    // the working names and the key must not collide with the bar
    // struct's fields — a clash would surface as an ambiguous-column
    // failure (or a silent duplicate) downstream of the `_bar.*` expand
    require(keyName != "_bars" && keyName != "_bar",
      s"flattenMapOfArrays: keyName '$keyName' collides with a working column")
    df.select(explode(col(mapCol)).as(Seq(keyName, "_bars")))
      .select(col(keyName), explode(col("_bars")).as("_bar"))
      .select(col(keyName), col("_bar.*"))
  }

  /** F2: bulk column rename (reference: etl_project/assets/assets.py:79-91).
    * The reference's raw-feed map: single-letter fields -> bar schema. */
  val barRenameMap: Map[String, String] = Map(
    "c" -> "close", "h" -> "high", "l" -> "low",
    "n" -> "number_of_trades", "o" -> "open", "t" -> "timestamp",
    "v" -> "volume", "vw" -> "volume_weighted_avg_price",
    "symbol" -> "stock")

  def renameAll(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.withColumnsRenamed(renames)

  /** F3: string -> timestamp (reference: etl_project/assets/assets.py:76). */
  def castTs(c: Column): Column = to_timestamp(c)

  /** F4: (string -> timestamp) -> date
    * (reference: etl_project/assets/sql/transform/stock_bars_analysis.sql:18). */
  def castDate(c: Column): Column = to_date(to_timestamp(c))

  /** F6: canonical projection / column reorder
    * (reference: etl_project/assets/assets.py:105-107). */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** F7: equality filter (reference: etl_project/utilities/utilities.py:11-15).
    * Pushes into the scan (check PushedFilters). */
  def filterEq(df: DataFrame, c: String, v: Any): DataFrame =
    df.filter(col(c) === lit(v))

  /** F8: incremental watermark filter — rows at or after the checkpoint
    * (reference: etl_project/pipelines/stock_bars.py:42-57). At scale this
    * is the partition-pruning predicate: with the fact table partitioned
    * or sorted by the order column, Catalyst prunes whole files. */
  def filterFrom(df: DataFrame, c: String, watermark: Column): DataFrame =
    df.filter(col(c) >= watermark)

  /** Schema evolution at the ingestion boundary: conform `df` to
    * `target` — the standard helper that lets a pipeline keep accepting
    * a source after additive schema changes.
    *
    *  - a target column missing from the batch is added as typed NULL
    *    (the additive-evolution case: old files, new table schema);
    *  - a present column with a different type is cast (Cast.canUpCast
    *    guards it: only lossless widenings like int->long or
    *    float->double are accepted; a lossy or senseless cast fails
    *    loudly at conform time, not as silent corruption downstream);
    *  - EXTRA batch columns are rejected, not dropped — silently
    *    discarding data a source started sending is how pipelines lose
    *    columns for months. Drop explicitly upstream if intended.
    *
    * Output column order matches `target` (the reference's canonical
    * projection, F6). Pure map-side, codegen-friendly: no shuffle. */
  def conformSchema(df: DataFrame,
                    target: org.apache.spark.sql.types.StructType): DataFrame = {
    val have = df.schema.map(f => f.name.toLowerCase -> f).toMap
    val targetNames = target.map(_.name.toLowerCase).toSet
    val extra = df.columns.filterNot(c => targetNames.contains(c.toLowerCase))
    require(extra.isEmpty,
      s"conformSchema: batch has columns absent from the target schema: " +
        s"${extra.mkString(", ")} — drop or map them explicitly")
    val cols = target.map { f =>
      have.get(f.name.toLowerCase) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(src) if src.dataType == f.dataType => col(src.name).as(f.name)
        case Some(src) =>
          require(org.apache.spark.sql.catalyst.expressions.Cast
              .canUpCast(src.dataType, f.dataType),
            s"conformSchema: column '${f.name}' cannot be safely cast from " +
              s"${src.dataType.simpleString} to ${f.dataType.simpleString}")
          col(src.name).cast(f.dataType).as(f.name)
      }
    }
    df.select(cols: _*)
  }
}
