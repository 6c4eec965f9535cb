package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** L4/L6/L7: DDL, table-existence probe, and schema reflection against
  * the session catalog — the reference's SQLAlchemy surface
  * (`define_stock_bars_table` at etl_project/assets/assets.py:148-164,
  * `inspect(engine).has_table` at pipelines/stock_bars.py:36, column
  * reflection in connectors/postgresql.py) re-expressed on Spark's
  * catalog. Tables are parquet-backed; primary keys are a load-time
  * contract enforced by the upsert operator, not a storage constraint
  * (Spark, like most warehouse engines, does not enforce PKs).
  */
object CatalogOps {

  /** CREATE TABLE DDL for an explicit schema (the reference's
    * define_stock_bars_table equivalent; `USING PARQUET`). */
  def createTableDdl(table: String, schema: StructType): String =
    s"CREATE TABLE IF NOT EXISTS $table (${schema.toDDL}) USING PARQUET"

  def createTable(spark: SparkSession, table: String,
                  schema: StructType): Unit =
    spark.sql(createTableDdl(table, schema))

  /** L7: existence probe (inspect(engine).has_table). */
  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** L6: schema reflection — read the authoritative schema back from
    * the catalog (the reference reflects via SQLAlchemy metadata). */
  def reflectSchema(spark: SparkSession, table: String): StructType =
    spark.table(table).schema

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** L4, lakehouse-register shape: an EXTERNAL parquet table over data
    * that already exists on storage (`CREATE TABLE ... USING PARQUET
    * LOCATION path`) — the catalog half of every operator here that
    * writes paths ([[graft.ops.Layout]], AnnIndex, DedupIndex):
    * register once, then every engine session (and SQL-only readers)
    * addresses the data by name. Schema is inferred from the files;
    * dropping the table never deletes the data (external semantics).
    * For hive-partitioned layouts pass `partitionedBy` AND call this —
    * it runs the partition-discovery pass (`recoverPartitions`), the
    * step a bare CREATE skips, without which the table reads empty. */
  def createExternalTable(spark: SparkSession, table: String, path: String,
                          partitionedBy: Seq[String] = Nil): Unit = {
    // explicit schema from the files so the PARTITIONED BY clause can
    // name its columns even when they only exist as directory names
    val inferred = spark.read.parquet(path).schema
    val partCols = partitionedBy.map(c =>
      inferred.find(_.name == c).getOrElse(sys.error(
        s"createExternalTable: partition column $c not in $path's schema")))
    val dataCols = inferred.filterNot(f => partitionedBy.contains(f.name))
    val partClause =
      if (partitionedBy.isEmpty) ""
      else s" PARTITIONED BY (${partitionedBy.mkString(", ")})"
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $table (${StructType(dataCols ++ partCols).toDDL})" +
        s" USING PARQUET$partClause LOCATION '$path'")
    if (partitionedBy.nonEmpty) spark.catalog.recoverPartitions(table)
  }
}
