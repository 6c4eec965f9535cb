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
}
