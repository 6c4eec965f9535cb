package graft

import graft.io.{CatalogOps, Tables}

/** L4 (DDL create), L6 (schema reflection), L7 (existence probe) against
  * the session catalog, with the reference's stock_bars schema. */
class CatalogOpsSpec extends SparkSpec {
  import spark.implicits._

  test("create / probe / reflect / insert / drop round-trip") {
    val t = "cat_stock_bars"
    CatalogOps.dropTable(spark, t)
    assert(!CatalogOps.tableExists(spark, t))

    CatalogOps.createTable(spark, t, Tables.stockBarsSchema)
    assert(CatalogOps.tableExists(spark, t))
    // idempotent (IF NOT EXISTS)
    CatalogOps.createTable(spark, t, Tables.stockBarsSchema)

    // reflected schema matches the declared one (names + types)
    val reflected = CatalogOps.reflectSchema(spark, t)
    assert(reflected.fields.map(f => (f.name, f.dataType)).toSeq ==
      Tables.stockBarsSchema.fields.map(f => (f.name, f.dataType)).toSeq)

    // the created table accepts the reference fixture row
    spark.sql(s"""INSERT INTO $t VALUES
      |('TSLA', 'Tesla Inc', '2025-10-01T10:00:00Z', 250.0, 255.0, 245.0,
      | 252.0, 1000000, 251.5, 5000)""".stripMargin)
    assert(spark.table(t).count() == 1)
    assert(spark.table(t).select("stock").as[String].head() == "TSLA")

    CatalogOps.dropTable(spark, t)
    assert(!CatalogOps.tableExists(spark, t))
  }
}
