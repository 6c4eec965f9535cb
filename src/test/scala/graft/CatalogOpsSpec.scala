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

  test("external table registers an existing parquet path; drop keeps the data") {
    val dir = tmpDir() + "/ext_flat"
    (1L to 50L).toDF("id").write.parquet(dir)
    val t = "cat_ext_flat"
    CatalogOps.dropTable(spark, t)
    CatalogOps.createExternalTable(spark, t, dir)
    assert(spark.table(t).count() == 50)
    CatalogOps.createExternalTable(spark, t, dir) // idempotent
    CatalogOps.dropTable(spark, t)
    // external semantics: the files survive the drop and re-register
    assert(spark.read.parquet(dir).count() == 50)
    CatalogOps.createExternalTable(spark, t, dir)
    assert(spark.table(t).count() == 50)
    CatalogOps.dropTable(spark, t)
  }

  test("partitioned external table recovers partitions and prunes on them") {
    val dir = tmpDir() + "/ext_part"
    Seq((1L, "a", 10), (2L, "a", 20), (3L, "b", 30))
      .toDF("id", "grp", "v")
      .write.partitionBy("grp").parquet(dir)
    val t = "cat_ext_part"
    CatalogOps.dropTable(spark, t)
    CatalogOps.createExternalTable(spark, t, dir, partitionedBy = Seq("grp"))
    // without recoverPartitions this reads 0 rows — the discovery pass
    // is the load-bearing half of the partitioned register
    assert(spark.table(t).count() == 3)
    assert(spark.table(t).filter($"grp" === "a").count() == 2)
    // partition pruning reaches the scan: only grp=a's directory is read
    val plan = spark.table(t).filter($"grp" === "a")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("grp=b"), "pruned partition must not be scanned")
    // a column that only exists as a directory name is still queryable
    assert(spark.table(t).select("grp").distinct().count() == 2)
    CatalogOps.dropTable(spark, t)
    intercept[RuntimeException](
      CatalogOps.createExternalTable(spark, t, dir, partitionedBy = Seq("nope")))
  }
}
