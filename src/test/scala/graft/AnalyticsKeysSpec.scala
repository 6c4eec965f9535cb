package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-5 analytics keys whose ground truth is
  * the DuckDB oracle (scripts/check.py): these lock the *algebraic*
  * properties so a refactor that silently changes semantics fails fast
  * even without the oracle harness.
  */
class AnalyticsKeysSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(key: String) = SparkEntry.queries(key)(spark, sf)

  test("q_vwap: weighted mean is bounded by the group's price range") {
    val li = graft.io.Tables.read(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"),
        trunc(to_date(col("l_shipdate")), "month").as("ship_month"))
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
    val bad = run("q_vwap").join(li, Seq("l_returnflag", "ship_month"))
      .filter(col("vwap") < col("lo") - 0.001 || col("vwap") > col("hi") + 0.001)
    assert(bad.count() == 0)
    assert(run("q_vwap").filter(col("total_qty") <= 0).count() == 0)
  }

  test("q_argminmax: arg values fall inside [min, max]") {
    val bad = run("q_argminmax").filter(
      col("first_value") < col("min_value") || col("first_value") > col("max_value") ||
      col("last_value") < col("min_value") || col("last_value") > col("max_value"))
    assert(bad.count() == 0)
    // arg ordering is the unique event_id: last_value must equal the
    // value at the group's max event_id
    val ev = graft.io.Tables.read(spark, sf, "events")
    val expect = ev.join(
        ev.groupBy("event_type").agg(max("event_id").as("event_id")),
        Seq("event_type", "event_id"))
      .select(col("event_type"), col("value").as("expect_last"))
    val diff = run("q_argminmax").join(expect, "event_type")
      .filter(col("last_value") =!= col("expect_last"))
    assert(diff.count() == 0)
  }

  test("q_histogram: buckets partition the table exactly") {
    val h = run("q_histogram").collect()
    val total = graft.io.Tables.read(spark, sf, "lineitem").count()
    assert(h.map(_.getAs[Long]("n")).sum == total)
    assert(h.forall(r => r.getAs[Double]("bucket_lo") == r.getAs[Long]("bucket") * 5000.0))
  }

  test("q_na_fill: imputation leaves no nulls, drop removes only tax nulls") {
    val out = run("q_na_fill")
    assert(out.filter(col("disc_filled").isNull || col("tax_kept").isNull).count() == 0)
    val expected = graft.io.Tables.read(spark, sf, "lineitem")
      .filter(col("l_tax") =!= 0.0).count()
    assert(out.count() == expected)
    // zero discounts became exactly the fill constant
    assert(out.filter(col("disc_filled") === 0.05).count() > 0)
  }

  test("q_schema_reflect: lineitem's 11 columns in ordinal order") {
    val rows = run("q_schema_reflect").collect()
    assert(rows.map(_.getAs[Long]("pos")).toSeq == (1L to rows.length).toSeq)
    assert(rows.map(_.getAs[String]("column_name")).take(3).toSeq ==
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
  }
}
