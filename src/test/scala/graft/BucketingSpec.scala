package graft

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops.Skew

/** Co-located (bucketed) fact-fact joins and skew salting — the two
  * explicit shuffle-elimination tools for joins that are neither
  * broadcast-able nor AQE-fixable (SURVEY §7 scale posture).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join with ZERO exchanges (co-located join)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.ops.Layout.writeBucketed(
      Tables.read(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", buckets = 4)
    graft.ops.Layout.writeBucketed(
      Tables.read(spark, sf, "lineitem").select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", buckets = 4)

    val joined = spark.table("b_orders").hint("merge")
      .join(spark.table("b_lineitem"),
        $"o_orderkey" === $"l_orderkey")
    val plan = joined.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val exchanges = plan.linesIterator.count(_.matches(raw"\(\d+\) Exchange( .*)?"))
    assert(exchanges == 0,
      s"bucketed join still shuffles ($exchanges exchanges):\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)

    // and it computes the same rows as the unbucketed join
    val expected = Tables.read(spark, sf, "orders")
      .join(Tables.read(spark, sf, "lineitem"),
        $"o_orderkey" === $"l_orderkey").count()
    assert(joined.count() == expected)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("salted join: identical result to the plain join on a skewed key") {
    // 90% of fact rows share one hot key
    val fact = ((1 to 900).map(_ => ("hot", 1.0)) ++
      (1 to 100).map(i => (s"k$i", 2.0))).toDF("k", "v")
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "attr")
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum("attr").as("s"))
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), salt = 8)
      .groupBy("k").agg(count(lit(1)).as("n"), sum("attr").as("s"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    // every fact row survived exactly once (no duplication from the
    // build-side replication)
    assert(salted.agg(sum("n")).as[Long].head() == 1000L)
  }
}
