package graft

import graft.ext.RangeJoinRule
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** The optimizer rule turns a bare inequality join into a bucketized
  * equi-join: same rows as the nested loop, hash-join physical plan,
  * and a strict no-op where an equi-key already exists. */
class RangeJoinRuleSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.experimental.extraOptimizations ++= Seq(RangeJoinRule)
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRule)
    super.afterAll()
  }

  private def points = Seq(0L, 5L, 9L, 10L, 42L, 99L).toDF("pt")
  private def intervals = Seq(
    (1, 0L, 10L), (2, 8L, 13L), (3, 15L, 15L), (4, 40L, 100L)
  ).toDF("iv_id", "s", "e")

  test("inequality join rewrites to the same rows as the nested loop") {
    val joined = points.join(intervals,
      col("pt") >= col("s") && col("pt") < col("e"))
    val got = joined.select("iv_id", "pt").as[(Int, Long)].collect().toSet
    assert(got == Set((1, 0L), (1, 5L), (1, 9L), (2, 9L), (2, 10L),
      (4, 42L), (4, 99L)))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.toLowerCase.contains("cartesian"), plan)
    assert(plan.contains("_graft_bucket"), plan)
  }

  test("mirrored operand order (s <= pt, e > pt) is recognized too") {
    val joined = points.join(intervals,
      col("s") <= col("pt") && col("e") > col("pt"))
    assert(joined.count() == 7)
    assert(!joined.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }

  test("joins that already have an equi-key are left untouched") {
    val l = Seq((1L, 5L)).toDF("k", "v")
    val r = Seq((1L, 0L, 10L)).toDF("k", "lo", "hi")
    val plan = l.join(r, l("k") === r("k") && l("v") >= r("lo") &&
      l("v") < r("hi")).queryExecution.optimizedPlan.toString
    assert(!plan.contains("_graft_bucket"), plan)
  }

  test("non-integral bounds are left untouched (falls back to BNLJ)") {
    val l = Seq(1.5).toDF("pt")
    val r = Seq((0.0, 10.0)).toDF("s", "e")
    val plan = l.join(r, col("pt") >= col("s") && col("pt") < col("e"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("_graft_bucket"), plan)
  }
}
