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
    // the narrow path is a bucketized HASH join; the only remaining
    // nested loop is the wide-interval fallback branch, which is fed
    // exclusively through the span-guard filter
    assert(plan.contains("_graft_bucket"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.toLowerCase.contains("cartesian"), plan)
  }

  test("mirrored operand order (s <= pt, e > pt) is recognized too") {
    val joined = points.join(intervals,
      col("s") <= col("pt") && col("e") > col("pt"))
    assert(joined.count() == 7)
    assert(joined.queryExecution.executedPlan.toString
      .contains("_graft_bucket"))
  }

  test("buckets are exact beyond 2^53 (double floor-div misassigns)") {
    // pt = 2^60 - 1: double rounding maps it to bucket 2^54 while its
    // containing interval [2^60-64, 2^60) stays in bucket 2^54 - 1 —
    // exact integral division must keep the pair together
    val big = 1L << 60
    val pts = Seq(big - 1L, big + 5L).toDF("pt")
    val ivs = Seq((1, big - 64L, big), (2, big, big + 64L)).toDF("iv_id", "s", "e")
    val got = pts.join(ivs, col("pt") >= col("s") && col("pt") < col("e"))
      .select("iv_id", "pt").as[(Int, Long)].collect().toSet
    assert(got == Set((1, big - 1L), (2, big + 5L)))
  }

  test("an open-ended sentinel interval survives via the wide path") {
    // hi = Long.MaxValue spans ~1.4e17 buckets: replicating it would
    // OOM; the guard routes it to the nested-loop branch instead, and
    // the result is still exactly the naive join's
    val pts = Seq(0L, 5L, 9L, 1L << 61).toDF("pt")
    val ivs = Seq((1, 0L, 10L), (2, 5L, Long.MaxValue)).toDF("iv_id", "s", "e")
    val joined = pts.join(ivs, col("pt") >= col("s") && col("pt") < col("e"))
    val got = joined.select("iv_id", "pt").as[(Int, Long)].collect().toSet
    assert(got == Set((1, 0L), (1, 5L), (1, 9L),
      (2, 5L), (2, 9L), (2, 1L << 61)))
    // and the sentinel never reached the generate/explode path
    assert(joined.queryExecution.executedPlan.toString
      .contains("_graft_bucket"))
  }

  test("two stacked range joins both rewrite (guard detection is per-join)") {
    val pts = Seq(0L, 5L, 9L).toDF("pt")
    val iv1 = Seq((1, 0L, 10L)).toDF("iv1", "s1", "e1")
    val iv2 = Seq((2, 4L, 10L)).toDF("iv2", "s2", "e2")
    val joined = pts
      .join(iv1, col("pt") >= col("s1") && col("pt") < col("e1"))
      .join(iv2, col("pt") >= col("s2") && col("pt") < col("e2"))
    val plan = joined.queryExecution.optimizedPlan.toString
    val buckets = raw"_graft_bucket_i#\d+".r.findAllIn(plan).toSet
    assert(buckets.size == 2,
      s"expected BOTH joins bucketized, got $buckets in:\n$plan")
    val got = joined.select("iv1", "iv2", "pt").as[(Int, Int, Long)]
      .collect().toSet
    assert(got == Set((1, 2, 5L), (1, 2, 9L)))
  }

  test("rewrite's Union branches carry distinct output exprIds") {
    // both branches project the same source subtrees; without fresh
    // aliases on the wide branch the Union is a self-union (identical
    // attribute ids in both children), a shape optimizer rules that
    // assume per-branch-unique ids can mis-rewrite
    val joined = points.join(intervals,
      col("pt") >= col("s") && col("pt") < col("e"))
    val unions = joined.queryExecution.optimizedPlan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u
    }
    assert(unions.nonEmpty, "expected the rewrite's Union in the plan")
    for (u <- unions; Seq(a, b) <- u.children.map(_.output.map(_.exprId).toSet)
           .combinations(2))
      assert((a intersect b).isEmpty,
        s"Union branches share exprIds: ${a intersect b}")
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
