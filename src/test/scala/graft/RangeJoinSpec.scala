package graft

import graft.ops.RangeJoin

/** Range-join semantics (half-open containment, bucket-boundary spans,
  * empty intervals) and plan shape (equi-join, never a nested loop). */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("half-open containment incl. intervals spanning bucket boundaries") {
    val points = Seq(0L, 5L, 9L, 10L, 15L, 99L).toDF("pt")
    val intervals = Seq(
      (1, 0L, 10L),   // [0,10): catches 0,5,9 — not 10 (half-open)
      (2, 8L, 13L),   // spans the bucket-5 boundary: catches 9,10
      (3, 15L, 15L),  // empty range: catches nothing
      (4, 90L, 100L)  // catches 99
    ).toDF("iv_id", "s", "e")
    val got = RangeJoin.rangeJoin(points, intervals, "pt", "s", "e", 5L)
      .select("iv_id", "pt").as[(Int, Long)].collect().toSet
    assert(got == Set((1, 0L), (1, 5L), (1, 9L), (2, 9L), (2, 10L), (4, 99L)))
  }

  test("each point matches an interval once even when both span many buckets") {
    val points = Seq(42L).toDF("pt")
    val intervals = Seq((1, 0L, 1000L)).toDF("iv_id", "s", "e")
    val rows = RangeJoin.rangeJoin(points, intervals, "pt", "s", "e", 10L).count()
    assert(rows == 1L)
  }

  test("differential: random intervals match the naive containment scan " +
      "across bucket sizes") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(400)(rnd.nextInt(1000).toLong)
    val ivs = Seq.tabulate(100) { i =>
      val s = rnd.nextInt(1000).toLong
      (i, s, s + rnd.nextInt(50).toLong)
    }
    val expected = (for {
      p <- pts; (id, s, e) <- ivs if p >= s && p < e
    } yield (id, p)).groupBy(identity).view.mapValues(_.size).toMap
    for (b <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.rangeJoin(pts.toDF("pt"),
          ivs.toDF("iv_id", "s", "e"), "pt", "s", "e", b)
        .select("iv_id", "pt").as[(Int, Long)].collect()
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expected, s"bucketSize $b diverged")
    }
  }

  test("plans an equi-join on the bucket, not a nested loop") {
    val points = Seq(1L).toDF("pt")
    val intervals = Seq((1, 0L, 10L)).toDF("iv_id", "s", "e")
    val plan = RangeJoin.rangeJoin(points, intervals, "pt", "s", "e", 5L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.toLowerCase.contains("cartesian"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }
}
