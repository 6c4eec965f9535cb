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

  test("fractional and negative coordinates bucket toward -infinity") {
    // a bare long cast truncates -0.7 to bucket 0 and drops the match
    val points = Seq(-0.7, -64.5, 3.2).toDF("pt")
    val intervals = Seq((1, -10.0, -0.5), (2, -100.0, -64.0), (3, 3.0, 3.5))
      .toDF("iv_id", "s", "e")
    val got = RangeJoin.rangeJoin(points, intervals, "pt", "s", "e", 64L)
      .select("iv_id", "pt").as[(Int, Double)].collect().toSet
    assert(got == Set((1, -0.7), (2, -64.5), (3, 3.2)))
    // differential on random doubles across bucket sizes
    val rnd = new scala.util.Random(31)
    val pts = Seq.fill(300)(rnd.nextDouble() * 200 - 100)
    val ivs = Seq.tabulate(80) { i =>
      val s = rnd.nextDouble() * 200 - 100
      (i, s, s + rnd.nextDouble() * 30)
    }
    val expected = (for {
      p <- pts; (id, s, e) <- ivs if p >= s && p < e
    } yield (id, p)).toSet
    for (b <- Seq(1L, 7L, 64L)) {
      val gotB = RangeJoin.rangeJoin(pts.toDF("pt"),
          ivs.toDF("iv_id", "s", "e"), "pt", "s", "e", b)
        .select("iv_id", "pt").as[(Int, Double)].collect().toSet
      assert(gotB == expected, s"bucketSize $b diverged on fractional data")
    }
  }

  test("helper buckets stay exact beyond 2^53 (floor(long) is native)") {
    val big = (1L << 60) - 1L
    val pts = Seq(big).toDF("pt")
    val ivs = Seq((1, big - 64L, big + 1L)).toDF("iv_id", "s", "e")
    assert(RangeJoin.rangeJoin(pts, ivs, "pt", "s", "e", 64L).count() == 1L)
  }

  test("overlap join: differential vs naive, exactly-once per pair") {
    val rnd = new scala.util.Random(23)
    def windows(n: Int, seedOff: Int) = Seq.tabulate(n) { i =>
      val s = rnd.nextInt(1000).toLong
      (i + seedOff, s, s + 1 + rnd.nextInt(60).toLong)
    }
    val as = windows(120, 0)
    val bs = windows(90, 10000)
    val expected = (for {
      (ai, alo, ahi) <- as; (bi, blo, bhi) <- bs
      if alo < bhi && blo < ahi
    } yield (ai, bi)).toSet
    for (bucket <- Seq(1L, 16L, 128L, 4096L)) {
      val got = RangeJoin.intervalOverlapJoin(
          as.toDF("a_id", "a_lo", "a_hi"), bs.toDF("b_id", "b_lo", "b_hi"),
          "a_lo", "a_hi", "b_lo", "b_hi", bucket)
        .select("a_id", "b_id").as[(Int, Int)].collect()
      // toSet AFTER asserting no duplicates: emission must be exactly-once
      assert(got.length == got.toSet.size, s"bucket $bucket emitted dups")
      assert(got.toSet == expected, s"bucket $bucket diverged")
    }
  }

  test("overlap join: empty and touching ranges never match") {
    // [0,5) and [5,10) touch but do not overlap (half-open); [7,7) empty
    val as = Seq((1, 0L, 5L), (2, 7L, 7L)).toDF("a_id", "a_lo", "a_hi")
    val bs = Seq((1, 5L, 10L), (2, 0L, 8L)).toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlapJoin(as, bs,
        "a_lo", "a_hi", "b_lo", "b_hi", 4L)
      .select("a_id", "b_id").as[(Int, Int)].collect().toSet
    assert(got == Set((1, 2))) // only [0,5) x [0,8)
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
