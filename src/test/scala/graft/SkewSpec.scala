package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted join = plain join row-for-row; the salt reaches the shuffle
  * key so a hot key fans out across reducers. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed() = {
    // 900 rows on one hot key, a few on others — the classic skew shape.
    val big = (Seq.fill(900)(1) ++ Seq(2, 2, 3)).zipWithIndex
      .toDF("k", "row_id")
    val small = Seq((1, "hot"), (2, "warm"), (4, "unmatched")).toDF("k", "v")
    (big, small)
  }

  test("inner and left salted joins match the unsalted results exactly") {
    val (big, small) = skewed()
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "row_id", "v").as[(Int, Int, Option[String])]
        .collect().sorted.toSeq
      val salted = Skew.saltedJoin(big, small, Seq("k"), salt = 7, jt)
        .select("k", "row_id", "v").as[(Int, Int, Option[String])]
        .collect().sorted.toSeq
      assert(salted == plain, s"join type $jt diverged")
    }
  }

  test("skew-safe countDistinct equals the direct form; x joins the first shuffle key") {
    val df = (Seq.fill(500)((1, 7)) ++ Seq((1, 8), (2, 7), (2, 9), (3, 7)))
      .toDF("g", "x")
    val got = Skew.countDistinctSkewSafe(df, Seq("g"), "x")
      .as[(Int, Long)].collect().toMap
    assert(got == Map(1 -> 2L, 2 -> 2L, 3 -> 1L))
    val plan = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      Skew.countDistinctSkewSafe(df, Seq("g"), "x")
        .queryExecution.executedPlan.toString
    }
    // first exchange must partition on (g, x) — the skew-spreading key
    assert(plan.contains("hashpartitioning(g") && plan.contains(", x"), plan)
  }

  test("countDistinct NULL semantics match COUNT(DISTINCT x) exactly") {
    // group 1: values + a null; group 2: all null; group 3: no nulls
    val df = Seq((1, Some(7)), (1, None), (1, Some(8)),
      (2, None), (2, None), (3, Some(9))).toDF("g", "x")
    val got = Skew.countDistinctSkewSafe(df, Seq("g"), "x")
      .as[(Int, Long)].collect().toMap
    val direct = df.groupBy("g").agg(countDistinct($"x").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(got == direct && got == Map(1 -> 2L, 2 -> 0L, 3 -> 1L))
  }

  test("salt participates in the shuffle partitioning") {
    val (big, small) = skewed()
    val plan = withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      Skew.saltedJoin(big, small, Seq("k"), salt = 7)
        .queryExecution.executedPlan.toString
    }
    assert(plan.contains("_salt"), plan)
    assert(plan.contains("hashpartitioning(k"), plan)
  }

  private def withConf[T](kv: (String, String))(f: => T): T = {
    val prev = spark.conf.getOption(kv._1)
    spark.conf.set(kv._1, kv._2)
    try f finally prev match {
      case Some(v) => spark.conf.set(kv._1, v)
      case None => spark.conf.unset(kv._1)
    }
  }
}
