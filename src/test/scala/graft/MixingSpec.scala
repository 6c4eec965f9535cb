package graft

import graft.ops.Mixing

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (0L until 300L).map { i =>
    (i, if (i < 100) "a" else if (i < 200) "b" else "c")
  }.toDF("id", "source")

  test("binding source kept whole; others thinned toward the target ratio") {
    val out = Mixing.downsampleToWeights(corpus, "source", "id",
      Map("a" -> 0.8, "b" -> 0.2))
    val by = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // T = min(100/0.8, 100/0.2) = 125 -> a keeps 100% (binding),
    // b keeps 25% (hash-uniform, so approximately)
    assert(by("a") == 100L, s"binding source thinned: $by")
    assert(by("b") > 10 && by("b") < 45, s"b far from 25%: $by")
    assert(!by.contains("c"), "unweighted source must be dropped")
  }

  test("deterministic: same input -> identical kept set") {
    val w = Map("a" -> 0.5, "b" -> 0.5)
    val first = Mixing.downsampleToWeights(corpus, "source", "id", w)
      .select("id").as[Long].collect().sorted.toSeq
    val again = Mixing.downsampleToWeights(corpus, "source", "id", w)
      .select("id").as[Long].collect().sorted.toSeq
    assert(first == again && first.nonEmpty)
  }

  test("temperature sampling: alpha=1 keeps the natural mix whole, alpha=0.5 boosts the tail") {
    // skewed corpus: 400 of 'big', 25 of 'small'
    val skew = ((0L until 400L).map((_, "big")) ++
      (1000L until 1025L).map((_, "small"))).toDF("id", "source")
    // alpha = 1: weights == counts, every source is binding -> all kept
    val nat = Mixing.temperatureSample(skew, "source", "id", alpha = 1.0)
    assert(nat.count() == 425, "alpha=1 must keep the natural mix whole")
    // alpha = 0.5: targets ∝ sqrt(n) -> small (rarer) is binding and
    // kept whole; big thins toward sqrt(400)/sqrt(25) = 4x small
    val temp = Mixing.temperatureSample(skew, "source", "id", alpha = 0.5)
    val by = temp.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(by("small") == 25L, s"binding (rare) source thinned: $by")
    assert(by("big") > 60 && by("big") < 140,
      s"big source far from 4x small (=100): $by")
    // deterministic
    assert(Mixing.temperatureSample(skew, "source", "id", alpha = 0.5)
      .select("id").as[Long].collect().sorted.toSeq ==
      temp.select("id").as[Long].collect().sorted.toSeq)
  }

  private def naiveBudget(df: org.apache.spark.sql.DataFrame,
                          budget: Long) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    df.withColumn("_cum", sum(col("toks")).over(
        Window.partitionBy("g").orderBy(col("q").desc, col("id"))))
      .filter(col("_cum") <= budget).drop("_cum")
  }

  private def budgetCorpus(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, if (i % 3 == 0) "x" else "y",
        // coarse grid ON PURPOSE: quality ties across docs exercise
        // the within-bin (quality desc, id) tie order
        math.rint(rnd.nextDouble() * 50) / 50.0,
        rnd.nextInt(40).toLong)
    }.toDF("id", "g", "q", "toks")
  }

  test("selectToBudget == the naive per-group window, including ties and zero-token docs") {
    for (seed <- Seq(1, 2, 3)) {
      val df = budgetCorpus(seed, 400)
      for (budget <- Seq(0L, 500L, 2000L, 1000000L)) {
        val got = Mixing.selectToBudget(df, "g", "q", "toks", "id", budget)
          .select("id").as[Long].collect().sorted.toSeq
        val want = naiveBudget(df, budget)
          .select("id").as[Long].collect().sorted.toSeq
        assert(got == want,
          s"seed=$seed budget=$budget: got=${got.size} want=${want.size} " +
            s"diff=${(got.toSet -- want.toSet) ++ (want.toSet -- got.toSet)}")
      }
    }
    // the huge-budget case must keep everything (boundary = -1 path)
    val df = budgetCorpus(4, 100)
    assert(Mixing.selectToBudget(df, "g", "q", "toks", "id", 1000000L)
      .count() == 100)
  }

  test("selectToBudget: corpus never sorts globally — only the boundary bin pays a window") {
    val df = budgetCorpus(5, 400)
    val plan = Mixing.selectToBudget(df, "g", "q", "toks", "id", 500L)
      .queryExecution.executedPlan.toString
    // the window must sit under a boundary-bin filter, never over the
    // whole corpus: assert the plan's Window input carries the _b
    // equality filter
    assert(plan.contains("Window"), "expected the boundary window")
    val windowIdx = plan.indexOf("Window")
    assert(plan.indexOf("_boundary", windowIdx) >= 0,
      s"boundary filter not below the window:\n$plan")
    // null contract: null group/quality/tokens rows are excluded
    val withNulls = df.unionByName(Seq(
      (9001L, null.asInstanceOf[String], 0.5, 3L),
      (9002L, "x", Double.NaN, 3L)).toDF("id", "g", "q", "toks"))
      .withColumn("q", org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.col("id") === 9002L,
          org.apache.spark.sql.functions.lit(null)).otherwise(
          org.apache.spark.sql.functions.col("q")))
    val kept = Mixing.selectToBudget(withNulls, "g", "q", "toks", "id", 500L)
      .select("id").as[Long].collect().toSet
    assert(!kept.contains(9001L) && !kept.contains(9002L))
  }
}
