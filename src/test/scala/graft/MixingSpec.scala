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
}
