package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.{MGBuffer, MisraGriesSketch}
import graft.ops.HeavyHitters

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic skewed corpus: two heavy items over a sea of
    * singletons — the shape MG exists for. */
  private def skewed(nHot1: Int, nHot2: Int, nNoise: Int) =
    (Seq.fill(nHot1)("hot1") ++ Seq.fill(nHot2)("hot2") ++
      (0 until nNoise).map(i => s"noise$i")).toDF("item")

  test("MGBuffer streaming guarantee: true count > N/(k+1) survives") {
    val b = new MGBuffer(4)
    // 30 hot + 70 distinct noise = N=100; hot count 30 > 100/5 = 20
    val items = Seq.fill(30)("hot") ++ (0 until 70).map(i => s"n$i")
    // adversarial order: noise interleaved after hot
    items.zipWithIndex.sortBy(_._2 % 7).map(_._1).foreach(b.add)
    assert(b.m.containsKey("hot"), "MG evicted a guaranteed heavy item")
    assert(b.m.size <= 4)
  }

  test("MGBuffer merge keeps the mergeable-summaries bound and guarantee") {
    // two partitions, hot split across both so neither alone is decisive
    val b1 = new MGBuffer(3); val b2 = new MGBuffer(3)
    (Seq.fill(20)("hot") ++ (0 until 30).map(i => s"a$i")).foreach(b1.add)
    (Seq.fill(25)("hot") ++ (0 until 30).map(i => s"b$i")).foreach(b2.add)
    val m = b1.merge(b2)
    // N=105, k=3: guarantee covers counts > 105/4 = 26.25; hot=45
    assert(m.m.containsKey("hot"))
    assert(m.m.size <= 3, s"merge left ${m.m.size} > k entries")
  }

  test("sketch aggregate with no eviction returns exact counts") {
    val df = skewed(5, 3, 0).union(Seq("solo").toDF("item"))
    val got = df.agg(MisraGriesSketch.mg_sketch(col("item"), 16)).head()
      .getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(got === Seq(("hot1", 5L), ("hot2", 3L), ("solo", 1L)))
  }

  test("heavyHitters is exact and partitioning-invariant under eviction") {
    val df = skewed(400, 250, 1300) // N=1950, distinct=1302
    val theta = 0.1                 // k=20 << distinct: eviction everywhere
    val expected = Seq(("hot1", 400L, 400 / 1950.0), ("hot2", 250L, 250 / 1950.0))
      .map { case (i, c, s) =>
        (i, c, graft.functions.Rounding.roundHalfUpDouble(s, 6)) }
    for (parts <- Seq(1, 4, 13)) {
      val got = HeavyHitters.heavyHitters(
          df.repartition(parts, col("item")), "item", theta)
        .as[(String, Long, Double)].collect().toSeq
      assert(got === expected, s"diverged at $parts partitions")
    }
    // extreme partition count: more partitions (64) than salt lanes (8)
    // — every lane merges multiple partials before the final mg_merge,
    // exercising both levels of the two-level tree on a non-keyed split
    val wide = HeavyHitters.heavyHitters(df.repartition(64), "item", theta)
      .as[(String, Long, Double)].collect().toSeq
    assert(wide === expected, "two-level merge diverged at 64 partitions")
  }

  test("grouped heavy hitters: exact per-group answer, partitioning-invariant") {
    // g1 under active eviction (61 distinct vs k=16), g2 tiny with a
    // sub-threshold item; theta applies RELATIVE to each group's count
    val df = (Seq.fill(40)(("g1", "hot")) ++
      (0 until 60).map(i => ("g1", s"n$i")) ++
      Seq.fill(9)(("g2", "x")) ++ Seq(("g2", "y"))).toDF("k", "item")
    val expected = Seq(("g1", "hot", 40L, 0.4), ("g2", "x", 9L, 0.9))
    for (parts <- Seq(1, 7)) {
      val got = HeavyHitters.groupedHeavyHitters(
          df.repartition(parts), "item", "k", theta = 0.2)
        .as[(String, String, Long, Double)].collect().toSeq
      assert(got == expected, s"diverged at $parts partitions")
    }
  }

  test("grouped heavy hitters: null keys and null items are excluded") {
    val df = Seq[(Option[String], Option[String])](
      (Some("g"), Some("a")), (Some("g"), Some("a")),
      (Some("g"), None), (None, Some("a")))
      .toDF("k", "item")
    val got = HeavyHitters.groupedHeavyHitters(df, "item", "k", 0.5)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == Seq(("g", "a", 2L, 1.0)))
  }

  test("mg_merge of lane sketches preserves the membership guarantee") {
    val df = skewed(400, 250, 1300)
    // lanes = an arbitrary 7-way split of the data (any split is valid:
    // the guarantee is merge-tree independent)
    val lanes = df.groupBy(pmod(crc32(col("item")), lit(7)).as("lane"))
      .agg(MisraGriesSketch.mg_sketch(col("item"), 20).as("s"))
    val merged = lanes.agg(MisraGriesSketch.mg_merge(col("s"), 20)).head()
      .getSeq[Row](0)
    assert(merged.size <= 20, s"merge left ${merged.size} > k entries")
    val items = merged.map(_.getString(0))
    // N=1950, k=20: guarantee covers counts > 1950/21 ≈ 92.9
    assert(items.contains("hot1") && items.contains("hot2"),
      s"mg_merge evicted a guaranteed heavy item: $items")
  }

  test("mg_merge with no eviction anywhere is an exact count union") {
    val a = Seq.fill(5)("x").toDF("item")
      .agg(MisraGriesSketch.mg_sketch(col("item"), 16).as("s"))
    val b = (Seq.fill(3)("x") ++ Seq.fill(2)("y")).toDF("item")
      .agg(MisraGriesSketch.mg_sketch(col("item"), 16).as("s"))
    val got = a.union(b).agg(MisraGriesSketch.mg_merge(col("s"), 16)).head()
      .getSeq[Row](0).map(r => (r.getString(0), r.getLong(1)))
    assert(got === Seq(("x", 8L), ("y", 2L)))
  }

  test("threshold edge: count exactly at ceil(theta*N) is included") {
    // N=100, theta=0.25 -> minCnt=25; "edge" has exactly 25
    val df = (Seq.fill(25)("edge") ++ Seq.fill(40)("big") ++
      (0 until 35).map(i => s"n$i")).toDF("item")
    val got = HeavyHitters.heavyHitters(df, "item", 0.25)
      .select("item").as[String].collect().toSeq
    assert(got === Seq("big", "edge"))
  }

  test("nulls are excluded from the count base and the result") {
    val df = (Seq.fill(6)(Some("x")) ++ Seq.fill(4)(Option.empty[String]))
      .toDF("item")
    // N counts only the 6 non-null rows: share = 1.0
    val got = HeavyHitters.heavyHitters(df, "item", 0.5)
      .as[(String, Long, Double)].collect().toSeq
    assert(got === Seq(("x", 6L, 1.0)))
  }

  test("empty input yields an empty result with the contract schema") {
    val df = Seq.empty[String].toDF("item")
    val got = HeavyHitters.heavyHitters(df, "item", 0.1)
    assert(got.columns.toSeq === Seq("item", "cnt", "share"))
    assert(got.count() === 0L)
  }

  test("per-group sketch: groupBy carries independent bounded buffers") {
    val df = (Seq.fill(10)(("g1", "a")) ++ Seq.fill(3)(("g1", "b")) ++
      Seq.fill(7)(("g2", "z"))).toDF("g", "item")
    val got = df.groupBy("g")
      .agg(MisraGriesSketch.mg_sketch(col("item"), 8).as("s"))
      .orderBy("g")
      .collect().map(r => (r.getString(0),
        r.getSeq[Row](1).map(x => (x.getString(0), x.getLong(1)))))
    assert(got.toSeq === Seq(
      ("g1", Seq(("a", 10L), ("b", 3L))), ("g2", Seq(("z", 7L)))))
  }
}
