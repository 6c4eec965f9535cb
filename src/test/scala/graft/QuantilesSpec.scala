package graft

import org.apache.spark.sql.functions._
import graft.ops.Quantiles

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0)

  /** Ground truth from Spark's own sort-based exact percentile, rounded
    * the same way the operator rounds its output (scale 9). */
  private def sparkExact(vals: Seq[Double]): Seq[Double] = {
    val row = vals.toDF("v")
      .agg(percentile(col("v"), array(ps.map(lit): _*))).head()
    row.getSeq[Double](0)
      .map(graft.functions.Rounding.roundHalfUpDouble(_, 9))
  }

  private def twoPass(vals: Seq[Double], bins: Int = 64): Seq[Double] =
    Quantiles.exactQuantiles(vals.toDF("v"), "v", ps, bins = bins, scale = 9)
      .orderBy("p").collect().map(_.getDouble(1)).toSeq

  test("matches sort-based percentile on mixed-magnitude data") {
    // deterministic pseudo-random: LCG — no Random seed ambiguity
    val vals = Iterator.iterate(48271L)(x => (x * 48271L) % 2147483647L)
      .take(5000).map(x => (x % 1000000) / 7.0 - 50000.0).toSeq
    assert(twoPass(vals) == sparkExact(vals))
  }

  test("matches when ranks straddle bucket boundaries (tiny bins)") {
    val vals = (1 to 101).map(_.toDouble)
    assert(twoPass(vals, bins = 2) == sparkExact(vals))
  }

  test("all-equal fast path") {
    assert(twoPass(Seq.fill(10)(42.5)) == ps.map(_ => 42.5))
  }

  test("single row: every quantile is that row") {
    assert(twoPass(Seq(7.25)) == ps.map(_ => 7.25))
  }

  test("nulls and NaNs excluded from the rank base") {
    val df = Seq[java.lang.Double](1.0, null, 2.0, Double.NaN, 3.0).toDF("v")
    val got = Quantiles.exactQuantiles(df, "v", Seq(0.5), scale = 9)
      .head().getDouble(1)
    assert(got == 2.0)
  }

  test("skewed mass in one bucket still routes exactly") {
    // 99% of rows at 0.0, tail spread to 100 — p50 sits deep inside the
    // hot bucket, p99/p100 in the sparse tail
    val vals = Seq.fill(990)(0.0) ++ (1 to 10).map(_ * 10.0)
    assert(twoPass(vals, bins = 4) == sparkExact(vals))
  }

  test("empty input yields null quantiles") {
    val out = Quantiles.exactQuantiles(
      Seq.empty[Double].toDF("v"), "v", Seq(0.5))
    assert(out.count() == 1 && out.head().isNullAt(1))
  }

  // --- one-pass sketch ---

  test("sketch estimates are within the 2^-B relative-error bound") {
    val vals = Iterator.iterate(48271L)(x => (x * 48271L) % 2147483647L)
      .take(5000).map(x => (x % 1000000) / 7.0 + 1.0).toSeq
    val est = Quantiles.sketchQuantiles(vals.toDF("v"), "v",
      Seq(0.01, 0.25, 0.5, 0.75, 0.99), prefixBits = 10)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // ground truth: nearest-rank-lower on the quantized values, the
    // sketch's documented statistic
    val sortedQ = vals.map(v => math.floor(v * 100 + 0.5)).sorted
    for ((p, e) <- est) {
      val truth = sortedQ((p * (sortedQ.length - 1)).toLong.toInt) / 100.0
      assert(math.abs(e - truth) / truth <= math.pow(2, -10) + 1e-12,
        s"p=$p est=$e truth=$truth exceeds bound")
    }
  }

  test("sketch values small enough for exact buckets reproduce exactly") {
    // q <= 2^B: f = 1, bucket == q, midpoint == value — zero error
    val vals = (1 to 500).map(_ / 100.0) // q = 1..500 < 1024
    val est = Quantiles.sketchQuantiles(vals.toDF("v"), "v", Seq(0.5))
      .head().getDouble(1)
    assert(est == vals((0.5 * (vals.length - 1)).toInt))
  }

  test("sketch is deterministic across partitionings (merge order)") {
    val vals = Iterator.iterate(7L)(x => (x * 48271L) % 2147483647L)
      .take(2000).map(x => (x % 100000) / 3.0 + 0.5).toSeq
    def run(np: Int) = Quantiles.sketchQuantiles(
      vals.toDF("v").repartition(np), "v", Seq(0.1, 0.5, 0.9))
      .collect().map(_.toString).toSeq
    assert(run(1) == run(13))
  }

  test("grouped sketch == independent per-group sketches; no driver collect") {
    val df = Seq(
      ("a", 1.5), ("a", 2.5), ("a", 100.0), ("a", 3.5), ("a", 9.0),
      ("b", 1000.0), ("b", 2000.0), ("b", 1500.0))
      .toDF("k", "v")
    val ps = Seq(0.0, 0.5, 1.0)
    val grouped = Quantiles.groupedSketchQuantiles(df, "v", "k", ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    for (k <- Seq("a", "b")) {
      val solo = Quantiles.sketchQuantiles(
        df.filter($"k" === k), "v", ps)
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      for (p <- ps)
        assert(grouped((k, p)) == solo(p), s"group $k p=$p diverged")
    }
  }

  // --- grouped exact 2-pass ---

  private def groupedTruth(df: org.apache.spark.sql.DataFrame,
                           qs: Seq[Double]): Map[(String, Double), Double] =
    df.groupBy("k").agg(percentile(col("v"), array(qs.map(lit): _*)).as("q"))
      .collect().flatMap { r =>
        qs.zip(r.getSeq[Double](1)
          .map(graft.functions.Rounding.roundHalfUpDouble(_, 9)))
          .map { case (p, q) => (r.getString(0), p) -> q }
      }.toMap

  private def groupedGot(df: org.apache.spark.sql.DataFrame, qs: Seq[Double],
                         bins: Int): Map[(String, Double), Double] =
    Quantiles.groupedExactQuantiles(df, "v", "k", qs, bins = bins, scale = 9)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap

  test("grouped exact matches sort-based percentile per group") {
    // 3 groups of different sizes/ranges, incl. ranks on bucket edges
    val vals = Iterator.iterate(12345L)(x => (x * 48271L) % 2147483647L)
      .take(3000).zipWithIndex.map { case (x, i) =>
        (s"g${i % 3}", (x % 100000) / 11.0 - 3000.0) }.toSeq
    val df = vals.toDF("k", "v")
    assert(groupedGot(df, ps, bins = 16) == groupedTruth(df, ps))
  }

  test("grouped: all-equal and single-row groups answered without refine") {
    val df = (Seq.fill(500)(("flat", 7.5)) ++ Seq(("solo", 3.25)) ++
      Seq(("ab", 1.0), ("ab", 2.0), ("ab", 3.0))).toDF("k", "v")
    val got = groupedGot(df, Seq(0.0, 0.5, 1.0), bins = 4)
    assert(got == Map(
      ("flat", 0.0) -> 7.5, ("flat", 0.5) -> 7.5, ("flat", 1.0) -> 7.5,
      ("solo", 0.0) -> 3.25, ("solo", 0.5) -> 3.25, ("solo", 1.0) -> 3.25,
      ("ab", 0.0) -> 1.0, ("ab", 0.5) -> 2.0, ("ab", 1.0) -> 3.0))
  }

  test("grouped: null keys and null/NaN values are excluded") {
    val df = Seq[(String, java.lang.Double)](
      ("a", 1.0), ("a", null), ("a", Double.NaN), ("a", 3.0),
      (null, 99.0)).toDF("k", "v")
    val got = groupedGot(df, Seq(0.5), bins = 4)
    assert(got == Map(("a", 0.5) -> 2.0))
  }

  test("grouped: skewed group mass still routes exactly (tiny bins)") {
    val df = ((Seq.fill(990)(("hot", 0.0)) ++ (1 to 10).map(i => ("hot", i * 10.0))) ++
      (1 to 101).map(i => ("lin", i.toDouble))).toDF("k", "v")
    assert(groupedGot(df, ps, bins = 4) == groupedTruth(df, ps))
  }

  test("sketch drops non-positive values; all-dropped input yields nulls") {
    val mixed = Seq(-5.0, 0.0, 0.001, 2.0, 3.0) // 0.001 quantizes to 0 -> drop
    val est = Quantiles.sketchQuantiles(mixed.toDF("v"), "v", Seq(0.0, 1.0))
      .collect().map(_.getDouble(1)).toSeq
    assert(est == Seq(2.0, 3.0))
    val out = Quantiles.sketchQuantiles(
      Seq(-1.0, 0.0).toDF("v"), "v", Seq(0.5))
    assert(out.count() == 1 && out.head().isNullAt(1))
  }
}
