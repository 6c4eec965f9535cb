package graft

import graft.ops.Prune
import org.apache.spark.sql.functions._

/** Bloom-pruned join: row-identical to the plain join (no false
  * negatives), with the membership probe sitting below the big side's
  * exchange so pruned rows never shuffle. */
class PruneSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned join returns exactly the plain join's rows") {
    val big = spark.range(10000).select(col("id").as("k"),
      (col("id") * 3).as("payload"))
    // small side matches 1% of big's keys
    val small = spark.range(100).select((col("id") * 100).as("k"),
      lit("dim").as("tag"))
    val plain = big.join(small, Seq("k")).select("k", "payload", "tag")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val pruned = Prune.bloomPrunedJoin(big, small, "k")
      .select("k", "payload", "tag")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(pruned == plain)
    assert(plain.length == 100)
  }

  test("the membership probe runs below the big side's exchange") {
    val big = spark.range(10000).select(col("id").as("k"))
    val small = spark.range(10).select((col("id") * 1000).as("k"))
    val plan = spark.sessionState.executePlan(
      Prune.bloomPrunedJoin(big, small, "k").queryExecution.logical)
      .sparkPlan.toString
    // the probe must sit directly on the scan (below any exchange /
    // join input) — Catalyst even infers a copy onto the small side
    val lines = plan.linesIterator.toSeq
    val filterLine = lines.indexWhere(_.contains("bloommightcontain"))
    val scanLine = lines.indexWhere(_.contains("Range (0, 10000"))
    assert(filterLine >= 0, plan)
    assert(scanLine == filterLine + 1, s"probe not on the scan:\n$plan")
  }

  test("an empty small side yields an empty join, not a crash") {
    // Spark's bloomFilter aggregate NPEs deserializing the null sketch
    // of a zero-row input — the operator must short-circuit instead
    // (regression: q_bloom_join's dimension slice is empty at sf0.001)
    val small = spark.range(10).select(col("id").as("k"), lit("d").as("tag"))
      .filter(col("k") < 0)
    val out = Prune.bloomPrunedJoin(
      spark.range(100).select(col("id").as("k")), small, "k")
    assert(out.columns.toSeq == Seq("k", "tag"))
    assert(out.count() == 0)
  }
}
