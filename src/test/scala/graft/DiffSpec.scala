package graft

import graft.ops.Diff

/** Snapshot diff classification: added/removed/changed, null-safe
  * payload comparison, unchanged rows omitted. */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies adds, removes, changes; omits unchanged") {
    val old = Seq(
      (1L, Some("a"), 1.0), (2L, Some("b"), 2.0),
      (3L, Some("c"), 3.0), (4L, None: Option[String], 4.0)
    ).toDF("id", "s", "x")
    val neu = Seq(
      (1L, Some("a"), 1.0),               // unchanged
      (2L, Some("B"), 2.0),               // changed (s)
      (4L, Some("now"), 4.0),             // changed (null -> value)
      (5L, Some("e"), 5.0)                // added
    ).toDF("id", "s", "x")                // 3 removed
    val got = Diff.snapshotDiff(old, neu, Seq("id"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((2L, "changed"), (3L, "removed"),
      (4L, "changed"), (5L, "added")))
  }

  test("one co-partitioned shuffle pair, no nested loop") {
    val old = Seq((1L, "a")).toDF("id", "s")
    val neu = Seq((1L, "a")).toDF("id", "s")
    val plan = Diff.snapshotDiff(old, neu, Seq("id"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.toLowerCase.contains("cartesian"), plan)
  }
}
