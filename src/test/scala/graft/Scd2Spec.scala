package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.ops.Scd2

/** SCD Type-2 merge semantics: changed keys close+reopen, no-op updates
  * and unmatched keys pass through, brand-new keys open, history rows
  * are untouched, and re-applying the same batch is a no-op. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val d = Date.valueOf(_: String)

  // dim: k=1 will change, k=2 gets a no-op update, k=3 has no update,
  // k=1 also carries a closed history row.
  private def current = Seq(
    (1L, "gold", Date.valueOf("2020-01-01"), null.asInstanceOf[Date], true),
    (2L, "silver", Date.valueOf("2020-01-01"), null.asInstanceOf[Date], true),
    (3L, "bronze", Date.valueOf("2020-01-01"), null.asInstanceOf[Date], true),
    (1L, "old", Date.valueOf("2019-01-01"), Date.valueOf("2020-01-01"), false)
  ).toDF("k", "tier", "valid_from", "valid_to", "is_current")

  private def updates = Seq(
    (1L, "platinum", Date.valueOf("2021-06-01")), // change
    (2L, "silver", Date.valueOf("2021-06-01")),   // no-op
    (9L, "new", Date.valueOf("2021-06-01"))       // brand-new key
  ).toDF("k", "tier", "effective_date")

  test("changed key closes the open row and opens a new version") {
    val out = Scd2.merge(current, updates, Seq("k"))
    val k1 = out.filter($"k" === 1).orderBy("valid_from")
      .select("tier", "valid_from", "valid_to", "is_current")
      .as[(String, Date, Date, Boolean)].collect()
    assert(k1.toSeq == Seq(
      ("old", d("2019-01-01"), d("2020-01-01"), false),
      ("gold", d("2020-01-01"), d("2021-06-01"), false),
      ("platinum", d("2021-06-01"), null, true)))
  }

  test("no-op update and unmatched key pass through; new key opens") {
    val out = Scd2.merge(current, updates, Seq("k"))
    assert(out.count() == 6) // 4 current + closed-k1-replacement pair nets +2
    val k2 = out.filter($"k" === 2)
      .select("tier", "is_current").as[(String, Boolean)].collect()
    assert(k2.toSeq == Seq(("silver", true)))
    val k3 = out.filter($"k" === 3)
      .select("tier", "is_current").as[(String, Boolean)].collect()
    assert(k3.toSeq == Seq(("bronze", true)))
    val k9 = out.filter($"k" === 9)
      .select("tier", "valid_from", "valid_to", "is_current")
      .as[(String, Date, Date, Boolean)].collect()
    assert(k9.toSeq == Seq(("new", d("2021-06-01"), null, true)))
  }

  test("re-applying the same batch is a no-op (idempotent)") {
    val once = Scd2.merge(current, updates, Seq("k"))
    val later = updates.withColumn("effective_date",
      to_date(lit("2021-07-01")))
    val twice = Scd2.merge(once, later, Seq("k"))
    // attrs now match the open rows, so only the brand-new-key branch
    // could fire — and k=9 exists already, so nothing changes.
    assert(twice.count() == once.count())
    assert(twice.filter($"is_current" && $"k" === 1)
      .select("tier").as[String].head() == "platinum")
  }

  test("null -> value counts as a change (null-safe compare)") {
    val cur = Seq((5L, null.asInstanceOf[String],
      Date.valueOf("2020-01-01"), null.asInstanceOf[Date], true))
      .toDF("k", "tier", "valid_from", "valid_to", "is_current")
    val upd = Seq((5L, "filled", Date.valueOf("2021-06-01")))
      .toDF("k", "tier", "effective_date")
    val out = Scd2.merge(cur, upd, Seq("k")).orderBy("valid_from")
      .select("tier", "is_current").as[(String, Boolean)].collect()
    assert(out.toSeq == Seq((null, false), ("filled", true)))
  }
}
