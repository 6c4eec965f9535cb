package graft

import org.apache.spark.sql.functions._
import graft.ops.Quarantine

class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, 10.0, "ok"), (2L, -1.0, "ok"), (3L, 200.0, null.asInstanceOf[String])
  ).toDF("id", "amount", "status")

  private val rules = Seq(
    "neg_amount" -> (col("amount") < 0),
    "too_big" -> (col("amount") > 100),
    "null_status" -> col("status").isNull)

  test("split: clean and quarantined partition the input; reasons accumulate") {
    val (good, bad) = Quarantine.split(rows, rules)
    assert(good.select("id").as[Long].collect().toSeq == Seq(1L))
    val b = bad.select("id", "reasons").as[(Long, String)].collect().toMap
    assert(b == Map(2L -> "neg_amount", 3L -> "too_big,null_status"))
    assert(good.count() + bad.count() == rows.count())
  }

  test("null predicate result counts as not violated") {
    // amount NULL -> both range rules yield NULL -> clean unless an
    // explicit isNull rule fires
    val df = Seq((9L, Option.empty[Double])).toDF("id", "amount")
    val (good, bad) = Quarantine.split(df,
      Seq("neg" -> (col("amount") < 0)))
    assert(good.count() == 1 && bad.count() == 0)
  }
}
