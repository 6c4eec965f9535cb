package graft

import org.scalatest.BeforeAndAfterAll

/** The batteries-included entry point: one call yields a session where
  * the SQL functions and the range-join rewrite are live. */
class GraftSessionSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  override def afterAll(): Unit = {
    // Graft.session() adopts the shared test session — undo the rule so
    // suite ordering stays irrelevant
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq graft.ext.RangeJoinRule)
    super.afterAll()
  }

  test("Graft.session wires functions and the range-join rule") {
    val s = Graft.session(shufflePartitions = 4)
    assert(s.sql("SELECT graft_zorder(3, 5) AS z").as[Long].head() == 39L)
    val joined = Seq(5L).toDF("pt").join(
      Seq((0L, 10L)).toDF("s", "e"),
      org.apache.spark.sql.functions.col("pt") >= org.apache.spark.sql.functions.col("s") &&
        org.apache.spark.sql.functions.col("pt") < org.apache.spark.sql.functions.col("e"))
    assert(joined.count() == 1)
    assert(joined.queryExecution.optimizedPlan.toString.contains("_graft_bucket"))
    // idempotent re-entry: no duplicate rule registration
    Graft.session(shufflePartitions = 4)
    assert(s.experimental.extraOptimizations
      .count(_ eq graft.ext.RangeJoinRule) == 1)
  }
}
