package graft

import org.apache.spark.sql.functions._

/** The scan-parallelism floor ([[graft.io.Tables.read]]): a table whose
  * whole byte size fits in one scan split would otherwise plan ~1 scan
  * task and serialize every downstream map-side kernel; the floor
  * round-robins it to `defaultParallelism` right after the read. These
  * tests pin the trigger, the opt-out, and that results are unchanged
  * by the repartition (the engine-wide partitioning-invariance
  * contract, observed through a representative aggregate). */
class TablesScanFloorSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withFloor[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.get("spark.graft.scanParallelismFloor", "false")
    spark.conf.set("spark.graft.scanParallelismFloor", on.toString)
    try body
    finally spark.conf.set("spark.graft.scanParallelismFloor", prev)
  }

  test("floor lifts a single-small-file scan to defaultParallelism") {
    val par = spark.sparkContext.defaultParallelism
    val n = withFloor(on = true) {
      graft.io.Tables.read(spark, sf, "documents", floorHint = true)
        .rdd.getNumPartitions
    }
    assert(n == par, s"expected the floor to repartition to $par, got $n")
  }

  test("an un-hinted read never floors, even with the conf on") {
    val n = withFloor(on = true) {
      graft.io.Tables.read(spark, sf, "documents").rdd.getNumPartitions
    }
    assert(n < spark.sparkContext.defaultParallelism ||
      spark.sparkContext.defaultParallelism == 1)
  }

  test("opt-out conf leaves the raw scan partitioning alone") {
    val n = withFloor(on = false) {
      graft.io.Tables.read(spark, sf, "documents", floorHint = true)
        .rdd.getNumPartitions
    }
    assert(n < spark.sparkContext.defaultParallelism ||
      spark.sparkContext.defaultParallelism == 1,
      s"sf0.001 documents is one tiny file; expected an un-floored scan, got $n")
  }

  test("results are identical with and without the floor") {
    def fingerprint(on: Boolean): (Long, Long) = withFloor(on) {
      val d = graft.io.Tables.read(spark, sf, "documents", floorHint = true)
      val r = d.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(doc_id, text))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(fingerprint(on = true) == fingerprint(on = false))
  }

  test("events ts nanos conversion survives the floor") {
    withFloor(on = true) {
      val ev = graft.io.Tables.read(spark, sf, "events", floorHint = true)
      assert(Set("timestamp", "timestamp_ntz")
        .contains(ev.schema("ts").dataType.typeName))
      assert(ev.filter(col("ts").isNull).count() == 0L)
    }
  }
}
