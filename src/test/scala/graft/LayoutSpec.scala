package graft

import java.nio.file.Files
import graft.ops.Layout
import org.apache.spark.sql.functions._

/** The range-clustered layout contract: per-file key ranges are pairwise
  * disjoint (so key predicates skip all but one file slice), and the
  * filter that would do the skipping is actually pushed to the scan. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("per-file key ranges are disjoint and filters reach the scan") {
    val dir = Files.createTempDirectory("layout").toString + "/t"
    val df = spark.range(10000).select(
      (col("id") * 2654435761L % 10007).as("k"), col("id").as("payload"))
    Layout.writeRangeClustered(df, dir, Seq("k"), numFiles = 8)

    val back = spark.read.parquet(dir)
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length == 8, s"expected 8 files, got ${ranges.length}")
    ranges.sliding(2).foreach { case Array((_, _, hi1), (f2, lo2, _)) =>
      assert(lo2 > hi1, s"file ranges overlap: $hi1 >= $lo2 ($f2)")
    }
    assert(back.count() == 10000)

    val scan = back.filter(col("k") === ranges.head._3)
      .queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(k), EqualTo(k,"), scan)
  }
}
