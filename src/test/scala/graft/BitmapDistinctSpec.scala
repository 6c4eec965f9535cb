package graft

import graft.functions.BitmapDistinct.bitmap_distinct
import graft.functions.LongBitmap
import org.apache.spark.sql.functions._

/** The mergeable-bitmap exact distinct aggregate: COUNT(DISTINCT)
  * semantics (incl. nulls and all-null groups), serialization across a
  * real shuffle, the SQL surface, and the no-Expand plan shape. */
class BitmapDistinctSpec extends SparkSpec {
  import spark.implicits._

  test("matches countDistinct on random data with nulls, across a shuffle") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(5000) { i =>
      (s"g${i % 13}", if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(3000).toLong))
    } :+ (("g_allnull", None: Option[Long]))
    // repartition(17) forces partial buffers to serialize + merge
    val df = rows.toDF("g", "id").repartition(17)
    val got = df.groupBy("g").agg(bitmap_distinct($"id").as("n"))
      .as[(String, Long)].collect().toMap
    val expected = df.groupBy("g").agg(countDistinct($"id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == expected)
    assert(got("g_allnull") == 0L) // null-only group counts zero
  }

  test("integer-typed ids work; SQL surface agrees with the Column API") {
    graft.ext.GraftExtensions.register(spark)
    val df = Seq((1, 5), (1, 5), (1, 9), (2, 5)).toDF("g", "id")
    df.createOrReplaceTempView("bm_in")
    val viaSql = spark.sql(
      "SELECT g, graft_bitmap_distinct(id) AS n FROM bm_in GROUP BY g")
      .as[(Int, Long)].collect().toMap
    assert(viaSql == Map(1 -> 2L, 2 -> 1L))
  }

  test("plans ONE aggregate pass: no Expand, partial + final merge") {
    val df = Seq(("a", 1L)).toDF("g", "id")
      .groupBy("g").agg(bitmap_distinct($"id"))
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Expand"), s"bitmap aggregate expanded:\n$p")
    val aggs = p.linesIterator.count(_.matches(raw"\(\d+\) (Hash|Sort|ObjectHash)Aggregate( .*)?"))
    assert(aggs == 2, s"want partial+final aggregate, got $aggs:\n$p")
  }

  test("rejects ids outside the dense-domain contract") {
    val neg = intercept[Exception] {
      Seq(("a", -1L)).toDF("g", "id")
        .groupBy("g").agg(bitmap_distinct($"id")).collect()
    }
    assert(neg.getMessage.contains("bitmap_distinct"))
  }

  test("merge is commutative/associative and serde-stable (random trials)") {
    val rnd = new scala.util.Random(42)
    def bm(s: Seq[Long]) = { val b = new LongBitmap(); s.foreach(b.add); b }
    for (_ <- 1 to 20) {
      def ids() = Seq.fill(rnd.nextInt(200))(rnd.nextInt(100000).toLong)
      val (xs, ys, zs) = (ids(), ids(), ids())
      val all = (xs ++ ys ++ zs).toSet.size.toLong
      assert(bm(xs ++ ys ++ zs).cardinality == all)
      assert(bm(xs).or(bm(ys).or(bm(zs))).cardinality == all)
      assert(bm(zs).or(bm(ys)).or(bm(xs)).cardinality == all)
      // merging deserialized partial buffers (the shuffle path) agrees
      val ser = LongBitmap.fromBytes(bm(xs).toBytes)
        .or(LongBitmap.fromBytes(bm(ys ++ zs).toBytes))
      assert(ser.cardinality == all)
    }
  }

  test("buffer trims trailing zeros and round-trips") {
    val b = new LongBitmap()
    b.add(3L); b.add(200000L); b.add(3L)
    val back = LongBitmap.fromBytes(b.toBytes)
    assert(back.cardinality == 2L)
    val small = new LongBitmap()
    small.add(1L)
    assert(small.toBytes.length <= 4 + 8) // not sized by the domain max
    // merge a wide bitmap into a narrow one
    assert(small.or(back).cardinality == 3L)
  }
}
