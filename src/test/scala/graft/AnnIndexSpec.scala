package graft

import org.apache.spark.sql.functions._
import graft.ops.{AnnIndex, SimilarityOps}

/** Persisted ANN index: search over the stored index equals in-memory
  * lshTopK under the same plane set; appends keep the fixed bit count;
  * the probe IN-list pushes into the parquet scan. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def planted = {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]) = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val bases = Seq.fill(5)(vec())
    (bases.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      bases.zipWithIndex.map { case (v, i) => (100L + i, jitter(v)) } ++
      (0 until 50).map(i => (200L + i, vec()))).toDF("vec_id", "embedding")
  }

  private def collectHits(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "sim", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("index search == in-memory lshTopK under the same plane set") {
    val df = planted
    val idx = tmpDir() + "/ann"
    val bits = AnnIndex.build(spark, df, idx, "embedding", "vec_id", bits = 8)
    assert(bits == 8)
    assert(AnnIndex.readBits(spark, idx) == 8)
    val queries = df.filter($"vec_id" < 5)
    val viaIndex = collectHits(
      AnnIndex.search(spark, queries, idx, "embedding", "vec_id", k = 3))
    val inMemory = collectHits(
      SimilarityOps.lshTopK(df, queries, "embedding", "vec_id", 3, bits = 8))
    assert(viaIndex == inMemory,
      s"index search diverged:\n idx=$viaIndex\n mem=$inMemory")
    // planted partners are recalled
    (0L until 5L).foreach { q =>
      assert(viaIndex.exists { case (qq, n, _, _) => qq == q && n == 100 + q },
        s"planted partner of $q missed")
    }
  }

  test("append keeps the fixed plane set; search sees old and new vectors") {
    val df = planted
    val idx = tmpDir() + "/ann"
    // build on the noise + partners, then append the query rows' own
    // vectors as a later batch
    AnnIndex.build(spark, df.filter($"vec_id" >= 5), idx,
      "embedding", "vec_id", bits = 8)
    AnnIndex.append(spark, df.filter($"vec_id" < 5), idx,
      "embedding", "vec_id")
    val queries = df.filter($"vec_id" < 5)
    val got = collectHits(
      AnnIndex.search(spark, queries, idx, "embedding", "vec_id", k = 2))
    // self (appended batch) ranks first, planted partner (base build)
    // second — old and new vectors share one bucket space
    (0L until 5L).foreach { q =>
      assert(got.exists { case (qq, n, _, rk) => qq == q && n == q && rk == 1 },
        s"appended self of $q missed")
      assert(got.exists { case (qq, n, _, rk) => qq == q && n == 100 + q && rk == 2 },
        s"planted partner of $q missed after append")
    }
  }

  test("compact: accreted appends re-cluster, search identical, crash window safe") {
    val df = planted
    val idx = tmpDir() + "/ann"
    AnnIndex.build(spark, df.filter($"vec_id" < 100 || $"vec_id" >= 200),
      idx, "embedding", "vec_id", bits = 8, numFiles = 4)
    for (i <- 0 until 5)
      AnnIndex.append(spark, df.filter($"vec_id" === (100L + i)),
        idx, "embedding", "vec_id")
    def vecFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$idx/vectors"))
        .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    }
    def results() = collectHits(AnnIndex.search(spark,
      df.filter($"vec_id" < 5), idx, "embedding", "vec_id", k = 3))
    val before = results()
    val filesBefore = vecFiles()
    AnnIndex.compact(spark, idx, numFiles = 4)
    assert(results() == before,
      "compaction changed search results — it must move bytes, not buckets")
    assert(vecFiles() <= 4 && vecFiles() < filesBefore,
      s"expected <=4 files after compact (was $filesBefore, now ${vecFiles()})")
    // crash window: live copy aside without a commit marker — a search
    // follows the committed copy; an append heals before writing, so
    // its rows survive the next compact
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(s"$idx/vectors")
    val old = new org.apache.hadoop.fs.Path(s"$idx/.vectors.swap_old")
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, old, false, conf)
    assert(results() == before, "mid-swap search did not read committed copy")
    AnnIndex.append(spark, df.filter($"vec_id" === 210L)
      .select(lit(300L).as("vec_id"), $"embedding"), idx,
      "embedding", "vec_id")
    AnnIndex.compact(spark, idx, numFiles = 4)
    // k = 3, not 1: the appended vector is a copy of id 210, so the two
    // tie at sim 1.0 and the smaller id wins rank 1
    assert(AnnIndex.search(spark, df.filter($"vec_id" === 210L)
        .select(lit(300L).as("vec_id"), $"embedding"), idx,
        "embedding", "vec_id", k = 3)
      .collect().exists(_.getLong(1) == 300L),
      "batch appended in the crash window was lost")
  }

  test("probe keys push down into the index scan") {
    val df = planted
    val idx = tmpDir() + "/ann"
    AnnIndex.build(spark, df, idx, "embedding", "vec_id", bits = 8)
    val plan = AnnIndex.search(spark, df.filter($"vec_id" === 0L), idx,
      "embedding", "vec_id", k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(bucket"),
      s"probe IN-list not pushed into the scan:\n$plan")
  }
}
