package graft

import org.apache.spark.sql.functions._
import graft.ops.{PqDiskIndex, SimilarityOps}

/** Persisted IVFADC index: disk search ≡ in-memory ivfpqTopK, appends
  * encode under the FIXED stored codebooks, crash-safety meta contract. */
class PqDiskIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() = java.nio.file.Files
    .createTempDirectory("pqdisk").toString

  private def planted = {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(32)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]) = v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val bases = Seq.fill(5)(vec())
    (bases.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      bases.zipWithIndex.map { case (v, i) => (100L + i, jitter(v)) } ++
      (0 until 50).map(i => (200L + i, vec()))).toDF("vec_id", "embedding")
  }

  test("disk search equals in-memory ivfpqTopK exactly") {
    val df = planted
    val dir = tmp()
    PqDiskIndex.build(spark, df, s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toString).sorted.toSeq
    val disk = norm(PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
      s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 4)
      .collect())
    val mem = norm(SimilarityOps.ivfpqTopK(df, df.filter($"vec_id" < 5),
      "embedding", "vec_id", k = 3, nlist = 8, nprobe = 4,
      m = 4, ksub = 8, iters = 2, cands = 16).collect())
    assert(disk == mem)
  }

  test("probe pruning pushes a cluster IN filter into the encoded scan") {
    val df = planted
    val dir = tmp()
    PqDiskIndex.build(spark, df, s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    val p = PqDiskIndex.search(spark, df.filter($"vec_id" < 2),
        s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 2)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("In(cluster"),
      s"cluster probe filter not pushed into the scan:\n$p")
  }

  test("append encodes under the stored codebooks; new vectors searchable") {
    val df = planted
    val dir = tmp()
    // build WITHOUT the planted partners, then append them
    PqDiskIndex.build(spark, df.filter($"vec_id" < 100 || $"vec_id" >= 200),
      s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    PqDiskIndex.append(spark,
      df.filter($"vec_id" >= 100 && $"vec_id" < 200),
      s"$dir/pq", "embedding", "vec_id")
    val out = PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
      s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 4)
      .collect()
    for (q <- 0L until 5L) {
      val rows = out.filter(_.getLong(0) == q)
      assert(rows.exists(_.getLong(1) == 100L + q),
        s"appended partner of query $q not found")
    }
  }

  test("lifecycle: accreted appends → compact → identical search, fresh-build file count") {
    val df = planted
    val dir = tmp()
    // build on the non-partner corpus, then accrete the partners as 5
    // single-id appends — each lands its own range-clustered file set,
    // so encoded/ holds ~6 overlapping generations before compaction
    PqDiskIndex.build(spark, df.filter($"vec_id" < 100 || $"vec_id" >= 200),
      s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    for (i <- 0 until 5)
      PqDiskIndex.append(spark, df.filter($"vec_id" === (100L + i)),
        s"$dir/pq", "embedding", "vec_id")
    def encFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/pq/encoded"))
        .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    }
    def results() = PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
      s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    val before = results()
    val filesBefore = encFiles()
    PqDiskIndex.compact(spark, s"$dir/pq", numFiles = 4)
    assert(results() == before,
      "compaction changed search results — it must move bytes, not codes")
    assert(encFiles() <= 4 && encFiles() < filesBefore,
      s"expected <=4 files after compact (was $filesBefore, now ${encFiles()})")
    // meta untouched: the index still loads and appends still work
    PqDiskIndex.append(spark, df.filter($"vec_id" === 210L)
      .select(lit(300L).as("vec_id"), $"embedding"),
      s"$dir/pq", "embedding", "vec_id")
    assert(PqDiskIndex.search(spark, df.filter($"vec_id" === 2L),
      s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 8)
      .collect().nonEmpty)
  }

  test("append replays are idempotent under the tag discipline") {
    val df = planted
    val dir = tmp()
    PqDiskIndex.build(spark, df.filter($"vec_id" < 100 || $"vec_id" >= 200),
      s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    val batch = df.filter($"vec_id" >= 100 && $"vec_id" < 200)
    PqDiskIndex.append(spark, batch, s"$dir/pq", "embedding", "vec_id",
      batchTag = Some("d1"))
    val rows = spark.read.parquet(s"$dir/pq/encoded").count()
    val res = PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
      s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    // blind retry, same tag: overwrites its own partition — row count
    // and search results unchanged
    PqDiskIndex.append(spark, batch, s"$dir/pq", "embedding", "vec_id",
      batchTag = Some("d1"))
    assert(spark.read.parquet(s"$dir/pq/encoded").count() == rows,
      "tagged replay double-appended")
    assert(PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
        s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq == res,
      "tagged replay changed search results")
    // untagged blind retries re-derive the same content tag: a fresh
    // index appended twice holds the batch ONCE
    val dir2 = tmp()
    PqDiskIndex.build(spark, df.filter($"vec_id" < 100 || $"vec_id" >= 200),
      s"$dir2/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    val base2 = spark.read.parquet(s"$dir2/pq/encoded").count()
    PqDiskIndex.append(spark, batch, s"$dir2/pq", "embedding", "vec_id")
    PqDiskIndex.append(spark, batch, s"$dir2/pq", "embedding", "vec_id")
    assert(spark.read.parquet(s"$dir2/pq/encoded").count() ==
      base2 + batch.count(), "content-tag replay double-appended")
  }

  test("rebuild over an appended index replaces the WHOLE encoded table") {
    val df = planted
    val dir = tmp()
    // build small, accrete appends (their codes live under the first
    // training's books), then RETRAIN on the full corpus
    PqDiskIndex.build(spark, df.filter($"vec_id" >= 200),
      s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    PqDiskIndex.append(spark, df.filter($"vec_id" < 200),
      s"$dir/pq", "embedding", "vec_id", batchTag = Some("d1"))
    PqDiskIndex.build(spark, df, s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    // no stale tag partitions: the rebuilt table holds the corpus ONCE
    assert(spark.read.parquet(s"$dir/pq/encoded").count() == df.count(),
      "rebuild left stale append partitions (codes under the OLD books) live")
    // and search equals the in-memory twin trained on the same corpus
    def norm(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toString).sorted.toSeq
    assert(norm(PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
        s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 4)
        .collect()) ==
      norm(SimilarityOps.ivfpqTopK(df, df.filter($"vec_id" < 5),
        "embedding", "vec_id", k = 3, nlist = 8, nprobe = 4,
        m = 4, ksub = 8, iters = 2, cands = 16).collect()))
  }

  test("append entry heals a crashed compact swap — streamed batches survive") {
    val df = planted
    val dir = tmp()
    PqDiskIndex.build(spark, df.filter($"vec_id" < 100 || $"vec_id" >= 200),
      s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    // simulate compact crashing AFTER its rename-in but BEFORE the
    // commit marker: the live encoded/ has no marker and a .swap_old
    // sibling (content-identical here, as after a real compact crash)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(s"$dir/pq").getFileSystem(conf)
    val live = new org.apache.hadoop.fs.Path(s"$dir/pq/encoded")
    val old = new org.apache.hadoop.fs.Path(s"$dir/pq/.encoded.swap_old")
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs, old, false, conf)
    // appends in the crash window must NOT land in the marker-less dir
    // (the next compact's recoverSwap would delete it wholesale)
    PqDiskIndex.append(spark,
      df.filter($"vec_id" >= 100 && $"vec_id" < 200),
      s"$dir/pq", "embedding", "vec_id", batchTag = Some("post-crash"))
    PqDiskIndex.compact(spark, s"$dir/pq", numFiles = 4)
    val out = PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
      s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 4)
      .collect()
    for (q <- 0L until 5L)
      assert(out.filter(_.getLong(0) == q).exists(_.getLong(1) == 100L + q),
        s"batch appended in the crash window was lost (query $q)")
  }

  test("search mid-swap reads the last COMMITTED encoded table") {
    val df = planted
    val dir = tmp()
    PqDiskIndex.build(spark, df, s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    val before = PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
      s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    // mid-swap state: old table renamed aside, replacement not yet in
    // (the window between swapInPlace's two renames) — a reader must
    // follow the marker-less .swap_old, never fail or read partial
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(s"$dir/pq").getFileSystem(conf)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/pq/encoded"),
      new org.apache.hadoop.fs.Path(s"$dir/pq/.encoded.swap_old")))
    val during = PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
      s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(during == before,
      "mid-swap search did not read the committed copy")
  }

  test("compact keepTags: kept batch stays replay-idempotent, rest folds") {
    val df = planted
    val dir = tmp()
    PqDiskIndex.build(spark, df.filter($"vec_id" >= 200),
      s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8, numFiles = 4)
    PqDiskIndex.append(spark, df.filter($"vec_id" < 100),
      s"$dir/pq", "embedding", "vec_id", batchTag = Some("old1"))
    val recent = df.filter($"vec_id" >= 100 && $"vec_id" < 200)
    PqDiskIndex.append(spark, recent,
      s"$dir/pq", "embedding", "vec_id", batchTag = Some("d9"))
    val before = PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
      s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq
    PqDiskIndex.compact(spark, s"$dir/pq", numFiles = 4,
      keepTags = Set("d9"))
    assert(PqDiskIndex.search(spark, df.filter($"vec_id" < 5),
        s"$dir/pq", "embedding", "vec_id", k = 3, cands = 16, nprobe = 8)
      .collect().map(_.toString).sorted.toSeq == before,
      "keepTags compact changed search results")
    val tags = spark.read.parquet(s"$dir/pq/encoded")
      .select("batch_tag").distinct().collect().map(_.getString(0)).toSet
    assert(tags == Set("folded", "d9"), s"unexpected tag layout: $tags")
    // the kept tag's replay contract survives: a blind retry of d9
    // overwrites its own partition, never double-appends
    val rows = spark.read.parquet(s"$dir/pq/encoded").count()
    PqDiskIndex.append(spark, recent,
      s"$dir/pq", "embedding", "vec_id", batchTag = Some("d9"))
    assert(spark.read.parquet(s"$dir/pq/encoded").count() == rows,
      "kept tag lost its replay idempotency after compact")
  }

  test("missing meta (crashed rebuild) fails loudly, not silently") {
    val df = planted
    val dir = tmp()
    PqDiskIndex.build(spark, df, s"$dir/pq", "embedding", "vec_id",
      m = 4, ksub = 8, iters = 2, nlist = 8)
    new java.io.File(s"$dir/pq/_meta_pq").delete()
    intercept[Exception] {
      PqDiskIndex.search(spark, df.filter($"vec_id" < 2), s"$dir/pq",
        "embedding", "vec_id", k = 1)
    }
  }
}
