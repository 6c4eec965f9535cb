package graft

import org.apache.spark.sql.functions._
import graft.ops.EmbedIndex

/** Incremental semantic (embedding) dedup index: per-batch calls must,
  * in union, reproduce the batch-mode pair set exactly; the candidate
  * rule is pinned against a brute-force hamming<=1 + cosine replay. */
class EmbedIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 16
  private val bits = 6

  /** Deterministic pseudo-random vector per id; `mut` makes a
    * high-cosine affine mutant of the id's base vector. */
  private def v(seed: Long, mut: Boolean = false): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    val base = Array.fill(dims)(rnd.nextGaussian().toFloat)
    if (mut) base.map(x => (x * 1.1f) + 0.01f) else base
  }

  private def df(rows: (Long, Array[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  private def batch1 = df(
    (0L, v(0)), (1L, v(1)), (2L, v(2)), (3L, v(3)), (4L, v(0, mut = true)))
  private def batch2 = df(
    (10L, v(1, mut = true)), (11L, v(2, mut = true)), (12L, v(7)),
    (13L, v(7, mut = true)))

  private def collectPairs(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("dupPairs == brute-force hamming<=1 + rounded-cosine replay") {
    val corpus = batch1.unionByName(batch2)
    val got = collectPairs(EmbedIndex.dupPairs(
      corpus, "embedding", "vec_id", bits, threshold = 0.9))
    // independent replay of the documented candidate rule
    val b = corpus.select(col("vec_id"), col("embedding"),
      graft.functions.Expressions.hyperplane_lsh(col("embedding"), bits)
        .as("bk"))
    val exp = b.as("x").crossJoin(b.as("y"))
      .filter(col("x.vec_id") < col("y.vec_id"))
      .withColumn("ham", bit_count(col("x.bk").bitwiseXOR(col("y.bk"))))
      .filter(col("ham") <= 1)
      .withColumn("sim", graft.functions.Rounding.roundHalfUp(
        graft.functions.Expressions.cosine_sim(
          col("x.embedding"), col("y.embedding")), 6))
      .filter(col("sim") >= 0.9)
      .select(col("x.vec_id"), col("y.vec_id"), col("sim"))
    assert(got == collectPairs(exp),
      s"candidate rule drifted:\n got=$got\n exp=${collectPairs(exp)}")
    // the planted mutants are actually found (the fixture is not vacuous)
    assert(got.exists { case (a, b2, _) => a == 0L && b2 == 4L })
  }

  test("incremental calls union to the batch-mode pair set, nothing re-emitted") {
    val idx = tmpDir() + "/idx"
    val p1 = collectPairs(EmbedIndex.appendAndFindDups(spark, batch1, idx,
      "embedding", "vec_id", bits = bits, threshold = 0.9))
    val p2 = collectPairs(EmbedIndex.appendAndFindDups(spark, batch2, idx,
      "embedding", "vec_id", bits = bits, threshold = 0.9))
    val full = collectPairs(EmbedIndex.dupPairs(
      batch1.unionByName(batch2), "embedding", "vec_id", bits, 0.9))
    assert((p1 ++ p2) == full,
      s"incremental union diverged from batch mode:\n p1=$p1\n p2=$p2\n full=$full")
    assert(p1.intersect(p2).isEmpty, "a historical pair was re-emitted")
    // in-batch mutant lands in call 1; cross-batch mutants in call 2
    assert(p1.exists { case (a, b, _) => a == 0L && b == 4L })
    assert(p2.exists { case (a, b, _) => a == 1L && b == 10L },
      "cross-batch near-dup against the indexed history was missed")
    assert(p2.forall { case (a, b, _) => a >= 10L || b >= 10L },
      "a history-vs-history pair leaked into a later call")
  }

  test("tagged replay overwrites its own partitions and returns identical pairs") {
    val idx = tmpDir() + "/idx"
    EmbedIndex.appendAndFindDups(spark, batch1, idx, "embedding", "vec_id",
      bits = bits, threshold = 0.9, batchTag = Some("d0"))
    val p2 = collectPairs(EmbedIndex.appendAndFindDups(spark, batch2, idx,
      "embedding", "vec_id", threshold = 0.9, batchTag = Some("d1")))
    val nBefore = spark.read.parquet(s"$idx/vectors").count()
    val p2r = collectPairs(EmbedIndex.appendAndFindDups(spark, batch2, idx,
      "embedding", "vec_id", threshold = 0.9, batchTag = Some("d1")))
    assert(p2r == p2, "replayed batch returned a different pair set")
    assert(spark.read.parquet(s"$idx/vectors").count() == nBefore,
      "replay double-appended instead of overwriting its tag partitions")
    // an UNTAGGED call derives a content tag — a blind double-run of
    // the same batch must also be idempotent
    val idx2 = tmpDir() + "/idx2"
    EmbedIndex.appendAndFindDups(spark, batch1, idx2, "embedding",
      "vec_id", bits = bits, threshold = 0.9)
    val n1 = spark.read.parquet(s"$idx2/vectors").count()
    EmbedIndex.appendAndFindDups(spark, batch1, idx2, "embedding",
      "vec_id", bits = bits, threshold = 0.9)
    assert(spark.read.parquet(s"$idx2/vectors").count() == n1,
      "content-tagged blind retry double-appended")
  }

  test("empty batch: empty result, no schema-less index wedging") {
    val idx = tmpDir() + "/idx"
    val empty = df().select(col("vec_id"), col("embedding"))
    assert(EmbedIndex.appendAndFindDups(spark, empty, idx, "embedding",
      "vec_id", bits = bits).isEmpty)
    // a later real call still works (no wedged directory)
    val p = collectPairs(EmbedIndex.appendAndFindDups(spark, batch1, idx,
      "embedding", "vec_id", bits = bits, threshold = 0.9))
    assert(p.nonEmpty)
  }

  test("the persisted plane count wins over a later bits argument") {
    val idx = tmpDir() + "/idx"
    EmbedIndex.appendAndFindDups(spark, batch1, idx, "embedding",
      "vec_id", bits = bits, threshold = 0.9)
    // bits=3 here must be IGNORED — buckets are only comparable under
    // the plane set fixed at first append
    val p2 = collectPairs(EmbedIndex.appendAndFindDups(spark, batch2, idx,
      "embedding", "vec_id", bits = 3, threshold = 0.9))
    val full = collectPairs(EmbedIndex.dupPairs(
      batch1.unionByName(batch2), "embedding", "vec_id", bits, 0.9))
    assert(p2.subsetOf(full),
      "a mismatched bits argument re-keyed probes against the index")
    assert(p2.exists { case (a, b, _) => a == 1L && b == 10L })
  }

  test("compact preserves probe results and reduces file count") {
    val idx = tmpDir() + "/idx"
    EmbedIndex.appendAndFindDups(spark, batch1, idx, "embedding",
      "vec_id", bits = bits, threshold = 0.9, batchTag = Some("d0"))
    EmbedIndex.appendAndFindDups(spark, batch2, idx, "embedding",
      "vec_id", threshold = 0.9, batchTag = Some("d1"))
    val probe = df((20L, v(7, mut = true)))
    val before = collectPairs(EmbedIndex.appendAndFindDups(spark, probe,
      idx, "embedding", "vec_id", threshold = 0.9, batchTag = Some("d2")))
    assert(before.exists { case (a, b, _) => (a, b) == (12L, 20L) || (a, b) == (13L, 20L) })
    EmbedIndex.foldBatches(spark, idx)
    EmbedIndex.compact(spark, idx)
    // same probe against the maintained index (new tag => fresh probe,
    // the folded history must still answer)
    val after = collectPairs(EmbedIndex.appendAndFindDups(spark,
      df((21L, v(7, mut = true))), idx, "embedding", "vec_id",
      threshold = 0.9, batchTag = Some("d3")))
    assert(after.exists { case (a, b, _) => a == 12L || a == 13L },
      s"maintained index lost history: $after")
  }
}
