package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, DigestIndex}

/** Incremental exact dedup over the persisted digest store: the
  * accumulated groups must fold to the one-shot exactDupGroups answer
  * in any batch order, first arrivals win, replays and compaction
  * change nothing. */
class DigestIndexSpec extends SparkSpec {
  import spark.implicits._

  private val a = "alpha document body"
  private val b = "beta document body"
  private val c = "gamma document body"

  private def groupsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("accumulated groups == one-shot exactDupGroups, any batch order") {
    // the global representative (doc 1) arrives AFTER a duplicate of
    // its content (doc 5) — min is order-free even when arrival isn't
    val b1 = Seq((5L, a), (6L, b)).toDF("doc_id", "text")
    val b2 = Seq((1L, a), (9L, c), (10L, c)).toDF("doc_id", "text")
    val idx = tmpDir() + "/didx"
    DigestIndex.appendAndDedup(spark, b1, idx, "text", "doc_id",
      batchTag = Some("b1"))
    DigestIndex.appendAndDedup(spark, b2, idx, "text", "doc_id",
      batchTag = Some("b2"))
    val inc = groupsOf(DigestIndex.currentGroups(spark, idx))
    val full = groupsOf(DedupOps.exactDupGroups(
      b1.unionByName(b2), "text", "doc_id"))
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc == Set((1L, 2L), (6L, 1L), (9L, 2L)))
  }

  test("appendAndDedup returns first arrivals only") {
    val idx = tmpDir() + "/didx"
    val r1 = DigestIndex.appendAndDedup(spark,
      Seq((5L, a), (7L, a), (6L, b)).toDF("doc_id", "text"),
      idx, "text", "doc_id", batchTag = Some("b1"))
    // batch-internal dup: the smaller id represents
    assert(r1.select("doc_id").as[Long].collect().toSet == Set(5L, 6L))
    val r2 = DigestIndex.appendAndDedup(spark,
      Seq((1L, a), (9L, c)).toDF("doc_id", "text"),
      idx, "text", "doc_id", batchTag = Some("b2"))
    // doc 1 duplicates HISTORY (doc 5 arrived first) — not a first
    // arrival, even though its id is globally smaller
    assert(r2.select("doc_id").as[Long].collect().toSet == Set(9L))
  }

  test("tagged and content-tag replays are idempotent") {
    val idx = tmpDir() + "/didx"
    val b1 = Seq((5L, a), (6L, b)).toDF("doc_id", "text")
    val b2 = Seq((1L, a), (9L, c)).toDF("doc_id", "text")
    DigestIndex.appendAndDedup(spark, b1, idx, "text", "doc_id",
      batchTag = Some("b1"))
    val first = DigestIndex.appendAndDedup(spark, b2, idx, "text",
      "doc_id", batchTag = Some("b2")).select("doc_id").as[Long]
      .collect().toSet
    val groups = groupsOf(DigestIndex.currentGroups(spark, idx))
    // blind retry, same tag: same first-arrival set, store unchanged
    val replay = DigestIndex.appendAndDedup(spark, b2, idx, "text",
      "doc_id", batchTag = Some("b2")).select("doc_id").as[Long]
      .collect().toSet
    assert(replay == first)
    assert(groupsOf(DigestIndex.currentGroups(spark, idx)) == groups)
    // untagged appends: a BLIND retry re-derives the same content tag
    // and overwrites itself (a DIFFERENT tag for the same content is a
    // new batch by contract, and its rows count — so the whole lineage
    // here is untagged)
    val idx2 = tmpDir() + "/didx2"
    DigestIndex.appendAndDedup(spark, b1, idx2, "text", "doc_id")
    DigestIndex.appendAndDedup(spark, b2, idx2, "text", "doc_id")
    val g2 = groupsOf(DigestIndex.currentGroups(spark, idx2))
    DigestIndex.appendAndDedup(spark, b2, idx2, "text", "doc_id")
    assert(groupsOf(DigestIndex.currentGroups(spark, idx2)) == g2)
    assert(g2 == groups)
  }

  test("compact folds to one row per digest; answers unchanged, appends work") {
    val idx = tmpDir() + "/didx"
    for ((bid, rows) <- Seq(
        ("b1", Seq((5L, a), (6L, b))),
        ("b2", Seq((1L, a), (9L, c))),
        ("b3", Seq((20L, a), (21L, c)))))
      DigestIndex.appendAndDedup(spark, rows.toDF("doc_id", "text"),
        idx, "text", "doc_id", batchTag = Some(bid))
    val before = groupsOf(DigestIndex.currentGroups(spark, idx))
    DigestIndex.compact(spark, idx, numFiles = 4)
    assert(groupsOf(DigestIndex.currentGroups(spark, idx)) == before)
    // one summary row per digest after the fold
    val rows = spark.read.parquet(s"$idx/digests")
    assert(rows.count() == rows.select("digest").distinct().count())
    // post-compact appends keep deduping against folded history
    val r = DigestIndex.appendAndDedup(spark,
      Seq((30L, a), (31L, "fresh new content")).toDF("doc_id", "text"),
      idx, "text", "doc_id", batchTag = Some("b4"))
    assert(r.select("doc_id").as[Long].collect().toSet == Set(31L))
  }

  test("probe prunes the store by digest-bucket literals") {
    val idx = tmpDir() + "/didx"
    DigestIndex.appendAndDedup(spark,
      Seq((5L, a), (6L, b)).toDF("doc_id", "text"),
      idx, "text", "doc_id", batchTag = Some("b1"))
    // the pruning is inside appendAndDedup's eager probe; assert on the
    // store's read path shape via a pruned scan of the same structure
    val p = spark.read.parquet(s"$idx/digests").filter(col("db").isin(3, 4))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains("db#"),
      s"db is not a partition column:\n$p")
  }

  test("empty batch returns empty and creates nothing") {
    val idx = tmpDir() + "/didx"
    val out = DigestIndex.appendAndDedup(spark,
      Seq.empty[(Long, String)].toDF("doc_id", "text"),
      idx, "text", "doc_id")
    assert(out.isEmpty)
    assert(!new java.io.File(s"$idx/digests").exists())
  }
}
