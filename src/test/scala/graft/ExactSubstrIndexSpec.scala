package graft

import graft.ops.{DedupOps, ExactSubstrIndex}

/** Incremental exact-substring index: the union of per-batch calls
  * must equal the full-batch operator over the accumulated corpus, and
  * tagged replays must be idempotent (same pairs, no double-counted
  * index rows). */
class ExactSubstrIndexSpec extends SparkSpec {
  import spark.implicits._

  private def filler(seed: Int, n: Int): String = {
    val sb = new StringBuilder
    var x = seed * 2654435761L + 1
    for (_ <- 0 until n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(('a' + math.floorMod(x >>> 33, 26L).toInt).toChar)
    }
    sb.toString
  }

  // spans shared across batch boundaries: docs 1/11/21 share run A
  // (one per batch), docs 2/12 share run B, doc 22 is clean
  private val runA = filler(901, 60)
  private val runB = filler(902, 60)
  private def doc(id: Long, run: Option[String]) =
    (id, filler(id.toInt * 3, 70) + run.getOrElse(filler(id.toInt * 3 + 1, 60)) +
      filler(id.toInt * 3 + 2, 70))
  private val b1 = Seq(doc(1, Some(runA)), doc(2, Some(runB)), doc(3, None))
  private val b2 = Seq(doc(11, Some(runA)), doc(12, Some(runB)), doc(13, None))
  private val b3 = Seq(doc(21, Some(runA)), doc(22, None))

  private def spans(rows: Seq[(Long, String)]) =
    DedupOps.exactSubstrSpans(rows.toDF("doc_id", "text"), "text", "doc_id",
      k = 8, w = 4, maxExt = 48, minLen = 16, maxBucket = 256)
      .as[(Long, Long, Long, Int)].collect().toSet

  private def probe(idx: String, rows: Seq[(Long, String)], tag: String) =
    ExactSubstrIndex.appendAndFindSpans(spark, rows.toDF("doc_id", "text"),
      idx, "text", "doc_id", k = 8, w = 4, maxExt = 48, minLen = 16,
      maxBucket = 256, batchTag = Some(tag))
      .as[(Long, Long, Long, Int)].collect().toSet

  test("incremental calls union to the full-batch span set") {
    val idx = tmpDir() + "/esidx"
    val p1 = probe(idx, b1, "b1")
    val p2 = probe(idx, b2, "b2")
    val p3 = probe(idx, b3, "b3")
    // each call emits only pairs touching its batch
    assert(p2.forall { case (a, b, _, _) => a >= 11 || b >= 11 })
    assert(p3.forall { case (a, b, _, _) => a >= 21 || b >= 21 })
    val full = spans(b1 ++ b2 ++ b3)
    assert((p1 ++ p2 ++ p3) == full,
      s"incremental union ${(p1 ++ p2 ++ p3).toSeq.sorted} != full ${full.toSeq.sorted}")
    // the planted cross-batch structure was actually exercised
    assert(full.exists { case (a, b, _, _) => a == 1 && b == 21 },
      "runA must link batch 1 to batch 3")
  }

  test("tagged replay returns identical pairs and never double-counts") {
    val idx = tmpDir() + "/esidx"
    val p1 = probe(idx, b1, "b1")
    val first = probe(idx, b2, "b2")
    val replay = probe(idx, b2, "b2")
    assert(replay == first, "replay with the same tag must be idempotent")
    // the index holds each batch's anchors once even after the replay:
    // a third batch still completes the full-batch semantics (a
    // double-counted b2 would inflate n_anchors weights and bucket
    // sizes, skewing pair counts or flipping cap decisions)
    val p3 = probe(idx, b3, "b3")
    assert((p1 ++ first ++ p3) == spans(b1 ++ b2 ++ b3))
  }

  test("default (no batchTag): a BLIND retry derives the same content tag " +
      "and overwrites rather than double-appending") {
    def probeAuto(idx: String, rows: Seq[(Long, String)]) =
      ExactSubstrIndex.appendAndFindSpans(spark, rows.toDF("doc_id", "text"),
        idx, "text", "doc_id", k = 8, w = 4, maxExt = 48, minLen = 16,
        maxBucket = 256)
        .as[(Long, Long, Long, Int)].collect().toSet
    val idx = tmpDir() + "/esidx"
    val p1 = probeAuto(idx, b1)
    val first = probeAuto(idx, b2)
    val countBefore = spark.read.parquet(s"$idx/anchors").count()
    val retry = probeAuto(idx, b2)
    assert(retry == first, "blind retry diverged")
    assert(spark.read.parquet(s"$idx/anchors").count() == countBefore,
      "blind retry grew the index")
    assert(spark.read.parquet(s"$idx/anchors").columns.contains("batch_tag"),
      "default mode must land in tag-scoped partitions")
    // downstream batches still see the full-batch semantics
    val p3 = probeAuto(idx, b3)
    assert((p1 ++ first ++ p3) == spans(b1 ++ b2 ++ b3))
  }

  test("lifecycle: accreted appends → fold(keep recent) + compact → " +
      "identical probes, kept tag still replayable") {
    val idx = tmpDir() + "/esidx"      // maintained
    val twin = tmpDir() + "/esidx2"    // never maintained
    for (i <- Seq(idx, twin); (b, t) <- Seq(b1 -> "b1", b2 -> "b2", b3 -> "b3"))
      probe(i, b, t)
    def tagDirs(root: String): Int = {
      def walk(f: java.io.File): Int =
        if (!f.isDirectory) 0
        else (if (f.getName.startsWith("batch_tag=")) 1 else 0) +
          f.listFiles().map(walk).sum
      walk(new java.io.File(root + "/anchors"))
    }
    val before = tagDirs(idx)
    // b3 is still inside the retry horizon — b1 and b2 fold together
    val folded = ExactSubstrIndex.foldBatches(spark, idx, keepTags = Set("b3"))
    assert(folded > 0, "accreted hb dirs must fold")
    assert(tagDirs(idx) < before, "folding must shrink tag-partition count")
    graft.ops.Layout.compactPartitions(spark, idx + "/anchors")
    // the KEPT tag's replay contract survives maintenance
    val r3 = probe(idx, b3, "b3")
    assert(r3 == probe(twin, b3, "b3"),
      "kept-tag replay diverged after fold+compact")
    // and a fresh batch probes identically against both indexes
    val b4 = Seq(doc(31, Some(runA)), doc(32, None))
    val p4 = probe(idx, b4, "b4")
    assert(p4 == probe(twin, b4, "b4"),
      "post-maintenance probe diverged from the unmaintained twin")
    assert(p4.exists { case (a, b, _, _) => a == 1 && b == 31 },
      "folded history must still pair against fresh batches")
  }

  test("crash mid-fold then APPEND: hb partitions renamed aside are healed " +
      "at the append entry, probes match an uncrashed twin") {
    val idx = tmpDir() + "/esidx_crash"
    val twin = tmpDir() + "/esidx_crash_twin"
    for (i <- Seq(idx, twin)) probe(i, b1, "b1")
    // simulate fold/compact crashes mid-swap on EVERY hb partition (the
    // accumulated worst case; each dir's no-marker swap state recovers
    // independently): the whole history looks absent to an un-healed
    // reader, and an un-healed append would recreate hb dirs whose
    // contents the next maintenance run's restore-old deletes
    val anchors = new java.io.File(s"$idx/anchors")
    val hbDirs = anchors.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("hb="))
    assert(hbDirs.nonEmpty, "test setup: no hb partitions landed")
    hbDirs.foreach { d =>
      assert(d.renameTo(new java.io.File(anchors, s".${d.getName}.swap_old")),
        s"test setup: could not stage the crash on ${d.getName}")
    }
    val p2 = probe(idx, b2, "b2")
    assert(p2 == probe(twin, b2, "b2"),
      "post-crash probe diverged from the uncrashed twin")
    assert(!anchors.listFiles().exists(_.getName.endsWith(".swap_old")),
      "append entry did not heal the crashed swaps")
    // maintenance after the heal keeps both batches' anchors
    ExactSubstrIndex.foldBatches(spark, idx, keepTags = Set("b2"))
    graft.ops.Layout.compactPartitions(spark, idx + "/anchors")
    val p3 = probe(idx, b3, "b3")
    assert(p3 == probe(twin, b3, "b3"),
      "post-crash maintenance lost appended history")
  }

  test("batchTag 'folded' is rejected: appending under the fold target " +
      "would overwrite consolidated history") {
    val idx = tmpDir() + "/esidx_reserved"
    intercept[IllegalArgumentException] {
      probe(idx, b1, "folded")
    }
  }

  test("probe plan: index pruned by broadcast semi-join, never shuffled whole") {
    // the O(batch) claim, structurally (checked on the LAZY probe frame
    // — appendAndFindSpans' eager checkpoint hides the plan): the
    // stored anchors are filtered by a BROADCAST left-semi on the
    // batch's touched keys before anything exchanges; a SortMergeJoin
    // against the index means the probe re-shuffles the whole history
    // every batch, the exact cost the index exists to avoid
    val idx = tmpDir() + "/esidx"
    probe(idx, b1, "b1")
    val ctx = ExactSubstrIndex.batchContexts(b2.toDF("doc_id", "text"),
      "text", "doc_id", k = 8, w = 4, maxExt = 48)
    val p = ExactSubstrIndex.probeFrame(spark, ctx, idx, "doc_id",
        k = 8, maxExt = 48, minLen = 16, maxBucket = 256,
        batchTag = Some("b2"))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastHashJoin"),
      s"index probe lost its broadcast semi-join:\n$p")
    assert(p.contains("LeftSemi"), s"probe join is not a semi-join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("Cartesian"),
      s"index probe shuffles the stored anchors:\n$p")
    // the probe's bucket stage shares DedupOps.cappedBuckets: the cap
    // filter on the windowed `_raw` weight gates BEFORE member collect
    assert(p.linesIterator.exists(l =>
      l.trim.startsWith("Condition") && l.contains("_raw")),
      s"probe lost the pre-collect cap filter:\n$p")
  }
}
