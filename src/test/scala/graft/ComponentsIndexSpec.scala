package graft

import org.apache.spark.sql.functions._
import graft.ops.{ComponentsIndex, DedupOps}

/** Incremental connected components over the persisted label store:
  * per-batch updates must resolve to the one-shot components over the
  * accumulated pair set, labels only decrease, replays and compaction
  * change nothing. */
class ComponentsIndexSpec extends SparkSpec {
  import spark.implicits._

  private def pairsDf(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  // batch 3 bridges batch 1's {1,2,3} with batch 2's {10,11}, and
  // attaches a brand-new id to batch 2's {20,21}
  private val b1 = Seq((1L, 2L), (2L, 3L), (10L, 11L))
  private val b2 = Seq((20L, 21L))
  private val b3 = Seq((3L, 10L), (21L, 30L))

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("incremental batches resolve to one-shot components over the union") {
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx,
      batchTag = Some("b1"))
    ComponentsIndex.appendAndLabel(spark, pairsDf(b2: _*), idx,
      batchTag = Some("b2"))
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx,
      batchTag = Some("b3"))
    val inc = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    val full = labelsOf(DedupOps.connectedComponents(
      pairsDf((b1 ++ b2 ++ b3): _*)))
    assert(inc == full, s"incremental=$inc one-shot=$full")
    // the bridge merged {1,2,3} ∪ {10,11} under the global min
    assert(inc(11L) == 1L && inc(30L) == 20L)
  }

  test("labels only ever decrease across batches") {
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx,
      batchTag = Some("b1"))
    val after1 = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx,
      batchTag = Some("b3"))
    val after2 = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    for ((id, c) <- after1)
      assert(after2(id) <= c, s"label of $id regressed: $c -> ${after2(id)}")
  }

  test("appendAndLabel returns the affected set's post-batch labels") {
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx,
      batchTag = Some("b1"))
    val out = labelsOf(ComponentsIndex.appendAndLabel(spark,
      pairsDf((3L, 10L)), idx, batchTag = Some("b3")))
    // batch endpoints AND dragged-along members of both components
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("tagged replay is idempotent, including after later batches") {
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx,
      batchTag = Some("b1"))
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx,
      batchTag = Some("b3"))
    val before = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    // blind retry of b3 (same tag): self-excludes its first attempt,
    // recomputes the same changed-set, overwrites in place
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx,
      batchTag = Some("b3"))
    assert(labelsOf(ComponentsIndex.currentLabels(spark, idx)) == before)
    // untagged replay derives the same content tag — same discipline
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx)
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx)
    assert(labelsOf(ComponentsIndex.currentLabels(spark, idx)) == before)
  }

  test("lookupLabels prunes to the asked ids and matches the full resolve") {
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf((b1 ++ b2): _*), idx,
      batchTag = Some("b1"))
    val got = labelsOf(ComponentsIndex.lookupLabels(spark, idx,
      Seq(2L, 20L, 999L).toDF("id")))
    assert(got == Map(2L -> 1L, 20L -> 20L)) // unseen id absent, not null
    val p = ComponentsIndex.lookupLabels(spark, idx, Seq(2L).toDF("id"))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains("ib#"),
      s"byid lookup does not prune on ib:\n$p")
  }

  test("a batch that changes nothing writes nothing") {
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx,
      batchTag = Some("b1"))
    val before = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    // (1,3) is already inside component 1 — no label moves
    val out = ComponentsIndex.appendAndLabel(spark, pairsDf((1L, 3L)), idx,
      batchTag = Some("noop"))
    assert(labelsOf(out) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(labelsOf(ComponentsIndex.currentLabels(spark, idx)) == before)
    val tags = new java.io.File(idx + "/byid").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles()).map(_.getName)
    assert(!tags.exists(_.contains("noop")),
      s"no-op batch landed partitions: ${tags.mkString(",")}")
  }

  test("compact folds to current labels; future merges still work") {
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx,
      batchTag = Some("b1"))
    ComponentsIndex.appendAndLabel(spark, pairsDf(b2: _*), idx,
      batchTag = Some("b2"))
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx,
      batchTag = Some("b3"))
    val before = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    ComponentsIndex.compact(spark, idx, numFiles = 4)
    assert(labelsOf(ComponentsIndex.currentLabels(spark, idx)) == before)
    // post-compact appends keep merging correctly against folded rows
    ComponentsIndex.appendAndLabel(spark, pairsDf((30L, 1L)), idx,
      batchTag = Some("b4"))
    val after = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    assert(after(30L) == 1L && after(21L) == 1L && after(20L) == 1L,
      s"post-compact merge incomplete: $after")
  }

  test("star-contraction merge produces identical labels, and survives a chain batch") {
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx,
      batchTag = Some("b1"), star = true)
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx,
      batchTag = Some("b3"), star = true)
    val viaStar = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    val idx2 = tmpDir() + "/cidx2"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx2,
      batchTag = Some("b1"))
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx2,
      batchTag = Some("b3"))
    assert(viaStar == labelsOf(ComponentsIndex.currentLabels(spark, idx2)))
    // a 100-link chain batch against the same store: propagation's
    // default budget would refuse; star contracts it
    val chain = (1000L until 1100L).map(i => (i, i + 1))
    val out = ComponentsIndex.appendAndLabel(spark, pairsDf(chain: _*),
      idx, batchTag = Some("chain"), star = true)
    assert(out.count() == 101 &&
      labelsOf(ComponentsIndex.currentLabels(spark, idx))(1100L) == 1000L)
  }

  test("DEFAULT config survives a chain-shaped batch via the auto star fallback") {
    // a 35-link chain exceeds propagation's default 25-round budget;
    // the default merge must fall back to star contraction instead of
    // aborting the ingest run — and produce the same labels a forced
    // star merge would
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx,
      batchTag = Some("b1"))
    val chain = (500L until 535L).map(i => (i, i + 1))
    val out = ComponentsIndex.appendAndLabel(spark, pairsDf(chain: _*),
      idx, batchTag = Some("chain")) // default star=false, maxIter=25
    assert(out.count() == 36, "chain batch did not label all 36 members")
    val labels = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    assert((500L to 535L).forall(labels(_) == 500L),
      "auto fallback produced wrong chain labels")
    assert(labels(3L) == 1L, "earlier batch labels disturbed")
    // and a SECOND chain batch bridging into the first still works
    // through the default path (members arrive as stars + a new chain)
    val bridge = (535L until 560L).map(i => (i, i + 1))
    ComponentsIndex.appendAndLabel(spark, pairsDf(bridge: _*), idx,
      batchTag = Some("bridge"))
    assert(labelsOf(ComponentsIndex.currentLabels(spark, idx))(560L) == 500L)
  }

  test("crash between the two writes: reads stay consistent, tagged retry heals") {
    val idx = tmpDir() + "/cidx"
    ComponentsIndex.appendAndLabel(spark, pairsDf(b1: _*), idx,
      batchTag = Some("b1"))
    ComponentsIndex.appendAndLabel(spark, pairsDf(b2: _*), idx,
      batchTag = Some("b2"))
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx,
      batchTag = Some("b3"))
    // simulate the documented crash window: byid landed, bycomp didn't
    // (byid is written FIRST, so this is the only half-written state)
    def rmTag(table: String): Unit =
      new java.io.File(s"$idx/$table").listFiles()
        .filter(_.isDirectory).flatMap(_.listFiles())
        .filter(_.getName == "batch_tag=b3")
        .foreach(d => { d.listFiles().foreach(_.delete()); d.delete() })
    rmTag("bycomp")
    // reads are CONSISTENT in the crashed state: endpoint labels
    // already reflect b3 (byid survived)
    val crashed = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    assert(crashed(11L) == 1L && crashed(30L) == 20L)
    // the standard discipline: replay the same tag; self-exclusion
    // recomputes b3's exact changed-set and rewrites BOTH tables
    ComponentsIndex.appendAndLabel(spark, pairsDf(b3: _*), idx,
      batchTag = Some("b3"))
    // bycomp completeness restored: a later merge drags b3's members
    ComponentsIndex.appendAndLabel(spark, pairsDf((30L, 2L)), idx,
      batchTag = Some("b4"))
    val healed = labelsOf(ComponentsIndex.currentLabels(spark, idx))
    assert(healed(30L) == 1L && healed(21L) == 1L && healed(20L) == 1L,
      s"post-heal merge incomplete: $healed")
  }

  test("empty batch returns an empty frame and creates nothing") {
    val idx = tmpDir() + "/cidx"
    val out = ComponentsIndex.appendAndLabel(spark,
      pairsDf().filter(lit(false)), idx)
    assert(out.isEmpty)
    assert(!new java.io.File(idx + "/byid").exists())
  }
}
