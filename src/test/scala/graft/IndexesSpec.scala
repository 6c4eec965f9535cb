package graft

import org.apache.spark.sql.functions._
import graft.ops._

/** The unified maintenance entry point: `Indexes.maintain` must detect
  * every index layout, fold tags outside the retry horizon, and leave
  * every probe/search answer unchanged — pinned by driving a TWIN pair
  * of each index through the same batches, maintaining only one, and
  * comparing answers. */
class IndexesSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def filler(seed: Int, n: Int): String = {
    val sb = new StringBuilder
    var x = seed * 2654435761L + 1
    for (_ <- 0 until n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(('a' + math.floorMod(x >>> 33, 26L).toInt).toChar)
    }
    sb.toString
  }

  test("detect recognizes every layout; unknown directories fail loudly") {
    val dir = tmpDir()
    DigestIndex.appendAndDedup(spark, docsDf((1L, "alpha")), s"$dir/dg",
      "text", "doc_id", batchTag = Some("b1"))
    assert(Indexes.detect(spark, s"$dir/dg") == "digest")
    ComponentsIndex.appendAndLabel(spark,
      Seq((1L, 2L)).toDF("id_a", "id_b"), s"$dir/cc", batchTag = Some("b1"))
    assert(Indexes.detect(spark, s"$dir/cc") == "components")
    intercept[RuntimeException] { Indexes.detect(spark, s"$dir/nothing") }
    // AnnIndex and EmbedIndex share vectors/ + _meta_bits; the
    // partition-dir probe must tell them apart
    val rnd = new scala.util.Random(7)
    val vs = (1L to 20L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    AnnIndex.build(spark, vs, s"$dir/ann", "embedding", "vec_id", bits = 4)
    assert(Indexes.detect(spark, s"$dir/ann") == "ann")
    EmbedIndex.appendAndFindDups(spark, vs, s"$dir/emb",
      "embedding", "vec_id", bits = 4, batchTag = Some("b1"))
    assert(Indexes.detect(spark, s"$dir/emb") == "semantic")
    // maintain(ann): search answers pinned across the re-cluster
    AnnIndex.append(spark, vs.filter(col("vec_id") <= 3)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding")),
      s"$dir/ann", "embedding", "vec_id")
    def searchAnn() = AnnIndex.search(spark, vs.filter(col("vec_id") <= 3),
      s"$dir/ann", "embedding", "vec_id", k = 3)
      .collect().map(_.toString).sorted.toSeq
    val before = searchAnn()
    assert(Indexes.maintain(spark, s"$dir/ann").kind == "ann")
    assert(searchAnn() == before, "ann maintenance changed search")
  }

  test("maintain(digest): horizon fold then full fold, answers pinned") {
    def mk(p: String): Unit = {
      DigestIndex.appendAndDedup(spark, docsDf((1L, "alpha"), (2L, "beta")),
        p, "text", "doc_id", batchTag = Some("d1"))
      DigestIndex.appendAndDedup(spark, docsDf((3L, "alpha"), (4L, "gamma")),
        p, "text", "doc_id", batchTag = Some("d2"))
    }
    val a = tmpDir() + "/idx"; val b = tmpDir() + "/idx"
    mk(a); mk(b)
    val m = Indexes.maintain(spark, a, keepTags = Set("d2"))
    assert(m.kind == "digest" && m.dirsRewritten > 0)
    def probe(p: String) = DigestIndex.appendAndDedup(spark,
      docsDf((5L, "alpha"), (6L, "delta")), p, "text", "doc_id",
      batchTag = Some("d3"))
      .select("doc_id").as[Long].collect().toSet
    assert(probe(a) == probe(b), "horizon fold changed the probe answer")
    def groups(p: String) = DigestIndex.currentGroups(spark, p)
      .as[(Long, Long)].collect().toSet
    assert(groups(a) == groups(b))
    Indexes.maintain(spark, a) // full fold (everything behind the horizon)
    assert(groups(a) == groups(b), "full fold changed the groups")
  }

  test("maintain(lexical + exactsubstr): pair answers pinned") {
    // lexical near-dups
    val s1 = "the quick brown fox jumps over the lazy dog today"
    val s1b = "the quick brown fox jumps over the lazy dog tonight"
    def mkLex(p: String): Unit = {
      DedupIndex.appendAndFindDups(spark, docsDf((1L, s1), (2L, filler(7, 50))),
        p, "text", "doc_id", batchTag = Some("d1"))
      DedupIndex.appendAndFindDups(spark, docsDf((3L, s1b)),
        p, "text", "doc_id", batchTag = Some("d2"))
    }
    val la = tmpDir() + "/idx"; val lb = tmpDir() + "/idx"
    mkLex(la); mkLex(lb)
    assert(Indexes.maintain(spark, la, keepTags = Set("d2")).kind == "lexical")
    def probeLex(p: String) = DedupIndex.appendAndFindDups(spark,
      docsDf((4L, s1)), p, "text", "doc_id", batchTag = Some("d3"))
      .as[(Long, Long, Double)].collect().toSet
    val (pa, pb) = (probeLex(la), probeLex(lb))
    assert(pa == pb && pa.nonEmpty, s"lexical probe drifted: $pa vs $pb")

    // exact-substring spans
    val runA = filler(901, 60)
    def doc(id: Long, run: Option[String]) =
      (id, filler(id.toInt * 3, 70) + run.getOrElse(filler(id.toInt * 5, 60)) +
        filler(id.toInt * 7, 70))
    def mkEs(p: String): Unit = {
      ExactSubstrIndex.appendAndFindSpans(spark,
        docsDf(doc(1, Some(runA)), doc(2, None)), p, "text", "doc_id",
        k = 8, w = 4, maxExt = 48, minLen = 16, maxBucket = 256,
        batchTag = Some("d1"))
      ExactSubstrIndex.appendAndFindSpans(spark,
        docsDf(doc(11, Some(runA))), p, "text", "doc_id",
        k = 8, w = 4, maxExt = 48, minLen = 16, maxBucket = 256,
        batchTag = Some("d2"))
      ()
    }
    val ea = tmpDir() + "/idx"; val eb = tmpDir() + "/idx"
    mkEs(ea); mkEs(eb)
    assert(Indexes.maintain(spark, ea, keepTags = Set("d2")).kind ==
      "exactsubstr")
    def probeEs(p: String) = ExactSubstrIndex.appendAndFindSpans(spark,
      docsDf(doc(21, Some(runA))), p, "text", "doc_id",
      k = 8, w = 4, maxExt = 48, minLen = 16, maxBucket = 256,
      batchTag = Some("d3")).as[(Long, Long, Long, Int)].collect().toSet
    val (ga, gb) = (probeEs(ea), probeEs(eb))
    assert(ga == gb && ga.nonEmpty, s"exactsubstr probe drifted: $ga vs $gb")
  }

  test("maintain(semantic + components + pq): answers pinned") {
    // semantic
    val rnd = new scala.util.Random(31)
    def vec() = Array.fill(16)(rnd.nextGaussian().toFloat)
    val v1 = vec(); val v2 = vec(); val v3 = vec()
    def vdf(rows: (Long, Array[Float])*) = rows.toSeq.toDF("vec_id", "embedding")
    def mkSem(p: String): Unit = {
      EmbedIndex.appendAndFindDups(spark, vdf((1L, v1), (2L, v2)), p,
        "embedding", "vec_id", bits = 4, batchTag = Some("d1"))
      EmbedIndex.appendAndFindDups(spark, vdf((3L, v1)), p,
        "embedding", "vec_id", bits = 4, batchTag = Some("d2"))
      ()
    }
    val sa = tmpDir() + "/idx"; val sb = tmpDir() + "/idx"
    mkSem(sa); mkSem(sb)
    assert(Indexes.maintain(spark, sa, keepTags = Set("d2")).kind ==
      "semantic")
    def probeSem(p: String) = EmbedIndex.appendAndFindDups(spark,
      vdf((4L, v1)), p, "embedding", "vec_id", bits = 4,
      batchTag = Some("d3")).as[(Long, Long, Double)].collect().toSet
    val (qa, qb) = (probeSem(sa), probeSem(sb))
    assert(qa == qb && qa.nonEmpty, s"semantic probe drifted: $qa vs $qb")

    // components
    def mkCc(p: String): Unit = {
      ComponentsIndex.appendAndLabel(spark,
        Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b"), p,
        batchTag = Some("d1"))
      ComponentsIndex.appendAndLabel(spark,
        Seq((2L, 3L)).toDF("id_a", "id_b"), p, batchTag = Some("d2"))
      ()
    }
    val ca = tmpDir() + "/idx"; val cb = tmpDir() + "/idx"
    mkCc(ca); mkCc(cb)
    assert(Indexes.maintain(spark, ca, keepTags = Set("d2")).kind ==
      "components")
    def labels(p: String) = ComponentsIndex.currentLabels(spark, p)
      .as[(Long, Long)].collect().toMap
    assert(labels(ca) == labels(cb))
    def probeCc(p: String) = ComponentsIndex.appendAndLabel(spark,
      Seq((3L, 10L)).toDF("id_a", "id_b"), p, batchTag = Some("d3"))
      .as[(Long, Long)].collect().toMap
    assert(probeCc(ca) == probeCc(cb), "components probe drifted")
    Indexes.maintain(spark, ca) // full fold
    assert(labels(ca) == labels(cb), "full components fold changed labels")

    // pq
    val corpus = vdf((1L to 40L).map(i => (i, vec())): _*)
    val extra = vdf((100L, v1), (101L, v2))
    def mkPq(p: String): Unit = {
      PqDiskIndex.build(spark, corpus, p, "embedding", "vec_id",
        m = 4, ksub = 4, iters = 1, nlist = 4, numFiles = 2)
      PqDiskIndex.append(spark, extra, p, "embedding", "vec_id",
        batchTag = Some("d2"))
    }
    val pa2 = tmpDir() + "/idx"; val pb2 = tmpDir() + "/idx"
    mkPq(pa2); mkPq(pb2)
    assert(Indexes.maintain(spark, pa2, keepTags = Set("d2")).kind == "pq")
    def searchPq(p: String) = PqDiskIndex.search(spark, vdf((1L, v1)),
      p, "embedding", "vec_id", k = 3, cands = 8, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(searchPq(pa2) == searchPq(pb2), "pq search drifted")
    Indexes.maintain(spark, pa2)
    assert(searchPq(pa2) == searchPq(pb2), "full pq fold changed search")
  }
}
