package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions.{common_prefix_len, common_suffix_len, winnow_anchors}
import graft.ops.DedupOps

/** exactSubstrSpans against planted ground truth: a shared middle run
  * is found and measured exactly when it fits the extension budget,
  * capped honestly when it doesn't; the winnowing guarantee (any
  * shared run >= k+w-1 chars contains a shared anchor) holds; the
  * bucket cap drops boilerplate grams without dropping real spans. */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private def filler(seed: Int, n: Int): String = {
    // deterministic letter soup with NO repeated 8-gram across seeds:
    // LCG over the alphabet keyed by seed
    val sb = new StringBuilder
    var x = seed * 2654435761L + 1
    for (_ <- 0 until n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(('a' + math.floorMod(x >>> 33, 26L).toInt).toChar)
    }
    sb.toString
  }

  test("winnow_anchors: positions are in-range argmins, distinct, pos-sorted") {
    val df = Seq((0L, "abcabcabcabcabcabc zz abcabc")).toDF("id", "text")
      .select(explode(winnow_anchors($"text", 4, 3)).as("a"))
      .select($"a.pos", $"a.h")
    val rows = df.collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == rows.map(_._1).toSeq.sorted, "pos-sorted")
    assert(rows.map(_._1).distinct.length == rows.length, "distinct positions")
    assert(rows.forall { case (p, _) => p >= 0 && p <= "abcabcabcabcabcabc zz abcabc".length - 4 })
  }

  test("winnow_anchors: short text yields single anchor; shorter than k yields none") {
    val one = Seq((0L, "abcdef")).toDF("id", "text")
      .select(size(winnow_anchors($"text", 4, 8)).as("n")).as[Int].head()
    assert(one == 1)
    val none = Seq((0L, "ab")).toDF("id", "text")
      .select(size(winnow_anchors($"text", 4, 8)).as("n")).as[Int].head()
    assert(none == 0)
  }

  test("anchor_contexts collapses duplicate contexts map-side, positions intact") {
    // a text that repeats the same line: its anchors recur with
    // identical (h, pre, post) at shifted positions — the kernel must
    // return each distinct context ONCE with every position, matching
    // winnow_anchors' selection exactly
    val line = "the same boilerplate line here "
    val text = line * 6
    val anchors = Seq((0L, text)).toDF("id", "text")
      .select(explode(winnow_anchors($"text", 8, 4)).as("a"))
      .select($"a.pos", $"a.h").as[(Int, Long)].collect()
    val ctxs = Seq((0L, text)).toDF("id", "text")
      .select(explode(graft.functions.Expressions
        .anchor_contexts($"text", 8, 4, 16)).as("c"))
      .select($"c.h", $"c.pre", $"c.post", $"c.ps")
      .as[(Long, String, String, Seq[Int])].collect()
    // every anchor position appears exactly once across the entries
    assert(ctxs.flatMap(_._4).sorted.toSeq == anchors.map(_._1).sorted.toSeq)
    // the repetition actually collapsed: fewer entries than anchors
    assert(ctxs.length < anchors.length,
      s"${ctxs.length} entries vs ${anchors.length} anchors — no collapse")
    // contexts reproduce the substrings at each claimed position
    for ((h, pre, post, ps) <- ctxs; p <- ps) {
      assert(pre == text.substring(math.max(0, p - 16), p))
      assert(post == text.substring(p, math.min(text.length, p + 8 + 16)))
      assert(anchors.contains((p, h)))
    }
  }

  test("common affix kernels: exact lengths, empty-safe") {
    val df = Seq(("abcdef", "abcxyz", "xxdef", "yydef")).toDF("a", "b", "c", "d")
    val r = df.select(
      common_prefix_len($"a", $"b"),
      common_suffix_len($"c", $"d"),
      common_prefix_len(lit(""), $"a"),
      common_suffix_len($"a", lit("")),
      common_prefix_len($"a", $"a")).head()
    assert(r.getInt(0) == 3)
    assert(r.getInt(1) == 3)
    assert(r.getInt(2) == 0)
    assert(r.getInt(3) == 0)
    assert(r.getInt(4) == 6)
  }

  test("planted shared run is found with its exact length") {
    val shared = "this exact sentence appears verbatim in both documents"
    val docs = Seq(
      (1L, filler(1, 80) + shared + filler(2, 80)),
      (2L, filler(3, 80) + shared + filler(4, 80)),
      (3L, filler(5, 200))).toDF("doc_id", "text")
    val out = DedupOps.exactSubstrSpans(docs, "text", "doc_id",
      k = 8, w = 4, maxExt = 64, minLen = 16, maxBucket = 64)
      .collect()
    assert(out.length == 1, s"expected exactly the planted pair, got ${out.toSeq}")
    val r = out.head
    assert((r.getLong(0), r.getLong(1)) == (1L, 2L))
    // span fits k + 2*maxExt = 136 budget: measured EXACTLY
    assert(r.getInt(3) == shared.length,
      s"max_len ${r.getInt(3)} != planted ${shared.length}")
    assert(r.getLong(2) >= 1, "at least one colliding anchor")
  }

  test("span longer than the budget reports the cap, never a wrong length") {
    val shared = filler(9, 400) // one 400-char verbatim run
    val docs = Seq(
      (1L, filler(1, 40) + shared + filler(2, 40)),
      (2L, filler(3, 40) + shared + filler(4, 40))).toDF("doc_id", "text")
    val k = 8; val me = 32
    val out = DedupOps.exactSubstrSpans(docs, "text", "doc_id",
      k = k, w = 4, maxExt = me, minLen = 16, maxBucket = 64).collect()
    assert(out.length == 1)
    assert(out.head.getInt(3) == k + 2 * me,
      "a long run must saturate at the k + 2*maxExt cap")
    // many anchors inside the run collide — the capped-span signature
    assert(out.head.getLong(2) > 5)
  }

  test("bucket cap drops boilerplate grams but keeps the real span") {
    val boiler = "boilerplate header line "
    val shared = "the genuinely shared long span of text here!"
    // every doc carries the boilerplate (its anchors bust maxBucket);
    // only docs 1 and 2 share the real span
    // seeds 3i/3i+1/3i+2: disjoint per doc AND per region — a reused
    // seed means a reused LCG stream, i.e. an unintended planted run
    val docs = (1L to 30L).map { i =>
      val mid = if (i <= 2) shared else filler(3 * i.toInt + 1, 44)
      (i, boiler + filler(3 * i.toInt, 60) + mid + filler(3 * i.toInt + 2, 60))
    }.toDF("doc_id", "text")
    // minLen 30 > boiler(24) + a few lucky boundary chars: grams
    // STRADDLING the boilerplate edge live in small per-first-char
    // buckets, so pairs can legitimately share boiler+1 = 25 chars —
    // the cap drops the boilerplate interior, not its boundary
    val out = DedupOps.exactSubstrSpans(docs, "text", "doc_id",
      k = 8, w = 4, maxExt = 48, minLen = 30, maxBucket = 8)
      .collect()
    assert(out.length == 1, s"expected only the real pair, got ${out.length}")
    assert((out.head.getLong(0), out.head.getLong(1)) == (1L, 2L))
    assert(out.head.getInt(3) == shared.length)
  }

  test("winnowing guarantee: every shared run >= k+w-1 chars is caught") {
    // 50 random pairs with planted runs of exactly k+w-1 = 11 chars —
    // the theoretical minimum the anchor scheme must never miss
    val runs = (1 to 50).map(i => filler(1000 + i, 11))
    val docs = runs.zipWithIndex.flatMap { case (run, i) =>
      Seq((i * 2 + 1L, filler(i * 7 + 1, 50) + run + filler(i * 7 + 2, 50)),
        (i * 2 + 2L, filler(i * 7 + 3, 50) + run + filler(i * 7 + 4, 50)))
    }.toDF("doc_id", "text")
    val found = DedupOps.exactSubstrSpans(docs, "text", "doc_id",
      k = 8, w = 4, maxExt = 16, minLen = 11, maxBucket = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = (0 until 50).map(i => (i * 2 + 1L, i * 2 + 2L)).toSet
    assert(expected.subsetOf(found),
      s"missed planted minimal runs: ${(expected -- found).toSeq.sorted.take(5)}")
  }

  test("apply: higher-id doc loses the span, canonical keeps it, others pass through") {
    val shared = "this exact sentence appears verbatim in both documents"
    val d1 = filler(1, 80) + shared + filler(2, 80)
    val d2 = filler(3, 80) + shared + filler(4, 80)
    val d3 = filler(5, 200)
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = DedupOps.exactSubstrApply(docs, "text", "doc_id",
      k = 8, w = 4, maxExt = 64, minLen = 16, maxBucket = 64)
      .orderBy("doc_id").collect()
    assert(out.length == 3, "every input doc comes back")
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 is canonical: untouched
    assert(byId(1L) == ((0L, 0L, d1)), "canonical doc must keep its span")
    // doc 2: exactly the shared span cut out, splice preserves the rest
    val (n2, c2, t2) = byId(2L)
    assert(n2 == 1L && c2 == shared.length.toLong,
      s"doc 2 expected one ${shared.length}-char cut, got $n2 spans / $c2 chars")
    assert(t2 == filler(3, 80) + filler(4, 80),
      "splice must remove the span and nothing else")
    // doc 3 never collided: identity
    assert(byId(3L) == ((0L, 0L, d3)))
  }

  test("apply: overlapping intervals merge — each char cut at most once") {
    // doc 3 shares its span with BOTH doc 1 and doc 2 (identical span),
    // and a long run saturating the ext budget produces many
    // overlapping per-anchor intervals; the merge must collapse them to
    // one contiguous cut
    val shared = filler(9, 300)
    val docs = Seq(
      (1L, filler(1, 40) + shared + filler(2, 40)),
      (2L, filler(3, 40) + shared + filler(4, 40)),
      (3L, filler(5, 40) + shared + filler(6, 40))).toDF("doc_id", "text")
    val out = DedupOps.exactSubstrApply(docs, "text", "doc_id",
      k = 8, w = 4, maxExt = 32, minLen = 16, maxBucket = 64)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(byId(1L)._2 == 0L, "lowest id keeps the canonical occurrence")
    for (i <- Seq(2L, 3L)) {
      val (n, c, t) = byId(i)
      assert(n == 1L, s"doc $i: overlapping anchor intervals must merge, got $n")
      // the whole shared run is covered by saturated overlapping spans;
      // the cut can spill into the flanking filler only by < k+2*maxExt
      assert(c >= shared.length.toLong && c <= shared.length.toLong + 2 * (8 + 64),
        s"doc $i cut $c chars vs shared ${shared.length}")
      assert(!t.contains(shared.substring(50, 150)),
        s"doc $i still contains the run")
      assert(t.length.toLong == (40 + shared.length + 40).toLong - c)
    }
  }
}
