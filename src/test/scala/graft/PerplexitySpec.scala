package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps
import graft.functions.Rounding.roundHalfUpDouble

class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the cat ran on the mat"),
    (3L, "en", "mat cat the zz qq pp"),
    (4L, "de", "der hund der hund lief"),
    (5L, "de", "der hund schlief tief"),
    (6L, "de", "tief lief schlief der"),
    (7L, "en", "solo"), // 1 token: no bigrams, must drop
    (8L, "en", "the cat sat on the mat")) // exact dup of 1
    .toDF("doc_id", "lang", "text")

  /** In-memory reference: same LM, same rounding discipline. */
  private def refPpl(corpus: Seq[(Long, String, String)], k: Double)
      : Map[Long, (Long, Double)] = {
    val tokenized = corpus.map { case (id, lang, t) => (id, lang, t.split(" ").toSeq) }
    val vocab = tokenized.flatMap(_._3).distinct.size.toDouble
    val allBg = tokenized.flatMap { case (_, _, ts) => ts.zip(ts.drop(1)) }
    val cb = allBg.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cp = allBg.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    tokenized.flatMap { case (id, _, ts) =>
      val bgs = ts.zip(ts.drop(1))
      if (bgs.isEmpty) None
      else {
        val n = bgs.length.toLong
        val s = bgs.map(bg =>
          math.log((cb(bg) + k) / (cp(bg._1) + k * vocab))).sum
        Some(id -> (n, roundHalfUpDouble(math.exp(-s / n), 6)))
      }
    }.toMap
  }

  test("ppl matches the in-memory bigram-LM reference; 1-token docs drop") {
    val out = TextOps.perplexityFilter(docs, "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val ref = refPpl(
      docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq,
      k = 0.1)
    assert(!out.contains(7L), "1-token doc must have no bigrams")
    assert(out == ref)
  }

  test("buckets are per-language terciles; identical docs share a bucket") {
    val rows = TextOps.perplexityFilter(docs, "text", "doc_id", "lang")
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getString(4))).toMap
    // duplicate docs => identical ppl => identical bucket
    assert(rows(1L) == rows(8L))
    // every language has at least one head (min ppl <= its p33)
    for (lang <- Seq("en", "de")) {
      val inLang = TextOps.perplexityFilter(docs, "text", "doc_id", "lang")
        .filter(col("lang") === lang).collect()
      assert(inLang.exists(_.getString(4) == "head"), s"$lang has no head")
      assert(inLang.exists(_.getString(4) == "tail"), s"$lang has no tail")
    }
  }

  test("deterministic across partitionings") {
    def run(np: Int) = TextOps.perplexityFilter(
      docs.repartition(np), "text", "doc_id", "lang")
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(run(1) == run(5))
  }

  test("reserved-column guard") {
    intercept[IllegalArgumentException] {
      TextOps.perplexityFilter(
        docs.withColumn("ppl", lit(1.0)), "text", "doc_id", "lang")
    }
  }
}
