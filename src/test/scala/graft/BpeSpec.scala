package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Sennrich trainer: plain in-memory Scala, no Spark —
    * overlapping pair counts, lexicographic tie-break, left-to-right
    * non-overlapping merge. What the distributed fold must equal. */
  private def refTrain(corpus: Seq[String], merges: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var words: Map[Seq[String], Long] = corpus
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toSeq -> ws.length.toLong }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var segs = words
    for (rank <- 1 to merges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.foreach { case (syms, cnt) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + cnt
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
        out += ((rank, a, b, c))
        segs = segs.map { case (syms, cnt) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += (a + b); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toSeq -> cnt
        }
      }
    }
    // final segmentation keyed by the original word text
    val vocab = segs.keys.map(s => s.mkString -> s).toMap
    (out.toSeq, vocab)
  }

  private val corpus = Seq(
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low newer wide lowest")

  test("distributed training equals the reference Sennrich trainer") {
    val (refMerges, refVocab) = refTrain(corpus, 10)
    val model = Bpe.train(corpus.toDF("text"), "text", merges = 10)
    val got = model.merges.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == refMerges)
    val vocab = model.vocab.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(vocab == refVocab)
  }

  test("left==right runs merge leftmost-first, floor(k/2) pairs") {
    // 'aaaaa' = run of 5 a's: merge (a,a) -> [aa, aa, a]
    val model = Bpe.train(Seq("aaaaa aaaaa b").toDF("text"), "text", 1)
    val m = model.merges.head()
    assert((m.getString(1), m.getString(2)) == ("a", "a"))
    val syms = model.vocab.filter($"w" === "aaaaa").head().getSeq[String](1)
    assert(syms == Seq("aa", "aa", "a"))
  }

  test("a merged symbol never re-matches as the left element") {
    // word 'abab': merging (a,b) must yield [ab, ab], and a second
    // round merging (ab, ab) fuses the word — the fold's look-back
    // must see the ORIGINAL 'a' boundary, not re-match inside 'ab'
    val model = Bpe.train(Seq("abab abab abab").toDF("text"), "text", 2)
    val rules = model.merges.collect().map(r => (r.getString(1), r.getString(2)))
    assert(rules.toSeq == Seq(("a", "b"), ("ab", "ab")))
    assert(model.vocab.head().getSeq[String](1) == Seq("abab"))
  }

  test("training is deterministic across partitionings") {
    def run(np: Int) = Bpe.train(
      corpus.toDF("text").repartition(np), "text", 8)
      .merges.collect().map(_.toString).toSeq
    assert(run(1) == run(7))
  }

  test("early stop: training past the fusion horizon returns fewer rows") {
    // 'ab' alone fuses after one merge; round 2 finds no pairs
    val model = Bpe.train(Seq("ab ab ab").toDF("text"), "text", merges = 5)
    assert(model.merges.count() == 1)
  }

  test("encode: token counts, stream order, and OOV replay") {
    val model = Bpe.train(corpus.toDF("text"), "text", 10)
    val docs = Seq((1L, "low newest"), (2L, "zzz low")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "text", "doc_id", model)
      .orderBy("doc_id").collect()
    val (_, refVocab) = refTrain(corpus, 10)
    val exp1 = refVocab("low") ++ refVocab("newest")
    assert(out(0).getLong(1) == exp1.length)
    assert(out(0).getString(2) == exp1.mkString(" "))
    // 'zzz' is OOV and no learned rule touches 'z': the replay leaves
    // the character segmentation
    val exp2 = Seq("z", "z", "z") ++ refVocab("low")
    assert(out(1).getLong(1) == exp2.length)
    assert(out(1).getString(2) == exp2.mkString(" "))
  }

  /** Reference Sennrich ENCODER: apply the learned rules in rank order
    * to a word's character split, left-to-right non-overlapping — what
    * the engine's OOV path must equal. */
  private def refReplay(w: String,
                        rules: Seq[(String, String)]): Seq[String] =
    rules.foldLeft(w.map(_.toString): Seq[String]) { case (syms, (a, b)) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }

  test("encode OOV: learned rules replay, not character degradation") {
    val model = Bpe.train(corpus.toDF("text"), "text", 10)
    val rules = model.merges.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // OOV words built from in-vocab material: the rules MUST fire
    for (w <- Seq("lowlow", "newlow", "widestest")) {
      val exp = refReplay(w, rules)
      assert(exp != w.map(_.toString), s"fixture $w should actually merge")
      val out = Bpe.encode(Seq((1L, w)).toDF("doc_id", "text"),
        "text", "doc_id", model).head()
      assert(out.getLong(1) == exp.length, s"$w token count")
      assert(out.getString(2) == exp.mkString(" "), s"$w stream")
    }
  }

  test("replaying the full rule table reproduces the dictionary exactly") {
    // the fast-path/replay equivalence the encode design rests on:
    // vocab entries ARE the fixpoint of replaying training's rules
    val model = Bpe.train(corpus.toDF("text"), "text", 10)
    val rules = model.merges.orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = model.vocab.collect()
      .map(r => (r.getString(0), r.getSeq[String](1))).toMap
    val replayed = vocab.keys.toSeq.toDF("w")
      .select(col("w"),
        graft.functions.Expressions.bpe_segment(col("w"), rules).as("syms"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    assert(replayed == vocab)
  }

  test("words containing the sentinel are dropped, not corrupted") {
    val model = Bpe.train(
      Seq("ok ok a" + Bpe.Sep + "b ok").toDF("text"), "text", 1)
    assert(model.vocab.select("w").as[String].collect().toSet == Set("ok"))
  }

  test("reserved-column guard on encode") {
    val model = Bpe.train(corpus.toDF("text"), "text", 2)
    val bad = Seq((1L, "low", "x")).toDF("doc_id", "text", "bpe_tokens")
    intercept[IllegalArgumentException] {
      Bpe.encode(bad, "text", "doc_id", model)
    }
  }
}
