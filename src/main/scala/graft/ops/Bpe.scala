package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. ACL'16) — the
  * tokenizer-fitting stage of an LLM data pipeline, re-expressed in the
  * shape every production BPE trainer actually uses at scale: the
  * corpus is touched by exactly ONE exchange (whitespace-word counts,
  * partial-aggregated), and every merge round after that operates on
  * the distinct-word table — bounded by VOCABULARY, not data volume.
  * At 100 TB the word table is maybe 10^7-10^8 rows where the corpus
  * is 10^12; the M training rounds are M small jobs over a cached,
  * lineage-cut table the corpus never rejoins.
  *
  * Per round: adjacent symbol pairs of every word are counted weighted
  * by word frequency (one vocab-sized partial-agg exchange), the
  * arg-max pair is collected (1 row; exact integer counts, ties to the
  * lexicographically smallest (left, right) — deterministic under any
  * partitioning), and the pair is merged into every word's symbol
  * sequence LEFT-TO-RIGHT NON-OVERLAPPING via a builtin `aggregate`
  * fold (a merged symbol can never re-match as the left element — its
  * text is left+right with right nonempty — so one forward fold IS the
  * Sennrich merge; for left == right this makes runs of k collapse to
  * floor(k/2) pairs, leftmost first). Pair counting counts every
  * adjacent occurrence (overlapping, per the reference algorithm:
  * "aaa" contributes (a,a) twice).
  *
  * Determinism contract: exact long counts, lexicographic tie-break,
  * and symbols never contain U+001F (words carrying it are dropped on
  * both engine and oracle side — the oracle replays the merge as a
  * sentinel-string `replace`, see ExtQueries.bpeOracleSql). Training
  * stops early if a round finds no pairs left (every word fused to one
  * symbol); callers wanting oracle row-parity pick `merges` below the
  * corpus's fusion horizon.
  */
object Bpe {

  /** Sentinel for the oracle's string-replay of the merge; symbols must
    * never contain it (enforced by dropping such words up front). */
  val Sep = "\u001f"

  /** Trained model: `merges` = (merge_rank, lft, rgt, pair_count), one
    * row per learned rule in training order; `vocab` = (w, syms) — the
    * FINAL symbol segmentation of every distinct training word, which
    * is how encoding scales: applying a learned tokenizer to a corpus
    * is a broadcast dictionary join against this table, not a per-row
    * replay of M merge rules. */
  final case class BpeModel(merges: DataFrame, vocab: DataFrame)

  /** One corpus exchange: distinct whitespace words with counts,
    * seeded with their character segmentation. */
  private def wordTable(df: DataFrame, text: String): DataFrame =
    df.select(explode(split(col(text), " ")).as("w"))
      .filter(col("w") =!= "" && !col("w").contains(Sep))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"),
        filter(split(col("w"), ""), s => s =!= "").as("syms"))

  /** Adjacent-pair struct array of `syms` (empty for 1-symbol words). */
  private def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("l"), b.as("r")))

  /** Left-to-right non-overlapping merge of (a,b) into `syms`. The
    * fold's look-back uses try_element_at so the empty-accumulator
    * probe stays null (falsy) under ANSI. */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Train `merges` BPE rules over the whitespace words of `text`.
    * Returns the model; `model.merges` is the deterministic, fully
    * oracle-replayable rule table. */
  def train(df: DataFrame, text: String, merges: Int): BpeModel = {
    require(merges >= 1 && merges <= 4096,
      s"bpeTrain: merges out of range: $merges")
    val spark = df.sparkSession
    import spark.implicits._
    // the corpus-side exchange happens once, here; everything after is
    // vocab-sized. localCheckpoint materializes the small table and
    // cuts lineage so round R's plan doesn't re-derive rounds 1..R-1.
    var words = wordTable(df, text).localCheckpoint(true)
    var lastCkpt = words
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val top = words
        .select(col("cnt"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((rank, a, b, c))
        words = words.withColumn("syms", mergeFold(col("syms"), a, b))
        // materialize every few rounds, not every round: the chain of
        // pending folds is re-evaluated by at most 3 arg-max jobs over
        // the vocab-sized table (cheap), while each skipped checkpoint
        // saves one full job round-trip — at 100 TB the knob trades
        // bounded recompute against scheduler latency, never IO.
        if (rank % 4 == 0) {
          words = words.localCheckpoint(true)
          lastCkpt.unpersist()
          lastCkpt = words
        }
        rank += 1
      }
    }
    val mergesDf = learned.toSeq
      .toDF("merge_rank", "lft", "rgt", "pair_count")
      .orderBy("merge_rank")
    BpeModel(mergesDf, words.select("w", "syms"))
  }

  /** Encode documents with a trained model: per doc, the BPE token
    * count and the full token stream (space-joined, word order
    * preserved). Encoding is the scale path described on [[BpeModel]]:
    * explode to words, broadcast-join the vocab segmentation, one
    * per-doc re-aggregation — for in-vocab words the merge rules are
    * never replayed per row. Words ABSENT from the training
    * vocabulary replay the learned rule table in rank order (the
    * Sennrich encode semantics) via the native
    * [[graft.functions.Expressions.BpeSegmentWord]] kernel — a
    * coalesce branch, so only the OOV tail pays the O(rules × len)
    * replay; the rule table is bounded driver state (≤ merges rows)
    * riding as codegen constants. On an in-vocab word the replay
    * would reproduce the dictionary entry exactly (same fold
    * semantics — pinned in BpeSpec), so the fast path is a pure
    * optimization, never a semantic fork. */
  def encode(df: DataFrame, text: String, id: String,
             model: BpeModel): DataFrame = {
    Reserved.requireAbsent(df, "bpeEncode",
      Seq("_pos", "_w", "_syms", "n_bpe_tokens", "bpe_tokens"))
    val rules = model.merges.orderBy("merge_rank")
      .select("lft", "rgt").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val docWords = df
      .select(col(id), posexplode(split(col(text), " "))
        .as(Seq("_pos", "_w")))
      .filter(col("_w") =!= "" && !col("_w").contains(Sep))
    docWords
      .join(broadcast(model.vocab.withColumnRenamed("w", "_w")
        .withColumnRenamed("syms", "_syms")), Seq("_w"), "left")
      .select(col(id), col("_pos"), coalesce(col("_syms"),
        graft.functions.Expressions.bpe_segment(col("_w"), rules))
        .as("_syms"))
      .groupBy(id)
      .agg(
        sum(size(col("_syms"))).as("n_bpe_tokens"),
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("_pos"), col("_syms")))),
          e => e.getField("_syms"))), " ").as("bpe_tokens"))
  }
}
