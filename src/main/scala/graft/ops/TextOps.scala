package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Rounding.roundHalfUp
import graft.functions.Expressions.winnow_fingerprint

/** Text-analysis operators for the training-data pipeline: token/char
  * statistics, quality scoring, n-gram-heuristic language ID, and
  * winnowing fingerprints (north-star extensions, SURVEY §7.4).
  *
  * All are narrow per-row transforms — map-side, codegen'd, no shuffle.
  * At 100 TB they are bounded purely by scan throughput; every function
  * here composes from `org.apache.spark.sql.functions` HOFs except the
  * fingerprint, which is a native Catalyst expression.
  */
object TextOps {

  /** Whitespace tokens (single-space split — deterministic, locale-free). */
  def tokens(text: Column): Column = split(text, " ")

  /** Char/token/shape statistics per document. */
  def textStats(df: DataFrame, text: String): DataFrame = {
    Reserved.requireAbsent(df, "textStats",
      Seq("n_chars_calc", "n_tokens", "avg_token_len"))
    val toks = tokens(col(text))
    df.withColumn("n_chars_calc", length(col(text)))
      .withColumn("n_tokens", size(toks))
      .withColumn("avg_token_len",
        roundHalfUp((length(col(text)) - (size(toks) - lit(1))) /
          nullif(size(toks), lit(0)), 4))
  }

  /** Token counting two ways: whitespace-regex tokens and a BPE-ish
    * word/digit/symbol segmentation (the classic pre-tokenizer shape). */
  def tokenCounts(df: DataFrame, text: String): DataFrame = {
    Reserved.requireAbsent(df, "tokenCounts",
      Seq("n_ws_tokens", "n_bpe_tokens"))
    df.withColumn("n_ws_tokens", size(split(col(text), "\\s+")))
      .withColumn("n_bpe_tokens",
        size(regexp_extract_all(col(text),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))
  }

  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

  /** Quality score: length saturation + stopword density - punctuation
    * density, clamped to [0,1]. Heuristic mirrors common LLM-corpus
    * quality filters (length/punct/stopword ratios). */
  def qualityScore(df: DataFrame, text: String): DataFrame = {
    Reserved.requireAbsent(df, "qualityScore",
      Seq("n_tokens", "stop_hits", "punct_count", "quality"))
    val toks = tokens(col(text))
    val stopArr = array(stopwords.map(lit): _*)
    val nTok = size(toks)
    val stopHits = size(filter(toks, t => array_contains(stopArr, t)))
    val punct = length(col(text)) -
      length(regexp_replace(col(text), "[.,!?;]", ""))
    df.withColumn("n_tokens", nTok)
      .withColumn("stop_hits", stopHits)
      .withColumn("punct_count", punct)
      .withColumn("quality",
        roundHalfUp(
          greatest(lit(0.0), least(lit(1.0),
            least(lit(1.0), nTok / lit(100.0)) * lit(0.5) +
              (stopHits / nullif(nTok, lit(0))) * lit(2.0) -
              (punct / nullif(length(col(text)), lit(0))) * lit(0.5))), 4))
  }

  /** Marker tokens per language for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny — the point is the distributed shape
    * (pure map-side scoring), not lexicon quality. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Language ID: count marker-token hits per language, predict the
    * alphabetically-first language achieving the max hit count —
    * `"und"` (undetermined, the BCP-47 code) when NO marker hits at
    * all, instead of silently crowning the first language tested. */
  def langId(df: DataFrame, text: String): DataFrame = {
    Reserved.requireAbsent(df, "langId",
      langMarkers.map { case (l, _) => s"hits_$l" } :+ "predicted")
    val toks = tokens(lower(col(text)))
    val withHits = langMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      val markArr = array(markers.map(lit): _*)
      d.withColumn(s"hits_$lang",
        size(filter(toks, t => array_contains(markArr, t))))
    }
    val hitCols = langMarkers.map { case (l, _) => col(s"hits_$l") }
    val m = greatest(hitCols: _*)
    val best = langMarkers.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (lang, _)) => when(col(s"hits_$lang") === m, lit(lang)).otherwise(acc)
    }
    withHits.withColumn("predicted", when(m === 0, lit("und")).otherwise(best))
  }

  /** Gopher-style repetition signals: the fraction of duplicated tokens
    * and duplicated bigrams per document. High values flag the boiler-
    * plate / template / keyword-stuffed pages LLM-corpus filters drop.
    * Pure map-side array ops — scan-bound at any scale. */
  def repetitionStats(df: DataFrame, text: String): DataFrame = {
    Reserved.requireAbsent(df, "repetitionStats",
      Seq("n_tokens", "dup_token_frac", "dup_bigram_frac"))
    val toks = split(lower(trim(col(text))), "\\s+")
    val n = size(toks)
    val nb = greatest(n - 1, lit(0))
    val bigrams = slice(
      zip_with(toks, slice(toks, lit(2), nb), (a, b) => concat(a, lit(" "), b)),
      lit(1), nb)
    df.withColumn("n_tokens", n.cast("long"))
      .withColumn("dup_token_frac",
        roundHalfUp(lit(1.0) - size(array_distinct(toks)) /
          nullif(n, lit(0)).cast("double"), 4))
      .withColumn("dup_bigram_frac",
        // null text must stay NULL (unknown), not read as "no
        // repetition": greatest(NULL-1, 0) collapses nb to 0, so the
        // null case is routed explicitly before the nb branch
        when(n.isNull, lit(null).cast("double"))
          .when(nb > 0, roundHalfUp(lit(1.0) - size(array_distinct(bigrams)) /
            nb.cast("double"), 4)).otherwise(lit(0.0)))
  }

  /** Email pattern shared by Spark and the DuckDB oracle — kept to the
    * RE2/Java-regex common subset (no lookaround, no backrefs). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** NNN-NNN-NNNN / NNN.NNN.NNNN phone shape. */
  val phoneRe = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"

  /** PII redaction: replace emails/phones with typed placeholder tags
    * and count the hits — the standard pre-training scrub pass.
    * `n_pii` counts phones on the email-redacted text, matching the
    * replacement order exactly: counting both patterns on the raw text
    * would double-count a phone embedded in an email's local part and
    * disagree with the number of placeholders in `redacted`. The
    * intermediate is staged in a column (multi-reference aliases are
    * not inlined by CollapseProject) so the email pass runs once. */
  def redactPii(df: DataFrame, text: String): DataFrame = {
    // withColumn would silently replace a same-named input column —
    // same reserved-name contract as Upsert's _src/_rn, covering the
    // output columns too (re-redacting an already-redacted frame must
    // fail fast, not silently overwrite its counters)
    Reserved.requireAbsent(df, "redactPii",
      Seq("_email_redacted", "n_pii", "redacted"))
    df.withColumn("_email_redacted",
        regexp_replace(col(text), emailRe, "<EMAIL>"))
      .withColumn("n_pii",
        (size(regexp_extract_all(col(text), lit(emailRe), lit(0))) +
          size(regexp_extract_all(col("_email_redacted"), lit(phoneRe), lit(0))))
          .cast("long"))
      .withColumn("redacted",
        regexp_replace(col("_email_redacted"), phoneRe, "<PHONE>"))
      .drop("_email_redacted")
  }

  /** Card-number PII signals: maximal digit runs of card length
    * (13–19) and how many pass the Luhn checksum — the validator that
    * separates real card numbers from ids/timestamps, which the
    * [[redactPii]] regex family structurally cannot (a checksum is
    * not a regular language). Candidates are MAXIMAL `[0-9]+` runs
    * filtered by length, not a `{13,19}` regex — the latter would
    * count a 19-digit prefix of a longer run on both engines and a
    * lookaround guard is not RE2-portable. Map-side; appends
    * (n_card_candidates, n_luhn_valid). */
  def cardSignals(df: DataFrame, text: String): DataFrame = {
    Reserved.requireAbsent(df, "cardSignals",
      Seq("n_card_candidates", "n_luhn_valid"))
    val cands = filter(
      regexp_extract_all(col(text), lit("[0-9]+"), lit(0)),
      r => length(r) >= 13 && length(r) <= 19)
    df.withColumn("n_card_candidates", size(cands).cast("long"))
      .withColumn("n_luhn_valid",
        size(filter(cands,
          r => graft.functions.Expressions.luhn_valid(r))).cast("long"))
  }

  /** Luhn-conditional card redaction: every Luhn-VALID 13–19-digit
    * maximal run becomes `<CARD>`; invalid runs (and longer ones —
    * not cards) survive untouched. One codegen'd kernel pass
    * ([[graft.functions.Kernels.redactCards]]); composes with
    * [[redactPii]]'s email/phone scrub. */
  def redactCardNumbers(df: DataFrame, text: String): DataFrame = {
    Reserved.requireAbsent(df, "redactCardNumbers", Seq("redacted_cards"))
    df.withColumn("redacted_cards",
      graft.functions.Expressions.redact_cards(col(text)))
  }

  /** Shannon entropy of the per-document token distribution (nats) —
    * the low-entropy filter of LLM-corpus quality pipelines: generated
    * spam and template pages sit far below natural prose. Computed as
    * ln(n) - sum(c*ln c)/n from per-token counts, so the aggregation is
    * two partial-aggregated hash exchanges ((id, token) then (id)) and
    * the token text never reaches the second shuffle. Returns
    * (id, n, n_distinct, entropy). */
  def tokenEntropy(df: DataFrame, text: String, id: String): DataFrame =
    df.select(col(id), explode(tokens(col(text))).as("tok"))
      .groupBy(col(id), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(id))
      .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"),
        sum(col("c") * log(col("c"))).as("_clc"))
      .select(col(id), col("n"), col("n_distinct"),
        roundHalfUp(log(col("n")) - col("_clc") / col("n"), 6).as("entropy"))

  /** TF-IDF keyword extraction: top-k terms per document. The classic
    * three-shuffle shape, each one necessary and each partial-aggregated:
    * explode→(doc,term) counts; term→document frequency; per-doc top-k
    * window. The corpus size is a one-scalar driver read folded into
    * the plan as a literal (a constant-key join would fold to a
    * nested loop), and common terms — the shuffle-skew candidates —
    * are exactly the ones IDF sends to zero. */
  def tfidfTopTerms(df: DataFrame, text: String, id: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df.select(col(id),
      explode(regexp_extract_all(lower(col(text)), lit("[a-z0-9]+"), lit(0)))
        .as("term"))
    val tf = terms.groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency as a window over tf — a separate
    // groupBy("term") + self-join re-evaluates the whole explode +
    // (id, term) aggregation subtree for BOTH join sides (the diamond
    // is not reused); the window costs one term-keyed exchange over
    // the already-aggregated tf rows instead
    val nDocs = df.select(countDistinct(col(id))).head().getLong(0)
    val scored = tf
      .withColumn("df", count(lit(1)).over(
        Window.partitionBy(col("term"))))
      .withColumn("tfidf",
        roundHalfUp(col("tf") *
          log(lit(nDocs.toDouble) / col("df").cast("double")), 6))
    scored.withColumn("rk", row_number().over(
        Window.partitionBy(col(id)).orderBy(col("tfidf").desc, col("term")))
        .cast("long"))
      .filter(col("rk") <= k)
      .select(col(id), col("term"), col("tf"), col("tfidf"), col("rk"))
  }

  /** Winnowing fingerprint summary per document (k-gram 8, window 4). */
  def fingerprints(df: DataFrame, text: String): DataFrame = {
    Reserved.requireAbsent(df, "fingerprints",
      Seq("fp", "n_fp", "fp_min", "fp_max"))
    df.withColumn("fp", winnow_fingerprint(col(text), 8, 4))
      .withColumn("n_fp", size(col("fp")))
      .withColumn("fp_min", array_min(col("fp")))
      .withColumn("fp_max", array_max(col("fp")))
  }

  /** BM25 ranking of documents against a fixed bag of query terms — the
    * classic retrieval scorer, run corpus-wide (score every matching
    * doc, keep the top k). Shape: per-(doc, term) tf with doc length
    * (one partial-aggregated exchange), query terms broadcast-joined
    * (only matching rows survive the map side), document frequency as a
    * window over the already-aggregated tf rows, per-doc score fold,
    * then a bounded top-k sort. Corpus size and average doc length are
    * one driver-side scalar read folded in as literals (same rationale
    * as [[tfidfTopTerms]]). Standard parameters k1=1.2, b=0.75;
    * idf = ln(1 + (N - df + 0.5) / (df + 0.5)). */
  def bm25TopDocs(df: DataFrame, text: String, id: String,
                  queryTerms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(queryTerms.nonEmpty && k > 0)
    val stats = df.select(countDistinct(col(id)).as("n"),
      avg(size(tokens(col(text)))).as("avgdl")).head()
    // empty corpus / all-null text: nothing can match — return the
    // empty result instead of NPE-ing on the null avg()
    if (stats.isNullAt(1))
      return df.select(col(id), lit(0.0).as("score"),
        lit(0L).as("n_terms")).filter(lit(false))
    val nDocs = stats.getLong(0).toDouble
    // avgdl is pinned to 6 decimals BEFORE folding into the plan: it is
    // the one input whose accumulation order differs between engines,
    // and feeding both sides the identical rounded literal keeps every
    // downstream IEEE op bit-identical for the oracle compare
    val avgdl = math.floor(stats.getDouble(1) * 1e6 + 0.5) / 1e6
    val q = {
      import df.sparkSession.implicits._
      queryTerms.distinct.toDF("term")
    }
    val tf = df.select(col(id), size(tokens(col(text))).as("dl"),
        explode(tokens(col(text))).as("term"))
      .join(broadcast(q), "term")
      .groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val idf = log(lit(1.0) +
      (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    tf.withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("w", idf * (col("tf") * (lit(k1) + 1)) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy(col(id))
      .agg(roundHalfUp(sum(col("w")), 6).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col(id))
      .limit(k)
  }

  /** Greedy contiguous sequence packing — the context-window packing
    * step of LLM training-data prep: documents are laid end-to-end into
    * fixed-`capacity` token bins (documents may straddle a bin
    * boundary), and each doc gets its (bin, offset) coordinates.
    *
    * A single global ordering would funnel the whole corpus through one
    * window partition, so packing is SHARDED: a portable hash of the id
    * places each doc in one of `shards` independent streams, each
    * packed by a per-shard running token sum (one exchange; every shard
    * a separate window partition). At 100 TB, shards ≈ executor count —
    * each bin is still perfectly dense; only bin NUMBERING is
    * shard-local, which training consumers don't care about. Output:
    * (id, shard, n_tokens, bin, offset) with offset = the doc's start
    * position inside its bin. */
  def packSequences(df: DataFrame, text: String, id: String,
                    capacity: Int, shards: Int): DataFrame =
    packSequencesByTokens(
      df.select(col(id),
        size(tokens(col(text))).cast("long").as("n_tokens")),
      "n_tokens", id, capacity, shards)

  /** [[packSequences]] over PRE-COMPUTED token counts — the
    * composed-pipeline form: when an upstream stage already carries
    * `n_tokens` (curation, budget selection), packing needs only
    * (id, count) and the document text never enters the exchange —
    * at 100 TB the pack shuffle moves 16 bytes a row, not documents.
    * Same sharded running-sum semantics, same output columns. */
  def packSequencesByTokens(df: DataFrame, nTokens: String, id: String,
                            capacity: Int, shards: Int): DataFrame = {
    require(capacity > 0 && shards > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(id), col(nTokens).cast("long").as("n_tokens"),
        graft.functions.PortableHash.hashMod(col(id), shards.toLong)
          .as("shard"))
      .withColumn("_cum", sum("n_tokens").over(w))
      .withColumn("bin", floor((col("_cum") - col("n_tokens"))
        / capacity.toLong))
      .withColumn("offset",
        col("_cum") - col("n_tokens") - col("bin") * capacity.toLong)
      .drop("_cum")
  }

  /** Corpus-level repeated-line removal (the CCNet/RefinedWeb boilerplate
    * scrub): any line appearing in >= `minDocs` DISTINCT documents is
    * dropped from every document; survivors are reassembled in original
    * line order. Documents whose every line is boilerplate disappear
    * from the output (they carry no signal), exactly like the SQL form.
    *
    * Shape: posexplode to (id, pos, line); the boilerplate set is a
    * single-column count-distinct aggregate over the lines (two-phase,
    * no Expand); occurrences anti-join it on the line key; the rebuild
    * groups by document with an in-group sort on position. Three line-
    * keyed/doc-keyed exchanges of (id, pos, line) rows — at 100 TB the
    * anti-join key would carry an 8-byte line hash instead of the text
    * (the [[DedupOps.boilerplateNgrams]] hashPrefilter precedent); here
    * the text key keeps the op bit-identical to the DuckDB oracle. */
  def removeRepeatedLines(df: DataFrame, text: String, id: String,
                          minDocs: Int): DataFrame = {
    val rows = df.select(col(id),
      posexplode(split(col(text), "\n")).as(Seq("pos", "line")))
    val boiler = rows.groupBy("line")
      .agg(countDistinct(col(id)).as("nd"))
      .filter(col("nd") >= minDocs).select("line")
    rows.join(boiler, Seq("line"), "left_anti")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x("line"))).as("clean_text"))
  }

  /** Canonical URL for crawl dedup: scheme, query string, fragment and
    * trailing slashes dropped, host lower-cased and `www.`-stripped,
    * path kept case-sensitive. Pure map-side string ops (no UDF, no
    * java.net.URI — its parser throws on the malformed URLs a crawl is
    * full of; every regex here is total). The regexes are anchored or
    * match-to-end so first-match (DuckDB) and all-match (Spark)
    * regexp_replace semantics agree — keep it that way, the oracle
    * mirrors them verbatim. */
  def canonicalUrl(url: Column): Column = {
    // optional scheme: protocol-relative crawl URLs ("//host/path")
    // must canonicalize to the same key as their https:// twins
    val noScheme = regexp_replace(url, "^([A-Za-z][A-Za-z0-9+.-]*)?://", "")
    val noTail = regexp_replace(noScheme, "[?#].*$", "")
    val host = regexp_replace(lower(regexp_extract(noTail, "^[^/]+", 0)),
      "^www\\.", "")
    val path = regexp_replace(regexp_replace(noTail, "^[^/]+", ""), "/+$", "")
    concat(host, path)
  }

  /** Unigram log-probability scoring — the cheap perplexity proxy of
    * LLM-corpus quality filtering: score(doc) = mean over its tokens of
    * ln(corpusFreq(token) / totalTokens); template spam scores high
    * (common tokens), alphabet soup scores very low. Shape: per-(id,
    * token) counts first (one exchange over aggregated pairs), corpus
    * frequency as a window over those counts (one token-keyed exchange
    * — a groupBy+self-join would re-run the explode for both sides),
    * then the per-doc fold (one id-keyed exchange). The token text
    * never crosses the last shuffle. `totalTokens` is a one-scalar
    * driver read folded in as a literal, exactly like
    * [[tfidfTopTerms]]'s corpus size. */
  def unigramLogProb(df: DataFrame, text: String, id: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val totRow = df.select(sum(size(tokens(col(text))))).head()
    // empty input (or all-null text): sum() is NULL — no token rows will
    // flow anyway, so any nonzero divisor keeps the plan well-typed
    val total =
      if (totRow.isNullAt(0)) 1.0 else totRow.getLong(0).toDouble
    df.select(col(id), explode(tokens(col(text))).as("tok"))
      .groupBy(col(id), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("g", sum("c").over(Window.partitionBy("tok")))
      .groupBy(col(id))
      .agg(sum("c").as("n_tokens"),
        roundHalfUp(
          sum(col("c") * log(col("g").cast("double") / total)) / sum("c"),
          6).as("logprob"))
  }

  /** CCNet-style perplexity filtering (Wenzek et al. LREC'20): score
    * every document by an in-corpus bigram language model with add-k
    * smoothing, then bucket per language into head / middle / tail at
    * the 0.33 / 0.66 perplexity terciles — the classic LLM-corpus
    * quality split (keep head, sample middle, drop tail).
    *
    * LM: P(cur|prev) = (c(prev,cur) + k) / (c(prev) + k·V) with V the
    * corpus vocabulary size (one exact countDistinct scalar). Per doc,
    * ppl = exp(−Σ c·ln P / Σ c) over its distinct bigrams. CCNet uses
    * a pretrained KenLM 5-gram; the in-corpus bigram LM keeps the
    * operator self-contained and fully oracle-replayable — the
    * filtering shape (score, per-lang terciles, bucket) is the same.
    *
    * Plan shape mirrors [[unigramLogProb]]: doc-level distinct-bigram
    * counts (one exchange), global numerator/denominator as windows
    * over those counts (one bigram-keyed exchange — no self-join, the
    * bigram text crosses the wire once), the per-doc fold (one
    * id-keyed exchange), then a broadcast join of the per-lang
    * tercile row (|langs| rows). Docs with fewer than 2 tokens have
    * no bigrams and drop out — the documented contract.
    *
    * Determinism: ppl is HALF_UP-rounded to 6 digits, terciles are
    * computed over the ROUNDED ppls with the exact sort-based
    * percentile and themselves rounded before the boundary compare,
    * so the bucket decision is an exact comparison of canonical
    * values on both engines. */
  def perplexityFilter(df: DataFrame, text: String, id: String,
                       lang: String, addK: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Reserved.requireAbsent(df, "perplexityFilter",
      Seq("_b", "_prev", "_cur", "_c", "_gb", "_gp", "_p33", "_p66",
        "n_bigrams", "ppl", "bucket"))
    require(addK > 0, s"perplexityFilter: addK must be > 0, got $addK")
    val toks = tokens(col(text))
    val vRow = df.select(explode(toks).as("t")).agg(countDistinct("t")).head()
    val v = if (vRow.isNullAt(0)) 1.0 else vRow.getLong(0).toDouble
    val bigrams = zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("p"), b.as("c")))
    val grouped = df
      .select(col(id), col(lang), explode(bigrams).as("_b"))
      .groupBy(col(id), col(lang),
        col("_b.p").as("_prev"), col("_b.c").as("_cur"))
      .agg(count(lit(1)).as("_c"))
    val scored = grouped
      .withColumn("_gb", sum("_c").over(Window.partitionBy("_prev", "_cur")))
      .withColumn("_gp", sum("_c").over(Window.partitionBy("_prev")))
      .groupBy(col(id), col(lang))
      .agg(sum("_c").as("n_bigrams"),
        roundHalfUp(exp(-sum(col("_c") *
          log((col("_gb") + lit(addK)) / (col("_gp") + lit(addK) * lit(v))))
          / sum("_c")), 6).as("ppl"))
    // terciles as WINDOW aggregates over the scored rows: one
    // lang-keyed exchange of doc-level rows — a groupBy+join branch
    // would re-derive the whole bigram pipeline a second time (the
    // plan showed 8 exchanges; this shape has 5)
    val wl = Window.partitionBy(lang)
    scored
      .withColumn("_p33",
        roundHalfUp(percentile(col("ppl"), lit(0.33)).over(wl), 6))
      .withColumn("_p66",
        roundHalfUp(percentile(col("ppl"), lit(0.66)).over(wl), 6))
      .withColumn("bucket",
        when(col("ppl") <= col("_p33"), "head")
          .when(col("ppl") <= col("_p66"), "middle")
          .otherwise("tail"))
      .drop("_p33", "_p66")
  }

  /** Gopher-style within-document REPETITION signals (Rae et al. 2021,
    * appendix A1.2 — the quality rules that catch template/boilerplate
    * spam the cross-doc dedup family cannot, because the repetition is
    * inside one document): per document,
    *  - `top{n}_frac` for n ∈ `topNs`: fraction of the document's
    *    characters attributable to its single most frequent word
    *    n-gram — `count × chars(gram) / chars(text)`, ties to the
    *    lexicographically smallest gram (can exceed 1 for overlapping
    *    occurrences; it is a signal, not a probability);
    *  - `dup{dupN}_frac`: fraction of non-space characters lying in
    *    token positions covered by some word dupN-gram that occurs
    *    MORE THAN ONCE in the document — position coverage, so
    *    overlapping duplicate grams never double-count a character.
    *
    * Distribution shape: the top-gram stats are one partial-aggregated
    * (id, gram) count per n followed by a `min(struct(-cnt, gram))`
    * per-doc fold — the arg-max-with-lex-tie as ONE aggregation, no
    * window, so the exchange is distinct grams and the per-doc result
    * is a single row. The duplicate-coverage pass marks dup-gram
    * positions with one (id, gram) window count, explodes the covered
    * position ranges, and folds distinct positions against per-token
    * lengths — every stage keyed on (id, …): corpus-proportional
    * exchanges, nothing quadratic, nothing driver-side. Contract:
    * single-space-tokenized text (the [[DedupOps.shingles]] contract);
    * null-text rows are excluded. */
  def repetitionSignals(df: DataFrame, text: String, id: String,
                        topNs: Seq[Int] = Seq(2, 3, 4),
                        dupN: Int = 6): DataFrame = {
    require(topNs.nonEmpty && topNs.forall(_ >= 2) && dupN >= 2,
      s"repetitionSignals: n-gram sizes must be >= 2 ($topNs, $dupN)")
    Reserved.requireAbsent(df, "repetitionSignals",
      Seq("_gram", "_cnt", "_pos", "_tokpos", "_pick", "_tl", "_cl",
        "_text", "_nch", "_tok", "_l") ++
        topNs.flatMap(n => Seq(s"_cnt$n", s"_gram$n", s"top${n}_frac")) :+
        s"dup${dupN}_frac")
    val base = df.filter(col(text).isNotNull)
      .select(col(id), col(text).as("_text"),
        length(col(text)).as("_nch"))
    // top-n-gram char fraction, one agg chain per n
    val tops = topNs.map { n =>
      val picked = base
        .select(col(id),
          explode(DedupOps.shingles(col("_text"), n)).as("_gram"))
        .groupBy(col(id), col("_gram")).agg(count(lit(1)).as("_cnt"))
        // arg-max with min-gram tie in ONE fold: min over (-cnt, gram)
        .groupBy(col(id))
        .agg(min(struct((-col("_cnt")).as("nc"), col("_gram").as("g")))
          .as("_pick"))
        .select(col(id), (-col("_pick.nc")).as("_cnt"),
          col("_pick.g").as("_gram"))
      picked.select(col(id), col("_cnt"), col("_gram"))
        .withColumnRenamed("_cnt", s"_cnt$n")
        .withColumnRenamed("_gram", s"_gram$n")
    }
    // duplicate-n-gram POSITION coverage over non-space characters
    val grams = base.select(col(id),
      posexplode(DedupOps.shingles(col("_text"), dupN))
        .as(Seq("_pos", "_gram")))
    val dupPositions = grams
      .withColumn("_cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(id), col("_gram"))))
      .filter(col("_cnt") >= 2)
      .select(col(id),
        explode(sequence(col("_pos"), col("_pos") + lit(dupN - 1)))
          .as("_tokpos"))
      .distinct()
    val tokLens = base.select(col(id),
        posexplode(tokens(col("_text"))).as(Seq("_tokpos", "_tok")))
      .select(col(id), col("_tokpos"), length(col("_tok")).as("_l"))
    val tot = tokLens.groupBy(col(id)).agg(sum(col("_l")).as("_tl"))
    val covered = tokLens.join(dupPositions, Seq(id, "_tokpos"))
      .groupBy(col(id)).agg(sum(col("_l")).as("_cl"))
    val joined = tops.foldLeft(base.join(tot, Seq(id), "left")
        .join(covered, Seq(id), "left"))(
      (acc, t) => acc.join(t, Seq(id), "left"))
    val outCols = col(id) +: (topNs.map { n =>
      roundHalfUp(coalesce(
        (col(s"_cnt$n") * length(col(s"_gram$n"))).cast("double") /
          nullif(col("_nch"), lit(0)), lit(0.0)), 6).as(s"top${n}_frac")
    } :+ roundHalfUp(coalesce(
      col("_cl").cast("double") / nullif(col("_tl"), lit(0)), lit(0.0)), 6)
      .as(s"dup${dupN}_frac"))
    joined.select(outCols: _*)
  }

  /** The eight Gopher stop words (Rae et al. 2021, A1.1) — the
    * document must contain at least `minStopHits` DISTINCT ones. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The columns [[gopherQuality]] appends — exported so pipeline
    * stages (e.g. the streaming curation funnel) can filter on
    * `gopher_keep` and drop the rest. */
  val gopherCols: Seq[String] = Seq("n_words", "mean_word_len",
    "symbol_ratio", "bullet_frac", "ellipsis_frac", "alpha_frac",
    "stop_hits", "gopher_keep")

  /** Gopher document-level QUALITY rules (Rae et al. 2021, appendix
    * A1.1 — the filters every production curation pipeline runs before
    * dedup; the within-document REPETITION half is
    * [[repetitionSignals]]): per document,
    *  - `n_words` ∈ [minWords, maxWords] (whitespace words),
    *  - `mean_word_len` ∈ [minMeanLen, maxMeanLen],
    *  - `symbol_ratio` (hash `#` + ellipsis `...` occurrences per
    *    word) ≤ maxSymbolRatio,
    *  - `bullet_frac` (lines starting `•` or `- `) ≤ maxBulletFrac,
    *  - `ellipsis_frac` (lines ending `...` or `…`) ≤ maxEllipsisFrac,
    *  - `alpha_frac` (words containing an alphabetic char)
    *    ≥ minAlphaFrac,
    *  - `stop_hits` (distinct [[gopherStopwords]] present)
    *    ≥ minStopHits,
    * and `gopher_keep` = the conjunction. Signals are appended to the
    * input row (qualityScore-style), so a pipeline filters on
    * `gopher_keep` with NO join — every rule is a narrow per-row
    * expression over `text`: map-side, codegen'd, zero shuffle,
    * scan-bound at 100 TB.
    *
    * Determinism: every ratio is HALF_UP-rounded to 6 digits BEFORE
    * the threshold compare, so the keep decision is an exact
    * comparison of canonical values on both engines (the
    * [[perplexityFilter]] contract). Null-text rows get null signals
    * and `gopher_keep = false`. */
  /** The seven signal columns (rounded, [[gopherCols]] minus the keep
    * flag) shared by [[gopherQuality]] and [[gopherRules]] — ONE
    * definition so the appended-column and quarantine-rule surfaces
    * can never drift. */
  private def gopherSignals(t: Column): Seq[(String, Column)] = {
    val words = filter(split(t, "\\s+"), w => w =!= "")
    val nw = size(words)
    // total word chars as one regex strip — cheaper than a HOF fold,
    // and the oracle replays the identical regexp_replace
    val wordChars = length(regexp_replace(t, "\\s+", ""))
    val hashes = length(t) - length(regexp_replace(t, "#", ""))
    // non-overlapping left-to-right "..." matches in BOTH engines
    val ellipses = size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0)))
    val lines = split(t, "\n")
    val nl = size(lines)
    val bulletLines = filter(lines,
      l => startswith(l, lit("•")) || startswith(l, lit("- ")))
    val ellipsisLines = filter(lines,
      l => endswith(l, lit("...")) || endswith(l, lit("…")))
    val alphaWords = filter(words, w => w.rlike("[A-Za-z]"))
    val stopArr = array(gopherStopwords.map(lit): _*)
    val stopHits = size(array_intersect(
      array_distinct(transform(words, w => lower(w))), stopArr))
    Seq(
      "n_words" -> nw.cast("long"),
      "mean_word_len" ->
        roundHalfUp(wordChars / nullif(nw, lit(0)).cast("double"), 6),
      "symbol_ratio" -> roundHalfUp(
        (hashes + ellipses) / nullif(nw, lit(0)).cast("double"), 6),
      "bullet_frac" ->
        roundHalfUp(size(bulletLines) / nullif(nl, lit(0)).cast("double"), 6),
      "ellipsis_frac" -> roundHalfUp(
        size(ellipsisLines) / nullif(nl, lit(0)).cast("double"), 6),
      "alpha_frac" ->
        roundHalfUp(size(alphaWords) / nullif(nw, lit(0)).cast("double"), 6),
      "stop_hits" -> stopHits.cast("long"))
  }

  def gopherQuality(df: DataFrame, text: String,
                    minWords: Int = 50, maxWords: Int = 100000,
                    minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                    maxSymbolRatio: Double = 0.1,
                    maxBulletFrac: Double = 0.9,
                    maxEllipsisFrac: Double = 0.3,
                    minAlphaFrac: Double = 0.8,
                    minStopHits: Int = 2): DataFrame = {
    Reserved.requireAbsent(df, "gopherQuality", gopherCols)
    val withSignals = gopherSignals(col(text)).foldLeft(df) {
      case (d, (n, c)) => d.withColumn(n, c)
    }
    withSignals.withColumn("gopher_keep", coalesce(
      col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanLen &&
        col("mean_word_len") <= maxMeanLen &&
        col("symbol_ratio") <= maxSymbolRatio &&
        col("bullet_frac") <= maxBulletFrac &&
        col("ellipsis_frac") <= maxEllipsisFrac &&
        col("alpha_frac") >= minAlphaFrac &&
        col("stop_hits") >= minStopHits,
      lit(false)))
  }

  /** The Gopher rule set as [[Quarantine]] predicates (true WHEN
    * VIOLATED, one named rule per A1.1 filter) — so the DQ sidetable
    * records WHICH rule each quarantined document broke, not just a
    * verdict. Null/empty text violates every rule whose signal is
    * undefined (a null document has no valid word count), matching
    * `gopherQuality`'s keep = false. Same thresholds, same shared
    * signal expressions. */
  def gopherRules(text: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletFrac: Double = 0.9,
                  maxEllipsisFrac: Double = 0.3,
                  minAlphaFrac: Double = 0.8,
                  minStopHits: Int = 2): Seq[(String, Column)] = {
    val s = gopherSignals(col(text)).toMap
    def viol(pass: Column) = coalesce(!pass, lit(true))
    Seq(
      "gopher_word_count" ->
        viol(s("n_words") >= minWords && s("n_words") <= maxWords),
      "gopher_mean_word_len" ->
        viol(s("mean_word_len") >= minMeanLen &&
          s("mean_word_len") <= maxMeanLen),
      "gopher_symbol_ratio" -> viol(s("symbol_ratio") <= maxSymbolRatio),
      "gopher_bullet_lines" -> viol(s("bullet_frac") <= maxBulletFrac),
      "gopher_ellipsis_lines" ->
        viol(s("ellipsis_frac") <= maxEllipsisFrac),
      "gopher_alpha_words" -> viol(s("alpha_frac") >= minAlphaFrac),
      "gopher_stopwords" -> viol(s("stop_hits") >= minStopHits))
  }

  /** C4-style line/document filters (Raffel et al. 2020, §2.2 — the
    * other canonical web-curation rule set): a line survives iff it
    *  - ends in terminal punctuation (`.` `!` `?` `"`),
    *  - has at least `minWordsPerLine` words, and
    *  - contains none of `lineDropMarkers` (lower-cased contains —
    *    the "javascript" / cookie-notice boilerplate rule);
    * a DOCUMENT is dropped wholesale when its text contains any of
    * `docDropMarkers` (lower-cased contains — the `{` code rule and
    * the "lorem ipsum" placeholder rule), or when no line survives
    * (an all-boilerplate page carries no signal, the
    * [[removeRepeatedLines]] contract). Survivor lines reassemble in
    * original order as `clean_text` with (`n_lines`, `n_kept`)
    * counts.
    *
    * Unlike the corpus-level [[removeRepeatedLines]] (whose
    * boilerplate set needs a line-keyed aggregate), every C4 rule is
    * per-row: the line filter runs as an array HOF inside the row, so
    * the whole operator is ONE map-side projection — no explode, no
    * exchange, scan-bound at any scale.
    *
    * RESERVED-COLUMN CONTRACT (loud-fail by design): inputs already
    * carrying `n_lines`, `n_kept`, or `clean_text` are REJECTED
    * (`Reserved.requireAbsent`) rather than silently overwritten —
    * stream authors feeding a payload-carrying micro-batch to
    * [[graft.streaming.EventStream.curateSink]]`(c4 = true)` must not
    * name payload columns after these outputs (the sink forwards the
    * payload through `extraCols`, so a clash would otherwise corrupt
    * the stage's own counters). */
  def c4Filters(df: DataFrame, text: String, id: String,
                minWordsPerLine: Int = 3,
                lineDropMarkers: Seq[String] = Seq("javascript", "cookie"),
                docDropMarkers: Seq[String] = Seq("{", "lorem ipsum"),
                extraCols: Seq[String] = Nil): DataFrame = {
    require(minWordsPerLine >= 1, "c4Filters: minWordsPerLine must be >= 1")
    Reserved.requireAbsent(df, "c4Filters",
      Seq("n_lines", "n_kept", "clean_text"))
    val t = col(text)
    val lines = split(t, "\n")
    val keptLines = filter(lines, l => {
      val nWords = size(filter(split(l, " "), w => w =!= ""))
      val ll = lower(l)
      (endswith(l, lit(".")) || endswith(l, lit("!")) ||
        endswith(l, lit("?")) || endswith(l, lit("\""))) &&
        nWords >= minWordsPerLine &&
        lineDropMarkers.map(m => !ll.contains(m)).reduce(_ && _)
    })
    val docKeep = docDropMarkers
      .map(m => !lower(t).contains(m)).reduce(_ && _)
    // extraCols ride along map-side (the streaming funnel carries the
    // batch's payload columns through the stage — still no exchange)
    df.filter(t.isNotNull && docKeep)
      .select(col(id) +: extraCols.map(col) :+
        size(lines).cast("long").as("n_lines") :+
        size(keptLines).cast("long").as("n_kept") :+
        concat_ws("\n", keptLines).as("clean_text"): _*)
      .filter(col("n_kept") >= 1)
  }

}
