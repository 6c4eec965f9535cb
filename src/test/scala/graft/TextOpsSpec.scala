package graft

import org.apache.spark.sql.functions._
import graft.functions.Expressions
import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("text stats: token and char math") {
    val out = TextOps.textStats(Seq((1L, "one two three")).toDF("id", "text"), "text")
      .select("n_chars_calc", "n_tokens", "avg_token_len").collect()(0)
    assert(out.getInt(0) == 13)
    assert(out.getInt(1) == 3)
    assert(out.getDouble(2) == math.rint((13.0 - 2) / 3 * 10000) / 10000)
  }

  test("token counts: whitespace vs BPE-ish segmentation") {
    val out = TextOps.tokenCounts(
      Seq((1L, "Hello, world! x2  done")).toDF("id", "text"), "text")
      .select("n_ws_tokens", "n_bpe_tokens").collect()(0)
    assert(out.getInt(0) == 4) // "Hello,", "world!", "x2", "done"
    // Hello , world ! x 2 done -> 7
    assert(out.getInt(1) == 7)
  }

  test("language ID: real sentences classify correctly") {
    val docs = Seq(
      (1L, "the cat and the dog sat of the mat", "en"),
      (2L, "el perro y la casa de que los gatos", "es"),
      (3L, "der hund und die katze und das haus", "de"),
      (4L, "le chien et la maison et les chats des", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = TextOps.langId(docs, "text")
      .select("lang", "predicted").as[(String, String)].collect()
    out.foreach { case (truth, pred) => assert(truth == pred,
      s"expected $truth got $pred") }
  }

  test("quality: longer stopword-rich text scores higher than fragment") {
    val docs = Seq(
      (1L, ("the report and the analysis of the data in the study " * 10).trim),
      (2L, "x; y. z!")).toDF("doc_id", "text")
    val q = TextOps.qualityScore(docs, "text")
      .select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q(1L) > q(2L))
    assert(q(1L) <= 1.0)
  }

  test("winnow fingerprints: shared long substring -> shared fingerprint") {
    val shared = "a long common passage of text that both documents contain verbatim"
    val df = Seq(
      (1L, "prefix one " + shared + " suffix one"),
      (2L, "totally different start " + shared + " other ending"),
      (3L, "qqq www eee rrr ttt yyy uuu iii ooo ppp zzz")
    ).toDF("doc_id", "text")
      .select($"doc_id", Expressions.winnow_fingerprint($"text", 8, 4).as("fp"))
    val fps = df.as[(Long, Array[Long])].collect().toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty)
    assert(fps(1L).intersect(fps(3L)).isEmpty)
  }

  test("fingerprint edge: text shorter than k") {
    val out = Seq((1L, "tiny")).toDF("id", "text")
      .select(Expressions.winnow_fingerprint($"text", 8, 4).as("fp"))
      .select(size($"fp")).as[Int].head()
    assert(out == 0)
  }

  test("simhash: permutation-insensitive (bag of words), content-sensitive") {
    def sig(s: String): Long =
      Seq(s).toDF("t").select(Expressions.simhash64(split($"t", " ")))
        .as[Long].head()
    val a = sig("alpha beta gamma delta epsilon")
    val b = sig("epsilon delta gamma beta alpha")
    assert(a == b) // order-free
    val c = sig("totally different tokens here now")
    assert(java.lang.Long.bitCount(a ^ c) > 10)
  }

  test("repetition stats: duplicated token/bigram fractions") {
    val out = TextOps.repetitionStats(Seq(
      (1L, "a b a b a b"),   // 6 tokens, 2 distinct; 5 bigrams, 2 distinct
      (2L, "all words here differ"),
      (3L, "solo")           // one token: no bigrams -> 0.0
    ).toDF("id", "text"), "text")
      .select("id", "n_tokens", "dup_token_frac", "dup_bigram_frac")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 6L, math.rint((1 - 2.0 / 6) * 1e4) / 1e4,
      math.rint((1 - 2.0 / 5) * 1e4) / 1e4)))
    assert(out(1) == ((2L, 4L, 0.0, 0.0)))
    assert(out(2) == ((3L, 1L, 0.0, 0.0)))
  }

  test("Gopher repetition signals: top-n-gram char fraction + dup-gram coverage") {
    // doc 1: "x y x y x y z" — top 2-gram "x y" occurs 3x, len 3,
    // nch 13 -> top2 = 9/13; its dup 2-grams "x y"(3x) and "y x"(2x)
    // cover ALL 7 token positions
    // doc 2: all distinct tokens -> every frac 0 except top-n of cnt 1
    // doc 3: "a b c d e f a b c d e f" — the 6-gram "a b c d e f"
    // occurs twice -> coverage = all 12 positions -> dup6 = 1.0
    val df = Seq(
      (1L, "x y x y x y z"),
      (2L, "p q r s t u v w"),
      (3L, "a b c d e f a b c d e f")).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(df, "text", "doc_id",
        topNs = Seq(2), dupN = 6)
      .select("doc_id", "top2_frac", "dup6_frac")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L,
      math.rint(3.0 * 3 / 13 * 1e6) / 1e6, 0.0)), s"got ${out(0)}")
    // doc 2: most frequent 2-gram has cnt 1 (lex smallest "p q"),
    // frac = 3/15; no dup 6-grams
    assert(out(1) == ((2L, math.rint(3.0 / 15 * 1e6) / 1e6, 0.0)),
      s"got ${out(1)}")
    // doc 3 top 2-gram: "a b" (cnt 2, len 3, nch 23)
    assert(out(2)._2 == math.rint(3.0 * 2 / 23 * 1e6) / 1e6 &&
      out(2)._3 == 1.0, s"got ${out(2)}")
    // fewer tokens than any n: all signals zero, row still present
    val tiny = TextOps.repetitionSignals(
      Seq((9L, "one")).toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(tiny.toSeq == Seq((9L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("TF-IDF: rare terms outrank common ones, ranks deterministic") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .select("doc_id", "term", "tf", "tfidf", "rk")
      .as[(Long, String, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(_._2).toSeq).toMap
    assert(out(1L) == Seq("apple", "banana")) // tf2*ln3 > tf1*ln1.5
    assert(out(3L) == Seq("cherry", "date"))  // 3*ln1.5 > 1*ln3
    val top1 = TextOps.tfidfTopTerms(docs, "text", "doc_id", 2)
      .filter($"doc_id" === 1 && $"rk" === 1).select("tfidf")
      .as[Double].head()
    assert(math.abs(top1 - math.rint(2 * math.log(3.0) * 1e6) / 1e6) < 1e-9)
  }

  test("PII redaction: emails and phones become typed tags") {
    val out = TextOps.redactPii(Seq(
      (1L, "mail a.b+c@x-corp.io or call 555-010-1234, maybe 555.010.9999"),
      (2L, "nothing to scrub @ here 12-34")
    ).toDF("id", "text"), "text")
      .select("id", "n_pii", "redacted").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 3L, "mail <EMAIL> or call <PHONE>, maybe <PHONE>")))
    assert(out(1) == ((2L, 0L, "nothing to scrub @ here 12-34")))
  }

  test("PII redaction: n_pii equals the placeholders when patterns overlap") {
    // the phone digits sit INSIDE the email's local part: one email
    // replacement consumes them, so exactly one placeholder appears and
    // n_pii must agree (counting both patterns on the raw text reads 2)
    val out = TextOps.redactPii(Seq(
      (1L, "reach me: 555-123-4567@sms.example.com")
    ).toDF("id", "text"), "text")
      .select("n_pii", "redacted").as[(Long, String)].head()
    assert(out == ((1L, "reach me: <EMAIL>")))
    val tags = "<EMAIL>|<PHONE>".r.findAllIn(out._2).length
    assert(out._1 == tags)
  }

  test("token entropy: uniform max, constant zero, skew in between") {
    val out = TextOps.tokenEntropy(Seq(
      (1L, "a b c d"),     // uniform over 4 -> ln(4)
      (2L, "a a a a"),     // constant -> 0
      (3L, "a a a b")      // skewed -> between 0 and ln(2)... exactly H(1/4)
    ).toDF("id", "text"), "text", "id")
      .select("id", "n", "n_distinct", "entropy")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 4L, 4L, BigDecimal(math.log(4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out(1) == ((2L, 4L, 1L, 0.0)))
    // H = ln(4) - (3 ln 3)/4
    val h = math.log(4) - 3 * math.log(3) / 4
    assert(math.abs(out(2)._4 - h) < 1e-6)
  }

  test("bm25: rarer terms outweigh common ones; longer docs penalized") {
    val docs = Seq(
      (1L, "spark x x"),      // rare term (df=1), dl=3
      (2L, "fast x x"),       // common term (df=2), dl=3
      (3L, "fast y y y y y"), // same term, longer doc -> lower
      (4L, "z z z")           // no match -> absent
    ).toDF("id", "text")
    val out = TextOps.bm25TopDocs(docs, "text", "id",
      Seq("spark", "fast"), k = 10)
      .select("id", "score").as[(Long, Double)].collect().toMap
    assert(!out.contains(4L))
    assert(out(1L) > out(2L), "rare-term match must outscore common-term")
    assert(out(2L) > out(3L), "longer doc must score lower at equal tf")
  }

  test("sequence packing: bins fill densely, docs straddle boundaries") {
    // one shard; capacity 4. tokens: 3, 2, 4 -> cumsum 3, 5, 9
    val out = TextOps.packSequences(Seq(
      (0L, "a b c"), (8L, "d e"), (16L, "f g h i")  // ids hash to shard 0
    ).toDF("id", "text"), "text", "id", capacity = 4, shards = 1)
      .select("id", "n_tokens", "bin", "offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 3L, 0L, 0L),   // starts bin 0 at 0
      (8L, 2L, 0L, 3L),   // starts at 3, straddles into bin 1
      (16L, 4L, 1L, 1L))) // starts inside bin 1 at offset 1
  }

  test("repeated-line scrub: shared lines drop, fully-boilerplate docs vanish") {
    val out = TextOps.removeRepeatedLines(Seq(
      (1L, "x\ny\nz"), (2L, "x\nw"), (3L, "x\nz")
    ).toDF("id", "text"), "text", "id", minDocs = 2)
      .select("id", "n_kept", "clean_text")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // 'x' is in 3 docs, 'z' in 2 -> both boilerplate; doc 3 loses every
    // line and disappears
    assert(out.toSeq == Seq((1L, 1L, "y"), (2L, 1L, "w")))
  }

  test("repeated-line scrub: line order survives reassembly") {
    val out = TextOps.removeRepeatedLines(Seq(
      (1L, "keep1\ndup\nkeep2\nkeep3"), (2L, "dup")
    ).toDF("id", "text"), "text", "id", minDocs = 2)
      .filter($"id" === 1).select("clean_text").as[String].head()
    assert(out == "keep1\nkeep2\nkeep3")
  }

  test("canonical url: scheme/query/fragment/www/trailing-slash stripped, path case kept") {
    val rows = Seq(
      (1L, "https://WWW.Example.COM/Path/A?q=1#top"),
      (2L, "http://example.com/Path/A/"),
      (3L, "example.com/Path/A"),          // schemeless crawl entry
      (4L, "ftp://files.example.com/x"),   // other schemes strip too
      (5L, "https://example.com")          // bare host, no path
    ).toDF("id", "url")
      .select(col("id"), TextOps.canonicalUrl(col("url")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(rows(1L) == "example.com/Path/A")
    assert(rows(2L) == "example.com/Path/A")
    assert(rows(3L) == "example.com/Path/A")
    assert(rows(4L) == "files.example.com/x")
    assert(rows(5L) == "example.com")
  }

  test("unigram logprob: common-token docs outscore rare-token docs") {
    // corpus: 'the' x4, 'rare' x1, 'unique' x1; total 6 tokens
    val out = TextOps.unigramLogProb(Seq(
      (1L, "the the the"), (2L, "the rare"), (3L, "unique")
    ).toDF("id", "text"), "text", "id")
      .select("id", "n_tokens", "logprob")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0) == ((1L, 3L, r6(math.log(4.0 / 6)))))
    assert(out(1) == ((2L, 2L,
      r6((math.log(4.0 / 6) + math.log(1.0 / 6)) / 2))))
    assert(out(2) == ((3L, 1L, r6(math.log(1.0 / 6)))))
    assert(out(0)._3 > out(1)._3 && out(1)._3 > out(2)._3)
  }

  test("repetition stats: NULL text stays NULL in every column") {
    val out = TextOps.repetitionStats(Seq(
      (1L, Option.empty[String]), (2L, Option("a a"))
    ).toDF("id", "text"), "text")
      .select("id", "n_tokens", "dup_token_frac", "dup_bigram_frac")
      .as[(Long, Option[Long], Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, None, None, None)),
      "a null document must not read as 'no repetition'")
    assert(out(1)._4.contains(0.0)) // real single-bigram doc still 0.0
  }

  // 53 words, mean length ~4.7, five distinct Gopher stopwords — clears
  // every A1.1 threshold (shared by the gopherQuality/gopherRules tests)
  private val goodText =
    ("the quick brown fox jumps over lazy dogs near river " +
      "banks and that gentle stream will have carried those with small " +
      "stones beyond reach while evening light fades softly into night " +
      "air above quiet fields where birds settle down among tall grass " +
      "waiting for morning sun to rise again over distant eastern hills")

  test("gopher quality: each rule fires on its planted violator, clean doc passes") {
    val docs = Seq(
      (1L, goodText),                                   // passes all rules
      (2L, "too few words"),                            // word-count floor
      (3L, Seq.fill(60)("a").mkString(" ")),            // mean len < 3
      (4L, Seq.fill(60)("# extraordinarily").mkString(" ")), // symbols+len
      (5L, goodText + Seq.fill(30)("\n• x y").mkString), // bullet lines
      (6L, goodText.split(" ").take(52).mkString(" ") +
        "\nwait...\nmore...\nagain..."),                 // ellipsis lines
      (7L, Seq.fill(60)("123 456").mkString(" ")),       // alpha fraction
      (8L, Seq.fill(60)("zebra quagga").mkString(" "))   // stop-word floor
    ).toDF("doc_id", "text")
    val out = TextOps.gopherQuality(docs, "text")
      .select("doc_id", "gopher_keep").as[(Long, Boolean)]
      .collect().toMap
    assert(out(1L), "the clean document must pass")
    for (id <- 2L to 8L)
      assert(!out(id), s"planted violator $id slipped through")
    // null text: null signals, keep = false (never null)
    val nulls = TextOps.gopherQuality(
      Seq((9L, Option.empty[String])).toDF("doc_id", "text"), "text")
      .select("gopher_keep", "n_words").collect()(0)
    assert(!nulls.getBoolean(0) && nulls.isNullAt(1))
  }

  test("c4 filters: line-boundary edge cases") {
    val docs = Seq(
      // trailing newline -> empty last line (dropped: no terminal punct
      // is 'ends with' on empty = false); empty middle line dropped too
      (1L, "good line stays here.\n\nanother good line stays!\n"),
      // exactly 3 words keeps, 2 words drops, quote-ending keeps
      (2L, "three words here.\ntwo words.\nhe said \"stop here.\""),
      // javascript/cookie markers drop the LINE, case-insensitive
      (3L, "a fine first line.\nEnable JavaScript to continue please.\n" +
        "This site uses Cookies for login purposes.\nlast line stays."),
      // '{' anywhere drops the DOCUMENT
      (4L, "perfectly good line here.\nvar x = { a: 1 };"),
      // 'lorem ipsum' drops the DOCUMENT, case-insensitive
      (5L, "perfectly good line here.\nLorem Ipsum dolor sit amet."),
      // all lines fail -> doc disappears (no empty-text row)
      (6L, "no punct line\nshort.\n"),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextOps.c4Filters(docs, "text", "doc_id")
      .select("doc_id", "n_lines", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((1L, 4L, 2L,
      "good line stays here.\nanother good line stays!")))
    assert(out(2L) == ((2L, 3L, 2L,
      "three words here.\nhe said \"stop here.\"")))
    assert(out(3L) == ((3L, 4L, 2L,
      "a fine first line.\nlast line stays.")))
  }

  test("card PII: Luhn separates real numbers from digit noise; redaction is checksum-conditional") {
    val docs = Seq(
      (1L, "pay 4111111111111111 now"),            // valid Visa test number
      (2L, "ref 4111111111111112 logged"),         // same shape, bad checksum
      (3L, "tsid 12345678901234567890 x"),         // 20 digits: not a candidate
      (4L, "call 555-867-5309 ok"),                // short runs: not candidates
      (5L, "two 4111111111111111 and 4539578763621486 cards")
    ).toDF("doc_id", "text")
    val sig = TextOps.cardSignals(docs, "text")
      .select("doc_id", "n_card_candidates", "n_luhn_valid")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(sig(1L) == ((1L, 1L)))
    assert(sig(2L) == ((1L, 0L)))
    assert(sig(3L) == ((0L, 0L)))
    assert(sig(4L) == ((0L, 0L)))
    assert(sig(5L) == ((2L, 2L)))
    val red = TextOps.redactCardNumbers(docs, "text")
      .select("doc_id", "redacted_cards")
      .as[(Long, String)].collect().toMap
    assert(red(1L) == "pay <CARD> now")
    assert(red(2L) == "ref 4111111111111112 logged",
      "an invalid checksum must NOT be redacted")
    assert(red(3L) == "tsid 12345678901234567890 x",
      "a 20-digit run is not a card; its prefix must not be eaten")
    assert(red(5L) == "two <CARD> and <CARD> cards")
  }

  test("gopher rules: quarantine split names exactly the violated rules") {
    val docs = Seq(
      (1L, Option(goodText)),
      (2L, Option("too few words")),
      (3L, Option.empty[String])).toDF("doc_id", "text")
    val (clean, bad) = graft.ops.Quarantine.split(
      docs, TextOps.gopherRules("text"))
    assert(clean.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    val reasons = bad.select("doc_id", "reasons")
      .as[(Long, String)].collect().toMap
    // 3 words: word-count floor + zero stopword hits, nothing else
    assert(reasons(2L) == "gopher_word_count,gopher_stopwords")
    // null text: every rule's signal is undefined -> all 7 violated
    assert(reasons(3L).split(",").length == 7)
  }
}
