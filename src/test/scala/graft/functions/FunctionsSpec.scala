package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / tokenCount handle empties, whitespace runs, case") {
    val df = Seq("  Hello   WORLD  ", "", "   ", "one").toDF("text")
    val got = df.select(TextFunctions.tokenCount(col("text"))).as[Long].collect().toSeq
    assert(got == Seq(2L, 0L, 0L, 1L))
  }

  test("wordShingles: distinct sliding windows; fewer tokens than k -> empty") {
    val df = Seq("a b c d", "a b a b a b", "a b").toDF("text")
    val got = df.select(TextFunctions.wordShingles(col("text"), 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq("a b a", "b a b")) // distinct
    assert(got(2) == Seq.empty)
  }

  test("langId picks max stopword hits with declaration-order ties; und for none") {
    val df = Seq(
      "the cat and the dog is in that house",
      "der hund und die katze ist nicht da",
      "xyzzy plugh").toDF("text")
    val got = df.select(TextFunctions.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "und"))
  }

  test("langQualityKeep == the composed langId/qualityScore predicate, corpus + edges") {
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id").cast("string").as("k"), col("text"))
    val edges = Seq(
      ("e1", null.asInstanceOf[String]), ("e2", ""), ("e3", "   \t  "),
      ("e4", "xyzzy plugh"), // und
      ("e5", "der hund und die katze ist nicht da und der hund ist gut"),
      ("e6", "the cat and the dog is in that house and it is the best"),
      ("e7", ";;;;;;;;;; the ;;;;;;;;;;"),
      ("e8", "the " * 200) // long, pure stopwords
    ).toDF("k", "text")
    for (df <- Seq(corpus, edges);
         (langs, q) <- Seq(Set("en") -> 0.3, Set("en", "de") -> 0.55,
           Set("und") -> 0.0)) {
      val composed = df
        .filter(TextFunctions.langId(col("text")).isin(langs.toSeq: _*))
        .filter(TextFunctions.qualityScore(col("text")) >= q)
        .select("k").as[String].collect().sorted.toSeq
      val fused = df
        .filter(TextFunctions.langQualityKeep(col("text"), langs, q))
        .select("k").as[String].collect().sorted.toSeq
      assert(fused == composed, s"langs=$langs q=$q")
    }
    // the corpus split is non-trivial at the battery config
    val kept = corpus.filter(TextFunctions.langQualityKeep(col("text"), Set("en"), 0.3)).count()
    assert(kept > 0 && kept < corpus.count())
  }

  test("qualityScore stays in [0,1] and rewards fluent text") {
    val df = Seq(
      "the engine is a part of the system and it is good that it runs in time",
      ";;;;;;;;;;").toDF("text")
    val got = df.select(TextFunctions.qualityScore(col("text"))).as[Double].collect()
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("cosine: known vectors, zero-norm guard, codegen path") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 2f), Seq(2f, 4f)),
      (Seq(0f, 0f), Seq(1f, 1f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
    assert(got(3) == 0.0)
  }

  test("simhash: identical token sets agree; near sets are close, far sets far") {
    val a = SimHash64.ofStrings(Seq("spark", "query", "engine", "fast", "scan"))
    val b = SimHash64.ofStrings(Seq("spark", "query", "engine", "fast", "scans"))
    val c = SimHash64.ofStrings(Seq("entirely", "different", "words", "here", "now"))
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(a, a) == 0)
    assert(ham(a, b) < ham(a, c))
  }

  test("simhashText column == simhash64(tokens) composition") {
    val df = Seq("The quick Brown fox", "  one   two  ").toDF("text")
    val fused = df.select(SimHashFunctions.simhashText(col("text"))).as[Long].collect().toSeq
    val composed = df.select(SimHashFunctions.simhash64(TextFunctions.tokens(col("text"))))
      .as[Long].collect().toSeq
    assert(fused == composed)
  }

  test("minhash signature: equal sets -> equal sigs; estimate tracks jaccard") {
    val df = Seq(
      ("x", "a b c d e f g h i j k l m n o p"),
      ("y", "a b c d e f g h i j k l m n o p"),
      ("z", "q r s t u v w x y z a2 b2 c2 d2 e2 f2")).toDF("id", "text")
    val sigs = df.select(col("id"), MinHashFunctions.minhashSignature(
        TextFunctions.wordShingles(col("text"), 2), 64).as("sig"))
      .as[(String, Seq[Long])].collect().toMap
    assert(sigs("x") == sigs("y"))
    val est = sigs("x").zip(sigs("z")).count { case (p, q) => p == q } / 64.0
    assert(est < 0.2) // disjoint shingle sets
  }

  test("sortedIntersectCount merges correctly") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 7L), Seq(3L, 4L, 5L, 8L)),
      (Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
    val got = df.select(SortedIntersectCount.column(col("a"), col("b"))).as[Long].collect().toSeq
    assert(got == Seq(2L, 0L))
  }

  test("scrubPii replaces emails, URLs, and phone runs with typed tags") {
    val df = Seq(
      "mail me at jane.doe+spam@example.co.uk today",
      "see https://example.com/p?id=123&x=4 for details",
      "call +1 (555) 123-4567 or 555.987.6543",
      "nothing sensitive here"
    ).toDF("text")
    val got = df.select(TextFunctions.scrubPii(col("text"))).as[String].collect().toSeq
    assert(got(0) == "mail me at <EMAIL> today")
    assert(got(1) == "see <URL> for details")
    assert(got(2) == "call <PHONE> or <PHONE>")
    assert(got(3) == "nothing sensitive here")
  }

  test("scrubPii order: an email's digits never half-match as a phone") {
    val df = Seq("reach 5551234567a@mail1234567890.com now").toDF("text")
    val got = df.select(TextFunctions.scrubPii(col("text"))).as[String].collect().head
    assert(got == "reach <EMAIL> now")
  }

  test("bpeTokens splits contractions, space-prefixed words, digits, punct") {
    val df = Seq("I'll pay 42 dollars, don't worry!").toDF("text")
    val got = df.select(TextFunctions.bpeTokens(col("text"))).as[Seq[String]].collect().head
    assert(got == Seq("I", "'ll", " pay", " 42", " dollars", ",", " don", "'t", " worry", "!"))
    val n = df.select(TextFunctions.bpeTokenCount(col("text"))).as[Long].collect().head
    assert(n == 10L)
  }

  test("bpeEncode applies ranked merges greedily by RANK, not position") {
    // (b,c) outranks (a,b): a positional/left-first encoder would emit
    // ["ab","c"], the reference greedy-by-rank loop emits ["a","bc"]
    val v = BpeVocab(Seq(("b", "c"), ("a", "b")))
    val df = Seq("abc").toDF("text")
    val got = df.select(TextFunctions.bpeEncode(col("text"), v)).as[Seq[String]].collect().head
    assert(got == Seq("a", "bc"))
  }

  test("bpeEncode merges EVERY occurrence of the best pair per round") {
    val v = BpeVocab(Seq(("a", "a")))
    val df = Seq("aaaa", "aaa").toDF("text")
    val got = df.select(TextFunctions.bpeEncode(col("text"), v)).as[Seq[String]].collect()
    assert(got(0) == Seq("aa", "aa")) // both disjoint occurrences, one round
    assert(got(1) == Seq("aa", "a"))  // left-to-right on the odd tail
  }

  test("bpeEncode works within pretokens incl. space prefixes; count shrinks vs chars") {
    val v = BpeVocab(Seq(("l", "o"), ("lo", "w"), (" ", "l")))
    val df = Seq("low low").toDF("text")
    val got = df.select(TextFunctions.bpeEncode(col("text"), v)).as[Seq[String]].collect().head
    // "low" → merges (l,o)+(lo,w) → ["low"]; " low" → (" ",l) wins first
    // (rank 2 < nothing? no: (l,o) rank 0 wins) → [" ","low"]
    assert(got == Seq("low", " ", "low"))
    val n = df.select(TextFunctions.bpeTokenCount(col("text"), v)).as[Long].collect().head
    assert(n == 3L)
  }

  test("bundled merges load; merged counts never exceed pretoken counts") {
    assert(BpeVocab.bundled.size > 50)
    val df = Seq(
      "the cat and the hat is in the house and it is a good day",
      "numbers 12345 and punctuation!!! also survive the merge loop").toDF("text")
    val pre = df.select(TextFunctions.bpeTokenCount(col("text"))).as[Long].collect()
    val merged = df.select(TextFunctions.bpeTokenCount(col("text"), BpeVocab.bundled))
      .as[Long].collect()
    val chars = df.select(TextFunctions.bpeTokens(col("text"))).as[Seq[String]].collect()
      .map(_.map(_.length.toLong).sum)
    // subword counts sit between pretoken count (merges never cross a
    // pretoken boundary) and character count (every merge shrinks), and
    // the merged stream reconstructs the exact pretoken text
    assert(merged.zip(pre).forall { case (m, p) => m >= p })
    assert(merged.zip(chars).forall { case (m, c) => m < c })
    val toks = df.select(TextFunctions.bpeEncode(col("text"))).as[Seq[String]].collect()
    val pretoks = df.select(TextFunctions.bpeTokens(col("text"))).as[Seq[String]].collect()
    assert(toks.zip(pretoks).forall { case (t, p) => t.mkString == p.mkString })
  }

  test("piiCounts reports per-kind match counts without redacting") {
    val df = Seq("a@b.co and c@d.io via https://e.fg call 555-123-4567").toDF("text")
    val got = df.select(TextFunctions.piiCounts(col("text")).as("p"))
      .select("p.n_email", "p.n_url", "p.n_phone").as[(Int, Int, Int)].collect().head
    assert(got == ((2, 1, 1)))
  }

  test("normalizeText: case, whitespace runs, and NFC composition fold together") {
    val decomposed = "Cafe\u0301" // e + combining acute
    val precomposed = "caf\u00e9" // precomposed e-acute
    val df = Seq(
      s"  HELLO   World\n$decomposed  ",
      s"hello world $precomposed",
      "").toDF("text")
    val got = df.select(TextFunctions.normalizeText(col("text"))).as[String].collect().toSeq
    assert(got(0) == s"hello world $precomposed")
    assert(got(0) == got(1)) // the dedup property: both render to one key
    assert(got(2) == "")
    // idempotent: normalizing a normalized string is the identity
    val twice = df.select(
      TextFunctions.normalizeText(TextFunctions.normalizeText(col("text")))).as[String].collect().toSeq
    assert(twice == got)
  }

  test("normalizeText is null-safe and ASCII-stable") {
    val df = Seq(Option("plain ascii stays"), None).toDF("text")
    val got = df.select(TextFunctions.normalizeText(col("text"))).as[Option[String]].collect().toSeq
    assert(got == Seq(Some("plain ascii stays"), None))
  }

  test("ByteLevel remap is a bijection on bytes and lossless on any text") {
    // 256 distinct target chars, all "printable" (none in the control range)
    val targets = (0 until 256).map(ByteLevel.byteToChar(_))
    assert(targets.distinct.length == 256)
    assert(targets.forall(c => c.toInt >= 33))
    // canonical anchors from the published table
    assert(ByteLevel.encode(" ") == "Ġ")  // space -> Ġ
    assert(ByteLevel.encode("\n") == "Ċ") // newline -> Ċ
    assert(ByteLevel.encode("A") == "A")       // printable ASCII fixed
    // decode . encode == identity across scripts and multi-byte sequences
    for (s <- Seq("plain ascii", "naïve café", "日本語テキスト", "🎉 emoji!",
        "mixed: Ωmega + עברית", "\t weirdbytes")) {
      assert(ByteLevel.decode(ByteLevel.encode(s)) == s)
    }
  }

  test("bpeEncodeBytes: byte-level tokens, Ġ space prefix, lossless concat") {
    val df = Seq((1L, "the cat said: naïve 🎉"),
                 (2L, "")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextFunctions.bpeEncodeBytes(col("text")).as("toks"),
        TextFunctions.bpeTokenCountBytes(col("text")).as("n"))
      .as[(Long, Seq[String], Long)].collect().map(r => r._1 -> r).toMap
    val toks = got(1L)._2
    assert(toks.nonEmpty && got(1L)._3 == toks.length)
    // space-prefixed pretokens carry the Ġ symbol, never a raw space
    assert(toks.exists(_.startsWith("Ġ")) && !toks.exists(_.contains(" ")))
    // concatenating all tokens and decoding reconstructs the pretoken
    // stream (= original text minus the dropped whitespace separators)
    val decoded = ByteLevel.decode(toks.mkString(""))
    assert(decoded == "the cat said: naïve 🎉")
    assert(got(2L)._2.isEmpty && got(2L)._3 == 0L)
  }

  test("bloomMightContainLong: no false negatives; null-safe; FP rate near fpp") {
    val inserted = (0L until 2000L).map(_ * 2654435761L + 7L)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(inserted.size.toLong, 0.03)
    inserted.foreach(bloom.putLong)
    val probesHit = inserted.map(Option(_))
    val probesMiss = (1L to 20000L).map(v => Option(v * 40503L + 3L))
      .filterNot(o => inserted.contains(o.get))
    val df = (probesHit ++ probesMiss ++ Seq(Option.empty[Long])).toDF("v")
    val got = df.select(col("v"),
        BloomMightContainLong.column(col("v"), bloom).as("hit"))
      .as[(Option[Long], Option[Boolean])].collect()
    // every inserted key answers true (no false negatives)
    val byVal = got.collect { case (Some(v), Some(h)) => v -> h }.toMap
    assert(inserted.forall(byVal(_)))
    // null probe -> null, not a crash or false
    assert(got.contains((None, None)))
    // FP rate on the miss set is within 4x of the configured 3%
    val fpRate = probesMiss.count(o => byVal(o.get)).toDouble / probesMiss.size
    assert(fpRate < 0.12, s"fpRate=$fpRate")
  }

  test("stripHtml: blocks die with their content, tags keep boundaries, entities decode") {
    val cases = Seq(
      "<p>hello</p><p>world</p>" -> "hello world",
      // script/style content must vanish entirely (case-insensitive,
      // multi-line, attributes on the tag)
      "a<SCRIPT type=\"x\">var y = 1 < 2;\nalert()</SCRIPT>b" -> "a b",
      "a<style>p {color: red}</style>b" -> "a b",
      // entities, &amp; decoded last so &amp;lt; cannot double-decode
      "x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; y &amp;lt;" ->
        "x <tag> \"q\" 's' & y &lt;",
      "  a  \n\t b  " -> "a b",
      "plain text" -> "plain text")
    val got = cases.map(_._1).toDF("h")
      .select(TextFunctions.stripHtml(col("h"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("urlHost: lower-cased host, userinfo/port stripped, '' on non-URLs") {
    val cases = Seq(
      "https://Example.COM/path?q=1" -> "example.com",
      "http://user:pw@Host.org:8080/x" -> "host.org",
      "ftp://files.example.net" -> "files.example.net",
      "https://example.com#frag" -> "example.com",
      "not a url" -> "",
      "relative/path" -> "")
    val got = cases.map(_._1).toDF("u")
      .select(TextFunctions.urlHost(col("u"))).as[String].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("canonicalUrl: every rule, separator repair, NULL on non-URLs") {
    val cases = Seq(
      // scheme/host case, www, default port, dup slashes, fragment
      "HTTPS://WWW.Ex.COM:443//a//b?x=1#f" -> Some("https://ex.com/a/b?x=1"),
      "http://user:pw@Ex.org:80/p" -> Some("http://ex.org/p"),
      // non-default port and non-http(s) scheme keep their port
      "https://ex.com:8443/p" -> Some("https://ex.com:8443/p"),
      "ftp://Ex.com:80/p" -> Some("ftp://ex.com:80/p"),
      // empty path -> '/'
      "https://ex.com" -> Some("https://ex.com/"),
      "https://ex.com?a=1" -> Some("https://ex.com/?a=1"),
      // tracking params: first, middle, last, only, name-prefix safety
      "https://ex.com/p?utm_source=a&id=2" -> Some("https://ex.com/p?id=2"),
      "https://ex.com/p?id=2&fbclid=z" -> Some("https://ex.com/p?id=2"),
      "https://ex.com/p?a=1&gclid=g&b=2" -> Some("https://ex.com/p?a=1&b=2"),
      "https://ex.com/p?utm_a=1&utm_b=2" -> Some("https://ex.com/p"),
      "https://ex.com/p?xfbclid=1" -> Some("https://ex.com/p?xfbclid=1"),
      // tracker names match case-insensitively; a literal '?' inside a
      // later param's VALUE is data, not a first-position anchor
      "https://ex.com/p?UTM_Source=a&FBCLID=z&id=2" -> Some("https://ex.com/p?id=2"),
      "https://ex.com/p?a=x?utm_b=2&c=3" -> Some("https://ex.com/p?a=x?utm_b=2&c=3"),
      // non-URLs have no canonical key
      "not a url" -> None,
      "relative/path?utm_a=1" -> None)
    val got = cases.map(_._1).toDF("u")
      .select(TextFunctions.canonicalUrl(col("u")))
      .as[Option[String]].collect().toSeq
    assert(got == cases.map(_._2))
    // canonicalization is IDEMPOTENT: a canonical key re-canonicalizes
    // to itself (the dedup-key contract — keys can be safely re-passed
    // through the pipeline stage)
    val keys = got.flatten.toDF("u")
    val twice = keys.select(TextFunctions.canonicalUrl(col("u")))
      .as[Option[String]].collect().toSeq
    assert(twice == got.flatten.map(Some(_)))
  }
}
