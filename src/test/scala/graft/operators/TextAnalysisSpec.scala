package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("textStats: counts and ratios on a known sentence") {
    val df = Seq((1L, "The cat sat on the mat !")).toDF("id", "text")
    val r = TextAnalysis.textStats(df, "text").collect().head
    assert(r.getAs[Int]("n_tokens") == 7)
    assert(r.getAs[Int]("n_bpe_tokens") == 7)
    assert(r.getAs[Int]("n_chars_m") == 24)
    assert(r.getAs[Double]("punct_ratio") == math.rint(1.0 / 7 * 1e6) / 1e6
      || math.abs(r.getAs[Double]("punct_ratio") - 1.0 / 7) < 1e-6)
    // 'The'(cap, counted via lower) + 'the' are stopwords
    assert(math.abs(r.getAs[Double]("stop_ratio") - 3.0 / 7) < 1e-6)
    assert(math.abs(r.getAs[Double]("upper_ratio") - 1.0 / 7) < 1e-6)
  }

  test("bpeIshTokens splits words, numbers, punctuation") {
    val got = Seq("it's 42%done").toDF("t")
      .select(TextAnalysis.bpeIshTokens(col("t"))).as[Seq[String]].head()
    assert(got == Seq("it", "'", "s", "42", "%", "done"))
  }

  test("langId predicts profile languages and CJK") {
    val df = Seq(
      ("the cat and the dog are in the house", "en"),
      ("el gato y el perro en la casa", "es"),
      ("der Hund und die Katze ist nicht hier", "de"),
      ("le chat et le chien dans la maison", "fr"),
      ("你好世界这是一个测试文档", "zh"),
      ("zzz qqq xxx", "und")
    ).toDF("text", "want")
    val got = TextAnalysis.withLangId(df, "text")
      .select("want", "predicted").as[(String, String)].collect()
    got.foreach { case (w, p) => assert(p == w, s"expected $w got $p") }
  }

  test("fingerprint invariant to whitespace and case noise, sensitive to content") {
    val df = Seq(
      ("a", "Hello   world\tfoo"),
      ("b", "hello world foo"),
      ("c", "hello world bar")
    ).toDF("id", "text")
    val m = df.select(col("id"), TextAnalysis.fingerprint(col("text")))
      .as[(String, Long)].collect().toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
  }

  test("stop_ratio matches hand count including lowercase normalization") {
    val df = Seq((1L, "This is a test of the stopword ratio")).toDF("id", "text")
    val r = TextAnalysis.textStats(df, "text").collect().head
    // this, is, a, of, the → 5 of 8
    assert(math.abs(r.getAs[Double]("stop_ratio") - 5.0 / 8) < 1e-6)
  }

  test("extractDomain: first host, lowercased, empty when no URL") {
    import spark.implicits._
    val r = Seq(
      ("docs at HTTPS://CDN.Example.ORG/x and http://b.net later", "cdn.example.org"),
      ("plain http://sub.domain-x.co.uk/path?q=1", "sub.domain-x.co.uk"),
      ("no links here at all", "")
    ).toDF("text", "want")
      .select(TextAnalysis.extractDomain(col("text")).as("got"), col("want"))
      .as[(String, String)].collect()
    r.foreach { case (got, want) => assert(got == want) }
  }

  test("tfidfTopK: hand-computed scores, rounded-score + term tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "apple Apple banana"), (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")).toDF("doc_id", "text")
    val r = TextAnalysis.tfidfTopK(docs, "doc_id", "text", k = 2)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2),
        x.getLong(3)))
    val byDoc = r.groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // N=3; df: apple 1, banana 2, cherry 2, date 1
    // doc1: apple tf2 (case-folded) → 2·ln(4/2)=1.386294; banana 0.287682
    assert(byDoc(1L).map(t => (t._2, t._3)).toSeq ==
      Seq(("apple", 1.386294), ("banana", 0.287682)))
    // doc3: cherry 3·ln(4/3)=0.863046 beats date ln(4/2)=0.693147
    assert(byDoc(3L).map(t => (t._2, t._3)).toSeq ==
      Seq(("cherry", 0.863046), ("date", 0.693147)))
  }

  test("bm25TopK: hand-computed Okapi scores with saturation and length norm") {
    import spark.implicits._
    // N=2, Σdl=5, avgdl=2.5; df: apple 1, banana 2, cherry 1
    val docs = Seq((1L, "apple apple banana"), (2L, "banana cherry"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(docs, "doc_id", "text", k = 2)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getDouble(2),
        x.getLong(3)))
    val byDoc = r.groupBy(_._1).view.mapValues(_.sortBy(_._4)).toMap
    // idf(df=1)=ln 2, idf(df=2)=ln 1.2; dl/avgdl: doc1 1.2, doc2 0.8
    assert(byDoc(1L).map(t => (t._2, t._3)).toSeq ==
      Seq(("apple", 0.902322), ("banana", 0.168533)))
    assert(byDoc(2L).map(t => (t._2, t._3)).toSeq ==
      Seq(("cherry", 0.754913), ("banana", 0.198568)))
  }

  test("bm25TopK: TF saturation — doubling tf far less than doubles the score") {
    import spark.implicits._
    val docs = Seq((1L, "x x x x x x x x pad pad pad pad"),
      (2L, "x pad pad pad pad pad pad pad pad pad pad pad"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.bm25TopK(docs, "doc_id", "text", k = 2)
      .collect().map(x => ((x.getLong(0), x.getString(1)), x.getDouble(2)))
      .toMap
    val (s8, s1) = (r((1L, "x")), r((2L, "x")))
    // equal dl ⇒ pure saturation: tf 8 vs 1 must gain < 2×, not 8×
    assert(s8 > s1 && s8 < 2 * s1, s"saturation violated: $s8 vs $s1")
  }

  test("corpusTopNgrams: exact counts, count-then-gram ordering, short docs total") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.corpusTopNgrams(docs, "text", n = 2, k = 2)
      .as[(String, Long)].collect().toSeq
    // bigrams: "a b"×3, "b a"×1, "b c"×1; tie at 1 breaks on the gram
    assert(got == Seq(("a b", 3L), ("b a", 1L)))
  }

  test("cmsFrequencyCheck: exact counts ride along, contract holds, order stable") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c"), (2L, "a b d")).toDF("doc_id", "text")
    val got = TextAnalysis.cmsFrequencyCheck(docs, "text", k = 3)
      .as[(String, Long, Boolean)].collect().toSeq
    // exact census: a 4, b 3, c 1, d 1 → top-3 cuts at c (tie with d,
    // term tie-break)
    assert(got == Seq(("a", 4L, true), ("b", 3L, true), ("c", 1L, true)))
  }

  test("unigramSurprisal: exact -ln P means from the corpus model") {
    import spark.implicits._
    val docs = Seq((1L, "a a"), (2L, "b")).toDF("doc_id", "text")
    val r = TextAnalysis.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2))))
      .toMap
    // tot=3: P(a)=2/3, P(b)=1/3
    assert(r(1L) == ((2L, 0.405465)))   // -ln(2/3)
    assert(r(2L) == ((1L, 1.098612)))   // -ln(1/3)
  }

  test("stripBoilerplate: shared lines drop, order survives, empty stays") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "z\nFOOTER\na"),   // order z, a must survive as-is
      (2L, "s1", "keep2\nFOOTER"),
      (3L, "s1", "FOOTER"),          // reduced to nothing → empty string
      (4L, "s2", "only\nshared"),
      (5L, "s2", "shared")           // shared in 2/2; only in 1/2 (= cap)
    ).toDF("doc_id", "source", "text")
    val r = TextAnalysis.stripBoilerplate(docs, "doc_id", "text", "source")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "z\na", 2L -> "keep2", 3L -> "",
      4L -> "only", 5L -> ""))
  }

  test("chunkByTokens: overlapping windows, partial tail, start/index math") {
    import spark.implicits._
    val df = Seq((1L, "t1 t2 t3 t4 t5 t6 t7")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "doc_id", "text",
        chunkTokens = 3, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start", "n_chunk_tokens", "chunk_text")
      .as[(Int, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (0, 0, 3, "t1 t2 t3"),
      (1, 2, 3, "t3 t4 t5"),
      (2, 4, 3, "t5 t6 t7"),
      (3, 6, 1, "t7")))
  }

  test("chunkByTokens: null text follows the empty-string path — doc not dropped") {
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(docs, "doc_id", "text", 2, 2)
      .collect().map(_.getLong(0))
    assert(got.count(_ == 1L) == 1, "null-text doc emits exactly one chunk")
    assert(got.count(_ == 2L) == 2)
  }

  test("chunkByTokens: stride past length gives one window; empty doc is total") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkByTokens(df, "doc_id", "text",
        chunkTokens = 5, stride = 10)
      .select("doc_id", "chunk_idx", "n_chunk_tokens", "chunk_text")
      .as[(Long, Int, Int, String)].collect().toSet
    // empty text follows the tokenizer convention: one empty token
    assert(got == Set((1L, 0, 2, "a b"), (2L, 0, 1, "")))
  }

  test("tokenEntropy: uniform, degenerate, and case-folded distributions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a"),       // one token type → 0 bits
      (2L, "a b c d"),       // uniform over 4 → 2 bits
      (3L, "a a b b"),       // uniform over 2 → 1 bit
      (4L, "A a"),           // case-folds to one type → 0 bits
      (5L, "")               // single empty token → 0 bits
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .select("doc_id", "n_tokens", "n_distinct", "entropy")
      .as[(Long, Int, Int, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4, 1, 0.0)))
    assert(got(2L) == ((4, 4, 2.0)))
    assert(got(3L) == ((4, 2, 1.0)))
    assert(got(4L) == ((2, 1, 0.0)))
    assert(got(5L) == ((1, 1, 0.0)))
  }

  test("tokenEntropy: skewed distribution matches the closed form") {
    import spark.implicits._
    // counts 3,1: H = log2(4) - (3*log2(3) + 0)/4
    val want = 2.0 - 3.0 * (math.log(3.0) / math.log(2.0)) / 4.0
    val got = TextAnalysis.tokenEntropy(
        Seq((1L, "x x x y")).toDF("doc_id", "text"), "doc_id", "text")
      .select("entropy").as[Double].head()
    assert(math.abs(got - math.rint(want * 1e6) / 1e6) < 1e-9)
  }

  test("buildVocab ranks freq desc / term asc; encodeIds keeps order, OOV 0") {
    // counts: a=3, b=3, c=1, d=1 → vocab(3): a→1, b→2, c→3; d is OOV
    val docs = Seq((1L, "b a b c a b"), (2L, "a d")).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", 3)
    assert(vocab.select("term", "id").as[(String, Long)].collect().toMap
      == Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
    val ids = TextAnalysis.encodeIds(docs, "doc_id", "text", vocab)
      .orderBy("doc_id").select("ids").as[Seq[Long]].collect()
    assert(ids(0) == Seq(2L, 1L, 2L, 3L, 1L, 2L))
    assert(ids(1) == Seq(1L, 0L), "out-of-vocab token must encode as 0")
  }

  test("cleanWebText: tags, entities (amp last), whitespace, NFC") {
    val cases = Seq(
      "<p>hello   world</p>" -> "hello world",
      // double-escaped &amp;lt; resolves ONE level (to the literal
      // &lt;), single-escaped entities resolve fully
      "&amp;lt; &lt;b&gt; &quot;q&quot; &#39;s&#39;" ->
        "&lt; <b> \"q\" 's'",
      "<div class=\"x\">a</div><br/>b" -> "a b",
      // NFC: e + combining acute composes
      "café" -> "café",
      "  \t\n  " -> "")
    val got = cases.map(_._1).toDF("v")
      .select(TextAnalysis.cleanWebText(col("v")).as("c"))
      .as[String].collect()
    cases.map(_._2).zip(got).zip(cases.map(_._1)).foreach {
      case ((want, g), in) => assert(g == want, s"input '$in'")
    }
  }

  test("canonicalizeUrl: case, port, fragment, utm, slash variants collapse") {
    val cases = Seq(
      // scheme+host lowercased, :443 stripped, fragment dropped,
      // utm params removed with separator repair, trailing / stripped
      "HTTPS://Ex.COM:443/A/b/?utm_source=x&id=7#f" -> "https://ex.com/A/b?id=7",
      "https://ex.com/A/b?id=7" -> "https://ex.com/A/b?id=7",
      // utm-only query: separators collapse away entirely
      "http://ex.com:80/p?utm_a=1&utm_b=2" -> "http://ex.com/p",
      // utm in the middle: the kept params re-chain
      "http://ex.com/p?utm_a=1&x=1&utm_b=2&y=2" -> "http://ex.com/p?x=1&y=2",
      // root and bare-host forms; path case preserved
      "HTTP://EX.com/" -> "http://ex.com",
      "http://ex.com" -> "http://ex.com",
      // non-default port survives; non-URL input canonicalizes to ''
      "https://ex.com:8443/a" -> "https://ex.com:8443/a",
      "not a url" -> "")
    val got = cases.map(_._1).toDF("u")
      .select(TextAnalysis.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect()
    cases.map(_._2).zip(got).zip(cases.map(_._1)).foreach {
      case ((want, g), in) => assert(g == want, s"input '$in'")
    }
  }

  test("bigramSurprisal: corpus-typical sequences score below rare " +
      "ones; sub-bigram docs are null") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "sat cat the"),  // same unigrams, reversed sequences
      (5L, "the"))          // one token — no bigrams
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got(5L) == ((0L, None)))
    assert(got(1L)._1 == 2L && got(1L) == got(2L))
    // unigram surprisal CAN'T separate doc 4 from docs 1-3 (identical
    // token multiset); the bigram model must
    assert(got(4L)._2.get > got(1L)._2.get,
      s"scrambled ${got(4L)._2.get} vs typical ${got(1L)._2.get}")
  }

  test("invertedIndex: df counts docs once, postings cap and sort") {
    val docs = Seq(
      (3L, "apple banana apple"),   // within-doc repeat counts once
      (1L, "APPLE cherry"),         // case-folds into the same term
      (2L, "apple date")).toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", "text",
        maxPostings = 2)
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // df is the FULL document frequency; postings cap at the 2 lowest ids
    assert(got("apple") == ((3L, "1,2")))
    assert(got("banana") == ((1L, "3")))
    assert(got("cherry") == ((1L, "1")))
    assert(got("date") == ((1L, "2")))
  }

  test("invertedIndex: empty and whitespace-only docs contribute nothing") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "word"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, "doc_id", "text")
      .as[(String, Long, String)].collect()
    assert(got.toSeq == Seq(("word", 1L, "3")))
  }

  test("gopherQualityFlags: thresholds gate exactly at the published " +
      "defaults") {
    // 75 words, mean length (110 + 9·25)/75 ≈ 4.47 — inside [3, 10]
    val longDoc = (("the and of to a " * 10) + "wonderful " * 25).trim
    val shortDoc = "the and of something"                          // 4 words
    val symbolDoc = ("the and of " + "# " * 20 + "word " * 30).trim
    val noStops = (Seq.fill(60)("zqx").mkString(" "))
    val docs = Seq((1L, longDoc), (2L, shortDoc), (3L, symbolDoc),
      (4L, noStops)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherQualityFlags(docs, "doc_id", "text")
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("quality_ok"))
    assert(!r(2L).getAs[Boolean]("words_ok"))
    assert(!r(3L).getAs[Boolean]("symbols_ok"))
    assert(r(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(!r(4L).getAs[Boolean]("stopwords_ok"))
    assert(r(4L).getAs[Long]("stop_hits") == 0L)
  }

  test("gopherQualityFlags: stop_hits counts DISTINCT function words") {
    val docs = Seq((1L, "the the the the"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.gopherQualityFlags(docs, "doc_id", "text").head()
    assert(r.getAs[Long]("stop_hits") == 1L)
  }

  test("collocations: a fused pair beats frequent-but-independent words") {
    // "new york" always together (10×); "a b" co-occur but both are
    // everywhere, diluting their PMI; support floor drops one-offs
    val rows =
      Seq.fill(10)("new york a b") ++ Seq.fill(10)("a x b y") ++
        Seq(hashCode.toString + " oneoff pair")
    val docs = rows.toDF("text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 5, k = 5)
      .collect()
    assert(got.head.getAs[String]("w1") == "new" &&
      got.head.getAs[String]("w2") == "york")
    val pairs = got.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")))
    assert(!pairs.contains(("oneoff", "pair"))) // below the support floor
  }

  test("domainRollup: every level of each host aggregates, counts " +
      "reconcile with the corpus") {
    val hosts = Seq("a.example.org", "b.example.org", "c.example.com")
      .toDF("host")
    val got = TextAnalysis.domainRollup(hosts, col("host"))
      .collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[String]("prefix")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(got((1L, "org")) == 2L && got((1L, "com")) == 1L)
    assert(got((2L, "org.example")) == 2L)
    assert(got((3L, "org.example.a")) == 1L)
    assert(got((3L, "com.example.c")) == 1L)
    // every level's counts sum to the corpus size
    (1L to 3L).foreach { lvl =>
      assert(got.collect { case ((l, _), n) if l == lvl => n }.sum == 3L)
    }
  }

  test("readability: hand-counted Flesch on known sentences") {
    // "the cat sat." → 3 words, 1 sentence, 3 syllables (1 each);
    // "reading is easier than writing!" → 5 words, 1 sentence,
    // syllables: rea|ding 2 + is 1 + ea|sier 2(ea, ie... vowel groups:
    // 'easier' → 'ea','ie' = 2) + than 1 + wri|ting 2 = 8
    val df = Seq((1L, "the cat sat."),
      (2L, "reading is easier than writing!")).toDF("id", "text")
    val got = TextAnalysis.readability(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))).toMap
    def flesch(w: Long, s: Long, y: Long): Double =
      math.floor((206.835 - 1.015 * (w.toDouble / s)
        - 84.6 * (y.toDouble / w)) * 1e6 + 0.5) / 1e6
    assert(got(1L) == ((3L, 1L, 3L, flesch(3, 1, 3))))
    assert(got(2L) == ((5L, 1L, 8L, flesch(5, 1, 8))))
  }

  test("readability: zero-vowel words count one syllable; empty text " +
      "clamps to the 1-word 1-sentence floor") {
    val df = Seq((1L, "hmm pfft"), (2L, "")).toDF("id", "text")
    val got = TextAnalysis.readability(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == ((2L, 1L, 2L)))
    assert(got(2L)._1 == 1L && got(2L)._2 == 1L)
  }

  test("crossDupMatrix matches brute-force shingle-set Jaccard and " +
      "keeps zero-overlap pairs on the spine") {
    val rows = Seq(
      ("s1", "a b c d e f g"),        // shares the abcde window family
      ("s2", "a b c d e f z"),        //   with s1
      ("s3", "p q r s t u v")         // disjoint from both
    )
    val df = rows.toDF("source", "text")
    val got = TextAnalysis.crossDupMatrix(df, col("source"), "text", n = 5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    def sh(t: String): Set[String] =
      t.split(" ").sliding(5).map(_.mkString(" ")).toSet
    val sets = rows.map { case (s, t) => s -> sh(t) }.toMap
    for (a <- rows.map(_._1); b <- rows.map(_._1) if a < b) {
      val inter = (sets(a) & sets(b)).size.toLong
      val jac = math.floor(inter.toDouble /
        (sets(a).size + sets(b).size - inter) * 1e6 + 0.5) / 1e6
      assert(got((a, b)) == ((inter, jac)), s"pair ($a,$b)")
    }
    assert(got(("s1", "s3")) == ((0L, 0.0)))
    assert(got.size == 3)
  }

  test("encodingQuality: counts replacement chars, C0 controls, and " +
      "mojibake signatures; tab/newline are not damage") {
    val df = Seq(
      (1L, "clean text with\ttab and\nnewline"),
      (2L, "lost \uFFFD bytes \uFFFD here"),
      (3L, "bell\u0007 and escape\u001B"),
      (4L, "caf\u00C3\u00A9 mis-decoded, plus nbsp \u00C2\u00A0x"),
      (5L, "plain ascii")).toDF("id", "t")
    val got = TextAnalysis.encodingQuality(df, "id", "t")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Int]("n_repl"), r.getAs[Int]("n_ctrl"),
          r.getAs[Int]("n_moji"), r.getAs[Boolean]("enc_ok")))).toMap
    assert(got(1L) == ((0, 0, 0, true)))
    assert(got(2L) == ((2, 0, 0, false)))
    assert(got(3L) == ((0, 2, 0, false)))
    assert(got(4L) == ((0, 0, 2, false)))
    assert(got(5L) == ((0, 0, 0, true)))
  }

  test("tokenizerFertility: exact sums and int64-ratio fertility") {
    val df = Seq(
      ("a", "hello world"),            // 2 words, 2 bpe tokens
      ("a", "don't stop"),             // 2 words, 4 bpe tokens (don ' t stop)
      ("b", "x")).toDF("source", "t")  // 1 word, 1 token
    val got = TextAnalysis.tokenizerFertility(df, "source", "t")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_words"),
          r.getAs[Long]("n_tokens"), r.getAs[Double]("fertility")))).toMap
    assert(got("a") == ((2L, 4L, 6L, 1.5)))
    assert(got("b") == ((1L, 1L, 1L, 1.0)))
  }

  test("phraseSearch finds all occurrences with 0-based first position") {
    val df = Seq(
      (1L, "x slow hash batch y slow hash batch"),
      (2L, "slow hash batch"),
      (3L, "slow hash x batch"),
      (4L, "SLOW Hash BATCH"), // case-folded
      (5L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(df, "doc_id", "text",
        Seq("slow", "hash", "batch"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (2L, 1L, 0), (4L, 1L, 0)))
  }

  test("phraseSearch handles duplicate phrase terms and overlaps via " +
      "slot counting") {
    val df = Seq(
      (1L, "a b a b a"), // "a b a" matches at 0 and 2 (overlapping)
      (2L, "a a a"),     // no "a b a"
      (3L, "b a b")).toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(df, "doc_id", "text",
        Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 0)))
  }

  test("knSurprisal: hand-computed interpolated Kneser-Ney on a tiny " +
      "corpus; sub-bigram docs are null") {
    // bigram counts: (a,b)=2, (b,a)=2; c1(a)=c1(b)=2, N1+(fwd)=1 each,
    // N1+(rev)=1 each, B=2 → P = 1.25/2 + 0.375·0.5 = 0.8125 for both
    val df = Seq((1L, "a b a b"), (2L, "b a"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.knSurprisal(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    val want = BigDecimal(-math.log(0.8125))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0).getLong(1) == 3L && got(0).getDouble(2) == want)
    assert(got(1).getLong(1) == 1L && got(1).getDouble(2) == want)
    assert(got(2).getLong(1) == 0L && got(2).isNullAt(2))
  }

  test("impact index retrieval equals query-time BM25 sum over the " +
      "query terms; bucket pruning loses nothing; term guard") {
    val df = Seq(
      (1L, "fast hash join query"),
      (2L, "slow scan query query plan"),
      (3L, "hash hash hash join"),
      (4L, "unrelated words only here"),
      (5L, "query plan hash")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_imp_spec")
      .toString + "/idx"
    TextAnalysis.buildImpactIndex(df, "doc_id", "text", dir,
      numBuckets = 4)
    val terms = Seq("hash", "query")
    val got = TextAnalysis.impactTopK(spark, dir, terms, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // brute twin: per-(doc,term) BM25 contribution via bm25TopK's own
    // scorer (k large enough to keep every term), fixed-point floored
    // exactly as the index bakes it, summed over the query terms
    val contrib = TextAnalysis.bm25TopK(df, "doc_id", "text", k = 100)
      .filter(col("term").isin(terms: _*))
      .select(col("doc_id"), floor(col("score") * 1e6 + 0.5).cast("long")
        .as("fp"))
      .groupBy("doc_id")
      .agg((sum(col("fp")) / 1e6).as("score"), count(lit(1)).as("n"))
      .orderBy(col("score").desc, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // bm25TopK rounds to 6dp before this twin floors, but every
    // contribution here is far from a 5e-7 boundary, so the twin is
    // exact for this fixture
    assert(got.toSeq == contrib.toSeq)
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 5L)) // doc 4 matches nothing
    // both query terms + shortest dl: length normalization puts 5 first
    assert(got.head._1 == 5L && got.head._3 == 2L)
    intercept[IllegalArgumentException] {
      TextAnalysis.impactTopK(spark, dir, Seq("Hash"), k = 5)
    }
  }
}
