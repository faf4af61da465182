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
}
