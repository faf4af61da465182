package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.CleanFns._

/** Unit + property tests for the expression kernel, pinning the exact
  * reference semantics (SURVEY.md §5.2), including the edge cases
  * verified against pandas: substring-date of "" → "//", merge-concat
  * skip rules (main.py:590-603), tag dedup/trim (main.py:501-502).
  */
class CleanFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("v").select(c.as("r")).as[String].collect().head

  test("dateReformat: yyyy-mm-dd hh:mm:ss → mm/dd/yyyy by pure slicing") {
    assert(one(dateReformat($"v"), "2018-03-05 12:00:00") == "03/05/2018")
  }

  test("dateReformat: empty input yields the literal // (main.py:412-418)") {
    assert(one(dateReformat($"v"), "") == "//")
  }

  test("dateReformat: malformed input passes through mangled, no error") {
    assert(one(dateReformat($"v"), "garbage") == "ge//garb")
  }

  test("pandasTitle: exact pandas str.title() semantics (main.py:390-391)") {
    // expectations produced by CPython: "x".title()
    val cases = Seq(
      "o'neill" -> "O'Neill",
      "mcdonald-smith" -> "Mcdonald-Smith",
      "ABC DEF" -> "Abc Def",
      "abc1def" -> "Abc1Def",
      "f. queen, jr." -> "F. Queen, Jr.",
      "" -> "",
      "123" -> "123")
    cases.foreach { case (in, want) =>
      assert(one(pandasTitle($"v"), in) == want, s"input '$in'")
    }
    // initcap diverges exactly where pandas restarts mid-word
    assert(one(titleCase($"v"), "o'neill") == "O'neill")
  }

  test("nfcNormalize: composes decomposed sequences, identity on NFC") {
    val nfc = StringExprs.nfcNormalize($"v")
    // e + COMBINING ACUTE (U+0301) composes to U+00E9
    assert(one(nfc, "café") == "café")
    // already-NFC input is untouched (and takes the isNormalized
    // fast path — same UTF8String instance semantics, same value)
    assert(one(nfc, "café") == "café")
    assert(one(nfc, "plain ascii 123") == "plain ascii 123")
    assert(one(nfc, "") == "")
    // A + COMBINING RING (U+030A) → Å (U+00C5); NFC also canonically
    // reorders multiple combining marks — s + dot-below + dot-above
    // composes via the ordered form (UAX #15 figure 5)
    assert(one(nfc, "Å") == "Å")
    assert(one(nfc, "ṩ") == "ṩ")
    // null flows through as null (UnaryExpression null-safety)
    val r = Seq[Option[String]](None).toDF("v")
      .select(nfc.as("r")).collect().head
    assert(r.isNullAt(0))
  }

  test("mergeConcat: all four branches (main.py:590-603)") {
    val rows = Seq(
      ("a", "a", "a"),      // from == to → keep to
      ("a", "", "a"),       // from empty → keep to
      ("", "b", "b"),       // to empty → take from
      ("a", "b", "a, b"))   // both → concat with ', '
    val got = rows.toDF("to", "from", "want")
      .select(mergeConcat($"to", $"from").as("got"), $"want")
      .as[(String, String)].collect()
    got.foreach { case (g, w) => assert(g == w) }
  }

  test("mergeConcat is a no-op when from == to (property)") {
    val samples = Gen.listOfN(50, Gen.alphaNumStr).sample.get.distinct
    val got = samples.toDF("v")
      .select($"v", mergeConcat($"v", $"v").as("r"))
      .as[(String, String)].collect()
    got.foreach { case (v, r) => assert(r == v) }
  }

  test("fillEmpty: null → '', others preserved; idempotent (property)") {
    val got = Seq[(java.lang.Long, String)]((1L, null), (2L, "x"))
      .toDF("k", "v")
      .select(fillEmpty(fillEmpty($"v")).as("r")).as[String].collect()
    assert(got.toSeq == Seq("", "x"))
  }

  test("normalizeWhitespace replaces tab/newline/CR and escaped forms") {
    assert(one(normalizeWhitespace($"v"), "a\tb\nc\rd\\ne") ==
      "a, b, c, d, e")
  }

  test("tags: dedup, trim, comma-join, empties dropped (main.py:491-507)") {
    val c = CleanFns.tags(Seq(
      (lit(true), " x "),   // trimmed
      (lit(true), "x"),     // duplicate after trim → dropped
      (lit(false), "y"),    // unpopulated → dropped
      (lit(true), "z")))
    assert(one(c, "ignored") == "x,z")
  }

  test("anyColContains matches substrings case-insensitively (latest ⊃ test)") {
    val df = Seq(("LaTeSt news", "b"), ("clean", "d")).toDF("c1", "c2")
    val got = df.filter(anyColContains(Seq($"c1", $"c2"), "test"))
      .as[(String, String)].collect()
    assert(got.toSeq == Seq(("LaTeSt news", "b")))
  }

  test("blankIfIn blanks listed values only") {
    val df = Seq("0", "999", "keep").toDF("v")
    val got = df.select(blankIfIn($"v", Seq("0", "999")).as("r"))
      .as[String].collect()
    assert(got.toSeq == Seq("", "", "keep"))
  }

  test("jaroWinkler matches the published algorithm on calibrated cases " +
      "(values probed against DuckDB's jaro_winkler_similarity)") {
    val cases = Seq(
      // classic literature pairs
      ("martha", "marhta", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      // below the 0.7 boost threshold the prefix bonus must NOT apply
      ("abcdxxxx", "abcdyyyyzzzz", 0.611111111111111),
      // prefix bonus caps at 4 even with a 5-char common prefix
      ("aaaaaaaaaa", "aaaaabaaaa", 0.96),
      // zero-window / no-match cases
      ("CAB", "ABC", 0.0), ("ab", "ba", 0.0), ("abc", "xyz", 0.0),
      // no common prefix → no bonus even above threshold
      ("abab", "baba", 0.8333333333333334),
      // odd/even transposition mix
      ("abcdef", "abdcfe", 0.9111111111111111),
      ("abcde", "abdec", 0.8933333333333333),
      ("ab", "abcdefghij", 0.7866666666666667),
      ("prefixmatch", "prefixnomatch", 0.9692307692307692),
      // empty semantics: DuckDB scores empties 0, including both-empty
      ("x", "", 0.0), ("", "", 0.0), ("a", "a", 1.0))
    cases.foreach { case (a, b, want) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.functions.StringExprs.jaroWinkler($"a", $"b"))
        .head().getDouble(0)
      assert(math.abs(got - want) < 1e-12, s"jw('$a','$b') = $got != $want")
    }
  }

  test("jaroWinkler is symmetric and null-propagating") {
    val pairs = Seq(("martha", "marhta"), ("abcde", "abdec"),
      ("prefixmatch", "prefixnomatch"))
    pairs.foreach { case (a, b) =>
      val Seq(x, y) = Seq((a, b), (b, a)).toDF("a", "b")
        .select(graft.functions.StringExprs.jaroWinkler($"a", $"b"))
        .collect().map(_.getDouble(0)).toSeq
      assert(x == y, s"asymmetric on ($a, $b)")
    }
    val n = Seq((Option("x"), None: Option[String]))
      .toDF("a", "b")
      .select(graft.functions.StringExprs.jaroWinkler($"a", $"b"))
      .head()
    assert(n.isNullAt(0))
  }
}
