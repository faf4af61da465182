package graft.functions

import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.WinnowExprs._

/** Pins the winnowing fingerprint selection (Schleimer et al. 2003)
  * against an independent brute-force reference: direct (non-rolling)
  * polynomial hashes and a literal rightmost-min window scan, written
  * here from the paper's definition rather than the expression's code,
  * so a rolling-recurrence bug or an off-by-one in the window walk is
  * a named failure — and the q181 oracle's DuckDB replay of the same
  * math stays anchored from the Scala side too.
  */
class WinnowExprsSpec extends SparkSpec {
  import spark.implicits._

  private def grams(text: String, k: Int = 8, w: Int = 4): Seq[String] =
    Seq(text).toDF("t")
      .select(winnowGrams(org.apache.spark.sql.functions.col("t"), k, w)
        .as("g"))
      .as[Seq[String]].collect().head

  /** Brute force from the definition: h(i) = sum cp(i+j)·B^(k-1-j)
    * mod M computed independently per position, windows as literal
    * slices, rightmost min by scanning the reversed slice.
    */
  private def reference(text: String, k: Int, w: Int): Seq[String] = {
    val cps = text.codePoints().toArray
    val nh = cps.length - k + 1
    if (nh < 1) return Seq.empty
    val pw = Array.iterate(1L, k)(p => p * B % M).reverse
    val h = Array.tabulate(nh) { i =>
      (0 until k).map(j => cps(i + j) * pw(j) % M).sum % M
    }
    val sel = (0 until math.max(1, nh - w + 1)).map { p =>
      val win = h.slice(p, math.min(p + w, nh))
      p + (win.length - 1 - win.reverse.indexOf(win.min))
    }.distinct.sorted
    sel.map(pos => new String(cps, pos, k))
  }

  test("fixtures: short text empty; exact-k text is its own anchor") {
    assert(grams("short") == Seq.empty)
    assert(grams("exactly8") == Seq("exactly8"))
    assert(grams("abcdefghijk") == Seq(reference("abcdefghijk", 8, 4).head))
  }

  test("selection matches the brute-force definition on random text " +
      "(ascii + unicode, varied k/w)") {
    val alpha = Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
      1 -> Gen.const('é'), 1 -> Gen.const('雪'))
    val cases = Gen.listOfN(120, for {
      n <- Gen.chooseNum(0, 60)
      cs <- Gen.listOfN(n, alpha)
      k <- Gen.chooseNum(2, 10)
      w <- Gen.chooseNum(1, 6)
    } yield (cs.mkString, k, w)).sample.get
    // one spark action per (k, w) batch, not one per case
    cases.groupBy { case (_, k, w) => (k, w) }.foreach {
      case ((k, w), batch) =>
        val got = batch.map(_._1).toDF("t")
          .select(org.apache.spark.sql.functions.col("t"),
            winnowGrams(org.apache.spark.sql.functions.col("t"), k, w)
              .as("g"))
          .as[(String, Seq[String])].collect().toMap
        batch.foreach { case (t, _, _) =>
          assert(got(t) == reference(t, k, w), s"text=$t k=$k w=$w")
        }
    }
  }

  test("winnowing guarantee: a shared substring of length >= k + w - 1 " +
      "shares an anchor gram regardless of embedding offset") {
    val shared = "zqxjvkwpbyfmg" // 13 >= k + w - 1 = 11
    val a = s"prefix one $shared suffix alpha"
    val b = s"a completely different and longer head $shared tail"
    val common = grams(a).toSet.intersect(grams(b).toSet)
    assert(common.nonEmpty, "guarantee violated: no shared anchor")
    assert(common.exists(shared.contains(_)),
      "shared anchors exist but none from the common substring")
  }

  test("anchor density is near the published 2/(w+1) expectation") {
    val rnd = new scala.util.Random(7)
    val t = Array.fill(4000)(('a' + rnd.nextInt(26)).toChar).mkString
    val n = grams(t, 8, 4).size.toDouble
    val expected = 2.0 / 5.0 * (t.length - 7)
    assert(n > expected * 0.7 && n < expected * 1.3,
      s"density $n vs expected ~$expected")
  }
}
