package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b a b a c", "g1"),
    (2L, "a b c d e f", "g1"),
    (3L, "x x x x y z", "g2"),
    (4L, "a b x y z q", "g2")
  )

  private def words(rows: Seq[(Long, String, String)]) =
    rows.flatMap { case (_, t, g) =>
      t.trim.split("\\s+").filter(_.nonEmpty).map(g -> _)
    }

  test("klVsCorpus reproduces the smoothed-KL reference and is " +
      "non-negative up to quantization") {
    val ws = words(corpus)
    val vocab = ws.map(_._2).distinct.sorted
    val cw = ws.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = ws.size.toLong
    val v = vocab.size.toLong
    val want = ws.groupBy(_._1).map { case (g, gws) =>
      val ng = gws.size.toLong
      val cgw = gws.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val t9s = vocab.map { w =>
        val p = (cgw.getOrElse(w, 0L) + 0.5) / (ng + v / 2.0)
        val q = (cw(w) + 0.5) / (n + v / 2.0)
        math.floor(p * (math.log(p) - math.log(q)) * 1e9 + 0.5).toLong
      }.sum
      g -> (ng, math.floor(t9s.toDouble / 1e3 + 0.5) / 1e6)
    }
    val got = CorpusStats.klVsCorpus(
        corpus.toDF("doc_id", "text", "g"), col("g"), "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(got == want)
    got.values.foreach { case (_, kl) => assert(kl >= -1e-3, s"kl $kl") }
  }

  test("klVsCorpus is ~0 when every group shares the corpus distribution") {
    val same = Seq((1L, "a a b c", "g1"), (2L, "a a b c", "g2"),
      (3L, "a a b c", "g3"))
    val got = CorpusStats.klVsCorpus(
        same.toDF("doc_id", "text", "g"), col("g"), "text")
      .collect().map(_.getDouble(2))
    // identical groups differ from the corpus only through smoothing
    got.foreach(kl => assert(math.abs(kl) < 0.01, s"kl $kl"))
  }

  test("distinctN counts types and grams like the brute force") {
    val got = CorpusStats.distinctN(
        corpus.toDF("doc_id", "text", "g"), col("g"), "text")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val toks = corpus.map { case (id, t, g) =>
      (g, t.trim.split("\\s+").toSeq)
    }
    for (n <- 1 to 3) {
      val grams = toks.flatMap { case (g, ts) =>
        ts.sliding(n).filter(_.size == n).map(g -> _.mkString(" "))
      }
      grams.groupBy(_._1).foreach { case (g, gs) =>
        val types = gs.map(_._2).distinct.size.toLong
        val total = gs.size.toLong
        val ratio = math.floor(types.toDouble / total * 1e6 + 0.5) / 1e6
        assert(got((g, n)) == ((types, total, ratio)), s"group $g n=$n")
      }
    }
  }

  test("distinctN flags a degenerate all-same-token group") {
    val df = Seq((1L, "spam spam spam spam spam spam spam spam", "bad"),
      (2L, "one two three four five six seven eight", "good"))
      .toDF("doc_id", "text", "g")
    val got = CorpusStats.distinctN(df, col("g"), "text")
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(4)).toMap
    assert(got(("bad", 1)) == 0.125 && got(("good", 1)) == 1.0)
    assert(got(("bad", 2)) < got(("good", 2)))
  }

  test("vocabCoverage ranks the census and accumulates exact shares") {
    // counts: a×4, b×3, c×2, d×1 → total 10
    val df = Seq((1L, "a b a c"), (2L, "a b d a"), (3L, "b c"))
      .toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverage(df, "text", topV = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    assert(got.sortBy(_._1).toSeq == Seq(
      (1L, 4L, 0.4, false), (2L, 3L, 0.7, false), (3L, 2L, 0.9, true)))
  }

  test("vocabCoverage: census smaller than topV yields the whole curve " +
      "ending at share 1") {
    val df = Seq((1L, "x y x")).toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverage(df, "text", topV = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.sortBy(_._1).toSeq == Seq((1L, 0.666667), (2L, 1.0)))
  }

  test("vocabOverlap computes pairwise vocab Jaccard like the brute force") {
    val got = CorpusStats.vocabOverlap(
        corpus.toDF("doc_id", "text", "g"), col("g"), "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val vocabs = words(corpus).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val gs = vocabs.keys.toSeq.sorted
    val want = (for {
      a <- gs; b <- gs if a < b
      shared = (vocabs(a) & vocabs(b)).size
      if shared > 0
    } yield (a, b) -> (shared.toLong,
      math.floor(shared.toDouble / (vocabs(a) ++ vocabs(b)).size * 1e6
        + 0.5) / 1e6)).toMap
    assert(got == want)
  }

  test("vocabOverlap emits no row for disjoint vocabularies") {
    val df = Seq((1L, "aa bb", "g1"), (2L, "cc dd", "g2"),
      (3L, "aa cc", "g3")).toDF("doc_id", "text", "g")
    val got = CorpusStats.vocabOverlap(df, col("g"), "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("g1", "g3"), ("g2", "g3")))
  }

  test("zipfSlope matches the brute-force OLS and is negative on " +
      "natural-ish data") {
    // geometric-ish frequencies: w1 x8, w2 x4, w3 x2, w4 x1
    val text = (Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++
      Seq.fill(2)("w3") ++ Seq("w4")).mkString(" ")
    val df = Seq((1L, text, "g")).toDF("doc_id", "text", "g")
    val counts = Seq(("w1", 8L), ("w2", 4L), ("w3", 2L), ("w4", 1L))
    val xy = counts.sortBy { case (w, c) => (-c, w) }.zipWithIndex
      .map { case ((_, c), i) =>
        (math.floor(math.log((i + 1).toDouble) * 1e6 + 0.5).toLong,
          math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong)
      }
    val n = xy.size.toLong
    val (sx, sy) = (xy.map(_._1).sum, xy.map(_._2).sum)
    val (sxy, sxx) = (xy.map(p => p._1 * p._2).sum,
      xy.map(p => p._1 * p._1).sum)
    val want = math.floor((n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble * 1e6 + 0.5) / 1e6
    val got = CorpusStats.zipfSlope(df, col("g"), "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("g", 4L, want)))
    assert(want < -0.5)
    // real corpus: every source's slope is negative (Zipf-like)
    val docs = graft.Tables(spark, sf, "documents")
    CorpusStats.zipfSlope(docs, col("source"), "text")
      .collect().foreach(r => assert(r.getDouble(2) < 0, r.getString(0)))
  }
}
