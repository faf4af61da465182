package graft.operators

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference BPE trainer: collect the word census and
    * loop in plain Scala — the definition the distributed trainer
    * must reproduce merge-for-merge.
    */
  private def refTrain(words: Map[String, Long], numMerges: Int,
      minCount: Long = 2L): Seq[(String, String)] = {
    var census = words.toSeq.map { case (w, c) =>
      (w.map(_.toString).toVector: Seq[String], c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var r = 0
    while (r < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      census.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      val eligible = counts.filter(_._2 >= minCount)
      if (eligible.isEmpty) r = numMerges
      else {
        val best = eligible.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        census = census.map { case (syms, c) =>
          (Bpe.mergeOnce(syms, best._1, best._2), c)
        }
        r += 1
      }
    }
    merges.toSeq
  }

  private val corpus = Seq(
    (1L, "low lower lowest low low"),
    (2L, "new newer newest new"),
    (3L, "wider wide wide widest"),
    (4L, "low new wide lower newer")
  )

  private def censusOf(rows: Seq[(Long, String)]): Map[String, Long] =
    rows.flatMap(_._2.trim.split("\\s+")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }

  test("bpeTrain reproduces the brute-force reference merge-for-merge") {
    val df = corpus.toDF("doc_id", "text")
    for (n <- Seq(5, 15, 40)) {
      val got = Bpe.bpeTrain(df, "text", n)
      val want = refTrain(censusOf(corpus), n)
      assert(got == want, s"numMerges=$n")
    }
  }

  test("driver fast path == distributed rounds, merge-for-merge " +
    "(the size gate must never change the learned table)") {
    val df = corpus.toDF("doc_id", "text")
    for (n <- Seq(5, 15, 40)) {
      // cap 0 forces the distributed per-round loop; the default cap
      // routes this census through the driver loop
      val distributed = Bpe.bpeTrain(df, "text", n, maxDriverCensus = 0L)
      val driver = Bpe.bpeTrain(df, "text", n)
      assert(driver == distributed, s"numMerges=$n")
      assert(driver == refTrain(censusOf(corpus), n), s"numMerges=$n")
      // the SYMBOL gate (total census symbols, the driver-heap bound)
      // must route to the distributed path just like the row gate
      val symGated = Bpe.bpeTrain(df, "text", n, maxDriverSymbols = 0L)
      assert(symGated == driver, s"numMerges=$n (symbol gate)")
    }
  }

  test("segment replays the training merges: encoding a census word " +
      "yields the word's final training-time symbols") {
    val words = censusOf(corpus)
    val merges = refTrain(words, 12)
    val rank = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    words.keys.foreach { w =>
      var syms: Seq[String] = w.map(_.toString).toVector
      merges.foreach { case (a, b) => syms = Bpe.mergeOnce(syms, a, b) }
      assert(Bpe.segment(w, rank) == syms, w)
    }
  }

  test("bpeEncode round-trips every document and respects token bounds") {
    val docs = graft.Tables(spark, sf, "documents")
    val merges = Bpe.bpeTrain(docs, "text", 20)
    assert(merges.size == 20)
    assert(merges.distinct.size == 20)
    val enc = Bpe.bpeEncode(docs, "doc_id", "text", merges)
      .join(docs.selectExpr("doc_id",
        "regexp_replace(trim(text), '\\\\s+', '') AS squash"), "doc_id")
    assert(enc.count() == docs.count())
    val bad = enc.filter(
      org.apache.spark.sql.functions.concat_ws("",
        org.apache.spark.sql.functions.col("toks")) =!=
        org.apache.spark.sql.functions.col("squash") ||
      org.apache.spark.sql.functions.col("n_tokens") <
        org.apache.spark.sql.functions.col("n_words"))
    assert(bad.count() == 0)
    // merges actually fire: subword compression beats one-char-per-
    // token, i.e. strictly fewer tokens than non-space characters
    val row = enc.selectExpr("sum(n_tokens) AS t", "sum(length(squash)) AS c")
      .head()
    assert(row.getLong(0) < row.getLong(1))
  }

  test("ties break deterministically: equal-count pairs merge in " +
      "lexicographic order") {
    // "ba" and "dc" both appear twice; (b,a) < (d,c) lexicographically
    val df = Seq((1L, "ba ba dc dc")).toDF("doc_id", "text")
    val merges = Bpe.bpeTrain(df, "text", 2)
    assert(merges == Seq(("b", "a"), ("d", "c")))
  }

  test("minCount stops training before noise merges: a hapax-only " +
      "corpus learns nothing") {
    val df = Seq((1L, "abc def ghi")).toDF("doc_id", "text")
    assert(Bpe.bpeTrain(df, "text", 10).isEmpty)
  }
}
