package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket256(s: String, off: Int): Int =
    Integer.parseInt(md5hex(s).substring(off - 1, off + 1), 16)

  private def bucket65536(s: String, off: Int): Long =
    java.lang.Long.parseLong(md5hex(s).substring(off - 1, off + 3), 16)

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "wiki"),
    (2L, "the sly brown fox naps under the old dog", "wiki"),
    (3L, "buy cheap pills now best price buy now", "spam"),
    (4L, "cheap cheap pills best pills now now now", "spam"),
    (5L, "the fox and the dog share a quiet field", "wiki")
  )

  /** Straight-line DSIR reference: hash words to 256 buckets, smoothed
    * log-ratio per bucket quantized to micro-units, per-doc mean.
    */
  private def refDsir(rows: Seq[(Long, String, String)],
      target: String => Boolean): Map[Long, (Long, Long, Double)] = {
    val toks = rows.flatMap { case (id, text, src) =>
      text.trim.split("\\s+").filter(_.nonEmpty)
        .map(w => (id, target(src), bucket256(w, 1)))
    }
    val t = toks.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val r = toks.filterNot(_._2).groupBy(_._3).view.mapValues(_.size.toLong)
      .toMap
    val (tt, rr) = (t.values.sum, r.values.sum)
    val lam6 = (t.keySet ++ r.keySet).map { b =>
      val lam = math.log((t.getOrElse(b, 0L) + 0.5) / (tt + 128.0)) -
        math.log((r.getOrElse(b, 0L) + 0.5) / (rr + 128.0))
      b -> math.floor(lam * 1e6 + 0.5).toLong
    }.toMap
    toks.groupBy(_._1).map { case (id, ts) =>
      val s = ts.map(x => lam6(x._3)).sum
      id -> (ts.size.toLong, s,
        math.floor(s.toDouble / ts.size + 0.5) / 1e6)
    }
  }

  test("dsirScores reproduces the brute-force reference per document") {
    val df = corpus.toDF("doc_id", "text", "source")
    val got = Selection.dsirScores(df, "doc_id", "text",
        col("source") === "wiki")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == refDsir(corpus, _ == "wiki"))
  }

  test("dsirScores ranks target-like documents above off-target ones") {
    val df = corpus.toDF("doc_id", "text", "source")
    val scores = Selection.dsirScores(df, "doc_id", "text",
        col("source") === "wiki")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // a held-out wiki-like doc (5) must outscore both spam docs
    assert(scores(5L) > scores(3L) && scores(5L) > scores(4L))
  }

  test("fimSplit partitions exactly and matches the md5 arithmetic") {
    val df = Seq((7L, 100L), (8L, 1L), (9L, 0L)).toDF("doc_id", "n_chars")
    val got = Selection.fimSplit(df, "doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    got.foreach { case (id, p, m, s) =>
      val n = Map(7L -> 100L, 8L -> 1L, 9L -> 0L)(id)
      assert(p >= 0 && m >= 0 && s >= 0 && p + m + s == n, s"doc $id")
      val c1 = bucket65536(id.toString, 1) % (n + 1)
      val c2 = bucket65536(id.toString, 5) % (n + 1)
      assert(p == math.min(c1, c2) && s == n - math.max(c1, c2), s"doc $id")
    }
    // n_chars = 0 degenerates to an all-empty split, never negative
    assert(got.find(_._1 == 9L).get == ((9L, 0L, 0L, 0L)))
  }

  test("budgetFill admits whole groups in score order until the budget") {
    // scores (mean chars·1e6 div n): g1 = 9e6, g2 = 5e6, g3 = 2e6
    val df = Seq(
      (1L, "a b c", "g1", 9L), (2L, "d e f g", "g1", 9L),
      (3L, "h i", "g2", 5L), (4L, "j k l", "g2", 5L),
      (5L, "m n o p q", "g3", 2L)
    ).toDF("doc_id", "text", "g", "nc")
    def run(budget: Long) = Selection.budgetFill(df, col("g"), "text",
        "nc", budget)
      .collect()
      .map(r => r.getString(0) ->
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // g1 7 toks, g2 5 toks, g3 5 toks in rank order
    val tight = run(8L)
    assert(tight("g1") == ((1, 7L, 7L, true)))   // 0 < 8 before g1
    assert(tight("g2") == ((2, 5L, 12L, true)))  // 7 < 8 before g2
    assert(tight("g3") == ((3, 5L, 17L, false))) // 12 >= 8 before g3
    // boundary: budget exactly consumed before a group excludes it
    assert(!run(7L)("g2")._4 && run(7L)("g1")._4)
    assert(run(100L).values.forall(_._4))
  }

  test("maskPlan replays the positional hash and hits ~15% in bulk") {
    val df = corpus.toDF("doc_id", "text", "source")
    val got = Selection.maskPlan(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    corpus.foreach { case (id, text, _) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val masked = toks.indices.count(p => bucket256(s"$id#$p", 1) < 38)
      assert(got(id) == ((toks.length.toLong, masked.toLong,
        math.floor(masked.toDouble / toks.length * 1e6 + 0.5) / 1e6)),
        s"doc $id")
    }
    // in bulk the rate concentrates near 38/256 ≈ 14.8%
    val docs = graft.Tables(spark, sf, "documents")
    val bulk = Selection.maskPlan(docs, "doc_id", "text")
      .agg(sum("n_masked").cast("double") / sum("n_tokens")).head.getDouble(0)
    assert(bulk > 0.10 && bulk < 0.20, s"bulk mask rate $bulk")
  }

  /** Straight-line NB reference: Laplace-smoothed per-class word
    * log-probs quantized to micro-units, argmax with min-class ties —
    * the exact arithmetic naiveBayes distributes.
    */
  private def refNb(rows: Seq[(Long, String, String)])
      : Map[Long, (String, Long)] = {
    val toks = rows.flatMap { case (id, text, c) =>
      text.trim.split("\\s+").filter(_.nonEmpty).map(w => (id, c, w))
    }
    val classes = rows.map(_._3).distinct.sorted
    val vocab = toks.map(_._3).distinct
    val v = vocab.size
    val cw = toks.groupBy(t => (t._2, t._3)).view.mapValues(_.size).toMap
    val nC = toks.groupBy(_._2).view.mapValues(_.size).toMap
    val w6 = (for (c <- classes; w <- vocab) yield (c, w) ->
      math.floor(math.log((cw.getOrElse((c, w), 0) + 1.0) /
        (nC(c) + v)) * 1e6 + 0.5).toLong).toMap
    val nDocs = rows.groupBy(_._3).view.mapValues(_.size).toMap
    val p6 = classes.map(c => c ->
      math.floor(math.log(nDocs(c).toDouble / rows.size) * 1e6 + 0.5)
        .toLong).toMap
    rows.map { case (id, text, _) =>
      val ws = text.trim.split("\\s+").filter(_.nonEmpty)
      val scores = classes.map(c =>
        c -> (p6(c) + ws.map(w => w6((c, w))).sum))
      val best = scores.minBy { case (c, s) => (-s, c) }
      id -> best
    }.toMap
  }

  test("naiveBayes matches the brute-force model on every document " +
      "and separates the toy corpus") {
    val df = corpus.toDF("doc_id", "text", "source")
    val got = Selection.naiveBayes(df, "doc_id", "text", "source")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[String]("predicted"),
          r.getAs[Long]("score6")))).toMap
    val want = refNb(corpus)
    corpus.foreach { case (id, _, src) =>
      val (pc, ps) = want(id)
      assert(got(id) == ((src, pc, ps)), s"doc $id")
    }
    // the toy corpus is cleanly separable: predictions == actuals
    assert(got.values.forall { case (a, p, _) => a == p })
  }

  test("naiveBayes is exact-dedup-first: a twin-heavy corpus matches " +
      "the brute-force full-corpus model exactly") {
    // 7 exact twins per doc: the distinct-text path must recover the
    // FULL-corpus class counts (n_cw = Σ m·n_hw) and re-expand a
    // prediction to every member id — refNb recomputes from the
    // expanded rows, so any weighting error breaks the comparison
    val twins = corpus.flatMap { case (id, text, src) =>
      (0 until 7).map(k => (id + 1000L * k, text, src))
    }
    val got = Selection.naiveBayes(twins.toDF("doc_id", "text", "source"),
        "doc_id", "text", "source")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[String]("predicted"),
          r.getAs[Long]("score6")))).toMap
    assert(got.size == twins.size)
    val want = refNb(twins)
    twins.foreach { case (id, _, src) =>
      val (pc, ps) = want(id)
      assert(got(id) == ((src, pc, ps)), s"doc $id")
    }
  }

  test("naiveBayes breaks score ties on the lexicographically " +
      "smallest class") {
    // two classes with mirrored corpora: every doc scores identically
    // under both models, so every prediction must fall to class "a"
    val df = Seq((1L, "x y", "a"), (2L, "x y", "b")).toDF(
      "doc_id", "text", "source")
    val got = Selection.naiveBayes(df, "doc_id", "text", "source")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("predicted")).toMap
    assert(got == Map(1L -> "a", 2L -> "a"))
  }

  test("skyline2d equals brute-force dominance, keeps all (x,y) ties") {
    val pts = Seq((1L, 10L, 1L), (2L, 8L, 5L), (3L, 8L, 5L), // tie pair
      (4L, 8L, 3L),  // dominated by 2/3 (same x, higher y)
      (5L, 5L, 9L), (6L, 4L, 9L), // 6 dominated by 5 (same y, higher x)
      (7L, 1L, 12L), (8L, 10L, 1L), // 8 ties 1
      (9L, 3L, 3L)) // interior
    val df = pts.toDF("id", "x", "y")
    val got = Selection.skyline2d(df, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y) }
    }.map(_._1).toSet
    assert(got == brute && got == Set(1L, 2L, 3L, 5L, 7L, 8L))
  }

  test("skyline2d excludes null-coordinate rows instead of silently " +
      "mis-sweeping them") {
    val df = Seq((1L, Some(5L), Some(5L)), (2L, None, Some(9L)),
      (3L, Some(9L), None), (4L, Some(4L), Some(6L)))
      .toDF("id", "x", "y")
    val got = Selection.skyline2d(df, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L))
  }

  test("skyline2d matches brute force on a pseudo-random frame") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 200L).map(i =>
      (i, rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val df = pts.toDF("id", "x", "y")
    val got = Selection.skyline2d(df, "id", "x", "y")
      .collect().map(_.getLong(0)).toSet
    val brute = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y) }
    }.map(_._1).toSet
    assert(got == brute)
  }

  test("shardPlan: matches the brute md5-order cumsum, is invariant " +
      "to the partition count, and fills every non-final shard to " +
      "within one document of target") {
    val docs = (1L to 40L).map(i =>
      (i, (s"tok$i " * (i % 7 + 1).toInt).trim)).toDF("doc_id", "text")
    val texts = (1L to 40L).map(i =>
      i -> (s"tok$i " * (i % 7 + 1).toInt).trim).toMap
    // brute plan: sort by (md5(text), id), running sum, integer div
    val orderKeyed = texts.toSeq
      .map { case (i, t) => (md5hex(t), i, t.split("\\s+").length.toLong) }
      .sortBy { case (h, i, _) => (h, i) }
    val target = 16L
    var cum = 0L
    val want = orderKeyed.map { case (_, i, n) =>
      cum += n; i -> ((cum - n) / target, n)
    }.toMap
    for (np <- Seq(1, 3, 8)) {
      val got = Selection.shardPlan(docs, "doc_id", "text", target, np)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(1)))
        .toMap
      assert(got == want, s"plan diverged at nPart=$np")
    }
    // a boundary doc belongs to the shard its FIRST token lands in, so
    // a non-final shard can undershoot by at most maxNtok - 1 tokens
    val maxNtok = orderKeyed.map(_._3).max
    val perShard = want.values.groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val last = perShard.keys.max
    perShard.foreach { case (s, tot) =>
      if (s != last) assert(tot >= target - (maxNtok - 1),
        s"shard $s underfilled: $tot")
    }
  }

  test("zorderLayout: quadrant assignment, stats, and pruning verdicts") {
    // bits=2 (buckets 0..3), fileShift=2 -> 4 files, each one 2x2
    // quadrant of the 4x4 grid (file = top bit of y, top bit of x)
    val pts = for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)
    val df = pts.toDF("x", "y")
    val out = Selection.zorderLayout(df, col("x"), col("y"),
        bits = 2, fileShift = 2,
        predXLo = 0L, predXHi = 1L, predYLo = 2L, predYHi = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)),
        (r.getInt(6), r.getInt(7))))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.forall(_._2 == 4L), "each quadrant holds 4 of 16 points")
    // file 0 = x in [0,1], y in [0,1]; file 1 = x in [2,3], y in [0,1];
    // file 2 = x in [0,1], y in [2,3]; file 3 = x in [2,3], y in [2,3]
    assert(out.map(_._3).toSeq == Seq(
      (0L, 1L, 0L, 1L), (2L, 3L, 0L, 1L), (0L, 1L, 2L, 3L),
      (2L, 3L, 2L, 3L)))
    // predicate x in [0,1] AND y in [2,3]: prune_x kills files 1,3;
    // prune_y kills files 0,1 -> only file 2 survives both
    assert(out.map(_._4).toSeq == Seq((0, 1), (1, 1), (0, 0), (1, 0)))
  }
}
