package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.CleanFns._
import graft.operators.Dedup

/** Algebraic properties over generated inputs (SURVEY.md §5.2) —
  * plain-scalacheck sampling (scalatestplus isn't in the offline
  * dependency set), evaluated through real Spark plans.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val texts: Seq[String] =
    Gen.listOfN(40, Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "x", "42"))
        .map(_.mkString(" ")))).sample.get.distinct

  test("jaccard ∈ [0,1], symmetric, and 1 on self (generated texts)") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val sh = Dedup.shingleFrame(df, "doc_id", "text", n = 2)
    val a = sh.select(col("doc_id").as("ia"), col("sh").as("sa"))
    val b = sh.select(col("doc_id").as("ib"), col("sh").as("sb"))
    val pairs = a.crossJoin(b)
      .select(col("ia"), col("ib"),
        Dedup.jaccardFromShingles(col("sa"), col("sb")).as("j"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    pairs.foreach { case ((i, j), v) =>
      assert(v >= 0.0 && v <= 1.0)
      assert(math.abs(v - pairs((j, i))) < 1e-12, "symmetry")
    }
    sh.collect().foreach { r =>
      val id = r.getLong(0)
      val hasShingles = r.getSeq[String](1).nonEmpty
      if (hasShingles) assert(pairs((id, id)) == 1.0)
    }
  }

  test("anti-join against empty right side is identity") {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val empty = Seq.empty[(Long, String)].toDF("id", "t")
    val got = df.join(empty, Seq("id"), "left_anti")
      .orderBy("id").as[(Long, String)].collect()
    assert(got.toSeq == df.orderBy("id").as[(Long, String)].collect().toSeq)
  }

  test("fillEmpty ∘ fillEmpty = fillEmpty; normalizeWhitespace idempotent on its output") {
    val df = (texts.map(Option(_)) :+ None).toDF("v")
    val once = df.select(normalizeWhitespace(fillEmpty(col("v"))).as("r"))
      .as[String].collect()
    val twice = df.select(
        normalizeWhitespace(fillEmpty(normalizeWhitespace(fillEmpty(col("v")))))
          .as("r"))
      .as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("mergeConcat: blank 'from' never changes 'to'; result non-empty if either side is") {
    val pairs = for {
      t <- Seq("", "a", "b, c")
      f <- Seq("", "a", "d")
    } yield (t, f)
    val got = pairs.toDF("t", "f")
      .select(col("t"), col("f"), mergeConcat(col("t"), col("f")).as("m"))
      .as[(String, String, String)].collect()
    got.foreach { case (t, f, m) =>
      if (f.isEmpty) assert(m == t)
      if (t.nonEmpty || f.nonEmpty) assert(m.nonEmpty)
    }
  }

  test("exact dedup partitions the input: group sizes sum to row count") {
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t.take(3)) }.toDF("id", "k")
    val n = df.count()
    val grouped = Dedup.exact(df, Seq("k"), "id")
      .agg(sum("n_dups")).as[Long].head()
    assert(grouped == n)
  }

  // ---- temporal / graph operators vs brute-force references --------

  private val rnd = new scala.util.Random(42)
  private val randEvents: Seq[(Long, Long, Long)] = // (key, t, eid)
    (1L to 120L).map(eid =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, eid))

  test("asOfJoin matches the naive per-probe argmax on random data") {
    import graft.operators.Temporal
    val events = randEvents.toDF("k", "t", "eid")
    val probes = (1L to 40L)
      .map(pid => (rnd.nextInt(5).toLong, rnd.nextInt(55).toLong, pid))
      .toDF("k", "t", "pid")
    val got = Temporal.asOfJoin(probes, events, "k", "k", "t", "t", "eid",
        Seq("eid"))
      .select("pid", "eid").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
      .toMap
    val evSeq = randEvents
    probes.select("k", "t", "pid").as[(Long, Long, Long)].collect()
      .foreach { case (k, t, pid) =>
        val naive = evSeq.filter(e => e._1 == k && e._2 <= t)
          .sortBy(e => (e._2, e._3)).lastOption.map(_._3)
        assert(got(pid) == naive, s"probe $pid")
      }
  }

  test("rangeJoinPairs matches the naive theta-join on random data") {
    import graft.operators.Temporal
    val events = randEvents.toDF("k2", "t2", "eid")
    val probes = (1L to 40L)
      .map(pid => (rnd.nextInt(5).toLong, rnd.nextInt(55).toLong, pid))
      .toDF("k", "t", "pid")
    val (lo, hi) = (-7L, 4L)
    val got = Temporal.rangeJoinPairs(probes, events, "k", "k2", "t", "t2",
        lo, hi, Seq("eid" -> "eid"))
      .select("pid", "eid").as[(Long, Long)].collect().toSet
    val want = (for {
      (k, t, pid) <- probes.select("k", "t", "pid")
        .as[(Long, Long, Long)].collect()
      (ek, et, eid) <- randEvents
      if ek == k && et >= t + lo && et < t + hi
    } yield (pid, eid)).toSet
    assert(got == want)
  }

  test("connectedComponents matches union-find on random graphs") {
    val n = 30L
    val nodes = (1L to n).toDF("id")
    val edgeSeq = (1 to 25).map(_ =>
      (rnd.nextInt(30).toLong + 1, rnd.nextInt(30).toLong + 1))
      .filter { case (a, b) => a != b }
    val edges = edgeSeq.toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "id", edges)
      .as[(Long, Long)].collect().toMap
    // reference: path-compressed union-find
    val parent = scala.collection.mutable.Map((1L to n).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x
      else { val r = find(parent(x)); parent(x) = r; r }
    edgeSeq.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (1L to n).foreach { i =>
      // canonical label = min id in component on both sides
      val members = (1L to n).filter(j => find(j) == find(i))
      assert(got(i) == members.min, s"node $i")
    }
  }
}
