package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the deterministic sampling/split/packing operators: known md5
  * bucket values, split stability under duplication and re-partitioning,
  * monotone sample membership, and exact packing boundaries.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("md5Bucket256 matches hand-computed md5 hex values") {
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72
    //   chars 1-2 "90" -> 9*16 + 0 = 144; chars 3-4 "01" -> 0*16+1 = 1
    val r = Seq("abc").toDF("s")
      .select(Sampling.md5Bucket256(col("s"), 1).as("b1"),
        Sampling.md5Bucket256(col("s"), 3).as("b3"))
      .head()
    assert(r.getInt(0) == 144)
    assert(r.getInt(1) == 1)
  }

  test("deterministicSplit covers ~80/10/10 and is content-stable") {
    val df = (0 until 2000).map(i => (i.toLong, s"document number $i body"))
      .toDF("id", "text")
    val s = Sampling.deterministicSplit(df, col("text"))
    val frac = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 2000.0).toMap
    assert(math.abs(frac("train") - 0.80) < 0.05, s"train=$frac")
    assert(math.abs(frac("val") - 0.10) < 0.04, s"val=$frac")
    assert(math.abs(frac("test") - 0.10) < 0.04, s"test=$frac")

    // same content, different row/partitioning → identical assignment
    val dup = Sampling.deterministicSplit(
      df.repartition(7).withColumn("id", col("id") + 10000), col("text"))
    val joined = s.select(col("text"), col("split").as("a"))
      .join(dup.select(col("text"), col("split").as("b")), "text")
    assert(joined.filter(col("a") =!= col("b")).count() == 0)
  }

  test("weightedSample is exact at the extremes and monotone in weight") {
    val df = (0 until 500).map(i => (i.toLong, s"text $i")).toDF("id", "text")
    assert(Sampling.weightedSample(df, col("text"), lit(0)).count() == 0)
    assert(Sampling.weightedSample(df, col("text"), lit(256)).count() == 500)
    val k64 = Sampling.weightedSample(df, col("text"), lit(64))
    val k128 = Sampling.weightedSample(df, col("text"), lit(128))
    assert(k64.count() > 0 && k64.count() < k128.count())
    // monotone membership: everything kept at 64 is kept at 128
    assert(k64.select("id").exceptAll(k128.select("id")).count() == 0)
  }

  test("packBySequence fills 10-token bins contiguously per group") {
    val rows = Seq(
      ("s1", 1L, 4L), ("s1", 2L, 4L), ("s1", 3L, 4L), // cum-starts 0,4,8
      ("s1", 4L, 12L),                                // starts at 12 → pack 1
      ("s2", 5L, 9L), ("s2", 6L, 2L)                  // starts 0, 9 → 0, 0
    ).toDF("source", "doc_id", "n_tokens")
    val r = Sampling.packBySequence(rows, Seq("source"), "doc_id",
        "n_tokens", budget = 10)
      .orderBy("doc_id")
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L,
      5L -> 0L, 6L -> 0L))
  }

  test("quotaPerGroup keeps exactly n per group with deterministic ties") {
    val rows = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 100L), ("s1", 3L, 50L), ("s1", 4L, 200L),
      ("s2", 5L, 10L)).toDF("source", "doc_id", "n_chars")
    val r = Sampling.quotaPerGroup(rows, Seq("source"),
        Seq(col("n_chars").desc, col("doc_id")), n = 2)
      .select("doc_id", "rk").as[(Long, Int)].collect().toMap
    // s1 ranks: 4 (200), then 1 before 2 on the doc_id tie-break; 3 cut
    assert(r == Map(4L -> 1, 1L -> 2, 5L -> 1))
  }

  test("repetitionStats computes exact gram counts and fractions") {
    val df = Seq((1L, "a b a b a"), (2L, "x y z w")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(df, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    // doc 1: 2-grams [a b, b a, a b, b a] → 4 total, 2 distinct, top 2
    assert(r(0).getAs[Long]("n_grams") == 4L)
    assert(r(0).getAs[Long]("n_distinct_grams") == 2L)
    assert(r(0).getAs[Long]("top_gram_n") == 2L)
    assert(r(0).getAs[Double]("top_gram_frac") == 0.5)
    assert(r(0).getAs[Double]("dup_gram_frac") == 1.0)
    // doc 2: all distinct → top 1, dup_frac 0
    assert(r(1).getAs[Long]("n_grams") == 3L)
    assert(r(1).getAs[Double]("dup_gram_frac") == 0.0)
  }

  test("uniformSample is content-stable and partitioning-invariant") {
    val df = (0 until 500).map(i => (i.toLong, s"doc body $i"))
      .toDF("id", "text")
    val a = Sampling.uniformSample(df, col("text"), 50, col("id"))
      .select("id").as[Long].collect().toSet
    assert(a.size == 50)
    val b = Sampling.uniformSample(df.repartition(13), col("text"), 50,
        col("id"))
      .select("id").as[Long].collect().toSet
    assert(a == b, "sample membership changed under repartitioning")
    // identical content ties break on the unique key, not arbitrarily
    val dup = Seq((1L, "same"), (2L, "same"), (3L, "same"))
      .toDF("id", "text")
    val got = Sampling.uniformSample(dup, col("text"), 2, col("id"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("groupSplit is group-atomic and matches the stringified-key split") {
    val df = (0 until 300).map(i => (i.toLong, (i % 37).toLong))
      .toDF("id", "grp")
    val s = Sampling.groupSplit(df, col("grp"))
    val mixed = s.groupBy("grp")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1)
    assert(mixed.count() == 0, "a group straddles splits")
    // identical to content-split on the group id string — groupSplit is
    // a composition, not a new hash scheme
    val twin = Sampling.deterministicSplit(df, col("grp").cast("string"))
    assert(s.except(twin).count() == 0 && twin.except(s).count() == 0)
  }

  test("stratifiedSample keeps exactly ceil(pct) of every stratum") {
    // strata of size 10, 7, 1, 23 → 10% quotas 1, 1, 1, 3
    val rows = Seq.tabulate(10)(i => (s"a$i", "A")) ++
      Seq.tabulate(7)(i => (s"b$i", "B")) ++
      Seq(("c0", "C")) ++
      Seq.tabulate(23)(i => (s"d$i", "D"))
    val df = rows.toDF("id", "grp")
    val got = Sampling.stratifiedSample(df, Seq("grp"), col("id"),
        col("id"), 10, 100)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(got == Map("A" -> 1L, "B" -> 1L, "C" -> 1L, "D" -> 3L), s"$got")
  }

  test("stratifiedSample membership is deterministic under repartitioning") {
    val df = (0 until 500).map(i => (s"doc $i", s"s${i % 5}"))
      .toDF("id", "grp")
    val a = Sampling.stratifiedSample(df, Seq("grp"), col("id"),
      col("id"), 25, 100).select("id").as[String].collect().toSet
    val b = Sampling.stratifiedSample(df.repartition(13), Seq("grp"),
      col("id"), col("id"), 25, 100).select("id").as[String].collect().toSet
    assert(a == b)
    assert(a.size == 125) // 5 strata × ceil(100 × 25%)
  }

  test("weightedTopK: deterministic, partitioning-invariant, and " +
      "weight-monotone in expectation") {
    val df = (0 until 400).map(i =>
      (s"doc $i", if (i < 200) 1.0 else 100.0)).toDF("id", "w")
    val a = Sampling.weightedTopK(df, col("id"), col("w"), 50, col("id"))
      .select("id").as[String].collect().toSeq
    val b = Sampling.weightedTopK(df.repartition(13), col("id"), col("w"),
      50, col("id")).select("id").as[String].collect().toSeq
    assert(a == b) // same rows, same order
    // heavy rows (w=100, half the corpus) should dominate the sample
    val heavy = a.count(_.stripPrefix("doc ").toInt >= 200)
    assert(heavy > 40, s"heavy=$heavy of 50")
  }

  test("weightedTopK: zero/negative/null weights are never sampled; " +
      "es_key column is exposed and ascending") {
    val df = Seq(("a", 1.0), ("b", 0.0), ("c", -1.0))
      .toDF("id", "w")
      .unionAll(Seq(("d", Option.empty[Double])).toDF("id", "w"))
    val got = Sampling.weightedTopK(df, col("id"), col("w"), 10, col("id"))
    assert(got.select("id").as[String].collect().toSeq == Seq("a"))
    val keys = Sampling.weightedTopK(
        (0 until 50).map(i => (s"x$i", 2.0)).toDF("id", "w"),
        col("id"), col("w"), 20, col("id"))
      .select("es_key").as[Double].collect().toSeq
    assert(keys == keys.sorted && keys.forall(_ > 0))
  }

  test("temperatureWeights: alpha=1 is the natural distribution; " +
      "alpha<1 boosts small groups and sums to 1") {
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).toDF("g")
    val nat = Sampling.temperatureWeights(df, col("g"), 1.0)
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    assert(nat("big").getAs[Double]("weight") == 0.9)
    assert(nat("small").getAs[Double]("weight") == 0.1)
    assert(nat("big").getAs[Double]("boost") == 1.0)
    val cool = Sampling.temperatureWeights(df, col("g"), 0.5)
      .collect().map(r => r.getAs[String]("group") -> r).toMap
    // p^0.5 normalized: big 3/4, small 1/4
    assert(cool("big").getAs[Double]("weight") == 0.75)
    assert(cool("small").getAs[Double]("weight") == 0.25)
    assert(cool("small").getAs[Double]("boost") == 2.5)  // 0.25 / 0.1
    assert(cool("big").getAs[Double]("boost") < 1.0)
  }

  test("apportionBudget: quotas sum exactly to the budget; leftover " +
      "units go to the largest remainders with group tie-break") {
    // W = 60; B = 10 -> shares 10*7/60=1 r10, 10*23/60=3 r50,
    // 10*30/60=5 r0; base sum 9, leftover 1 -> largest remainder (b)
    val df = Seq(("a", 7L), ("b", 23L), ("c", 30L)).toDF("g", "w")
    val got = Sampling.apportionBudget(df, "g", "w", budget = 10L)
      .collect().map(r => r.getAs[String]("group") ->
        ((r.getAs[Long]("base"), r.getAs[Long]("rem"),
          r.getAs[Long]("quota")))).toMap
    assert(got("a") == ((1L, 10L, 1L)))
    assert(got("b") == ((3L, 50L, 4L)))   // the leftover unit
    assert(got("c") == ((5L, 0L, 5L)))
    // equal remainders: group-ascending tie-break takes the unit
    val tie = Seq(("x", 1L), ("y", 1L)).toDF("g", "w")
    val t = Sampling.apportionBudget(tie, "g", "w", budget = 3L)
      .collect().map(r => r.getAs[String]("group") ->
        r.getAs[Long]("quota")).toMap
    assert(t("x") == 2L && t("y") == 1L)
    // zero-weight groups get zero; sums still hit the budget
    val z = Sampling.apportionBudget(
      Seq(("a", 0L), ("b", 5L)).toDF("g", "w"), "g", "w", budget = 7L)
    assert(z.collect().map(r =>
      r.getAs[String]("group") -> r.getAs[Long]("quota")).toMap ==
      Map("a" -> 0L, "b" -> 7L))
    // petascale weights: decimal product, no long overflow / 2^53 drift
    val big = Seq(("p", 4000000000000000L), ("q", 4000000000000001L))
      .toDF("g", "w")
    val bq = Sampling.apportionBudget(big, "g", "w",
        budget = 1000000000L).collect()
      .map(r => r.getAs[String]("group") -> r.getAs[Long]("quota")).toMap
    assert(bq.values.sum == 1000000000L)
    // base_p = 499999999 with a near-W remainder, base_q = 500000000
    // with a tiny one: the leftover unit follows p's larger remainder
    // and the quotas come out exactly equal — double arithmetic would
    // have mis-floored both bases at this magnitude
    assert(bq("p") == 500000000L && bq("q") == 500000000L)
  }

  test("apportionBudget: zero total weight yields all-zero quotas, " +
      "never NULLs, even with a positive budget") {
    val df = Seq(("a", 0L), ("b", 0L), ("c", 0L)).toDF("g", "w")
    val rows = Sampling.apportionBudget(df, "g", "w", budget = 10L).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      assert(!r.isNullAt(r.fieldIndex("base")) &&
        !r.isNullAt(r.fieldIndex("rem")) &&
        !r.isNullAt(r.fieldIndex("quota")),
        s"NULL apportionment for group ${r.getAs[String]("group")}")
      assert(r.getAs[Long]("quota") == 0L)
    }
  }
}
