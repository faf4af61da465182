package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins decontamination on corpora with planted eval overlap and PII
  * scrubbing on planted identifiers.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val evalSet = Seq(
    (100L, "the capital of france is paris and it is on the seine"),
    (101L, "water boils at one hundred degrees celsius at sea level")
  ).toDF("doc_id", "text")

  private val train = Seq(
    // contaminated: contains eval doc 100's 8-gram verbatim
    (1L, "trivia dump the capital of france is paris and it is nice"),
    // contaminated with BOTH eval docs
    (2L, "the capital of france is paris and it rains water boils at " +
      "one hundred degrees celsius at sea level today"),
    (3L, "a completely unrelated document about spark physical plans"),
    (4L, "short")
  ).toDF("doc_id", "text")

  test("contaminationReport flags exactly the overlapping docs") {
    val r = Decontaminate.contaminationReport(train, "doc_id", "text",
        evalSet, "doc_id", "text", n = 8)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val byId = r.map(x => x.getLong(0) ->
      (x.getAs[Long]("n_shared_grams"), x.getAs[Long]("n_eval_docs"))).toMap
    assert(byId(1L)._2 == 1L) // overlaps only eval 100
    assert(byId(2L)._2 == 2L) // overlaps both eval docs
    assert(byId(2L)._1 > byId(1L)._1)
  }

  test("decontaminate drops flagged docs and keeps the rest intact") {
    val r = Decontaminate.decontaminate(train, "doc_id", "text",
        evalSet, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().sorted
    assert(r.toSeq == Seq(3L, 4L))
  }

  test("bloomContaminationFlags: no false negatives, every doc flagged") {
    val exactIds = Decontaminate.contaminationReport(train, "doc_id",
        "text", evalSet, "doc_id", "text", n = 8)
      .select("doc_id").as[Long].collect().toSet
    val flags = Decontaminate.bloomContaminationFlags(train, "doc_id",
        "text", evalSet, "doc_id", "text", n = 8)
      .as[(Long, Boolean)].collect().toMap
    // the Bloom guarantee: exactly-contaminated ⇒ bloom-hit
    exactIds.foreach(id => assert(flags(id), s"doc $id missed"))
    // and the flag frame is total over the train side
    assert(flags.keySet ==
      train.select("doc_id").as[Long].collect().toSet)
  }

  test("fuzzyContaminationReport flags near-copies, skips unrelated docs") {
    val evalDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away home"))
      .toDF("doc_id", "text")
    val trainDocs = Seq(
      // one word changed: 9 of 12 3-shingles shared → J = 9/15 = 0.6
      (10L, "the quick brown fox jumps over the lazy dog and walks far away home"),
      (11L, "completely different content about spark engines and data pipelines today"))
      .toDF("doc_id", "text")
    val r = Decontaminate.fuzzyContaminationReport(trainDocs, "doc_id",
        "text", evalDocs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2))))
      .toMap
    assert(r == Map(10L -> ((1L, 0.6))))
  }

  test("scrubPii redacts emails and phone numbers, leaves clean text") {
    val r = Seq(
      ("reach me at jane.doe+spam@sub.example.co.uk thanks", true),
      ("call (555) 867-5309 after five", true),
      ("no identifiers in this one", false)
    ).toDF("text", "dirty")
      .select(col("dirty"), TextAnalysis.scrubPii(col("text")).as("out"))
      .collect()
    assert(r.filter(_.getBoolean(0)).forall(_.getString(1).contains("[PII]")))
    assert(r.filter(_.getBoolean(0)).forall(x =>
      !x.getString(1).contains("@") && !x.getString(1).contains("(555)")))
    assert(r.filter(!_.getBoolean(0))
      .forall(_.getString(1) == "no identifiers in this one"))
  }

  test("containmentReport: an eval doc embedded in a bigger train doc " +
      "scores 1.0 where Jaccard would dilute") {
    val evalDoc = "alpha beta gamma delta"           // 2 distinct 3-grams
    val train = Seq(
      (100L, s"x1 x2 x3 x4 x5 $evalDoc y1 y2 y3 y4 y5"), // fully contains
      (101L, "alpha beta gamma nope"),                   // 1 of 2 grams
      (102L, "entirely unrelated words here")).toDF("doc_id", "text")
    val eval = Seq((1L, evalDoc)).toDF("doc_id", "text")
    val out = Decontaminate.containmentReport(
        train, "doc_id", "text", eval, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shared_grams"), r.getAs[Double]("containment"))))
      .toMap
    assert(out(100L) == ((2L, 1.0)))
    assert(out(101L) == ((1L, 0.5)))
    assert(!out.contains(102L)) // zero overlap → no pair row
  }

  test("containmentReport is exact-dedup-first: every twin of a " +
      "contaminated text gets its own pair row") {
    // the distinct-text path featurizes one rep per content hash; the
    // matched pairs must re-expand to all member doc ids, and a doc
    // whose text also repeats grams in-row must still count each gram
    // once (array_distinct, not explode+distinct)
    val evalDoc = "alpha beta gamma delta"
    val train = Seq(
      (100L, s"$evalDoc pad1 alpha beta gamma delta"), // grams repeat in-row
      (200L, s"$evalDoc pad1 alpha beta gamma delta"), // exact twin of 100
      (300L, "entirely unrelated words here")).toDF("doc_id", "text")
    val eval = Seq((1L, evalDoc)).toDF("doc_id", "text")
    val out = Decontaminate.containmentReport(
        train, "doc_id", "text", eval, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_shared_grams"), r.getAs[Double]("containment"))))
      .toMap
    assert(out(100L) == ((2L, 1.0)))
    assert(out(200L) == ((2L, 1.0)))
    assert(!out.contains(300L))
    assert(out.size == 2)
  }
}
