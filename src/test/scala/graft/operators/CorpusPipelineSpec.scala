package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The q175 composition's stage-boundary invariants: every stage must
  * be observable in the output (the oracle pins exact values; these
  * pin WHY the values come out that way), and the plan must keep the
  * scale-critical shapes across the stage seams.
  */
class CorpusPipelineSpec extends SparkSpec {

  private lazy val docs =
    Tables(spark, sf, "documents").select("doc_id", "source", "text")

  /** The q175 fixture: corpus ∪ markup-wrapped copies (+1e6, every 3rd
    * doc) ∪ one-token-appended near-dup copies (+2e6, every 7th doc).
    */
  private lazy val corpus = docs
    .unionAll(docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        concat(lit("<div> "), col("text"), lit(" </div>")).as("text")))
    .unionAll(docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("source"),
        concat(col("text"), lit(" postscript")).as("text")))

  private lazy val curated = CorpusPipeline.curate(
      corpus, "doc_id", "text",
      docs.filter(col("doc_id") < 20), "doc_id", "text")
    .persist()

  test("every planted duplicate class collapses at its stage") {
    assert(curated.count() > 0)
    // markup-wrapped re-ingestions: clean normalizes them back to the
    // original text, exact dedup keeps the min id — never the copy
    assert(curated.filter(col("doc_id") >= 1000000L &&
      col("doc_id") < 2000000L).count() === 0)
    // near-dup copies: different hash, Jaccard ≥ 3/5 — the components
    // stage elects the original (min id) as representative
    assert(curated.filter(col("doc_id") >= 2000000L).count() === 0)
  }

  test("decontamination removes the eval slice and its sharers") {
    // eval docs share all their own 5-grams — none may survive
    assert(curated.filter(col("doc_id") < 20).count() === 0)
  }

  test("survivors are component representatives with a total split") {
    assert(curated.filter(col("comp") =!= col("doc_id")).count() === 0)
    val splits = curated.select("split").distinct()
      .collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(curated.filter(col("pack_id") < 0).count() === 0)
    // packing is contiguous per (split, source): pack_id of the first
    // doc in every group is 0
    val firsts = curated
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("split", "source").orderBy("doc_id")))
      .filter(col("__rn") === 1)
    assert(firsts.filter(col("pack_id") =!= 0).count() === 0)
  }

  test("the post-components tail keeps the broadcast anti-join shape") {
    // a fresh (un-persisted) construction: the executedPlan of the
    // cached frame above would hide the join inside InMemoryTableScan
    val p = CorpusPipeline.curate(corpus, "doc_id", "text",
        docs.filter(col("doc_id") < 20), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }
}
