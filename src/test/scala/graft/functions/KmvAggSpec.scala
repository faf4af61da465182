package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvAggSpec extends SparkSpec {
  import spark.implicits._

  test("kmvSketch keeps the k smallest DISTINCT hashes, sorted") {
    val df = Seq(50L, 10L, 30L, 10L, 40L, 20L, 30L, 60L).toDF("h")
    val sk = df.agg(KmvAgg.kmvSketch(4)(col("h"))).head().getSeq[Long](0)
    assert(sk == Seq(10L, 20L, 30L, 40L))
  }

  test("kmvSketch below k is the full distinct set (exact regime)") {
    val df = Seq(7L, 3L, 7L).toDF("h")
    val sk = df.agg(KmvAgg.kmvSketch(8)(col("h"))).head().getSeq[Long](0)
    assert(sk == Seq(3L, 7L))
  }

  test("sketch is merge-order invariant: bottom-k of the union equals " +
      "the merge of per-group bottom-ks, at any partitioning") {
    val vals = (1 to 500).map(i => (i % 7, (i.toLong * 2654435761L) %
      4294967296L))
    val df = vals.toDF("g", "h")
    val direct = df.agg(KmvAgg.kmvSketch(16)(col("h")))
      .head().getSeq[Long](0)
    // merge path: per-group sketches, exploded and re-aggregated
    val merged = df.groupBy("g")
      .agg(KmvAgg.kmvSketch(16)(col("h")).as("sk"))
      .select(explode(col("sk")).as("h"))
      .agg(KmvAgg.kmvSketch(16)(col("h")))
      .head().getSeq[Long](0)
    assert(merged == direct)
    // and both equal the brute-force bottom-16 of the distinct set
    assert(direct == vals.map(_._2).distinct.sorted.take(16).toSeq)
    // repartitioning (different partial/merge order) changes nothing
    val shuffled = df.repartition(13).agg(KmvAgg.kmvSketch(16)(col("h")))
      .head().getSeq[Long](0)
    assert(shuffled == direct)
  }
}
