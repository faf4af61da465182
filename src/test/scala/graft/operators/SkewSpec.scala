package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salting must be a pure execution-strategy change: results identical
  * to the direct forms, on a deliberately skewed dataset (90% of rows
  * share one key).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val skewed = {
    val hot = (1 to 900).map(i => ("hot", i.toLong, i * 1.0))
    val cold = (1 to 100).map(i => (s"k$i", i.toLong, i * 2.0))
    (hot ++ cold).toDF("k", "id", "v")
  }

  test("saltedCountSum equals direct groupBy count/sum") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .orderBy("k").as[(String, Long, Double)].collect()
    val salted = Skew.saltedCountSum(skewed, Seq("k"), "v",
        buckets = 8, saltFrom = col("id"))
      .orderBy("k").as[(String, Long, Double)].collect()
    assert(salted.toSeq == direct.toSeq)
  }

  test("saltedJoin equals direct join, inner and left") {
    val dim = Seq(("hot", "H"), ("k1", "K1"), ("k2", "K2"), ("missing", "M"))
      .toDF("k", "label")
    for (jt <- Seq("inner", "left")) {
      val direct = skewed.join(dim, Seq("k"), jt)
        .select("k", "id", "label")
        .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))
      val salted = Skew.saltedJoin(skewed, dim, "k", col("id"), 8, jt)
        .select("k", "id", "label")
        .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))
      assert(salted.toSeq == direct.toSeq, s"join type $jt")
    }
  }

  test("approx_count_distinct within rsd of exact") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val approx = li.agg(approx_count_distinct(col("l_partkey"), 0.02))
      .as[Long].head().toDouble
    val exact = li.select(countDistinct(col("l_partkey")))
      .as[Long].head().toDouble
    assert(math.abs(approx - exact) / exact < 0.1)
  }

  test("saltedJoin accepts semi/anti aliases, rejects right outer") {
    val dim = Seq(("hot", "H")).toDF("k", "label")
    assert(Skew.saltedJoin(skewed, dim, "k", col("id"), 4, "semi").count() ==
      skewed.join(dim, Seq("k"), "semi").count())
    assertThrows[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, "k", col("id"), 4, "right")
    }
  }
}
