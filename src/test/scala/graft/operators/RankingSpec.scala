package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The distributed rank frame must agree EXACTLY with the window
  * operators it replaces (rank, average rank, percent_rank, NTILE) —
  * the whole point is a bit-identical result without the per-group
  * single-task sort.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  // groups of very different sizes, duplicates, negatives, a singleton
  private lazy val df = Seq(
    ("a", 3.0), ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 7.5),
    ("a", -1.0), ("a", 3.0), ("a", 3.0),
    ("b", 5.0), ("b", 5.0), ("b", 5.0),
    ("c", 42.0)
  ).toDF("g", "v")

  private lazy val rf = Ranking.rankFrame(df, "g", "v")

  test("rank frame matches RANK() and peer counts exactly") {
    val got = rf.select($"g", $"v", ($"cum_prev" + 1).as("rk"), $"cnt")
      .as[(String, Double, Long, Long)].collect().toSet
    val want = df
      .withColumn("rk", rank().over(Window.partitionBy("g").orderBy("v"))
        .cast("long"))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy("g", "v")))
      .distinct()
      .as[(String, Double, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("n_grp is the group size") {
    val got = rf.select($"g", $"n_grp").distinct()
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 8L, "b" -> 3L, "c" -> 1L))
  }

  test("average rank matches the window tie convention") {
    val got = rf.select($"g", $"v", Ranking.avgRank.as("ar"))
      .as[(String, Double, Double)].collect().toSet
    val want = df.select($"g", $"v",
        (rank().over(Window.partitionBy("g").orderBy("v")) +
          (count(lit(1)).over(Window.partitionBy("g", "v")) - 1) / 2.0)
          .as("ar"))
      .distinct().as[(String, Double, Double)].collect().toSet
    assert(got == want)
  }

  test("percent_rank matches Spark's, including the singleton group") {
    val got = rf.select($"g", $"v", Ranking.percentRank.as("pr"))
      .as[(String, Double, Double)].collect().toSet
    val want = df.select($"g", $"v",
        percent_rank().over(Window.partitionBy("g").orderBy("v")).as("pr"))
      .distinct().as[(String, Double, Double)].collect().toSet
    assert(got == want)
  }

  test("analytic NTILE buckets reproduce the window NTILE distribution") {
    for (k <- Seq(2, 3, 4, 5)) {
      val buckets = Ranking.ntileBuckets(rf, "g", k)
        .withColumnRenamed("g", "bg")
      val got = rf.join(buckets,
          rf("g") === buckets("bg") &&
            rf("cum_prev") < buckets("e") &&
            (rf("cum_prev") + rf("cnt")) >= buckets("s"))
        .groupBy($"g", $"q")
        .agg((first($"e") - first($"s") + 1).as("n"),
          min($"v").as("lo"), max($"v").as("hi"))
        .as[(String, Int, Long, Double, Double)].collect().toSet
      val want = df.select($"g", $"v",
          ntile(k).over(Window.partitionBy("g").orderBy("v")).as("q"))
        .groupBy($"g", $"q")
        .agg(count(lit(1)).as("n"), min($"v").as("lo"), max($"v").as("hi"))
        .as[(String, Int, Long, Double, Double)].collect().toSet
      assert(got == want, s"k=$k")
    }
  }

  test("many groups across many partitions still prefix-sum correctly") {
    // forces multiple range partitions per group AND multiple groups
    // per partition so the (partition, group-run) offset bookkeeping
    // is load-bearing
    val big = spark.range(0, 5000)
      .select((col("id") % 7).cast("string").as("g"),
        (col("id") % 211).cast("double").as("v"))
    val got = Ranking.rankFrame(big, "g", "v")
      .select($"g", $"v", ($"cum_prev" + 1).as("rk"))
      .as[(String, Double, Long)].collect().toSet
    val want = big
      .withColumn("rk", rank().over(Window.partitionBy("g").orderBy("v"))
        .cast("long"))
      .distinct().as[(String, Double, Long)].collect().toSet
    assert(got == want)
  }

  test("empty input yields an empty rank frame") {
    val empty = df.filter($"v" > 1e9)
    assert(Ranking.rankFrame(empty, "g", "v").count() == 0L)
  }
}
