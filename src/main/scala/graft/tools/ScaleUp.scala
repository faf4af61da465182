package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator: writes an FK-consistent N× copy of
  * an existing testdata directory (default 10× sf0.1 ≈ sf1) so shuffle
  * sizing, AQE behavior, join-strategy flips, and memory pressure can
  * be rehearsed above the largest driver-provided scale — the failure
  * modes invisible at sf0.1 (a broadcast silently becoming a
  * sort-merge join, a window spilling) surface here first.
  *
  * Copy k shifts every join key by k × stride so referential integrity
  * holds within each copy and keys never collide across copies; the
  * small dims (region, nation) are shared, like a real star schema.
  * Content columns (text, embeddings) are left identical across copies
  * ON PURPOSE: a 10× corpus where every doc has 10 exact twins is a
  * dedup/near-dup stress test (bucket sizes grow 10×, pair counts
  * ~45×) that exercises the quadratic guards.
  *
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [factor]
  */
object ScaleUp {

  // key-shift stride per table column; one stride safely above any
  // source key range (testdata keys are dense from 0)
  private val Stride = 100000000L

  private def copies(spark: SparkSession, df: DataFrame, factor: Int,
      keyCols: Seq[String]): DataFrame =
    (0 until factor).map { k =>
      keyCols.foldLeft(df) { (d, c) =>
        d.withColumn(c, col(c) + lit(k * Stride))
      }
    }.reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val keyed: Seq[(String, Seq[String])] = Seq(
      "customer" -> Seq("c_custkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    val shared = Seq("region", "nation")

    keyed.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      copies(spark, df, factor, keys)
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      println(s"SCALEUP $t x$factor done")
    }
    shared.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      println(s"SCALEUP $t shared done")
    }
    spark.stop()
  }
}
