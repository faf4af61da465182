package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-rehearsal data generator (r13 verdict #6): the 100× rehearsal
  * scales VOLUME but keeps the testdata's benign key distributions, so
  * the skew machinery (AQE skew-join splitting, [[graft.operators.Skew
  * .saltedJoin]], the composite-key window conventions) is proven
  * correct but economically unmeasured. This tool rewrites a testdata
  * directory into a genuinely Zipfian-headed variant:
  *
  *   - `events`: ~30% of rows remapped onto ONE existing user_id —
  *     every user-keyed window/session/interval operator now has a
  *     single key owning a third of the fact table;
  *   - `lineitem`: ~30% of rows remapped onto ONE existing o_orderkey
  *     — the orders⋈lineitem family (plain, salted, bucketed) now has
  *     a hot join key whose matches dwarf every other reducer;
  *   - `customer` (r15, the warehouse-family rehearsal): ~30% of
  *     customers' name-digit suffixes rewritten onto ONE linkage
  *     block (digits ≡ 0 mod 500, names kept DISTINCT via a dense
  *     rank so no spurious exact-name agreements are planted) — the
  *     q236/q241 Fellegi–Sunter blocking key now has a block holding
  *     ~30% of EACH side (the dirty copy inherits the suffix through
  *     its case corruption), which is exactly the hot-block case the
  *     TopKAgg cap² bound was designed against.
  *
  * Row selection is a deterministic hash of stable columns (never the
  * remapped key itself), so the same rows skew on every run; all other
  * tables copy through unchanged, so any declared query can run
  * against the directory. Results are NOT oracle-comparable (the data
  * changed); the artifact this feeds (BENCH_SKEW.json) is a timing
  * A/B against the same-scale unskewed run (BENCH_SF10.json) via the
  * bench's regression gate — the regression list IS the skew bill.
  *
  * Usage: runMain graft.tools.SkewUp [srcDir] [dstDir] [tenths]
  * (tenths = how many tenths of rows land on the hot key, default 3)
  */
object SkewUp {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/tmp/graft_sf10")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf10_skew")
    val tenths = args.lift(2).map(_.toInt).getOrElse(3)
    require(tenths >= 0 && tenths <= 10, s"tenths in [0,10], got $tenths")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hot keys must EXIST in their dimension so FK joins stay honest
    val hotUser = spark.read.parquet(s"$src/events.parquet")
      .agg(min("user_id")).head().getLong(0)
    val hotOrder = spark.read.parquet(s"$src/orders.parquet")
      .agg(min("o_orderkey")).head().getLong(0)

    spark.read.parquet(s"$src/events.parquet")
      .withColumn("user_id",
        when(pmod(xxhash64(col("event_id")), lit(10)) < tenths, lit(hotUser))
          .otherwise(col("user_id")))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/events.parquet")
    println(s"SKEWUP events: ~${tenths}0% of rows on user $hotUser")

    spark.read.parquet(s"$src/lineitem.parquet")
      .withColumn("l_orderkey",
        when(pmod(xxhash64(col("l_partkey"), col("l_linenumber")), lit(10))
            < tenths, lit(hotOrder))
          .otherwise(col("l_orderkey")))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/lineitem.parquet")
    println(s"SKEWUP lineitem: ~${tenths}0% of rows on order $hotOrder")

    // customer: slam ~tenths/10 of rows onto ONE linkage block. The
    // rewritten digit suffix is (dense rank)·500 — block 0 for every
    // selected row, names still pairwise distinct (a shared literal
    // name would plant exact-name agreements the real corruption
    // model never produces). The single-task rank sort is fine here:
    // this is a one-off generator, not an engine path.
    //
    // The suffix must stay a 9-digit value: the q236/q241 blocking key
    // reads EXACTLY substr(c_name, 10, 9), so rn*500 >= 1e9 (rn >= 2M,
    // i.e. customer counts past ~sf13 when ~30% are selected) would
    // widen the printed name past 9 digits and the planted block
    // silently evaporates — the rehearsal would "pass" while measuring
    // nothing. rn is computed in LONG (IntegerType rn*500 overflows
    // past rn≈4.29M) and the generator REFUSES to emit an out-of-range
    // suffix rather than degrade to an unskewed directory that still
    // claims to be a skew rehearsal (r15 advice).
    val w = org.apache.spark.sql.expressions.Window.orderBy("c_custkey")
    val nCustomers = spark.read.parquet(s"$src/customer.parquet").count()
    require(nCustomers * 500L < 1000000000L,
      s"SkewUp customer rewrite needs rn*500 to fit in 9 digits; " +
        s"$nCustomers customers would widen Customer#%09d past 9 digits " +
        s"and unplant the q236/q241 hot block — derive a different " +
        s"block-0 suffix scheme before running at this scale")
    spark.read.parquet(s"$src/customer.parquet")
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("c_name",
        when(pmod(xxhash64(col("c_custkey")), lit(10)) < tenths,
          format_string("Customer#%09d", col("__rn") * 500L))
          .otherwise(col("c_name")))
      .drop("__rn")
      .repartition(8)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/customer.parquet")
    println(s"SKEWUP customer: ~${tenths}0% of rows on linkage block 0")

    Seq("region", "nation", "supplier", "part", "orders",
        "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      println(s"SKEWUP $t copied")
    }
    spark.stop()
  }
}
