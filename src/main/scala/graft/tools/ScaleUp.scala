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
  * Usage: runMain graft.tools.ScaleUp [srcDir] [dstDir] [factor] \
  *   [tables] [mix]
  *   - tables: optional comma-separated subset (default: all); the
  *     shared dims (region, nation) copy only when named or defaulted
  *   - mix: the literal word `mix` — force the hash-mixed layout at
  *     factor > 100 via bounded CHUNKED generation (100 copies per
  *     chunk, each chunk shuffled independently and appended), so no
  *     single mixing shuffle ever exceeds the 100× volume that fit the
  *     disk budget; without it, factor > 100 streams copy-clustered
  *     (see mixCopies below)
  */
object ScaleUp {

  // key-shift stride per table column; one stride safely above any
  // source key range (testdata keys are dense from 0). Divisible by
  // every small modulus the queries bucket keys with (32, 10, 7 are
  // NOT all divisors — 32 is: 1e8 = 2^8 * 5^8 * ... — specifically
  // Stride % 32 == 0, so (key + k*Stride) % 32 == key % 32 and the
  // z-order bucket distribution survives scaling exactly).
  private val Stride = 100000000L

  // One scan + explode(sequence(off, off+factor-1)), not a factor-way
  // union: a 1000-branch union plan rescans the source per branch and
  // its analysis cost grows with the branch count, while the explode
  // form is a single codegen'd pass whatever the factor. Output
  // multiset is identical to the union form (copy k's keys shifted by
  // k*Stride; `copyOffset` lets chunked callers generate copies
  // [off, off+factor) so chunk appends tile the same key space as one
  // big run). The source is repartitioned BEFORE the explode: a small
  // source reads as one input split, and without the spread the entire
  // factor-times fan-out runs as a single task.
  private[tools] def copies(df: DataFrame, factor: Int,
      keyCols: Seq[String], srcParts: Int, copyOffset: Long = 0L): DataFrame = {
    require(!df.columns.contains("__k"),
      "source table already has a __k column — the copy-index column " +
        "would silently collide")
    val copied = df.repartition(srcParts).withColumn("__k",
      explode(sequence(lit(copyOffset), lit(copyOffset + factor - 1L))))
    copied.select(df.columns.map { c =>
      if (keyCols.contains(c)) (col(c) + col("__k") * lit(Stride)).as(c)
      else col(c)
    }: _*)
  }

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    // optional table subset (comma-separated): a 1000x rehearsal of
    // the volume-linear shapes needs three fact tables, not a full
    // star-schema copy
    val onlyTables = args.lift(3).map(_.split(",").toSet)
    // optional `mix`: force the hash-mixed layout above factor 100 via
    // chunked appends (see the chunk loop below)
    val forceMix = args.lift(4).contains("mix")
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
    // more output files at higher factors so a 1000x table lands in
    // ~200 MB parquet parts instead of 32 oversized ones
    val parts = math.max(32, factor / 16)
    // <= 100x keeps the post-explode repartition: it hash-mixes the
    // copies across output files, the layout the committed 10x/100x
    // chains were measured on. Above that the mixing shuffle is the
    // dominant cost of the WHOLE generation (measured: ~45 GB of
    // shuffle spill for lineitem alone at 1000x) and threatens the
    // disk budget, so the explode streams straight into the parquet
    // writer — each output file then holds every copy of its slice of
    // source rows (copy-clustered). Disclose the layout wherever the
    // resulting directory is benched: identical twins sharing a file
    // dictionary-compress flatteringly, but the queries rehearsed at
    // this scale are shuffle/pair-bound, not scan-bound. Scan-bound
    // rehearsals pass `mix` for the bounded CHUNKED mixing path below
    // instead (honest bytes at any factor, shuffle bounded per chunk).
    val mixCopies = factor <= 100

    keyed.filter(t => onlyTables.forall(_.contains(t._1)))
      .foreach { case (t, keys) =>
        val df = spark.read.parquet(s"$src/$t.parquet")
        if (mixCopies || !forceMix) {
          val scaled = copies(df, factor, keys,
            srcParts = if (mixCopies) 32 else parts)
          (if (mixCopies) scaled.repartition(parts) else scaled)
            .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
        } else {
          // CHUNKED mixing (r16 verdict: the copy-clustered fast path
          // above factor 100 left the SCAN-bound operators with no
          // honest 1000× directory — identical twins sharing a file
          // dictionary-compress flatteringly). Generate 100 copies at
          // a time, hash-mix each chunk independently, and APPEND: the
          // per-chunk shuffle is exactly the 100× volume that fit the
          // disk budget on the committed chains, the chunks tile
          // disjoint copy ranges of the same key space, and every
          // output file holds a hash-random sample of (source row,
          // copy) pairs — the same layout as the committed true-100×
          // directory, repeated. Twins land in the same file only at
          // the birthday rate, so on-disk bytes scale honestly.
          val chunk = 100
          val nChunks = (factor + chunk - 1) / chunk
          val chunkParts = math.max(8, parts / nChunks)
          (0 until nChunks).foreach { c =>
            val n = math.min(chunk, factor - c * chunk)
            copies(df, n, keys, srcParts = 32,
                copyOffset = c.toLong * chunk)
              .repartition(chunkParts)
              .write
              .mode(if (c == 0) SaveMode.Overwrite else SaveMode.Append)
              .parquet(s"$dst/$t.parquet")
            println(s"SCALEUP $t chunk ${c + 1}/$nChunks done")
          }
        }
        println(s"SCALEUP $t x$factor done")
      }
    shared.filter(t => onlyTables.forall(_.contains(t)))
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
        println(s"SCALEUP $t shared done")
      }
    spark.stop()
  }
}
