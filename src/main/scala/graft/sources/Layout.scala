package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout operators — the levers that remove shuffles and scan
  * volume at 100 TB before any query runs:
  *
  * - **Bucketing** pre-hash-partitions a table on its join/agg key at
  *   write time; two tables bucketed on the same key with the same
  *   bucket count join WITHOUT a shuffle (each bucket pair is
  *   co-located). This is how the reference's repeated `Email` joins
  *   (main.py:436-444) would be laid out at scale.
  * - **Partitioning** turns equality/range predicates on the partition
  *   column into directory pruning — the scan never opens non-matching
  *   files (`PartitionFilters` in explain, vs `PushedFilters` which
  *   still opens footers).
  */
object Layout {

  /** Write `df` as a bucketed managed table (saveAsTable is required —
    * plain parquet paths can't carry bucket metadata).
    *
    * CRASH IDEMPOTENCE: every caller (bucketedTable, the minhash /
    * winnow index builders) runs the drop-and-rebuild protocol — DROP
    * TABLE IF EXISTS + stale-location delete + this overwrite write —
    * so a build that dies mid-write leaves a table the catalog either
    * never registered or the re-run drops; run-twice ≡ run-once. The
    * batch-identity partition layer (`Similarity.publishDeltaBatch`)
    * is only needed where a DELTA mutates a LIVE layout in place;
    * one-shot table builds heal by rebuilding.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` partitioned by the given columns (low-cardinality keys
    * only — one directory per value). Rows are shuffled onto their
    * partition key first so each directory gets ONE file instead of
    * one per (writer task × key) — without this, a k-directory layout
    * written from t tasks fans out into up to k×t tiny files, and
    * every later read pays the listing/footer cost (the classic
    * small-files trap; at 100 TB it breaks the metadata layer, at
    * bench scale it dominated probe latency).
    */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String], writeTasks: Int = 0): Unit = {
    val cols = partitionCols.map(org.apache.spark.sql.functions.col)
    // writeTasks bounds the writer parallelism: each task opens one
    // parquet writer per partition value it holds and the commit
    // protocol moves every produced file, so a small layout written
    // from the full shuffle width pays task+commit overhead for no
    // I/O benefit. 0 = default shuffle width (the right choice when
    // the data volume, not the directory count, is the cost).
    val keyed =
      if (writeTasks > 0) df.repartition(writeTasks, cols: _*)
      else df.repartition(cols: _*)
    keyed.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Z-order (Morton) curve value over `dims` non-negative integer
    * columns, `bits` bits each: bit i of dimension d lands at position
    * i·dims + d, so close (x, y, …) points get close z values and ONE
    * range sort clusters ALL dimensions at once. The whole thing is
    * plain shift/mask/or built-ins — one codegen'd expression, no UDF
    * — and the identical arithmetic is expressible in portable SQL
    * (see q85's oracle). Callers quantize real columns into the
    * [0, 2^bits) grid first (e.g. `pmod`, bucketized timestamps).
    */
  def zValue(bits: Int, dims: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftleft, shiftright}
    require(dims.nonEmpty && bits * dims.size <= 62,
      s"z-value of ${dims.size} dims x $bits bits overflows a long")
    val n = dims.size
    val terms = for {
      (c, d) <- dims.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` Z-ordered on the given pre-quantized dimension
    * columns: range-partition + sort on the Morton value, so every
    * output file covers a small hyper-rectangle of the dimension
    * space and a multi-dimensional range predicate prunes files/row
    * groups by parquet min/max stats — the multi-column analogue of
    * [[writeShards]]'s single-key clustering (a plain sort clusters
    * one dimension and scatters the rest). This is the scan-volume
    * lever for "WHERE x BETWEEN … AND y BETWEEN …" workloads at
    * 100 TB.
    */
  def writeZOrdered(df: DataFrame, path: String, bits: Int,
      dimCols: Seq[String], numShards: Int): Unit =
    // the Morton key is derivable layout metadata, not data: range-
    // partition and sort on it, then project it away before the write
    // (persisting it would cost 8 bytes/row at 100 TB and go stale on
    // any rewrite with different bits/dims). The projection after the
    // sort is narrow — per-partition order survives into the files.
    df.withColumn("__z",
        zValue(bits, dimCols.map(org.apache.spark.sql.functions.col)))
      .repartitionByRange(numShards, org.apache.spark.sql.functions.col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .parquet(path)

  /** Export train-ready shards: range-partition on `orderCol` into
    * `numShards` globally-ordered, disjoint-range files (shard k holds
    * keys strictly below shard k+1's), each capped at
    * `maxRecordsPerFile` rows (0 = uncapped). This is the final
    * "corpus → training shards" step: a trainer streams shard files in
    * key order with no further shuffle, and the range partitioning
    * samples the key distribution so skewed keys still yield balanced
    * shards — a hash layout would interleave keys across every file.
    */
  def writeShards(df: DataFrame, path: String, orderCol: String,
      numShards: Int, maxRecordsPerFile: Int = 0): Unit =
    df.repartitionByRange(numShards,
        org.apache.spark.sql.functions.col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .parquet(path)

  /** Small-file compaction: rewrite a parquet directory into files of
    * roughly `targetFileBytes` — the maintenance job every
    * incrementally-written table needs (streaming sinks, per-batch
    * ingests, and over-parallel writers all shed thousands of tiny
    * files, and each one costs a listing entry + footer read on EVERY
    * later scan; at 100 TB that breaks the metadata layer before it
    * slows the I/O). The target file count comes from the directory's
    * real byte size (filesystem metadata — no data scan), and the
    * rewrite uses `coalesce`, which UNIONS input splits into writer
    * tasks without a shuffle — compaction moves every byte once, and
    * only once. Returns the file count written.
    *
    * Row-group caveat: coalesce preserves existing row order per
    * file; it does not re-sort. Re-clustering belongs to
    * [[writeShards]]/[[writeZOrdered]], not here.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetFileBytes > 0,
      s"targetFileBytes must be positive, got $targetFileBytes")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // filesystem-qualified ANCESTRY check, not just equality: writing
    // INTO an ancestor of the input recursively deletes the input
    // before the lazy read executes, and writing into a descendant
    // makes later scans of the input double-count the compacted copy —
    // both are the in-place hazard in different spellings
    val qi = fs.makeQualified(p).toString
    val qo = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath)).toString
    require(qi != qo && !qi.startsWith(qo + "/") && !qo.startsWith(qi + "/"),
      "compact cannot overwrite (or nest within) its input")
    val it = fs.listFiles(p, true)
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) bytes += f.getLen
    }
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
      .min(Int.MaxValue).toInt
    spark.read.parquet(inPath)
      .coalesce(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  // ---- cached bucketed twins of the testdata tables -----------------

  private val bktCache = new graft.SessionCache[String]

  private def md5Hex8(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString

  /** A bucketed twin of testdata table `table`, built once per
    * (session, sfDir) and cached — the one-time layout job a
    * deployment runs beside the corpus (the ANN-index pattern), after
    * which every same-key join is shuffle-free. Returns the catalog
    * table name. The in-memory catalog is per-JVM but the warehouse
    * directory persists, so stale locations are cleared before the
    * (managed-table) write.
    */
  def bucketedTable(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      table: String, keys: Seq[String], numBuckets: Int): String = {
    // the layout identity is (source, keys, bucket count) — a second
    // caller asking for a DIFFERENT bucketing of the same table must
    // get its own build, not the first one's (whose join key would
    // silently reintroduce the shuffle the layout exists to remove)
    val spec = s"$sfDir/$table/${keys.mkString(",")}/$numBuckets"
    val name = s"graft_bkt_${table}_${md5Hex8(spec)}"
    bktCache.get(spark, spec) {
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
      writeBucketed(graft.Tables(spark, sfDir, table), name, keys, numBuckets)
      name
    }
  }
}
