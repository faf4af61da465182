package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's source/sink surface (SURVEY.md §2.1) rebuilt on
  * Spark's native readers/writers. Citations to /root/reference/main.py.
  */
object CsvJsonIO {

  /** S1/S2 — CSV scan with header, all-string semantics (the reference
    * reads with inference then coerces to strings via fillna —
    * main.py:199-202, 373; an explicit all-string schema skips the
    * inference pass entirely, which at 100 TB avoids reading the data
    * twice). `multiLine` handles quoted embedded newlines (headers
    * and cells).
    */
  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None, multiLine: Boolean = true): DataFrame = {
    val r = spark.read.option("header", "true")
      .option("multiLine", multiLine.toString)
    schema.fold(r)(s => r.schema(s)).csv(path)
  }

  /** S3 — JSON-records source (the GSheet `get_all_records()` payload
    * shape, main.py:133-134, 152): one JSON object per record, parsed
    * by Spark's JSON reader with schema inference over the records
    * Dataset — no network connector, the transport is the caller's.
    */
  def fromJsonRecords(spark: SparkSession, records: Dataset[String]): DataFrame =
    spark.read.json(records)

  def fromJsonRecords(spark: SparkSession, records: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(records))
  }

  /** S7 — full CSV sink (main.py:638-639). Partitioned output is the
    * scale form; `single = true` reproduces the reference's one-file
    * shape for bounded results (driver-mandated verify sinks only —
    * never inside a timed path).
    */
  def writeCsv(df: DataFrame, path: String, single: Boolean = false): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** S8 — sample sink: deterministic first-N by sort key
    * (main.py:636-641 writes head(10000); head order in pandas is load
    * order — here the caller names the key that defines "first").
    */
  def writeSample(df: DataFrame, path: String, orderKey: String,
      n: Int = 10000): Unit =
    df.orderBy(col(orderKey)).limit(n)
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** JSONL (one JSON object per line) sink/source round-trip — the
    * interchange format most training-data tooling consumes. The sink
    * shards by `orderCol` range so files are globally ordered and
    * disjoint (the Layout.writeShards layout, in text form); the
    * source is Spark's native JSON reader (splittable — JSONL scans
    * parallelize by file split, unlike multi-line JSON).
    */
  def writeJsonl(df: DataFrame, path: String, orderCol: String,
      numShards: Int): Unit =
    df.repartitionByRange(numShards, col(orderCol))
      .sortWithinPartitions(orderCol)
      // keep null fields: the default writer omits them, and a column
      // that happens to be all-null (an optional annotation) would
      // vanish from the round-trip's inferred schema entirely
      .write.mode("overwrite").option("ignoreNullFields", false).json(path)

  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S9 — per-column distinct-value sinks (main.py:458-473): one CSV
    * per (name, frame) pair, as produced by
    * `CrmPipeline.multiChoiceLists`. File-system-safe directory names.
    */
  def writeDistinctLists(lists: Seq[(String, DataFrame)], dir: String): Unit =
    lists.foreach { case (name, df) =>
      val safe = name.replaceAll("[^A-Za-z0-9._-]", "_")
      df.orderBy(df.columns.map(col): _*)
        .coalesce(1).write.mode("overwrite").option("header", "true")
        .csv(s"$dir/$safe")
    }
}
