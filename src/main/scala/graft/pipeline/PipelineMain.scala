package graft.pipeline

import org.apache.spark.sql.SparkSession

import graft.sources.CsvJsonIO

/** The reference's CLI (`python main.py`, /root/reference/main.py:
  * 650-688) as a Spark application: load metadata snapshots, run the
  * pipeline, write the full/sample/audit/distinct-list sinks, print the
  * per-stage report the reference logs for its human reviewer.
  *
  * Usage:
  *   PipelineMain <dataCsv> <stmCsv> <relsCsv> <outDir>
  *     [--repdata col=csvPath ...] [--email-col NAME]
  *     [--expect-shape ROWSxCOLS]
  *
  * E2 (--meta, GSheet fetch) is out of scope (network); its parse stage
  * is `CsvJsonIO.fromJsonRecords`. E3 (--setup) is filesystem prep the
  * caller owns.
  */
object PipelineMain {

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: PipelineMain <dataCsv> <stmCsv> <relsCsv> <outDir> " +
        "[--repdata col=csv ...] [--email-col NAME] [--expect-shape RxC]")
    val Array(dataCsv, stmCsv, relsCsv, outDir) = args.take(4)
    val rest = args.drop(4)
    val repData = rest.sliding(2, 2).collect {
      case Array("--repdata", spec) =>
        val Array(c, p) = spec.split("=", 2)
        (c, p)
    }.toSeq
    val emailCol = rest.sliding(2, 2).collectFirst {
      case Array("--email-col", v) => v }.getOrElse("Email")
    val expectShape = rest.sliding(2, 2).collectFirst {
      case Array("--expect-shape", v) =>
        val Array(r, c) = v.split("x", 2); (r.toLong, c.toInt)
    }

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]"))
      .appName("graft-crm-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    try run(spark, dataCsv, stmCsv, relsCsv, outDir, repData, emailCol,
      expectShape)
    finally spark.stop()
  }

  /** The E1 lifecycle (main.py:654-684), one lazy plan + sinks. */
  def run(spark: SparkSession, dataCsv: String, stmCsv: String,
      relsCsv: String, outDir: String, repDataPaths: Seq[(String, String)],
      emailCol: String, expectShape: Option[(Long, Int)]): Unit = {

    def log(s: String): Unit = println(s"[pipeline] $s")

    val raw = CsvJsonIO.readCsv(spark, dataCsv)
    val data = CrmPipeline.normalizeHeaders(raw)
    expectShape.foreach { case (r, c) =>
      CrmPipeline.assertShape(data, r, c)
      log(s"shape ok: $r x $c")
    }

    val stm = Stm.fromDataFrame(CsvJsonIO.readCsv(spark, stmCsv))
    stm.validate()
    // S6 report sinks (main.py:238-247): both column diffs go to CSV
    // files for the human reviewer, not just the log.
    val (dataOnly, metaOnly) = CrmPipeline.reconcileSchema(data, stm)
    if (dataOnly.nonEmpty) log(s"data cols missing from meta: ${dataOnly.mkString(", ")}")
    if (metaOnly.nonEmpty) log(s"meta cols missing from data: ${metaOnly.mkString(", ")}")
    import spark.implicits._
    CsvJsonIO.writeCsv(dataOnly.toDF("column_in_data_not_meta"),
      s"$outDir/cols_in_data_not_meta", single = true)
    CsvJsonIO.writeCsv(metaOnly.toDF("column_in_meta_not_data"),
      s"$outDir/cols_in_meta_not_data", single = true)

    val rels = CsvJsonIO.readCsv(spark, relsCsv)
    val repData = repDataPaths.map { case (c, p) =>
      c -> CsvJsonIO.readCsv(spark, p) }

    val result = CrmPipeline.run(
      data = raw,
      stm = stm,
      testExempt = CrmCleanups.testExemption(data),
      fixes = CrmCleanups.fixes,
      mappings =
        if (data.columns.contains("Are you a person of faith?"))
          Seq(("Are you a person of faith?", rels,
            "Values in Data", "Replacement Values"))
        else Seq.empty,
      emailCol = emailCol,
      repData = repData)

    // The sinks fire multiple actions — persist the shared cleaned
    // frame (ancestor of the output AND every distinct-list plan, so
    // cache substitution serves them all) plus the two frames that are
    // themselves counted after writing.
    val cleaned = result.cleaned.persist()
    val output = result.output.persist()
    val removed = result.removedTestRows.persist()
    try {
      // S10 — audit sink of removed test rows (main.py:290-293)
      CsvJsonIO.writeCsv(removed, s"$outDir/deleted_test_rows", single = true)
      log(s"deleted test rows: ${removed.count()}")

      // S9 — per-column distinct lists (main.py:458-473)
      CsvJsonIO.writeDistinctLists(result.multiChoice, s"$outDir/custom_fields")
      log(s"multi-choice lists: ${result.multiChoice.map(_._1).mkString(", ")}")

      // Merge-audit channel (main.py:578-628): concat/take rows with
      // the row's email + before/after values, and per-step counters.
      val audit = result.mergeAudit.persist()
      CsvJsonIO.writeCsv(audit, s"$outDir/merge_audit", single = true)
      CsvJsonIO.writeCsv(CrmPipeline.mergeCounters(audit)
          .orderBy("target", "from_col", "mode"),
        s"$outDir/merge_counters", single = true)
      log(s"merge audit rows: ${audit.count()}")
      audit.unpersist()

      // S7/S8 — full + sample output (main.py:631-647)
      CsvJsonIO.writeCsv(output, s"$outDir/output", single = true)
      val key = output.columns.head
      CsvJsonIO.writeSample(output, s"$outDir/sample_output", key)
      log(s"rows out: ${output.count()} (full + 10k sample by $key)")
    } finally {
      output.unpersist()
      removed.unpersist()
      cleaned.unpersist()
    }
  }
}
