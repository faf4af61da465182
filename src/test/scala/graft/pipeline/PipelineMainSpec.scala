package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.CsvJsonIO

/** Drives the CLI lifecycle end-to-end on the reference-shaped
  * fixtures: all four sink families land on disk with the right
  * contents.
  */
class PipelineMainSpec extends SparkSpec {

  test("run(): full, sample, audit and distinct-list sinks written") {
    val out = Files.createTempDirectory("graft_pipe_out").toString
    val base = "src/test/resources/crm"
    PipelineMain.run(spark,
      dataCsv = s"$base/crm.csv",
      stmCsv = s"$base/stm.csv",
      relsCsv = s"$base/religions.csv",
      outDir = out,
      repDataPaths = Seq("Checkbox1" -> s"$base/repdata_checkbox1.csv"),
      emailCol = "Email",
      expectShape = Some((8L, 17)))

    val full = CsvJsonIO.readCsv(spark, s"$out/output")
    assert(full.count() == 6) // 8 rows minus 2 test rows (exempt row kept)
    assert(full.columns.contains("tags"))

    val removed = CsvJsonIO.readCsv(spark, s"$out/deleted_test_rows")
    assert(removed.select("Email").collect().map(_.getString(0)).toSet ==
      Set("dave@x.com", "gus@x.com"))

    val sample = CsvJsonIO.readCsv(spark, s"$out/sample_output")
    assert(sample.count() == 6)

    val lists = new java.io.File(s"$out/custom_fields").listFiles().map(_.getName)
    assert(lists.toSet ==
      Set("Are_you_a_person_of_faith_", "Checkbox1"))

    // merge-audit channel: concat/take rows + per-step counters
    val audit = CsvJsonIO.readCsv(spark, s"$out/merge_audit")
    assert(audit.count() == 3)
    assert(audit.filter(audit("mode") === "concat")
      .select("key").collect().map(_.getString(0)).toSeq == Seq("fay@x.com"))
    val counters = CsvJsonIO.readCsv(spark, s"$out/merge_counters")
      .collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(counters == Set(("concat", "1"), ("take", "2")))

    // S6 schema-reconciliation report files (main.py:238-247)
    val dataOnly = CsvJsonIO.readCsv(spark, s"$out/cols_in_data_not_meta")
      .collect().map(_.getString(0)).toSeq
    assert(dataOnly == Seq("UnmappedCol"))
    val metaOnly = CsvJsonIO.readCsv(spark, s"$out/cols_in_meta_not_data")
      .collect().map(_.getString(0)).toSeq
    assert(metaOnly == Seq("MetaOnlyCol"))
  }
}
