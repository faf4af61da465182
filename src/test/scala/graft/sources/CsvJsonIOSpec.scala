package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CsvJsonIOSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_io").toString

  test("CSV sink/scan round-trip preserves rows and header") {
    val dir = tmp() + "/out"
    val df = Seq((1L, "a,b", "x\ny"), (2L, "plain", "z"))
      .toDF("id", "with_comma", "with_newline")
    CsvJsonIO.writeCsv(df.orderBy("id"), dir, single = true)
    val back = CsvJsonIO.readCsv(spark, dir)
    val rows = back.orderBy("id")
      .as[(String, String, String)].collect()
    assert(back.columns.toSeq == Seq("id", "with_comma", "with_newline"))
    assert(rows.toSeq == Seq(("1", "a,b", "x\ny"), ("2", "plain", "z")))
  }

  test("sample sink writes first-N by key") {
    val dir = tmp() + "/sample"
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    CsvJsonIO.writeSample(df, dir, "id", n = 7)
    val back = CsvJsonIO.readCsv(spark, dir)
    assert(back.count() == 7)
    assert(back.select(max(col("id").cast("long"))).as[Long].head() == 7L)
  }

  test("JSON records source parses GSheet-shaped payloads (main.py:133-134)") {
    val records = Seq(
      """{"fullColName": "Email", "IN SCOPE": "T", "Tag?": "F"}""",
      """{"fullColName": "City", "IN SCOPE": "F", "Tag?": "T"}""")
    val df = CsvJsonIO.fromJsonRecords(spark, records)
    assert(df.columns.sorted.toSeq == Seq("IN SCOPE", "Tag?", "fullColName"))
    assert(df.filter(col("fullColName") === "Email")
      .select("IN SCOPE").as[String].head() == "T")
  }

  test("distinct-list sinks write one CSV dir per column, fs-safe names") {
    val dir = tmp() + "/lists"
    val lists = Seq(
      "Are you a person of faith?" -> Seq("A", "B").toDF("v"),
      "Checkbox/1" -> Seq("X").toDF("v"))
    CsvJsonIO.writeDistinctLists(lists, dir)
    val subdirs = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(subdirs.toSeq == Seq("Are_you_a_person_of_faith_", "Checkbox_1"))
    assert(CsvJsonIO.readCsv(spark, s"$dir/Checkbox_1")
      .as[String].collect().toSeq == Seq("X"))
  }

  test("JSONL round-trip: ordered disjoint shards, one object per line") {
    val dir = tmp() + "/jsonl"
    val df = (1L to 100L).map(i => (i, s"doc $i")).toDF("id", "text")
    CsvJsonIO.writeJsonl(df, dir, "id", numShards = 4)
    val back = CsvJsonIO.readJsonl(spark, dir)
    assert(back.count() == 100 &&
      df.exceptAll(back.select("id", "text")).isEmpty)
    // shards are range-disjoint: per-file (min, max) intervals don't
    // overlap — a trainer can stream files in key order
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json")).sortBy(_.getName)
    assert(parts.length == 4)
    val ranges = parts.map { f =>
      val ids = scala.io.Source.fromFile(f).getLines()
        .map(l => """"id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
        .toSeq
      assert(ids == ids.sorted) // ordered within the shard
      (ids.min, ids.max)
    }
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, s"overlapping shard ranges: $hi >= $lo")
    }
  }

  test("JSONL round-trip keeps a column that is null in every row") {
    val dir = tmp() + "/jsonl_nulls"
    val df = Seq((1L, None: Option[String]), (2L, None: Option[String]))
      .toDF("id", "label")
    CsvJsonIO.writeJsonl(df, dir, "id", numShards = 1)
    val back = CsvJsonIO.readJsonl(spark, dir)
    // default writer would omit null fields and the inferred schema
    // would lose 'label' entirely
    assert(back.columns.toSet == Set("id", "label"))
    assert(back.filter(col("label").isNull).count() == 2)
  }
}
