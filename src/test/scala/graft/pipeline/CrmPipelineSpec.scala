package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end pipeline spec over the reference-shaped fixtures
  * (FIXTURES.md §B): pins the exact semantics of
  * /root/reference/main.py — test-row deletion (substring, exemption),
  * the cleanup fix list, religion-map join (unmatched → ''), repData
  * blanking on unmatched email, tag trim+dedup, merge-concat branches,
  * multi-choice distinct lists.
  */
class CrmPipelineSpec extends SparkSpec {

  private def res(name: String): String = s"src/test/resources/crm/$name"

  private def readCsv(path: String, multiLine: Boolean = false): DataFrame = {
    val r = spark.read.option("header", "true")
    (if (multiLine) r.option("multiLine", "true") else r).csv(path)
  }

  private lazy val data = readCsv(res("crm.csv"), multiLine = true)
  private lazy val stm = Stm.fromDataFrame(readCsv(res("stm.csv")))
  private lazy val rels = readCsv(res("religions.csv"))
  private lazy val rep = readCsv(res("repdata_checkbox1.csv"))

  private lazy val result: PipelineResult = CrmPipeline.run(
    data = data,
    stm = stm,
    testExempt = CrmCleanups.testExemption(CrmPipeline.normalizeHeaders(data)),
    fixes = CrmCleanups.fixes,
    mappings = Seq(("Are you a person of faith?", rels,
      "Values in Data", "Replacement Values")),
    emailCol = "Email",
    repData = Seq("Checkbox1" -> rep))

  private lazy val out: Map[String, Map[String, String]] = {
    val cols = result.output.columns
    result.output.collect().map { r =>
      r.getAs[String]("email") ->
        cols.zipWithIndex.map { case (c, i) => c -> r.getString(i) }.toMap
    }.toMap
  }

  test("header normalization strips embedded newlines (main.py:206-207)") {
    assert(CrmPipeline.normalizeHeaders(data).columns.contains("FirstName"))
  }

  test("schema reconciliation reports both directions (main.py:226-247)") {
    val (dataOnly, metaOnly) =
      CrmPipeline.reconcileSchema(CrmPipeline.normalizeHeaders(data), stm)
    assert(dataOnly == Seq("UnmappedCol"))
    assert(metaOnly == Seq("MetaOnlyCol"))
  }

  test("output columns: renamed targets in data order, merged+out-of-scope dropped, tag cols kept") {
    assert(result.output.columns.toSeq == Seq(
      "email", "first_name", "last_name", "address", "city", "zip",
      "phone", "join_date", "religion", "constituency", "org",
      "checkbox1", "Interest", "Newsletter", "tags"))
  }

  test("test rows removed by substring incl. 'LaTeSt'; exemption kept (main.py:281-285)") {
    assert(out.keySet == Set("alice@x.com", "bob@x.com", "carol@x.com",
      "a.murdock@dsl.pipex.com", "fay@x.com", "hana@x.com"))
    val removed = result.removedTestRows.select("Email")
      .collect().map(_.getString(0)).toSet
    assert(removed == Set("dave@x.com", "gus@x.com"))
  }

  test("cleanups: whitespace, commas, addresses, city, zip, phones, org, email typo") {
    val a = out("alice@x.com")
    assert(a("first_name") == "Al, ice")        // tab → ", "
    assert(a("last_name") == "Smith Jones")     // comma stripped
    assert(a("address") == "")                  // ', ' blanked
    assert(a("city") == "London Nw")            // title-cased
    assert(a("zip") == "")                      // '0' blanked
    assert(a("org") == "")                      // 'None' blanked
    val b = out("bob@x.com")
    assert(b("last_name") == "F. Queen, Jr.")   // exempted
    assert(b("city") == "King's Lynn")          // entity fixed, no title
    assert(b("org") == "")                      // 'Na' blanked
    assert(out.contains("a.murdock@dsl.pipex.com")) // typo fixed
  }

  test("date reformat: slicing semantics incl. empty → '//' (main.py:412-418)") {
    assert(out("alice@x.com")("join_date") == "03/05/2018")
    assert(out("bob@x.com")("join_date") == "//")
  }

  test("religion map join: mapped replaced, unmatched blanked (main.py:426-433,451)") {
    assert(out("alice@x.com")("religion") == "Catholic")
    assert(out("carol@x.com")("religion") == "Jewish")
    assert(out("bob@x.com")("religion") == "")   // unknownfaith not in map
    assert(out("fay@x.com")("religion") == "")   // empty not in map
  }

  test("repData join on cleaned email: replaced, unmatched BLANKED (main.py:436-451)") {
    assert(out("alice@x.com")("checkbox1") == "Yes")
    assert(out("bob@x.com")("checkbox1") == "")     // not in mapping → blanked
    assert(out("carol@x.com")("checkbox1") == "No") // replaced though source empty
    assert(out("a.murdock@dsl.pipex.com")("checkbox1") == "Clean") // post-typo-fix key
    assert(out("fay@x.com")("checkbox1") == "Maybe")
  }

  test("merge-concat branches on phone (main.py:563-623)") {
    assert(out("alice@x.com")("phone") == "")            // '999' blanked pre-merge, from ''
    assert(out("bob@x.com")("phone") == "0123")          // equal → skip
    assert(out("carol@x.com")("phone") == "0444")        // to '' → take from
    assert(out("fay@x.com")("phone") == "0111, 0222")    // both → concat
  }

  test("merge-audit channel: exact take/concat rows + per-step counters (main.py:578-628)") {
    val audit = result.mergeAudit
      .select("key", "target", "from_col", "from_val", "to_val", "merged_val", "mode")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4), r.getString(5), r.getString(6)))
      .toSet
    assert(audit == Set(
      ("carol@x.com", "phone", "Work Phone", "0444", "", "0444", "take"),
      ("a.murdock@dsl.pipex.com", "phone", "Work Phone", "0777", "", "0777", "take"),
      ("fay@x.com", "phone", "Work Phone", "0222", "0111", "0111, 0222", "concat")))
    // skips (alice: from blank; bob: equal; hana: from blank) not emitted
    val counters = CrmPipeline.mergeCounters(result.mergeAudit)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(counters == Set(
      ("phone", "Work Phone", "take", 2L),
      ("phone", "Work Phone", "concat", 1L)))
  }

  test("tags: trimmed, deduped across columns, comma-joined (main.py:491-507)") {
    assert(out("alice@x.com")("tags") == "interested")
    assert(out("carol@x.com")("tags") == "interested")  // two tag cols, one tag
    assert(out("hana@x.com")("tags") == "interested")
    assert(out("bob@x.com")("tags") == "")
  }

  test("multi-choice distinct lists on cleaned pre-rename frame (main.py:458-473)") {
    val lists = result.multiChoice.toMap
    assert(lists.keySet == Set("Are you a person of faith?", "Checkbox1"))
    val rel = lists("Are you a person of faith?")
      .collect().map(_.getString(0)).toSet
    assert(rel == Set("Catholic", "Jewish"))
    val cb = lists("Checkbox1").collect().map(_.getString(0)).toSet
    assert(cb == Set("Yes", "No", "Clean", "Maybe"))
  }

  test("mapping table with duplicate keys is rejected (SURVEY §7.5.4)") {
    import spark.implicits._
    val dup = Seq(("a", "1"), ("a", "2")).toDF("Values in Data", "Replacement Values")
    val df = Seq(("a")).toDF("c")
    assertThrows[IllegalArgumentException] {
      CrmPipeline.applyMapping(df, "c", dup, "Values in Data", "Replacement Values")
    }
  }

  test("in-scope STM row with no target and not a tag is a hard error (main.py:530-534)") {
    val bad = Stm(Seq(StmRow("x", inScope = true, target = "", isTag = false,
      tagName = "", customFieldType = "")))
    assertThrows[IllegalArgumentException] {
      import spark.implicits._
      CrmPipeline.mapColumns(Seq("v").toDF("x"), bad)
    }
  }

  test("splitTestRows: null exemption cell must not make rows vanish") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Some("Southampton, Test"), "a"), // exempt → kept
      (None, "contains test here"),     // null exemption col, is test → removed
      (None, "clean")                   // null exemption col, clean → kept
    ).toDF("const", "v")
    val (clean, removed) = CrmPipeline.splitTestRows(df,
      col("const") === "Southampton, Test")
    assert(clean.count() + removed.count() == 3,
      "a row vanished from both clean and removed")
    assert(removed.select("v").as[String].collect().toSeq ==
      Seq("contains test here"))
  }
}
