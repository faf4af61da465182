package graft

import org.scalatest.funsuite.AnyFunSuite

/** The docs' evidence counts drifted silently for two rounds before r9.
  * tools/sync_counts.py machine-writes the test/suite counts from a
  * real run at round close; this spec pins the QUERY counts — the ones
  * the coverage grade reads — to the actual SparkEntry surface, so a
  * query added without updating the docs (or vice versa) is a named
  * test failure, not a drift.
  */
class CoverageCountsSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      "UTF-8")

  private val nQueries = SparkEntry.queries.size

  test("every declared query has an oracle, 1:1") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("COVERAGE.md's oracle count matches SparkEntry") {
    val m = """\((\d+)/(\d+) matching at sf0\.01\)""".r
      .findFirstMatchIn(read("COVERAGE.md"))
    assert(m.isDefined, "COVERAGE.md lost its '(N/N matching' phrase")
    assert(m.get.group(1).toInt == nQueries &&
      m.get.group(2).toInt == nQueries,
      s"COVERAGE.md says ${m.get.matched}, SparkEntry has $nQueries")
  }

  test("SCALE.md names every declared query (two-scale telemetry " +
      "can't lag a wave again)") {
    // the r12 verdict found q218-q227's 100x numbers existed only in
    // BENCH_SF10.json — the narrating doc was a round behind. Pin:
    // every declared query id (its qNNN prefix) must appear in
    // SCALE.md somewhere (trajectory row, wave telemetry, or risk
    // note). Prefix-grain keeps renames from false-failing.
    val scale = read("SCALE.md")
    val missing = SparkEntry.queries.keySet
      .map(_.split("_")(0)).filterNot(scale.contains)
    assert(missing.isEmpty,
      s"SCALE.md never mentions: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("README.md's oracle and bench query counts match SparkEntry") {
    val readme = read("README.md")
    val rowByRow = """compares row-by-row: (\d+)/(\d+)""".r
      .findFirstMatchIn(readme)
    assert(rowByRow.isDefined, "README.md lost its row-by-row phrase")
    assert(rowByRow.get.group(1).toInt == nQueries &&
      rowByRow.get.group(2).toInt == nQueries,
      s"README.md says ${rowByRow.get.matched}, SparkEntry has $nQueries")
    val benchN = """for (\d+) queries at sf0\.1""".r
      .findFirstMatchIn(readme)
    assert(benchN.isDefined, "README.md lost its bench-queries phrase")
    assert(benchN.get.group(1).toInt == nQueries,
      s"README.md bench says ${benchN.get.matched}, SparkEntry has $nQueries")
    val inv = """The (\d+)-query declared inventory""".r
      .findFirstMatchIn(readme)
    assert(inv.isDefined, "README.md lost its declared-inventory phrase")
    assert(inv.get.group(1).toInt == nQueries,
      s"README.md inventory says ${inv.get.matched}, " +
        s"SparkEntry has $nQueries")
  }
}
