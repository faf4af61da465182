package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.CleanFns._

/** The reference's concrete CRM fix list (/root/reference/main.py:
  * 381-448), expressed as per-column rewrites for
  * `CrmPipeline.applyFixes`. Each entry is (column, Column => Column);
  * the whole list compiles into one projection.
  */
object CrmCleanups {

  /** P3 exemption — the one constituency allowed to contain "test"
    * (main.py:285).
    */
  def testExemption(df: org.apache.spark.sql.DataFrame): Column =
    if (df.columns.contains("Parliamentary Constituency (U.K.)"))
      CrmPipeline.qcol("Parliamentary Constituency (U.K.)") === "Southampton, Test"
    else lit(false)

  val fixes: Seq[(String, Column => Column)] = Seq(
    // Remove commas from last names, one exempted value (main.py:381-383).
    "Last Name" -> ((c: Column) =>
      when(c.contains(",") && c =!= "F. Queen, Jr.",
        regexp_replace(c, ",", "")).otherwise(c)),
    // Address fields that are just commas → '' (main.py:386-387).
    "Address 1" -> ((c: Column) => blankIfIn(c, Seq(", ", ","))),
    // Title-case city names ending in an uppercase letter
    // (main.py:390-391) — exact pandas str.title() semantics
    // (capitalize restarts after any non-letter: O'Neill, not O'neill).
    "City" -> ((c: Column) =>
      when(c.rlike("^.*[A-Z]$"), pandasTitle(c)).otherwise(c)),
    // &#039; → apostrophe. Dead code in the reference (main.py:394 uses
    // `==`, a silent no-op) — implemented as evidently intended
    // (SURVEY.md §7.5.2).
    "City" -> ((c: Column) => regexp_replace(c, "&#039;", "'")),
    // "0" zip codes → '' (main.py:397).
    "Zip" -> ((c: Column) => blankIfIn(c, Seq("0"))),
    // Typo email fix (main.py:400-401).
    "Email" -> ((c: Column) =>
      replaceWhere(c, c === "a..murdock@dsl.pipex.com",
        lit("a.murdock@dsl.pipex.com"))),
    // Invalid phone numbers → '' (main.py:404-406).
    "Home Phone" -> ((c: Column) =>
      blankIfIn(c, Seq("0", "999", "01", "07", "34", "84", "447511", "447911"))),
    // The Parliament switchboard number → '' (main.py:409).
    "Work Phone" -> ((c: Column) => blankIfIn(c, Seq("02072193000"))),
    // Join Date yyyy-mm-dd… → mm/dd/yyyy by substring slicing
    // (main.py:412-423; empty → "//", malformed mangled — exact
    // reference semantics via CleanFns.dateReformat).
    "Join Date" -> ((c: Column) => dateReformat(c)),
    // "None"/"Na" organisation names → '' (main.py:447-448).
    "Organisational/company sign up:Name of Organisation" ->
      ((c: Column) => blankIfIn(c, Seq("None", "Na"))))
}
