package graft.pipeline

import org.apache.spark.sql.DataFrame

/** The Source-To-Target-Mapping (STM) metadata table, compiled to a
  * plan-construction model.
  *
  * The reference consumes the STM as a pandas frame and loops over it
  * per row group (/root/reference/main.py:263, 481-483, 530-541). Here
  * the STM is *metadata that drives Catalyst plan construction*: it is
  * tiny (hundreds of rows), so it is collected once on the driver and
  * compiled into column lists / expression groups — the 100 TB fact
  * table never joins against it.
  *
  * Columns (main.py:126-137): `fullColName`, `IN SCOPE`,
  * `NB TARGET FIELD`, `Tag?`, `Tag Name`, `Custom Field Type?`.
  */
final case class StmRow(
    fullColName: String,
    inScope: Boolean,
    target: String,
    isTag: Boolean,
    tagName: String,
    customFieldType: String)

final case class Stm(rows: Seq[StmRow]) {

  /** P1 — in-scope source columns, in STM order (main.py:263-264). */
  def inScopeCols: Seq[String] = rows.filter(_.inScope).map(_.fullColName)

  /** C5 — mapping validation (main.py:530-534): an in-scope row with an
    * empty target that is not a tag is a hard error.
    */
  def validate(): Unit = {
    val bad = rows.filter(r => r.inScope && r.target.isEmpty && !r.isTag)
    require(bad.isEmpty,
      s"STM rows in scope with no target and not tags: ${bad.map(_.fullColName).mkString(", ")}")
  }

  /** C1/C3 — target-collision groups (main.py:544-560): for each target
    * field, the in-scope source columns mapped to it, in STM order. The
    * first is renamed; the rest merge-concat into it.
    */
  def targetGroups: Seq[(String, Seq[String])] = {
    val scoped = rows.filter(r => r.inScope && r.target.nonEmpty)
    scoped.map(_.target).distinct.map { t =>
      t -> scoped.filter(_.target == t).map(_.fullColName)
    }
  }

  /** F11/J4 — tag columns: source column → trimmed tag name
    * (main.py:481-483, trim at 502).
    */
  def tagCols: Seq[(String, String)] =
    rows.filter(r => r.inScope && r.isTag && r.tagName.trim.nonEmpty)
      .map(r => r.fullColName -> r.tagName.trim)

  /** S9 — columns whose distinct values get exported
    * (main.py:463-464).
    */
  def multiChoiceCols: Seq[String] =
    rows.filter(r => r.inScope && r.customFieldType == "Multiple Choice")
      .map(_.fullColName)
}

object Stm {

  /** Compile an STM DataFrame (from CSV/GSheet snapshot) by collecting
    * it to the driver — metadata only, never the fact table.
    */
  def fromDataFrame(meta: DataFrame): Stm = {
    def get(r: org.apache.spark.sql.Row, name: String): String =
      Option(r.getAs[String](name)).getOrElse("")
    Stm(meta.select("fullColName", "IN SCOPE", "NB TARGET FIELD", "Tag?",
        "Tag Name", "Custom Field Type?")
      .collect().toSeq.map { r =>
        StmRow(
          fullColName = get(r, "fullColName"),
          inScope = get(r, "IN SCOPE") == "T",
          target = get(r, "NB TARGET FIELD"),
          isTag = get(r, "Tag?") == "T",
          tagName = get(r, "Tag Name"),
          customFieldType = get(r, "Custom Field Type?"))
      })
  }
}
