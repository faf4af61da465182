package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the incremental-maintenance contracts: additive merge equals
  * from-scratch re-aggregation, and the expectation report's
  * null-is-a-violation convention.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("mergeAdditive == from-scratch rollup, including delta-only and " +
      "state-only keys") {
    val base = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    val delta = Seq(("a", 10.0), ("c", 7.0)).toDF("k", "v")
    def rollup(df: org.apache.spark.sql.DataFrame) = df.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(18,2)")).as("sv"))
    val merged = Incremental.mergeAdditive(rollup(base), rollup(delta),
      Seq("k"), Seq("cnt", "sv"))
    val scratch = rollup(base.unionAll(delta))
    assert(merged.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(merged).isEmpty)
    val m = merged.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSeq
    assert(m == Seq(("a", 3L, 13.0), ("b", 1L, 5.0), ("c", 1L, 7.0)))
  }

  test("mergeRetractable == from-scratch rollup over post-CDC facts: " +
      "deletes retract, updates correct, emptied groups vanish") {
    val base = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 5.0),
      ("c", 4L, 9.0)).toDF("k", "id", "v")
    val state = base.groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("v").cast("decimal(18,2)")).as("sv"))
    // CDC: insert into a and a NEW group d; update a's id=2 row
    // (2.0 -> 7.5); delete b's only row (group must vanish); delete
    // one of c's... c has one row: delete it AND insert a new one.
    val cdc = Seq(
      ("a", "I", Option.empty[Double], Some(10.0)),
      ("d", "I", Option.empty[Double], Some(4.0)),
      ("a", "U", Some(2.0), Some(7.5)),
      ("b", "D", Some(5.0), Option.empty[Double]),
      ("c", "D", Some(9.0), Option.empty[Double]),
      ("c", "I", Option.empty[Double], Some(1.0))
    ).toDF("k", "op", "old_value", "new_value")
    val merged = Incremental.mergeRetractable(state, cdc, Seq("k"),
      "cnt", "sv")
    // post-CDC facts: a = {1.0, 7.5, 10.0}, c = {1.0}, d = {4.0}
    val got = merged.orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSeq
    assert(got == Seq(("a", 3L, 18.5), ("c", 1L, 1.0), ("d", 1L, 4.0)),
      got.toString)
  }

  test("mergeRetractable: null measures move counts but not sums, " +
      "matching SUM's null-skip on a recompute") {
    val state = Seq(("a", 2L, Option(BigDecimal(3.0))))
      .toDF("k", "cnt", "sv")
      .select(col("k"), col("cnt"), col("sv").cast("decimal(18,2)").as("sv"))
    val cdc = Seq(
      ("a", "I", Option.empty[Double], Option.empty[Double]), // null insert
      ("a", "D", Option.empty[Double], Option.empty[Double])  // null delete
    ).toDF("k", "op", "old_value", "new_value")
    val got = Incremental.mergeRetractable(state, cdc, Seq("k"),
      "cnt", "sv").head()
    assert((got.getLong(1), got.getDecimal(2).doubleValue) == ((2L, 3.0)))
  }

  test("mergeRetractable: mixed-null updates (null->value and " +
      "value->null) match a recompute's SUM over post-CDC facts") {
    // base facts for a: {NULL, 4.0}; for b: {2.0, 6.0}
    val state = Seq(("a", 2L, Option(BigDecimal(4.0))),
        ("b", 2L, Option(BigDecimal(8.0))))
      .toDF("k", "cnt", "sv")
      .select(col("k"), col("cnt"),
        col("sv").cast("decimal(18,2)").as("sv"))
    val cdc = Seq(
      ("a", "U", Option.empty[Double], Some(3.0)),  // null -> 3.0
      ("b", "U", Some(2.0), Option.empty[Double])   // 2.0 -> null
    ).toDF("k", "op", "old_value", "new_value")
    // post-CDC facts: a = {3.0, 4.0} -> 7.0; b = {NULL, 6.0} -> 6.0
    val got = Incremental.mergeRetractable(state, cdc, Seq("k"),
        "cnt", "sv").orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSeq
    assert(got == Seq(("a", 2L, 7.0), ("b", 2L, 6.0)), got.toString)
  }

  test("mergeAdditive rejects mismatched shapes") {
    val a = Seq(("a", 1L)).toDF("k", "cnt")
    val b = Seq(("a", 1L)).toDF("k", "other")
    val e = intercept[IllegalArgumentException](
      Incremental.mergeAdditive(a, b, Seq("k"), Seq("cnt")))
    assert(e.getMessage.contains("cnt"))
  }

  test("expect: null predicate counts as a violation; pass iff zero") {
    val df = Seq(Some(1.0), Some(-2.0), None).toDF("v")
    val got = Incremental.expect(df, Seq(
        "non_negative" -> (col("v") >= 0),  // -2 fails, null is unknown
        "present" -> col("v").isNotNull))
      .orderBy("rule")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(got.toSeq == Seq(
      ("non_negative", 3L, 2L, false), // the null row is a violation too
      ("present", 3L, 1L, false)))
  }

  test("expect: all-green rules pass and report full row counts") {
    val df = Seq(1, 2, 3).toDF("v")
    val got = Incremental.expect(df, Seq("pos" -> (col("v") > 0))).head()
    assert((got.getString(0), got.getLong(1), got.getLong(2),
      got.getBoolean(3)) == (("pos", 3L, 0L, true)))
  }
}
