package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls/distincts and renders min/max as strings") {
    val df = Seq((Option(1L), Option("b")), (None: Option[Long], Option("a")),
      (Option(3L), None: Option[String])).toDF("k", "s")
    val r = Profiling.profile(df, Seq("k" -> col("k"), "s" -> col("s")))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3), x.getString(4))))
      .toMap
    assert(r("k") == ((1L, 2L, "1", "3")))
    assert(r("s") == ((1L, 2L, "a", "b")))
  }

  test("profile accepts display names with dots (no alias round-trip)") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val r = Profiling.profile(df, Seq("t.a" -> col("a"), "t.b" -> col("b")))
      .collect().map(_.getString(0)).sorted
    assert(r.toSeq == Seq("t.a", "t.b"))
  }
}
