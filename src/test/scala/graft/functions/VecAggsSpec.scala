package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VecAggsSpec extends SparkSpec {
  import spark.implicits._

  test("vecAvg: element-wise group means across partitions (merge path)") {
    val df = Seq(
      (1, Seq(1.0, 2.0)),
      (1, Seq(3.0, 4.0)),
      (1, Seq(5.0, 6.0)),
      (2, Seq(10.0, 20.0))
    ).toDF("g", "v").repartition(3) // force partial buffers + merge
    val got = df.groupBy("g").agg(VecAggs.vecAvg(col("v")).as("c"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(1) == Seq(3.0, 4.0))
    assert(got(2) == Seq(10.0, 20.0))
  }

  test("vecAvg: null vectors are skipped, empty group yields empty array") {
    val df = Seq(
      (1, Some(Seq(2.0, 4.0))),
      (1, None),
      (2, None)
    ).toDF("g", "v")
    val got = df.groupBy("g").agg(VecAggs.vecAvg(col("v")).as("c"))
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(1) == Seq(2.0, 4.0))
    assert(got(2) == Seq.empty[Double])
  }

  test("vecAvg: ragged dimensionalities fail loud") {
    val df = Seq((1, Seq(1.0, 2.0)), (1, Seq(1.0))).toDF("g", "v")
    val e = intercept[Exception] {
      df.groupBy("g").agg(VecAggs.vecAvg(col("v")).as("c")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(t => Option(t.getMessage).exists(
        _.contains("ragged vector dims"))))
  }
}
