package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Linkage.FsField

/** Fellegi–Sunter linkage: hand-computed weights on fixtures, the
  * block cap's keep-smallest-ids semantics + non-silent census, and
  * the planted-truth dirty-copy arithmetic.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val fields = Seq(
    FsField("s", (x, y) => x === y, 0.9, 0.1),
    FsField("v", (x, y) => abs(x - y) <= 0.5, 0.8, 0.001))

  // ln(9) = 2.197224..., ln(0.1/0.9) = -2.197224...
  // ln(800) = 6.684611..., ln(0.2/0.999) = -1.608437...
  private val (sAg, sDis) = (2197225L, -2197225L)
  private val (vAg, vDis) = (6684612L, -1608437L)

  test("quantized weights match the closed form") {
    assert(fields(0).agreeMicro == sAg && fields(0).disagreeMicro == sDis)
    assert(fields(1).agreeMicro == vAg && fields(1).disagreeMicro == vDis)
  }

  test("scores are the exact integer weight sums per agreement cell") {
    val a = Seq((1L, 10L, "x", 1.0), (2L, 10L, "y", 5.0))
      .toDF("id", "block", "s", "v")
    val b = Seq((11L, 10L, "x", 1.2), (12L, 10L, "z", 9.0))
      .toDF("id", "block", "s", "v")
    val out = Linkage.fellegiSunter(a, b, fields,
        matchThresholdMicro = sAg) // threshold: name agreement alone clears
      .orderBy("a_id", "b_id")
      .select("a_id", "b_id", "ag_s", "ag_v", "score_micro", "is_match")
      .as[(Long, Long, Int, Int, Long, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 11L, 1, 1, sAg + vAg, 1), // both agree (|1.0-1.2| <= 0.5)
      (1L, 12L, 0, 0, sDis + vDis, 0),
      (2L, 11L, 0, 0, sDis + vDis, 0),
      (2L, 12L, 0, 0, sDis + vDis, 0)))
  }

  test("block cap keeps the smallest ids per side and reports a census") {
    val a = (1L to 5L).map(i => (i, 1L, "x", 0.0))
      .toDF("id", "block", "s", "v")
    val b = Seq((100L, 1L, "x", 0.0)).toDF("id", "block", "s", "v")
    val out = Linkage.fellegiSunter(a, b, fields, maxPerSide = 2)
      .orderBy("a_id")
    val pairs = out.select("a_id").as[Long].collect().toSeq
    assert(pairs == Seq(1L, 2L), "only the 2 smallest a-ids survive")
    val census = out.select("n_capped_blocks").as[Long].head()
    assert(census == 1L, "one overflowing (side, block) group")
  }

  test("pairs never cross blocks") {
    val a = Seq((1L, 1L, "x", 0.0), (2L, 2L, "x", 0.0))
      .toDF("id", "block", "s", "v")
    val b = Seq((11L, 1L, "x", 0.0), (12L, 3L, "x", 0.0))
      .toDF("id", "block", "s", "v")
    val out = Linkage.fellegiSunter(a, b, fields)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 11L)))
  }

  test("entity clustering: a double-matched dirty record pulls both " +
      "clean records into one entity") {
    val a = Seq((1L, 1L, "x", 1.0), (2L, 1L, "x", 1.0), (3L, 2L, "y", 9.0))
      .toDF("id", "block", "s", "v")
    val b = Seq((11L, 1L, "x", 1.0)).toDF("id", "block", "s", "v")
    val edges = Linkage.fellegiSunter(a, b, fields,
        matchThresholdMicro = sAg) // s-agreement alone clears
      .filter(col("is_match") === 1)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"))
    val comp = Dedup.connectedComponents(
        a.select("id").unionAll(b.select("id")), "id", edges)
      .orderBy("id")
      .as[(Long, Long)].collect().toSeq
    // 1, 2, 11 collapse to entity 1; 3 stays a singleton
    assert(comp == Seq((1L, 1L), (2L, 1L), (3L, 3L), (11L, 1L)))
  }

  test("dirtyCustomerCopy plants the declared corruption schedule") {
    val cust = t(sf, "customer")
    val joined = Linkage.dirtyCustomerCopy(cust)
      .withColumn("ck", col("id") - Linkage.DirtySourceOffset)
      .join(cust, col("ck") === col("c_custkey"))
    // every third customer, ids shifted by 1e7
    assert(joined.count() ==
      cust.filter(col("c_custkey") % 3 === 0).count())
    // name corrupted exactly on even keys
    val badName = joined.filter(
      (col("ck") % 2 === 0) =!= (col("name") =!= col("c_name"))).count()
    assert(badName == 0)
    // balance +100 exactly on keys divisible by 5
    val badBal = joined.filter(
      (col("ck") % 5 === 0) =!= (col("bal") =!= col("c_acctbal"))).count()
    assert(badBal == 0)
    // blocking key survives the case corruption: block == custkey % 500
    val badBlock = joined.filter(
      col("block") =!= col("c_custkey") % 500).count()
    assert(badBlock == 0)
  }

  private def t(dir: String, name: String) =
    spark.read.parquet(s"$dir/$name.parquet")
}
