package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The SQL surface: every custom expression is callable from
  * spark.sql(...) after GraftSql.register, and GraftExtensions injects
  * the same table through the standard spark.sql.extensions path.
  */
class GraftSqlSpec extends SparkSpec {

  private lazy val registered = { GraftSql.register(spark); spark }

  private def sql1(q: String): Any =
    registered.sql(q).collect().head.get(0)

  test("nfc_normalize and pandas_title resolve in SQL text") {
    assert(sql1("SELECT nfc_normalize('café')") == "café")
    assert(sql1("SELECT pandas_title(\"o'neill\")") == "O'Neill")
  }

  test("jaro_winkler resolves in SQL text with the calibrated value") {
    assert(math.abs(sql1("SELECT jaro_winkler('martha', 'marhta')")
      .asInstanceOf[Double] - 0.9611111111111111) < 1e-12)
  }

  test("vector kernels resolve in SQL text") {
    assert(sql1("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      == 11.0)
    // four uniform tokens → H = log2(4) = 2 bits
    assert(sql1("SELECT token_entropy(array('a','b','c','d'))") == 2.0)
    val sh = sql1("SELECT simhash64(array('x','y'))")
    assert(sh.isInstanceOf[Long])
    val q = registered.sql(
      "SELECT quantize_int8(array(1.0F, -0.5F)).q").collect().head.getSeq[Int](0)
    assert(q == Seq(127, -64))
    // ntz_micros is the NTZ physical value — no zone math anywhere
    assert(sql1("SELECT ntz_micros(TIMESTAMP_NTZ '2024-03-10 02:30:00')")
      == 1710037800000000L)
    assert(sql1("SELECT ntz_micros(TIMESTAMP_NTZ '1970-01-01 00:00:00')") == 0L)
  }

  test("minhash kernels take literal hyperparameters; non-literal fails") {
    val bands = registered.sql(
      "SELECT minhash_bands(array('a','b','c','d','e'), 3, 32, 8) AS b")
      .collect().head.getSeq[Long](0)
    assert(bands.length == 8)
    val sig = registered.sql(
      "SELECT minhash_signature(array('a','b','c','d'), 2, 16) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length == 16)
    // a column reference is not a valid hyperparameter
    val err = intercept[Exception] {
      registered.sql(
        "SELECT minhash_bands(array('a'), 3, id_int, 8) " +
          "FROM (SELECT CAST(id AS INT) AS id_int FROM range(1))").collect()
    }
    assert(err.getMessage.contains("integer literal") ||
      err.getCause != null &&
        err.getCause.getMessage.contains("integer literal"),
      err.getMessage)
  }

  test("SQL results match the DataFrame-API expressions") {
    import registered.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("café o'neill", "plain").toDF("v")
    df.createOrReplaceTempView("gs_twin")
    val viaSql = registered
      .sql("SELECT nfc_normalize(v) AS a, pandas_title(v) AS b FROM gs_twin")
      .as[(String, String)].collect().toSeq
    val viaDf = df.select(
        graft.functions.StringExprs.nfcNormalize(col("v")).as("a"),
        graft.functions.StringExprs.pandasTitle(col("v")).as("b"))
      .as[(String, String)].collect().toSeq
    assert(viaSql == viaDf)
  }

  test("GraftExtensions injects the same function table") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // apply the injected set to a clone of the session registry and
    // check every name resolves there
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.clone()
    org.apache.spark.sql.graftbridge.Bridge.applyInjectedFunctions(ext, reg)
    GraftSql.functions.foreach { case (fid, _, _) =>
      assert(reg.functionExists(fid), s"missing ${fid.funcName}")
    }
    assert(reg.functionExists(FunctionIdentifier("nfc_normalize")))
  }
}
