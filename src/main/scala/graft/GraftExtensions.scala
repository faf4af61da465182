package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo,
  Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{MinHashExprs, StringExprs, VectorExprs}

/** SQL surface for the engine's custom Catalyst expressions: every
  * expression the DataFrame API exposes through `graft.functions` is
  * also callable from `spark.sql(...)`, so a SQL-first user (BI tool,
  * notebook, `spark-sql` shell) gets the same single-pass codegen'd
  * kernels — `SELECT nfc_normalize(text)`, `dot_product(a, b)`,
  * `minhash_bands(tokens, 3, 32, 8)` — with no Scala imports.
  *
  * Two registration paths, same function table:
  *   - new sessions: `--conf spark.sql.extensions=graft.GraftExtensions`
  *     (the standard extension-library pattern, [[GraftExtensions]]
  *     injects via `SparkSessionExtensions.injectFunction`);
  *   - an existing session: `GraftSql.register(spark)` writes the same
  *     descriptors into the session's function registry.
  *
  * Hyperparameters (shingle n, hash count, bands) must be INTEGER
  * LITERALS — they parameterize expression construction (loop bounds
  * baked into codegen), they are not runtime columns; a non-literal
  * argument fails analysis with a clear message rather than silently
  * planning a per-row reconfiguration.
  */
object GraftSql {

  type Builder = Seq[Expression] => Expression
  type FunctionDescription = (FunctionIdentifier, ExpressionInfo, Builder)

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  private def fn1(name: String, usage: String)(
      f: Expression => Expression): FunctionDescription =
    (FunctionIdentifier(name), info(name, usage), {
      case Seq(a) => f(a)
      case args => throw new IllegalArgumentException(
        s"$name expects 1 argument, got ${args.length}")
    })

  private def fn2(name: String, usage: String)(
      f: (Expression, Expression) => Expression): FunctionDescription =
    (FunctionIdentifier(name), info(name, usage), {
      case Seq(a, b) => f(a, b)
      case args => throw new IllegalArgumentException(
        s"$name expects 2 arguments, got ${args.length}")
    })

  private def intLit(name: String, pos: Int, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name: argument $pos must be an integer literal " +
        s"(it configures expression codegen), got $other")
  }

  /** The one shared function table — injected by [[GraftExtensions]],
    * written by [[register]].
    */
  val functions: Seq[FunctionDescription] = Seq(
    fn1("nfc_normalize",
      "Unicode NFC canonical composition (TR15) of a string")(
      StringExprs.NfcNormalizeExpr(_)),
    fn1("pandas_title",
      "exact pandas/CPython str.title(): capitalization restarts " +
        "after any non-cased character")(
      StringExprs.PandasTitleExpr(_)),
    fn2("dot_product",
      "dot product of two numeric arrays (float/double/int/long)")(
      VectorExprs.DotProductExpr(_, _)),
    fn1("simhash64",
      "64-bit SimHash fingerprint of a token array")(
      VectorExprs.SimHash64Expr(_)),
    fn1("token_entropy",
      "unigram Shannon entropy (bits) of a token array")(
      VectorExprs.TokenEntropyExpr(_)),
    fn1("ntz_micros",
      "wall-clock microseconds since the epoch of a TIMESTAMP_NTZ " +
        "(its physical value; session-timezone-independent)")(
      graft.functions.TimeExprs.NtzMicrosExpr(_)),
    fn1("quantize_int8",
      "symmetric int8 quantization of a float array: " +
        "struct(scale, codes q, max abs error err)")(
      VectorExprs.QuantizeInt8Expr(_)),
    fn2("jaro_winkler",
      "Jaro-Winkler similarity of two strings (Winkler 1990: 0.7 " +
        "boost threshold, prefix bonus capped at 4)")(
      StringExprs.JaroWinklerExpr(_, _)),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(tokens, n, numHashes): minhash slots over " +
          "the token array's n-gram shingles; n and numHashes are " +
          "integer literals"), {
      case Seq(tokens, n, k) =>
        MinHashExprs.MinHashSignatureExpr(tokens,
          intLit("minhash_signature", 2, n),
          intLit("minhash_signature", 3, k))
      case args => throw new IllegalArgumentException(
        s"minhash_signature expects 3 arguments, got ${args.length}")
    }),
    (FunctionIdentifier("minhash_bands"),
      info("minhash_bands",
        "minhash_bands(tokens, n, numHashes, bands): LSH band bucket " +
          "keys from the token array; n, numHashes, bands are integer " +
          "literals"), {
      case Seq(tokens, n, k, bands) =>
        MinHashExprs.MinHashBandsExpr(tokens,
          intLit("minhash_bands", 2, n),
          intLit("minhash_bands", 3, k),
          intLit("minhash_bands", 4, bands))
      case args => throw new IllegalArgumentException(
        s"minhash_bands expects 4 arguments, got ${args.length}")
    }))

  /** Register the function table into an EXISTING session (the
    * extensions config only applies to sessions built after it is
    * set). Idempotent — re-registration replaces the same descriptors.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functions.foreach { case (fid, i, b) => reg.registerFunction(fid, i, b) }
  }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` — Spark
  * instantiates this at session build and applies it to the session's
  * `SparkSessionExtensions`, making every [[GraftSql.functions]] entry
  * resolvable in SQL text (q94's `nfc_normalize`, the near-dup
  * featurization kernels, the vector ops).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftSql.functions.foreach(ext.injectFunction)
    // restore parquet time-range pushdown through the events ns-epoch
    // projection (see graft.plans.TsRangePushdown)…
    ext.injectOptimizerRule(_ => graft.plans.TsRangePushdown)
    // …and make the pushed NTZ range actually SKIP files: Spark's
    // parquet reader builds no FilterPredicate for TIMESTAMP_NTZ, so
    // footer-stats file pruning is the engine's own job
    // (see graft.plans.NtzFileSkip)
    ext.injectOptimizerRule(_ => graft.plans.NtzFileSkip)
  }
}
