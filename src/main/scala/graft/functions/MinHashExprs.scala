package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for MinHash — the one operator where
  * composing built-ins genuinely fails at scale (SURVEY.md §7.3):
  * the built-in form (`array_min(transform(...))` × numHashes over a
  * shingle `transform`) is interpreted, and Catalyst's project
  * collapsing can inline the shingle subtree into every one of the
  * numHashes references, degrading to O(numHashes × tokens²) string
  * work per row (measured: 240 s for 5 k docs). These expressions do
  * ONE pass over the token array per row — shingle bytes are hashed
  * incrementally (XXH64, Spark's own kernel) and the `numHashes`
  * "permutations" are affine transforms of that single 64-bit hash,
  * the standard one-hash MinHash construction.
  *
  * CodegenFallback costs one virtual call per row; the loop inside is
  * tight JVM code, so rows stream through the surrounding
  * whole-stage-codegen pipeline with a single opaque call.
  */
object MinHashExprs {

  private[functions] val Seed = 0x9747b28cL

  /** Deterministic affine permutation constants (same on every
    * executor, every run, every JVM: java.util.Random is a specified
    * LCG).
    */
  private[functions] def perms(k: Int): (Array[Long], Array[Long]) = {
    val r = new java.util.Random(42)
    val a = Array.fill(k)(r.nextLong() | 1L)
    val b = Array.fill(k)(r.nextLong())
    (a, b)
  }

  /** Single-pass (numHashes-min) signature state over token n-grams. */
  private[functions] def signatureOf(tokens: ArrayData, n: Int,
      numHashes: Int, a: Array[Long], b: Array[Long]): Array[Long] = {
    val len = tokens.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = len - n + 1
    if (nShingles <= 0) {
      // no content: defined constant signature (all empty docs collide)
      val h0 = XXH64.hashUTF8String(UTF8String.EMPTY_UTF8, Seed)
      var i = 0
      while (i < numHashes) { sig(i) = a(i) * h0 + b(i); i += 1 }
      return sig
    }
    val sb = new java.lang.StringBuilder(64)
    var s = 0
    while (s < nShingles) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val t = tokens.getUTF8String(s + j)
        sb.append(if (t == null) "" else t.toString)
        j += 1
      }
      val h = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), Seed)
      var i = 0
      while (i < numHashes) {
        val v = a(i) * h + b(i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s += 1
    }
    sig
  }

  /** tokens: array<string> → minhash signature array<bigint>(numHashes).
    * doGenCode references the expression instance and calls the
    * compiled single-pass kernel directly — the surrounding projection
    * stays in whole-stage codegen with one virtual call per row and no
    * interpreted child evaluation.
    */
  final case class MinHashSignatureExpr(child: Expression, n: Int,
      numHashes: Int) extends UnaryExpression {
    private lazy val (pa, pb) = perms(numHashes)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    def compute(tokens: ArrayData): ArrayData =
      new GenericArrayData(signatureOf(tokens, n, numHashes, pa, pb))
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashSig", this,
        classOf[MinHashSignatureExpr].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "minhash_signature"
  }

  /** tokens: array<string> → LSH band hashes array<bigint>(bands); band
    * b mixes its `numHashes/bands` consecutive signature slots into one
    * 64-bit bucket key. Emitting bands directly (not the intermediate
    * signature) keeps the whole near-dup candidate key one expression —
    * nothing for the optimizer to duplicate.
    */
  final case class MinHashBandsExpr(child: Expression, n: Int,
      numHashes: Int, bands: Int) extends UnaryExpression {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    private lazy val (pa, pb) = perms(numHashes)
    private val rows = numHashes / bands
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    def compute(tokens: ArrayData): ArrayData = {
      val sig = signatureOf(tokens, n, numHashes, pa, pb)
      val out = new Array[Long](bands)
      var bnd = 0
      while (bnd < bands) {
        var h = XXH64.hashLong(bnd.toLong, Seed)
        var r = 0
        while (r < rows) {
          h = XXH64.hashLong(sig(bnd * rows + r) ^ h, Seed)
          r += 1
        }
        out(bnd) = h
        bnd += 1
      }
      new GenericArrayData(out)
    }
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashBands", this,
        classOf[MinHashBandsExpr].getName)
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "minhash_bands"
  }

  /** Column wrappers (Spark 4 classic bridge between Column nodes and
    * catalyst Expressions).
    */
  import org.apache.spark.sql.graftbridge.Bridge

  def minhashSignature(tokens: Column, n: Int, numHashes: Int): Column =
    Bridge.column(
      MinHashSignatureExpr(Bridge.expression(tokens), n, numHashes))

  def minhashBandHashes(tokens: Column, n: Int, numHashes: Int,
      bands: Int): Column =
    Bridge.column(
      MinHashBandsExpr(Bridge.expression(tokens), n, numHashes, bands))
}
