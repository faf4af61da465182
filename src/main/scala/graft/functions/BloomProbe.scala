package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass Bloom membership probe — the custom-Expression tier of
  * the engine's preference order (compose built-ins → custom
  * Expression → custom plan → mapPartitions), reached here because
  * the declarative form genuinely degrades: the k per-position tests
  * each re-derive the md5-uint32 halves (a, b), Catalyst's predicate
  * pushdown re-substitutes any hoisting projection back into the
  * filter, and FilterExec codegen does not subexpression-eliminate
  * across conjuncts — measured 8 md5+conv chains per probed row
  * (7.1 s to filter 600 k rows at sf0.1; this expression: two md5
  * digests per row, ~10×).
  *
  * Semantics are EXACTLY the portable declarative chain the DuckDB
  * oracles replay ([[BitExprs.md5Uint32]]/[[BitExprs.bloomPos]]/
  * [[BitExprs.bloomTest]], spec-pinned equivalent):
  * a = uint32(first 8 md5 hex chars of key||":A"), b likewise ":B",
  * pass ⇔ every pos_i = (a + i·b) mod m bit is set in `words`.
  * NULL keys yield NULL (the declarative chain's null flow).
  *
  * doGenCode emits one static call into the compiled kernel, so
  * probed rows stay inside the surrounding whole-stage-codegen
  * pipeline (the MinHashExprs pattern); the bitmap rides along as a
  * referenced object, not a per-row literal.
  */
object BloomProbe {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val SaltA = ":A".getBytes("UTF-8")
  private val SaltB = ":B".getBytes("UTF-8")

  /** First 4 digest bytes as an unsigned 32-bit value — identical to
    * `conv(substring(md5(s), 1, 8), 16, 10)`: the first 8 hex chars
    * ARE the first 4 bytes, big-endian.
    */
  private def uint32(keyBytes: Array[Byte], salt: Array[Byte]): Long = {
    val d = md5.get()
    d.reset()
    d.update(keyBytes)
    d.update(salt)
    val h = d.digest()
    ((h(0) & 0xFFL) << 24) | ((h(1) & 0xFFL) << 16) |
      ((h(2) & 0xFFL) << 8) | (h(3) & 0xFFL)
  }

  /** The per-row kernel (public: codegen calls it by name). */
  def test(key: UTF8String, words: Array[Long], mBits: Int,
      k: Int): Boolean = {
    val kb = key.getBytes
    val a = uint32(kb, SaltA)
    val b = uint32(kb, SaltB)
    var i = 0
    while (i < k) {
      val pos = ((a + i * b) % mBits).toInt
      if (((words(pos >>> 6) >>> (pos & 63)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  case class Probe(child: Expression, words: Array[Long], mBits: Int,
      k: Int) extends UnaryExpression {
    require(mBits % 64 == 0 && mBits > 0 && words.length == mBits / 64,
      s"bitmap must hold exactly $mBits bits, got ${words.length} words")
    // mirror BloomAgg's build-side bound (r14 advice): probe k MUST
    // equal the k the sketch was built with — a larger probe k tests
    // positions the build never set, i.e. silent false NEGATIVES, the
    // one failure mode a Bloom filter must never have
    require(k >= 1 && k <= 16, s"bloom probe k must be in [1,16], got $k")
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"key must be string, got ${child.dataType}")

    override protected def nullSafeEval(key: Any): Any =
      test(key.asInstanceOf[UTF8String], words, mBits, k)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val w = ctx.addReferenceObj("bloomWords", words, "long[]")
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.BloomProbe.test($c, $w, $mBits, $k)")
    }

    override protected def withNewChildInternal(
        newChild: Expression): Probe = copy(child = newChild)
  }

  /** Column builder: true iff `key`'s k Bloom positions are all set
    * in the literal bitmap.
    */
  def probe(words: Array[Long], key: Column, mBits: Int, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(Probe(Bridge.expression(key), words, mBits, k))
  }
}
