package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-interleaving and hash-position column builders — pure
  * compositions of codegen'd integer builtins (`shiftright`/
  * `shiftleft`/`&`/`+`), no UDFs, so they stay inside whole-stage
  * codegen and are replayable in any engine with integer bit ops
  * (the DuckDB oracles rebuild the identical arithmetic).
  */
object BitExprs {

  /** Morton (Z-order) interleave of two `bits`-bit bucket ids:
    * x's bit i lands at position 2i, y's at 2i+1, so the resulting
    * curve alternates dimensions at every level — sorting by it
    * clusters rows that are close in BOTH dimensions, which is what
    * makes min/max file statistics prunable against predicates on
    * either column (the multi-dimensional clustering trick behind
    * Z-ordered table layouts). Built as a sum of 2·bits masked
    * shifts; each term touches one bit, so terms never carry and
    * `+` is exact.
    */
  def mortonInterleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** md5-uint32 of `s` with a salt suffix — the engine's portable
    * draw convention (q213/q215/q225): first 8 hex chars of
    * md5(s || ':' || salt) as an unsigned 32-bit value in a long.
    */
  def md5Uint32(s: Column, salt: String): Column =
    conv(substring(md5(concat(s, lit(":" + salt))), 1, 8), 16, 10)
      .cast("long")

  /** The i-th double-hashing Bloom position for a key with md5-uint32
    * halves (a, b): pos_i = (a + i·b) mod m (Kirsch–Mitzenmacher:
    * two independent hashes simulate k). a, b < 2³² and i ≤ k keep
    * a + i·b far below 2⁶³ — no overflow, engine-portable.
    */
  def bloomPos(a: Column, b: Column, i: Int, mBits: Int): Column =
    (a + lit(i.toLong) * b) % lit(mBits.toLong)

  /** Membership test of position `pos` against a bitmap held as a
    * LITERAL array of 64-bit words (a broadcast-sized sketch, m/64
    * longs): word index = pos div 64 (exact via shiftright — `/` on
    * longs is fractional in Spark SQL), bit = pos mod 64. The
    * variable-amount unsigned shift isn't in the Scala functions API
    * (only Int amounts), so the catalyst expression goes through the
    * classic-API [[org.apache.spark.sql.graftbridge.Bridge]] — still
    * a codegen'd builtin, not a UDF.
    */
  def bloomTest(words: Array[Long], pos: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    val word = element_at(typedlit(words.toSeq),
      shiftright(pos, 6).cast("int") + lit(1))
    val bit = (pos % lit(64L)).cast("int")
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.ShiftRightUnsigned(
        Bridge.expression(word), Bridge.expression(bit)))
      .bitwiseAND(lit(1L)) === lit(1L)
  }
}
