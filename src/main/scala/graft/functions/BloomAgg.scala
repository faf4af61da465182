package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bloom-filter build as a typed `Aggregator` (Bloom 1970, with the
  * Kirsch–Mitzenmacher double-hashing construction: positions
  * pos_i = (a + i·b) mod m from two md5-uint32 halves simulate k
  * independent hashes). The state is a FIXED m-bit bitmap (m/64
  * longs) and merge is word-wise OR — commutative, associative,
  * idempotent — so the build runs partial/final like a `sum`: each
  * partition ships one m-bit word array, never its key set, and the
  * finished sketch is broadcast-sized (m = 2¹⁶ → 8 KB).
  *
  * Unlike Spark's built-in `bloom_filter_agg` (whose xxhash64 layout
  * is engine-private), the md5-derived positions are engine-portable:
  * a SQL oracle reproduces every set bit — and therefore every
  * membership verdict — exactly (the same portability argument as
  * [[KmvAgg]] vs HLL).
  *
  * Input rows are the two hash halves packed in one long
  * (a << 32 | b, both uint32); [[BitExprs.md5Uint32]] builds them.
  */
object BloomAgg {

  final class Bloom(mBits: Int, k: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive " +
      s"multiple of 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    private val words = mBits / 64

    override def zero: Array[Long] = new Array[Long](words)

    override def reduce(buf: Array[Long], packed: Long): Array[Long] = {
      val a = packed >>> 32
      val b = packed & 0xFFFFFFFFL
      var i = 0
      while (i < k) {
        val pos = ((a + i * b) % mBits).toInt
        buf(pos >>> 6) |= 1L << (pos & 63)
        i += 1
      }
      buf
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { x(i) |= y(i); i += 1 }
      x
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column function: `bloomSketch(mBits, k)(packedHashCol)` builds
    * the group's m-bit bitmap from packed (a << 32 | b) hash longs.
    */
  def bloomSketch(mBits: Int, k: Int): Column => Column = {
    val fn = udaf(new Bloom(mBits, k), ExpressionEncoder[Long]())
    (h: Column) => fn(h)
  }
}
