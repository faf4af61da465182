package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** K-MINIMUM-VALUES distinct-count sketch as a typed `Aggregator`
  * (Bar-Yossef 2002 / Beyer 2007's unbiased KMV estimator): keep the
  * k smallest DISTINCT hash values; the k-th smallest, as a fraction
  * of hash space, estimates density, so n̂ = (k−1)/u_(k). The state
  * is k-bounded and merge is set-union-then-truncate, so it runs
  * partial/final like a `sum` — each partition ships at most k longs
  * per group, never its distinct set.
  *
  * Unlike HLL (whose register hashing is engine-private, so q149's
  * oracle can only bound the error), the KMV sketch over md5-derived
  * uint32 draws is ORDER-INVARIANT and engine-portable: the k
  * smallest distinct values of a set do not depend on merge order,
  * so a SQL oracle reproduces the sketch — and the estimate — bit
  * for bit.
  */
object KmvAgg {

  /** Buffer/result invariant: strictly increasing, size ≤ k. */
  final class Kmv(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 1, s"k must exceed 1 for the (k-1)/u_k estimator, got $k")
    override def zero: Seq[Long] = Nil
    override def reduce(b: Seq[Long], h: Long): Seq[Long] =
      // common no-op case (full sketch, hash beyond the k-th) is O(1)
      if (b.size >= k && h >= b.last) b
      else {
        val (lo, hi) = b.span(_ < h)
        if (hi.headOption.contains(h)) b // distinct: duplicates ignored
        else ((lo :+ h) ++ hi).take(k)
      }
    override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      (x ++ y).distinct.sorted.take(k)
    override def finish(r: Seq[Long]): Seq[Long] = r
    override def bufferEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  /** Column function: `kmvSketch(k)(hashCol)` aggregates uint32 draws
    * (longs in [0, 2³²)) to the group's sorted k-minimum sketch.
    */
  def kmvSketch(k: Int): Column => Column = {
    val fn = udaf(new Kmv(k), ExpressionEncoder[Long]())
    (h: Column) => fn(h)
  }
}
