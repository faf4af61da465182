package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise vector aggregates over `array<double>` columns as typed
  * `Aggregator`s — mergeable, map-side-partial state (one sums array +
  * count per group per partition), the same partial/final shape as a
  * `sum`. The grouped centroid is the workhorse of embedding-space
  * curation: per-label/cluster mean vectors for drift monitoring, IVF
  * coarse-quantizer refresh, and cluster-representative selection.
  * The shuffle ships one (dims + 1)-double buffer per (partition,
  * group) — never the member vectors.
  */
object VecAggs {

  /** Partial state: element-wise sums + member count. `sums` is empty
    * until the first non-null vector fixes the dimensionality.
    */
  final case class VecSumBuf(sums: Array[Double], n: Long)

  /** Mean vector per group. Null input vectors are skipped (they carry
    * no geometry); a group with no vectors yields the empty array.
    * Ragged dimensionalities are a data error — fail loud, a silently
    * truncated centroid poisons every downstream distance.
    */
  final class VecAvg extends Aggregator[Seq[Double], VecSumBuf, Seq[Double]] {
    override def zero: VecSumBuf = VecSumBuf(Array.empty, 0L)
    // the Aggregator contract permits mutating and returning the
    // buffer — in the per-row hot path (reduce) a clone per input
    // would double allocation pressure for wide embeddings; only the
    // case-class shell is re-allocated (its array is reused in place)
    private def add(b: VecSumBuf, v: Seq[Double]): VecSumBuf = {
      if (b.n == 0L) VecSumBuf(v.toArray, 1L)
      else {
        require(v.size == b.sums.length,
          s"ragged vector dims: ${v.size} vs ${b.sums.length}")
        val s = b.sums
        var i = 0
        while (i < s.length) { s(i) += v(i); i += 1 }
        VecSumBuf(s, b.n + 1)
      }
    }
    override def reduce(b: VecSumBuf, v: Seq[Double]): VecSumBuf =
      if (v == null) b else add(b, v)
    override def merge(x: VecSumBuf, y: VecSumBuf): VecSumBuf =
      if (x.n == 0L) y
      else if (y.n == 0L) x
      else {
        require(x.sums.length == y.sums.length,
          s"ragged vector dims: ${x.sums.length} vs ${y.sums.length}")
        val s = x.sums
        var i = 0
        while (i < s.length) { s(i) += y.sums(i); i += 1 }
        VecSumBuf(s, x.n + y.n)
      }
    override def finish(b: VecSumBuf): Seq[Double] =
      if (b.n == 0L) Seq.empty
      else b.sums.map(_ / b.n).toSeq
    override def bufferEncoder: Encoder[VecSumBuf] =
      ExpressionEncoder[VecSumBuf]()
    override def outputEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
  }

  /** Column function: mean vector of an `array<double>` column per
    * group (cast float embeddings with `.cast("array<double>")` at the
    * call site — accumulation is double either way, and the cast makes
    * the input encoder exact).
    */
  val vecAvg: Column => Column = {
    val fn = udaf(new VecAvg, ExpressionEncoder[Seq[Double]]())
    (v: Column) => fn(v)
  }

  /** First + second moments of a vector column in ONE pass: Σx and the
    * upper triangle of Σ x·xᵀ (row-major, d(d+1)/2 doubles) plus the
    * count — everything a covariance matrix needs, as a single
    * mergeable aggregate. The shuffle ships one O(d²) buffer per
    * partition (d=64 → 2 081 doubles ≈ 16 KB), never the member
    * vectors: the covariance of a 100 TB embedding table costs one
    * map-side-combined scan.
    */
  final case class VecMomentsBuf(sums: Array[Double], outer: Array[Double],
      n: Long)

  final class VecMoments
      extends Aggregator[Seq[Double], VecMomentsBuf, VecMomentsBuf] {
    override def zero: VecMomentsBuf =
      VecMomentsBuf(Array.empty, Array.empty, 0L)
    private def add(b: VecMomentsBuf, v: Seq[Double]): VecMomentsBuf = {
      val d = v.size
      val base =
        if (b.n == 0L) VecMomentsBuf(new Array[Double](d),
          new Array[Double](d * (d + 1) / 2), 0L)
        else {
          require(d == b.sums.length,
            s"ragged vector dims: $d vs ${b.sums.length}")
          b
        }
      val s = base.sums
      val o = base.outer
      var i = 0
      var k = 0
      while (i < d) {
        val vi = v(i)
        s(i) += vi
        var j = i
        while (j < d) { o(k) += vi * v(j); j += 1; k += 1 }
        i += 1
      }
      VecMomentsBuf(s, o, base.n + 1)
    }
    override def reduce(b: VecMomentsBuf, v: Seq[Double]): VecMomentsBuf =
      if (v == null) b else add(b, v)
    override def merge(x: VecMomentsBuf, y: VecMomentsBuf): VecMomentsBuf =
      if (x.n == 0L) y
      else if (y.n == 0L) x
      else {
        require(x.sums.length == y.sums.length,
          s"ragged vector dims: ${x.sums.length} vs ${y.sums.length}")
        var i = 0
        while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
        var k = 0
        while (k < x.outer.length) { x.outer(k) += y.outer(k); k += 1 }
        VecMomentsBuf(x.sums, x.outer, x.n + y.n)
      }
    override def finish(b: VecMomentsBuf): VecMomentsBuf = b
    override def bufferEncoder: Encoder[VecMomentsBuf] =
      ExpressionEncoder[VecMomentsBuf]()
    override def outputEncoder: Encoder[VecMomentsBuf] =
      ExpressionEncoder[VecMomentsBuf]()
  }

  val vecMoments: Column => Column = {
    val fn = udaf(new VecMoments, ExpressionEncoder[Seq[Double]]())
    (v: Column) => fn(v)
  }
}
