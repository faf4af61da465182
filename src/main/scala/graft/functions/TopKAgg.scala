package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Grouped top-k as a typed `Aggregator` with a bounded buffer — the
  * scale-correct form of "best k rows per group": the window
  * (`row_number ≤ k`) form shuffles EVERY scored row to its group's
  * partition and sorts; this aggregates map-side first, so each
  * partition contributes at most k candidates per group to the
  * shuffle — the same partial/final shape as a `sum`, with k-bounded
  * state (SURVEY.md §2.10's declared bounded-heap aggregate).
  *
  * Order: score descending, id ascending on ties — matching the
  * `ORDER BY score DESC, id` convention the oracle SQL uses, so
  * results are deterministic and engine-comparable.
  */
object TopKAgg {

  final case class ScoredId(id: Long, score: Double)

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  final class TopK(k: Int)
      extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    require(k > 0, s"k must be positive, got $k")
    override def zero: Seq[ScoredId] = Nil
    override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
      // buffer stays sorted and ≤ k; the common no-op case (full
      // buffer, candidate worse than the current k-th) is O(1)
      if (b.size >= k && ord.gteq(a, b.last)) b
      else ((b :+ a).sorted(ord)).take(k)
    override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
      (x ++ y).sorted(ord).take(k)
    override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r.sorted(ord)
    override def bufferEncoder: Encoder[Seq[ScoredId]] =
      ExpressionEncoder[Seq[ScoredId]]()
    override def outputEncoder: Encoder[Seq[ScoredId]] =
      ExpressionEncoder[Seq[ScoredId]]()
  }

  /** Column function: `topK(k)(idCol, scoreCol)` aggregates to an
    * array of the k best (id, score) structs per group (udaf flattens
    * the product input into one argument per field).
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopK(k), ExpressionEncoder[ScoredId]())
    (id: Column, score: Column) => fn(id, score)
  }
}
