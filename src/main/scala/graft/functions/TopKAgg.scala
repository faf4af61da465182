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

  // + 0.0 canonicalizes -0.0 so the tie falls to the id (SQL treats
  // -0.0 == 0.0; Scala's TotalOrdering does not). Scores are required
  // FINITE at the operator boundary (knnJoin drops null/NaN rows) —
  // Scala's NaN total order is the reverse of SQL's NaN-first DESC,
  // so letting NaN in here would silently diverge from the oracle.
  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-(s.score + 0.0), s.id))

  final class TopK(k: Int)
      extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
    require(k > 0, s"k must be positive, got $k")
    override def zero: Seq[ScoredId] = Nil
    // buffer invariant: sorted by `ord`, size ≤ k
    override def reduce(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
      // common no-op case (full buffer, candidate no better than the
      // current k-th) is O(1); otherwise one O(k) sorted insertion
      if (b.size >= k && ord.gteq(a, b.last)) b
      else {
        val (better, worse) = b.span(x => ord.lteq(x, a))
        ((better :+ a) ++ worse).take(k)
      }
    override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
      // merge of two sorted runs, O(k)
      (x ++ y).sorted(ord).take(k)
    override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r // sorted already
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
