package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting",
  * SIGMOD 2003) — the anchor-selection primitive behind
  * substring-level exact-duplicate detection (the MOSS family, and
  * the "dedup training data at the substring level" pipelines of
  * Lee et al. 2022).
  *
  * The problem content-defined selection solves: fixed-stride window
  * sampling can NEVER align the same substring across two documents
  * that embed it at different offsets, while keeping every k-gram is
  * O(|text|) rows per document. Winnowing selects the RIGHTMOST
  * minimal rolling hash in every w-wide window of k-gram hashes —
  * a selection that depends only on the local content, so the same
  * substring selects the same anchors wherever it appears, with the
  * published guarantee: any substring of length >= w + k - 1 shared
  * by two documents shares at least one selected anchor, at an
  * expected density of 2/(w+1) anchors per position.
  *
  * The hash ONLY drives selection — downstream joins group on the
  * anchor k-gram STRING, so hash parity with the DuckDB oracle is
  * needed for which positions are picked (deterministic integer
  * math both engines replay exactly), never for equality semantics.
  */
object WinnowExprs {

  /** Modulus / base of the polynomial rolling hash. Both fit the
    * no-overflow budget of 64-bit signed arithmetic (max intermediate
    * ~max-codepoint x M ~ 1.1e15) AND of DuckDB BIGINT in the oracle's
    * nested list comprehension, so the two engines compute bit-equal
    * selections without 128-bit help.
    */
  val M = 1000000007L
  val B = 131L

  /** Selected anchor k-grams of `child`, in text order (duplicate
    * STRINGS possible when distinct positions carry equal grams —
    * callers wanting the per-document anchor set wrap with
    * `array_distinct`). Documents shorter than k codepoints yield an
    * empty array. Positions are Unicode code points, matching
    * DuckDB's codepoint-based `substr`/`unicode`.
    *
    * One O(|text|) pass per row: codepoint decode, rolling-hash
    * recurrence, and a w-bounded scan per window; `doGenCode` keeps
    * the projection inside whole-stage codegen with a single
    * compiled-kernel call per row.
    */
  final case class WinnowGramsExpr(child: Expression, k: Int, w: Int)
      extends UnaryExpression {
    require(k >= 1 && w >= 1, "winnow_grams needs k >= 1 and w >= 1")

    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)

    def compute(in: UTF8String): ArrayData = {
      val cps = in.toString.codePoints().toArray
      val n = cps.length
      val nh = n - k + 1
      if (nh < 1) return new GenericArrayData(Array.empty[Any])
      // pw0 = B^(k-1) mod M, the weight the rolling recurrence retires
      var pw0 = 1L
      var t = 0
      while (t < k - 1) { pw0 = pw0 * B % M; t += 1 }
      // h(i) = sum_j cps(i+j) * B^(k-1-j) mod M, by Horner + rolling
      val h = new Array[Long](nh)
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * B + cps(j)) % M; j += 1 }
      h(0) = acc
      var i = 1
      while (i < nh) {
        acc = ((acc - cps(i - 1) * pw0 % M + M) % M * B + cps(i + k - 1)) % M
        h(i) = acc
        i += 1
      }
      // winnowing selection: rightmost minimum of each w-window
      // (<= keeps the rightmost while scanning left to right); a text
      // with fewer than w hashes gets one truncated window so short
      // docs still fingerprint
      val nw = math.max(1, nh - w + 1)
      val selected = new java.util.TreeSet[Integer]()
      var p = 0
      while (p < nw) {
        val end = math.min(p + w, nh)
        var best = p
        var q = p + 1
        while (q < end) { if (h(q) <= h(best)) best = q; q += 1 }
        selected.add(best)
        p += 1
      }
      val out = new Array[Any](selected.size)
      val it = selected.iterator()
      var x = 0
      while (it.hasNext) {
        out(x) = UTF8String.fromString(new String(cps, it.next().intValue, k))
        x += 1
      }
      new GenericArrayData(out)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("winnowGramsExpr", this,
        classOf[WinnowGramsExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "winnow_grams"
  }

  def winnowGrams(c: Column, k: Int = 8, w: Int = 4): Column =
    Bridge.column(WinnowGramsExpr(Bridge.expression(c), k, w))
}
