package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String expressions whose exact semantics the built-ins can't match.
  */
object StringExprs {

  /** Exact pandas/CPython `str.title()` (reference main.py:390-391):
    * a cased character is titlecased when the PREVIOUS character is
    * uncased, lowercased otherwise — so capitalization restarts after
    * ANY non-letter (`o'neill` → `O'Neill`, `mcdonald-smith` →
    * `Mcdonald-Smith`), where Spark's `initcap` restarts only after
    * whitespace (`O'neill`). One pass per row, doGenCode keeps the
    * projection inside whole-stage codegen.
    *
    * "Cased" follows CPython's definition (upper, lower, or titlecase
    * letters); uncased letters (e.g. CJK) don't restart capitalization,
    * matching pandas exactly.
    *
    * Known divergence: case mappings are per-codepoint
    * (Character.toTitleCase/toLowerCase), so characters whose CPython
    * full mapping EXPANDS differ — pandas titles `ß` to `Ss` and the
    * `ﬁ` ligature to `Fi`; this expression leaves them single-width.
    * Single-codepoint mappings (the entirety of Latin-1 names, and
    * everything in the CRM reference data) match exactly.
    */
  final case class PandasTitleExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType

    def compute(in: UTF8String): UTF8String = {
      val s = in.toString
      val sb = new java.lang.StringBuilder(s.length)
      var prevCased = false
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        val cased = Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
          Character.getType(cp) == Character.TITLECASE_LETTER
        if (cased) {
          if (prevCased) sb.appendCodePoint(Character.toLowerCase(cp))
          else sb.appendCodePoint(Character.toTitleCase(cp))
        } else sb.appendCodePoint(cp)
        prevCased = cased
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("pandasTitleExpr", this,
        classOf[PandasTitleExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "pandas_title"
  }

  def pandasTitle(c: Column): Column =
    Bridge.column(PandasTitleExpr(Bridge.expression(c)))

  /** Unicode NFC normalization (canonical composition) — the first
    * cleanup step of any multilingual training-data pipeline: crawled
    * text mixes precomposed (`é`) and decomposed (`e` + U+0301)
    * encodings of the SAME string, so exact dedup, vocabulary builds,
    * and content-keyed sampling all silently fracture until the corpus
    * is normalized to one canonical form. Spark has no built-in
    * normalizer; this wraps `java.text.Normalizer` (ICU-equivalent NFC
    * per Unicode TR15 — bit-identical to DuckDB's utf8proc
    * `nfc_normalize`, which the oracle replays) as a single-pass
    * expression with `doGenCode`, so normalizing projections stay
    * inside whole-stage codegen.
    *
    * The `Normalizer.isNormalized` pre-check makes the common case
    * (already-NFC ASCII/UTF-8 crawl text) a zero-allocation scan —
    * at 100 TB that is the difference between a free pass and
    * re-materializing every string.
    */
  final case class NfcNormalizeExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = StringType

    def compute(in: UTF8String): UTF8String = {
      val s = in.toString
      if (java.text.Normalizer.isNormalized(s,
          java.text.Normalizer.Form.NFC)) in
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }

    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("nfcNormalizeExpr", this,
        classOf[NfcNormalizeExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "nfc_normalize"
  }

  def nfcNormalize(c: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(c)))

  /** Jaro-Winkler similarity — the record-linkage scorer for short
    * strings (names, addresses) where edit distance over-penalizes
    * transpositions. Spark has no built-in; this implements the
    * standard published algorithm (Winkler 1990): Jaro = mean of
    * (m/|s|, m/|t|, (m − x/2)/m) over window-bounded greedy matches
    * (window = ⌊max len/2⌋ − 1, x = mismatched aligned positions),
    * plus the prefix bonus ℓ·0.1·(1 − jaro) for the common prefix
    * ℓ ≤ 4, applied only above the 0.7 boost threshold. Empty input
    * on either side scores 0 (both-empty included) — calibrated
    * against DuckDB's `jaro_winkler_similarity` (rapidfuzz), which
    * the oracle replays; results agree to well under 1e-6 on every
    * probed case, and queries floor-round at 6 decimals.
    *
    * Per-row cost is O(|s|·window) with two small boolean scratch
    * arrays — a narrow codegen'd projection (`doGenCode`), no joins,
    * no state; comparisons are per-UTF-16-unit (exact for the
    * Basic Multilingual Plane).
    */
  final case class JaroWinklerExpr(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.DoubleType

    def compute(l: UTF8String, r: UTF8String): Double = {
      val s = l.toString
      val t = r.toString
      val ls = s.length
      val lt = t.length
      if (ls == 0 || lt == 0) return 0.0
      val window = math.max(math.max(ls, lt) / 2 - 1, 0)
      val sM = new Array[Boolean](ls)
      val tM = new Array[Boolean](lt)
      var m = 0
      var i = 0
      while (i < ls) {
        val c = s.charAt(i)
        var j = math.max(0, i - window)
        val hi = math.min(lt - 1, i + window)
        var found = false
        while (j <= hi && !found) {
          if (!tM(j) && t.charAt(j) == c) {
            sM(i) = true; tM(j) = true; m += 1; found = true
          }
          j += 1
        }
        i += 1
      }
      if (m == 0) return 0.0
      var mismatch = 0
      var k = 0
      i = 0
      while (i < ls) {
        if (sM(i)) {
          while (!tM(k)) k += 1
          if (s.charAt(i) != t.charAt(k)) mismatch += 1
          k += 1
        }
        i += 1
      }
      val jaro = (m.toDouble / ls + m.toDouble / lt +
        (m - mismatch / 2.0) / m) / 3.0
      if (jaro <= 0.7) jaro
      else {
        val maxPre = math.min(4, math.min(ls, lt))
        var p = 0
        while (p < maxPre && s.charAt(p) == t.charAt(p)) p += 1
        jaro + p * 0.1 * (1.0 - jaro)
      }
    }

    override def nullSafeEval(l: Any, r: Any): Any =
      compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("jaroWinklerExpr", this,
        classOf[JaroWinklerExpr].getName)
      nullSafeCodeGen(ctx, ev,
        (a, b) => s"${ev.value} = $ref.compute($a, $b);")
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
    override def prettyName: String = "jaro_winkler"
  }

  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerExpr(Bridge.expression(a), Bridge.expression(b)))
}
