package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

/** Tight single-pass expressions for the vector/fingerprint hot paths.
  * The built-in `zip_with`/`aggregate` forms are interpreted with
  * per-element expression-tree overhead (~6 node evals per multiply);
  * at pair-join cardinalities that dominates wall-clock (measured ~10 s
  * for 200 k pair dots at sf0.1). These evaluate one JVM loop per row.
  */
object VectorExprs {

  /** Per-element ArrayData accessor expression (Java source) for the
    * numeric element types the vector expressions accept. Int/long
    * elements make the int8-code dot exact (|dot| ≤ dim · 127² ≪ 2⁵³).
    */
  private def elemReader(t: DataType, arr: String, i: String): String =
    t match {
      case ArrayType(FloatType, _) => s"$arr.getFloat($i)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
      case ArrayType(IntegerType, _) => s"$arr.getInt($i)"
      case ArrayType(LongType, _) => s"$arr.getLong($i)"
      case other =>
        throw new IllegalArgumentException(
          s"unsupported vector element type in $other")
    }

  /** Interpreted-path twin of [[elemReader]]: the DataType match
    * resolves ONCE (cache the result in a lazy val), not per element —
    * per-element pattern matching is exactly the interpreted overhead
    * this file exists to avoid.
    */
  private def readerFn(t: DataType): (ArrayData, Int) => Double =
    t match {
      case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => (a, i) => a.getDouble(i)
      case ArrayType(IntegerType, _) => (a, i) => a.getInt(i).toDouble
      case ArrayType(LongType, _) => (a, i) => a.getLong(i).toDouble
      case other =>
        throw new IllegalArgumentException(
          s"unsupported vector element type in $other")
    }

  /** Dot product of two numeric arrays (float or double elements),
    * computed in double, sequential order — same accumulation order as
    * the lambda form and the DuckDB oracle, so 6-decimal parity holds.
    * Implements doGenCode, so similarity scans stay inside whole-stage
    * codegen (null elements read as 0 in both paths).
    */
  final case class DotProductExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private lazy val readL = readerFn(left.dataType)
    private lazy val readR = readerFn(right.dataType)
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i)) {
          s += readL(a, i) * readR(b, i)
        }
        i += 1
      }
      s
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val ax = elemReader(left.dataType, a, i)
        val bx = elemReader(right.dataType, b, i)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    $acc += ((double)$ax) * ((double)$bx);
           |  }
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
    override def prettyName: String = "vec_dot"
  }

  /** Squared euclidean distance of two numeric arrays, computed in
    * double with SEQUENTIAL Σ(aᵢ−bᵢ)² accumulation — the same term
    * order the DuckDB oracle's `list_sum(list_transform(...))` fold
    * uses, so 6-decimal parity holds for distance ARGMAX selections
    * (greedy k-center), where a monotone rewrite via [[DotProductExpr]]
    * (|a|²−2a·b+|b|²) would round differently. Pairs with a null
    * element are skipped in both engines' conventions (non-null
    * synthetic embeddings make this moot in practice). doGenCode keeps
    * the k-per-row distance scans of the selection loop inside
    * whole-stage codegen.
    */
  final case class SqDistExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private lazy val readL = readerFn(left.dataType)
    private lazy val readR = readerFn(right.dataType)
    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i) && !b.isNullAt(i)) {
          val d = readL(a, i) - readR(b, i)
          s += d * d
        }
        i += 1
      }
      s
    }
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val d = ctx.freshName("d")
        val ax = elemReader(left.dataType, a, i)
        val bx = elemReader(right.dataType, b, i)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    double $d = ((double)$ax) - ((double)$bx);
           |    $acc += $d * $d;
           |  }
           |}
           |${ev.value} = $acc;
           |""".stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(left = l, right = r)
    override def prettyName: String = "vec_sqdist"
  }

  /** SimHash-64 of a token array: one pass — per-token XXH64, ±1 votes
    * per bit, sign → bit. Replaces 64 interpreted `aggregate` passes;
    * doGenCode calls the compiled kernel so the projection stays in
    * whole-stage codegen.
    */
  final case class SimHash64Expr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    def compute(toks: ArrayData): Long = {
      val votes = new Array[Int](64)
      val n = toks.numElements()
      var i = 0
      while (i < n) {
        val t = toks.getUTF8String(i)
        if (t != null) {
          val h = XXH64.hashUTF8String(t, 42L)
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) != 0L) votes(bit) += 1 else votes(bit) -= 1
            bit += 1
          }
        }
        i += 1
      }
      var out = 0L
      var bit = 0
      while (bit < 64) {
        if (votes(bit) > 0) out |= (1L << bit)
        bit += 1
      }
      out
    }
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("simhashExpr", this,
        classOf[SimHash64Expr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "simhash64"
  }

  /** Shannon entropy (bits) of the token distribution in one array
    * pass: hash-map counts, then H = log2(n) - Σ c·log2(c) / n — the
    * built-in route (`transform` over `array_distinct` with a nested
    * `filter` count) walks the array once per DISTINCT token,
    * interpreted. Null elements are skipped; an empty (or all-null)
    * array yields 0.0 — matching the DuckDB twin, which computes the
    * same closed form with `log2`. Both engines evaluate in double and
    * results are rounded at the query boundary, absorbing last-ulp
    * log differences (the q68 ln convention).
    */
  final case class TokenEntropyExpr(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = DoubleType
    def compute(toks: ArrayData): Double = {
      val n = toks.numElements()
      val counts = new java.util.HashMap[Any, Int](math.max(16, n * 2))
      var total = 0
      var i = 0
      while (i < n) {
        if (!toks.isNullAt(i)) {
          val t = toks.getUTF8String(i)
          counts.merge(t, 1, (a, b) => a + b)
          total += 1
        }
        i += 1
      }
      if (total == 0) return 0.0
      val ln2 = math.log(2.0)
      var s = 0.0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next().toDouble
        s += c * (math.log(c) / ln2)
      }
      math.log(total.toDouble) / ln2 - s / total
    }
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("tokenEntropyExpr", this,
        classOf[TokenEntropyExpr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "token_entropy"
  }

  /** Symmetric int8 scalar quantization of one embedding in a single
    * pass: struct(scale, q, err) where scale = max|x_i| (double), q_i =
    * round(x_i * 127 / scale) clamped by construction to [-127, 127],
    * and err = max|x_i - q_i * scale / 127| — the 4× memory-compression
    * step an ANN index wants at 100 TB scale (int8 codes + one double
    * per vector instead of float32 payloads). Rounding is half-away-
    * from-zero (C `round`, DuckDB `round`), NOT `Math.round` (half-up)
    * or `rint` (half-even), so the DuckDB oracle replays the identical
    * arithmetic. Null elements quantize to 0 and are skipped in scale /
    * err, matching the SQL twin's COALESCE; an empty or all-zero vector
    * yields scale 0, all-zero codes, err 0. The two interpreted-HOF
    * alternatives both fail at scale: referencing a `scale` alias
    * inside `transform` re-evaluates the max-aggregate per ELEMENT
    * (O(dim²) per row — CollapseProject inlines the projection), and a
    * two-projection form still pays ~6 node evals per element.
    */
  final case class QuantizeInt8Expr(child: Expression)
      extends UnaryExpression {
    private lazy val read = readerFn(child.dataType)
    override def dataType: DataType = StructType(Seq(
      StructField("scale", DoubleType, nullable = false),
      StructField("q", ArrayType(IntegerType, containsNull = false),
        nullable = false),
      StructField("err", DoubleType, nullable = false)))
    private def roundHalfAway(s: Double): Double =
      if (s >= 0) { val f = math.floor(s); if (s - f >= 0.5) f + 1 else f }
      else { val c = math.ceil(s); if (c - s >= 0.5) c - 1 else c }
    def compute(v: ArrayData): InternalRow = {
      val n = v.numElements()
      var scale = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) {
          val a = math.abs(read(v, i))
          if (a > scale) scale = a
        }
        i += 1
      }
      val q = new Array[Int](n)
      var err = 0.0
      if (scale != 0.0) {
        i = 0
        while (i < n) {
          if (!v.isNullAt(i)) {
            val x = read(v, i)
            val r = roundHalfAway(x * 127.0 / scale)
            q(i) = r.toInt
            val e = math.abs(x - r * scale / 127.0)
            if (e > err) err = e
          }
          i += 1
        }
      }
      new GenericInternalRow(
        Array[Any](scale, new GenericArrayData(q), err))
    }
    override def nullSafeEval(input: Any): Any =
      compute(input.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("quantizeInt8Expr", this,
        classOf[QuantizeInt8Expr].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def prettyName: String = "quantize_int8"
  }

  def quantizeInt8(v: Column): Column =
    Bridge.column(QuantizeInt8Expr(Bridge.expression(v)))

  def vecDot(a: Column, b: Column): Column =
    Bridge.column(DotProductExpr(Bridge.expression(a), Bridge.expression(b)))

  def vecSqDist(a: Column, b: Column): Column =
    Bridge.column(SqDistExpr(Bridge.expression(a), Bridge.expression(b)))

  def tokenEntropy(tokens: Column): Column =
    Bridge.column(TokenEntropyExpr(Bridge.expression(tokens)))

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64Expr(Bridge.expression(tokens)))
}
