package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native distance/product kernels for the PQ index build and search —
  * same rationale as [[CosineSim]]: the HOF formulation
  * (`aggregate(zip_with(...))`) is CodegenFallback and interprets a
  * lambda per element with an intermediate zipped array per pair; these
  * compile to one fused loop inside whole-stage codegen. Both fold in
  * sequential index order, bit-identical to the `list_reduce` twins the
  * DuckDB oracle runs.
  */
trait VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE> inputs, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }
}

/** `graft_dist2(a, b)` — squared L2 distance, the PQ/k-means assignment
  * metric (argmin over centroids; sqrt never needed for argmin).
  */
case class SquaredDistance(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "graft_dist2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0; var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.$lGet($i) - (double) $b.$rGet($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

/** `graft_dot(a, b)` — plain inner product, the PQ ADC table entry
  * (cosine = Σ_j dot(q_j, c_j) / (|q|·|x̂|), assembled from per-subspace
  * dots).
  */
case class DotProduct(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (elemIsFloat(left), elemIsFloat(right))
    var acc = 0.0; var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_adc(codes, flat, kSub)` — asymmetric-distance-computation
  * lookup: Σ_j flat[j·kSub + codes[j]], the PQ search inner loop. `flat`
  * is a query's per-(subspace, centroid) dot-product table flattened
  * sub-major; `codes` is a corpus vector's m-byte PQ code word. One
  * compiled loop of m array reads per (query, vector) pair — the whole
  * point of PQ search: no per-pair float vector arithmetic at all.
  * Folds in subspace order, bit-identical to the oracle's `list_reduce`.
  * Out-of-range codes contribute nothing (unreachable for codes produced
  * by the paired encoder; guards against a caller mixing kSub values).
  */
case class PqAdc(left: Expression, right: Expression, kSub: Int)
    extends BinaryExpression {

  require(kSub > 0, s"graft_pq_adc requires positive kSub, got $kSub")

  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<INT> codes, ARRAY<DOUBLE> flat), " +
          s"got ${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (codes, flat) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val m = codes.numElements()
    val n = flat.numElements()
    var acc = 0.0; var j = 0
    while (j < m) {
      if (!codes.isNullAt(j)) {
        val idx = j * kSub + codes.getInt(j)
        if (idx >= 0 && idx < n) acc += flat.getDouble(idx)
      }
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m"); val n = ctx.freshName("n")
      val j = ctx.freshName("j"); val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |int $n = $b.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    int $idx = $j * $kSub + $a.getInt($j);
         |    if ($idx >= 0 && $idx < $n) $acc += $b.getDouble($idx);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** `graft_pq_adc_packed(codesBinary, flat, kSub)` — [[PqAdc]] over
  * BYTE-PACKED code words: the m codes are scanned straight out of a
  * BINARY column (1 byte per code, read unsigned — kSub ≤ 256), which
  * makes "m bytes + a norm per vector" the literal at-rest scan payload,
  * not an approximation over ARRAY<INT> (4 B + offsets per code). Same
  * fold order as the unpacked kernel, so results are bit-equal.
  */
case class PqAdcPacked(left: Expression, right: Expression, kSub: Int)
    extends BinaryExpression {

  require(kSub > 0 && kSub <= 256,
    s"graft_pq_adc_packed requires 0 < kSub <= 256 (one byte per code), got $kSub")

  override def prettyName: String = "graft_pq_adc_packed"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY codes, ARRAY<DOUBLE> flat), " +
          s"got ${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[Array[Byte]]
    val flat = b.asInstanceOf[ArrayData]
    val n = flat.numElements()
    var acc = 0.0; var j = 0
    while (j < codes.length) {
      val idx = j * kSub + (codes(j) & 0xff)
      if (idx < n) acc += flat.getDouble(idx)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val j = ctx.freshName("j")
      val idx = ctx.freshName("idx"); val acc = ctx.freshName("acc")
      s"""
         |int $n = $b.numElements();
         |double $acc = 0.0;
         |for (int $j = 0; $j < $a.length; $j++) {
         |  int $idx = $j * $kSub + (((int) $a[$j]) & 0xff);
         |  if ($idx < $n) $acc += $b.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcPacked =
    copy(left = newLeft, right = newRight)
}

/** `graft_binary_sketch(vec, bits)` — sign-bit sketch of the first
  * `bits` dims packed into one long (bit i set iff `vec[i] > 0`), the
  * compiled twin of the declarative
  * [[graft.ops.Similarity.binarySketchExpr]] fold (63 interpreted
  * lambda steps per row; at 500k×64d the interpreted sketch alone costs
  * more than the full compiled-cosine scan it is meant to undercut).
  */
case class BinarySketch(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"graft_binary_sketch bits in [1,63], got $bits")
  override def prettyName: String = "graft_binary_sketch"
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${dt.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(bits, x.numElements())
    val f = elemIsFloat
    var acc = 0L; var i = 0
    while (i < n) {
      val xv = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      if (xv > 0.0) acc |= (1L << i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($bits, $v.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (((double) $v.$get($i)) > 0.0) $acc |= (1L << $i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): BinarySketch =
    copy(child = c)
}
