package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native codegen'd integer dot product over two array<long> columns.
  *
  * Why a custom Catalyst Expression (SURVEY.md §7.3, preference (b)):
  * the composable formulation `aggregate(zip_with(a,b,*),0,+)` uses
  * higher-order functions, which are CodegenFallback — every element
  * goes through an interpreted lambda with boxed accumulators, and the
  * expression gets re-inlined through collapsed projections. On the
  * brute-force similarity join (q46: |queries|×|corpus| pairs × 64
  * dims) that interpretation dominates the query. This expression
  * compiles to a primitive long loop inside whole-stage codegen.
  *
  * Semantics: Σ a(i)·b(i) over i < min(len(a), len(b)); null if either
  * side (or any touched element) is null — callers feed non-null
  * quantized vectors. Norm²(a) is DotQ(a,a).
  */
case class DotQ(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_q expects (array<bigint>, array<bigint>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  /** Either array may carry null ELEMENTS (containsNull) even when the
    * column itself is non-nullable — a touched null element makes the
    * whole dot product null, so nullability must account for it. */
  private def elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true // unresolved: be conservative
  }
  override def nullable: Boolean =
    left.nullable || right.nullable || elementsNullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // ev.isNull is a mutable boolean here iff `nullable` — only emit the
      // element-null branch when elements can actually be null, so the
      // non-null fast path stays a tight primitive loop.
      val nullCheck = if (elementsNullable) {
        s"""if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"""
      } else ""
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine-threshold gate over quantized vectors: with
  * num = Σ a(i)·b(i), evaluates  num > 0 ∧ mulNum·num² ≥ mulDen·d1·d2
  * (i.e. cos ≥ √(mulDen/mulNum) for positive cosines) computing the
  * dot product ONCE.
  *
  * Why: as three separate conjuncts inside a nested-loop join
  * condition (`dotq > 0 && 100*dotq*dotq >= …`) the dot product is
  * re-evaluated three times per candidate pair — join conditions get
  * no subexpression elimination. On q45's all-pairs join that tripled
  * the per-pair cost; this gate is the single-eval form (the q70
  * thresholded-levenshtein trick, generalized to cosine).
  */
case class CosGateQ(a: Expression, b: Expression, d1: Expression,
    d2: Expression, mulNum: Long, mulDen: Long)
    extends QuaternaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = d1
  override def fourth: Expression = d2
  override def dataType: DataType = BooleanType
  override def nullable: Boolean =
    a.nullable || b.nullable || d1.nullable || d2.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (a.dataType, b.dataType, d1.dataType, d2.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "cos_gate_q expects (array<bigint>, array<bigint>, bigint, bigint)")
    }
  }

  override def nullSafeEval(av: Any, bv: Any, d1v: Any, d2v: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var num = 0L
    var i = 0
    while (i < n) {
      num += x.getLong(i) * y.getLong(i)
      i += 1
    }
    num > 0 && mulNum * num * num >= mulDen *
      d1v.asInstanceOf[Long] * d2v.asInstanceOf[Long]
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, n1, n2) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val num = ctx.freshName("num")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $num = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $num += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $num > 0L &&
         |  ${mulNum}L * $num * $num >= ${mulDen}L * $n1 * $n2;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): CosGateQ =
    copy(a = f, b = s, d1 = t, d2 = q)
}

object VectorExprs {
  /** Column wrapper for [[DotQ]]. */
  def dot_q(a: Column, b: Column): Column =
    ColumnBridge.column(DotQ(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  /** Column wrapper for [[CosGateQ]]. */
  def cos_gate_q(a: Column, b: Column, d1: Column, d2: Column,
      mulNum: Long, mulDen: Long): Column =
    ColumnBridge.column(CosGateQ(ColumnBridge.expression(a),
      ColumnBridge.expression(b), ColumnBridge.expression(d1),
      ColumnBridge.expression(d2), mulNum, mulDen))
}
