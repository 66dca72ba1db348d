package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer dot product of two `array<bigint>` columns.
  *
  * The operator library's cosine path ([[graft.ops.Similarity]]) quantizes
  * float embeddings to exact longs and folds a dot product per candidate
  * pair. The built-in formulation — `aggregate(zip_with(a, b, _*_), 0, +)` —
  * allocates an intermediate array and walks interpreted lambda closures
  * per element, and higher-order functions are excluded from whole-stage
  * codegen. This native expression compiles to a tight primitive loop
  * inside the generated code: no allocation, no virtual calls, stays
  * inside the WholeStageCodegen span.
  *
  * Overflow: quantized components are bounded (|q| ≤ ~10^5 for unit-norm
  * embeddings at scale 10^4), so a 4096-dim dot stays < 2^63 — plain long
  * arithmetic is exact; no ANSI check needed on the hot path.
  *
  * Null contract: null input array → null result; elements are assumed
  * non-null (quantization never produces null elements). Length mismatch
  * takes the common prefix.
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_qdot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}
