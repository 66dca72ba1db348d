package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Random-hyperplane LSH signature: bit p = sign of dot(v, plane_p), where
  * component j of plane_p is ±1 derived from SplitMix64(p * 0x10001 + j)
  * parity. No stored plane matrix — the "model" is a hash function, so the
  * signature ships inside the plan and is identical on every executor.
  *
  * Why native: the Column formulation nests aggregate-over-zip_with inside
  * a transform over planes — planes × dim interpreted lambda calls and one
  * xxhash64 per (plane, component). Here the plane weights are two shifts
  * and a multiply each, in one codegen'd pass: O(planes × dim) primitive
  * ops, no allocation beyond the output array.
  */
case class RhpSig(child: Expression, planes: Int) extends UnaryExpression {

  private lazy val elementIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_rhp_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long](planes)
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (elementIsFloat) v.getFloat(j).toDouble else v.getDouble(j)
        dot += (if ((RhpSig.mix(p.toLong * 0x10001L + j) & 1L) == 0L) x else -x)
        j += 1
      }
      out(p) = if (dot >= 0) 1L else 0L
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val getter = if (elementIsFloat) "getFloat" else "getDouble"
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val dot = ctx.freshName("dot")
      val x = ctx.freshName("x")
      val mixCls = RhpSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final long[] $out = new long[$planes];
         |final int $n = $arr.numElements();
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final double $x = (double) $arr.$getter($j);
         |    $dot += (($mixCls.mix(((long) $p) * 0x10001L + $j) & 1L) == 0L) ? $x : -$x;
         |  }
         |  $out[$p] = $dot >= 0 ? 1L : 0L;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RhpSig =
    copy(child = newChild)
}

object RhpSig {
  /** SplitMix64 finalizer — public so generated code can call it. */
  def mix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
