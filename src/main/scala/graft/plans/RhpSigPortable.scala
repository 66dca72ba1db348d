package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native twin of [[graft.ops.Similarity.rhpSignaturePortablePre]]: the
  * PORTABLE random-hyperplane signature over a quantized vector — bit p
  * is `1` iff `Σ_j qv(j) · sign(p, j) ≥ 0` with
  * `sign(p, j) = +1` iff `h28("p,j")` is even
  * ([[graft.functions.PortableHash.h28Local]], bit-identical to the
  * in-engine md5 form the oracle replays).
  *
  * Why native: the Column form walks a transform→zip_with→aggregate
  * higher-order chain — CodegenFallback, interpreted boxed lambdas per
  * row × plane × component (rows × 32 × 64 steps on the LSH-portable
  * pair path, profiled as that family's dominant stage). Here the ±1
  * matrix folds once at construction and the projection is one
  * primitive nested loop the generated code calls directly.
  *
  * Contract matches the HOF form exactly: a NULL vector and a vector
  * whose length differs from `dim` both yield ALL-ZERO bits — the
  * outer `transform` there runs over a constant plane sequence, so the
  * null (or the `zip_with` null-pad) poisons only the dot and
  * `when(null ≥ 0)` takes the 0 branch per plane, never the row.
  * (Both are unreachable from [[graft.ops.Similarity.rhpBandedPortable]],
  * which rejects ragged/null embeddings loudly first.) Elements are
  * assumed non-null (quantization never produces them).
  */
case class RhpSigPortable(child: Expression, planes: Int, dim: Int)
    extends UnaryExpression {
  require(planes >= 1, s"planes must be >= 1, got $planes")
  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_rhp_sig_portable"

  // ±1 plane matrix, folded once — pure function of (p, j), same
  // h28Local the Column form folds into its literal
  private lazy val signs: Array[Array[Long]] = Array.tabulate(planes) { p =>
    Array.tabulate(dim) { j =>
      if (graft.functions.PortableHash.h28Local(s"$p,$j") % 2 == 0) 1L
      else -1L
    }
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    new GenericArrayData(
      if (v == null) new Array[Long](planes)
      else RhpSigPortable.compute(v.asInstanceOf[ArrayData], signs, dim))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    val mat = ctx.addReferenceObj("rhpSigns", signs, "long[][]")
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            ${childGen.isNull} ? new long[$planes] :
              graft.plans.RhpSigPortable.compute(${childGen.value}, $mat, $dim));
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSigPortable =
    copy(child = newChild)
}

object RhpSigPortable {
  /** All plane projections of one vector. Called from generated code —
    * keep the signature stable.
    */
  def compute(qv: ArrayData, signs: Array[Array[Long]], dim: Int): Array[Long] = {
    val planes = signs.length
    val out = new Array[Long](planes)
    if (qv.numElements() != dim) return out // zip_with null-pad → all 0
    val v = qv.toLongArray()
    var p = 0
    while (p < planes) {
      val row = signs(p)
      var acc = 0L
      var j = 0
      while (j < dim) { acc += v(j) * row(j); j += 1 }
      out(p) = if (acc >= 0L) 1L else 0L
      p += 1
    }
    out
  }
}
