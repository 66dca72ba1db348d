package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native twin of [[graft.ops.Retrieval.tokenSignMasks]]: per-token
  * bit-packed ±1 sign embeddings from the PORTABLE hash family —
  * bit j of token t's mask is set iff
  * `mix(h28(t), j) = (h28(t)·(2j+1) + j·40503) mod 268435399` is even,
  * with `h28` = first 7 md5 hex digits as a long
  * ([[graft.functions.PortableHash]] — identical arithmetic, so the
  * DuckDB oracle replay is unchanged).
  *
  * Why native: the Column form is a transform→bind→aggregate
  * higher-order chain — CodegenFallback, interpreted boxed lambdas per
  * token×bit, with the md5 re-dispatched through the expression
  * interpreter per token. Here each token is one `MessageDigest`
  * call + a `dim`-step long loop in a static helper the generated
  * code calls directly (guide §4). Profiled at sf0.1 this owned most
  * of the ColBERT index-build pass.
  *
  * Contract matches the HOF form exactly: null token array → null;
  * a null token ELEMENT yields mask 0 (`when(null).otherwise(0)` folds
  * every bit to 0 there) — unreachable from normTokens but preserved.
  */
case class SignMasks(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1 && dim <= 62, s"dim must be in [1, 62], got $dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_sign_masks"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SignMasks.compute(input.asInstanceOf[ArrayData], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.plans.SignMasks.compute($arr, $dim));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SignMasks =
    copy(child = newChild)
}

object SignMasks {
  import graft.functions.PortableHash.{Prime, Salt}

  /** One mask per token: md5 prefix → seeded-mix parity bits. Called
    * from generated code — keep the signature stable.
    */
  def compute(toks: ArrayData, dim: Int): Array[Long] = {
    val n = toks.numElements()
    val out = new Array[Long](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) out(i) = 0L
      else {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        // first 7 hex digits of the digest == top 28 bits
        val p = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) >>> 4
        var mask = 0L
        var j = 0
        while (j < dim) {
          // (p·(2j+1) + j·Salt) < 2^36 — exact in a long, like the
          // Column form under ANSI
          if ((p * (2L * j + 1L) + j * Salt) % Prime % 2L == 0L)
            mask |= 1L << j
          j += 1
        }
        out(i) = mask
      }
      i += 1
    }
    out
  }
}
