package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Classic 64-bit SimHash over an array of (token) hashes: bit b of the
  * fingerprint is the sign of Σ_tokens (±1 from bit b of the token hash).
  * Returns `array<bigint>` of [hi32, lo32] (two non-negative halves — one
  * packed signed long would overflow ANSI arithmetic downstream).
  *
  * Why native: per-bit votes need `(h >> b) & 1` with a VARIABLE shift,
  * which the Column lambda API cannot express (`shiftright` takes a
  * literal); the pure-Column fallback in [[graft.ops.Dedup.simHash]] works
  * around that with 64 separately-seeded hashes per token — 64× the hash
  * work. This expression makes one pass over the hash array with free bit
  * shifts, inside whole-stage codegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) { if (votes(b) >= 0) hi |= (1L << b); b += 1 }
    while (b < 64) { if (votes(b) >= 0) lo |= (1L << (b - 32)); b += 1 }
    new GenericArrayData(Array(hi, lo))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val hi = ctx.freshName("hi")
      val lo = ctx.freshName("lo")
      s"""
         |final int[] $votes = new int[64];
         |final int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += (($h >>> $b) & 1L) == 1L ? 1 : -1;
         |  }
         |}
         |long $hi = 0L; long $lo = 0L;
         |for (int $b = 0; $b < 32; $b++) { if ($votes[$b] >= 0) $hi |= (1L << $b); }
         |for (int $b = 32; $b < 64; $b++) { if ($votes[$b] >= 0) $lo |= (1L << ($b - 32)); }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[]{$hi, $lo});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
