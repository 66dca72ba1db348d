package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Codegen'd late-interaction MaxSim score over bit-packed ±1 sign
  * masks ([[graft.ops.Retrieval.tokenSignMasks]]):
  *
  *   score(q, d) = Σ_{t ∈ qsv}  ( dim − 2 · min_{s ∈ csv} popcount(t XOR s) )
  *
  * — the exact integer the built-in formulation
  * `aggregate(qsv, 0L, (acc, t) => acc + dim − 2·array_min(transform(csv,
  * s => bit_count(t^s))))` computes, but as one tight primitive loop
  * inside whole-stage codegen. Higher-order functions are
  * CodegenFallback: every candidate pair walked interpreted lambda
  * closures over qsv×csv (≤ 16×64 boxed steps), which profiling showed
  * owned ~2 s of every ColBERT-family serve at sf0.1 (guide §4: prefer
  * codegen-friendly expressions on the hot path). `Long.bitCount`
  * compiles to POPCNT.
  *
  * Null/empty contract — matches the HOF form bit for bit: any null
  * input → null; empty qsv → 0 (fold over nothing); non-empty qsv with
  * empty csv → null (`array_min(empty)` is null and the fold's `+`
  * propagates it). Elements are assumed non-null (sign masks never
  * are). `dim` must be a foldable int — it is the mask width, a
  * constant of the index layout.
  */
case class MaxSimScore(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (!arr(first.dataType) || !arr(second.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, " +
          s"got ${first.dataType.catalogString} and ${second.dataType.catalogString}")
    else if (third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable int dim, got ${third.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_maxsim"

  override def nullSafeEval(q: Any, c: Any, d: Any): Any = {
    val qs = q.asInstanceOf[ArrayData]
    val cs = c.asInstanceOf[ArrayData]
    val dim = d.asInstanceOf[Int]
    val nq = qs.numElements()
    val nc = cs.numElements()
    if (nq == 0) return 0L
    if (nc == 0) return null
    var acc = 0L
    var i = 0
    while (i < nq) {
      val t = qs.getLong(i)
      var best = Integer.MAX_VALUE
      var j = 0
      while (j < nc) {
        val h = java.lang.Long.bitCount(t ^ cs.getLong(j))
        if (h < best) best = h
        j += 1
      }
      acc += dim.toLong - 2L * best
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, d) => {
      val nq = ctx.freshName("nq")
      val nc = ctx.freshName("nc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val best = ctx.freshName("best")
      val h = ctx.freshName("h")
      val acc = ctx.freshName("acc")
      s"""
         |final int $nq = $q.numElements();
         |final int $nc = $c.numElements();
         |if ($nq > 0 && $nc == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $nq; $i++) {
         |    final long $t = $q.getLong($i);
         |    int $best = Integer.MAX_VALUE;
         |    for (int $j = 0; $j < $nc; $j++) {
         |      final int $h = java.lang.Long.bitCount($t ^ $c.getLong($j));
         |      if ($h < $best) $best = $h;
         |    }
         |    $acc += (long) $d - 2L * $best;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): MaxSimScore =
    copy(first = newFirst, second = newSecond, third = newThird)
}
