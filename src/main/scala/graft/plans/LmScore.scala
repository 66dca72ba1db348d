package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stupid-Backoff trigram-LM document scoring over a SHIPPED model —
  * the serving half of [[graft.ops.Importance.trigramBackoffSurprisal]]
  * (the KenLM deployment shape: CCNet trains the LM once, prunes it,
  * and ships the table to every filter worker). Sums, over the token
  * array, each position's micro-quantized surprisal with the full
  * backoff chain evaluated in-row:
  *
  *   - position 1: `U`-tier (add-one unigram) else `oov1`;
  *   - position 2: `B`-tier (bigram) else `F`-tier (α·unigram floor)
  *     else `oov2`;
  *   - positions ≥ 3: `T`-tier (trigram) else `C`-tier (α·bigram) else
  *     `G`-tier (α²·unigram floor) else `oov3`.
  *
  * The six tables ship as ONE prefixed key space (`U·w`, `B·u·w`,
  * `F·w`, `T·u·v·w`, `C·v·w`, `G·w`, parts joined by [[LmScore.Sep]])
  * so the expression carries a single
  * `keys/scores` pair — every score was quantized IN-ENGINE at train
  * time (one fixed double per distinct key over exact integer counts),
  * so serving sums the identical longs the batch scorer sums.
  *
  * Why native: the Column fallback chains `try_element_at` lookups on a
  * MAP LITERAL — array-backed in Catalyst, so every lookup is a LINEAR
  * scan and a trigram miss pays three of them. This expression builds
  * one hash table per task and scores in O(tokens). Both paths produce
  * IDENTICAL sums (same tables, same constants, exact long arithmetic).
  *
  * Dropping an n-gram from a pruned model does NOT floor to `oov` — it
  * falls to the NEXT TIER, exactly like a pruned KenLM: the model
  * degrades smoothly instead of cliffing.
  */
case class LmScore(
    child: Expression,
    keys: Seq[String],
    scores: Seq[Long],
    oov1: Long,
    oov2: Long,
    oov3: Long) extends UnaryExpression {

  require(keys.nonEmpty, "graft_lm_score model must be non-empty")
  require(keys.size == scores.size,
    s"graft_lm_score model arity mismatch: ${keys.size} keys, ${scores.size} scores")
  require(keys.distinct.size == keys.size,
    "graft_lm_score model keys must be distinct")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_lm_score"

  @transient private lazy val table =
    new LmScore.Table(keys, scores, oov1, oov2, oov3)

  override protected def nullSafeEval(input: Any): Any =
    table.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef =
      ctx.addReferenceObj("table", table, classOf[LmScore.Table].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $tableRef.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): LmScore =
    copy(child = newChild)
}

object LmScore {
  /** Key-part separator (U+0001). NOT whitespace, so a hostile
    * document CAN smuggle it through the whitespace split —
    * [[graft.ops.Importance.trainLmServing]] therefore REJECTS
    * Sep-carrying train tokens loudly at train time. With a Sep-free
    * trained vocabulary, a Sep-carrying serving token builds a key
    * whose part count matches no trained key in its tier, so it can
    * only miss (scores like any unseen token) — never silently hit
    * another n-gram's score.
    */
  val Sep: String = "\u0001"

  /** UTF8String-keyed hash table over the prefixed key space. NULL
    * array elements score like unseen tokens at their position's tier
    * (the token can match no table key), mirroring the fallback's
    * NULL-propagating `concat` + `coalesce`.
    */
  final class Table(
      keys: Seq[String], scores: Seq[Long],
      oov1: Long, oov2: Long, oov3: Long) extends Serializable {
    private val sep = UTF8String.fromString(Sep)
    private val map = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](keys.size * 2)
      keys.iterator.zip(scores.iterator).foreach { case (k, s) =>
        m.put(UTF8String.fromString(k), java.lang.Long.valueOf(s))
      }
      m
    }

    private def get(parts: UTF8String*): java.lang.Long =
      if (parts.exists(_ == null)) null
      else map.get(UTF8String.concat(parts: _*))

    private val uP = UTF8String.fromString("U")
    private val bP = UTF8String.fromString("B")
    private val fP = UTF8String.fromString("F")
    private val tP = UTF8String.fromString("T")
    private val cP = UTF8String.fromString("C")
    private val gP = UTF8String.fromString("G")

    def score(tokens: ArrayData): Long = {
      val n = tokens.numElements()
      if (n == 0) return 0L
      def tok(i: Int): UTF8String =
        if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      var acc = 0L
      val w1 = tok(0)
      val u = get(uP, sep, w1)
      acc += (if (u == null) oov1 else u.longValue())
      if (n >= 2) {
        val w2 = tok(1)
        val b = get(bP, sep, w1, sep, w2)
        acc += (if (b != null) b.longValue() else {
          val f = get(fP, sep, w2)
          if (f == null) oov2 else f.longValue()
        })
      }
      var i = 2
      while (i < n) {
        val (wu, wv, ww) = (tok(i - 2), tok(i - 1), tok(i))
        val t = get(tP, sep, wu, sep, wv, sep, ww)
        acc += (if (t != null) t.longValue() else {
          val c = get(cP, sep, wv, sep, ww)
          if (c != null) c.longValue() else {
            val g = get(gP, sep, ww)
            if (g == null) oov3 else g.longValue()
          }
        })
        i += 1
      }
      acc
    }
  }
}
