package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained-Naive-Bayes token scoring over a SHIPPED model: sum, over an
  * array of tokens, each token's micro-quantized log-likelihood ratio
  * from a pruned model table (`words(i) -> scores(i)`), with tokens
  * absent from the table scoring the model's `unseen` constant — the
  * hot inner loop of [[graft.ops.Importance]]'s serving-side quality
  * gate (the classifier itself trains as DataFrames; this expression is
  * inference over the exported artifact).
  *
  * Why native: the Column fallback looks each token up in a MAP LITERAL
  * (`try_element_at` inside an `aggregate` lambda), and Catalyst map
  * literals are array-backed — every lookup is a LINEAR scan, O(tokens
  * × model) comparisons per row, which at a 4096-entry serving model is
  * ~300k UTF8 comparisons per document. This expression builds a real
  * hash table once per task and scores in O(tokens). Both paths produce
  * IDENTICAL sums (same table, same unseen constant, exact long
  * arithmetic — addition order over longs is associative), so the
  * choice is a pure speed knob.
  *
  * The model ships as part of the expression (plan literals), like
  * [[GreedyTokenize]]'s vocabulary — appropriate for pruned serving
  * models (≤ a few 100k entries), not per-row data.
  */
case class NbScore(
    child: Expression,
    words: Seq[String],
    scores: Seq[Long],
    unseen: Long) extends UnaryExpression {

  require(words.nonEmpty, "graft_nb_score model must be non-empty")
  require(words.size == scores.size,
    s"graft_nb_score model arity mismatch: ${words.size} words, ${scores.size} scores")
  require(words.distinct.size == words.size,
    "graft_nb_score model words must be distinct")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_nb_score"

  @transient private lazy val table = new NbScore.Table(words, scores, unseen)

  override protected def nullSafeEval(input: Any): Any =
    table.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef =
      ctx.addReferenceObj("table", table, classOf[NbScore.Table].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $tableRef.score($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): NbScore =
    copy(child = newChild)
}

object NbScore {
  /** UTF8String-keyed hash table (zero-copy lookups against Tungsten
    * row data). A NULL array element scores `unseen`, mirroring the
    * fallback's `try_element_at(map, NULL) -> NULL -> coalesce`.
    */
  final class Table(words: Seq[String], scores: Seq[Long], unseen: Long)
      extends Serializable {
    private val map = {
      val m = new java.util.HashMap[UTF8String, java.lang.Long](
        words.size * 2)
      words.iterator.zip(scores.iterator).foreach { case (w, s) =>
        m.put(UTF8String.fromString(w), java.lang.Long.valueOf(s))
      }
      m
    }

    def score(tokens: ArrayData): Long = {
      var acc = 0L
      var i = 0
      val n = tokens.numElements()
      while (i < n) {
        if (tokens.isNullAt(i)) acc += unseen
        else {
          val v = map.get(tokens.getUTF8String(i))
          acc += (if (v == null) unseen else v.longValue())
        }
        i += 1
      }
      acc
    }
  }
}
