package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** OPTIMAL-segmentation tokenizer application (the unigram-LM /
  * SentencePiece inference shape): emit the vocabulary-id sequence whose
  * total integer cost is MINIMAL — `costs(id)` per emitted token,
  * `unkCost` per unmatched code point (emitted as -1) — instead of
  * [[GreedyTokenize]]'s leftmost-longest heuristic. With all-ones costs
  * this is the minimal-token-count segmentation (greedy's local choice
  * can strand a longer match downstream: vocab {ab,a,bcd}, text "abcd" —
  * greedy ab|c|d = 3 tokens, Viterbi a|bcd = 2); with trained
  * per-token surprisal costs it is exact unigram-LM Viterbi decoding.
  *
  * Per-position tie-break: lower cost, then longer token, then real
  * token over unknown (id DESC — two DISTINCT vocab entries of equal
  * length can never both match the same span, so the only id collision
  * is unknown (-1) vs a length-1 token). The backpointer is therefore
  * unique at every position and the sequence replays in SQL as
  * `ORDER BY cost, len DESC, id DESC LIMIT 1` per DP step.
  *
  * Why native: the DP is inherently sequential per row; this walks the
  * SHARED prebuilt code-point trie ([[GreedyTokenize.Trie]]) once per
  * start position — O(len × maxTokenLen) + O(len) backtrack, the same
  * bound as greedy, zero per-step allocation. The Column fallback in
  * [[graft.ops.TextAnalysis.viterbiTokenizeIds]] produces IDENTICAL ids.
  * Vocab and costs ship as plan literals (the trained-artifact pattern,
  * like [[GreedyTokenize]]).
  */
case class ViterbiTokenize(
    child: Expression,
    vocab: Seq[String],
    costs: Seq[Int],
    unkCost: Int) extends UnaryExpression {

  require(vocab.nonEmpty, "graft_viterbi_tokenize vocab must be non-empty")
  require(vocab.forall(_.nonEmpty), "graft_viterbi_tokenize vocab entries must be non-empty")
  require(vocab.distinct.size == vocab.size,
    "graft_viterbi_tokenize vocab entries must be distinct")
  require(costs.size == vocab.size,
    s"graft_viterbi_tokenize needs one cost per vocab entry: ${costs.size} vs ${vocab.size}")
  require(costs.forall(_ >= 0) && unkCost >= 0,
    "graft_viterbi_tokenize costs must be non-negative")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_viterbi_tokenize"

  @transient private lazy val trie = GreedyTokenize.Trie(vocab)
  @transient private lazy val costArr = costs.toArray

  override protected def nullSafeEval(input: Any): Any =
    trie.encodeViterbi(input.asInstanceOf[UTF8String], costArr, unkCost)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("trie", trie, classOf[GreedyTokenize.Trie].getName)
    val costRef = ctx.addReferenceObj("costs", costArr, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $trieRef.encodeViterbi($a, $costRef, $unkCost);")
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiTokenize =
    copy(child = newChild)
}
