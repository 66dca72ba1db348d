package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy leftmost-LONGEST-match tokenizer application: walk the text by
  * code point, at each position emit the id (vocab index) of the longest
  * vocabulary entry that matches, or -1 and advance one code point when
  * nothing matches — the WordPiece/BPE-inference shape that turns raw
  * text into model token ids (the application half of a trained
  * tokenizer; training-side pair counting is `Vocab.bpePairs`).
  *
  * Why native: greedy matching is inherently sequential per row, so the
  * Column fallback in [[graft.ops.TextAnalysis.greedyTokenize]] costs
  * O(len × vocab) nested-lambda steps; this expression walks a prebuilt
  * code-point trie in O(len × maxTokenLen) with zero per-step allocation.
  * Both paths produce IDENTICAL ids (longest match, ties impossible —
  * vocab entries are distinct), so the choice is a pure speed knob and
  * the result replays in any engine (no hash family involved).
  *
  * The vocabulary ships as part of the expression (a plan literal) —
  * appropriate for real-world vocab sizes (≤ a few 100k entries, shipped
  * once per task like any broadcast), not per-row data.
  */
case class GreedyTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "graft_greedy_tokenize vocab must be non-empty")
  require(vocab.forall(_.nonEmpty), "graft_greedy_tokenize vocab entries must be non-empty")
  require(vocab.distinct.size == vocab.size,
    "graft_greedy_tokenize vocab entries must be distinct")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "graft_greedy_tokenize"

  @transient private lazy val trie = GreedyTokenize.Trie(vocab)

  override protected def nullSafeEval(input: Any): Any =
    trie.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("trie", trie, classOf[GreedyTokenize.Trie].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $trieRef.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): GreedyTokenize =
    copy(child = newChild)
}

object GreedyTokenize {

  /** Code-point trie. Children are flat sorted arrays per node (vocabs are
    * wide but shallow; binary search beats a per-node hash map on cache
    * behavior and build cost). `ids(node)` is the vocab index terminating
    * at that node, or -1.
    */
  final class Trie private (
      firstChild: Array[Int], // index into childCp/childNode, per node
      childCount: Array[Int],
      childCp: Array[Int],    // code point labels, sorted within a node's span
      childNode: Array[Int],
      ids: Array[Int]) extends Serializable {

    private def step(node: Int, cp: Int): Int = {
      var lo = firstChild(node)
      var hi = lo + childCount(node) - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val c = childCp(mid)
        if (c == cp) return childNode(mid)
        else if (c < cp) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** Greedy longest-match encoding; -1 = unknown code point. */
    def encode(s: UTF8String): ArrayData = {
      val cps = s.toString.codePoints.toArray
      val n = cps.length
      val out = new java.util.ArrayList[Any](n)
      var i = 0
      while (i < n) {
        var node = 0
        var j = i
        var lastId = -1
        var lastEnd = i
        var continue = true
        while (continue && j < n) {
          val next = step(node, cps(j))
          if (next < 0) continue = false
          else {
            node = next
            j += 1
            if (ids(node) >= 0) { lastId = ids(node); lastEnd = j }
          }
        }
        if (lastId >= 0) { out.add(Integer.valueOf(lastId)); i = lastEnd }
        else { out.add(Integer.valueOf(-1)); i += 1 }
      }
      new GenericArrayData(out.toArray)
    }

    /** Viterbi (optimal-segmentation) encoding over the same trie: the
      * id sequence minimizing total integer cost (`costs(id)` per vocab
      * token, `unkCost` per unmatched code point), ties broken per
      * position by longer token then real-token-over-unknown — a unique
      * backpointer everywhere (two DISTINCT vocab entries of equal
      * length can never both match the same span), so the sequence is
      * deterministic and replays as `ORDER BY cost, len DESC, id DESC
      * LIMIT 1` in SQL. One trie walk per start position:
      * O(len × maxTokenLen), same bound as greedy, plus O(len)
      * backtrack.
      */
    def encodeViterbi(s: UTF8String, costs: Array[Int], unkCost: Int): ArrayData = {
      val cps = s.toString.codePoints.toArray
      val n = cps.length
      val INF = Int.MaxValue / 2
      val best = new Array[Int](n + 1)
      val bpLen = new Array[Int](n + 1)
      val bpId = new Array[Int](n + 1)
      java.util.Arrays.fill(best, 1, n + 1, INF)
      var i = 0
      while (i < n) {
        val base = best(i)
        // unknown edge: one code point at unkCost
        def relax(end: Int, c: Int, len: Int, id: Int): Unit =
          if (c < best(end) ||
            (c == best(end) && (len > bpLen(end) ||
              (len == bpLen(end) && id > bpId(end))))) {
            best(end) = c; bpLen(end) = len; bpId(end) = id
          }
        relax(i + 1, base + unkCost, 1, -1)
        var node = 0
        var j = i
        var continue = true
        while (continue && j < n) {
          val next = step(node, cps(j))
          if (next < 0) continue = false
          else {
            node = next
            j += 1
            if (ids(node) >= 0)
              relax(j, base + costs(ids(node)), j - i, ids(node))
          }
        }
        i += 1
      }
      // backtrack from the end; count tokens first, then fill in order
      var pos = n
      var count = 0
      while (pos > 0) { count += 1; pos -= bpLen(pos) }
      val out = new Array[Any](count)
      pos = n
      var k = count - 1
      while (pos > 0) {
        out(k) = Integer.valueOf(bpId(pos))
        pos -= bpLen(pos)
        k -= 1
      }
      new GenericArrayData(out)
    }
  }

  object Trie {
    def apply(vocab: Seq[String]): Trie = {
      // mutable build trie, then flatten to arrays
      final class Node {
        val children = new java.util.TreeMap[Integer, Node]()
        var id: Int = -1
      }
      val root = new Node
      vocab.zipWithIndex.foreach { case (tok, id) =>
        var node = root
        tok.codePoints.toArray.foreach { cp =>
          node = node.children.computeIfAbsent(cp, _ => new Node)
        }
        node.id = id
      }
      val nodes = new java.util.ArrayList[Node]()
      val index = new java.util.IdentityHashMap[Node, Integer]()
      def visit(n: Node): Unit = {
        index.put(n, nodes.size()); nodes.add(n)
        n.children.values().forEach(visit)
      }
      visit(root)
      val size = nodes.size()
      val firstChild = new Array[Int](size)
      val childCount = new Array[Int](size)
      val ids = new Array[Int](size)
      val cps = new java.util.ArrayList[Integer]()
      val targets = new java.util.ArrayList[Integer]()
      var k = 0
      while (k < size) {
        val n = nodes.get(k)
        firstChild(k) = cps.size()
        childCount(k) = n.children.size()
        ids(k) = n.id
        n.children.forEach { (cp, child) =>
          cps.add(cp); targets.add(index.get(child))
        }
        k += 1
      }
      new Trie(firstChild, childCount,
        cps.toArray(new Array[Integer](0)).map(_.intValue()),
        targets.toArray(new Array[Integer](0)).map(_.intValue()), ids)
    }
  }
}
