package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** EXACT mergeable top-k selection over (string key, long value) rows —
  * the bounded-state companion to [[HeavyHittersAgg]]: where Misra-Gries
  * approximates "which keys are frequent" from the RAW key stream, this
  * aggregate selects the exact k best rows of an ALREADY-AGGREGATED
  * table by a total order ((value DESC, key ASC) — the standard
  * rank-window order, so it is a drop-in for `row_number() <= k`).
  *
  * Top-k by a total order is a mergeable summary in the strict
  * Agarwal et al. 2013 sense AND exact: topK(A ∪ B) =
  * topK(topK(A) ∪ topK(B)), so per-partition partial buffers of ≤ k
  * entries compose to the same answer as a global sort. What that buys
  * over the `row_number()` window (which, since WindowGroupLimit, also
  * prunes to ≤ k rows per partition before its exchange):
  *
  *   - NO SORT anywhere. WindowGroupLimit still fully sorts each
  *     partition's slice of the counted table before pruning
  *     (O(D log D) per partition, D = distinct keys — corpus-sized for
  *     tokens at 100 TB) and re-sorts after the shuffle; the heap is
  *     O(D log k) with k-bounded memory, inside ObjectHashAggregate
  *     (`partial_graft_top_k` below the exchange, verified in-plan by
  *     the spec).
  *   - STREAMS. Rank windows are unsupported in Structured Streaming
  *     aggregations; this is an ordinary aggregate, so a complete-mode
  *     per-group top-k accumulates across micro-batches (spec'd) — the
  *     live "top tokens per language" dashboard shape.
  *   - COMPOSES: it slots beside other aggregates in one groupBy pass
  *     instead of forcing a separate window stage.
  *
  * update: skip NULL key or value (the count(col) convention); insert
  * if under k, else replace the current worst iff the new row orders
  * strictly better. merge: fold the right buffer's entries through the
  * same rule. eval: entries sorted (value DESC, key ASC) as
  * `array<struct<key, cnt>>` — position i is rank i+1.
  *
  * Ties BEYOND k resolve deterministically by the same total order
  * (among equal values the lexicographically smallest keys win), which
  * is exactly `row_number` under (value DESC, key ASC) — the two paths
  * return identical rows, spec'd, and a DuckDB ROW_NUMBER replay
  * oracles both.
  */
case class TopKAgg(
    left: Expression,
    right: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKAgg.Entry]]
  with BinaryLike[Expression] {

  require(k > 0, s"graft_top_k k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (kt, vt) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string key, bigint value), got " +
          s"(${kt.catalogString}, ${vt.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k"

  type Buf = java.util.PriorityQueue[TopKAgg.Entry]

  override def createAggregationBuffer(): Buf =
    new Buf(k, TopKAgg.WorstFirst)

  /** `(key, v)` beats the buffer's current worst under
    * (value DESC, key ASC)?
    */
  private def beats(worst: TopKAgg.Entry, key: UTF8String, v: Long): Boolean =
    v > worst.value || (v == worst.value && key.compareTo(worst.key) < 0)

  private def offer(buf: Buf, key: UTF8String, v: Long, copy: Boolean): Unit =
    if (buf.size < k) {
      buf.add(TopKAgg.Entry(if (copy) key.copy() else key, v))
    } else if (beats(buf.peek(), key, v)) {
      buf.poll()
      buf.add(TopKAgg.Entry(if (copy) key.copy() else key, v))
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val kv = left.eval(input)
    val vv = right.eval(input)
    if (kv != null && vv != null)
      // COPY on insert: the incoming UTF8String aliases a reused row
      // buffer and would silently mutate under us otherwise
      offer(buf, kv.asInstanceOf[UTF8String], vv.asInstanceOf[Long], copy = true)
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.iterator()
    while (it.hasNext) {
      val e = it.next()
      // entries in a buffer are already defensive copies (or came off
      // the wire) — no re-copy on merge
      offer(b1, e.key, e.value, copy = false)
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val rows = new Array[TopKAgg.Entry](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { rows(i) = it.next(); i += 1 }
    // (value DESC, key ASC): rank order, deterministic
    val sorted = rows.sortWith { (a, b) =>
      if (a.value != b.value) a.value > b.value
      else a.key.compareTo(b.key) < 0
    }
    new GenericArrayData(sorted.map(e =>
      InternalRow(e.key, e.value)).asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.value)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.add(TopKAgg.Entry(UTF8String.fromBytes(kb), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
}

object TopKAgg {
  final case class Entry(key: UTF8String, value: Long)

  /** Heap order = WORST entry first under (value DESC, key ASC): the
    * smallest value, and among equal values the LARGEST key, sits at
    * the head so `peek`/`poll` always target the entry a better row
    * should displace.
    */
  val WorstFirst: java.util.Comparator[Entry] =
    new java.util.Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val c = java.lang.Long.compare(a.value, b.value)
        if (c != 0) c else b.key.compareTo(a.key)
      }
    }
}
