package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries heavy-hitters summary over a string key — the
  * bounded-memory frequent-items primitive (Misra & Gries 1982; the
  * MERGE rule is Agarwal et al. 2013, "Mergeable Summaries"): at most
  * `capacity` counters per summary, updated in one pass and merged
  * associatively, with the two classical guarantees
  *
  *   - every reported count is an UNDERCOUNT by at most N/(capacity+1)
  *     (N = total non-null keys aggregated), never an overcount;
  *   - every key whose true count exceeds N/(capacity+1) IS present in
  *     the summary.
  *
  * Why a custom [[TypedImperativeAggregate]]: the exact alternative —
  * `groupBy(key).count` + top-k window — shuffles the FULL key stream
  * (every distinct key crosses the wire, corpus-sized for tokens at
  * 100 TB). This aggregate ships ONE ≤`capacity`-entry summary per
  * partition per group through the existing partial/final aggregation
  * machinery: shuffle volume O(partitions × capacity), independent of
  * corpus size. In the EXACT REGIME (distinct keys ≤ capacity) no
  * decrement ever fires at any update or merge site, so the summary IS
  * the exact count table — order-independent, engine-replayable, and
  * oracle-checkable; below capacity the approximation guarantees above
  * hold and are spec'd, not assumed.
  *
  * update: tracked key → +1; untracked with room → insert at 1;
  * untracked and full → decrement ALL counters by 1, dropping zeros
  * (the arriving key is "spent" against one decrement — classical MG).
  * merge: sum counters keywise; if over capacity, subtract the
  * (capacity+1)-th largest count from all and drop non-positive
  * (Agarwal et al. §3.1). eval: counters sorted (count DESC, key ASC)
  * as `array<struct<key, cnt>>` — deterministic given the counter set.
  *
  * NULL keys are skipped (SQL aggregate convention, like count(col)).
  */
case class HeavyHittersAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]]
  with UnaryLike[Expression] {

  require(capacity > 0, s"graft_heavy_hitters capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"

  type Buf = java.util.HashMap[UTF8String, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf()

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      val cur = buf.get(key)
      if (cur != null) buf.put(key, java.lang.Long.valueOf(cur + 1L))
      else if (buf.size < capacity)
        // COPY the key: the incoming UTF8String aliases a reused row
        // buffer and would silently mutate under us otherwise
        buf.put(key.copy(), java.lang.Long.valueOf(1L))
      else {
        // decrement-all; the arriving key is spent against one decrement
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val n = e.getValue - 1L
          if (n <= 0L) it.remove() else e.setValue(java.lang.Long.valueOf(n))
        }
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey,
        java.lang.Long.valueOf(if (cur == null) e.getValue.longValue()
          else cur + e.getValue))
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positive
      val counts = new Array[Long](b1.size)
      var i = 0
      val vit = b1.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(b1.size - capacity - 1)
      val eit = b1.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val n = e.getValue - cut
        if (n <= 0L) eit.remove() else e.setValue(java.lang.Long.valueOf(n))
      }
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val rows = new Array[(UTF8String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      rows(i) = (e.getKey, e.getValue.longValue()); i += 1
    }
    // (count DESC, key ASC): deterministic given the counter set
    val sorted = rows.sortWith { case ((k1, c1), (k2, c2)) =>
      if (c1 != c2) c1 > c2 else k1.compareTo(k2) < 0
    }
    new GenericArrayData(sorted.map { case (k, c) =>
      InternalRow(k, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf(n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val kb = new Array[Byte](len)
      in.readFully(kb)
      buf.put(UTF8String.fromBytes(kb), java.lang.Long.valueOf(in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}
