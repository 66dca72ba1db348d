package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile-sketch summary over a long value — the
  * bounded-memory rank/quantile primitive that completes the sketch
  * family next to HLL (cardinality), CMS (frequency), KMV (distinct
  * sampling) and Misra-Gries (heavy hitters). The structure is the
  * classical multi-level compactor sketch (Manku, Rajagopalan &
  * Lindsay 1998, SIGMOD — "Approximate Medians and other Quantiles in
  * One Pass"; KLL, Karnin/Lang/Liberty 2016 FOCS, is the same compactor
  * ladder with geometric capacities): level `i` holds items of weight
  * `2^i`; a full level sorts and keeps every second item, promoting the
  * survivors one level up. Compaction offsets ALTERNATE per level (the
  * deterministic de-randomization of KLL's coin flip), so consecutive
  * compactions cancel rather than accumulate rank bias.
  *
  * Why a custom [[TypedImperativeAggregate]]: the exact alternative —
  * sort or `groupBy(value)` + cumulative window — shuffles the FULL
  * value stream (corpus-sized at 100 TB). This aggregate ships ONE
  * ≤`capacity·levels`-item summary per partition per group through the
  * existing partial/final machinery: shuffle volume
  * O(partitions × capacity × log(N/capacity)), independent of N.
  *
  * In the EXACT REGIME (total non-null values per group < capacity) no
  * compaction ever fires at any update or merge site, so the summary IS
  * the exact value multiset — order-independent, engine-replayable, and
  * oracle-checkable. Past capacity the classical guarantee holds and is
  * spec'd, not assumed: every compaction of a level-`i` buffer perturbs
  * any rank by at most `2^i`, so with `c` compactions of maximal level
  * `h` the worst-case rank error is bounded by `Σ 2^i ≤ N·levels/capacity`
  * (the MRL bound, measured much tighter in the spec).
  *
  * update: append to level 0; full level → sort, keep alternate items,
  * promote. merge: concatenate levels pairwise, then compact any
  * overfull level bottom-up (Agarwal et al. 2013 §4, mergeability of
  * compactor sketches). eval: all levels collapsed to a
  * `(value, weight)` table — weights summed per distinct value, sorted
  * value ASC as `array<struct<value, weight>>` — deterministic given
  * the item multiset.
  *
  * NULL values are skipped (SQL aggregate convention, like count(col)).
  */
case class QuantileSketchAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchAgg.Buf]
  with UnaryLike[Expression] {

  require(capacity >= 8,
    s"graft_quantile_sketch capacity must be >= 8, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint value, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("value", LongType, nullable = false),
      StructField("weight", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "graft_quantile_sketch"

  import QuantileSketchAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf(ArrayBuffer.empty, 0L)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      if (buf.levels.isEmpty) buf.levels += ArrayBuffer.empty[Long]
      buf.levels(0) += v.asInstanceOf[Long]
      if (buf.levels(0).size >= capacity) compactFrom(buf, 0)
    }
    buf
  }

  /** Sort level `i`, promote alternate survivors, cascade upward. The
    * kept offset alternates per level (bit `i` of `parities`), the
    * deterministic stand-in for KLL's random coin.
    */
  private def compactFrom(buf: Buf, from: Int): Unit = {
    var i = from
    while (i < buf.levels.size && buf.levels(i).size >= capacity) {
      val lvl = buf.levels(i)
      val arr = lvl.toArray
      java.util.Arrays.sort(arr)
      val offset = if ((buf.parities >> i & 1L) == 0L) 0 else 1
      buf.parities ^= (1L << i)
      if (i + 1 >= buf.levels.size) buf.levels += ArrayBuffer.empty[Long]
      val up = buf.levels(i + 1)
      var j = offset
      while (j < arr.length) { up += arr(j); j += 2 }
      lvl.clear()
      i += 1
    }
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    var i = 0
    while (i < b2.levels.size) {
      if (i >= b1.levels.size) b1.levels += ArrayBuffer.empty[Long]
      b1.levels(i) ++= b2.levels(i)
      i += 1
    }
    // bottom-up: a cascade from level i can only overfill levels > i
    var l = 0
    while (l < b1.levels.size) {
      if (b1.levels(l).size >= capacity) compactFrom(b1, l)
      l += 1
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    // collapse levels to a (value -> summed weight) table
    val m = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < buf.levels.size) {
      val w = 1L << i
      val lvl = buf.levels(i)
      var j = 0
      while (j < lvl.size) {
        val k = java.lang.Long.valueOf(lvl(j))
        val cur = m.get(k)
        m.put(k, java.lang.Long.valueOf(if (cur == null) w else cur + w))
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var p = 0
    while (it.hasNext) {
      val e = it.next()
      out(p) = InternalRow(e.getKey.longValue(), e.getValue.longValue())
      p += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.parities)
    out.writeInt(buf.levels.size)
    var i = 0
    while (i < buf.levels.size) {
      val lvl = buf.levels(i)
      out.writeInt(lvl.size)
      var j = 0
      while (j < lvl.size) { out.writeLong(lvl(j)); j += 1 }
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val parities = in.readLong()
    val n = in.readInt()
    val levels = ArrayBuffer.fill(n)(ArrayBuffer.empty[Long])
    var i = 0
    while (i < n) {
      val sz = in.readInt()
      val lvl = levels(i)
      lvl.sizeHint(sz)
      var j = 0
      while (j < sz) { lvl += in.readLong(); j += 1 }
      i += 1
    }
    new Buf(levels, parities)
  }

  override def withNewMutableAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
    copy(child = newChild)
}

object QuantileSketchAgg {
  /** Compactor ladder: `levels(i)` holds items of weight `2^i`;
    * `parities` packs each level's next compaction offset (bit `i`).
    */
  final class Buf(val levels: ArrayBuffer[ArrayBuffer[Long]], var parities: Long)
}
