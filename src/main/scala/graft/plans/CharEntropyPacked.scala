package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-distribution summary, packed as
  * `(distinct_codepoints << 20) | entropy_millibits`.
  *
  * Bit-compatible with the Column fallback in
  * [[graft.ops.TextAnalysis.charEntropy]]:
  *
  *   - distinct code points iterate in ASCENDING order (TreeMap), matching
  *     `array_sort(array_distinct(split(s, '')))` — UTF-8 byte order on
  *     single code points IS code-point order;
  *   - each term folds as `acc - (p * log2(p))` with `p = cnt / n` in
  *     doubles, log2 spelled exactly as Spark's `Log2` codegen
  *     (`StrictMath.log(x) / StrictMath.log(2)`);
  *   - milli rounding replays Spark's `Round` on doubles
  *     (`BigDecimal.valueOf(x).setScale(0, HALF_UP)`).
  *
  * Packing bounds: entropy ≤ log2(2^31) bits → < 2^15 milli-bits, far
  * under the 2^20 field; distinct ≤ 2^31 keeps the packed value < 2^52.
  * Empty string packs to 0; the Column fallback's `split('','')` would
  * yield one empty element (n_uniq 1), so `TextAnalysis.charEntropy`
  * pins empty input to 0 OUTSIDE the dispatch — both paths agree.
  *
  * Why native: the fallback materializes an O(chars) array of one-char
  * UTF8Strings, sorts its distinct set, then COUNTS EACH DISTINCT CHAR
  * WITH A FULL ARRAY SCAN — O(alphabet × chars) interpreted lambda work
  * per row. This is one UTF-8 byte scan plus an O(alphabet) fold.
  */
case class CharEntropyPacked(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_char_entropy"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    @inline def cont(j: Int): Int = if (j < n) bytes(j) & 0x3f else 0
    val counts = new java.util.TreeMap[Integer, Integer]()
    var nChars = 0
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xe0) == 0xc0) {
        cp = ((b0 & 0x1f) << 6) | cont(i + 1); i += 2
      } else if ((b0 & 0xf0) == 0xe0) {
        cp = ((b0 & 0x0f) << 12) | (cont(i + 1) << 6) | cont(i + 2); i += 3
      } else {
        cp = ((b0 & 0x07) << 18) | (cont(i + 1) << 12) |
          (cont(i + 2) << 6) | cont(i + 3); i += 4
      }
      nChars += 1
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev.intValue() + 1)
    }
    var acc = 0.0d
    val nd = nChars.toDouble
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().intValue() / nd
      acc = acc - (p * (StrictMath.log(p) / StrictMath.log(2)))
    }
    val r = acc * 1000.0d
    val milli =
      if (java.lang.Double.isNaN(r) || java.lang.Double.isInfinite(r)) r.toLong
      else java.math.BigDecimal.valueOf(r)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
    (counts.size().toLong << 20) | milli
  }

  // Same algorithm in generated Java. Janino constraints: raw TreeMap
  // (no generics), explicit Integer boxing, Iterator loop (no foreach),
  // continuation bytes hoisted into plain locals (the RollHash lesson).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val nChars = ctx.freshName("nChars")
      val i = ctx.freshName("i")
      val b0 = ctx.freshName("b0")
      val cp = ctx.freshName("cp")
      val c1 = ctx.freshName("c1")
      val c2 = ctx.freshName("c2")
      val c3 = ctx.freshName("c3")
      val prev = ctx.freshName("prev")
      val cnt = ctx.freshName("cnt")
      val acc = ctx.freshName("acc")
      val nd = ctx.freshName("nd")
      val it = ctx.freshName("it")
      val p = ctx.freshName("p")
      val r = ctx.freshName("r")
      val milli = ctx.freshName("milli")
      s"""
         |final byte[] $bytes = $a.getBytes();
         |final int $n = $bytes.length;
         |final java.util.TreeMap $m = new java.util.TreeMap();
         |int $nChars = 0;
         |int $i = 0;
         |while ($i < $n) {
         |  final int $b0 = $bytes[$i] & 0xFF;
         |  int $cp;
         |  if ($b0 < 0x80) { $cp = $b0; $i += 1; }
         |  else if (($b0 & 0xE0) == 0xC0) {
         |    final int $c1 = ($i + 1 < $n) ? $bytes[$i + 1] & 0x3F : 0;
         |    $cp = ($b0 & 0x1F) << 6 | $c1;
         |    $i += 2;
         |  } else if (($b0 & 0xF0) == 0xE0) {
         |    final int $c1 = ($i + 1 < $n) ? $bytes[$i + 1] & 0x3F : 0;
         |    final int $c2 = ($i + 2 < $n) ? $bytes[$i + 2] & 0x3F : 0;
         |    $cp = ($b0 & 0x0F) << 12 | $c1 << 6 | $c2;
         |    $i += 3;
         |  } else {
         |    final int $c1 = ($i + 1 < $n) ? $bytes[$i + 1] & 0x3F : 0;
         |    final int $c2 = ($i + 2 < $n) ? $bytes[$i + 2] & 0x3F : 0;
         |    final int $c3 = ($i + 3 < $n) ? $bytes[$i + 3] & 0x3F : 0;
         |    $cp = ($b0 & 0x07) << 18 | $c1 << 12 | $c2 << 6 | $c3;
         |    $i += 4;
         |  }
         |  $nChars += 1;
         |  final Object $prev = $m.get(Integer.valueOf($cp));
         |  final int $cnt = ($prev == null) ? 1 : ((Integer) $prev).intValue() + 1;
         |  $m.put(Integer.valueOf($cp), Integer.valueOf($cnt));
         |}
         |double $acc = 0.0;
         |final double $nd = (double) $nChars;
         |final java.util.Iterator $it = $m.values().iterator();
         |while ($it.hasNext()) {
         |  final double $p = ((Integer) $it.next()).intValue() / $nd;
         |  $acc = $acc - ($p * (java.lang.StrictMath.log($p) / java.lang.StrictMath.log(2)));
         |}
         |final double $r = $acc * 1000.0;
         |long $milli;
         |if (Double.isNaN($r) || Double.isInfinite($r)) {
         |  $milli = (long) $r;
         |} else {
         |  $milli = (long) java.math.BigDecimal.valueOf($r)
         |    .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |}
         |${ev.value} = ((long) $m.size() << 20) | $milli;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharEntropyPacked =
    copy(child = newChild)
}
