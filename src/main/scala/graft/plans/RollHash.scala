package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass polynomial rolling hash over a string's Unicode code points:
  * `h := (h * 31 + codePoint) % 1_000_000_007`, identical to the Column
  * fallback `aggregate(split(s, ''), 0L, (h, c) -> (h*31 + ascii(c)) % 1e9+7)`
  * (split('') yields one code point per element; `ascii` returns its
  * value) — verified equal by the DuckDB oracle over the corpus and by
  * the mixed-input equivalence spec.
  *
  * Why native: the fallback materializes an O(chars) array of one-char
  * UTF8Strings and interprets a lambda per element — the dominant cost of
  * fingerprinting. This is a zero-allocation byte scan that decodes UTF-8
  * inline; the modulus keeps the accumulator < 2^60 so ANSI overflow
  * checking never fires (same argument as the fallback's).
  */
case class RollHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_roll_hash"

  // Continuation bytes past the end of a truncated/malformed sequence read
  // as 0 (the lead byte's partial code point) instead of crashing; `i` then
  // steps past the end and the loop terminates. Valid UTF-8 is unaffected.
  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val n = bytes.length
    @inline def cont(j: Int): Int = if (j < n) bytes(j) & 0x3f else 0
    var h = 0L
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
      h = (h * 31L + cp) % 1000000007L
    }
    h
  }

  // Continuation bytes are hoisted into plain int locals before the shift-or
  // combine: Janino mis-parses the inlined `(bytes[i + 1] & 0x3F) << 6` form
  // as a cast ("is not a type") and the whole stage silently fell back to
  // interpreted execution. Locals also carry the truncation clamp.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val b0 = ctx.freshName("b0")
      val cp = ctx.freshName("cp")
      val c1 = ctx.freshName("c1")
      val c2 = ctx.freshName("c2")
      val c3 = ctx.freshName("c3")
      s"""
         |final byte[] $bytes = $a.getBytes();
         |final int $n = $bytes.length;
         |long $h = 0L;
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
         |  $h = ($h * 31L + $cp) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollHash =
    copy(child = newChild)
}
