package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass token counter over the raw UTF-8 bytes, replacing
  * `size(regexp_extract_all(text, ...))` where only the COUNT is needed.
  *
  * Modes (both defined to agree exactly with the Java/RE2 regexes the
  * Column fallbacks in [[graft.ops.TextAnalysis]] use):
  *
  *   - `bpe`: tokens of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]` — letter runs,
  *     digit runs, and every other non-whitespace code point one each
  *     (the GPT-style byte-pair pretokenizer shape).
  *   - `punct`: matches of `[^A-Za-z0-9\s]` — one per non-alnum,
  *     non-whitespace code point.
  *
  * Why native: the regex engine allocates the full match array just to
  * take its size — O(tokens) garbage per row and no codegen fusion. This
  * expression is a branchy byte loop with zero allocation: multi-byte
  * UTF-8 sequences count once via their leading byte (code-point
  * semantics, same as Java regex / RE2 on the negated class), and `\s` is
  * the regex-default ASCII set `[ \t\n\x0B\f\r]`.
  */
case class TokenCount(child: Expression, bpe: Boolean) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_token_count"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    var cnt = 0L
    var prev = 0 // 0 = none/symbol, 1 = letter run, 2 = digit run
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b < 0x80) {
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          if (bpe && prev != 1) cnt += 1
          prev = 1
        } else if (b >= '0' && b <= '9') {
          if (bpe && prev != 2) cnt += 1
          prev = 2
        } else if (b == ' ' || (b >= 0x09 && b <= 0x0d)) {
          prev = 0
        } else {
          cnt += 1; prev = 0
        }
      } else if ((b & 0xc0) != 0x80) { // leading byte of a multi-byte code point
        cnt += 1; prev = 0
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val cnt = ctx.freshName("cnt")
      val prev = ctx.freshName("prev")
      val letterHit = if (bpe) s"if ($prev != 1) $cnt++;" else ""
      val digitHit = if (bpe) s"if ($prev != 2) $cnt++;" else ""
      s"""
         |final int $n = $a.numBytes();
         |long $cnt = 0L;
         |int $prev = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final int $b = $a.getByte($i) & 0xFF;
         |  if ($b < 0x80) {
         |    if (($b >= 'A' && $b <= 'Z') || ($b >= 'a' && $b <= 'z')) {
         |      $letterHit
         |      $prev = 1;
         |    } else if ($b >= '0' && $b <= '9') {
         |      $digitHit
         |      $prev = 2;
         |    } else if ($b == ' ' || ($b >= 0x09 && $b <= 0x0D)) {
         |      $prev = 0;
         |    } else {
         |      $cnt++; $prev = 0;
         |    }
         |  } else if (($b & 0xC0) != 0x80) {
         |    $cnt++; $prev = 0;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}
