package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC / NFD / NFKC / NFKD) as a codegen'd
  * expression — the canonicalization step every digest-keyed dedup needs
  * before hashing: `é` arrives from real crawls both composed (U+00E9)
  * and decomposed (`e` + U+0301), the byte sequences differ, and an
  * un-normalized `md5(text)` key treats the same document as two
  * (`q_dedup_nfc` demonstrates the collapse; DuckDB's `nfc_normalize`
  * is the oracle semantics for NFC).
  *
  * Spark has no built-in for this (and the no-UDF rule holds), so this
  * wraps `java.text.Normalizer` behind two fast paths that make the
  * common case free: a byte-scan ASCII check returns the input
  * UNCHANGED (no String materialization at all — the overwhelming
  * majority of a web corpus), and `Normalizer.isNormalized` skips the
  * rebuild for already-normalized non-ASCII. Only genuinely
  * non-normalized rows pay the normalize + re-encode.
  *
  * The form is a constructor constant (from a foldable literal at
  * registration), so codegen specializes per form with no per-row
  * dispatch.
  */
case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {

  UnicodeNormalize.formFor(formName) // fail fast on an unknown form

  @transient private lazy val form = UnicodeNormalize.formFor(formName)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${dt.catalogString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj(
      "nfForm", form, classOf[Normalizer.Form].getName)
    val helper = UnicodeNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = $helper.normalize($a, $formRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  private[plans] def formFor(name: String): Normalizer.Form = name match {
    case "NFC"  => Normalizer.Form.NFC
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"graft_unicode_normalize form must be NFC/NFD/NFKC/NFKD, got '$other'")
  }

  /** Evaluation kernel, shared by interpreted and generated paths. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) {
        // non-ASCII byte: fall through to the java.text path
        val str = s.toString
        return if (Normalizer.isNormalized(str, form)) s
        else UTF8String.fromString(Normalizer.normalize(str, form))
      }
      i += 1
    }
    s // pure ASCII is normalized under every form — zero-copy
  }
}
