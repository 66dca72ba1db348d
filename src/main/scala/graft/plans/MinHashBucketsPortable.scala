package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native twin of [[graft.ops.Dedup.minHashBandsPortable]]'s banding
  * chain: per document, the `bands` banded MinHash bucket strings from
  * the PORTABLE hash family — component i of the signature is
  * `min over shingles s of mix(h28(s), i)` with
  * `mix(p, i) = (p·(2i+1) + i·40503) mod 268435399` and `h28` = first
  * 7 md5 hex digits as a long ([[graft.functions.PortableHash]] —
  * identical arithmetic, so the DuckDB oracle replay is unchanged);
  * band b's bucket is its signature slice joined with "," exactly as
  * `array_join(slice(sig, b·r+1, r), ",")` renders it.
  *
  * Why native: the Column form is a bind→transform→array_min→slice→
  * array_join higher-order chain — interpreted boxed lambdas evaluating
  * `numHashes × shingles` mixes per document, with each shingle's md5
  * re-dispatched through the expression interpreter. Here each shingle
  * is one `MessageDigest` call + a `numHashes`-step long loop in a
  * static helper the generated code calls directly (guide §4) — the
  * [[SignMasks]] / [[MaxSimScore]] pattern applied to the dedup
  * family's dominant kernel (corpus/batch signing).
  *
  * Contract matches the HOF form exactly (spec'd bit-for-bit in
  * `MinHashBucketsPortableSpec`): a NULL shingle array yields every
  * bucket as "" — NOT null, because the HOF's outer transform runs
  * over the constant band sequence (the [[RhpSigPortable]] null-vector
  * subtlety; null text reaches this path, so null-text docs DO band —
  * all on the "" bucket); a null shingle ELEMENT is skipped
  * (`array_min` ignores nulls); an array with no non-null shingles
  * yields "" buckets the same way.
  */
case class MinHashBucketsPortable(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes >= 1 && bands >= 1 && numHashes % bands == 0,
    s"bands ($bands) must divide numHashes ($numHashes)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "graft_minhash_buckets"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    new GenericArrayData(
      if (v == null) MinHashBucketsPortable.emptyBuckets(bands)
      else MinHashBucketsPortable.compute(
        v.asInstanceOf[ArrayData], numHashes, bands))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            ${childGen.isNull}
              ? graft.plans.MinHashBucketsPortable.emptyBuckets($bands)
              : graft.plans.MinHashBucketsPortable.compute(
                  ${childGen.value}, $numHashes, $bands));
        """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBucketsPortable = copy(child = newChild)
}

object MinHashBucketsPortable {
  import graft.functions.PortableHash.{Prime, Salt}

  /** The null-array / no-shingles result: every band's bucket "".
    * Called from generated code — keep the signature stable.
    */
  def emptyBuckets(bands: Int): Array[UTF8String] =
    Array.fill(bands)(UTF8String.EMPTY_UTF8)

  /** Banded bucket strings for one document's shingles. Called from
    * generated code — keep the signature stable.
    */
  def compute(shingles: ArrayData, numHashes: Int, bands: Int): Array[UTF8String] = {
    val n = shingles.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var seen = false
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        seen = true
        md.reset()
        val d = md.digest(shingles.getUTF8String(i).getBytes)
        // first 7 hex digits of the digest == top 28 bits
        val p = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) >>> 4
        var k = 0
        while (k < numHashes) {
          // (p·(2k+1) + k·Salt) < 2^36 — exact in a long, like the
          // Column form under ANSI
          val v = (p * (2L * k + 1L) + k * Salt) % Prime
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    val rows = numHashes / bands
    val out = new Array[UTF8String](bands)
    var b = 0
    while (b < bands) {
      if (!seen) out(b) = UTF8String.EMPTY_UTF8
      else {
        val sb = new java.lang.StringBuilder(rows * 11)
        var r = 0
        while (r < rows) {
          if (r > 0) sb.append(',')
          sb.append(sig(b * rows + r))
          r += 1
        }
        out(b) = UTF8String.fromString(sb.toString)
      }
      b += 1
    }
    out
  }
}
