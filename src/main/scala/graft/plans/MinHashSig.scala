package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature from pre-hashed shingles: component i is
  * `min over shingles x of (a_i * x + b_i)` — the standard universal-hash
  * simulation of k random permutations over ONE base hash per shingle.
  *
  * Why native: the Column fallback re-hashes every shingle STRING once per
  * seed (k × string-xxhash64 work); here each shingle is hashed once
  * upstream and the k permutations are two wrapping long ops each. Java
  * arithmetic wraps (no ANSI interception inside generated code), which is
  * exactly the 2^64-ring semantics universal hashing wants. Mixing
  * constants derive from SplitMix64 of the component index — deterministic
  * across runs, machines, and cluster sizes.
  */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  private lazy val (aConst, bConst): (Array[Long], Array[Long]) = {
    def splitmix64(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val a = Array.tabulate(numHashes)(i => splitmix64(2L * i + 1) | 1L) // odd
    val b = Array.tabulate(numHashes)(i => splitmix64(2L * i + 2))
    (a, b)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < numHashes) {
        val v = aConst(k) * h + bConst(k)
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val aRef = ctx.addReferenceObj("minhashA", aConst, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bConst, "long[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |final long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $arr.getLong($i);
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    final long $v = $aRef[$k] * $h + $bRef[$k];
         |    if ($v < $out[$k]) $out[$k] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
