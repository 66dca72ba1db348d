package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fuzzy string matching kernels for blocked entity-resolution joins:
  * Jaro-Winkler similarity and full (unrestricted) Damerau-Levenshtein
  * distance, the two classic name-matching measures Spark lacks
  * (`functions.levenshtein` exists; these complete the family).
  *
  * Semantics are pinned to the conventions shared by DuckDB/RapidFuzz so
  * results are portable across engines (and DuckDB-oracle-checkable):
  *
  *   - `jaro_winkler`: 0.0 when either side is empty (including
  *     empty-vs-empty); match window `max(len)/2 - 1` (so two 1–2 char
  *     strings only match aligned positions); Winkler prefix boost
  *     (up to 4 code points, scale 0.1) applied ONLY when the raw Jaro
  *     similarity exceeds 0.7.
  *   - `damerau_levenshtein`: the FULL variant with an alphabet map —
  *     `ca → abc` costs 2 (transpose then insert through the transposed
  *     pair), not the restricted-OSA 3.
  *
  * Both operate on raw UTF-8 BYTES — verified DuckDB behavior (e.g.
  * `jaro_winkler_similarity('uebergruen', 'übergrün')` = 0.67778, which
  * is the byte-length-10-vs-10 answer, not the code-point 10-vs-8 one).
  * For ASCII — the name/identifier matching domain — bytes and code
  * points coincide; the byte formulation also skips the decode pass.
  *
  * Intended for SHORT strings (names, titles, identifiers) reached
  * through a blocked candidate join — the DP is O(|a|·|b|) time (and
  * memory, for Damerau's alphabet history), so feeding whole documents
  * is a misuse; document-scale similarity belongs to the shingle/minhash
  * family ([[graft.ops.Dedup]]).
  */
object EditSimilarity {

  /** Serializable calculator referenced from generated code (the
    * GreedyTokenize addReferenceObj pattern — the DP loop gains nothing
    * from being inlined into the generated Java, it never fuses).
    */
  final class Calc extends Serializable {

    def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
      val s = a.getBytes
      val t = b.getBytes
      val la = s.length
      val lb = t.length
      if (la == 0 || lb == 0) return 0.0
      val window = math.max(math.max(la, lb) / 2 - 1, 0)
      val sMatch = new Array[Boolean](la)
      val tMatch = new Array[Boolean](lb)
      var m = 0
      var i = 0
      while (i < la) {
        val lo = math.max(0, i - window)
        val hi = math.min(lb - 1, i + window)
        var j = lo
        var found = false
        while (!found && j <= hi) {
          if (!tMatch(j) && s(i) == t(j)) {
            sMatch(i) = true; tMatch(j) = true; m += 1; found = true
          }
          j += 1
        }
        i += 1
      }
      if (m == 0) return 0.0
      // transpositions: matched code points, in order, that disagree
      var trans = 0
      var k = 0
      i = 0
      while (i < la) {
        if (sMatch(i)) {
          while (!tMatch(k)) k += 1
          if (s(i) != t(k)) trans += 1
          k += 1
        }
        i += 1
      }
      val md = m.toDouble
      val jaro = (md / la + md / lb + (md - trans / 2) / md) / 3.0
      if (jaro <= 0.7) return jaro
      var prefix = 0
      while (prefix < math.min(4, math.min(la, lb)) && s(prefix) == t(prefix))
        prefix += 1
      jaro + 0.1 * prefix * (1.0 - jaro)
    }

    // Reusable per-thread DP scratch: the expression object is shared by
    // every task in the executor JVM, and a fuzzy join evaluates the DP
    // millions of times — per-call allocation of the (la+2)(lb+2) matrix
    // would be the dominant garbage source.
    // @transient: ThreadLocal is not serializable; each executor JVM
    // rebuilds its own scratch lazily after deserialization
    @transient private lazy val dpBuf =
      ThreadLocal.withInitial[Array[Int]](() => new Array[Int](68 * 68))
    @transient private lazy val daBuf =
      ThreadLocal.withInitial[Array[Int]](() => new Array[Int](256))
    private def scratch(n: Int): Array[Int] = {
      var d = dpBuf.get()
      if (d.length < n) { d = new Array[Int](n); dpBuf.set(d) }
      d
    }

    def damerau(a: UTF8String, b: UTF8String): Int = {
      val s = a.getBytes
      val t = b.getBytes
      val la = s.length
      val lb = t.length
      if (la == 0) return lb
      if (lb == 0) return la
      val inf = la + lb
      val w = lb + 2
      // (la+2) x (lb+2) DP matrix, flattened
      val d = scratch((la + 2) * w)
      d(0) = inf
      var i = 0
      while (i <= la) { d((i + 1) * w + 1) = i; d((i + 1) * w) = inf; i += 1 }
      var j = 0
      while (j <= lb) { d(w + j + 1) = j; d(j + 1) = inf; j += 1 }
      // last row index (1-based) where each byte occurred in `s`
      val da = new Array[Int](256)
      i = 1
      while (i <= la) {
        var db = 0
        j = 1
        while (j <= lb) {
          val k = da(t(j - 1) & 0xff)
          val l = db
          val cost = if (s(i - 1) == t(j - 1)) { db = j; 0 } else 1
          val subst = d(i * w + j) + cost
          val insert = d((i + 1) * w + j) + 1
          val delete = d(i * w + j + 1) + 1
          val transp = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
          d((i + 1) * w + j + 1) =
            math.min(math.min(subst, insert), math.min(delete, transp))
          j += 1
        }
        da(s(i - 1) & 0xff) = i
        i += 1
      }
      d((la + 1) * w + lb + 1)
    }

    /** [[damerau]] with a cutoff: EXACT when the distance is ≤ `kCut`,
      * `kCut + 1` otherwise — the primitive a thresholded fuzzy join
      * wants, at O(len · kCut) instead of O(len²). Banded DP over the
      * |i−j| ≤ kCut diagonal strip: every byte edit changes the length by
      * at most one (transpositions by zero), so `d(i,j) ≥ |i−j|` and
      * out-of-band cells can never contribute a value ≤ kCut; band-edge
      * and out-of-band transposition references read as infinity, which
      * only perturbs values the `kCut + 1` clamp hides anyway.
      */
    def damerauBounded(a: UTF8String, b: UTF8String, kCut: Int): Int = {
      val s = a.getBytes
      val t = b.getBytes
      val la = s.length
      val lb = t.length
      if (math.abs(la - lb) > kCut) return kCut + 1
      if (la == 0) return if (lb > kCut) kCut + 1 else lb
      if (lb == 0) return if (la > kCut) kCut + 1 else la
      val inf = la + lb + 1
      val w = lb + 2
      val d = scratch((la + 2) * w)
      d(0) = inf
      var i = 0
      while (i <= la) { d((i + 1) * w + 1) = i; d((i + 1) * w) = inf; i += 1 }
      var j = 0
      while (j <= lb) { d(w + j + 1) = j; d(j + 1) = inf; j += 1 }
      val da = daBuf.get()
      java.util.Arrays.fill(da, 0)
      i = 1
      while (i <= la) {
        val jLo = math.max(1, i - kCut)
        val jHi = math.min(lb, i + kCut)
        // infinity guards flanking the band, so the next row's stencil
        // never reads a stale cell from a previous call of this scratch
        if (jLo >= 2) d((i + 1) * w + jLo) = inf
        if (jHi + 1 <= lb) d((i + 1) * w + jHi + 2) = inf
        var db = 0
        j = jLo
        while (j <= jHi) {
          val k = da(t(j - 1) & 0xff)
          val l = db
          val cost = if (s(i - 1) == t(j - 1)) { db = j; 0 } else 1
          val subst = d(i * w + j) + cost
          val insert = d((i + 1) * w + j) + 1
          val delete = d(i * w + j + 1) + 1
          // the referenced (row k, col l) cell was written this call iff
          // it's a boundary (k <= 1 or l <= 1) or inside row k's band
          // (cols [k - kCut, k + kCut] plus its flanking guards)
          val transp =
            if (k <= 1 || l <= 1 || (l >= k - kCut - 1 && l <= k + kCut + 1))
              d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
            else inf
          d((i + 1) * w + j + 1) =
            math.min(math.min(subst, insert), math.min(delete, transp))
          j += 1
        }
        da(s(i - 1) & 0xff) = i
        i += 1
      }
      val r = d((la + 1) * w + lb + 1)
      if (r > kCut) kCut + 1 else r
    }
  }

  val calc = new Calc

  private[plans] def checkStrings(name: String, l: Expression, r: Expression): TypeCheckResult =
    (l.dataType, r.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (lt, rt) => TypeCheckResult.TypeCheckFailure(
        s"$name requires (string, string), got (${lt.catalogString}, ${rt.catalogString})")
    }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    EditSimilarity.checkStrings(prettyName, left, right)

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    EditSimilarity.calc.jaroWinkler(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val calcRef = ctx.addReferenceObj(
      "jwCalc", EditSimilarity.calc, classOf[EditSimilarity.Calc].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $calcRef.jaroWinkler($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

/** `maxDist < 0` = exact unbounded distance; `maxDist >= 0` = banded DP
  * returning the exact distance when ≤ maxDist and `maxDist + 1`
  * otherwise (O(len·maxDist) — the thresholded-fuzzy-join fast path).
  */
case class DamerauLevenshtein(
    left: Expression, right: Expression, maxDist: Int = -1)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    EditSimilarity.checkStrings(prettyName, left, right)

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_damerau_levenshtein"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])
    if (maxDist < 0) EditSimilarity.calc.damerau(a, b)
    else EditSimilarity.calc.damerauBounded(a, b, maxDist)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val calcRef = ctx.addReferenceObj(
      "dlCalc", EditSimilarity.calc, classOf[EditSimilarity.Calc].getName)
    val call =
      if (maxDist < 0) (a: String, b: String) => s"$calcRef.damerau($a, $b)"
      else (a: String, b: String) => s"$calcRef.damerauBounded($a, $b, $maxDist)"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = ${call(a, b)};")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}
