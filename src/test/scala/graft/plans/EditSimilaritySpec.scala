package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Parity vectors computed with DuckDB 1.x `jaro_winkler_similarity` /
  * `damerau_levenshtein` — the reference semantics the native expressions
  * are pinned to (RapidFuzz conventions: 0.0 on empty sides including
  * empty-vs-empty, match window max(len)/2-1, Winkler boost only above
  * 0.7 raw Jaro; FULL Damerau with alphabet history, 'ca'→'abc' = 2).
  */
class EditSimilaritySpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  lazy val spark = TestSpark.init()

  // (a, b, duckdb jaro_winkler_similarity, duckdb damerau_levenshtein)
  private val vectors = Seq(
    ("dixon", "dicksonx", 0.8133333333333332, 4),
    ("martha", "marhta", 0.9611111111111111, 1),
    ("abcdefgh", "abczzzzz", 0.5833333333333334, 5), // prefix 3 but jaro <= 0.7: no boost
    ("", "abc", 0.0, 3),
    ("", "", 0.0, 0), // DuckDB convention: empty-vs-empty is 0, not 1
    ("a", "a", 1.0, 0),
    ("ab", "ba", 0.0, 1), // window 0: no cross matches; DL sees the transposition
    ("CRATE", "TRACE", 0.7333333333333334, 2), // jaro > 0.7 but prefix 0
    ("aaapppp", "", 0.0, 7),
    ("frog", "fog", 0.9249999999999999, 1),
    ("hello", "hello", 1.0, 0),
    ("abcd", "abcd ", 0.96, 1),
    ("x", "y", 0.0, 1),
    ("ca", "abc", 0.0, 2), // FULL Damerau (OSA would say 3)
    ("abcdef", "bcaxyf", 0.6944444444444443, 4), // 3 mismatched matches -> t = 3/2 = 1
    ("information", "informant", 0.9414141414141414, 3),
    ("small ring economy Brand#12", "small ring economy Brand#21", 0.9925925925925926, 1),
    ("red widget promo Brand#1", "red widget promo Brand#13", 0.992, 1),
    // DuckDB measures raw UTF-8 bytes: 'übergrün' is length 10 here (not
    // the code-point 8) — the discriminator that pins the byte semantics
    ("uebergruen", "übergrün", 0.6777777777777777, 4))

  test("jaro-winkler + damerau match DuckDB across the vector table " +
    "(codegen path via call_function)") {
    import spark.implicits._
    val got = vectors.map { case (a, b, _, _) => (a, b) }
      .toDF("a", "b")
      .select(col("a"), col("b"),
        call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"),
        call_function("graft_damerau_levenshtein", col("a"), col("b")).as("dl"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    got.size shouldBe vectors.size
    got.zip(vectors).foreach { case ((a, b, jw, dl), (_, _, ejw, edl)) =>
      withClue(s"pair ('$a','$b'): ") {
        jw shouldBe ejw +- 1e-9
        dl shouldBe edl
      }
    }
  }

  test("interpreted eval agrees with codegen (same expression, no session)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    vectors.foreach { case (a, b, ejw, edl) =>
      val la = Literal(UTF8String.fromString(a))
      val lb = Literal(UTF8String.fromString(b))
      withClue(s"pair ('$a','$b'): ") {
        JaroWinkler(la, lb).eval(null).asInstanceOf[Double] shouldBe ejw +- 1e-9
        DamerauLevenshtein(la, lb).eval(null) shouldBe edl
      }
    }
  }

  test("null propagation and symmetry") {
    import spark.implicits._
    val r = Seq((Option("abc"), Option.empty[String]))
      .toDF("a", "b")
      .select(
        call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"),
        call_function("graft_damerau_levenshtein", col("a"), col("b")).as("dl"))
      .head()
    r.isNullAt(0) shouldBe true
    r.isNullAt(1) shouldBe true
    // both measures are symmetric
    vectors.foreach { case (a, b, _, _) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.unsafe.types.UTF8String
      val (la, lb) =
        (Literal(UTF8String.fromString(a)), Literal(UTF8String.fromString(b)))
      JaroWinkler(la, lb).eval(null) shouldBe JaroWinkler(lb, la).eval(null)
      DamerauLevenshtein(la, lb).eval(null) shouldBe
        DamerauLevenshtein(lb, la).eval(null)
    }
  }

  test("bounded damerau == min(exact, k+1) over random byte strings for " +
    "every cutoff") {
    val rnd = new scala.util.Random(42)
    def randStr(n: Int): String =
      Seq.fill(n)("abcdef".charAt(rnd.nextInt(6))).mkString
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    val calc = EditSimilarity.calc
    for (_ <- 1 to 300) {
      val a = randStr(rnd.nextInt(24))
      val b = randStr(rnd.nextInt(24))
      val exact = calc.damerau(u8(a), u8(b))
      for (k <- 0 to 8) {
        withClue(s"('$a','$b') k=$k exact=$exact: ") {
          calc.damerauBounded(u8(a), u8(b), k) shouldBe math.min(exact, k + 1)
        }
      }
    }
    // and across the DuckDB vector table
    vectors.foreach { case (a, b, _, edl) =>
      for (k <- 0 to 6) {
        withClue(s"('$a','$b') k=$k: ") {
          calc.damerauBounded(u8(a), u8(b), k) shouldBe math.min(edl, k + 1)
        }
      }
    }
  }

  test("fuzzyPairs runs on a vanilla session via runtime registration") {
    // TestSpark is a graft session; simulate the vanilla path by checking
    // ensureRegistered is idempotent there, then assert the blocked-join
    // output shape on real labels
    graft.ops.FuzzyMatch.ensureRegistered(spark)
    val parts = graft.Tables.load(spark, "/root/testdata/sf0.001", "part")
    val pairs = graft.ops.FuzzyMatch.fuzzyPairs(
      parts.select(concat(col("p_name"), lit(" "), lower(col("p_type")),
        lit(" "), col("p_brand")).as("label")))
    val rows = pairs.filter(col("dl") <= 2).collect()
    // release the blocked-vocabulary pin so the shared-session hygiene
    // assertions stay honest
    graft.ops.Dedup.releaseCheckpoints(pairs)
    rows.length should be > 0
    rows.foreach { r =>
      r.getAs[String]("a_label") should be < r.getAs[String]("b_label")
      // dl <= lev always (transposition only adds moves)
      r.getAs[Int]("dl") should be <= r.getAs[Int]("lev")
      r.getAs[Double]("jw") should (be >= 0.0 and be <= 1.0)
    }
  }

  test("fuzzyPairs on a non-ASCII vocabulary: dl/jw are UTF-8-BYTE-based " +
    "(DuckDB parity), lev stays Spark's code-point count — the documented " +
    "mixed-unit divergence, pinned") {
    import spark.implicits._
    // 'café créme' vs 'café creme': same first-token block ('café'), same
    // code-point length band. The é→e edit is ONE code point but TWO
    // bytes (0xC3 0xA9 → 0x65 is a substitution + a deletion), so the
    // byte-based kernels and Spark's code-point levenshtein MUST diverge
    // here: dl = 2 (bytes), lev = 1 (code points). This is the scaladoc'd
    // caveat on fuzzyPairs — callers needing byte-consistent lev on
    // non-ASCII data derive it from dl bounds.
    val labels = Seq("café créme", "café creme").toDF("label")
    val outDf = graft.ops.FuzzyMatch.fuzzyPairs(labels, maxDist = 2)
    val rows = outDf.collect()
    graft.ops.Dedup.releaseCheckpoints(outDf)
    rows.length shouldBe 1
    val r = rows.head
    r.getAs[Int]("dl") shouldBe 2 // byte units (DuckDB damerau_levenshtein)
    r.getAs[Int]("lev") shouldBe 1 // code-point units (Spark levenshtein)
    // jw on the same pair is also byte-based; pin the DuckDB value
    r.getAs[Double]("jw") shouldBe 0.9284848484848485 +- 1e-9
  }

  test("resolveEntities maps variants to the most frequent spelling, " +
    "transitively, singletons to themselves") {
    import spark.implicits._
    // 'acme corp' is the frequent spelling; 'acme crop' (transposition,
    // dl 1) and 'acme cor' (deletion, dl 1 from 'acme corp') chain to it;
    // 'zzz unrelated' is a singleton
    val rows = Seq.fill(5)("acme corp") ++ Seq("acme crop", "acme cor", "zzz unrelated")
    val outDf = graft.ops.FuzzyMatch.resolveEntities(
      rows.toDF("label"), maxDist = 2)
    val out = outDf.collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    graft.ops.Dedup.releaseCheckpoints(outDf)
    out("acme corp") shouldBe (("acme corp", 5L))
    out("acme crop") shouldBe (("acme corp", 1L))
    out("acme cor") shouldBe (("acme corp", 1L))
    out("zzz unrelated") shouldBe (("zzz unrelated", 1L))
  }

  test("resolveEntities catches a FIRST-character typo via the reversed " +
    "sorted pass (round-10 three-pass candidate ladder)") {
    import spark.implicits._
    // 'xcme corp' differs from 'acme corp' in the first character:
    // different fuzzyPairs block (first token) AND far away in forward
    // lexicographic order — only the reversed-label pass (suffix
    // adjacency) can pair them
    val rows = Seq.fill(3)("acme corp") ++ Seq("xcme corp", "nnn middle")
    val outDf = graft.ops.FuzzyMatch.resolveEntities(
      rows.toDF("label"), maxDist = 2)
    val out = outDf.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    graft.ops.Dedup.releaseCheckpoints(outDf)
    out("xcme corp") shouldBe "acme corp"
    out("nnn middle") shouldBe "nnn middle"
  }


  test("sortedNeighborPairs finds cross-first-token neighbors the blocked " +
    "pass misses, within the rank window only") {
    import spark.implicits._
    // 'golden gear' vs 'goldenn gear': first tokens differ (different
    // fuzzyPairs blocks) but they are lexicographic neighbors with dl 1
    val labels = Seq("golden gear", "goldenn gear", "silver bolt",
      "silver bolts", "zzz far away").toDF("label")
    val outDf = graft.ops.FuzzyMatch.sortedNeighborPairs(
      labels, window = 2, maxDist = 2)
    val out = outDf.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getInt(3)))
      .toMap
    graft.ops.Dedup.releaseCheckpoints(outDf)
    out(("golden gear", "goldenn gear")) shouldBe ((1L, 1))
    out(("silver bolt", "silver bolts")) shouldBe ((1L, 1))
    out.keySet.exists(_._2 == "zzz far away") shouldBe false
    // and the blocked pass indeed cannot see the cross-token pair
    val blockedDf = graft.ops.FuzzyMatch.fuzzyPairs(
      labels, maxDist = 2)
    val blocked = blockedDf.select("a_label", "b_label").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    graft.ops.Dedup.releaseCheckpoints(blockedDf)
    blocked should not contain (("golden gear", "goldenn gear"))
  }

}
