package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CorpusOpsSpec extends AnyFunSuite with Matchers
    with graft.CleanSessionCheck {
  private lazy val spark = TestSpark.init()
  import spark.implicits._

  test("approxDistinct at rate 1 is the exact distinct count") {
    val df = Seq.tabulate(300)(i => ("g", s"k${i % 100}")).toDF("g", "k")
    val out = CorpusOps.approxDistinct(df, "k", Seq("g"), rate = 1).collect()
    out.length shouldBe 1
    out.head.getLong(1) shouldBe 100L
  }

  test("approxDistinct estimates within sampling error and ignores duplicates") {
    val keys = Seq.tabulate(20000)(i => ("g", s"key-$i"))
    // every key appears 3 times: the estimator must not count rows
    val df = (keys ++ keys ++ keys).toDF("g", "k")
    val est = CorpusOps.approxDistinct(df, "k", Seq("g"), rate = 16)
      .collect().head.getLong(1)
    est.toDouble shouldBe 20000.0 +- 2000.0
  }

  test("mergeBestVersion: preferred wins overlap, score then tie column break ties") {
    val neu = Seq(
      (1L, "one-new", 10L, "a"),
      (2L, "two-new", 5L, "b")).toDF("id", "text", "score", "src")
    val old = Seq(
      (1L, "one-old", 99L, "a"),    // loses despite higher score: not preferred
      (3L, "three-long", 7L, "b"),  // wins within side on score
      (3L, "three-short", 3L, "a"),
      (4L, "four-b", 2L, "b"),      // score tie -> smallest src wins
      (4L, "four-a", 2L, "a")).toDF("id", "text", "score", "src")
    val out = CorpusOps.mergeBestVersion(neu, old, "id", "score", "src")
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(1))
    out shouldBe Array(
      1L -> "one-new", 2L -> "two-new", 3L -> "three-long", 4L -> "four-a")
    // schema passes through untouched
    CorpusOps.mergeBestVersion(neu, old, "id", "score", "src").columns shouldBe
      Array("id", "text", "score", "src")
  }

  test("profileNumeric: exact per-column stats in one pass, nulls counted") {
    val df = Seq(
      (Some(1.0), Some(10.0)), (Some(2.0), None), (Some(2.0), Some(30.0))
    ).toDF("a", "b")
    val out = CorpusOps.profileNumeric(df, Seq("a", "b"))
      .orderBy("col_name").collect()
    val a = out(0); val b = out(1)
    a.getAs[Long]("n_rows") shouldBe 3L
    a.getAs[Long]("n_present") shouldBe 3L
    a.getAs[Long]("n_distinct") shouldBe 2L
    a.getAs[Double]("min_val") shouldBe 1.0
    b.getAs[Long]("n_null") shouldBe 1L
    b.getAs[Long]("n_present") shouldBe 2L
    b.getAs[Double]("max_val") shouldBe 30.0
  }

  test("url canonicalization: case, ports, tracking params, fragments; blocklist; dedup") {
    val urls = Seq(
      (1L, "HTTP://Site.COM:80/a?utm_source=x"),
      (2L, "http://site.com/a"),                  // same canonical as 1
      (3L, "http://site.com/a#section"),          // same again
      (4L, "https://other.com:443/b?q=1&ref=tw"), // keeps q, drops ref
      (5L, "http://blocked.com/spam"),            // blocklisted host
      (6L, "http://site.com/c?utm_source=x&q=1"), // LEADING tracking param
      (7L, "http://site.com/c?q=1"),              // same canonical as 6
      (8L, "https://odd.com:80/x")                // :80 NOT default for https
    ).toDF("doc_id", "url")
    val blocked = Seq("blocked.com").toDF("host")
    val out = CorpusOps.canonicalizeUrls(urls, blocked)
      .orderBy("canonical_url").collect()
    out.map(_.getAs[String]("canonical_url")) shouldBe Array(
      "http://site.com/a", "http://site.com/c?q=1",
      "https://odd.com:80/x", "https://other.com/b?q=1")
    val a = out(0)
    a.getAs[Long]("doc_id") shouldBe 1L      // crawl-order winner
    a.getAs[Long]("n_dupes") shouldBe 3L
    out(1).getAs[Long]("n_dupes") shouldBe 2L // '?utm=..&q=1' merged with '?q=1'
    out(3).getAs[String]("host") shouldBe "other.com"
  }

  test("count-min sketch: estimates are exact-or-over, exact when collision-free") {
    val df = (Seq.fill(10)("hot") ++ Seq("a", "b", "b")).map(Tuple1(_)).toDF("k")
    val sketch = CorpusOps.countMinSketch(df, "k", w = 256, d = 4)
    sketch.agg(sum("cnt")).head.getLong(0) shouldBe 13L * 4 // each row counts all keys
    val est = CorpusOps.cmsEstimate(sketch, df.select("k").distinct(), "k", w = 256, d = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 keys in 256 buckets x 4 rows: no collisions, estimates exact
    est shouldBe Map("hot" -> 10L, "a" -> 1L, "b" -> 2L)
    // never-seen key: estimate only collides upward, never below zero
    val cold = CorpusOps.cmsEstimate(sketch, Seq(Tuple1("zzz")).toDF("k"), "k")
      .head.getLong(1)
    cold should be >= 0L
  }

  test("mixturePlan: alpha < 1 upsamples the low-resource domain") {
    val docs = Seq(
      (1L, "en", ("w " * 900).trim),   // 900 tokens
      (2L, "is", ("w " * 100).trim)    // 100 tokens: the tail language
    ).toDF("doc_id", "lang", "text")
    val out = CorpusOps.mixturePlan(docs, budgetTokens = 1000L, alpha = 0.3)
      .orderBy("lang").collect()
    val en = out(0); val is = out(1)
    en.getAs[Long]("tokens") shouldBe 900L
    en.getAs[Long]("share_micro") shouldBe 900000L
    // alpha flattens: en natural share 90% -> weight well below 90%
    en.getAs[Long]("weight_micro") should be < 700000L
    is.getAs[Long]("weight_micro") should be > 300000L
    // epochs: the tail domain is repeated more per its size
    is.getAs[Double]("epochs") should be > en.getAs[Double]("epochs")
    // weights sum to ~1e6 (floor-division remainder only)
    (en.getAs[Long]("weight_micro") + is.getAs[Long]("weight_micro")) should
      be >= 999998L
  }

  test("snapshotDiff classifies added/removed/changed/unchanged; null text handled") {
    val prev = Seq(
      (1L, "same"), (2L, "old"), (3L, "gone"), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val cur = Seq(
      (1L, "same"), (2L, "new"), (5L, "fresh"), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = CorpusOps.snapshotDiff(cur, prev)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added")
  }

  test("capPerGroup caps a NULL group key like any other group") {
    val df = (1L to 20L).map(i => (i, null.asInstanceOf[String], i))
      .toDF("doc_id", "source", "n_chars")
    val kept = CorpusOps.capPerGroup(df, "source", "n_chars", cap = 10)
      .select("doc_id").as[Long].collect().sorted
    kept.toSeq shouldBe (11L to 20L) // top-10 by score, not all 20
  }

  test("canonicalizeUrls does not collapse schemeless urls to one key") {
    val urls = Seq(
      (1L, "example.com/a"), (2L, "other.org/b"),
      (3L, "http://example.com/a")).toDF("doc_id", "url")
    val out = CorpusOps.canonicalizeUrls(urls, Seq.empty[String].toDF("host"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // schemeless rows canonicalize under an assumed scheme; 1 and 3 unify
    out.keySet shouldBe Set("http://example.com/a", "http://other.org/b")
    out("http://example.com/a") shouldBe 2L
  }

  test("capPerGroup keeps top-cap by score (ties to low id); under-cap groups untouched") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "a", 30L), (4L, "a", 50L), (5L, "a", 5L),
      (6L, "b", 1L), (7L, "b", 2L)
    ).toDF("doc_id", "source", "n_chars")
    val kept = CorpusOps.capPerGroup(df, "source", "n_chars", cap = 3)
      .select("doc_id").as[Long].collect().sorted
    // a: 4 (50), 2 (30, lower id wins tie), 3 (30) survive; b entirely under cap
    kept shouldBe Array(2L, 3L, 4L, 6L, 7L)
  }

  test("histogramQuantiles brackets the exact quantile within one bin") {
    val df = (0L until 100L).toDF("v")
    val qs = CorpusOps.histogramQuantiles(df, "v", binWidth = 10L,
        permilles = Seq(500, 1000))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // p500: cum reaches 50 at bin 4 (values 40-49); exact median 49.5
    qs(500L) shouldBe (40L, 49L)
    // p1000: the last non-empty bin
    qs(1000L) shouldBe (90L, 99L)
  }

  test("histogramQuantiles integer threshold: no float-ceil drift") {
    // 3 rows: p334 needs cum*1000 >= 334*3 = 1002 -> cum >= 2 (not 1)
    val df = Seq(10L, 20L, 30L).toDF("v")
    val q = CorpusOps.histogramQuantiles(df, "v", 10L, Seq(334))
      .head()
    q.getLong(1) shouldBe 20L
  }

  test("kAnonymityViolations reports only under-k combos") {
    val df = Seq(
      ("en", "s0"), ("en", "s0"), ("en", "s0"), // 3 -> safe at k=3
      ("en", "s1"), ("en", "s1"),               // 2 -> violation
      ("de", "s0")                              // 1 -> violation
    ).toDF("lang", "source")
    val out = CorpusOps.kAnonymityViolations(df, Seq("lang", "source"), k = 3L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    out shouldBe Set(("en", "s1", 2L), ("de", "s0", 1L))
  }

  test("hllEstimate lands within the sketch's error band; small sets use linear counting") {
    val big = (1L to 2000L).map(i => ("g", s"key-$i")).toDF("grp", "k")
    val est = CorpusOps.hllEstimate(big, "k", Seq("grp")).head().getDouble(1)
    // 64 registers -> ~13% relative error; allow 3 sigma
    est should be > 2000.0 * 0.6
    est should be < 2000.0 * 1.4
    // small cardinality triggers the linear-counting branch: m*ln(m/V)
    val small = (1L to 10L).map(i => ("g", s"key-$i")).toDF("grp", "k")
    val estSmall = CorpusOps.hllEstimate(small, "k", Seq("grp")).head().getDouble(1)
    estSmall should be > 5.0
    estSmall should be < 20.0
    // duplicates must not move the estimate (cardinality, not count)
    val dup = big.union(big).union(big)
    CorpusOps.hllEstimate(dup, "k", Seq("grp")).head().getDouble(1) shouldBe est
  }

  test("hll registers merge by max: shard-fold equals the whole corpus") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(lit("g").as("grp"), col("text").as("k"))
    val shardA = docs.filter(crc32(col("k")) % 2 === 0)
    val shardB = docs.filter(crc32(col("k")) % 2 =!= 0)
    val merged = CorpusOps.hllRegisters(shardA, "k", Seq("grp"))
      .unionByName(CorpusOps.hllRegisters(shardB, "k", Seq("grp")))
      .groupBy("grp", "_bucket").agg(max("_m").as("_m"))
    val foldEst = CorpusOps.hllFromRegisters(merged, Seq("grp")).head().getDouble(1)
    val wholeEst = CorpusOps.hllEstimate(docs, "k", Seq("grp")).head().getDouble(1)
    foldEst shouldBe wholeEst
  }

  test("grouped histogramQuantiles equals the global form per group") {
    val df = (0L until 300L).map(i => (s"g${i % 3}", i * 7 % 500)).toDF("g", "v")
    val grouped = CorpusOps.histogramQuantiles(df, "v", 10L, Seq(500, 900), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = CorpusOps.histogramQuantiles(
        df.filter(col("g") === g), "v", 10L, Seq(500, 900))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      withClue(s"group $g: ") {
        grouped((g, 500L)) shouldBe solo(500L)
        grouped((g, 900L)) shouldBe solo(900L)
      }
    }
  }

  test("grouped histogramQuantiles keeps a NULL group key like any other group") {
    val df = ((0L until 100L).map(i => (null.asInstanceOf[String], i)) ++
      (0L until 100L).map(i => ("en", i))).toDF("g", "v")
    val out = CorpusOps.histogramQuantiles(df, "v", 10L, Seq(500), Seq("g"))
      .collect().map(r => Option(r.getString(0)) -> (r.getLong(2), r.getLong(3))).toMap
    // both groups hold 0..99, so both medians land in the same bin
    out(None) shouldBe (40L, 49L)
    out(Some("en")) shouldBe (40L, 49L)
  }

  test("histogramQuantiles ignores NULL values instead of dragging quantiles to the minimum") {
    val df = ((0L until 50L).map(i => Some(i)) ++ Seq.fill(50)(None))
      .map(v => Tuple1(v.map(Long.box).orNull)).toDF("v")
    val out = CorpusOps.histogramQuantiles(df, "v", 10L, Seq(500), Seq.empty)
      .select("q_lo", "q_hi").collect().map(r => (r.getLong(0), r.getLong(1))).head
    // median of the 50 REAL values (0..49) is ~25 -> bin [20, 29]
    out shouldBe (20L, 29L)
  }

  test("applyChanges: a NULL/unknown op re-inserts as upsert, never a silent delete") {
    val base = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val changes = Seq(
      (1L, 11L, null.asInstanceOf[String], 1L), // malformed op: must not delete key 1
      (2L, 22L, "delete", 1L)
    ).toDF("k", "v", "op", "seq")
    val out = CorpusOps.applyChanges(base, changes, Seq("k"), "seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out shouldBe Map(1L -> 11L) // key 1 upserted, key 2 deleted
  }

  test("applyChanges treats a NULL key null-safely: upsert replaces, delete removes") {
    val base = Seq[(java.lang.Long, Long)]((1L, 10L), (null, 20L), (3L, 30L))
      .toDF("k", "v")
    val upsert = Seq[(java.lang.Long, Long, String, Long)](
      (null, 99L, "upsert", 1L)).toDF("k", "v", "op", "seq")
    val up = CorpusOps.applyChanges(base, upsert, Seq("k"), "seq")
      .collect().map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    // the NULL-keyed base row is replaced, not duplicated
    up shouldBe Map(Some(1L) -> 10L, None -> 99L, Some(3L) -> 30L)
    val del = Seq[(java.lang.Long, Long, String, Long)](
      (null, 0L, "delete", 1L)).toDF("k", "v", "op", "seq")
    val after = CorpusOps.applyChanges(base, del, Seq("k"), "seq")
      .collect().map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    after shouldBe Map(Some(1L) -> 10L, Some(3L) -> 30L)
  }

  test("dqReport: one row per rule, nulls count as violations") {
    val df = Seq[(java.lang.Long, String)]((1L, "ok"), (60L, "ok"), (null, "bad"))
      .toDF("v", "tag")
    val out = CorpusOps.dqReport(df, Seq(
      "v_small" -> (col("v") <= 50L),
      "tag_ok" -> (col("tag") === "ok")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out("v_small") shouldBe (3L, 2L) // 60 fails, null is unknown -> violation
    out("tag_ok") shouldBe (3L, 1L)
  }

  test("applyChanges: last-wins upserts, deletes drop, untouched stream through") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val changes = Seq(
      (2L, "b2", "upsert", 1L), (2L, "b3", "upsert", 2L), // later seq wins
      (3L, "c", "delete", 1L),
      (4L, "d", "upsert", 1L)
    ).toDF("id", "v", "op", "seq")
    val out = CorpusOps.applyChanges(base, changes, Seq("id"), "seq")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "a", 2L -> "b3", 4L -> "d")
  }

  test("applyChanges: delete then later re-insert resurrects the key") {
    val base = Seq((1L, "a")).toDF("id", "v")
    val changes = Seq(
      (1L, "a", "delete", 1L), (1L, "a2", "upsert", 2L)
    ).toDF("id", "v", "op", "seq")
    val out = CorpusOps.applyChanges(base, changes, Seq("id"), "seq")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(1L -> "a2")
  }

  test("capPerGroup equals the single-window formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 120L).map(i => (i, s"s${i % 5}", i * 7 % 31)).toDF("doc_id", "source", "n_chars")
    val twoPhase = CorpusOps.capPerGroup(df, "source", "n_chars", cap = 10)
      .select("doc_id").as[Long].collect().sorted
    val oneWindow = df.withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(desc("n_chars"), asc("doc_id"))))
      .filter(col("rk") <= 10).select("doc_id").as[Long].collect().sorted
    twoPhase shouldBe oneWindow
  }

  test("distributionDrift: identical snapshots score zero, a shifted one positive") {
    val a = (1L to 200L).map(i => Tuple1(i % 50)).toDF("v")
    val same = CorpusOps.distributionDrift(a, a, "v", binWidth = 10L)
    val sameRows = same.collect()
    Dedup.releaseCheckpoints(same)
    sameRows.foreach(r => r.getLong(5) shouldBe 0L)   // psi_micro
    sameRows.foreach(r => r.getLong(1) shouldBe r.getLong(2)) // n_a == n_b
    // shifted snapshot: mass moves up two bins -> strictly positive PSI
    val b = (1L to 200L).map(i => Tuple1(i % 50 + 20)).toDF("v")
    val drift = CorpusOps.distributionDrift(a, b, "v", binWidth = 10L)
    val total = drift.agg(sum("psi_micro")).head().getLong(0)
    Dedup.releaseCheckpoints(drift)
    total should be > 100000L // past the classic 0.1 watch threshold
    // NULLs are not values on either side
    val withNulls = a.union(Seq(Tuple1(null.asInstanceOf[java.lang.Long]))
      .toDF("v").select(col("v").cast("long")))
    val nn = CorpusOps.distributionDrift(withNulls, a, "v", binWidth = 10L)
    nn.agg(sum("n_a")).head().getLong(0) shouldBe 200L
    Dedup.releaseCheckpoints(nn)
  }

  test("applyMixture: survivors are the per-group hash sample at the planned rate") {
    val docs = (1L to 300L).map { i =>
      val lang = if (i % 10 < 6) "en" else if (i % 10 < 9) "de" else "zh"
      (i, lang, Seq.fill(4)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val out = CorpusOps.applyMixture(docs, budgetTokens = 400L)
      .select("doc_id").as[Long].collect().sorted
    // reference: derive each group's keep permille from the plan and
    // re-apply the public sampleByHash rule group by group
    val plan = CorpusOps.mixturePlan(docs, budgetTokens = 400L).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(2))).toMap
    val expect = plan.toSeq.flatMap { case (lang, (wMicro, tokens)) =>
      val pm = math.min(1000L, 1000L * wMicro * 400L / (1000000L * tokens)).toInt
      Sampling.sampleByHash(docs.filter(col("lang") === lang), "doc_id", pm)
        .select("doc_id").as[Long].collect()
    }.sorted
    out shouldBe expect
    out.length should be < 300 // the budget genuinely down-samples
    // reserved-name guard
    an[Exception] should be thrownBy CorpusOps.applyMixture(
      docs.withColumn("__keep_pm", lit(1)), budgetTokens = 400L)
  }

  test("heavy hitters: exact regime — native MG aggregate ≡ exact " +
    "groupBy twin across partitions (serialize + merge path exercised)") {
    // skewed keys over two groups, scattered over 7 partitions so the
    // aggregate's serialize/deserialize/merge all fire
    val rows = for {
      g <- Seq("g1", "g2")
      (key, n) <- Seq("a" -> 40, "b" -> 25, "c" -> 25, "d" -> 7, "e" -> 3)
      i <- 0 until n
    } yield (g, s"$key${if (g == "g2") "2" else ""}", i)
    val df = rows.toDF("lang", "w", "i").repartition(7).select("lang", "w")
    val exact = CorpusOps.heavyHitters(df, "w", "lang", k = 4, native = false)
      .orderBy("lang", "rank").collect().map(_.toSeq)
    val native = CorpusOps.heavyHitters(df, "w", "lang", k = 4, native = true)
      .orderBy("lang", "rank").collect().map(_.toSeq)
    native shouldBe exact
    exact.length shouldBe 8
    // b/c tie at 25 breaks by key ascending in both paths
    exact(1)(2) shouldBe "b"
    exact(2)(2) shouldBe "c"
  }

  test("heavy hitters: the aggregate serves a complete-mode stream — " +
    "summaries accumulate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, String)](spark)
    val agg = mem.toDF.toDF("lang", "w")
      .groupBy("lang")
      .agg(call_function("graft_heavy_hitters", col("w"), lit(16)).as("hh"))
    val q = agg.writeStream.format("memory").queryName("hh_stream")
      .outputMode("complete").start()
    mem.addData(("g", "a"), ("g", "a"), ("g", "b"))
    q.processAllAvailable()
    mem.addData(("g", "a"), ("g", "c"), ("g", "b"), ("g", "b"))
    q.processAllAvailable()
    val rows = spark.table("hh_stream").collect()
    q.stop()
    spark.sql("DROP TABLE IF EXISTS hh_stream")
    rows.length shouldBe 1
    // exact regime across BOTH batches: a=3, b=3, c=1 — state
    // round-trips the MG buffer through the store between batches
    val hh = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    hh shouldBe Seq(("a", 3L), ("b", 3L), ("c", 1L))
  }

  test("heavy hitters: sub-capacity regime keeps every true heavy " +
    "hitter with undercount <= N/(capacity+1)") {
    // N=20: 'a' x10 + ten singletons; capacity 2 -> error bound
    // floor(20/3) = 6: 'a' (true 10 > bound) MUST survive with
    // count >= 10 - 6 = 4 and never overcount
    val rows = Seq.fill(10)("a") ++ (0 until 10).map(i => s"s$i")
    val df = rows.map(("g", _)).toDF("lang", "w").repartition(5)
    val out = CorpusOps.heavyHitters(
      df, "w", "lang", k = 2, capacity = 2, native = true).collect()
    val a = out.find(_.getString(2) == "a")
    a.isDefined shouldBe true
    val cnt = a.get.getLong(3)
    cnt should be >= 4L
    cnt should be <= 10L
  }

  test("quantile sketch: exact regime — native compactor aggregate ≡ " +
    "exact cumulative-window twin across partitions") {
    // two groups with different shapes, scattered over 7 partitions so
    // the aggregate's serialize/deserialize/merge all fire; duplicates
    // exercise the weight-summing eval
    val rows = (0 until 500).map(i => ("g1", (i % 97).toLong)) ++
      (0 until 300).map(i => ("g2", (i * i % 41).toLong))
    val df = rows.toDF("lang", "v").repartition(7)
    val probs = Seq(10, 250, 500, 900, 1000)
    val exact = CorpusOps.quantileSketch(df, "v", "lang", probs,
      capacity = 1024, native = false).orderBy("lang").collect().map(_.toSeq)
    val native = CorpusOps.quantileSketch(df, "v", "lang", probs,
      capacity = 1024, native = true).orderBy("lang").collect().map(_.toSeq)
    native shouldBe exact
    exact.length shouldBe 2
    exact.head(1) shouldBe 500L                    // n_values
    exact.head(probs.length + 1) shouldBe 96L      // p1000 = max observed
  }

  test("quantile sketch: the aggregate serves a complete-mode stream — " +
    "summaries accumulate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, Long)](spark)
    val agg = mem.toDF.toDF("lang", "v")
      .groupBy("lang")
      .agg(call_function("graft_quantile_sketch", col("v"), lit(64)).as("qs"))
    val q = agg.writeStream.format("memory").queryName("qs_stream")
      .outputMode("complete").start()
    mem.addData(("g", 5L), ("g", 1L), ("g", 5L))
    q.processAllAvailable()
    mem.addData(("g", 9L), ("g", 1L))
    q.processAllAvailable()
    val rows = spark.table("qs_stream").collect()
    q.stop()
    spark.sql("DROP TABLE IF EXISTS qs_stream")
    rows.length shouldBe 1
    // exact regime across BOTH batches: the buffer round-trips the
    // store between batches and eval sums weights per distinct value
    val qs = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getLong(1)))
    qs shouldBe Seq((1L, 2L), (5L, 2L), (9L, 1L))
  }

  test("quantile sketch: compaction regime stays within the MRL rank-" +
    "error bound and keeps total weight ~N") {
    // 20k distinct values 0..N-1 hashed across partitions, capacity 256
    // -> ~6 compaction levels; the value returned for p‰ has true rank
    // value+1, so the rank error is directly observable. The MRL bound
    // is N·levels/capacity ≈ 625; assert the looser 0.05·N and the
    // within-summary invariants
    val n = 20000
    val df = (0 until n).map(i => ("g", i.toLong)).toDF("lang", "v")
      .repartition(8, col("v"))
    val out = CorpusOps.quantileSketch(df, "v", "lang",
      Seq(500, 900, 990), capacity = 256, native = true).collect()
    out.length shouldBe 1
    val row = out.head
    row.getLong(1).toDouble shouldBe n.toDouble +- (n * 0.01)
    val (p500, p900, p990) = (row.getLong(2), row.getLong(3), row.getLong(4))
    p500.toDouble shouldBe (n * 0.500) +- (n * 0.05)
    p900.toDouble shouldBe (n * 0.900) +- (n * 0.05)
    p990.toDouble shouldBe (n * 0.990) +- (n * 0.05)
    p500 should be <= p900
    p900 should be <= p990
  }

  test("profileNumericSketch: exact regime equals a hand-computed exact " +
    "profile (counts/min/max/discrete quantiles) with the HLL estimate " +
    "for distinct; nulls counted, never sketched") {
    val rows = (0 until 400).map(i =>
      (i.toLong, if (i % 5 == 0) None else Some(i.toDouble / 100.0)))
    val df = rows.toDF("a", "b").repartition(7)
    for (native <- Seq(false, true)) {
      val out = CorpusOps.profileNumericSketch(df, Seq("a", "b"),
        scale = 100L, capacity = 4096, native = native)
        .orderBy("col_name").collect()
      withClue(s"native=$native: ") {
        out.length shouldBe 2
        val a = out.head
        a.getString(0) shouldBe "a"
        a.getLong(1) shouldBe 400L // n_rows
        a.getLong(2) shouldBe 400L // n_present
        a.getLong(3) shouldBe 0L   // n_null
        a.getLong(4) shouldBe 0L   // min = 0·100
        a.getLong(5) shouldBe 39900L
        a.getLong(6) shouldBe 19900L // p500: the 200th of 0,100,…,39900
        val b = out(1)
        b.getLong(1) shouldBe 400L
        b.getLong(2) shouldBe 320L // 80 nulls skipped
        b.getLong(3) shouldBe 80L
        b.getLong(4) shouldBe 1L   // min present: i=1 → 0.01·100
        b.getLong(5) shouldBe 399L
        // HLL over 400 (resp. 320) distinct values: 13% relative error
        a.getDouble(9) shouldBe 400.0 +- 160.0
        b.getDouble(9) shouldBe 320.0 +- 130.0
      }
    }
  }

  test("top-k aggregate: exact — native graft_top_k ≡ rank window " +
    "across partitions, ties at the k boundary break by key ASC") {
    // g1: a>b=c(tie)>d>e; k=3 cuts INSIDE the b/c tie region at rank
    // 2-3 and excludes d/e; g2 has fewer keys than k (returns all).
    // repartition(7) scatters rows so serialize/merge both fire.
    val rows = Seq(
      ("g1", "a", 40L), ("g1", "d", 7L), ("g1", "c", 25L),
      ("g1", "b", 25L), ("g1", "e", 3L),
      ("g2", "x", 5L), ("g2", "y", 9L))
    val counts = rows.toDF("lang", "gram", "n_docs").repartition(7)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy(desc("n_docs"), asc("gram"))
    val win = counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("lang", "rank", "gram", "n_docs")
      .orderBy("lang", "rank").collect().map(_.toSeq)
    val agg = counts.groupBy("lang")
      .agg(call_function("graft_top_k", col("gram"), col("n_docs"), lit(3))
        .as("tk"))
      .select(col("lang"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
        col("e.key").as("gram"), col("e.cnt").as("n_docs"))
      .orderBy("lang", "rank").collect().map(_.toSeq)
    agg shouldBe win
    agg.length shouldBe 5 // 3 for g1, all 2 for g2
    // the b/c tie at 25: both in, b before c (key ASC)
    agg(1)(2) shouldBe "b"
    agg(2)(2) shouldBe "c"
  }

  test("top-k aggregate: boundary tie BEYOND k drops the larger key — " +
    "exactly row_number's choice") {
    // three keys tied at the k=2 boundary value: only the two smallest
    // survive, regardless of partition layout
    val rows = Seq(("g", "z", 10L), ("g", "m", 10L), ("g", "q", 10L),
      ("g", "top", 99L))
    val out = rows.toDF("g", "k", "v").repartition(5).groupBy("g")
      .agg(call_function("graft_top_k", col("k"), col("v"), lit(3)).as("tk"))
      .select(explode(col("tk")).as("e")).select("e.key").as[String]
      .collect()
    out shouldBe Array("top", "m", "q")
  }

  test("top-k aggregate partial-aggregates BEFORE the exchange in the " +
    "native topNgrams plan, and both paths return identical rows") {
    val docs = (0 until 200).map(i =>
      (i.toLong, s"w${i % 13} w${(i * 7) % 13} end tok", // shared bigrams
        if (i % 2 == 0) "en" else "de")).toDF("doc_id", "text", "lang")
    val win = TextAnalysis.topNgrams(docs, k = 5)
      .orderBy("lang", "rank").collect().map(_.toSeq)
    val agg = TextAnalysis.topNgrams(docs, k = 5, native = true)
    val rows = agg.orderBy("lang", "rank").collect().map(_.toSeq)
    rows shouldBe win
    // the k-bounded heap must sit below the shuffle — the no-sort /
    // bounded-wire claim is false without the partial
    agg.queryExecution.executedPlan.toString should
      include("partial_graft_top_k")
  }

  test("top-k aggregate serves a complete-mode stream — rank windows " +
    "can't; selection accumulates across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(String, String, Long)](spark)
    val agg = mem.toDF.toDF("lang", "k", "v")
      .groupBy("lang")
      .agg(call_function("graft_top_k", col("k"), col("v"), lit(2)).as("tk"))
    val q = agg.writeStream.format("memory").queryName("tk_stream")
      .outputMode("complete").start()
    mem.addData(("g", "a", 3L), ("g", "b", 1L))
    q.processAllAvailable()
    mem.addData(("g", "c", 2L), ("g", "d", 9L))
    q.processAllAvailable()
    val rows = spark.table("tk_stream").collect()
    q.stop()
    spark.sql("DROP TABLE IF EXISTS tk_stream")
    rows.length shouldBe 1
    // across both batches: d=9, a=3 are the true top-2 (b dropped once
    // c and d arrived — state round-trips the heap between batches)
    val tk = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    tk shouldBe Seq(("d", 9L), ("a", 3L))
  }

  test("sketch routing ships summaries, not values: the quantile " +
    "aggregate partial-aggregates BEFORE the exchange in " +
    "lengthQuantilesSketch and profileNumericSketch plans") {
    val docs = (0 until 100).map(i =>
      (i.toLong, "w " * (i % 17 + 1), if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "text", "lang")
    val lq = TextAnalysis.lengthQuantilesSketch(docs, native = true)
    lq.collect()
    val lqPlan = lq.queryExecution.executedPlan.toString
    // the MAP-SIDE (partial) sketch must sit below the shuffle: the
    // whole wire-volume claim — O(capacity) summaries cross, values
    // don't — is false without it
    lqPlan should include("partial_graft_quantile_sketch")
    val pf = CorpusOps.profileNumericSketch(
      docs.withColumn("n", col("doc_id") * 2), Seq("doc_id", "n"),
      native = true)
    pf.collect()
    pf.queryExecution.executedPlan.toString should
      include("partial_graft_quantile_sketch")
  }

  test("robustOutliers: hand-computed discrete median/MAD truth — " +
    "exact path ≡ sketch route, MAD = 0 flags every off-median row, " +
    "and the sketch route partial-aggregates before the exchange") {
    // group a: values 1..7 and 100. Discrete median (cum·1000 ≥
    // 500·total, total 8 → cum ≥ 4) = 4; devs {3,2,1,0,1,2,3,96},
    // MAD (4th smallest of sorted devs {0,1,1,2,2,3,3,96}) = 2;
    // 1000·dev > 3500·2 = 7000 → only the 100 (dev 96) flags.
    // group b: seven 5s and one 6 → med 5, devs {0×7, 1}, MAD 0 —
    // the degenerate group: every off-median row flags (the 6).
    import spark.implicits._
    val rows = ((1L to 7L) :+ 100L).map(v => (v, "a", v)) ++
      (Seq.fill(7)(5L) :+ 6L).zipWithIndex
        .map { case (v, i) => (200L + i, "b", v) }
    val df = rows.toDF("doc_id", "grp", "v")
    def run(native: Boolean) =
      CorpusOps.robustOutliers(df, "v", "grp", cMilli = 3500L,
        native = native)
        .select("doc_id", "grp", "v", "med", "mad", "dev")
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val exact = run(native = false)
    exact shouldBe Seq(
      Seq(100L, "a", 100L, 4L, 2L, 96L),
      Seq(207L, "b", 6L, 5L, 0L, 1L))
    run(native = true) shouldBe exact
    val sk = CorpusOps.robustOutliers(df, "v", "grp", native = true)
    sk.collect()
    sk.queryExecution.executedPlan.toString should
      include("partial_graft_quantile_sketch")
  }
}
