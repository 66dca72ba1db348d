package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the library's native expressions, enabled
  * with `spark.sql.extensions=graft.plans.GraftExtensions` (wired by
  * [[graft.Sessions.builder]]). After registration the expressions are
  * callable from SQL and via `functions.call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type Builder = Seq[Expression] => Expression

  /** Whether the graft functions are registered in THIS session's registry.
    * Dispatch must key on the session that will analyze the plan (the
    * DataFrame's own), not `getActiveSession` — with two sessions in one
    * JVM the thread-active one can differ from the one resolving the query.
    *
    * `graft_qdot` is probed as a PROXY for the whole function set
    * (ADVICE r15): every registration path (`spark.sql.extensions` and
    * [[ensureRegistered]]) installs all of [[functions]] together, so
    * qdot-present ⇒ the full set is present. A session that somehow
    * held qdot alone (jar/version skew) would fail analysis at the
    * dispatching call site — loudly, not with wrong results.
    */
  def available(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.sessionState.functionRegistry.functionExists(FunctionIdentifier("graft_qdot"))

  /** Register the NAMED graft functions into a vanilla session's live
    * registry (idempotent) — the one audited path for runtime
    * registration. Reserved for DETERMINISTIC algorithms with a single
    * portable definition (edit distances, Unicode normalization):
    * registering the hash family this way could silently mix hash
    * families across corpora, so callers name functions explicitly.
    */
  def ensureRegistered(
      spark: org.apache.spark.sql.SparkSession,
      names: Set[String]): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions
      .filter { case (ident, _, _) => names(ident.funcName) }
      .foreach { case (ident, info, builder) =>
        if (!reg.functionExists(ident))
          reg.registerFunction(ident, info, builder)
      }
  }

  // Weak keys: the SESSION OBJECT itself keys the warned-ops set, so keying
  // is identity-exact (an identityHashCode string can collide between two
  // sessions, silently suppressing a warning that must be loud) and entries
  // die with their session instead of accumulating across session churn.
  private val fallbackWarned =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.Set[String]]()

  private def warnOnce(spark: org.apache.spark.sql.SparkSession, op: String): Boolean =
    fallbackWarned.synchronized {
      fallbackWarned
        .computeIfAbsent(spark, _ => new java.util.HashSet[String]())
        .add(op)
    }

  /** [[available]], but logs ONCE per (session, operator) when the answer
    * is `false` for an operator whose native and fallback paths are
    * different hash families (simhash / minhash / rhp buckets).
    * Fingerprints persisted under one family will never match the other —
    * a silent cross-corpus correctness trap unless the switch is at least
    * loud. Keyed per session AND op so a later vanilla session mixing
    * families (the exact trap the warning targets) still gets its warning.
    */
  def availableOrWarn(spark: org.apache.spark.sql.SparkSession, op: String): Boolean = {
    val ok = available(spark)
    if (!ok && warnOnce(spark, op))
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"graft extensions are not registered in this session: $op falls back " +
          "to the interpreted xxhash64 hash family. Fingerprints/buckets will " +
          "NOT match those computed under a graft session " +
          "(graft.Sessions.builder); do not mix the two within one corpus.")
    ok
  }

  private def expectArity(name: String, children: Seq[Expression], n: Int): Unit =
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$name requires exactly $n argument(s), got ${children.length}")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_qdot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "graft_qdot"),
      (children: Seq[Expression]) => {
        expectArity("graft_qdot", children, 2)
        LongDotProduct(children.head, children(1))
      }),
    (FunctionIdentifier("graft_maxsim"),
      new ExpressionInfo(classOf[MaxSimScore].getName, "graft_maxsim"),
      (children: Seq[Expression]) => {
        expectArity("graft_maxsim", children, 3)
        MaxSimScore(children.head, children(1), children(2))
      }),
    (FunctionIdentifier("graft_sign_masks"),
      new ExpressionInfo(classOf[SignMasks].getName, "graft_sign_masks"),
      (children: Seq[Expression]) => {
        expectArity("graft_sign_masks", children, 2)
        val dim = children(1) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(
              s"graft_sign_masks dim must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_sign_masks dim must be a literal")
        }
        SignMasks(children.head, dim)
      }),
    (FunctionIdentifier("graft_rhp_sig_portable"),
      new ExpressionInfo(classOf[RhpSigPortable].getName, "graft_rhp_sig_portable"),
      (children: Seq[Expression]) => {
        expectArity("graft_rhp_sig_portable", children, 3)
        def intLit(e: Expression, what: String): Int = e match {
          case x if x.foldable => x.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(
              s"graft_rhp_sig_portable $what must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(s"graft_rhp_sig_portable $what must be a literal")
        }
        RhpSigPortable(children.head,
          intLit(children(1), "planes"), intLit(children(2), "dim"))
      }),
    (FunctionIdentifier("graft_minhash_buckets"),
      new ExpressionInfo(
        classOf[MinHashBucketsPortable].getName, "graft_minhash_buckets"),
      (children: Seq[Expression]) => {
        expectArity("graft_minhash_buckets", children, 3)
        def intLit(e: Expression, what: String): Int = e match {
          case x if x.foldable => x.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(
              s"graft_minhash_buckets $what must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException(s"graft_minhash_buckets $what must be a literal")
        }
        MinHashBucketsPortable(children.head,
          intLit(children(1), "numHashes"), intLit(children(2), "bands"))
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (children: Seq[Expression]) => {
        expectArity("graft_simhash", children, 1)
        SimHash64(children.head)
      }),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        expectArity("graft_minhash", children, 2)
        val k = children(1) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(s"graft_minhash k must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_minhash k must be a literal")
        }
        MinHashSig(children.head, k)
      }),
    (FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "graft_token_count"),
      (children: Seq[Expression]) => {
        expectArity("graft_token_count", children, 2)
        val mode = children(1) match {
          case e if e.foldable => e.eval(null).toString
          case _ => throw new IllegalArgumentException("graft_token_count mode must be a literal")
        }
        mode match {
          case "bpe"   => TokenCount(children.head, bpe = true)
          case "punct" => TokenCount(children.head, bpe = false)
          case other   => throw new IllegalArgumentException(
            s"graft_token_count mode must be 'bpe' or 'punct', got '$other'")
        }
      }),
    (FunctionIdentifier("graft_greedy_tokenize"),
      new ExpressionInfo(classOf[GreedyTokenize].getName, "graft_greedy_tokenize"),
      (children: Seq[Expression]) => {
        expectArity("graft_greedy_tokenize", children, 2)
        val vocab = children(1) match {
          case e if e.foldable &&
              (e.dataType match {
                case org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.StringType, _) => true
                case _ => false
              }) =>
            val arr = e.eval(null)
              .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toObjectArray(org.apache.spark.sql.types.StringType)
            if (arr.exists(_ == null))
              throw new IllegalArgumentException("graft_greedy_tokenize vocab must not contain NULL entries")
            arr.map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
          case _ => throw new IllegalArgumentException("graft_greedy_tokenize vocab must be an array<string> literal")
        }
        GreedyTokenize(children.head, vocab)
      }),
    (FunctionIdentifier("graft_viterbi_tokenize"),
      new ExpressionInfo(classOf[ViterbiTokenize].getName, "graft_viterbi_tokenize"),
      (children: Seq[Expression]) => {
        expectArity("graft_viterbi_tokenize", children, 4)
        def literalArray(e: Expression, what: String): Array[AnyRef] = e match {
          case l if l.foldable && l.dataType.isInstanceOf[
              org.apache.spark.sql.types.ArrayType] =>
            val et = l.dataType
              .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
            val arr = l.eval(null)
              .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toObjectArray(et)
            if (arr.exists(_ == null))
              throw new IllegalArgumentException(s"graft_viterbi_tokenize $what must not contain NULLs")
            arr
          case _ => throw new IllegalArgumentException(s"graft_viterbi_tokenize $what must be an array literal")
        }
        val vocab = literalArray(children(1), "vocab")
          .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
        val costs = literalArray(children(2), "costs").map {
          case i: Integer            => i.intValue()
          case l: java.lang.Long     => l.toInt
          case other                 => throw new IllegalArgumentException(
            s"graft_viterbi_tokenize costs must be int literals, got $other")
        }.toSeq
        val unk = children(3) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(
              s"graft_viterbi_tokenize unkCost must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_viterbi_tokenize unkCost must be a literal")
        }
        ViterbiTokenize(children.head, vocab, costs, unk)
      }),
    (FunctionIdentifier("graft_nb_score"),
      new ExpressionInfo(classOf[NbScore].getName, "graft_nb_score"),
      (children: Seq[Expression]) => {
        expectArity("graft_nb_score", children, 4)
        def literalArray(e: Expression, what: String): Array[AnyRef] = e match {
          case l if l.foldable && l.dataType.isInstanceOf[
              org.apache.spark.sql.types.ArrayType] =>
            val et = l.dataType
              .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
            val arr = l.eval(null)
              .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
              .toObjectArray(et)
            if (arr.exists(_ == null))
              throw new IllegalArgumentException(s"graft_nb_score $what must not contain NULLs")
            arr
          case _ => throw new IllegalArgumentException(s"graft_nb_score $what must be an array literal")
        }
        val words = literalArray(children(1), "words")
          .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
        val scores = literalArray(children(2), "scores").map {
          case l: java.lang.Long    => l.longValue()
          case i: Integer           => i.longValue()
          case other                => throw new IllegalArgumentException(
            s"graft_nb_score scores must be long literals, got $other")
        }.toSeq
        val unseen = children(3) match {
          case e if e.foldable => e.eval(null) match {
            case l: Long => l
            case i: Int  => i.toLong
            case other   => throw new IllegalArgumentException(
              s"graft_nb_score unseen must be a long literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_nb_score unseen must be a literal")
        }
        NbScore(children.head, words, scores, unseen)
      }),
    (FunctionIdentifier("graft_roll_hash"),
      new ExpressionInfo(classOf[RollHash].getName, "graft_roll_hash"),
      (children: Seq[Expression]) => {
        expectArity("graft_roll_hash", children, 1)
        RollHash(children.head)
      }),
    (FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[CharEntropyPacked].getName, "graft_char_entropy"),
      (children: Seq[Expression]) => {
        expectArity("graft_char_entropy", children, 1)
        CharEntropyPacked(children.head)
      }),
    // Spark's own runtime-filter machinery (BloomFilterAggregate /
    // BloomFilterMightContain), surfaced as callable functions so library
    // code can apply it where the optimizer can't inject it itself (join
    // keys produced by an explode — see Dedup.decontaminateBloom). Both
    // take ALREADY-HASHED longs (`xxhash64(value)`), exactly as the
    // injected runtime filters do.
    (FunctionIdentifier("graft_heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersAgg].getName, "graft_heavy_hitters"),
      (children: Seq[Expression]) => {
        expectArity("graft_heavy_hitters", children, 2)
        val capacity = children(1) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(
              s"graft_heavy_hitters capacity must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_heavy_hitters capacity must be a literal")
        }
        HeavyHittersAgg(children.head, capacity)
      }),
    (FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_top_k"),
      (children: Seq[Expression]) => {
        expectArity("graft_top_k", children, 3)
        val k = children(2) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(
              s"graft_top_k k must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_top_k k must be a literal")
        }
        TopKAgg(children.head, children(1), k)
      }),
    (FunctionIdentifier("graft_quantile_sketch"),
      new ExpressionInfo(classOf[QuantileSketchAgg].getName, "graft_quantile_sketch"),
      (children: Seq[Expression]) => {
        expectArity("graft_quantile_sketch", children, 2)
        val capacity = children(1) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(
              s"graft_quantile_sketch capacity must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_quantile_sketch capacity must be a literal")
        }
        QuantileSketchAgg(children.head, capacity)
      }),
    (FunctionIdentifier("graft_lm_score"),
      new ExpressionInfo(classOf[LmScore].getName, "graft_lm_score"),
      (children: Seq[Expression]) => {
        expectArity("graft_lm_score", children, 6)
        def literalArray(e: Expression, what: String): Array[AnyRef] = e match {
          case a if a.foldable => a.eval(null) match {
            case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
              arr.toObjectArray(a.dataType
                .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)
            case other => throw new IllegalArgumentException(
              s"graft_lm_score $what must be an array literal, got $other")
          }
          case _ => throw new IllegalArgumentException(s"graft_lm_score $what must be an array literal")
        }
        val keys = literalArray(children(1), "keys")
          .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
          .toSeq
        val scores = literalArray(children(2), "scores").map {
          case l: java.lang.Long => l.longValue()
          case i: Integer        => i.longValue()
          case other             => throw new IllegalArgumentException(
            s"graft_lm_score scores must be long literals, got $other")
        }.toSeq
        def longLit(e: Expression, what: String): Long = e match {
          case x if x.foldable => x.eval(null) match {
            case l: Long => l
            case i: Int  => i.toLong
            case other   => throw new IllegalArgumentException(
              s"graft_lm_score $what must be a long literal, got $other")
          }
          case _ => throw new IllegalArgumentException(s"graft_lm_score $what must be a literal")
        }
        LmScore(children.head, keys, scores,
          longLit(children(3), "oov1"), longLit(children(4), "oov2"),
          longLit(children(5), "oov3"))
      }),
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        expectArity("graft_bloom_agg", children, 3)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          children.head, children(1), children(2))
      }),
    (FunctionIdentifier("graft_bloom_mc"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_mc"),
      (children: Seq[Expression]) => {
        expectArity("graft_bloom_mc", children, 2)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }),
    (FunctionIdentifier("graft_unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_unicode_normalize"),
      (children: Seq[Expression]) => {
        expectArity("graft_unicode_normalize", children, 2)
        val form = children(1) match {
          case e if e.foldable => e.eval(null) match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"graft_unicode_normalize form must be a string literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_unicode_normalize form must be a literal")
        }
        UnicodeNormalize(children.head, form)
      }),
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        expectArity("graft_jaro_winkler", children, 2)
        JaroWinkler(children.head, children(1))
      }),
    (FunctionIdentifier("graft_damerau_levenshtein"),
      new ExpressionInfo(classOf[DamerauLevenshtein].getName, "graft_damerau_levenshtein"),
      (children: Seq[Expression]) => {
        if (children.length != 2 && children.length != 3)
          throw new IllegalArgumentException(
            s"graft_damerau_levenshtein requires 2 or 3 arguments, got ${children.length}")
        val maxDist = if (children.length == 2) -1 else children(2) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(
              s"graft_damerau_levenshtein maxDist must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_damerau_levenshtein maxDist must be a literal")
        }
        DamerauLevenshtein(children.head, children(1), maxDist)
      }),
    (FunctionIdentifier("graft_rhp_sig"),
      new ExpressionInfo(classOf[RhpSig].getName, "graft_rhp_sig"),
      (children: Seq[Expression]) => {
        expectArity("graft_rhp_sig", children, 2)
        val planes = children(1) match {
          case e if e.foldable => e.eval(null) match {
            case i: Int  => i
            case l: Long => l.toInt
            case other   => throw new IllegalArgumentException(s"graft_rhp_sig planes must be an int literal, got $other")
          }
          case _ => throw new IllegalArgumentException("graft_rhp_sig planes must be a literal")
        }
        RhpSig(children.head, planes)
      }))
}
