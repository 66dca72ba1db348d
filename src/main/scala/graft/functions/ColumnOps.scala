package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level helpers shared by the operator library. */
object ColumnOps {

  /** Let-binding for `Column` expressions: evaluate `e` ONCE per row and
    * reuse it everywhere `f` references it.
    *
    * Catalyst's `CollapseProject` inlines aliased projections into every
    * downstream reference — an expensive expression referenced inside N
    * lambda branches (e.g. a shingle array hashed under 32 MinHash seeds)
    * gets recomputed N times. Binding it as the element of a one-element
    * array `transform` introduces a lambda variable, which CAN'T be
    * inlined: `element_at(transform(array(e), x -> f(x)), 1)`.
    *
    * Measured on the MinHash pipeline at sf0.1 this is the difference
    * between 123 s and ~2 s for the banding stage (256× redundant
    * shingle+signature evaluation collapsed to 1×).
    */
  def bind(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** Two-level let-binding. */
  def bind2(e1: Column, e2: Column)(f: (Column, Column) => Column): Column =
    bind(e1)(x1 => bind(e2)(x2 => f(x1, x2)))

  /** Exact floor division of a long column by a positive long constant,
    * valid over the FULL long range.
    *
    * The obvious `(c - pmod(c, b)) / b` is double division in Spark
    * (long / long promotes), and ~1e18 nanosecond epochs exceed a
    * double's 53-bit mantissa — the quotient can land one below the true
    * integer (measured: 3% of sampled ns epochs at b=3600). Routing the
    * subtraction through decimal(38,0) keeps every step exact; the
    * quotient divides evenly, so the final long cast is lossless.
    */
  def fdiv(c: Column, b: Long): Column = {
    require(b > 0, s"fdiv divisor must be positive, got $b")
    ((c - pmod(c, lit(b))).cast("decimal(38,0)") / lit(b)).cast("long")
  }

  /** [[fdiv]] with a POSITIVE COLUMN divisor (caller guarantees
    * positivity — pmod/division semantics shift on non-positive
    * divisors): exact floor division of non-negative longs, decimal-
    * routed for the same full-range exactness argument.
    */
  def fdivCol(a: Column, b: Column): Column =
    ((a - pmod(a, b)).cast("decimal(38,0)") / b).cast("long")
}
