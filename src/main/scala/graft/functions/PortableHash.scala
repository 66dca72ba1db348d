package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable hash family for the oracle-checkable dedup/ANN twins.
  *
  * The production operators key on Spark's `xxhash64` (fast, codegen'd,
  * seed-stable) — but DuckDB has no xxhash64, so those queries can only be
  * rows-only checked by the driver. This family trades speed for
  * portability: a 28-bit base hash from the md5 hex prefix (md5 over UTF-8
  * bytes is identical in Spark and DuckDB), then cheap seeded
  * universal-hash mixes in plain 64-bit integer arithmetic that any engine
  * reproduces exactly.
  *
  * 28 bits keeps every intermediate strictly inside a signed 64-bit long
  * even under ANSI arithmetic: `p < 2^28`, `(2i+1) <= 127` for `i < 64`,
  * so `(2i+1)·p + i·SALT < 2^36`.
  *
  * DuckDB replay of [[h28]]: `('0x' || substr(md5(s), 1, 7))::BIGINT`.
  * DuckDB replay of [[mix]]: `(p * (2*i + 1) + i * 40503) % 268435399`.
  */
object PortableHash {

  /** Largest prime below 2^28 — modulus of the mixed family. */
  val Prime = 268435399L

  /** Additive per-seed salt (Fibonacci-ish constant, fits the bound). */
  val Salt = 40503L

  /** 28-bit portable base hash: first 7 hex digits of md5, as a long. */
  def h28(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 7), 16, 10).cast("long")

  /** Driver-side twin of [[h28]] — identical md5-prefix arithmetic on a
    * JVM string, for hash values that are PURE FUNCTIONS of constants
    * (e.g. the RHP plane-sign matrix, a (plane, component) table): the
    * caller folds them into a literal once instead of re-hashing per
    * row×plane×component, and the oracle still replays the md5 form.
    */
  def h28Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"$b%02x").mkString.substring(0, 7), 16)
  }

  /** Seeded mix of a base hash (seed as a literal). */
  def mix(p: Column, i: Int): Column = mix(p, lit(i.toLong))

  /** Seeded mix of a base hash (seed as a column, e.g. a lambda var). */
  def mix(p: Column, i: Column): Column =
    (p * (i * 2L + 1L) + i * Salt) % Prime
}
