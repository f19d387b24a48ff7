package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing for sketch/minhash operators.
  *
  * Everything hashes through md5 so the DuckDB oracle can reproduce each
  * operator bit-for-bit:
  *   Spark  `conv(substring(md5(x), 1, 15), 16, 10)::long`
  *   DuckDB `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`
  * 15 hex chars = 60 bits, safely inside a signed 64-bit integer, so both
  * engines agree on every value. The reference hashed by converting utf-8
  * hex to arbitrary-precision ints (Assignment6/task1.py:30-32) — a
  * CPython-only trick; md5-prefix is the portable equivalent.
  *
  * At 100 TB you'd swap `h60` for `xxhash64` (cheaper, same fan-out
  * properties); every operator takes the hash as a plugged Column, so the
  * swap is one line. md5 here buys cross-engine verifiability.
  *
  * The universal hash family h_i(x) = (a_i*x + b_i) mod m mirrors the
  * reference's (Assignment3/task1.py:45-49, Assignment6/task1.py:26-34,
  * Assignment6/task2.py:51) with deterministic seeds instead of
  * random.randint, so runs are reproducible and oracle-checkable.
  * x is first folded to 31 bits so a*x + b stays inside 63 bits.
  */
object Hashing {
  /** 2^31 - 1 (prime). Folding modulus for hash inputs. */
  val M31 = 2147483647L

  /** 60-bit integer from the md5 of a (string) column. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** h60 folded below 2^31 so (a*x + b) can't overflow 63 bits. */
  def h31(c: Column): Column = h60(c) % M31

  /** DuckDB SQL for h60 over expression `e`. */
  def h60Sql(e: String): String =
    s"CAST('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 15) AS BIGINT)"

  /** Driver-side h60 (same md5-prefix value as [[h60]]/[[h60Sql]]) —
    * for fingerprinting bounded summaries on the driver, e.g. the q38
    * golden's edge-set fingerprint. */
  def h60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** DuckDB SQL for h31 over expression `e`. */
  def h31Sql(e: String): String = s"(${h60Sql(e)} % $M31)"

  /** Spark SQL (expr string) for h60 over expression `e` — the native
    * [[graft.plans.Hash60Expr]] kernel (requires a session built with
    * graft.plans.GraftExtensions, as every engine entry point is);
    * bit-identical to the conv(substring(md5)) form, minus the per-hash
    * hex-string round trip. */
  def h60SparkSql(e: String): String =
    s"graft_h60(CAST($e AS STRING))"

  /** Spark SQL (expr string) for h31 over expression `e` — identical
    * value to [[h31Sql]], Spark syntax. */
  def h31SparkSql(e: String): String =
    s"(${h60SparkSql(e)} % $M31)"

  /** Deterministic (a, b) seed pairs for the hash family, from a fixed
    * LCG (numerical-recipes constants). Same literals are embedded in the
    * Spark plan and the oracle SQL. a is forced odd and nonzero. */
  def seeds(n: Int, salt: Long = 12345L): Seq[(Long, Long)] = {
    var s = (salt * 2654435761L + 1013904223L) % M31
    def next(): Long = { s = (s * 1664525L + 1013904223L) % M31; math.abs(s) }
    (0 until n).map { _ =>
      val a = (next() % (M31 - 2)) | 1L
      val b = next() % M31
      (a, b)
    }
  }
}
