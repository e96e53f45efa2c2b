package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, conv, lit, md5, substring}

/** Engine-portable hashing for sketch pipelines (MinHash, SimHash).
  *
  * Base hash: the first 15 hex digits (60 bits) of md5 — computable
  * identically in Spark (`conv(substring(md5(b), 1, 15), 16, 10)`), in
  * DuckDB (`('0x' || substr(md5(s), 1, 15))::BIGINT`), and on the JVM
  * (first 8 digest bytes big-endian, shifted right 4 bits). Permutations
  * are affine maps `h_i = (a_i·x + b_i) mod P` over `x = base mod P`,
  * `P = 2^31 - 1`: every intermediate stays below 2^51, so the arithmetic
  * is exact in any engine with 64-bit integers — including ones (DuckDB)
  * that ERROR on signed overflow rather than wrap.
  *
  * This is the auditable counterpart of Spark's xxhash64: one md5 per
  * input feeds any number of permutations (the affine step is two
  * multiply-adds), so signature cost is dominated by the single digest,
  * not the permutation count — the same cost shape as seeded xxhash64
  * chains at 32+ permutations, with the entire pipeline replayable by an
  * external oracle for end-to-end auditing.
  */
object PortableHash {

  /** Modulus for affine permutations: the Mersenne prime 2^31 - 1. */
  val P: Long = (1L << 31) - 1

  /** Multiplier for permutation i — positive, below 10^6 so a·x < 2^51. */
  def permA(i: Int): Long = 999983L - 17L * i

  /** Offset for permutation i. */
  def permB(i: Int): Long = 104729L + 31L * i

  /** 60-bit md5 prefix of a UTF-8 string as a Spark column (uses the
    * codegen'd built-ins md5/substring/conv — no UDF).
    */
  def md5Prefix60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")

  /** `md5Prefix60` over a named string column, reduced mod [[P]]. */
  def xCol(name: String): Column = md5Prefix60(col(name)) % P

  /** Affine permutation i of a base-hash column. */
  def permCol(i: Int, x: Column): Column = (lit(permA(i)) * x + permB(i)) % P

  /** DuckDB expression text for the 60-bit md5 prefix of `expr`. */
  def duckMd5Prefix60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** DuckDB expression text for affine permutation i of `x`. */
  def duckPerm(i: Int, x: String): String =
    s"(${permA(i)} * $x + ${permB(i)}) % $P"

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** JVM twin of [[md5Prefix60]]: the first 15 hex digits of md5 are the
    * first 8 digest bytes (big-endian) with the lowest nibble dropped.
    */
  def md5Prefix60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h >>> 4
  }

  /** JVM twin of [[permCol]] over a reduced base hash. */
  def perm(i: Int, x: Long): Long = (permA(i) * x + permB(i)) % P
}
