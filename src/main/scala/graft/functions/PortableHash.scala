package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content hashes built from md5 hex nibbles with pure integer arithmetic —
  * portable to any SQL engine, so signature-based operators (MinHash,
  * SimHash, RP-LSH) can be verified bit-for-bit by the DuckDB oracle
  * (the same trick as `Samplers.detUniform`; engine-specific `xxhash64`
  * made these rows-only checks in round 1).
  *
  * A nibble is the VALUE of a hex digit (uniform 0..15), not its ascii code
  * (ascii packing would bias every 7-bit group toward the '0'-'9'/'a'-'f'
  * ranges and skew SimHash bit votes).
  */
object PortableHash {

  val P: Long = 1000000007L

  /** Value of the k-th (0-based) md5 hex digit of the column's UTF-8 bytes. */
  private def nib(h: Column, k: Int): Column = {
    val a = ascii(substring(h, k + 1, 1))
    when(a <= 57, a - 48).otherwise(a - 87).cast("long")
  }

  /** 60-bit uniform hash: first 15 md5 nibbles packed little-endian
    * (bit 4k..4k+3 = nibble k). */
  def md5Pack60(c: Column): Column = {
    val h = md5(c.cast("binary"))
    (0 until 15).map(k => nib(h, k) * lit(1L << (4 * k))).reduce(_ + _)
  }

  /** 30-bit-ish universal-hash base point: md5Pack60 mod P. */
  def md5PackMod(c: Column): Column = pmod(md5Pack60(c), lit(P))

  /** i-th universal hash (a_i·x + b_i mod P) over a base point < P.
    * Coefficients are deterministic functions of i, recomputed identically
    * by the oracle generator. */
  def universal(i: Int, x: Column): Column =
    pmod(lit(aCoef(i)) * x + lit(bCoef(i)), lit(P))

  def aCoef(i: Int): Long = {
    val a = Math.floorMod(2654435761L * (i + 1) + 40503L * i.toLong * i + 11L, P)
    if (a == 0L) 1L else a
  }

  def bCoef(i: Int): Long = Math.floorMod(1103515245L * i + 12345L, P)

  /** SQL (DuckDB-dialect but engine-neutral) rendering of [[md5Pack60]] over
    * an expression — used by the oracle generator. */
  def md5Pack60Sql(expr: String): String =
    (0 until 15).map { k =>
      s"(CASE WHEN ascii(substr(md5($expr), ${k + 1}, 1)) <= 57" +
        s" THEN ascii(substr(md5($expr), ${k + 1}, 1)) - 48" +
        s" ELSE ascii(substr(md5($expr), ${k + 1}, 1)) - 87 END) * CAST(${1L << (4 * k)} AS BIGINT)"
    }.mkString("(", " + ", ")")
}
