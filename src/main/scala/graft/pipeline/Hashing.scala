package graft.pipeline

/** Shared deterministic hashing arithmetic for the dedup / fingerprint
  * family, expressed as SQL text fragments that are valid in BOTH
  * Spark SQL (via `expr(...)`) and DuckDB (the oracle) — every op is
  * exact int64 arithmetic, so the two engines agree bit-for-bit.
  *
  * Reference behaviors being generalized: the reference engine's only
  * hash-adjacent structure is its dictionary-coordinate key arithmetic
  * (/root/reference/src/reader/coord.rs:80-105); the dedup family here
  * is the training-pipeline extension the rebuild adds on top.
  *
  * Design constraints:
  *   - gram code < 1.2e8 (5 chars * 31^4), so a*code+b stays < 2^63
  *     for a < 2^31.
  *   - all operands kept positive so `%` agrees across engines.
  */
object Hashing {
  /** Mersenne prime 2^31 - 1. */
  val P = 2147483647L

  /** Multiplier for the j-th MinHash permutation (odd, < 2^31). */
  def permA(j: Int): Long = ((j * 2654435761L) % P) | 1L

  /** Offset for the j-th MinHash permutation. */
  def permB(j: Int): Long = (j * 40503L + 17L) % P

  private val pow31 = Seq(923521L, 29791L, 961L, 31L, 1L)

  /** Integer code of the 5-char gram in SQL expression `gram`:
    * polynomial in base 31 over the char codes (exact, < 1.2e8). */
  def gramCode(gram: String): String =
    pow31.zipWithIndex
      .map { case (p, i) => s"CAST(ascii(substring($gram, ${i + 1}, 1)) AS BIGINT) * $p" }
      .mkString("(", " + ", ")")

  /** The j-th permutation hash of an integer-code SQL expression. */
  def permHash(j: Int, code: String): String =
    s"(CAST(${permA(j)} AS BIGINT) * ($code) + ${permB(j)}) % $P"

  /** Spreads an integer code across ~31 bits (for SimHash bits). */
  def mix(code: String): String =
    s"((($code) % $P) * CAST(1103515245 AS BIGINT)) % $P"
}
