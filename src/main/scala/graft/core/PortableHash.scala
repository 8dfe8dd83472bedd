package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-neutral arithmetic string hash.
  *
  * Spark's `hash()`/`xxhash64`/`crc32` have no DuckDB counterparts with
  * equal output (SURVEY.md §7.4), so every hash-shaped extension op
  * (minhash bands, simhash bits, fingerprints) uses this family: plain
  * integer arithmetic over `ascii`/`substr`/`length`, which both
  * engines evaluate identically. It is NOT cryptographic — it only
  * needs to spread a small shingle/token space uniformly enough for
  * LSH banding, and to be reproducible bit-for-bit in ANSI SQL.
  *
  * For production-scale runs where oracle parity is not needed,
  * substitute `xxhash64` — the surrounding operators take the hash as
  * a Column, so the swap is one argument.
  *
  * Definition (t = rpad(s,5,'#'), a 5-char window — note rpad
  * TRUNCATES longer strings in both engines, so the head terms only
  * see chars 1,2,4; the tail terms read the original string's last
  * two chars, with `greatest(…,1)` guarding position 0, whose
  * semantics differ across engines):
  *
  *   h(s) = ( ascii(t[1])·8191 + ascii(t[2])·127 + ascii(t[4])·31
  *          + ascii(s[len−1])·7 + ascii(s[len])·3
  *          + length(s)·5381 ) mod 1000003
  *
  * Three bit-identical implementations exist: this composed Column
  * form, the [[hSql]] DuckDB twin, and the codegen'd native
  * [[graft.expr.PortableHashExpr]] (ExprSpec asserts equality).
  */
object PortableHash {
  val M = 1000003 // prime modulus

  /** Accumulation is 64-bit on purpose: `length·5381` alone passes
    * 2^31 at ~400 K chars, and Int wrap-around is NOT mirrored by
    * DuckDB (which promotes or errors instead of wrapping). The final
    * value is `% M` so it always fits back in an INT — the cast keeps
    * downstream schemas unchanged. */
  def h(s: Column): Column = {
    val t = rpad(s, 5, "#")
    val len = length(s)
    ((ascii(substring(t, 1, 1)).cast("long") * lit(8191L)
      + ascii(substring(t, 2, 1)).cast("long") * lit(127L)
      + ascii(substring(t, 4, 1)).cast("long") * lit(31L)
      + ascii(s.substr(greatest(len - lit(1), lit(1)), lit(1))).cast("long") * lit(7L)
      + ascii(s.substr(greatest(len, lit(1)), lit(1))).cast("long") * lit(3L)
      + len.cast("long") * lit(5381L)) % lit(M.toLong)).cast("int")
  }

  /** SQL twin of [[h]] (DuckDB). BIGINT casts match the Column form's
    * 64-bit accumulation (DuckDB would otherwise raise on INT overflow
    * for multi-hundred-KB strings rather than wrap). */
  def hSql(expr: String): String = {
    val t = s"rpad($expr, 5, '#')"
    s"((CAST(ascii(substr($t,1,1)) AS BIGINT)*8191" +
      s" + CAST(ascii(substr($t,2,1)) AS BIGINT)*127" +
      s" + CAST(ascii(substr($t,4,1)) AS BIGINT)*31" +
      s" + CAST(ascii(substr($expr, greatest(length($expr)-1, 1), 1)) AS BIGINT)*7" +
      s" + CAST(ascii(substr($expr, greatest(length($expr), 1), 1)) AS BIGINT)*3" +
      s" + CAST(length($expr) AS BIGINT)*5381) % $M)"
  }

  /** Full-range spread for range-gated uses (sampling cuts): raw h is
    * uniform enough for equality joins but clusters in a narrow band
    * for short keys (it is a positional-weighted sum), so `h < p·M`
    * gates select wildly wrong fractions. Multiplying by a
    * Lehmer-style constant mod the prime M is a bijection on [0, M)
    * that spreads any dense cluster across the whole ring. BIGINT
    * casts matter: h·48271 overflows 32-bit in both engines. */
  def spread(h: Column): Column =
    (h.cast("long") * lit(48271L)) % lit(M.toLong)

  def spreadSql(hExpr: String): String =
    s"((CAST($hExpr AS BIGINT) * 48271) % $M)"

  /** Per-band minhash transform: an affine re-hash of h per band b,
    * so each band draws an (approximately) independent permutation. */
  def bandHash(h: Column, band: Int): Column =
    (h * lit(2 * band + 3) + lit(band * 97)) % lit(M)

  def bandHashSql(hExpr: String, band: Int): String =
    s"(($hExpr)*${2 * band + 3} + ${band * 97}) % $M"
}
