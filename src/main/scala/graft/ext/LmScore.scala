package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bigram-LM quality scoring constants — the KenLM-shaped "how
  * predictable is this document under a corpus n-gram model" signal
  * that production curation stacks run next to the rule-based
  * heuristics (q_quality_score).
  *
  * The score is a true average bigram NEGATIVE LOG2-probability
  * (perplexity's log domain), but `ln()`/`log2()` never cross the
  * oracle boundary — libm and the JVM can differ in the last ulp,
  * which a bit-exact compare cannot tolerate. Instead both engines
  * compute the same INTEGER pipeline:
  *
  *   p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)      Laplace smoothing
  *   pfx      = max(1, (c12+1)·10⁹ div (c1+V))    fixed-point p
  *   e        = bit-length(pfx)                    via bin/conv string
  *   m        = (pfx·512) div 2^(e−1) ∈ [512,1023] top-10-bit mantissa
  *   −log2(p)·2²⁰ ≈ L9Fx − (e−1)·2²⁰ − T[m−512]
  *
  * where T is a 512-entry scaled-log lookup (T[i] =
  * ⌊2²⁰·log2((512+i)/512)⌋) and L9Fx = ⌊2²⁰·log2(10⁹)⌋. The table and
  * constant are computed ONCE here (StrictMath — platform-pinned) and
  * embedded as literals in BOTH the Column expression and the DuckDB
  * SQL, so the engines agree bit-for-bit by construction; worst-case
  * quantization error is log2(513/512) ≈ 0.0028 bits < 2⁻⁸, far inside
  * any curation threshold (LmScoreSpec sweeps the probability range).
  *
  * Scale shape: the per-doc work is one explode + two key joins
  * (bigram counts, unigram counts) whose build sides are gated
  * broadcasts — at sandbox scale they broadcast, at 100 TB (where
  * distinct n-grams outgrow memory) they degrade to shuffle joins on
  * the n-gram key, which is the standard distributed LM-counts join.
  */
object LmScore {
  /** Fixed-point scale of the probability (10⁹) and of the log (2²⁰). */
  val PScale  = 1000000000L
  val LogScale = 1048576L

  /** Mantissa scale: m = (pfx·MScale) div 2^(e−1) ∈ [MScale, 2·MScale). */
  val MScale = 512L

  /** ⌊2²⁰ · log2(10⁹)⌋. */
  val L9Fx: Long =
    math.floor(LogScale.toDouble *
      (StrictMath.log(PScale.toDouble) / StrictMath.log(2.0))).toLong

  /** T[i] = ⌊2²⁰ · log2((MScale+i)/MScale)⌋ for i ∈ [0, MScale). */
  val Log2Table: Seq[Long] = Seq.tabulate(MScale.toInt) { i =>
    math.floor(LogScale.toDouble *
      (StrictMath.log((MScale + i).toDouble / MScale.toDouble) /
        StrictMath.log(2.0))).toLong
  }

  /** The table as a DuckDB list literal (1-based indexing at call
    * sites: `[...][m - (MScale-1)]`). */
  def log2TableSql: String = Log2Table.mkString("[", ", ", "]")

  /** ⌊2²⁰·log2(n)⌋ of a POSITIVE integer column — the q_lm_score
    * decomposition without the probability division: e =
    * bit-length(n), m = (n·512) >> (e−1) ∈ [512, 1023], result =
    * (e−1)·2²⁰ + T[m−512]. Same table, same quantization error bound
    * (< 2⁻⁸ bits). The mantissa shift uses shiftright with a COLUMN
    * bit count (call_function — the functions.shiftright overload
    * only takes literal bits). */
  def log2FxCol(n: Column): Column = {
    val e = length(conv(n, 10, 2)).cast("long")
    val m = call_function("shiftright", n * lit(MScale),
      (e - lit(1L)).cast("int"))
    (e - lit(1L)) * lit(LogScale) +
      element_at(typedLit(Log2Table), (m - lit(MScale - 1)).cast("int"))
  }

  /** Driver-side scalar twin of [[log2FxCol]] — same bit-length +
    * mantissa-table pipeline in pure Long arithmetic, for the
    * bounded scalar constants (corpus totals) an importance-weight
    * formula folds into every row. Bit-for-bit equal to the Column
    * and SQL forms by construction (identical integer ops). */
  def log2FxLong(n: Long): Long = {
    require(n > 0, s"log2FxLong needs a positive input, got $n")
    val e = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val m = (n * MScale) >> (e - 1)
    (e - 1) * LogScale + Log2Table((m - MScale).toInt)
  }

  /** SQL twin of [[log2FxCol]] over a positive-integer expression.
    * Embeds the table literal per call (a few KB — the existing
    * oracles already embed it repeatedly). */
  def log2FxSql(c: String): String =
    s"((length(bin($c)) - 1) * $LogScale + " +
      s"$log2TableSql[CAST((($c) * $MScale) // " +
      s"(CAST(1 AS BIGINT) << (length(bin($c)) - 1)) AS INTEGER)" +
      s" - ${MScale - 1}])"
}
