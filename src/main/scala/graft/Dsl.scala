package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared column helpers enforcing SURVEY.md §4 determinism rules:
  * money aggregates accumulate in decimal (exact, associative — safe
  * under any partitioning/shuffle order) and surface as double so the
  * result schema matches the DuckDB oracle's.
  */
object Dsl {

  /** Exact sum of a 2-decimal money column: DECIMAL(18,2) accumulate,
    * DOUBLE out. `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Revenue terms must multiply IN decimal, not cast a double
    * product: Spark's double→decimal cast goes through the shortest
    * string repr (BigDecimal.valueOf) while DuckDB rounds the binary
    * expansion, so per-row products can differ at the last decimal.
    * Casting each 2-decimal factor is exact in both engines; decimal
    * multiplication/addition is then exact and associative. */
  private val one = lit(new java.math.BigDecimal("1.00")).cast(DecimalType(3, 2))

  /** SUM(price * (1 - disc)) exactly, rounded to money grain (2
    * decimals) BEFORE the double cast:
    * `CAST(ROUND(SUM(CAST(p AS DECIMAL(12,2)) * (CAST(1.00 AS
    * DECIMAL(3,2)) - CAST(d AS DECIMAL(4,2)))), 2) AS DOUBLE)`.
    *
    * Why the round (sf1 gate finding): the exact sum has scale 4 (6
    * for [[revTaxSum]]), so its integer representation is value·10⁴
    * (10⁶) — past 2^53 (value ≥ 9·10¹¹ resp. 9·10⁹, reached by
    * corpus-level revenue between sf1 and sf30) the decimal→double
    * conversion must round, and Spark (BigDecimal.doubleValue,
    * correctly rounded) and DuckDB (int128→double, then ÷10^scale —
    * TWO roundings) can disagree in the last ulp. Rounding the exact
    * decimal to scale 2 first keeps the integer under 2^53 until
    * total revenue ≥ 9·10¹³ (sf ≈ 30 000), where the conversion is
    * exact on both engines. HALF_UP ≡ DuckDB's half-away-from-zero
    * for every sign, so the rounded decimals are identical too. */
  def revSum(price: Column, disc: Column): Column =
    round(sum(price.cast(DecimalType(12, 2))
        * (one - disc.cast(DecimalType(4, 2)))), 2)
      .cast(DoubleType)

  /** [[revSum]] without the final double cast — keeps the exact
    * decimal so a second aggregation level can re-sum it losslessly
    * (pre-aggregate → CUBE/ROLLUP re-aggregation). */
  def revSumDec(price: Column, disc: Column): Column =
    sum(price.cast(DecimalType(12, 2)) * (one - disc.cast(DecimalType(4, 2))))

  /** SUM(price * (1 - disc) * (1 + tax)) exactly, rounded to money
    * grain before the double cast ([[revSum]]'s scale-cliff note —
    * at scale 6 the conversion cliff is value ≥ 9·10⁹, which sf1
    * corpus revenue already crosses). */
  def revTaxSum(price: Column, disc: Column, tax: Column): Column =
    round(sum(price.cast(DecimalType(12, 2))
        * (one - disc.cast(DecimalType(4, 2)))
        * (one + tax.cast(DecimalType(4, 2)))), 2)
      .cast(DoubleType)

  /** Deterministic mean: exact decimal sum divided by count, in
    * double — never `avg(decimal)` (Spark/DuckDB scale rules differ). */
  def moneyAvg(c: Column): Column =
    moneySum(c) / count(lit(1))

  /** Left-fold dot product of two DOUBLE array columns. Sequential
    * fold = bit-identical to the DuckDB `list_reduce` oracle. Runs as
    * the native codegen'd [[graft.functions.DotFold]] kernel. */
  def dotFold(a: Column, b: Column): Column =
    graft.functions.DotFold(a, b)

  /** HOF reference form of [[dotFold]] (same semantics, interpreted);
    * kept for equivalence testing. */
  def dotFoldHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm via the same sequential fold. */
  def l2Fold(a: Column): Column = sqrt(dotFold(a, a))

  /** Cast a float-array column to double before any arithmetic so both
    * engines do identical IEEE double ops. */
  def asDoubleArray(c: Column): Column = c.cast(ArrayType(DoubleType))
}
