package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric parity helpers.
  *
  * Spark's double->decimal cast rounds the double's shortest decimal
  * representation (BigDecimal.valueOf + HALF_UP) while DuckDB multiplies by
  * 10^scale in binary and rounds — on values whose scaled product lands on
  * an exact .5 double the two disagree (observed: 0.88125 at scale 4).
  * Ratio-valued query outputs therefore round explicitly in the double
  * domain — identical arithmetic on both engines — before the decimal cast,
  * which then has nothing left to round.
  *
  * For negatives this is round-half-toward-+inf rather than half-away —
  * consistent across engines, which is what the oracle compare needs.
  */
object Parity {

  def roundHalfUp(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  def duckRound(e: String, scale: Int): String = {
    val p = BigDecimal(math.pow(10, scale)).toBigInt
    s"floor(($e) * $p + 0.5) / $p.0"
  }
}
