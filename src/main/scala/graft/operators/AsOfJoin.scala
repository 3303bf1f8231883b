package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the operator every feature-store /
  * training-data pipeline needs and Spark lacks natively: for each left row,
  * attach the single LATEST right row whose timestamp is at or before the
  * left row's timestamp, per key (no leakage from the future).
  *
  * Implemented by composition (the preferred extension path when semantics
  * allow): tag and union both sides, then one window pass per key ordered by
  * (ts, side) carries the most recent right payload forward into each left
  * row. ONE shuffle on the join key, linear state, no range-condition join
  * (a naive `l.ts >= r.ts` join explodes to all earlier rows per key and
  * re-aggregates — quadratic in history length; the classic as-of mistake at
  * scale). Skew in hot keys is the same profile as any keyed window and
  * salts the same way.
  *
  * Semantics match DuckDB's `ASOF LEFT JOIN` (`l asof left join r on l.k =
  * r.k and l.ts >= r.ts`), which serves as the oracle twin: ties at equal
  * timestamps take the right row (inclusive >=); left rows with no earlier
  * right row get NULLs. The right side must be unique per (key, ts) — the
  * payload rides in a per-row struct, so NULL payload *fields* are carried
  * faithfully (ignoreNulls skips only missing rows, not null fields).
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      history side, unique per (keyCols, rightTs)
    * @param keyCols    equi-join key column names (same names both sides)
    * @param leftTs     event-time column on `left`
    * @param rightTs    event-time column on `right`
    * @param payloadCols right columns to attach (must not collide with left)
    * @return left.* plus payloadCols plus `asof_ts` (the matched right
    *         timestamp; NULL when no right row is at or before `leftTs`)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]
  ): DataFrame = {
    // Internal working names must not capture caller columns (withColumn
    // REPLACES a same-named column, silently corrupting output). Derive
    // deterministic fresh names instead of random ones so repeated calls
    // build sameResult plans (plan caching stays effective).
    val taken = (left.columns ++ right.columns).toSet
    def fresh(base: String): String = {
      var n = base
      var i = 0
      while (taken(n)) { i += 1; n = s"${base}_$i" }
      n
    }
    val tsC = fresh("_ts"); val srcC = fresh("_src")
    val pC = fresh("_p"); val pfC = fresh("_pf")
    // `asof_ts` is part of the OUTPUT contract and rides inside the payload
    // struct — a left column or payload field with that name would collide
    // unrecoverably, so reject it up front rather than corrupt silently.
    require(
      !left.columns.contains("asof_ts") && !payloadCols.contains("asof_ts"),
      "asOf: `asof_ts` is reserved for the output's matched-timestamp column")
    val keys = keyCols.map(col)
    val l = left
      .withColumn(tsC, col(leftTs))
      .withColumn(srcC, lit(1))
    // SQL equi-join semantics: NULL keys never match and a NULL right
    // timestamp satisfies no `l.ts >= r.ts` — drop such right rows so the
    // window formulation can't pair them (partitionBy would group NULL
    // keys together and a NULL ts sorts first, leaking its payload).
    // NULL-key/ts LEFT rows still come through with a NULL payload.
    val r = right
      .filter(col(rightTs).isNotNull && keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys :+ col(rightTs).as(tsC) :+ lit(0).as(srcC) :+
          struct(col(rightTs).as("asof_ts") +: payloadCols.map(col): _*).as(pC): _*
      )
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys: _*)
      .orderBy(col(tsC), col(srcC))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn(pfC, last(col(pC), ignoreNulls = true).over(w))
    val outCols =
      left.columns.map(col) ++
        (col(pfC).getField("asof_ts").as("asof_ts") +:
          payloadCols.map(p => col(pfC).getField(p).as(p)))
    carried.filter(col(srcC) === 1).select(outCols: _*)
  }
}
