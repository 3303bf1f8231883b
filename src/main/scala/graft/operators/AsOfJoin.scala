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
    val keys = keyCols.map(col)
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_src", lit(1))
    // SQL equi-join semantics: NULL keys never match and a NULL right
    // timestamp satisfies no `l.ts >= r.ts` — drop such right rows so the
    // window formulation can't pair them (partitionBy would group NULL
    // keys together and a NULL ts sorts first, leaking its payload).
    // NULL-key/ts LEFT rows still come through with a NULL payload.
    val r = right
      .filter(col(rightTs).isNotNull && keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys :+ col(rightTs).as("_ts") :+ lit(0).as("_src") :+
          struct(col(rightTs).as("asof_ts") +: payloadCols.map(col): _*).as("_p"): _*
      )
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys: _*)
      .orderBy(col("_ts"), col("_src"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("_pf", last(col("_p"), ignoreNulls = true).over(w))
    val outCols =
      left.columns.map(col) ++
        (col("_pf").getField("asof_ts").as("asof_ts") +:
          payloadCols.map(p => col("_pf").getField(p).as(p)))
    carried.filter(col("_src") === 1).select(outCols: _*)
  }
}
