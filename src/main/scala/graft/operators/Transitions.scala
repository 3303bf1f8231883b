package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order event-transition matrix (Markov view of a clickstream): for
  * each ordered pair of consecutive events of a user, the transition count
  * and the row-normalized probability.
  *
  * Shape: one user-keyed window (lag) — the only event-sized shuffle — then
  * a (prev, next)-keyed count whose cardinality is |types|², so the
  * normalizing per-prev window runs on a matrix-sized frame, not on events.
  */
object Transitions {

  /** (prev_type, next_type, n, p); `p` is a raw double for callers to
    * canonicalize. Consecutiveness is by (ts, tieBreak...) within a user.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type",
      tieBreak: Seq[String] = Seq("event_id")
  ): DataFrame = {
    val order = Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol) +: tieBreak.map(col): _*)
    val counts = events
      .select(col(typeCol).as("next_type"), lag(col(typeCol), 1).over(order).as("prev_type"))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    counts.withColumn(
      "p",
      col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev_type"))).cast("double")
    )
  }
}
