package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis: users grouped by first-active day, and for
  * each (cohort, day-offset) cell the count of cohort members active that
  * day — the standard retention triangle.
  *
  * Shape: one min-aggregate for first-seen, one distinct on (user, day)
  * (both map-side combinable, keyed on user), one user-keyed equi-join, and
  * a final (cohort, offset)-keyed count-distinct whose output is bounded by
  * days², not by events. The user-keyed join co-partitions with the
  * first-seen aggregate, so at scale the whole plan is two shuffles over
  * user plus one tiny one.
  */
object Retention {

  /** (cohort_day, day_offset, n_active, cohort_size, retention);
    * `retention` is a raw double ratio for callers to canonicalize.
    */
  def cohortRetention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts"
  ): DataFrame = {
    val day = to_date(col(tsCol))
    val firstSeen = events
      .groupBy(col(userCol))
      .agg(min(day).as("cohort_day"))
    val sizes = firstSeen
      .groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("cohort_size"))
    val active = events.select(col(userCol), day.as("_day")).distinct()
    active
      .join(firstSeen, userCol)
      .groupBy(col("cohort_day"), datediff(col("_day"), col("cohort_day")).as("day_offset"))
      .agg(count_distinct(col(userCol)).as("n_active"))
      .join(sizes, "cohort_day")
      .withColumn(
        "retention",
        col("n_active").cast("double") / col("cohort_size").cast("double")
      )
  }
}
