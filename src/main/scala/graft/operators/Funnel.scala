package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion analysis over an event stream: for each user
  * who entered the funnel (did step 0), the earliest greedy completion time
  * of every subsequent step, where step i must occur strictly AFTER the
  * user's step i-1 time.
  *
  * Shape: step i is one conditional-min aggregation over ONLY the step-i
  * event slice, joined to the accumulated funnel frame — k-1 keyed
  * equi-joins plus k map-side-combinable min aggregates. The alternative
  * single-shuffle formulation (collect_list per user + a fold) holds every
  * event of a user in one aggregation buffer, which a power user breaks at
  * 100 TB; here per-user state is one row of k timestamps, and each shuffle
  * carries only the filtered step slice (the type filter pushes down to the
  * scan).
  *
  * Greedy semantics (min event after the previous step's min) match the
  * classic funnel definition; times are epoch millis so the comparison is
  * engine-exact.
  */
object Funnel {

  /** (user, t_<step0>, ..., t_<stepk-1>, steps_completed); t columns are
    * nullable epoch-millis bigints, null = step not reached in order.
    */
  def conversions(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val tCols = steps.map(s => s"t_$s")
    val ms = unix_millis(col(tsCol))
    var acc = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(ms).as(tCols.head))
    for (i <- 1 until steps.size) {
      val slice = events
        .filter(col(typeCol) === steps(i))
        .select(col(userCol), ms.as("_ms"))
      acc = acc
        .join(slice, Seq(userCol), "left")
        .groupBy(col(userCol) +: tCols.take(i).map(col): _*)
        .agg(min(when(col("_ms") > col(tCols(i - 1)), col("_ms"))).as(tCols(i)))
    }
    acc.withColumn(
      "steps_completed",
      tCols.map(t => when(col(t).isNotNull, 1).otherwise(0)).reduce(_ + _)
    )
  }

  /** The classic funnel report: users entering each step, and the
    * conversion rate from the previous step (exact counts; the rate is a
    * raw double for callers to canonicalize).
    */
  def report(
      events: DataFrame,
      steps: Seq[String],
      userCol: String = "user_id",
      tsCol: String = "ts",
      typeCol: String = "event_type"
  ): DataFrame = {
    val conv = conversions(events, steps, userCol, tsCol, typeCol)
    val counts = conv.select(
      steps.zipWithIndex.map { case (s, i) =>
        count(col(s"t_$s")).as(s"n_$i")
      }: _*
    )
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(
        lit(i).as("step"),
        lit(s).as("event_type"),
        col(s"n_$i").as("n_users"),
        (if (i == 0) lit(1.0)
         else
           when(col(s"n_${i - 1}") > 0,
             col(s"n_$i").cast("double") / col(s"n_${i - 1}").cast("double"))
             .otherwise(lit(0.0))).as("conversion")
      )
    }
    counts
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.step"), col("r.event_type"), col("r.n_users"), col("r.conversion"))
  }
}
