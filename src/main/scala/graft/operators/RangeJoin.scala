package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: points joined to the intervals containing them —
  * `start <= x <= end`, optionally per key. The second classic operator
  * Spark lacks natively (with the as-of join); a bare inequality join plans
  * as BroadcastNestedLoopJoin / cartesian + filter, O(points x intervals).
  *
  * Bucketized instead: every interval replicates to the fixed-width buckets
  * it overlaps, points land in exactly one bucket, and the join runs on
  * (bucket [, key]) equality with a residual `between` filter. Each
  * (point, interval) match meets in exactly ONE bucket — the point's — so
  * no distinct is needed. Cost scales with interval span / bucketWidth:
  * pick the width near the typical interval length; degenerate giant
  * intervals replicate widely and belong in a broadcast side-channel.
  */
object RangeJoin {

  /** @param points      (x, ...) probe side
    * @param intervals   (start, end, ...) — inclusive bounds
    * @param bucketWidth bucket size in x units (choose ~ typical interval length)
    * @param keyCols     optional equi-key columns present on both sides
    * @return one row per (point, containing interval): points.* ++ intervals.*
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      xCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Double,
      keyCols: Seq[String] = Seq.empty
  ): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")
    val p = points.withColumn("_bucket", bucketOf(col(xCol)))
    val i = intervals
      .withColumn(
        "_bucket",
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol))))
      )
    val joinCols = "_bucket" +: keyCols
    p.join(i, joinCols, "inner")
      .filter(col(xCol) >= col(startCol) && col(xCol) <= col(endCol))
      .drop("_bucket")
  }
}
