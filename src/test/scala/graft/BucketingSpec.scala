package graft

import org.apache.spark.sql.catalyst.TableIdentifier

/** Bucketing co-location evidence: two tables bucketed the same way on the
  * join key must join with NO Exchange in the physical plan — the layout
  * technique that turns the repeated big-fact join at 100 TB from a
  * per-query shuffle into a free co-located merge. This is a regression
  * gate on the engine's recommended materialization for hot join keys
  * (Materialize docs + SURVEY scale notes).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def dropClean(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // default in-memory catalog: a warehouse dir can outlive the entry
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(TableIdentifier(name)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  test("same-bucketed tables sort-merge join with zero exchanges") {
    Seq("bkt_left", "bkt_right").foreach(dropClean)
    (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
      .write.format("parquet").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    (1L to 1000L by 2).map(i => (i, i * 10)).toDF("k", "rv")
      .write.format("parquet").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the merge-join path: broadcasting would hide the co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SortMergeJoin:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 500)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("bkt_left", "bkt_right").foreach(dropClean)
    }
  }
}
