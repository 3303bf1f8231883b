package graft.operators

import org.apache.spark.sql.SparkSession

/** Retention-policy expiry for day-partitioned stores: drop WHOLE
  * partition directories older than the cutoff. At 100 TB a retention
  * policy must be a metadata operation — deleting `day=...` directories
  * costs O(expired days) filesystem calls and zero data rewrites, where
  * a filter-and-rewrite "delete" would re-shuffle the entire store to
  * age out its oldest slice. Complements [[graft.pipeline.Snapshot
  * .eraseKeys]] (per-subject deletion) with the per-AGE deletion GDPR
  * storage-limitation clauses ask for; applies to any `col=value`
  * hive-layout tree ([[EventStatsStore]], the streaming date sink).
  */
object Ttl {

  /** Delete partitions with `partitionCol < cutoff` (string compare —
    * chronological for ISO `yyyy-MM-dd` values). Returns the expired
    * partition values, sorted.
    */
  def expireDayPartitions(
      spark: SparkSession,
      dir: String,
      partitionCol: String,
      cutoff: String
  ): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val prefix = s"$partitionCol="
    val expired = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(st => st.getPath.getName.stripPrefix(prefix))
      .filter(_ < cutoff)
      .sorted
    expired.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$prefix$v"), true)
    }
    expired.toSeq
  }
}
