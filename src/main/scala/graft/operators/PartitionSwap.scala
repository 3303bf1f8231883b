package graft.operators

import org.apache.spark.sql.SparkSession

/** Crash-safe commit protocol for incremental partition-tree stores —
  * the retire/promote rename swap shared by [[EventStatsStore]] (day
  * partitions) and [[AggStore]] (bucket partitions).
  *
  * Dynamic partition overwrite is NOT crash-safe for multi-directory
  * commits: Spark replaces the touched partition directories
  * non-atomically at job commit, and a crash mid-commit leaves some
  * partitions merged and some not while the replayed batch re-adds
  * itself to the already-rewritten ones. This protocol makes the commit
  * all-or-nothing from the replayer's point of view:
  *
  *   1. a pending marker (carrying the batch id) lands first;
  *   2. the touched live partition directories RETIRE (rename into
  *      `<dir>.retired`) — nothing is destroyed;
  *   3. the staged partition directories promote into place;
  *   4. the applied batch marker lands — the point of no return: a
  *      replay of this id is a no-op from here on;
  *   5. retired + stage + pending clean up.
  *
  * [[recover]] classifies any crash by the two markers: pending without
  * applied rolls BACK (every retired directory replaces its possibly-
  * promoted live counterpart, restoring the exact pre-merge store — the
  * replayed batch then re-merges from consistent state, never
  * double-adding); pending with applied rolls the lost cleanup FORWARD.
  * One FS `exists` per call on the healthy path.
  *
  * Directory renames are atomic on HDFS-semantics filesystems; on
  * rename-as-copy object stores, front these stores with a consistent
  * layer.
  */
object PartitionSwap {

  private def pendingMarker(dir: String) = s"$dir/_batches/_pending"
  private def appliedMarker(dir: String, batchId: Long) = s"$dir/_batches/$batchId"
  private def retiredDir(dir: String) = dir.stripSuffix("/") + ".retired"

  /** True when `batchId` already committed (check before re-deriving a
    * batch on replay).
    */
  def alreadyApplied(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val p = new org.apache.hadoop.fs.Path(appliedMarker(dir, batchId))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Mark a batch applied WITHOUT a swap (bootstrap writes, no-op
    * batches).
    */
  def markApplied(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(appliedMarker(dir, batchId))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true).close()
  }

  /** Swap the staged partition directories into the live tree (steps
    * 1-5 above). `stage` must hold one `<name>` directory per entry of
    * `partitions` (e.g. `day=2024-01-01`, `bucket=3`).
    */
  def commit(
      spark: SparkSession,
      dir: String,
      stage: String,
      partitions: Seq[String],
      batchId: Long
  ): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val retired = new org.apache.hadoop.fs.Path(retiredDir(dir))
    fs.delete(retired, true)
    fs.mkdirs(retired)
    val pend = fs.create(new org.apache.hadoop.fs.Path(pendingMarker(dir)), true)
    pend.write(batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    pend.close()
    partitions.foreach { p =>
      val live = new org.apache.hadoop.fs.Path(s"$dir/$p")
      if (fs.exists(live)) fs.rename(live, new org.apache.hadoop.fs.Path(retired, p))
    }
    partitions.foreach { p =>
      fs.rename(new org.apache.hadoop.fs.Path(s"$stage/$p"),
        new org.apache.hadoop.fs.Path(s"$dir/$p"))
    }
    markApplied(spark, dir, batchId)
    fs.delete(retired, true)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    fs.delete(new org.apache.hadoop.fs.Path(pendingMarker(dir)), false)
  }

  /** Crash recovery — see class doc. `partitionPrefix` names the
    * partition-directory scheme (`day=`, `bucket=`) so rollback only
    * touches partition directories.
    */
  def recover(
      spark: SparkSession,
      dir: String,
      stageSuffix: String,
      partitionPrefix: String
  ): Unit = {
    val pending = new org.apache.hadoop.fs.Path(pendingMarker(dir))
    val fs = pending.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(pending)) return
    val batchId = {
      val in = fs.open(pending)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      } finally in.close()
    }
    val retired = new org.apache.hadoop.fs.Path(retiredDir(dir))
    if (!fs.exists(new org.apache.hadoop.fs.Path(appliedMarker(dir, batchId)))) {
      // roll back: every retired partition replaces its (possibly
      // promoted) live counterpart — retired still holds the full
      // pre-merge content because cleanup only runs after the applied
      // marker lands
      if (fs.exists(retired)) {
        fs.listStatus(retired).foreach { st =>
          if (st.getPath.getName.startsWith(partitionPrefix)) {
            val live = new org.apache.hadoop.fs.Path(dir, st.getPath.getName)
            fs.delete(live, true)
            fs.rename(st.getPath, live)
          }
        }
      }
    }
    fs.delete(retired, true)
    fs.delete(new org.apache.hadoop.fs.Path(dir.stripSuffix("/") + stageSuffix), true)
    fs.delete(pending, false)
  }
}
