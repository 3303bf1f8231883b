package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense 0-based GLOBAL row numbering by a total order — the distributed
  * zipWithIndex. Training pipelines need it constantly (stable contiguous
  * ids for shard-relative addressing, embedding-matrix row lookup,
  * sample-index bookkeeping), and the naive Spark spelling —
  * `row_number().over(Window.orderBy(...))` — moves the ENTIRE corpus to
  * one task.
  *
  * Scale shape (the classic two-phase rank): range-repartition by the
  * order key so partition-major order equals global order, count rows per
  * partition (ONE bounded job: |partitions| rows to the driver), turn the
  * counts into cumulative offsets broadcast back, and add a per-partition
  * `row_number` window — each task sorts only its own range slice.
  *
  * `monotonically_increasing_id` is NOT this: its ids are sparse,
  * partition-biased and not rank-ordered. And unlike it, the result here
  * is DETERMINISTIC: `orderCols` must be a total order (make it unique —
  * append the id column as a tie-break), so the assigned id is the global
  * rank regardless of where Spark's range sampler happens to place
  * partition boundaries.
  */
object GlobalIds {

  /** Input plus `outCol` = dense 0-based global rank by `orderCols`.
    *
    * @param orderCols total order; MUST be duplicate-free across rows
    *                  (ties straddling a partition boundary would make the
    *                  numbering nondeterministic — append a unique id)
    */
  def denseGlobalId(
      df: DataFrame,
      orderCols: Seq[Column],
      outCol: String = "global_id"
  ): DataFrame = {
    require(orderCols.nonEmpty, "globalIds: need at least one order column")
    require(!df.columns.contains(outCol), s"globalIds: column $outCol already exists")
    val reserved = Seq("_pid", "_offset")
    require(!reserved.exists(df.columns.contains),
      s"globalIds: input must not already have ${reserved.mkString("/")} columns")
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df
      .repartitionByRange(orderCols: _*)
      .withColumn("_pid", spark_partition_id())
    // ONE bounded job: per-partition counts (|partitions| rows). The ranged
    // frame is pinned so the counted partitioning IS the one the final
    // numbering pass reads — without this, the range sampler could draw
    // different boundaries on the second pass and mis-align the offsets.
    // cacheOnce (the connectedComponents convention): the pin backs the
    // RETURNED frame and stays resident until LRU eviction or a caller
    // unpersist; disk-backed so a big input spills instead of thrashing
    // executor memory. At true corpus scale, persist the NUMBERED output
    // once and drop this upstream pin.
    if (ranged.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      ranged.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = ranged
      .groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val offsets = (0 to maxPid)
      .scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L))
      .zipWithIndex
      .map { case (off, p) => (p, off) }
      .take(maxPid + 1)
    val offsetsDf = offsets.toDF("_pid", "_offset")
    val w = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
    ranged
      .join(broadcast(offsetsDf), "_pid")
      .withColumn(outCol, row_number().over(w) - 1 + col("_offset"))
      .drop("_pid", "_offset")
  }
}
