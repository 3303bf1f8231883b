package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate — the generic
  * summary-table member of the persistence family (hourly counts:
  * [[EventStatsStore]]; sketches: [[graft.sketch.ProfileStore]]; SCD-2
  * records: [[graft.pipeline.Snapshot]]; serving indexes: BM25/IVF/
  * band/exact). A 100 TB fact table's dashboard aggregate must not
  * rescan history per refresh: this store keeps one row per group with
  * the ALGEBRAIC state (cnt, sum, min, max — avg serves as sum/cnt),
  * and each batch folds in by combining same-group states:
  *
  *   cnt += cnt_b;  sum += sum_b;  min = least(min, min_b);
  *   max = greatest(max, max_b)
  *
  * Every operation is associative and commutative, so the maintained
  * store is VALUE-IDENTICAL to a one-shot groupBy over the concatenated
  * history — the q_agg_store oracle, and the same lossless-merge
  * contract the sketch profile holds approximately, held exactly here.
  * (Non-algebraic aggregates — medians, distincts — belong to the
  * sketch store, which is why both exist.)
  *
  * Layout: parquet partitioned by `bucket` = [[StableHash.bucket]] of
  * the group key, so a batch touches only the buckets its groups hash
  * into — the [[graft.pipeline.Snapshot]] bucketed-store shape — and
  * the merge rewrites just those directories under the [[PartitionSwap]]
  * crash protocol. Count/sum merges are NOT idempotent, so batch-id
  * markers make replays no-ops (the foreachBatch exactly-once recipe).
  *
  * At scale: the store is |groups| rows; a batch merge reads its
  * touched buckets (|groups|-bounded), aggregates the batch with
  * map-side combine, and shuffles only group-sized frames.
  */
object AggStore {

  private def stageDir(dir: String) = dir.stripSuffix("/") + ".merge-stage"

  /** Batch-local algebraic state: one row per group. `valueCol` must be
    * an exact-arithmetic type for bit-identity with a one-shot rebuild
    * (integers/longs/decimals; double sums are order-sensitive).
    */
  def aggregate(df: DataFrame, groupCols: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(valueCol).as("cnt"),
        sum(valueCol).as("sum"),
        min(valueCol).as("min"),
        max(valueCol).as("max"))

  private def withBucket(states: DataFrame, groupCols: Seq[String], buckets: Int) =
    states.withColumn("bucket",
      StableHash.bucket(concat_ws("", groupCols.map(col): _*), buckets))


  /** Pin the stored state schema. Spark widens decimal sums per
    * aggregation (decimal(18,2) -> 28,2 at the batch aggregate -> 38,2
    * at the first merge), so without a canonical type the touched
    * buckets would drift to a different parquet decimal width than the
    * untouched ones and the store becomes unreadable as one tree
    * (AggStoreSpec's crash test caught this as a
    * PARQUET_COLUMN_DATA_TYPE_MISMATCH). Decimal sums therefore always
    * store at precision 38 with the input's scale; counts at long;
    * min/max keep their stable input types.
    */
  private def canonical(states: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val pinned = states.schema("sum").dataType match {
      case d: DecimalType =>
        states.withColumn("sum", col("sum").cast(DecimalType(38, d.scale)))
      case _ => states
    }
    pinned.withColumn("cnt", col("cnt").cast("long"))
  }

  /** Bootstrap the store from a batch's states ([[aggregate]]). */
  def write(
      states: DataFrame,
      groupCols: Seq[String],
      dir: String,
      buckets: Int
  ): Unit = {
    require(buckets > 0, s"agg store: buckets must be positive, got $buckets")
    require(!states.columns.contains("bucket"),
      "agg store: input must not already have a bucket column")
    withBucket(canonical(states), groupCols, buckets)
      .repartition(buckets, col("bucket"))
      .sortWithinPartitions(col("bucket") +: groupCols.map(col): _*)
      .write.mode("overwrite")
      .partitionBy("bucket").parquet(dir)
  }

  def load(spark: SparkSession, dir: String): DataFrame = {
    PartitionSwap.recover(spark, dir, ".merge-stage", "bucket=")
    spark.read.parquet(dir)
  }

  /** Merge one batch of group states: same-group rows combine
    * algebraically; only the touched buckets are read and rewritten
    * ([[PartitionSwap]] commit). Replays of an applied `batchId` are
    * no-ops.
    */
  def merge(
      spark: SparkSession,
      dir: String,
      batchStates: DataFrame,
      groupCols: Seq[String],
      buckets: Int,
      batchId: Long
  ): Unit = {
    require(buckets > 0, s"agg store: buckets must be positive, got $buckets")
    require(!batchStates.columns.contains("bucket"),
      "agg store: batch must not already have a bucket column")
    PartitionSwap.recover(spark, dir, ".merge-stage", "bucket=")
    if (PartitionSwap.alreadyApplied(spark, dir, batchId)) return

    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // bootstrap keys on DATA presence, not directory existence: an empty
    // first batch leaves only markers behind (a partitionBy write of zero
    // rows emits NO files, and loading it would die on schema inference),
    // so the first NON-empty batch must still take the bootstrap path
    val hasData = fs.exists(dirPath) &&
      fs.listStatus(dirPath).exists(_.getPath.getName.startsWith("bucket="))
    if (!hasData) {
      if (batchStates.isEmpty) {
        PartitionSwap.markApplied(spark, dir, batchId)
        return
      }
      // bootstrap THROUGH the stage + commit protocol, not a direct
      // overwrite of the live tree: a crash mid-bootstrap would leave a
      // partial set of live bucket= directories, hasData would read true
      // on replay, and the replayed batch would MERGE into its own
      // partial data. Staged, a crash before the pending marker leaves
      // the live tree empty (replay re-bootstraps); after it, recover's
      // entry-list rollback deletes the newly-promoted buckets.
      val stage = stageDir(dir)
      write(batchStates, groupCols, stage, buckets)
      PartitionSwap.commit(spark, dir, stage,
        PartitionSwap.listEntries(spark, stage, "bucket="), batchId)
      return
    }

    val batch = withBucket(canonical(batchStates), groupCols, buckets)
    val touched = batch.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.nonEmpty) {
      val slice = spark.read.parquet(dir)
        .filter(col("bucket").isin(touched.toSeq: _*))
      val merged = canonical(
        slice
          .unionByName(batch)
          .groupBy((groupCols :+ "bucket").map(col): _*)
          .agg(
            sum(col("cnt")).as("cnt"),
            sum(col("sum")).as("sum"),
            min(col("min")).as("min"),
            max(col("max")).as("max")))
      val stage = stageDir(dir)
      merged
        .repartition(touched.length, col("bucket"))
        .sortWithinPartitions(col("bucket") +: groupCols.map(col): _*)
        .write.mode("overwrite")
        .partitionBy("bucket").parquet(stage)
      PartitionSwap.commit(spark, dir, stage,
        touched.toSeq.map(b => s"bucket=$b"), batchId)
    } else {
      PartitionSwap.markApplied(spark, dir, batchId)
    }
  }

  /** Serve the aggregate: per group (cnt, sum, min, max, avg) — avg
    * derived at read so the stored state stays purely mergeable.
    */
  def serve(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir)
      .drop("bucket")
      .withColumn("avg", col("sum") / col("cnt"))
}
