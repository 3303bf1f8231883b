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
  * Scale shape (two-phase rank over EXPLICIT boundaries): sample the order
  * key once (one bounded job), derive range-partition boundaries from the
  * sample on the driver, and assign each row its partition with a pure
  * log2(P)-deep comparison tree — a deterministic expression of the row,
  * so the per-partition count pass and the numbering pass agree WITHOUT
  * pinning a corpus-sized frame in the cache (the round-4 design
  * persisted the range-partitioned input at MEMORY_AND_DISK to freeze
  * Spark's nondeterministic range sampler; explicit boundaries make that
  * full-corpus materialization unnecessary). Counts become cumulative
  * offsets broadcast back, and a per-partition `row_number` window numbers
  * each slice.
  *
  * The assigned id is the global rank REGARDLESS of where the boundaries
  * fall — boundaries only balance work — so the result is deterministic
  * and engine-replayable even though the boundary sample is hash-chosen.
  *
  * `monotonically_increasing_id` is NOT this: its ids are sparse,
  * partition-biased and not rank-ordered.
  */
object GlobalIds {

  /** Input plus `outCol` = dense 0-based global rank by `orderCols`.
    *
    * @param orderCols      total order, ASCENDING columns only; MUST be
    *                       duplicate-free across rows (ties straddling a
    *                       partition boundary would make the numbering
    *                       nondeterministic — append a unique id)
    * @param numPartitions  target range partitions (0 = the session's
    *                       `spark.sql.shuffle.partitions`)
    * @param sampleFraction UPPER bound on the boundary-sample rate. The
    *                       effective rate is `min(sampleFraction,
    *                       ~200*P/n)` — a cheap count pass sizes the
    *                       sample so the driver collects ~200 keys per
    *                       target partition REGARDLESS of corpus size
    *                       (an uncapped 1% of 10^11 rows would OOM the
    *                       driver). Tiny inputs may sample nothing and
    *                       degrade to one partition (correct, unbalanced)
    */
  def denseGlobalId(
      df: DataFrame,
      orderCols: Seq[Column],
      outCol: String = "global_id",
      numPartitions: Int = 0,
      sampleFraction: Double = 0.01
  ): DataFrame = {
    require(orderCols.nonEmpty, "globalIds: need at least one order column")
    require(!df.columns.contains(outCol), s"globalIds: column $outCol already exists")
    val reserved = Seq("_pid", "_offset")
    require(!reserved.exists(df.columns.contains),
      s"globalIds: input must not already have ${reserved.mkString("/")} columns")
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"globalIds: sampleFraction must be in (0, 1], got $sampleFraction")
    val spark = df.sparkSession
    import spark.implicits._
    val p = math.max(1,
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // bounded job 1: row count (one long to the driver) sizes the sample
    val n = df.count()
    // bounded job 2: deterministic hash sample of the order key (xxhash64
    // is fixed-seed, so reruns draw the SAME boundaries). The rate is
    // capped so ~target keys reach the driver no matter how big n is;
    // boundaries only balance work, so a coarser sample never affects the
    // assigned ids. Keys with any null component are excluded as boundary
    // candidates — nulls sort first and land in partition 0 regardless.
    val target = math.min(1000000L, math.max(p * 200L, 10000L))
    val mod = 1000000000L
    val capRate = if (n == 0) 1.0 else target.toDouble / n
    val thresh = math.max(1L,
      math.round(math.min(sampleFraction, capRate) * mod))
    val sampled = df
      .select(orderCols: _*)
      .filter(pmod(xxhash64(orderCols: _*), lit(mod)) < lit(thresh))
      .collect()
      .map(_.toSeq)
      .filterNot(_.contains(null))
    val boundaries = pickBoundaries(sampled, p)
    val withPid = df.withColumn("_pid", pidTree(orderCols, boundaries, 0, boundaries.length))
    // bounded job 2: per-partition counts (≤ numPartitions rows). No cache
    // pin: _pid is a pure function of the row's key, so the counted
    // assignment and the numbering pass agree by construction.
    val counts = withPid
      .groupBy(col("_pid"))
      .agg(count(lit(1)).as("_n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val offsets = (0 to maxPid)
      .scanLeft(0L)((acc, pid) => acc + counts.getOrElse(pid, 0L))
      .zipWithIndex
      .map { case (off, pid) => (pid, off) }
      .take(maxPid + 1)
    val offsetsDf = offsets.toDF("_pid", "_offset")
    val w = Window.partitionBy(col("_pid")).orderBy(orderCols: _*)
    withPid
      .join(broadcast(offsetsDf), "_pid")
      .withColumn(outCol, row_number().over(w) - 1 + col("_offset"))
      .drop("_pid", "_offset")
  }

  /** Driver-side ordering matching Spark's ascending nulls-first field
    * ordering, for sorting the boundary sample.
    *
    * Strings MUST compare in UTF-8 BYTE order (what the engine's
    * `UTF8String.binaryCompare` does for `c > lit(v)`), not Java's
    * UTF-16 code-unit order: the two disagree for supplementary-plane
    * characters vs BMP chars in [U+E000, U+FFFF], and a boundary list
    * mis-sorted w.r.t. the engine's comparator breaks pidTree's binary
    * search — ids would silently stop being the global rank.
    */
  private val anyOrd: Ordering[Any] = new Ordering[Any] {
    def compare(a: Any, b: Any): Int = (a, b) match {
      case (null, null) => 0
      case (null, _)    => -1
      case (_, null)    => 1
      case (x: String, y: String) =>
        java.util.Arrays.compareUnsigned(
          x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case (x, y)       => x.asInstanceOf[Comparable[Any]].compareTo(y)
    }
  }
  private val keyOrd: Ordering[Seq[Any]] = (a: Seq[Any], b: Seq[Any]) =>
    a.zip(b).iterator.map(t => anyOrd.compare(t._1, t._2)).find(_ != 0).getOrElse(0)

  /** ≤ p-1 evenly spaced distinct boundary keys from the sorted sample. */
  private[graft] def pickBoundaries(sample: Array[Seq[Any]], p: Int): IndexedSeq[Seq[Any]] = {
    if (sample.isEmpty || p <= 1) return IndexedSeq.empty
    val sorted = sample.distinct.sorted(keyOrd)
    (1 until p)
      .map(i => sorted(((i.toLong * sorted.length) / p).toInt))
      .distinct
      .toIndexedSeq
  }

  /** Balanced comparison tree assigning pid = |{b : key > b}| — each row
    * evaluates log2(P) lexicographic comparisons, not P.
    */
  private[graft] def pidTree(
      cols: Seq[Column],
      bs: IndexedSeq[Seq[Any]],
      lo: Int,
      hi: Int
  ): Column =
    if (lo >= hi) lit(lo)
    else {
      val mid = (lo + hi) / 2
      when(gtKey(cols, bs(mid)), pidTree(cols, bs, mid + 1, hi))
        .otherwise(pidTree(cols, bs, lo, mid))
    }

  /** Two-valued lexicographic `key > boundary` with Spark's nulls-first
    * semantics (a null key field is smaller than any value; boundary keys
    * never contain nulls — see the sample filter above).
    */
  private def gtKey(cols: Seq[Column], b: Seq[Any]): Column =
    cols.zip(b).foldRight(lit(false): Column) { case ((c, v), rest) =>
      when(c > lit(v), lit(true))
        .otherwise(when(c <=> lit(v), rest).otherwise(lit(false)))
    }
}
