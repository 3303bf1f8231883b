package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout for scan
  * pruning. Interleaving the bits of k coordinates into one value and
  * range-clustering files on it keeps every file's min/max range NARROW on
  * EVERY coordinate simultaneously, so a multi-column box predicate skips
  * most files/row-groups via ordinary parquet min/max stats — where a
  * single-column sort only prunes its own leading column. This is the
  * standard layout tool for 100 TB fact tables queried on several
  * dimensions at once (the technique behind Delta/Iceberg Z-ORDER
  * clustering; Morton, 1966).
  *
  * Everything here is pure shift/or/compare arithmetic on longs — whole
  * codegen, no UDF, no shuffle beyond the one range repartition that any
  * clustered write needs.
  */
object ZOrder {

  /** Morton z-value of non-negative integer coordinates: bit `j` of
    * coordinate `i` lands at output bit `j * k + i`, so the low `bits`
    * bits of all k coordinates interleave into one `bits * k`-bit long.
    * Coordinates are clamped into `[0, 2^bits)` first — a clamped outlier
    * degrades locality for its row only, instead of corrupting the whole
    * value with sign/overflow bits.
    *
    * Callers map raw columns into coordinate space themselves (e.g.
    * `pmod(user_id, 256)`, day-of-month, a sampled-quantile bucket); the
    * interleave stays a pure per-row expression either way.
    */
  def zValue(coords: Seq[Column], bits: Int): Column = {
    require(coords.nonEmpty, "zorder: need at least one coordinate")
    require(bits > 0, s"zorder: bits must be positive, got $bits")
    val k = coords.size
    require(bits * k <= 63,
      s"zorder: $k coords x $bits bits = ${bits * k} exceeds a long's 63 value bits")
    val hi = lit((1L << bits) - 1)
    coords.zipWithIndex.map { case (c0, i) =>
      val c = least(greatest(c0.cast("long"), lit(0L)), hi)
      (0 until bits).map { j =>
        shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * k + i)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Range-cluster `df` into `numPartitions` z-ordered output partitions:
    * one range shuffle on the z-value, a sort within each partition, z
    * column dropped. Writing the result (one file per partition) yields
    * the narrow-per-file-ranges layout described above; heal after many
    * appends with [[Compaction.compactClustered]]-style maintenance.
    */
  def cluster(
      df: DataFrame,
      coords: Seq[Column],
      bits: Int,
      numPartitions: Int
  ): DataFrame = {
    require(numPartitions > 0,
      s"zorder: numPartitions must be positive, got $numPartitions")
    require(!df.columns.contains("_z"),
      "zorder: input must not already have a _z column")
    df.withColumn("_z", zValue(coords, bits))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
