package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-key skew diagnostics — the "will this key shuffle?" census you
  * run BEFORE keying a 100 TB join or aggregation: per hot key its row
  * count and share of the table, ranked. A share far above 1/parallelism
  * on the planned shuffle key means salting / AQE skew-join territory.
  *
  * One hash aggregate (map-side combined) + a top-N cut via
  * TakeOrderedAndProject on the aggregated key counts — no full sort, no
  * second pass over the data.
  */
object Skew {

  /** (key, n, share, rank) for the `topN` heaviest keys of `keyCol`;
    * `key` is stringified so the diagnostic works on any key type, and
    * null keys count as a key of their own (they skew too). `share` is a
    * raw double for callers to canonicalize.
    *
    * `rowSizeCol` (optional) adds `est_bytes` = sum of the per-row size
    * estimate over the key's rows — the "will this key's partition fit in
    * one task?" number a real pre-join census needs (pass e.g.
    * `octet_length(to_json(struct("*")))` for a serialized-row proxy, or a
    * known payload column's length). Aggregated in the SAME single keyed
    * pass as the count; no second scan.
    */
  def keySkew(
      df: DataFrame,
      keyCol: String,
      topN: Int = 10,
      rowSizeCol: Option[Column] = None
  ): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val sizeAggs = rowSizeCol.map(c => sum(c.cast("long")).as("est_bytes")).toSeq
    val counts = df
      .groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"), sizeAggs: _*)
    val total = counts.agg(sum(col("n")).as("_total"))
    counts
      .orderBy(col("n").desc, col("key").asc_nulls_last)
      .limit(topN)
      .crossJoin(broadcast(total))
      .select(
        Seq(
          col("key"),
          col("n"),
          (col("n").cast("double") / col("_total").cast("double")).as("share")
        ) ++ rowSizeCol.map(_ => col("est_bytes")): _*
      )
      .withColumn(
        "rank",
        // INVARIANT: this unpartitioned window is safe ONLY because its
        // input is the already-`limit(topN)` frame (<= topN rows reach the
        // single window task) — never rank the full counts frame this way.
        // SkewSpec pins this with a plan assertion (GlobalLimit below the
        // Window).
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n").desc, col("key").asc_nulls_last))
      )
  }
}
