package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-stable hashing for reproducible operators (sampling, packing):
  * first 8 md5 hex digits of the stringified value as a long — the same
  * base-hash shape as [[graft.dedup.Dedup.minhashBase]], which documents
  * the DuckDB twin (`cast('0x' || substr(md5(x), 1, 8) as bigint)`).
  *
  * One definition, shared by every operator that buckets on it, so a
  * future widening of the hash cannot silently diverge from the oracles.
  *
  * NULL values hash as the empty string: a NULL id lands in a
  * deterministic bucket instead of silently vanishing through a
  * NULL-propagating filter.
  */
object StableHash {

  def md5Long(c: Column): Column =
    conv(substring(md5(coalesce(c.cast("string"), lit(""))), 1, 8), 16, 10)
      .cast("long")

  /** Uniform bucket in [0, mod). */
  def bucket(c: Column, mod: Int): Column = (md5Long(c) % mod).cast("int")
}
