package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver test tables (`/root/testdata/sf*`; TESTDATA.md). */
object Tables {

  /** Resolved-relation memo: `spark.read.parquet` lists files and reads
    * footers for schema inference on every call, which dominates the fixed
    * per-query cost when one session runs the whole query registry
    * (Verify/Bench). Logical plans are immutable, so handing back the same
    * analyzed DataFrame is safe. Sessions key a WEAK outer map so a stopped
    * (and dereferenced) session's plans are GC-able instead of pinned for
    * the JVM lifetime; the inner per-session map is a plain CHM.
    */
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[
      SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]())

  private def sessionCache(spark: SparkSession) = {
    var m = cache.get(spark)
    if (m == null) {
      cache.synchronized {
        m = cache.get(spark)
        if (m == null) {
          m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
          cache.put(spark, m)
        }
      }
    }
    m
  }

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    sessionCache(spark).computeIfAbsent(
      s"$dir/$name.parquet",
      path => {
        // The driver testdata ships one single-row-group parquet file per
        // table, which parquet cannot split — without this every scan (and
        // the whole narrow stage above it: masking, shingling, murmur,
        // regexes) runs on ONE core. Fanning the few MB out once unlocks
        // all cores for the compute-heavy per-row work; a production
        // deployment reads many splittable files and skips this.
        val df = spark.read.parquet(path)
        df.repartition(spark.sparkContext.defaultParallelism)
      }
    )

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS). How Spark surfaces
    * that has changed across releases: older readers reject it unless
    * `spark.sql.legacy.parquet.nanosAsLong` maps it to a raw nanos long,
    * while Spark 4.1's reader ignores that flag and infers TIMESTAMP_NTZ
    * (nanos truncated to micros). Dispatch on whatever THIS runtime
    * inferred so the same code yields an identical µs-precision
    * timestamp column on either reader (the session TZ is UTC everywhere
    * in this repo, so the NTZ cast is value-preserving).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // harmless where inert; on old Sparks it makes the read succeed as long
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = read(spark, dir, "events")
    val ts = df.schema("ts").dataType match {
      case LongType         => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType => col("ts").cast("timestamp")
      case TimestampType    => col("ts")
      case other =>
        throw new IllegalStateException(
          s"events.ts inferred as unsupported type $other; expected " +
            "LongType (legacy nanosAsLong), TIMESTAMP_NTZ (Spark 4.1+ " +
            "nanos read), or TIMESTAMP")
    }
    df.withColumn("ts", ts)
  }

  /** Registers the synthesized GDPR-services view derived from `customer`
    * and returns it (see [[ServicesSynth]]).
    */
  def services(spark: SparkSession, dir: String): DataFrame = {
    // resolve the customer relation BEFORE entering computeIfAbsent — a
    // mapping function must not touch other keys of the same CHM (nested
    // computeIfAbsent can corrupt a shared bin or spin)
    val customer = read(spark, dir, "customer")
    sessionCache(spark).computeIfAbsent(
      s"$dir#services",
      _ => {
        customer.createOrReplaceTempView("customer")
        spark.sql(ServicesSynth.sql)
      }
    )
  }
}
