package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver test tables (`/root/testdata/sf*`; TESTDATA.md). */
object Tables {

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.parquet` carries INT64 TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long and convert to a microsecond
    * timestamp (`ts div 1000` — integer division, no double round-trip).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** Registers the synthesized GDPR-services view derived from `customer`
    * and returns it (see [[ServicesSynth]]).
    */
  def services(spark: SparkSession, dir: String): DataFrame = {
    read(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(ServicesSynth.sql)
  }
}
