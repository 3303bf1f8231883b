package graft

import org.apache.spark.sql.functions._

import graft.operators.Mixture

/** Exact-budget mixture (operators/Mixture): the admission rule against
  * a driver-side reference on random data, the overshoot bound, the
  * unknown-source default, and the scale shape (no single-task sort of
  * the data — the running sum goes through the range-partitioned
  * two-pass plan).
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("budgeted admission equals the sequential per-source prefix, every seed") {
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 400).map { i =>
        (i.toLong, s"s${rnd.nextInt(5)}", 1 + rnd.nextInt(50))
      }
      val budgets = Map("s0" -> 200L, "s1" -> 350L, "s2" -> 0L, "s3" -> 120L)
      val got = Mixture
        .budgeted(rows.toDF("id", "src", "cost"), "id", "src", col("cost"),
          budgets)
        .select(col("id"), col("cum_before"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

      val want = rows.groupBy(_._2).flatMap { case (src, g) =>
        val budget = budgets.getOrElse(src, 0L)
        var cum = 0L
        g.sortBy(r => (md5Hex(r._1.toString), r._1)).flatMap { r =>
          val before = cum
          cum += r._3
          if (before < budget) Some(r._1 -> before) else None
        }
      }
      assert(got == want, s"seed $seed: admission set or running sums differ")
      // overshoot bound: per source, selected cost < budget + max row cost
      val bySrc = rows.filter(r => got.contains(r._1)).groupBy(_._2)
      bySrc.foreach { case (src, g) =>
        val total = g.map(_._3.toLong).sum
        assert(total < budgets.getOrElse(src, 0L) + 51,
          s"seed $seed: source $src overshoots by more than one document")
      }
      // s2 (zero budget) and s4 (unlisted, default 0) admit nothing
      assert(!rows.filter(r => Set("s2", "s4")(r._2)).exists(r => got.contains(r._1)))
    }
  }

  test("the running sum never single-task-sorts the data: windows are partition-scoped") {
    val df = (1 to 1000).map(i => (i.toLong, s"s${i % 2}", 3)).toDF("id", "src", "cost")
    val out = Mixture.exclusiveRunningSum(df, "src", "id",
      md5(col("id").cast("string")), col("cost"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("_pid"),
      s"the running sum must window within (partition, source):\n$plan")
    // and the values match a plain keyed-window run (small data, safe here)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
      .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ref = df
      .withColumn("cum_before", coalesce(sum(col("cost")).over(w), lit(0L)))
      .select(col("id"), col("cum_before"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.select(col("id"), col("cum_before"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == ref)
  }
}
