package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Each query is fully materialized through the `noop` sink — a bare
  * `count()` would let Catalyst prune the computed columns and time only the
  * scan. First a warmup pass on the flagship query amortizes JVM/codegen
  * startup out of the numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // r14: the r13 session-level minPartitionSize=64k floor is REMOVED.
      // The driver's full-registry r13 bench showed it regressing 9 queries
      // 2-10x at local[32] (q_substring_dedup 1.1->11.5s, q_ssjoin 4->13s,
      // q_topk_revenue 0.8->3.7s): keeping 32 micro-partitions alive per
      // stage on sub-MB sf0.1 shuffles compounds per-task overhead across
      // multi-stage queries. Parallelism-sensitive operators tune
      // partitioning internally where plans can prove it, not here.
      .config("spark.ui.enabled", "false")
    // ad-hoc experiment overrides: SPARK_GRAFT_CONF="key=value;key=value"
    sys.env.get("SPARK_GRAFT_CONF").foreach {
      _.split(';').filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      } catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Full warmup pass: whole-stage-codegen compilation (Janino) costs
    // seconds per distinct plan and is one-time per executor lifetime —
    // at the 100 TB design point it amortizes to nothing, so the measured
    // passes report steady-state throughput. THREE measured passes,
    // median per query: this box is shared/noisy (±30-40% swings swamped
    // round-to-round per-query history at min-of-2); the median of 3 is a
    // stable steady-state estimator and the min is kept alongside as the
    // best-case floor.
    val names = SparkEntry.queries.keys.toSeq.sorted
    // the warmup pass doubles as a load canary: its wall time is pure
    // repeated work (same queries, same data), so across captures of the
    // same build it varies only with BOX LOAD — the artifact carries it
    // (`warmup_sec`) and tools/bench_adjudicate.py flags a capture whose
    // warmup deviates >1.5x from the best capture as contaminated,
    // mechanically, instead of arguing from per-sample spread (the r12
    // driver capture cost a false 1.45x headline that three clean runs
    // then had to talk down)
    val warm0 = System.nanoTime()
    names.foreach(runOnce)
    val warmupSec = (System.nanoTime() - warm0) / 1e9

    val results = names.map { name =>
      // three measured passes, then three MORE for sub-second queries:
      // two consecutive rounds adjudicated a sub-second cross-round
      // breach as "box noise" from plan identity alone (r8 q_*, r9
      // q_bm25 1.54x) — the artifact now carries every sample so the
      // next adjudication can cite variance DATA, and short queries
      // (where scheduler jitter is a whole multiple of the runtime) get
      // doubled sample counts instead of argument.
      val base = Seq(runOnce(name), runOnce(name), runOnce(name))
      val samples =
        if (base.exists(_ < 0) || base.min >= 1.5) base
        else base ++ Seq(runOnce(name), runOnce(name), runOnce(name))
      // a single failed pass must surface as a failure, not be papered over
      // by the other passes' timings — intermittent errors matter more
      // than a missing sample
      val summary =
        if (samples.exists(_ < 0)) {
          System.err.println(
            s"[bench] WARN: $name failed in a measured pass (${samples.mkString(", ")})")
          (-1.0, -1.0)
        } else {
          // true median: for even counts average the two middle samples —
          // the lower-middle alone is a systematically optimistic bias on
          // the doubled 6-sample runs
          val sorted = samples.sorted
          val n = sorted.length
          val med =
            if (n % 2 == 1) sorted(n / 2)
            else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
          (med, sorted.head)
        }
      (name, summary, samples)
    }
    val qs = results.map { case (k, (med, _), _) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, (_, mn), _) => "\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val qsSamples = results.map { case (k, _, ss) =>
      // Locale.ROOT: a comma-decimal default locale would render the
      // samples array as invalid JSON while the toString numbers stay valid
      "\"" + k + "\":" + ss.map(s =>
        String.format(java.util.Locale.ROOT, "%.4f", Double.box(s)))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val failed = results.count(_._2._1 < 0)
    // ONE SHORT LINE PER QUERY first: the driver keeps a bounded tail of
    // stdout, and round 3 showed a truncation eating the front of the big
    // combined line (per-query history for the a-e queries was lost).
    // Short lines degrade gracefully — a tail cut loses only the earliest
    // queries, never the middle of a JSON object. `value` stays the
    // headline number (now the median); `min` rides along.
    results.foreach { case (k, (med, mn), _) =>
      println(s"""{"metric":"query","name":"$k","value":$med,"min":$mn,"unit":"sec"}""")
    }
    // and the full artifact on disk, readable whole regardless of capture
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    val artifact =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_min":$qsMin,"samples":$qsSamples,""" +
        String.format(java.util.Locale.ROOT, """"warmup_sec":%.1f,""",
          Double.box(warmupSec)) +
        s""""samples_per_query":"3, 6 when min < 1.5s","sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), artifact + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] WARN: could not write $outFile: ${e.getMessage}")
    }
    // Full contract line, then the SHORT headline line LAST so the total
    // survives any tail capture (headline format unchanged from round 4).
    println(artifact)
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
