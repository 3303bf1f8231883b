package graft
import org.apache.spark.sql.SparkSession

/** Measurement-only harness for the optimization rounds: times a SUBSET of
  * registry queries (args = query names; "all" = every query) with the same
  * methodology as [[Bench]] (noop sink, per-query warmup, 3 samples, median)
  * so a single query can be iterated on without paying the full-registry
  * bench. Also dumps `.explain("formatted")` per query when
  * SPARK_GRAFT_PLAN_DIR is set. Not part of the driver contract — the
  * driver runs [[Bench]]; this main never writes bench_results.json.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // keep the probe's session identical to Bench's (see Bench.scala)
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach {
      _.split(';').filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // profiling listener: jobs/stages/tasks + summed task time per probe
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val jobLog = sys.env.contains("SPARK_GRAFT_JOBLOG")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (jobLog) System.err.println(
            s"[joblog] ${j.stageInfos.map(_.name).mkString(" | ")}")
        }
        override def onStageCompleted(
            st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages.incrementAndGet()
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet()
          if (t.taskInfo != null)
            taskMs.addAndGet(t.taskInfo.duration)
        }
      })
    def snap(): (Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, taskMs.get)

    val names =
      if (args.isEmpty || args.sameElements(Array("all")))
        SparkEntry.queries.keys.toSeq.sorted
      else args.toSeq

    def runOnce(name: String): Double = {
      spark.sparkContext.setJobDescription(s"probe: $name")
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      } catch {
        case e: Throwable =>
          System.err.println(s"[probe] $name FAILED: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    planDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))

    val results = names.map { name =>
      planDir.foreach { d =>
        try {
          val plan = SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"$name.txt"), plan)
        } catch { case e: Throwable =>
          System.err.println(s"[probe] plan dump $name failed: ${e.getMessage}")
        }
      }
      val warm = runOnce(name)
      val before = snap()
      val samples = Seq(runOnce(name), runOnce(name), runOnce(name))
      val after = snap()
      val med =
        if (samples.exists(_ < 0)) -1.0
        else samples.sorted.apply(1)
      println(String.format(java.util.Locale.ROOT,
        """{"name":"%s","warm":%.3f,"median":%.3f,"samples":[%s],"jobs3":%d,"stages3":%d,"tasks3":%d,"taskSec3":%.1f}""",
        name, Double.box(warm), Double.box(med),
        samples.map(s => String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))).mkString(","),
        Long.box(after._1 - before._1), Long.box(after._2 - before._2),
        Long.box(after._3 - before._3),
        Double.box((after._4 - before._4) / 1e3)))
    }
    val _ = results
    spark.stop()
  }
}
