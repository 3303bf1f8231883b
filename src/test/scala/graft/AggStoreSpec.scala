package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AggStore

class AggStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"aggstore_$tag").toString + "/store"

  private def facts(rows: Seq[(String, Long)]): DataFrame =
    rows.toDF("grp", "v").select($"grp", $"v".cast("decimal(18,2)").as("v"))

  private def served(dir: String) =
    AggStore.serve(spark, dir)
      .select("grp", "cnt", "sum", "min", "max")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  private def oneShot(rows: Seq[(String, Long)]) =
    AggStore.aggregate(facts(rows), Seq("grp"), $"v")
      .select("grp", "cnt", "sum", "min", "max")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("two merged batches equal the one-shot aggregate; avg serves as sum/cnt") {
    val dir = tmp("merge")
    val b1 = Seq(("a", 10L), ("a", 20L), ("b", 5L))
    val b2 = Seq(("a", 30L), ("c", 7L), ("b", 1L))
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(b1), Seq("grp"), $"v"), Seq("grp"), 4, 1L)
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(b2), Seq("grp"), $"v"), Seq("grp"), 4, 2L)
    assert(served(dir) == oneShot(b1 ++ b2),
      "maintained store must equal a one-shot groupBy over all history")
    val avgA = AggStore.serve(spark, dir).filter($"grp" === "a")
      .select($"avg".cast("double")).head().getDouble(0)
    assert(math.abs(avgA - 20.0) < 1e-12)
  }

  test("replaying an applied batchId never double-adds") {
    val dir = tmp("replay")
    val b = Seq(("a", 10L))
    val st = AggStore.aggregate(facts(b), Seq("grp"), $"v")
    AggStore.merge(spark, dir, st, Seq("grp"), 4, 7L)
    AggStore.merge(spark, dir, st, Seq("grp"), 4, 7L)
    AggStore.merge(spark, dir, st, Seq("grp"), 4, 7L)
    assert(served(dir) == oneShot(b))
  }

  test("a crash mid-swap rolls back to the pre-merge store via PartitionSwap") {
    import java.io.File
    import java.nio.file.{Paths, StandardCopyOption}
    val dir = tmp("crash")
    val b1 = Seq(("a", 10L), ("b", 5L), ("c", 2L), ("d", 9L))
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(b1), Seq("grp"), $"v"), Seq("grp"), 4, 1L)
    val healthy = served(dir)
    // fabricate a half-promoted batch 99: retired holds the original
    // bucket, live holds a corrupted one, pending names the batch
    val bucket = new File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("bucket=")).min
    val retired = new File(dir + ".retired"); retired.mkdirs()
    val rb = new File(retired, bucket); rb.mkdirs()
    new File(dir, bucket).listFiles().foreach { f =>
      Files.copy(f.toPath, Paths.get(rb.getPath, f.getName),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    val scratch = dir + ".scratch"
    spark.read.parquet(s"$dir/$bucket").withColumn("cnt", $"cnt" * 2)
      .write.mode("overwrite").parquet(scratch)
    spark.read.parquet(scratch).write.mode("overwrite").parquet(s"$dir/$bucket")
    Files.write(Paths.get(dir, "_batches", "_pending"), "99".getBytes)
    assert(served(dir) == healthy, "rollback must restore the pre-merge store")
    assert(!new File(dir + ".retired").exists())
    // the replayed batch then merges from consistent state
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(Seq(("a", 10L))), Seq("grp"), $"v"),
      Seq("grp"), 4, 99L)
    assert(served(dir) == oneShot(b1 ++ Seq(("a", 10L))))
  }

  private def copyDir(src: String, dst: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path("/")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(src),
      fs, new org.apache.hadoop.fs.Path(dst),
      false, spark.sparkContext.hadoopConfiguration)
  }

  private def buckets(dir: String): Set[String] = {
    val f = new java.io.File(dir)
    if (!f.exists()) Set.empty
    else f.listFiles().map(_.getName).filter(_.startsWith("bucket=")).toSet
  }

  test("a crash that PROMOTED a newly-created bucket rolls back to its absence") {
    import java.nio.file.Paths
    val dir = tmp("newbucket")
    val b1 = Seq(("a", 10L))
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(b1), Seq("grp"), $"v"), Seq("grp"), 8, 1L)
    val before = buckets(dir)
    // find a group that lands in a bucket the store does not have yet,
    // by merging candidates into a scratch clone
    val (g, newBucket, scratch) = ('b' to 'z').iterator.map { c =>
      val s = tmp(s"scratch$c")
      copyDir(dir, s)
      AggStore.merge(spark, s,
        AggStore.aggregate(facts(Seq((c.toString, 7L))), Seq("grp"), $"v"),
        Seq("grp"), 8, 99L)
      (c.toString, buckets(s) -- before, s)
    }.collectFirst { case (c, diff, s) if diff.nonEmpty => (c, diff.head, s) }.get
    // fabricate the crash: the new bucket was PROMOTED (no retired
    // counterpart — it never existed), pending lists it, applied never
    // landed. Without the marker's entry list this partition is
    // indistinguishable from an untouched one and the replay double-adds.
    copyDir(s"$scratch/$newBucket", s"$dir/$newBucket")
    Files.write(Paths.get(dir, "_batches", "_pending"),
      s"99\n$newBucket".getBytes)
    assert(served(dir) == oneShot(b1),
      "rollback must delete the promoted newly-created bucket")
    assert(buckets(dir) == before)
    // the replayed batch merges from consistent state — NO double-add
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(Seq((g, 7L))), Seq("grp"), $"v"),
      Seq("grp"), 8, 99L)
    assert(served(dir) == oneShot(b1 ++ Seq((g, 7L))))
  }

  test("a crash mid-bootstrap cannot leave a partial live tree that replays into") {
    import java.nio.file.Paths
    // learn the bootstrap layout (spanning several buckets) in a scratch
    val b = Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L), ("e", 5L))
    val scratch = tmp("bootscratch")
    AggStore.merge(spark, scratch,
      AggStore.aggregate(facts(b), Seq("grp"), $"v"), Seq("grp"), 8, 5L)
    val bs = buckets(scratch).toSeq.sorted
    assert(bs.size >= 2, "fixture must span at least two buckets")
    // fabricate: one bucket promoted into live, the rest still staged,
    // pending lists all — the crash-mid-bootstrap window where the old
    // direct-overwrite write made hasData true with PARTIAL data
    val dir = tmp("bootcrash")
    copyDir(s"$scratch/${bs.head}", s"$dir/${bs.head}")
    bs.tail.foreach(p => copyDir(s"$scratch/$p", s"$dir.merge-stage/$p"))
    Files.createDirectories(Paths.get(dir, "_batches"))
    Files.write(Paths.get(dir, "_batches", "_pending"),
      (5L.toString +: bs).mkString("\n").getBytes)
    // the replayed batch must see an EMPTY store and bootstrap cleanly
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(b), Seq("grp"), $"v"), Seq("grp"), 8, 5L)
    assert(served(dir) == oneShot(b),
      "replay after a mid-bootstrap crash must equal the one-shot aggregate")
  }

  test("an empty bootstrap batch defers the store; the first non-empty batch bootstraps") {
    val dir = tmp("emptyboot")
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(Nil), Seq("grp"), $"v"), Seq("grp"), 4, 0L)
    // marker recorded, no unreadable file-less store left behind
    assert(graft.operators.PartitionSwap.alreadyApplied(spark, dir, 0L))
    val b = Seq(("a", 10L), ("b", 3L))
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(b), Seq("grp"), $"v"), Seq("grp"), 4, 1L)
    assert(served(dir) == oneShot(b))
    // and an empty LATER batch is a plain no-op
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(Nil), Seq("grp"), $"v"), Seq("grp"), 4, 2L)
    assert(served(dir) == oneShot(b))
  }

  test("erase with retained facts: serve equals the one-shot over retained; min/max rebuilt") {
    val dir = tmp("erase")
    // subject owns group b entirely AND the minimum of group a
    val subject = Seq(("a", 1L), ("b", 5L), ("b", 9L))
    val others = Seq(("a", 10L), ("a", 20L), ("c", 7L))
    val all = subject ++ others
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(all.take(3)), Seq("grp"), $"v"), Seq("grp"), 4, 1L)
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(all.drop(3)), Seq("grp"), $"v"), Seq("grp"), 4, 2L)
    val affected = AggStore.erase(spark, dir, facts(subject), Seq("grp"), $"v",
      buckets = 4, batchId = 10L, retainedFacts = Some(facts(others)))
    assert(affected == 2L, "groups a and b held subject facts")
    assert(served(dir) == oneShot(others),
      "after erasure the store must equal a one-shot groupBy over the " +
        "retained facts — including the REBUILT min of group a and the " +
        "disappearance of group b")
    assert(AggStore.stalenessCount(spark, dir) == 0L,
      "a rebuild-backed erase leaves no stale extremes")
    // replaying the applied erase batch is a no-op
    assert(AggStore.erase(spark, dir, facts(subject), Seq("grp"), $"v",
      4, 10L, Some(facts(others))) == 0L)
    assert(served(dir) == oneShot(others))
  }

  test("erase without retained facts: cnt/sum exact, staleness charged only for touched extremes") {
    val dir = tmp("erasestale")
    val subject = Seq(("a", 1L), ("c", 3L)) // a's MIN, c's interior value
    val others = Seq(("a", 10L), ("a", 20L), ("c", 1L), ("c", 7L))
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(subject ++ others), Seq("grp"), $"v"),
      Seq("grp"), 4, 1L)
    AggStore.erase(spark, dir, facts(subject), Seq("grp"), $"v",
      buckets = 4, batchId = 11L, retainedFacts = None)
    val rows = AggStore.serve(spark, dir)
      .select($"grp", $"cnt", $"sum".cast("long"), $"min".cast("long"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows("a") == ((2L, 30L, 1L)),
      "cnt/sum subtract exactly; the stored min stays (possibly stale)")
    assert(rows("c") == ((2L, 8L, 1L)),
      "c's min was NOT erased — cnt/sum exact, min still exact")
    assert(AggStore.stalenessCount(spark, dir) == 1L,
      "only group a's extreme was touched by the erasure")
    AggStore.clearStaleness(spark, dir)
    assert(AggStore.stalenessCount(spark, dir) == 0L)
  }

  test("erase aborts when erased facts disagree with the maintained history") {
    val dir = tmp("eraseabort")
    AggStore.merge(spark, dir,
      AggStore.aggregate(facts(Seq(("a", 10L))), Seq("grp"), $"v"), Seq("grp"), 4, 1L)
    // negative-count abort: erasing more rows than the group holds
    val exNeg = intercept[IllegalArgumentException] {
      AggStore.erase(spark, dir, facts(Seq(("a", 10L), ("a", 10L))),
        Seq("grp"), $"v", 4, 12L, None)
    }
    assert(exNeg.getMessage.contains("negative"))
    // cross-check abort: retained facts inconsistent with the subtraction
    val exBad = intercept[IllegalArgumentException] {
      AggStore.erase(spark, dir, facts(Seq(("a", 10L))),
        Seq("grp"), $"v", 4, 13L, Some(facts(Seq(("a", 999L)))))
    }
    assert(exBad.getMessage.contains("disagree"))
    // the store is untouched after both aborts
    assert(served(dir) == oneShot(Seq(("a", 10L))))
  }

  test("property: any batch split of random facts merges to the one-shot aggregate") {
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { trial =>
      val facts0 = Seq.fill(120)(
        (s"g${rnd.nextInt(7)}", (rnd.nextInt(2000) - 500).toLong))
      val nBatches = 1 + rnd.nextInt(4)
      val batches = facts0.zipWithIndex.groupBy(_._2 % nBatches)
        .toSeq.sortBy(_._1).map(_._2.map(_._1))
      val dir = tmp(s"prop$trial")
      batches.zipWithIndex.foreach { case (b, i) =>
        AggStore.merge(spark, dir,
          AggStore.aggregate(facts(b), Seq("grp"), $"v"), Seq("grp"), 3, i.toLong)
      }
      assert(served(dir) == oneShot(facts0),
        s"trial $trial: $nBatches-way split must merge losslessly")
    }
  }

  test("multi-column groups and null values follow SQL aggregate semantics") {
    val dir = tmp("multi")
    val df = Seq(("x", "p", Some(4L)), ("x", "p", None), ("x", "q", Some(2L)))
      .toDF("g1", "g2", "v")
      .select($"g1", $"g2", $"v".cast("decimal(18,2)").as("v"))
    AggStore.merge(spark, dir,
      AggStore.aggregate(df, Seq("g1", "g2"), $"v"), Seq("g1", "g2"), 4, 1L)
    val rows = AggStore.serve(spark, dir)
      .select("g1", "g2", "cnt").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(("x", "p", 1L), ("x", "q", 1L)),
      "count(value) skips nulls exactly like the one-shot aggregate")
  }
}
