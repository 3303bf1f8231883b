package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.cli.CurateCli
import graft.operators.{Fsck, Lease}

/** Writer-lease detection ([[graft.operators.Lease]]): the single-writer
  * stance every maintained store documents becomes CHECKED — a second
  * writer interleaving on a leased state directory refuses loudly, the
  * same process re-enters (nested verbs, same-JVM replays), a dead
  * writer's stale lease is taken over after the TTL and surfaced by
  * fsck as debt until then, and break-lease is the operator's forced
  * recovery.
  */
class LeaseSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"lease_$tag").toString

  private def forgeLease(dir: String, holder: String, verb: String,
      stampMs: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$dir/.lease"), true)
    out.write(s"$holder|$verb|$stampMs".getBytes("UTF-8"))
    out.close()
  }

  test("a second writer refuses while a foreign lease is live; break-lease recovers") {
    val work = tmp("refuse")
    val state = s"$work/state"
    Seq(1L, 2L, 3L).toDF("doc_id").write.parquet(s"$work/keys")
    // another process's sweep is mid-flight
    forgeLease(state, "other-writer", "compact", System.currentTimeMillis())
    val e = intercept[IllegalStateException] {
      CurateCli.runEraseLogical(spark, s"$work/keys", state)
    }
    assert(e.getMessage.contains("lease") &&
      e.getMessage.contains("other-writer") &&
      e.getMessage.contains("compact"),
      s"the refusal must carry the evidence: ${e.getMessage}")
    // fsck sees a LIVE foreign lease as a running writer, not debt
    assert(Fsck.leaseDebt(spark, state).forall(_.ok))
    // the operator breaks the dead writer's lease; the verb proceeds and
    // releases its own lease at completion
    assert(Lease.break(spark, state))
    val (n, _) = CurateCli.runEraseLogical(spark, s"$work/keys", state)
    assert(n == 3L)
    assert(Lease.read(spark, state).isEmpty,
      "a completed verb must release its lease")
  }

  test("a stale foreign lease is taken over; fsck reports it as debt until then") {
    val work = tmp("stale")
    val state = s"$work/state"
    Seq(9L).toDF("doc_id").write.parquet(s"$work/keys")
    forgeLease(state, "dead-process", "erase", 0L) // held since the epoch
    val debt = Fsck.leaseDebt(spark, state)
    assert(debt.exists(c => !c.ok && c.check == "no_stale_lease"),
      "fsck must surface the dead writer's lease as debt")
    // past the TTL the next writer takes over instead of refusing
    val (n, _) = CurateCli.runEraseLogical(spark, s"$work/keys", state)
    assert(n == 1L)
    assert(Lease.read(spark, state).isEmpty)
    assert(Fsck.leaseDebt(spark, state).forall(_.ok))
  }

  test("nested verbs re-enter: the outermost exit releases, not the inner") {
    val work = tmp("nest")
    val state = s"$work/state"
    Lease.withLease(spark, state, "outer") {
      Lease.withLease(spark, state, "inner") {
        assert(Lease.read(spark, state).exists(_.verb == "inner"))
      }
      assert(Lease.read(spark, state).nonEmpty,
        "the inner exit must NOT release the outer verb's lease")
    }
    assert(Lease.read(spark, state).isEmpty,
      "the outermost exit must release")
  }

  test("renewal keeps a long verb alive past the TTL; a non-renewing one is taken over") {
    // VERDICT r11: acquire stamped once and never re-stamped during the
    // body, so a verb legitimately running past the TTL was presumed
    // dead and taken over WHILE STILL RUNNING — the exact two-writer
    // interleave the lease exists to prevent. Long verbs now heartbeat
    // via Lease.renew between stages.
    val state = s"${tmp("renew")}/state"
    val ttl = 60_000L
    Lease.withLease(spark, state, "sweep", ttlMs = ttl) {
      // simulate a holder whose last stamp is PAST the TTL: backdate the
      // marker in place (same holder — this process — old stamp)
      forgeLease(state, Lease.processId, "sweep",
        System.currentTimeMillis() - 2 * ttl)
      assert(Fsck.leaseDebt(spark, state, ttlMs = ttl)
        .forall(_.ok), "this process's own old lease is never debt to fsck")
      // WITHOUT renewal a foreign writer would take the stale lease over
      // (the takeover branch keys on age alone); WITH the heartbeat the
      // stamp is fresh again and a foreign live-lease check refuses
      Lease.renew(spark, state)
      val i = Lease.read(spark, state).get
      assert(System.currentTimeMillis() - i.stampMs < ttl,
        "renew must re-stamp the held lease")
      assert(i.verb == "sweep" && i.holder == Lease.processId,
        "renew must preserve the holder and verb")
    }
    assert(Lease.read(spark, state).isEmpty)
    // renew on a dir this process does NOT hold is a no-op — it must
    // never resurrect a released lease or touch a foreign one
    Lease.renew(spark, state)
    assert(Lease.read(spark, state).isEmpty)
    forgeLease(state, "other-writer", "compact", 123L)
    Lease.renew(spark, state)
    assert(Lease.read(spark, state).exists(i =>
      i.holder == "other-writer" && i.stampMs == 123L),
      "renew must leave a foreign lease untouched")
  }

  test("the streaming sinks hold the state lease per micro-batch: a foreign writer refuses the epoch") {
    // VERDICT r11: the streaming mutators held no lease — a cron'd
    // compact interleaving with a live stream was silent corruption.
    // Each sink's micro-batch now acquires (and re-stamps) the state
    // directory's lease, so a live foreign writer fails the epoch loudly.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingPipeline
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val work = tmp("sink")
    val indexDir = s"$work/search"
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    input.addData((1L, "alpha beta"), (2L, "beta gamma"))
    // a live foreign writer is mid-verb on the index directory
    forgeLease(indexDir, "other-writer", "compact", System.currentTimeMillis())
    val q = StreamingPipeline.searchIndexSink(stream, indexDir, s"$work/ckpt")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("lease") &&
      e.getMessage.contains("other-writer"),
      s"the epoch must refuse with the evidence: ${e.getMessage}")
    assert(Lease.break(spark, indexDir))
    // with the foreign lease broken the SAME epoch replays clean, and the
    // sink releases its per-batch lease at the epoch boundary
    StreamingPipeline.searchIndexSink(stream, indexDir, s"$work/ckpt")
      .awaitTermination()
    val (_, stats) = graft.text.Bm25.loadSearchIndex(spark, indexDir)
    assert(stats.head().getAs[Double]("_n_docs") == 2.0)
    assert(Lease.read(spark, indexDir).isEmpty,
      "the sink must release the lease at the micro-batch boundary")
    // and the inverse interleave: while a (forged) stream lease is live,
    // a mutating CLI verb on the same state directory refuses
    forgeLease(indexDir, "stream-writer", "stream-search-index",
      System.currentTimeMillis())
    Seq(1L).toDF("doc_id").write.parquet(s"$work/keys")
    val e2 = intercept[IllegalStateException] {
      CurateCli.runCompact(spark, indexDir)
    }
    assert(e2.getMessage.contains("stream-search-index"))
  }

  test("an in-process failure releases the lease — only a process death leaves debt") {
    val work = tmp("fail")
    val state = s"$work/state"
    intercept[RuntimeException] {
      Lease.withLease(spark, state, "erase") {
        throw new RuntimeException("boom")
      }
    }
    assert(Lease.read(spark, state).isEmpty,
      "an in-JVM failure is not a dead writer; the lease must release")
    assert(Fsck.leaseDebt(spark, state).forall(_.ok))
  }
}
