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
