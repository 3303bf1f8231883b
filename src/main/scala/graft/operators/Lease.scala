package graft.operators

import org.apache.spark.sql.SparkSession

/** Single-writer lease — DETECT interleaved writers instead of assuming
  * they never happen.
  *
  * Every maintained store in this engine documents the one-writer-at-a-
  * time stance (the sweep/CLI convention): the commit protocols make
  * each verb crash-CONVERGENT under replay of itself, but two DIFFERENT
  * mutating verbs interleaving on one state directory can corrupt
  * silently (e.g. a compaction swapping files out from under an erase
  * sweep's staged rewrite). This module turns that silent hazard into a
  * loud refusal: every mutating CLI verb takes a lease on the state
  * directory for its duration, and a second writer arriving while the
  * lease is live REFUSES with the holder, verb, and age in the message.
  *
  * Mechanics (one tiny marker, zero jobs): `<state>/.lease` holds
  * `holder|verb|stampMillis`. Acquire is create-if-absent (atomic on
  * HDFS, createNewFile on local FS); the SAME process re-enters freely
  * (nested verbs — erase-settle drives erase — and same-JVM replays);
  * a FOREIGN live lease refuses; a foreign lease older than the TTL is
  * taken over (the holder is presumed dead — a crashed process cannot
  * release). Release deletes the marker only when held by this process.
  *
  * This is DETECTION, not coordination: the create-then-verify pattern
  * has a small takeover race two simultaneously-starting writers could
  * thread, which is exactly the externally-serialized case the stance
  * already requires. The lease catches the operational reality — a cron
  * overlap, a human re-running a verb a scheduler also runs — not
  * adversarial concurrency.
  *
  * A crashed writer leaves its lease behind: [[Fsck.leaseDebt]] reports
  * it (young = writer may be live; stale = debt, break it), and
  * `CurateCli break-lease` is the operator's forced release.
  *
  * Reference frame: tabodino/dbt-gdpr-anonymizer runs under dbt's
  * single-invocation model where the scheduler serializes runs; a
  * maintained store with many verbs needs the serialization made
  * checkable.
  */
object Lease {

  /** One JVM = one writer process: nested verbs and same-process replays
    * re-enter their own lease.
    */
  private[graft] val processId: String =
    java.util.UUID.randomUUID().toString

  /** Default takeover TTL: a mutating verb that has held a lease this
    * long without finishing is presumed dead.
    */
  val DefaultTtlMs: Long = 30L * 60 * 1000

  final case class Info(holder: String, verb: String, stampMs: Long)

  private def leasePath(dir: String) =
    new org.apache.hadoop.fs.Path(s"${dir.stripSuffix("/")}/.lease")

  private def fsOf(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The current lease, if any (None also on an unreadable/torn marker —
    * treated as absent, the same trust model as a torn `_SUCCESS`).
    */
  def read(spark: SparkSession, dir: String): Option[Info] = {
    val fs = fsOf(spark, dir)
    val p = leasePath(dir)
    if (!fs.exists(p)) None
    else
      scala.util.Try {
        val in = fs.open(p)
        val raw =
          try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        val Array(holder, verb, stamp) = raw.trim.split('|')
        Info(holder, verb, stamp.toLong)
      }.toOption
  }

  private def write(spark: SparkSession, dir: String, verb: String,
      overwrite: Boolean): Unit = {
    val fs = fsOf(spark, dir)
    val out = fs.create(leasePath(dir), overwrite)
    out.write(s"$processId|$verb|${System.currentTimeMillis()}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Take the directory's writer lease for `verb`. Refuses (loudly, with
    * the evidence) when a DIFFERENT process holds a lease younger than
    * `ttlMs`; re-enters this process's own lease; takes over a stale one.
    */
  def acquire(
      spark: SparkSession,
      dir: String,
      verb: String,
      ttlMs: Long = DefaultTtlMs
  ): Unit = {
    val fs = fsOf(spark, dir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    read(spark, dir) match {
      case None =>
        // create-if-absent; losing the race to a simultaneous writer
        // surfaces as the create failing or the verify below refusing
        scala.util.Try(write(spark, dir, verb, overwrite = false))
        read(spark, dir) match {
          case Some(i) if i.holder == processId => ()
          case Some(i) => refuse(dir, verb, i)
          case None =>
            throw new IllegalStateException(
              s"lease: could not create ${leasePath(dir)} for '$verb'")
        }
      case Some(i) if i.holder == processId =>
        write(spark, dir, verb, overwrite = true)
      case Some(i) if System.currentTimeMillis() - i.stampMs > ttlMs =>
        // presumed-dead holder: take over — LOUDLY, so a takeover of a
        // long verb that should have renewed is diagnosable from the log
        println(s"[lease] taking over stale '${i.verb}' lease on $dir " +
          s"(holder ${i.holder}, " +
          s"held ${System.currentTimeMillis() - i.stampMs} ms > TTL " +
          s"$ttlMs ms; presumed dead) for '$verb'")
        write(spark, dir, verb, overwrite = true)
      case Some(i) => refuse(dir, verb, i)
    }
  }

  /** Heartbeat for a long-running verb: re-stamp this process's lease so
    * the holder is never presumed dead WHILE STILL RUNNING. Without it a
    * sweep that legitimately outlives the TTL (plausible at 100 TB) is
    * taken over mid-run — the exact two-writer interleave the lease
    * exists to prevent, manufactured by the lease itself. Sweep-scale
    * verbs call this between store legs; the streaming sinks get it for
    * free (their per-micro-batch acquire re-stamps). A no-op when this
    * process does not hold the lease (never resurrects a released or
    * broken one), and one fs read + write — zero jobs.
    */
  def renew(spark: SparkSession, dir: String): Unit =
    read(spark, dir) match {
      case Some(i) if i.holder == processId =>
        write(spark, dir, i.verb, overwrite = true)
      case _ => ()
    }

  private def refuse(dir: String, verb: String, i: Info): Nothing =
    throw new IllegalStateException(
      s"lease: '$verb' refused on $dir — writer ${i.holder} is running " +
        s"'${i.verb}' (held ${System.currentTimeMillis() - i.stampMs} ms); " +
        "one mutating verb at a time per state directory. If that writer " +
        "is dead, wait out the TTL or run `CurateCli break-lease <dir>`.")

  /** Release this process's lease (a foreign lease is left alone). */
  def release(spark: SparkSession, dir: String): Unit =
    read(spark, dir) match {
      case Some(i) if i.holder == processId =>
        fsOf(spark, dir).delete(leasePath(dir), false)
        ()
      case _ => ()
    }

  /** Operator's forced release — the recovery verb for a dead writer's
    * lease.
    */
  def break(spark: SparkSession, dir: String): Boolean = {
    val fs = fsOf(spark, dir)
    val p = leasePath(dir)
    val existed = fs.exists(p)
    if (existed) fs.delete(p, false)
    existed
  }

  /** Run `body` under the lease. Released on every exit — an in-process
    * failure is not a dead writer; only a process death leaves the
    * marker for [[Fsck.leaseDebt]] to report. Nested calls re-enter
    * (same process), and the OUTERMOST exit releases — an inner verb
    * (erase inside erase-settle) must not drop the lease mid-parent.
    */
  def withLease[T](
      spark: SparkSession,
      dir: String,
      verb: String,
      ttlMs: Long = DefaultTtlMs
  )(body: => T): T = {
    val outermost = read(spark, dir).forall(_.holder != processId)
    acquire(spark, dir, verb, ttlMs)
    try body
    finally if (outermost) release(spark, dir)
  }
}
