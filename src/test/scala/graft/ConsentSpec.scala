package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.cli.CurateCli
import graft.operators.DeletionVectors
import graft.pipeline.Snapshot
import graft.policy.Consent

/** Consent / lawful-basis registry ([[graft.policy.Consent]]): opt-in
  * gating (absence is denial), the full grant/withdraw/re-grant chain
  * with its Art. 7(1) audit history intact, withdrawal composing into
  * immediate serving stoppage (deletion vector) plus physical purge at
  * settle, idempotent event replays, and the snapshot-store auditor
  * reaching the registry.
  */
class ConsentSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"consent_$tag").toString

  private def events(
      ids: Seq[Long], purpose: String, granted: Boolean, at: Long) =
    ids.toDF("subject_id")
      .withColumn("purpose", lit(purpose))
      .withColumn("granted", lit(granted))
      .withColumn("updated_at", lit(at))

  test("opt-in gate: absence is denial, only current grants admit") {
    val dir = tmp("gate")
    Consent.init(spark, dir, events(Seq(1L, 2L, 3L), "training", granted = true, 1L))
    Consent.update(spark, dir, events(Seq(2L), "training", granted = false, 2L))
    // subject 4 never consented; subject 5 granted a DIFFERENT purpose
    Consent.update(spark, dir, events(Seq(5L), "analytics", granted = true, 2L))
    val input = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val admitted = Consent.gate(spark, dir, input, "training")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 3L))
    // no registry at all: nobody consented, nothing admitted
    assert(Consent.gate(spark, s"${tmp("none")}/missing", input, "training")
      .isEmpty)
  }

  test("grant/withdraw/re-grant chain keeps the audit history (Art. 7(1))") {
    val dir = tmp("chain")
    Consent.init(spark, dir, events(Seq(7L), "training", granted = true, 1L))
    Consent.update(spark, dir, events(Seq(7L), "training", granted = false, 2L))
    Consent.update(spark, dir, events(Seq(7L), "training", granted = true, 3L))
    val cur = Consent.currentState(spark, dir).collect()
    assert(cur.length == 1 && cur.head.getAs[Boolean]("granted")
      && cur.head.getAs[Long]("updated_at") == 3L)
    // every superseded version survives with its validity interval —
    // "was admission lawful when batch N ran" is answerable
    val hist = Snapshot.loadStore(spark, dir)
    assert(hist.count() == 3)
    val at2 = Snapshot.asOf(hist, lit(2L)).collect()
    assert(at2.length == 1 && !at2.head.getAs[Boolean]("granted"),
      "asOf(2) must show the withdrawal in force")
  }

  test("withdrawal stops serving NOW and purges physically at settle") {
    val work = tmp("withdraw")
    val state = s"$work/state"
    val consent = s"$work/consent"
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .write.parquet(s"$work/b0")
    val s0 = CurateCli.runIncremental(
      spark, s"$work/b0", state, nShards = 2, aggStats = true)
    assert(s0.auditOk)
    val corpusIds = spark.read.parquet(s"$state/corpus").select(col("doc_id"))
    Consent.init(spark, consent,
      corpusIds.withColumnRenamed("doc_id", "subject_id")
        .withColumn("purpose", lit("training"))
        .withColumn("granted", lit(true))
        .withColumn("updated_at", lit(1L)))
    val toWithdraw = corpusIds.filter(col("doc_id") % 9 === 2)
    toWithdraw.write.parquet(s"$work/withdraw_ids")
    val wd = spark.read.parquet(s"$work/withdraw_ids")
    val n = Consent.withdraw(spark, consent, wd, "training",
      updatedAt = 2L, stateDir = Some(state))
    assert(n == wd.count())
    // immediate: the gate refuses them AND the masked serve hides them
    val gated = Consent.gate(spark, consent,
      spark.read.parquet(s"$state/corpus"), "training")
    assert(gated.join(wd, Seq("doc_id"), "left_semi").isEmpty)
    val served = DeletionVectors.maskServing(spark, state,
      spark.read.parquet(s"$state/corpus"))
    assert(served.join(wd, Seq("doc_id"), "left_semi").isEmpty)
    // eventual: settle purges the corpus rows and clears the vector
    CurateCli.runEraseSettle(spark, state)
    assert(spark.read.parquet(s"$state/corpus")
      .join(wd, Seq("doc_id"), "left_semi").isEmpty)
    assert(DeletionVectors.pending(spark, state)._1 == 0)
    // the registry still demonstrates the withdrawal
    assert(Consent.grantedSubjects(spark, consent, "training")
      .join(wd.withColumnRenamed("doc_id", "subject_id"),
        Seq("subject_id"), "left_semi").isEmpty)
  }

  test("withdrawal killed between the registry and the vector heals by replay") {
    final case class Crash(at: String) extends RuntimeException(at)
    val work = tmp("crash")
    val state = s"$work/state"
    val consent = s"$work/consent"
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .limit(200).write.parquet(s"$work/b0")
    assert(CurateCli.runIncremental(
      spark, s"$work/b0", state, nShards = 2).auditOk)
    val ids = spark.read.parquet(s"$state/corpus").select(col("doc_id"))
    Consent.init(spark, consent,
      ids.withColumnRenamed("doc_id", "subject_id")
        .withColumn("purpose", lit("training"))
        .withColumn("granted", lit(true))
        .withColumn("updated_at", lit(1L)))
    ids.filter(col("doc_id") % 4 === 1).write.parquet(s"$work/wd")
    val wd = spark.read.parquet(s"$work/wd")
    assert(intercept[Crash] {
      Consent.withdraw(spark, consent, wd, "training", 2L,
        stateDir = Some(state),
        failpoint = at => if (at == "registry-updated") throw Crash(at))
    }.at == "registry-updated")
    // the gap's invariant: admission already stopped (registry-first),
    // serving not yet masked — the heal is replaying the SAME request
    assert(Consent.gate(spark, consent,
      spark.read.parquet(s"$state/corpus"), "training")
      .join(wd, Seq("doc_id"), "left_semi").isEmpty,
      "the registry leg landed: the gate must already refuse")
    Consent.withdraw(spark, consent, wd, "training", 2L,
      stateDir = Some(state))
    // replay converged: one registry version, serving masked
    assert(graft.pipeline.Snapshot.loadStore(spark, consent)
      .filter(col("updated_at") === 2L).count() == wd.count(),
      "redelivered events must not duplicate versions")
    assert(DeletionVectors.maskServing(spark, state,
      spark.read.parquet(s"$state/corpus"))
      .join(wd, Seq("doc_id"), "left_semi").isEmpty)
  }

  test("a redelivered withdrawal event is one version, not two") {
    val dir = tmp("redeliver")
    Consent.init(spark, dir, events(Seq(9L), "training", granted = true, 1L))
    Consent.withdraw(spark, dir, Seq(9L).toDF("subject_id"), "training", 2L)
    Consent.withdraw(spark, dir, Seq(9L).toDF("subject_id"), "training", 2L)
    assert(Snapshot.loadStore(spark, dir).count() == 2,
      "same-key same-timestamp redelivery must keep one version")
    assert(Consent.grantedSubjects(spark, dir, "training").isEmpty)
  }

  test("streaming consent events: the sink merges the registry and masks withdrawals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingPipeline
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val work = tmp("sink")
    val state = s"$work/state"
    val consent = s"$work/consent"
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .limit(120).write.parquet(s"$work/b0")
    assert(CurateCli.runIncremental(
      spark, s"$work/b0", state, nShards = 2).auditOk)
    val ids = spark.read.parquet(s"$state/corpus")
      .select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0))
    Consent.init(spark, consent, events(ids.toSeq, "training", granted = true, 1L))

    // (subject_id, purpose, granted, updated_at)
    val input = MemoryStream[(Long, String, Boolean, Long)]
    val stream = input.toDF()
      .toDF("subject_id", "purpose", "granted", "updated_at")
    val withdrawn = ids.take(5).toSeq
    input.addData(withdrawn.map(id => (id, "training", false, 2L)): _*)
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt",
      stateDir = Some(state)).awaitTermination()
    // a second batch: one re-grant, one fresh withdrawal
    input.addData((withdrawn.head, "training", true, 3L),
      (ids(10), "training", false, 3L))
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt",
      stateDir = Some(state)).awaitTermination()

    val granted = Consent.grantedSubjects(spark, consent, "training")
      .collect().map(_.getLong(0)).toSet
    assert(!granted.contains(ids(10)))
    assert(withdrawn.tail.forall(!granted.contains(_)))
    assert(granted.contains(withdrawn.head), "the re-grant must win")
    // the withdrawals' vectors mask serving (the re-granted subject
    // stays masked until its vector settles — the documented
    // re-admission contract: settle, then re-admit)
    val served = DeletionVectors.maskServing(spark, state,
      spark.read.parquet(s"$state/corpus"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(withdrawn.tail.forall(!served.contains(_)))
    assert(!served.contains(ids(10)))
  }

  test("simultaneous conflicting events resolve deny-wins; null-field events are dropped") {
    val dir = tmp("conflict")
    Consent.init(spark, dir, events(Seq(1L, 2L), "training", granted = true, 1L))
    // one batch carries BOTH verdicts for subject 1 at ts 2 — the
    // strict reading denies; subject 2's clean grant rides along
    val conflicted = Seq(
      (1L, "training", true, 2L),
      (1L, "training", false, 2L),
      (2L, "training", true, 2L)).toDF(
      "subject_id", "purpose", "granted", "updated_at")
    Consent.update(spark, dir, conflicted)
    val granted = Consent.grantedSubjects(spark, dir, "training")
      .collect().map(_.getLong(0)).toSet
    assert(granted == Set(2L), "the simultaneous conflict must deny")
    // null-field events never reach the registry
    val dirty = Seq(
      (Some(3L), Some("training"), Some(true), Some(3L)),
      (None, Some("training"), Some(true), Some(3L)),
      (Some(4L), Some("training"), None, Some(3L))).toDF(
      "subject_id", "purpose", "granted", "updated_at")
    Consent.update(spark, dir, dirty)
    val cur = Consent.currentState(spark, dir)
    assert(cur.filter(col("subject_id").isNull).isEmpty)
    assert(cur.filter(col("subject_id") === 4L).isEmpty)
    assert(Consent.grantedSubjects(spark, dir, "training")
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("the snapshot-store auditor reaches the registry") {
    val dir = tmp("fsck")
    Consent.init(spark, dir,
      events(Seq(1L, 2L, 3L, 4L), "training", granted = true, 1L))
    Consent.update(spark, dir, events(Seq(2L, 4L), "training", granted = false, 2L))
    val checks = graft.operators.Fsck.snapshotStore(spark, dir, "consent_key")
    assert(checks.nonEmpty && checks.forall(_.ok),
      checks.filterNot(_.ok).mkString("; "))
  }
}
