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

  test("withdrawal stops serving for its purpose NOW; a global erase purges physically at settle") {
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
    // immediate: the gate refuses them AND serves for this purpose (and
    // un-scoped serves, which subtract everything) hide them
    val gated = Consent.gate(spark, consent,
      spark.read.parquet(s"$state/corpus"), "training")
    assert(gated.join(wd, Seq("doc_id"), "left_semi").isEmpty)
    val served = DeletionVectors.maskServing(spark, state,
      spark.read.parquet(s"$state/corpus"), purpose = Some("training"))
    assert(served.join(wd, Seq("doc_id"), "left_semi").isEmpty)
    assert(DeletionVectors.maskServing(spark, state,
      spark.read.parquet(s"$state/corpus"))
      .join(wd, Seq("doc_id"), "left_semi").isEmpty)
    // a withdrawal is NOT an erasure request: settle has nothing global
    // to sweep, the rows stay physically present
    assert(CurateCli.runEraseSettle(spark, state).isEmpty)
    assert(!spark.read.parquet(s"$state/corpus")
      .join(wd, Seq("doc_id"), "left_semi").isEmpty)
    // the subject leaves the platform: an Art. 17 global erase files,
    // settle purges the rows AND retires the purpose mask for them
    CurateCli.runEraseLogical(spark, s"$work/withdraw_ids", state)
    CurateCli.runEraseSettle(spark, state)
    assert(spark.read.parquet(s"$state/corpus")
      .join(wd, Seq("doc_id"), "left_semi").isEmpty)
    assert(DeletionVectors.pending(spark, state)._1 == 0)
    assert(DeletionVectors.pendingPurposeMasks(spark, state).isEmpty,
      "the physical purge must retire the purpose mask for purged ids too")
    // the registry still demonstrates the withdrawal
    assert(Consent.grantedSubjects(spark, consent, "training")
      .join(wd.withColumnRenamed("doc_id", "subject_id"),
        Seq("subject_id"), "left_semi").isEmpty)
  }

  test("purpose-scoped masking: withdrawing one purpose keeps the others serving; re-grant unmasks") {
    val work = tmp("purpose")
    val state = s"$work/state"
    val consent = s"$work/consent"
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source")).limit(300)
    corpus.write.parquet(s"$work/corpus")
    val all = spark.read.parquet(s"$work/corpus")
    val subs = all.select(col("doc_id").as("subject_id"))
    Consent.init(spark, consent,
      subs.withColumn("purpose", lit("training"))
        .withColumn("granted", lit(true)).withColumn("updated_at", lit(1L))
        .unionByName(subs.withColumn("purpose", lit("analytics"))
          .withColumn("granted", lit(true)).withColumn("updated_at", lit(1L))))
    val wd = all.filter(col("doc_id") % 5 === 0).select(col("doc_id"))
    Consent.withdraw(spark, consent, wd, "training", 2L,
      stateDir = Some(state))
    // training serves masked; analytics serves EVERYTHING; an un-scoped
    // serve over-masks (the safe direction)
    assert(DeletionVectors.maskServing(spark, state, all,
      purpose = Some("training"))
      .join(wd, Seq("doc_id"), "left_semi").isEmpty)
    assert(DeletionVectors.maskServing(spark, state, all,
      purpose = Some("analytics")).count() == all.count())
    assert(DeletionVectors.maskServing(spark, state, all).count() ==
      all.count() - wd.count())
    // the gate agrees per purpose
    assert(Consent.gate(spark, consent, all, "training")
      .join(wd, Seq("doc_id"), "left_semi").isEmpty)
    assert(Consent.gate(spark, consent, all, "analytics").count() ==
      all.count())
    // purpose masks are NOT settle debt: nothing is pending globally
    assert(DeletionVectors.pending(spark, state)._1 == 0)
    val census = DeletionVectors.pendingPurposeMasks(spark, state)
    assert(census == Seq(("training", 1, wd.count())))
    // re-grant unmasks training WITHOUT touching analytics' state, and
    // the registry keeps the full chain
    Consent.grant(spark, consent, wd, "training", 3L, stateDir = Some(state))
    assert(DeletionVectors.maskServing(spark, state, all,
      purpose = Some("training")).count() == all.count())
    assert(DeletionVectors.pendingPurposeMasks(spark, state).isEmpty)
    assert(Consent.gate(spark, consent, all, "training").count() == all.count())
    assert(Snapshot.loadStore(spark, consent)
      .filter(col("purpose") === "training").count() ==
      all.count() + 2 * wd.count(),
      "grant -> withdraw -> re-grant must keep three versions for the cycled subjects")
    // a GLOBAL (Art. 17) vector masks every purpose regardless of grants
    val erased = all.filter(col("doc_id") % 7 === 1).select(col("doc_id"))
    DeletionVectors.append(spark, state, erased)
    Seq(Some("training"), Some("analytics"), None).foreach { scope =>
      assert(DeletionVectors.maskServing(spark, state, all, purpose = scope)
        .join(erased, Seq("doc_id"), "left_semi").isEmpty,
        s"global vector must mask scope $scope")
    }
  }

  test("subject-keyed withdrawal resolves to the owned documents through the mapping") {
    val work = tmp("mapping")
    val state = s"$work/state"
    val consent = s"$work/consent"
    // 40 documents owned by 8 subjects (5 docs each)
    val mapping = (0L until 40L).map(d => (d % 8L, d))
      .toDF("subject_id", "doc_id")
    val corpus = mapping.select(col("doc_id"))
    Consent.init(spark, consent,
      mapping.select(col("subject_id")).distinct()
        .withColumn("purpose", lit("training"))
        .withColumn("granted", lit(true)).withColumn("updated_at", lit(1L)))
    Consent.withdraw(spark, consent, Seq(3L, 5L).toDF("subject_id"),
      "training", 2L, stateDir = Some(state), mapping = Some(mapping))
    val served = DeletionVectors.maskServing(spark, state, corpus,
      purpose = Some("training")).collect().map(_.getLong(0)).toSet
    assert(served == (0L until 40L).filterNot(d => d % 8 == 3 || d % 8 == 5).toSet,
      "every document the withdrawing subjects own must mask")
    // re-grant through the same mapping unmasks all owned docs
    Consent.grant(spark, consent, Seq(3L).toDF("subject_id"), "training",
      3L, stateDir = Some(state), mapping = Some(mapping))
    val after = DeletionVectors.maskServing(spark, state, corpus,
      purpose = Some("training")).collect().map(_.getLong(0)).toSet
    assert(after == (0L until 40L).filterNot(d => d % 8 == 5).toSet)
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
    // the withdrawals' purpose vectors mask serving; the re-grant
    // retired its subject from the purpose tree, so it serves again
    val served = DeletionVectors.maskServing(spark, state,
      spark.read.parquet(s"$state/corpus"), purpose = Some("training"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(withdrawn.tail.forall(!served.contains(_)))
    assert(!served.contains(ids(10)))
    assert(served.contains(withdrawn.head),
      "the re-granted subject must serve for the re-granted purpose")
    // nothing global is pending: withdrawals are not erasure requests
    assert(DeletionVectors.pending(spark, state)._1 == 0)
  }

  test("a conflicting same-timestamp verdict across batches resolves deny-wins, either order") {
    // ADVICE r10: a grant and a withdrawal carrying the same updated_at
    // arriving in DIFFERENT batches used to resolve by arrival order via
    // the SCD-2 same-key-same-timestamp dedup; the merge tiebreak makes
    // deny win deterministically in both orders
    val dir1 = tmp("xbatch1")
    Consent.init(spark, dir1, events(Seq(1L), "training", granted = true, 1L))
    Consent.update(spark, dir1, events(Seq(1L), "training", granted = true, 2L))
    Consent.update(spark, dir1, events(Seq(1L), "training", granted = false, 2L))
    assert(Consent.grantedSubjects(spark, dir1, "training").isEmpty,
      "a late deny must demote the stored same-timestamp grant")
    val dir2 = tmp("xbatch2")
    Consent.init(spark, dir2, events(Seq(1L), "training", granted = true, 1L))
    Consent.update(spark, dir2, events(Seq(1L), "training", granted = false, 2L))
    Consent.update(spark, dir2, events(Seq(1L), "training", granted = true, 2L))
    assert(Consent.grantedSubjects(spark, dir2, "training").isEmpty,
      "a late grant must lose to the stored same-timestamp deny")
    // one version per (key, ts) either way, and the ts-1 grant history survives
    Seq(dir1, dir2).foreach { d =>
      val store = Snapshot.loadStore(spark, d)
      assert(store.count() == 2, s"$d must hold exactly ts-1 and ts-2 versions")
      assert(Snapshot.asOf(store, lit(1L)).head().getAs[Boolean]("granted"))
    }
  }

  test("a same-timestamp conflict ends denied AND masked in both orders (vector side)") {
    // VERDICT r11: the vector legs used to follow arrival order while the
    // registry followed deny-wins — withdraw(ts)+grant(ts) left the
    // registry denied but serving UNMASKED (the over-serving direction).
    // syncVectors derives the mask from the post-merge verdict, so both
    // surfaces land on the same side in either order.
    val corpus = Seq(1L, 2L, 3L).toDF("doc_id")
    def servedIn(state: String): Set[Long] =
      DeletionVectors.maskServing(spark, state, corpus,
        purpose = Some("training"))
        .collect().map(_.getLong(0)).toSet
    // order A: withdraw then same-ts grant
    val workA = tmp("vconflictA")
    Consent.init(spark, s"$workA/consent",
      events(Seq(1L, 2L, 3L), "training", granted = true, 1L))
    Consent.withdraw(spark, s"$workA/consent", Seq(1L).toDF("subject_id"),
      "training", updatedAt = 5L, stateDir = Some(s"$workA/state"))
    Consent.grant(spark, s"$workA/consent", Seq(1L).toDF("subject_id"),
      "training", updatedAt = 5L, stateDir = Some(s"$workA/state"))
    assert(!Consent.grantedSubjects(spark, s"$workA/consent", "training")
      .collect().map(_.getLong(0)).contains(1L), "registry must deny")
    assert(servedIn(s"$workA/state") == Set(2L, 3L),
      "a subject the registry denies must stay masked (order A)")
    // order B: grant then same-ts withdraw
    val workB = tmp("vconflictB")
    Consent.init(spark, s"$workB/consent",
      events(Seq(1L, 2L, 3L), "training", granted = true, 1L))
    Consent.grant(spark, s"$workB/consent", Seq(1L).toDF("subject_id"),
      "training", updatedAt = 5L, stateDir = Some(s"$workB/state"))
    Consent.withdraw(spark, s"$workB/consent", Seq(1L).toDF("subject_id"),
      "training", updatedAt = 5L, stateDir = Some(s"$workB/state"))
    assert(servedIn(s"$workB/state") == Set(2L, 3L),
      "a subject the registry denies must stay masked (order B)")
  }

  test("backdated events follow the merge, not arrival: a stale grant cannot unmask, a stale withdrawal cannot mask") {
    val corpus = Seq(1L, 2L).toDF("doc_id")
    def servedIn(state: String): Set[Long] =
      DeletionVectors.maskServing(spark, state, corpus,
        purpose = Some("training"))
        .collect().map(_.getLong(0)).toSet
    // a grant whose updated_at is OLDER than the stored withdrawal loses
    // the merge — the registry stays denied and serving stays masked
    val workA = tmp("backdatedA")
    Consent.init(spark, s"$workA/consent",
      events(Seq(1L, 2L), "training", granted = true, 1L))
    Consent.withdraw(spark, s"$workA/consent", Seq(1L).toDF("subject_id"),
      "training", updatedAt = 5L, stateDir = Some(s"$workA/state"))
    Consent.grant(spark, s"$workA/consent", Seq(1L).toDF("subject_id"),
      "training", updatedAt = 3L, stateDir = Some(s"$workA/state"))
    assert(!Consent.grantedSubjects(spark, s"$workA/consent", "training")
      .collect().map(_.getLong(0)).contains(1L))
    assert(servedIn(s"$workA/state") == Set(2L),
      "a backdated grant must not retire the standing mask")
    // a withdrawal backdated behind a stored NEWER grant loses the merge
    // — the registry stays granted and no mask may land
    val workB = tmp("backdatedB")
    Consent.init(spark, s"$workB/consent",
      events(Seq(1L, 2L), "training", granted = true, 5L))
    Consent.withdraw(spark, s"$workB/consent", Seq(1L).toDF("subject_id"),
      "training", updatedAt = 3L, stateDir = Some(s"$workB/state"))
    assert(Consent.grantedSubjects(spark, s"$workB/consent", "training")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(servedIn(s"$workB/state") == Set(1L, 2L),
      "a backdated withdrawal must not mask a subject the registry grants")
  }

  test("the streaming sink's vector legs follow the post-merge verdict under intra-batch conflicts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingPipeline
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val work = tmp("sinkconflict")
    val consent = s"$work/consent"
    val state = s"$work/state"
    val corpus = Seq(1L, 2L, 3L).toDF("doc_id")
    val input = MemoryStream[(Long, String, Boolean, Long)]
    val stream = input.toDF()
      .toDF("subject_id", "purpose", "granted", "updated_at")
    // one batch carries: s1 grant(ts5)+withdraw(ts9) — the withdrawal is
    // NEWER and must win even though the raw-split order appended
    // withdrawals first; s2 withdraw(ts5)+grant(ts9) — the grant wins;
    // s3 both verdicts at ts5 — deny-wins
    input.addData(
      (1L, "training", true, 5L), (1L, "training", false, 9L),
      (2L, "training", false, 5L), (2L, "training", true, 9L),
      (3L, "training", true, 5L), (3L, "training", false, 5L))
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt",
      stateDir = Some(state)).awaitTermination()
    val granted = Consent.grantedSubjects(spark, consent, "training")
      .collect().map(_.getLong(0)).toSet
    assert(granted == Set(2L))
    val served = DeletionVectors.maskServing(spark, state, corpus,
      purpose = Some("training"))
      .collect().map(_.getLong(0)).toSet
    assert(served == Set(2L),
      "serving must mask exactly the subjects the registry denies")
    // a later batch carrying a BACKDATED grant for s1 changes nothing on
    // either surface
    input.addData((1L, "training", true, 2L))
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt",
      stateDir = Some(state)).awaitTermination()
    assert(Consent.grantedSubjects(spark, consent, "training")
      .collect().map(_.getLong(0)).toSet == Set(2L))
    assert(DeletionVectors.maskServing(spark, state, corpus,
      purpose = Some("training"))
      .collect().map(_.getLong(0)).toSet == Set(2L),
      "a late backdated grant must not retire the standing mask")
  }

  test("an invalid purpose is refused before any state mutates") {
    // ADVICE r11: validation lived only at the vector leg, AFTER the
    // registry merge — "ad tracking" recorded the withdrawal, then threw
    // on the mask, and every replay failed the same way (a permanently
    // poisoned request with serving never masked). Registry admission
    // now refuses first.
    val work = tmp("badslug")
    val consent = s"$work/consent"
    intercept[IllegalArgumentException] {
      Consent.init(spark, consent,
        events(Seq(1L), "ad tracking", granted = true, 1L))
    }
    Consent.init(spark, consent, events(Seq(1L), "ads", granted = true, 1L))
    intercept[IllegalArgumentException] {
      Consent.withdraw(spark, consent, Seq(1L).toDF("subject_id"),
        "ad tracking", updatedAt = 2L, stateDir = Some(s"$work/state"))
    }
    intercept[IllegalArgumentException] {
      Consent.update(spark, consent,
        events(Seq(1L), "a=b", granted = false, 2L))
    }
    intercept[IllegalArgumentException] {
      Consent.gate(spark, consent, Seq(1L).toDF("doc_id"), "ad tracking")
    }
    // nothing mutated: the registry still holds exactly the clean grant
    val cur = Consent.currentState(spark, consent).collect()
    assert(cur.length == 1 && cur.head.getAs[String]("purpose") == "ads" &&
      cur.head.getAs[Boolean]("granted"))
    assert(DeletionVectors.pendingPurposeMasks(spark, s"$work/state").isEmpty)
  }

  test("a missing registry bootstraps on the first update instead of crashing") {
    val dir = s"${tmp("boot")}/never-inited"
    Consent.update(spark, dir, events(Seq(1L, 2L), "training", granted = true, 1L))
    Consent.update(spark, dir, events(Seq(2L), "training", granted = false, 2L))
    assert(Consent.grantedSubjects(spark, dir, "training")
      .collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("retroAudit reports admissions that lacked then-current consent (Art. 7(1))") {
    val dir = tmp("retro")
    // s1 granted at ts 2 (lawful from 2); s2 granted only at ts 10;
    // s3 granted at 2 then withdrawn at 6; s4 never registered
    Consent.init(spark, dir,
      events(Seq(1L, 3L), "training", granted = true, 2L))
    Consent.update(spark, dir, events(Seq(3L), "training", granted = false, 6L))
    Consent.update(spark, dir, events(Seq(2L), "training", granted = true, 10L))
    val admissions = Seq(
      (101L, 1L, 8L), // lawful: s1 granted since 2
      (102L, 2L, 8L), // violation: s2's grant came later
      (103L, 3L, 8L), // violation: s3 withdrawn at 6
      (104L, 3L, 4L), // lawful: admitted inside s3's grant window
      (105L, 4L, 8L)  // violation: absence is denial
    ).toDF("doc_id", "subject_id", "admitted_at")
    val bad = Consent.retroAudit(spark, dir, admissions, "training")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(bad == Set(102L, 103L, 105L))
    // a missing registry: nothing was ever lawful, everything returns
    assert(Consent.retroAudit(spark, s"${tmp("retro2")}/missing",
      admissions, "training").count() == admissions.count())
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

  test("consent-gated admission: denied subjects never land; the admission log feeds the Art. 7(1) audit") {
    val work = tmp("admit")
    val state = s"$work/state"
    val consent = s"$work/consent"
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("source"), col("lang"), col("text"))
      .limit(200).write.parquet(s"$work/b0")
    val input = spark.read.parquet(s"$work/b0")
    val granted = input.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    Consent.init(spark, consent,
      events(granted.toSeq, "training", granted = true, 5L))
    val s0 = CurateCli.runIncremental(spark, s"$work/b0", state,
      nShards = 2, consent = Some(CurateCli.ConsentGateCfg(
        consent, "training", admittedAt = Some(8L))))
    assert(s0.auditOk)
    assert(s0.nConsentDenied == input.count() - granted.size,
      "every non-granted subject must be refused at the gate")
    val landed = spark.read.parquet(s"$state/corpus")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(landed.subsetOf(granted),
      "denied subjects must never reach the corpus")
    // the admission log records what landed, stamped with the pinned now
    val log = spark.read.parquet(s"$state/.admissions")
    assert(log.count() == landed.size &&
      log.filter(col("admitted_at") =!= 8L).isEmpty &&
      log.filter(col("purpose") =!= "training").isEmpty)
    // lawful at admission: the audit is clean
    val a0 = CurateCli.runConsentAudit(spark, state, consent, "training",
      s"$work/rep0")
    assert(a0.nAdmissions == landed.size && a0.nViolations == 0)
    // a BACKDATED withdrawal (effective ts 6, before the ts-8 admission)
    // makes those admissions retroactively unlawful — the audit finds
    // exactly them
    val backdated = landed.toSeq.sorted.take(7)
    Consent.update(spark, consent,
      events(backdated, "training", granted = false, 6L))
    val a1 = CurateCli.runConsentAudit(spark, state, consent, "training",
      s"$work/rep1")
    assert(a1.nViolations == backdated.size,
      s"expected ${backdated.size} retroactive violations, got ${a1.nViolations}")
    val flagged = spark.read.parquet(s"$work/rep1/violations")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(flagged == backdated.toSet)
    // a mid-run writer lease on the registry refuses the gate's MUTATING
    // siblings but never the read-only audit
    assert(CurateCli.runConsentAudit(spark, state, consent, "training",
      s"$work/rep2").nViolations == backdated.size)
  }

  test("streaming admission is consent-gated and logged: the Art. 7(1) audit covers stream-admitted documents") {
    // VERDICT r11: batch admission got the gate + admission log, but a
    // corpus admitted through the streaming index sinks never passed
    // Consent.gate and left no admission rows — retroAudit/consent-audit
    // were blind to stream-admitted documents.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingPipeline
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val work = tmp("streamgate")
    val consent = s"$work/consent"
    val idx = s"$work/search"
    // s1: granted since ts 2 (lawful at admission); s2: granted only at
    // ts 10 (AFTER the pinned admission stamp 8 — current state admits,
    // the retro audit must flag); s3: withdrawn at ts 5 (gate refuses);
    // s4: never registered (gate refuses)
    Consent.init(spark, consent, Seq(
      (1L, "training", true, 2L),
      (2L, "training", true, 10L),
      (3L, "training", true, 2L)).toDF(
      "subject_id", "purpose", "granted", "updated_at"))
    Consent.update(spark, consent,
      events(Seq(3L), "training", granted = false, 5L))
    val cfg = CurateCli.ConsentGateCfg(consent, "training",
      admittedAt = Some(8L))
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    input.addData((1L, "alpha beta"), (2L, "beta gamma"),
      (3L, "gamma delta"), (4L, "delta epsilon"))
    StreamingPipeline.searchIndexSink(stream, idx, s"$work/ckpt",
      consent = Some(cfg)).awaitTermination()
    // the gate refused s3 and s4 before the index saw them
    val (_, stats) = graft.text.Bm25.loadSearchIndex(spark, idx)
    assert(stats.head().getAs[Double]("_n_docs") == 2.0)
    // the admission log holds exactly the admitted documents at the
    // pinned stamp
    val adm = spark.read.parquet(s"$idx/.admissions")
      .select(col("doc_id"), col("purpose"), col("admitted_at"))
    assert(adm.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2))).toSet == Set((1L, "training", 8L), (2L, "training", 8L)))
    // the consent-audit verb reads the same log: s2's grant was not yet
    // valid at the admission stamp — one violation
    val summary = CurateCli.runConsentAudit(spark, idx, consent,
      "training", s"$work/report")
    assert(summary.nAdmissions == 2L && summary.nViolations == 1L)
    assert(spark.read.parquet(s"$work/report/violations")
      .collect().map(_.getLong(0)).toSet == Set(2L))
    // a second epoch appends under the same contract, and a fully-denied
    // epoch commits only its marker (no bootstrap, no admission rows)
    input.addData((5L, "epsilon zeta"))
    StreamingPipeline.searchIndexSink(stream, idx, s"$work/ckpt",
      consent = Some(cfg)).awaitTermination()
    val (_, stats2) = graft.text.Bm25.loadSearchIndex(spark, idx)
    assert(stats2.head().getAs[Double]("_n_docs") == 2.0,
      "an unregistered subject's epoch must admit nothing")
    assert(CurateCli.runConsentAudit(spark, idx, consent,
      "training", s"$work/report2").nAdmissions == 2L)
  }

  test("Art. 15 access discloses the consent history and the purpose masks in force") {
    val work = tmp("accessconsent")
    val consent = s"$work/consent"
    val state = s"$work/state"
    Consent.init(spark, consent, Seq(
      (1L, "training", true, 1L),
      (1L, "ads", true, 1L),
      (2L, "training", true, 1L)).toDF(
      "subject_id", "purpose", "granted", "updated_at"))
    // subject 1 withdraws training (a purpose mask lands); subject 2
    // files a plain Art. 17 erasure (a global vector)
    Consent.withdraw(spark, consent, Seq(1L).toDF("subject_id"),
      "training", updatedAt = 5L, stateDir = Some(state))
    DeletionVectors.append(spark, state, Seq(2L).toDF("doc_id"))
    Seq(1L, 2L).toDF("doc_id").write.parquet(s"$work/keys")
    val s1 = CurateCli.runAccess(spark, s"$work/keys", state,
      s"$work/report", consentDir = Some(consent))
    // full history: subject 1 has training v1+v2 and ads v1; subject 2
    // has training v1 — four rows, including the superseded grant (the
    // Art. 7(1) demonstration is about the past)
    assert(s1.nConsentRows == 4L)
    assert(s1.nPurposeMasked == 1L, "the training withdrawal in force")
    assert(s1.nMaskedPending == 1L, "the global erasure pending")
    val hist = spark.read.parquet(s"$work/report/consent_state")
    assert(hist.filter(col("subject_id") === 1L &&
      col("purpose") === "training").count() == 2L)
    assert(hist.filter(col("subject_id") === 1L &&
      col("purpose") === "training" && !col("granted") &&
      col("valid_to").isNull).count() == 1L,
      "the current training verdict for subject 1 must be the withdrawal")
    val pm = spark.read.parquet(s"$work/report/purpose_masks")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(pm == Map("training" -> 1L))
    // without a registry dir: plain report, zero consent fields
    val s2 = CurateCli.runAccess(spark, s"$work/keys", state,
      s"$work/report2")
    assert(s2.nConsentRows == 0L && s2.nPurposeMasked == 0L)
    // a missing registry discloses an empty history, not a crash
    val s3 = CurateCli.runAccess(spark, s"$work/keys", state,
      s"$work/report3", consentDir = Some(s"$work/never-inited"))
    assert(s3.nConsentRows == 0L)
    // by-subject: the disclosure keys on the PERSON, resolved docs on
    // the stores
    Seq((1L, 11L), (1L, 12L), (2L, 21L)).toDF("subject_id", "doc_id")
      .write.parquet(s"$work/mapping")
    Seq(1L).toDF("subject_id").write.parquet(s"$work/subjects")
    val s4 = CurateCli.runAccessBySubject(spark, s"$work/subjects",
      s"$work/mapping", state, s"$work/report4",
      consentDir = Some(consent))
    assert(s4.nKeys == 2L, "subject 1 owns two documents")
    assert(s4.nConsentRows == 3L,
      "the consent history must be the PERSON's rows (training v1+v2, ads)")
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

  test("the streaming sink quarantines invalid-purpose events instead of wedging the stream") {
    // ADVICE r12: Consent.update fail-stops on a non-slug purpose, which
    // is right for the batch verbs but wedges a streaming sink forever —
    // every replay of the poisoned micro-batch re-throws. The sink splits
    // those events to a durable dead-letter capture and processes the rest.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingPipeline
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val work = tmp("deadletter")
    val consent = s"$work/consent"
    val input = MemoryStream[(Long, String, Boolean, Long)]
    val stream = input.toDF()
      .toDF("subject_id", "purpose", "granted", "updated_at")
    input.addData((1L, "training", true, 1L), (2L, "bad purpose", true, 1L),
      (3L, "training", false, 1L))
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt")
      .awaitTermination()
    // the valid events reached the registry; the poisoned one did not
    val granted = Consent.grantedSubjects(spark, consent, "training")
      .collect().map(_.getLong(0)).toSet
    assert(granted == Set(1L))
    assert(Consent.currentState(spark, consent)
      .filter(col("subject_id") === 2L).isEmpty,
      "a quarantined event must not reach the registry")
    // ... it landed in the dead-letter capture instead — a SIBLING of
    // the store root, so the registry bootstrap's whole-directory
    // overwrite (this was the first batch!) cannot have deleted it —
    // and the census flags the owed triage
    val dl = spark.read.parquet(s"$consent.dead-letter")
    assert(dl.count() == 1 &&
      dl.head().getAs[Long]("subject_id") == 2L &&
      dl.head().getAs[String]("purpose") == "bad purpose")
    val cc = graft.operators.Fsck.consentCensus(spark, consent)
    assert(cc.exists(c => c.check == "dead_letter" && !c.ok),
      "quarantined events are owed a triage — the census must fail the check")
    // the stream is NOT wedged: later batches process normally, including
    // an ALL-poisoned one (which must not touch the registry at all)
    input.addData((4L, "training", true, 2L))
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt")
      .awaitTermination()
    input.addData((9L, "also=bad", true, 3L))
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt")
      .awaitTermination()
    assert(Consent.grantedSubjects(spark, consent, "training")
      .collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(spark.read.parquet(s"$consent.dead-letter").count() == 2)
    // a clean registry censuses ok: no dead-letter tree, no failed check
    val clean = tmp("dl_clean")
    Consent.init(spark, clean, events(Seq(1L), "training", granted = true, 1L))
    assert(graft.operators.Fsck.consentCensus(spark, clean)
      .forall(c => c.ok && c.check == "version_bulk"))
  }

  test("dead-letter triage: resubmit under a purpose correction, purge the rest, census clean after") {
    // The quarantine (round 13) made the census FAIL while rows are owed
    // triage — a stance that needs its mechanism: resubmitDeadLetter
    // carries a corrected indication into the registry (Art. 7(1): the
    // indication happened; a malformed purpose string must not erase
    // it), purgeDeadLetter is the deliberate drop. Nothing expires the
    // quarantine silently.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingPipeline
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val work = tmp("dltriage")
    val consent = s"$work/consent"
    val state = s"$work/state"
    val input = MemoryStream[(Long, String, Boolean, Long)]
    val stream = input.toDF()
      .toDF("subject_id", "purpose", "granted", "updated_at")
    // batch 0: one valid grant, one poisoned WITHDRAWAL (the case where
    // a missed resubmit over-serves a subject who opted out)
    input.addData((1L, "training", true, 1L), (5L, "bad purpose", false, 2L))
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt",
      stateDir = Some(state)).awaitTermination()
    // batch 1: spam traffic, to be purged deliberately
    input.addData((9L, "also=bad", true, 3L))
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt",
      stateDir = Some(state)).awaitTermination()
    val dl = Consent.deadLetter(spark, consent)
    assert(dl.count() == 2L)
    assert(dl.select("batch").distinct().collect()
      .map(_.getLong(0)).toSet == Set(0L, 1L))
    // an incomplete or still-invalid remap refuses BEFORE any mutation
    intercept[IllegalArgumentException] {
      Consent.resubmitDeadLetter(spark, consent, batch = 0L,
        remap = Map("bad purpose" -> "still bad"))
    }
    assert(Consent.deadLetter(spark, consent).count() == 2L,
      "a refused resubmit must leave the quarantine untouched")
    assert(Consent.currentState(spark, consent)
      .filter(col("subject_id") === 5L).isEmpty)
    // resubmit batch 0 corrected: subject 5's withdrawal reaches the
    // registry AND (post-merge sync) the purpose mask lands, exactly as
    // if it had never been quarantined
    val n = Consent.resubmitDeadLetter(spark, consent, batch = 0L,
      remap = Map("bad purpose" -> "training"), stateDir = Some(state))
    assert(n == 1L,
      s"exactly the quarantined event of the batch resubmits (the valid " +
        s"grant processed at sink time), got $n")
    val st5 = Consent.currentState(spark, consent)
      .filter(col("subject_id") === 5L).collect()
    assert(st5.length == 1 && !st5.head.getAs[Boolean]("granted"),
      "the corrected withdrawal must reach the registry")
    val masked = DeletionVectors
      .pendingPurposeMasks(spark, state)
      .find(_._1 == "training")
    assert(masked.exists(_._3 >= 1L),
      s"the corrected withdrawal must mask subject 5 for training: $masked")
    // the resubmitted batch dir is gone; batch 1 still owes triage
    val afterResubmit = Consent.deadLetter(spark, consent)
    assert(afterResubmit.count() == 1L &&
      afterResubmit.head().getAs[Long]("batch") == 1L)
    assert(graft.operators.Fsck.consentCensus(spark, consent)
      .exists(c => c.check == "dead_letter" && !c.ok))
    // resubmitting an unknown batch refuses loudly
    intercept[IllegalArgumentException] {
      Consent.resubmitDeadLetter(spark, consent, batch = 7L, remap = Map.empty)
    }
    // deliberate purge of the spam batch: quarantine empty, the tree
    // itself gone, census carries no dead-letter row at all
    assert(Consent.purgeDeadLetter(spark, consent, Some(1L)) == 1)
    assert(Consent.deadLetter(spark, consent).isEmpty)
    assert(!new org.apache.hadoop.fs.Path(s"$consent.dead-letter")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$consent.dead-letter")))
    assert(graft.operators.Fsck.consentCensus(spark, consent)
      .forall(c => c.ok && c.check == "version_bulk"))
    // triage verbs hold the registry lease: a live foreign writer refuses
    input.addData((11L, "bad again", true, 4L))
    StreamingPipeline.consentSink(stream, consent, s"$work/ckpt",
      stateDir = Some(state)).awaitTermination()
    val lout = new org.apache.hadoop.fs.Path(consent)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(new org.apache.hadoop.fs.Path(s"$consent/.lease"), true)
    lout.write(s"other|consent-update|${System.currentTimeMillis()}"
      .getBytes("UTF-8"))
    lout.close()
    intercept[IllegalStateException] {
      Consent.purgeDeadLetter(spark, consent, None)
    }
    intercept[IllegalStateException] {
      Consent.resubmitDeadLetter(spark, consent, batch = 2L,
        remap = Map("bad again" -> "training"))
    }
  }

  test("the CLI remap argument splits on the LAST '=' — a bad purpose may itself contain one") {
    assert(CurateCli.parseRemap("bad purpose=training") ==
      Map("bad purpose" -> "training"))
    assert(CurateCli.parseRemap("also=bad=training,x y=ads") ==
      Map("also=bad" -> "training", "x y" -> "ads"))
    intercept[IllegalArgumentException] { CurateCli.parseRemap("noseparator") }
    intercept[IllegalArgumentException] { CurateCli.parseRemap("=training") }
    intercept[IllegalArgumentException] { CurateCli.parseRemap("bad=") }
  }

  test("consent-expire drops aged superseded versions; verdicts and younger demonstrations unchanged") {
    // VERDICT r12 ask #4: superseded versions are the Art. 7(1) record,
    // but past the controller's record-retention period they need the
    // same mechanism the admission log got — current rows never touched,
    // so the registry's verdict cannot change by construction.
    val dir = tmp("expire")
    Consent.init(spark, dir, events(Seq(1L, 2L, 3L), "training", granted = true, 1L))
    Consent.update(spark, dir, events(Seq(1L, 2L), "training", granted = false, 5L))
    Consent.update(spark, dir, events(Seq(1L), "training", granted = true, 9L))
    // chains: s1 (1->5, 5->9, 9->null), s2 (1->5, 5->null), s3 (1->null)
    val before = Consent.currentState(spark, dir)
      .orderBy(col("subject_id")).collect()
        .map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    assert(Snapshot.loadStore(spark, dir).count() == 6)
    val dropped = Consent.expireVersions(spark, dir, cutoffMs = 6L)
    assert(dropped == 2L, "exactly the two versions with valid_to 5 expire")
    assert(Snapshot.loadStore(spark, dir).count() == 4)
    val after = Consent.currentState(spark, dir)
      .orderBy(col("subject_id")).collect()
        .map(r => (r.getLong(0), r.getBoolean(2))).toSeq
    assert(after == before, "current verdicts must be untouched")
    // demonstrations YOUNGER than the cutoff still work: subject 1 was
    // denied at stamp 7 (the 5->9 version, kept), subject 3 lawful
    val adm = Seq(1L, 3L).toDF("subject_id")
      .withColumn("doc_id", col("subject_id"))
      .withColumn("admitted_at", lit(7L))
    val viol = Consent.retroAudit(spark, dir, adm, "training")
      .collect().map(_.getAs[Long]("subject_id")).toSet
    assert(viol == Set(1L))
    // the store stays audit-clean (survivor chains intact, manifest fresh)
    val checks = graft.operators.Fsck.snapshotStore(spark, dir, "consent_key")
    assert(checks.forall(_.ok), checks.filterNot(_.ok).mkString("; "))
    // census reflects the drop; a replay expires nothing
    assert(graft.operators.Fsck.consentCensus(spark, dir)
      .find(_.check == "version_bulk").get.detail
      .contains("3 current, 1 superseded"))
    assert(Consent.expireVersions(spark, dir, cutoffMs = 6L) == 0L)
    // the verb holds the registry lease: a live foreign writer refuses
    val lout = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(new org.apache.hadoop.fs.Path(s"$dir/.lease"), true)
    lout.write(s"other|consent-update|${System.currentTimeMillis()}"
      .getBytes("UTF-8"))
    lout.close()
    intercept[IllegalStateException] {
      Consent.expireVersions(spark, dir, cutoffMs = 99L)
    }
  }

  test("a replayed admission epoch keeps its original stamp") {
    // ADVICE r12: a crash between the log write and the index append
    // replays the epoch; re-stamping the overwrite LATER would let a
    // grant that landed in the gap make retroAudit judge the admission
    // lawful — the under-reporting direction.
    val work = tmp("admstamp")
    val log = s"$work/.admissions/batch=s0"
    Consent.writeAdmissionLog(spark, log, Seq(1L, 2L).toDF("doc_id"),
      "training", pinnedAt = Some(10L))
    Consent.writeAdmissionLog(spark, log, Seq(1L, 2L).toDF("doc_id"),
      "training", pinnedAt = Some(99L))
    val stamps = spark.read.parquet(log)
      .select(col("admitted_at")).distinct().collect().map(_.getLong(0))
    assert(stamps.toSeq == Seq(10L),
      "the replay overwrite must keep the prior batch's stamp")
    // the direction that matters: a grant landing between the crash and
    // the replay (ts 50) must NOT launder the stamp-10 admission
    val consent = s"$work/consent"
    Consent.init(spark, consent, events(Seq(1L, 2L), "training",
      granted = true, 50L))
    val adm = spark.read.parquet(log)
      .withColumn("subject_id", col("doc_id"))
    assert(Consent.retroAudit(spark, consent, adm, "training").count() == 2L,
      "both admissions predate the grant and must stay findings")
  }
}
