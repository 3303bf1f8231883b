package graft.policy

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.Snapshot

/** Consent / lawful-basis registry (GDPR Art. 6(1)(a), 7) — the
  * admission-side member of the data-subject-rights family: access
  * answers Art. 15, rectification 16, erasure 17, retention 5(1)(e);
  * consent decides whether a subject's data may be ADMITTED for a
  * purpose at all, and its withdrawal ("as easy as giving it",
  * Art. 7(3)) must both stop future admission and trigger erasure of
  * what was already admitted.
  *
  * The registry is not a new store — it is the SCD-2 snapshot store
  * ([[graft.pipeline.Snapshot]]) keyed by `subject|purpose`, which buys
  * the full maintained lifecycle for free: bucketed merges touching
  * only changed buckets, manifest-pruned reads, crash-healing
  * ([[Snapshot.healManifest]]), the fsck auditor
  * ([[graft.operators.Fsck.snapshotStore]]), and a complete AUDIT
  * HISTORY — every grant and withdrawal survives as a superseded
  * version with its validity interval, which is the Art. 7(1)
  * demonstrability requirement ("the controller shall be able to
  * demonstrate that the data subject has consented"), not a storage
  * accident. Current state is [[Snapshot.current]]; the state at any
  * past moment (what was lawful when batch N was admitted) is
  * [[Snapshot.asOf]].
  *
  * Scale shape: the registry is subject-scale metadata next to a
  * corpus-scale store. [[gate]] is one broadcast-or-shuffle semi-join
  * of the input batch against the granted-subjects frame (Catalyst
  * picks by size); [[withdraw]] writes one bucketed merge touching
  * only the withdrawn subjects' buckets plus one request-sized
  * deletion vector ([[graft.operators.DeletionVectors]]) so serving
  * stops IMMEDIATELY, with the physical purge riding the next
  * erase-settle.
  *
  * Reference frame: tabodino/dbt-gdpr-anonymizer models compliance as
  * anonymize-everything-you-have; consent-scoped admission is the
  * complementary surface a maintained corpus needs (its README's GDPR
  * framing, re-expressed as an operator).
  */
object Consent {

  /** The snapshot key: one SCD-2 chain per (subject, purpose). The
    * separator cannot occur in either side (subject ids are numeric or
    * hex in every store of this engine; purposes are slugs).
    */
  private def keyed(events: DataFrame): DataFrame =
    events.withColumn("consent_key",
      concat(col("subject_id").cast("string"), lit("|"), col("purpose")))

  private val Buckets = 8

  /** Bootstrap the registry from an initial event batch
    * (`subject_id`, `purpose`, `granted`, `updated_at`).
    */
  def init(spark: SparkSession, dir: String, events: DataFrame): Unit =
    Snapshot.writeStore(
      Snapshot.initial(keyed(resolved(events)), "consent_key", "updated_at"),
      "consent_key", dir, buckets = Buckets)

  /** A batch carrying BOTH a grant and a withdrawal for the same
    * (subject, purpose) at the same timestamp resolves DENY-WINS
    * (`bool_and`) before it reaches the store — the strict reading of
    * an ambiguous simultaneous indication, and it keeps the SCD-2
    * merge deterministic (its same-key-same-timestamp dedup would
    * otherwise keep an arbitrary row). Same-timestamp REDELIVERIES
    * across batches must carry the same verdict — that is what makes
    * them redeliveries; this resolution covers conflicts within a
    * batch, where simultaneous events actually collide.
    */
  private def resolved(events: DataFrame): DataFrame =
    events
      .filter(col("subject_id").isNotNull && col("purpose").isNotNull &&
        col("granted").isNotNull && col("updated_at").isNotNull)
      .groupBy(col("subject_id"), col("purpose"), col("updated_at"))
      .agg(bool_and(col("granted")).as("granted"))
      .select(col("subject_id"), col("purpose"), col("granted"),
        col("updated_at"))

  /** Merge a later event batch — grants, withdrawals, purpose changes.
    * Timestamp-strategy semantics: a row supersedes the current version
    * of its key when `updated_at` advances ([[Snapshot.mergeStore]]);
    * in-batch same-timestamp conflicts resolve deny-wins ([[resolved]]).
    */
  def update(spark: SparkSession, dir: String, events: DataFrame): Unit =
    Snapshot.mergeStore(spark, dir, keyed(resolved(events)), "consent_key",
      "updated_at", buckets = Buckets)

  /** Current consent state: one row per (subject, purpose) with the
    * latest `granted` verdict.
    */
  def currentState(spark: SparkSession, dir: String): DataFrame =
    Snapshot.current(Snapshot.loadStore(spark, dir))
      .select(col("subject_id"), col("purpose"), col("granted"),
        col("updated_at"))

  /** Subjects whose CURRENT state grants `purpose`. A subject with no
    * registry row has not consented — absence is denial (opt-in, the
    * Art. 4(11) "unambiguous indication" reading), which [[gate]]
    * enforces by semi-joining on this frame.
    */
  def grantedSubjects(
      spark: SparkSession,
      dir: String,
      purpose: String
  ): DataFrame =
    currentState(spark, dir)
      .filter(col("purpose") === purpose && col("granted"))
      .select(col("subject_id"))

  /** The admission gate: keep only input rows whose subject currently
    * grants `purpose`. One semi-join; the registry side is
    * subject-scale, so Catalyst broadcasts it under the usual
    * thresholds and the input batch never shuffles.
    */
  def gate(
      spark: SparkSession,
      dir: String,
      input: DataFrame,
      purpose: String,
      subjectCol: String = "doc_id"
  ): DataFrame = {
    // no registry at all = nobody has consented: the opt-in reading
    // denies everything rather than erroring on the missing path
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) return input.limit(0)
    val granted = grantedSubjects(spark, dir, purpose)
      .withColumnRenamed("subject_id", subjectCol)
    input.join(granted, Seq(subjectCol), "left_semi")
  }

  /** Art. 7(3) withdrawal, composed end to end: record the withdrawal
    * event in the registry (the audit chain keeps the old grant as a
    * superseded version) and — when a state directory is given — land a
    * deletion vector for the subjects so every masked serve stops
    * returning them NOW; the physical purge rides the next
    * `erase-settle`. Returns the number of subjects withdrawn.
    *
    * The two legs do not commit atomically and need no protocol to:
    * BOTH are idempotent under replay of the SAME request (the registry
    * merge dedups same-key-same-timestamp redeliveries; the vector is
    * content-addressed by the key set), so the caller's request file is
    * the durable artifact and the heal for a crash between the legs is
    * re-running the withdrawal — the sweep convention. Registry-first
    * ordering errs on the strict side: a crash in the gap stops future
    * ADMISSION (the gate reads the registry) while serving stops at the
    * replay; vector-first would leave the registry still granting,
    * which the gate must never see.
    */
  def withdraw(
      spark: SparkSession,
      consentDir: String,
      subjects: DataFrame,
      purpose: String,
      updatedAt: Long,
      stateDir: Option[String] = None,
      failpoint: String => Unit = _ => ()
  ): Long = {
    val subs = subjects
      .select(col(subjects.columns.head).as("subject_id")).distinct()
    val events = subs
      .withColumn("purpose", lit(purpose))
      .withColumn("granted", lit(false))
      .withColumn("updated_at", lit(updatedAt))
    update(spark, consentDir, events)
    failpoint("registry-updated")
    stateDir.foreach { sd =>
      graft.operators.DeletionVectors.append(spark, sd,
        subs.withColumnRenamed("subject_id", "doc_id"))
    }
    subs.count()
  }
}
