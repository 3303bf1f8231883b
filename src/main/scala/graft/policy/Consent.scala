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
  * [[Snapshot.asOf]], and [[retroAudit]] computes the Art. 7(1)
  * demonstration over an admission log directly.
  *
  * Scale shape: the registry is subject-scale metadata next to a
  * corpus-scale store. [[gate]] is one broadcast-or-shuffle semi-join
  * of the input batch against the granted-subjects frame (Catalyst
  * picks by size); [[withdraw]] writes one bucketed merge touching
  * only the withdrawn subjects' buckets plus one request-sized
  * PURPOSE-SCOPED deletion vector
  * ([[graft.operators.DeletionVectors]]) so serving FOR THAT PURPOSE
  * stops immediately — purposes the subject still grants keep serving
  * (the registry's own data model is subject|purpose; masking them too
  * would destroy lawful utility). [[grant]] is the inverse: registry
  * merge plus retiring the subjects from that purpose's vectors. A
  * plain Art. 17 "erase me" request is NOT a withdrawal — it goes
  * through [[graft.cli.CurateCli.runEraseLogical]]'s global vectors
  * and the physical sweep.
  *
  * SUBJECT vs DOCUMENT keys: rights requests name a PERSON; stores are
  * keyed by document. When one subject owns many documents, pass the
  * subject→document `mapping` (an owner table: `subject_id`,
  * `doc_id`), and the vector legs resolve through ONE semi-join before
  * the doc-keyed machinery — [[graft.cli.CurateCli.resolveSubjectKeys]]
  * is the same front door for the sweep verbs. Without a mapping the
  * engine keeps the subject==document default (this engine's corpora
  * key documents by the subject they belong to).
  *
  * Reference frame: tabodino/dbt-gdpr-anonymizer models compliance as
  * anonymize-everything-you-have; consent-scoped admission is the
  * complementary surface a maintained corpus needs (its README's GDPR
  * framing — and its per-column `legal_basis` metadata in schema.yml is
  * the purpose-scoped idea the vector trees serve).
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
    graft.operators.Lease.withLease(spark, dir, "consent-init") {
      validatePurposes(events)
      Snapshot.initStore(keyed(resolved(events)), "consent_key", "updated_at",
        dir, buckets = Buckets)
    }

  /** Refuse an event batch carrying a purpose that is not a mask-tree
    * slug BEFORE any state mutates. Validating only at the vector leg
    * (after the registry merge) would record the withdrawal and then
    * throw forever on the mask — a permanently poisoned request with
    * serving never masked for that purpose. One tiny job on a
    * request-scale frame (consent events are subject-scale metadata).
    */
  private def validatePurposes(events: DataFrame): Unit = {
    val bad = events
      .filter(col("purpose").isNotNull)
      .select(col("purpose")).distinct()
      .collect().map(_.getString(0))
      .filterNot(graft.operators.DeletionVectors.isSlug)
    require(bad.isEmpty,
      s"consent: purpose must be a slug (non-empty, no '/', '=' or " +
        s"whitespace) — refused before any state mutates: " +
        bad.sorted.take(5).map(p => s"'$p'").mkString(", "))
  }

  /** A batch carrying BOTH a grant and a withdrawal for the same
    * (subject, purpose) at the same timestamp resolves DENY-WINS
    * (`bool_and`) before it reaches the store — the strict reading of
    * an ambiguous simultaneous indication, and it keeps the SCD-2
    * merge deterministic. The same rule holds ACROSS batches: the
    * merge's same-timestamp tiebreak ([[denyWins]]) prefers
    * `granted = false`, so a conflicting verdict arriving in a later
    * batch (trivially possible under a streaming sink's arbitrary
    * micro-batch boundaries) converges on deny no matter the arrival
    * order — a late deny DEMOTES a stored same-timestamp grant, and a
    * late grant loses to a stored deny.
    */
  private def resolved(events: DataFrame): DataFrame =
    events
      .filter(col("subject_id").isNotNull && col("purpose").isNotNull &&
        col("granted").isNotNull && col("updated_at").isNotNull)
      .groupBy(col("subject_id"), col("purpose"), col("updated_at"))
      .agg(bool_and(col("granted")).as("granted"))
      .select(col("subject_id"), col("purpose"), col("granted"),
        col("updated_at"))

  /** Same-timestamp tiebreak for the SCD-2 merge: deny first. */
  private val denyWins = Seq(col("granted").asc)

  /** The registry exists when its STORE content does — the directory
    * alone is not a signal (a writer lease or a crashed init may have
    * created the path without any data).
    */
  private[graft] def storeExists(spark: SparkSession, dir: String): Boolean = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    fs.exists(p) && (
      fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_stats")) ||
        fs.listStatus(p).exists(_.getPath.getName.startsWith("bucket=")))
  }

  /** Merge a later event batch — grants, withdrawals, purpose changes.
    * Timestamp-strategy semantics: a row supersedes the current version
    * of its key when `updated_at` advances ([[Snapshot.mergeStore]]);
    * same-timestamp conflicts resolve deny-wins, within a batch
    * ([[resolved]]) and across batches (the merge tiebreak).
    *
    * A missing registry bootstraps ([[init]]) instead of erroring: the
    * first micro-batch of a fresh streaming deployment must not require
    * a manual init step ordered before the stream.
    */
  def update(spark: SparkSession, dir: String, events: DataFrame): Unit =
    update(spark, dir, events, checkPurposes = true)

  /** [[withdraw]]/[[grant]] build their event frame from an
    * already-validated scalar purpose literal — re-scanning it would be
    * a pure extra job on the request path. (private[graft]: the
    * streaming consent sink and the dead-letter resubmit validate the
    * purpose vocabulary themselves, so their re-entry skips the
    * duplicate distinct-collect — r13 optimization round.)
    */
  private[graft] def update(
      spark: SparkSession,
      dir: String,
      events: DataFrame,
      checkPurposes: Boolean
  ): Unit =
    graft.operators.Lease.withLease(spark, dir, "consent-update") {
      if (checkPurposes) validatePurposes(events)
      if (!storeExists(spark, dir))
        Snapshot.initStore(keyed(resolved(events)), "consent_key", "updated_at",
          dir, buckets = Buckets)
      else
        Snapshot.mergeStore(spark, dir, keyed(resolved(events)), "consent_key",
          "updated_at", buckets = Buckets, sameTsTiebreak = denyWins)
    }

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
    graft.operators.DeletionVectors.requireSlug(purpose)
    // no registry at all = nobody has consented: the opt-in reading
    // denies everything rather than erroring on the missing path (or on
    // a path a lease/crashed init created with no store content)
    if (!storeExists(spark, dir)) return input.limit(0)
    val granted = grantedSubjects(spark, dir, purpose)
      .withColumnRenamed("subject_id", subjectCol)
    input.join(granted, Seq(subjectCol), "left_semi")
  }

  /** Durable admission-log leg of a consent-gated admission (batch and
    * streaming): one row per admitted document (`doc_id`, `purpose`,
    * `admitted_at`) under `logDir` (one `batch=<id>` directory — the
    * epoch/batch ordinal is the address, so a replay overwrites rather
    * than double-reports). `admitted_at` is `pinnedAt` when given (the
    * reproducible-audit convention), else the wall clock — but a REPLAY
    * of an already-written batch KEEPS the prior stamp (the
    * [[graft.operators.DeletionVectors.append]] rule): a crash between
    * the log write and the index append replays the epoch, and
    * re-stamping it LATER would let [[retroAudit]] judge an admission
    * lawful under a grant that landed in the gap — under-reporting, the
    * unsafe direction for an audit that exists to find unlawful
    * admissions.
    */
  private[graft] def writeAdmissionLog(
      spark: SparkSession,
      logDir: String,
      admittedKeys: DataFrame,
      purpose: String,
      pinnedAt: Option[Long]
  ): Unit = {
    val fs = new org.apache.hadoop.fs.Path(logDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp =
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$logDir/_SUCCESS")))
        pinnedAt.getOrElse(System.currentTimeMillis())
      else {
        val prior = spark.read.parquet(logDir)
          .agg(min(col("admitted_at"))).head()
        if (prior.isNullAt(0)) pinnedAt.getOrElse(System.currentTimeMillis())
        else prior.getLong(0)
      }
    // the prior read is materialized into a literal, so overwriting the
    // directory it came from is safe
    admittedKeys
      .select(col(admittedKeys.columns.head).as("doc_id"))
      .withColumn("purpose", lit(purpose))
      .withColumn("admitted_at", lit(stamp))
      .write.mode("overwrite").parquet(logDir)
  }

  /** Resolve subjects to the document ids the doc-keyed stores use:
    * through the owner `mapping` (`subject_id`, `doc_id`) when given —
    * one semi-join, one row per owned document — else 1:1 (subject IS
    * the document key, this engine's corpus default).
    */
  private def docKeys(
      subjects: DataFrame,
      mapping: Option[DataFrame]
  ): DataFrame = mapping match {
    case None => subjects.withColumnRenamed("subject_id", "doc_id")
    case Some(m) =>
      m.select(col("subject_id"), col("doc_id"))
        .join(subjects, Seq("subject_id"), "left_semi")
        .select(col("doc_id")).distinct()
  }

  /** Reconcile one purpose's deletion vectors with the registry's
    * POST-MERGE verdict for the touched subjects: mask those whose
    * current state does NOT grant the purpose (denied or absent —
    * absence is denial), retire those whose current state grants it.
    * Deriving the vector actions from the raw event batch instead (the
    * round-11 shape) diverges from the registry whenever the merge does
    * not follow arrival order: a same-timestamp grant/withdraw conflict
    * resolves deny-wins in the registry but the grant leg ran last and
    * retired the mask; a backdated grant (updated_at older than a stored
    * withdrawal) loses the merge but still unmasked — both over-SERVING
    * a subject whose consent is withdrawn. Reading the post-merge state
    * makes the two surfaces convergent by construction, in every arrival
    * order and under any event-time skew.
    *
    * The vector legs mutate `stateDir`'s `.dv` tree, so they hold THAT
    * directory's writer lease (the consent verbs' own lease is on the
    * registry directory) — a grant's retirement racing an erase-settle's
    * vector rewrite on the same tree is exactly the interleave the lease
    * exists to refuse.
    *
    * Scale shape: `subs` is request-scale (broadcast side of the
    * verdict semi-join); the registry read is the subject-scale snapshot
    * store. One append and one subtract per purpose, both request-sized.
    */
  private[graft] def syncVectors(
      spark: SparkSession,
      consentDir: String,
      stateDir: String,
      subs: DataFrame,
      purpose: String,
      mapping: Option[DataFrame]
  ): Long = graft.operators.Lease
    .withLease(spark, stateDir, "consent-vectors") {
    // both legs and their emptiness probes reuse these frames, so cache
    // them — without it every probe re-scans the registry store
    val touched = subs
      .select(col(subs.columns.head).as("subject_id")).distinct()
      .persist()
    // size-aware hint, not a forced broadcast: `subs` is request-scale in
    // the steady state, but a MASS withdrawal (the scenario the settle
    // side already defends against with the same hint) would force a
    // corpus-scale subject set through the driver mid-compliance-op —
    // above the threshold the plan degrades to a shuffle join instead
    val grantedSub = currentState(spark, consentDir)
      .filter(col("purpose") === purpose && col("granted"))
      .select(col("subject_id"))
      .join(graft.operators.DeletionVectors.hinted(touched),
        Seq("subject_id"), "left_semi")
    // verdict split with ONE materialized frame and ONE counting action:
    // touched left-joined against its granted subset (request-scale on
    // both sides, so the build side is hinted the same way) carries the
    // per-subject verdict, and a single aggregate yields nTouched AND
    // nGranted — the previous shape persisted two frames and ran two
    // count jobs plus an anti-join recompute for the denied leg
    val flagged = touched
      .join(graft.operators.DeletionVectors.hinted(
          grantedSub.withColumn("_g", lit(1))),
        Seq("subject_id"), "left")
      .persist()
    try {
      val cnt = flagged
        .agg(count(lit(1)).as("t"), count(col("_g")).as("g")).head()
      val (nTouched, nGranted) = (cnt.getLong(0), cnt.getLong(1))
      val grantedNow = flagged.filter(col("_g").isNotNull)
        .select(col("subject_id"))
      val deniedNow = flagged.filter(col("_g").isNull)
        .select(col("subject_id"))
      if (nTouched - nGranted > 0) {
        graft.operators.DeletionVectors.append(spark, stateDir,
          docKeys(deniedNow, mapping), purpose = Some(purpose))
        // compaction cadence, under the state lease this block already
        // holds: a steady withdrawal stream must not grow the purpose
        // tree's dv=* directories without bound (the manual
        // compact-vectors verb covers attended deployments only)
        graft.operators.DeletionVectors
          .maybeCompact(spark, stateDir, Some(purpose))
      }
      if (nGranted > 0)
        graft.operators.DeletionVectors.subtractPurpose(spark, stateDir,
          docKeys(grantedNow, mapping), purpose)
      nTouched
    } finally {
      flagged.unpersist()
      touched.unpersist()
    }
  }

  /** Art. 7(3) withdrawal, composed end to end: record the withdrawal
    * event in the registry (the audit chain keeps the old grant as a
    * superseded version) and — when a state directory is given — land a
    * PURPOSE-SCOPED deletion vector for the subjects' documents so
    * every serve declaring this purpose stops returning them NOW, while
    * purposes they still grant keep serving. The vector retires when
    * the purpose is re-granted ([[grant]]); it never feeds the physical
    * sweep (an Art. 17 erasure is [[graft.cli.CurateCli
    * .runEraseLogical]]'s global vector, not a withdrawal). When one
    * subject owns many documents pass `mapping` — the vector leg
    * resolves subject→doc through it. Returns the number of subjects
    * withdrawn.
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
      mapping: Option[DataFrame] = None,
      failpoint: String => Unit = _ => ()
  ): Long = graft.operators.Lease
    .withLease(spark, consentDir, "consent-withdraw") {
    graft.operators.DeletionVectors.requireSlug(purpose)
    // persisted: the registry merge, the vector sync, and the returned
    // count all read this request-scale frame — uncached, each action
    // re-ran the caller's source scan and the distinct shuffle
    val subs = subjects
      .select(col(subjects.columns.head).as("subject_id")).distinct()
      .persist()
    try {
      val events = subs
        .withColumn("purpose", lit(purpose))
        .withColumn("granted", lit(false))
        .withColumn("updated_at", lit(updatedAt))
      update(spark, consentDir, events, checkPurposes = false)
      failpoint("registry-updated")
      // the vector action follows the POST-MERGE verdict, not this event:
      // a withdrawal backdated behind a stored newer grant loses the merge
      // and must NOT mask (and vice versa for grant) — see [[syncVectors]];
      // its verdict-split count IS |subs| (touched = subs distinct), so the
      // with-state path returns it without a further job
      stateDir match {
        case Some(sd) => syncVectors(spark, consentDir, sd, subs, purpose, mapping)
        case None     => subs.count()
      }
    } finally subs.unpersist()
  }

  /** Art. 7 grant (or RE-grant), composed end to end: record the grant
    * in the registry and — when a state directory is given — retire the
    * subjects' documents from THIS purpose's deletion vectors
    * ([[graft.operators.DeletionVectors.subtractPurpose]]): the mask
    * existed because consent lapsed, so a new grant ends it, without
    * touching the global (Art. 17) vectors or any other purpose's
    * state. Same idempotence-by-replay contract as [[withdraw]];
    * registry-first so a crash in the gap errs on over-masking (the
    * gate already admits, serving unmasks at the replay). Returns the
    * number of subjects granted.
    */
  def grant(
      spark: SparkSession,
      consentDir: String,
      subjects: DataFrame,
      purpose: String,
      updatedAt: Long,
      stateDir: Option[String] = None,
      mapping: Option[DataFrame] = None,
      failpoint: String => Unit = _ => ()
  ): Long = graft.operators.Lease
    .withLease(spark, consentDir, "consent-grant") {
    graft.operators.DeletionVectors.requireSlug(purpose)
    // persisted + count-from-sync: see [[withdraw]]
    val subs = subjects
      .select(col(subjects.columns.head).as("subject_id")).distinct()
      .persist()
    try {
      val events = subs
        .withColumn("purpose", lit(purpose))
        .withColumn("granted", lit(true))
        .withColumn("updated_at", lit(updatedAt))
      update(spark, consentDir, events, checkPurposes = false)
      failpoint("registry-updated")
      // post-merge verdict, not this event: a grant backdated behind a
      // stored newer withdrawal loses the merge and must NOT unmask
      stateDir match {
        case Some(sd) => syncVectors(spark, consentDir, sd, subs, purpose, mapping)
        case None     => subs.count()
      }
    } finally subs.unpersist()
  }

  /** The Art. 7(1) retroactive-lawfulness audit: which admitted rows
    * were admitted WITHOUT then-current consent? `admissions` carries
    * one row per admitted document with its subject and admission
    * stamp; a row passes when some granted version of (subject,
    * `purpose`) was VALID at that stamp (`valid_from <= admitted_at <
    * valid_to`, open-ended current versions included) — everything else
    * returns: subjects never registered (absence is denial), grants
    * that arrived only later, withdrawals in force at admission.
    *
    * One anti-join, equi-keyed on the subject with the validity
    * interval as the residual condition — the registry side is
    * subject-scale, so Catalyst broadcasts it and the admission log
    * never shuffles. A missing registry returns every admission: if
    * nothing was ever lawful, everything is a finding.
    */
  /** Record retention for the registry's VERSION HISTORY (the Art.
    * 5(1)(e) x Art. 7(1) tension made mechanical): superseded versions
    * are the consent demonstrability record — keeping them is a stance
    * Art. 17(3)(b) supports — but not forever, and a stance with no
    * mechanism was round 11's finding against the admission log. This
    * drops every SUPERSEDED version whose `valid_to` is past the
    * controller's record-retention cutoff
    * ([[graft.pipeline.Snapshot.expireSuperseded]] — bucket-pruned
    * rewrite, the eraseKeys protocol); CURRENT rows are never touched,
    * so the registry's verdict — the gate, the vector sync, every
    * serve — is unchanged by construction. [[retroAudit]] demonstrations
    * reaching back past the cutoff lose the expired intervals: that is
    * what record retention means, so `cutoffMs` must be a pinned stamp
    * aligned with the retention schedule, never a rolling clock.
    * Returns the number of versions dropped.
    */
  def expireVersions(
      spark: SparkSession,
      consentDir: String,
      cutoffMs: Long
  ): Long =
    graft.operators.Lease.withLease(spark, consentDir, "consent-expire") {
      if (!storeExists(spark, consentDir)) 0L
      else Snapshot.expireSuperseded(spark, consentDir, "consent_key",
        cutoffMs, buckets = Buckets)
    }

  /** The streaming sink's quarantine tree — a SIBLING of the store root
    * (the bootstrap's whole-directory overwrite must not be able to
    * delete it), one `batch=<epoch>` directory per poisoned micro-batch
    * ([[graft.streaming.StreamingPipeline.consentSink]]).
    */
  private[graft] def deadLetterRoot(consentDir: String): String =
    s"${consentDir.stripSuffix("/")}.dead-letter"

  private def deadLetterBatchDirs(
      spark: SparkSession,
      consentDir: String
  ): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val root = new org.apache.hadoop.fs.Path(deadLetterRoot(consentDir))
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(st => (st.getPath.getName.stripPrefix("batch=").toLong, st.getPath))
      .sortBy(_._1)
  }

  /** Triage view of the quarantine: every dead-lettered consent event
    * with its batch ordinal (the partition directory). Empty frame —
    * correct schema, zero rows — when nothing is quarantined, so a
    * triage dashboard needs no existence probe.
    */
  def deadLetter(spark: SparkSession, consentDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("subject_id", LongType), StructField("purpose", StringType),
      StructField("granted", BooleanType), StructField("updated_at", LongType),
      StructField("batch", LongType)))
    if (deadLetterBatchDirs(spark, consentDir).isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.parquet(deadLetterRoot(consentDir))
        .withColumn("batch", col("batch").cast("long"))
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Re-submit one quarantined batch under a purpose CORRECTION map —
    * the triage path that lets a dead-lettered consent indication
    * actually reach the registry (GDPR Art. 7(1): the indication
    * happened; a malformed purpose string must not erase it). Every
    * distinct quarantined purpose must remap to a valid slug, validated
    * BEFORE any state mutates (an incomplete or still-invalid map
    * refuses and the batch stays quarantined — fail-stop, the batch
    * verbs' contract). The corrected events go through the ordinary
    * [[update]] merge (same-ts deny-wins, replay-safe) and, when
    * `stateDir` is given, the post-merge vector sync ([[syncVectors]] —
    * a corrected WITHDRAWAL masks exactly as if it had never been
    * quarantined). The batch directory is dropped LAST: a crash after
    * the merge replays the resubmit, and the merge is idempotent for an
    * identical batch. Returns the number of events resubmitted.
    *
    * Scale shape: a quarantine batch is request-scale (malformed events
    * of one micro-batch); the purpose vocabulary is the same tiny
    * distinct-collect every consent verb uses.
    */
  def resubmitDeadLetter(
      spark: SparkSession,
      consentDir: String,
      batch: Long,
      remap: Map[String, String],
      stateDir: Option[String] = None,
      mapping: Option[DataFrame] = None
  ): Long =
    graft.operators.Lease.withLease(spark, consentDir, "dead-letter-resubmit") {
      val dir = deadLetterBatchDirs(spark, consentDir).toMap.get(batch)
        .getOrElse(throw new IllegalArgumentException(
          s"dead-letter: no quarantined batch=$batch under " +
            s"${deadLetterRoot(consentDir)}"))
      val events = spark.read.parquet(dir.toString)
      // ONE grouped collect carries the quarantined vocabulary, the
      // resubmitted-event count, and which purposes have vector-relevant
      // rows — the previous shape ran a distinct-collect, a count, the
      // merge's re-validation collect, and a second distinct-collect for
      // the same facts (r13 optimization round)
      val pStats = events
        .groupBy(col("purpose"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("subject_id").isNotNull &&
            col("granted").isNotNull, 1L).otherwise(0L)).as("nClean"))
        .collect()
        .map(r => (if (r.isNullAt(0)) null else r.getString(0),
          r.getLong(1), r.getLong(2)))
      val quarantined = pStats.collect { case (p, _, _) if p != null => p }
      val unresolved = quarantined
        .map(p => (p, remap.getOrElse(p, p)))
        .filterNot { case (_, to) =>
          graft.operators.DeletionVectors.isSlug(to) }
      require(unresolved.isEmpty,
        "dead-letter: every quarantined purpose must remap to a valid " +
          "slug — refused before any state mutates: " +
          unresolved.sorted.take(5)
            .map { case (f, t) => s"'$f' -> '$t'" }.mkString(", "))
      val fixPurpose = quarantined.foldLeft(col("purpose")) { (acc, p) =>
        when(col("purpose") === p, lit(remap.getOrElse(p, p))).otherwise(acc)
      }
      val corrected = events.withColumn("purpose", fixPurpose)
      val n = pStats.map(_._2).sum
      // the remap gate above already validated every surviving purpose,
      // so the merge skips its duplicate validation collect
      update(spark, consentDir, corrected, checkPurposes = false)
      stateDir.foreach { sd =>
        val clean = corrected.filter(col("subject_id").isNotNull &&
          col("purpose").isNotNull && col("granted").isNotNull)
        // post-remap purpose targets with at least one fully-fielded row
        // (two quarantined purposes may remap to one slug: their subject
        // sets sync under that one target)
        val purposes = pStats.collect {
          case (p, _, nClean) if p != null && nClean > 0 =>
            remap.getOrElse(p, p)
        }.distinct.sorted
        purposes.foreach { p =>
          syncVectors(spark, consentDir, sd,
            clean.filter(col("purpose") === p)
              .select(col("subject_id")).distinct(),
            p, mapping)
        }
      }
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(dir, true)
      n
    }

  /** Acknowledge-and-drop for quarantined batches that will NOT be
    * resubmitted (spam, test traffic, events superseded by a corrected
    * re-send at the source): one batch, or all of them. The explicit
    * verb is the point — quarantined rows fail the census
    * ([[graft.operators.Fsck.consentCensus]]) until an operator either
    * resubmits or deliberately purges; nothing expires them silently.
    * Returns the number of batch directories dropped.
    */
  def purgeDeadLetter(
      spark: SparkSession,
      consentDir: String,
      batch: Option[Long] = None
  ): Int =
    graft.operators.Lease.withLease(spark, consentDir, "dead-letter-purge") {
      val dirs = deadLetterBatchDirs(spark, consentDir)
      val victims = batch match {
        case Some(b) => dirs.filter(_._1 == b)
        case None    => dirs
      }
      val fs = new org.apache.hadoop.fs.Path(deadLetterRoot(consentDir))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      victims.foreach { case (_, p) => fs.delete(p, true) }
      // drop the emptied root so a clean registry censuses with no
      // dead-letter row at all (the tree exists only while triage is owed)
      if (victims.size == dirs.size && dirs.nonEmpty)
        fs.delete(new org.apache.hadoop.fs.Path(deadLetterRoot(consentDir)),
          true)
      victims.size
    }

  def retroAudit(
      spark: SparkSession,
      consentDir: String,
      admissions: DataFrame,
      purpose: String,
      subjectCol: String = "subject_id",
      admittedAtCol: String = "admitted_at"
  ): DataFrame = {
    if (!storeExists(spark, consentDir)) return admissions
    val lawful = Snapshot.loadStore(spark, consentDir)
      .filter(col("purpose") === purpose && col("granted"))
      .select(col("subject_id").as("_c_subject"),
        col("valid_from").as("_c_from"), col("valid_to").as("_c_to"))
    admissions.join(lawful,
      admissions(subjectCol) === col("_c_subject") &&
        col("_c_from") <= admissions(admittedAtCol) &&
        (col("_c_to").isNull || col("_c_to") > admissions(admittedAtCol)),
      "left_anti")
  }
}
