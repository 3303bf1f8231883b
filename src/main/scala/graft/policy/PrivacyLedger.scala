package graft.policy

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted differential-privacy budget accountant.
  *
  * [[graft.validate.DpRelease]] gives single releases the right
  * mechanism; what it deliberately does NOT give is the thing the DP
  * guarantee actually rests on across a release HISTORY: epsilons
  * compose, and an engine that will happily release forever has no
  * guarantee at all. This ledger is the accountant — every release
  * charges one durable `(dataset, release_id, eps, delta)` entry, and
  * [[authorize]] refuses a release whose composed spend would exceed
  * the dataset's budget, BEFORE any noisy output exists.
  *
  * Accounting is standard and deterministic (auditable arithmetic, no
  * randomness): basic sequential composition (`sum eps`, `sum delta` —
  * Dwork & Roth, "The Algorithmic Foundations of Differential Privacy",
  * Thm 3.16) as the binding spend, plus the heterogeneous advanced-
  * composition bound (Dwork, Rothblum & Vadhan, FOCS 2010:
  * `sqrt(2 ln(1/d') * sum eps_i^2) + sum eps_i (e^eps_i - 1)`, at slack
  * `d'`) reported alongside so an operator can see when switching the
  * policy to the tighter bound is worth it — and [[authorize]] takes
  * `composition = "advanced"` to actually BIND on that bound (charging
  * the slack `d'` against the delta budget), so at many small releases
  * the ledger can lawfully admit what the basic sum refuses.
  *
  * Durability is the deletion-vector shape, not a swap protocol: a
  * charge is one tiny `_SUCCESS`-guarded parquet under
  * `ledger/charge=<md5(release_id)>/` — content-addressed by the
  * RELEASE id, so a crashed release retried with the same id re-lands
  * the same entry (never double-charges) while a genuinely new release
  * gets a new directory; a torn write has no `_SUCCESS` and is
  * invisible. Reads are ONE multi-path scan of the complete entries,
  * never a per-entry union.
  *
  * Writer discipline: the engine-wide single-writer stance, DETECTED
  * rather than assumed — [[authorizeAndCharge]] holds the ledger
  * directory's writer lease across its read-check-write
  * ([[graft.operators.Lease]]), so two concurrent releases cannot both
  * authorize under the same remaining budget; the refused one retries
  * after the first's charge is durable and re-authorizes against the
  * updated spend. Bare [[authorize]] stays read-only (no lease): it is
  * the report path, and only the composed verb carries the guarantee.
  *
  * Reference frame: tabodino/dbt-gdpr-anonymizer releases anonymized
  * marts with no release accounting (the models/marts SQL layer) — fine for
  * one-shot masking, unsound for repeated noisy statistics; this module
  * is the missing compliance surface.
  */
object PrivacyLedger {

  private def ledgerRoot(dir: String) = s"${dir.stripSuffix("/")}/ledger"

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Content address of a release id — pure-JVM md5, no job. */
  private def chargeKey(releaseId: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(releaseId.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString

  /** Durably record one release's spend. Returns true when the entry is
    * new, false when the same release id was already charged (a crashed
    * release's retry — the charge is idempotent by content address).
    */
  def charge(
      spark: SparkSession,
      dir: String,
      dataset: String,
      releaseId: String,
      eps: Double,
      delta: Double = 0.0
  ): Boolean = {
    require(eps > 0, s"ledger: eps must be positive, got $eps")
    require(delta >= 0, s"ledger: delta must be non-negative, got $delta")
    val entry = s"${ledgerRoot(dir)}/charge=${chargeKey(releaseId)}"
    val fs = fsOf(spark, entry)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$entry/_SUCCESS"))) {
      // a replay must BE a replay: the same release id presented with
      // different accounting is id reuse, and silently no-opping it
      // would run an unauthorized release against a stale charge
      val prior = spark.read.schema(EntrySchema).parquet(entry).head()
      // the stored release id must be THE requested one: chargeKey is an
      // 8-byte md5 prefix, so two distinct ids colliding on it would
      // otherwise be silently treated as one charge — and the second
      // release would run unpaid against the budget
      require(prior.getString(1) == releaseId,
        s"ledger: charge-key collision — entry ${chargeKey(releaseId)} " +
          s"holds release id '${prior.getString(1)}', not '$releaseId'; " +
          "refusing rather than treating a distinct release as a replay")
      require(prior.getString(0) == dataset &&
        prior.getDouble(2) == eps && prior.getDouble(3) == delta,
        s"ledger: release id '$releaseId' was already charged as " +
          s"(dataset=${prior.getString(0)}, eps=${prior.getDouble(2)}, " +
          s"delta=${prior.getDouble(3)}) — a retry must carry the same " +
          "accounting; a new release needs a new id")
      false
    } else {
      import spark.implicits._
      Seq((dataset, releaseId, eps, delta, System.currentTimeMillis()))
        .toDF("dataset", "release_id", "eps", "delta", "_stamp")
        .coalesce(1)
        .write.mode("overwrite").parquet(entry)
      true
    }
  }

  /** Pinned entry schema — skips the per-read footer-inference job (the
    * authorization path reads the ledger once per release, so inference
    * would double its job count for no information).
    */
  private val EntrySchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dataset",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("release_id",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("eps",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("delta",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("_stamp",
      org.apache.spark.sql.types.LongType)))

  /** `_SUCCESS`-complete ledger entries as one frame (one multi-path
    * read; a torn charge is invisible until its retry overwrites it).
    * None when nothing has been charged.
    */
  def entries(spark: SparkSession, dir: String): Option[DataFrame] = {
    val root = ledgerRoot(dir)
    val fs = fsOf(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) return None
    val dirs = fs.listStatus(rootPath)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("charge="))
      .map(_.getPath)
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
      .map(_.toString).sorted
    if (dirs.isEmpty) None
    else Some(spark.read.schema(EntrySchema).parquet(dirs.toIndexedSeq: _*))
  }

  /** Composed spend per dataset: `(n_releases, sum eps, sum delta,
    * advanced-composition eps at slack deltaSlack)` — the frame the
    * budget report and the authorization check both read.
    */
  def spentByDataset(
      spark: SparkSession,
      dir: String,
      deltaSlack: Double = 1e-6
  ): DataFrame = {
    import spark.implicits._
    val e = entries(spark, dir).getOrElse(
      Seq.empty[(String, String, Double, Double, Long)]
        .toDF("dataset", "release_id", "eps", "delta", "_stamp"))
    e.groupBy(col("dataset"))
      .agg(
        count(lit(1)).as("n_releases"),
        sum(col("eps")).as("spent_eps"),
        sum(col("delta")).as("spent_delta"),
        (sqrt(lit(2.0 * math.log(1.0 / deltaSlack)) *
          sum(col("eps") * col("eps"))) +
          sum(col("eps") * (exp(col("eps")) - lit(1.0)))).as("adv_eps"))
  }

  /** Basic-composition spend for one dataset: (n, eps, delta). */
  def spent(spark: SparkSession, dir: String, dataset: String): (Long, Double, Double) =
    entries(spark, dir) match {
      case None => (0L, 0.0, 0.0)
      case Some(e) =>
        val r = e.filter(col("dataset") === dataset)
          .agg(count(lit(1)), coalesce(sum(col("eps")), lit(0.0)),
            coalesce(sum(col("delta")), lit(0.0)))
          .head()
        (r.getLong(0), r.getDouble(1), r.getDouble(2))
    }

  /** One dataset's per-release epsilons (bounded: one tiny row per
    * release) — the advanced-composition bound needs `sum eps_i^2` and
    * `sum eps_i (e^eps_i - 1)`, which the basic tuple cannot carry.
    */
  private def epsHistory(
      spark: SparkSession, dir: String, dataset: String): Seq[Double] =
    entries(spark, dir) match {
      case None => Seq.empty
      case Some(e) =>
        e.filter(col("dataset") === dataset)
          .select(col("eps")).collect().map(_.getDouble(0)).toSeq
    }

  /** The heterogeneous advanced-composition epsilon (Dwork, Rothblum &
    * Vadhan, FOCS 2010) for a release history at slack `deltaSlack`:
    * `sqrt(2 ln(1/d') * sum eps_i^2) + sum eps_i (e^eps_i - 1)`.
    */
  def advancedEps(epsilons: Seq[Double], deltaSlack: Double): Double = {
    require(deltaSlack > 0 && deltaSlack < 1,
      s"ledger: deltaSlack must be in (0,1), got $deltaSlack")
    math.sqrt(2.0 * math.log(1.0 / deltaSlack) *
      epsilons.map(e => e * e).sum) +
      epsilons.map(e => e * (math.exp(e) - 1.0)).sum
  }

  /** Refuse a release whose composed spend would exceed the dataset's
    * budget — BEFORE any noisy output exists. Equality is allowed (the
    * budget is a cap, not a strict bound); the error message carries the
    * arithmetic an auditor needs.
    *
    * `composition` selects the binding bound: `"basic"` (default) sums
    * epsilons and deltas; `"advanced"` binds on the DRV FOCS'10 bound
    * over the dataset's release history INCLUDING the requested release,
    * at slack `deltaSlack` — the total is then
    * `(advancedEps, sum delta + deltaSlack)`, so the delta check charges
    * the slack against `budgetDelta` too. At many small releases the
    * advanced bound admits schedules the basic sum refuses; it is the
    * operator's policy switch, not a silent default, because it trades a
    * slightly larger delta for the tighter epsilon.
    */
  def authorize(
      spark: SparkSession,
      dir: String,
      dataset: String,
      eps: Double,
      budgetEps: Double,
      delta: Double = 0.0,
      budgetDelta: Double = 0.0,
      composition: String = "basic",
      deltaSlack: Double = 1e-6
  ): Unit = composition match {
    case "basic" =>
      val (n, se, sd) = spent(spark, dir, dataset)
      require(se + eps <= budgetEps + 1e-12,
        f"privacy budget exhausted for '$dataset': spent eps=$se%.6f over " +
          f"$n releases + requested $eps%.6f > budget $budgetEps%.6f — refuse " +
          "the release or raise the dataset's budget policy")
      require(sd + delta <= budgetDelta + 1e-18,
        f"privacy budget exhausted for '$dataset': spent delta=$sd%.2e + " +
          f"requested $delta%.2e > budget $budgetDelta%.2e")
    case "advanced" =>
      val hist = epsHistory(spark, dir, dataset)
      val adv = advancedEps(hist :+ eps, deltaSlack)
      require(adv <= budgetEps + 1e-12,
        f"privacy budget exhausted for '$dataset' (advanced composition): " +
          f"DRV bound $adv%.6f over ${hist.size + 1} releases at slack " +
          f"$deltaSlack%.2e > budget $budgetEps%.6f")
      val sd = entries(spark, dir).map(_.filter(col("dataset") === dataset)
        .agg(coalesce(sum(col("delta")), lit(0.0))).head().getDouble(0))
        .getOrElse(0.0)
      require(sd + delta + deltaSlack <= budgetDelta + 1e-18,
        f"privacy budget exhausted for '$dataset' (advanced composition): " +
          f"spent delta=$sd%.2e + requested $delta%.2e + slack " +
          f"$deltaSlack%.2e > budget $budgetDelta%.2e")
    case other =>
      throw new IllegalArgumentException(
        s"ledger: unknown composition policy '$other' (basic|advanced)")
  }

  /** The guarded release: authorize against the budget, charge the
    * ledger durably, THEN hand back the go-ahead. Charging before the
    * release errs on the safe side — a crash between charge and the
    * released write burns budget without output, never the reverse
    * (retrying with the SAME release id re-lands the same charge and
    * proceeds to the release: the charge is the idempotency token).
    *
    * The read-check-write is NOT atomic on its own: two concurrent
    * releases against the same dataset could BOTH authorize under the
    * remaining budget and both charge, overspending epsilon — and an
    * engine that can overspend has no guarantee at all. The whole
    * sequence therefore holds the ledger directory's writer lease
    * ([[graft.operators.Lease]]): a second release arriving while one is
    * mid-authorization refuses loudly and retries after the first's
    * charge is durable (its re-authorization then sees the spend).
    */
  def authorizeAndCharge(
      spark: SparkSession,
      dir: String,
      dataset: String,
      releaseId: String,
      eps: Double,
      budgetEps: Double,
      delta: Double = 0.0,
      budgetDelta: Double = 0.0,
      composition: String = "basic",
      deltaSlack: Double = 1e-6
  ): Unit = graft.operators.Lease
    .withLease(spark, dir, "ledger-charge") {
    val entry = s"${ledgerRoot(dir)}/charge=${chargeKey(releaseId)}"
    val replay = fsOf(spark, entry)
      .exists(new org.apache.hadoop.fs.Path(s"$entry/_SUCCESS"))
    // a replayed id is already paid for — authorizing it again would
    // double-count its own spend against the budget — but it must
    // still go through charge, which verifies the retry carries the
    // SAME accounting (id reuse is refused there)
    if (!replay)
      authorize(spark, dir, dataset, eps, budgetEps, delta, budgetDelta,
        composition, deltaSlack)
    charge(spark, dir, dataset, releaseId, eps, delta)
    ()
  }
}
