package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Logical erasure — request-sized deletion vectors decoupling the
  * GDPR-erase SLA from store size.
  *
  * [[graft.cli.CurateCli.runErase]] is physically complete but its cost
  * scales with the rows it must REWRITE: every touched corpus partition,
  * every index leg, every matched shard directory. At 100 TB that is a
  * scheduled maintenance job, not an answer to "stop serving this
  * subject NOW". A deletion vector is the fast path the lakehouse
  * engines use for the same problem (Delta's deletion vectors, Iceberg's
  * delete files — public designs, re-expressed here over plain parquet):
  * the erase request's KEY SET lands as one tiny `_SUCCESS`-guarded
  * parquet under `<state>/.dv/dv=<contentId>/`, and a serving surface
  * subtracts the pending vectors with an anti-join — O(request) writes,
  * O(|result| + |request|) serve-time cost, zero store rewrites. The
  * leading dot keeps the directory invisible to Spark's own file
  * listing, so raw scans of sibling legs never pick vectors up as data.
  *
  * Masking is applied where serving happens: the `*Serving` entry
  * points ([[maskServing]] here, [[graft.text.Bm25.searchServing]],
  * [[graft.similarity.Ivf.searchServing]]) subtract the pending
  * vectors BY DEFAULT; the lower-level index readers
  * ([[graft.text.Bm25.loadSearchIndex]],
  * [[graft.similarity.Ivf.loadIndex]]) return raw store state and take
  * the mask as an explicit `maskIds` argument — they are maintenance
  * surfaces (compaction, fsck, settle need the unmasked truth), not the
  * serve path. A caller serving erased subjects has skipped the
  * serving entry points, and that is the documented contract, not an
  * accident.
  *
  * PURPOSE SCOPE (GDPR Art. 6(1)(a) x Art. 7(3)): a consent withdrawal
  * names a purpose, and masking the subject from every OTHER purpose
  * they still grant silently destroys lawful utility. Vectors therefore
  * come in two kinds:
  *
  *   - GLOBAL (`.dv/dv=<id>`) — the plain Art. 17 erasure request:
  *     masks every serve, settles through the physical sweep.
  *   - PURPOSE-SCOPED (`.dv/purpose=<slug>/dv=<id>`) — an Art. 7(3)
  *     withdrawal of ONE purpose: masks only serves declaring that
  *     purpose, never settles physically (the data stays lawful for the
  *     purposes still granted), and retires when the purpose is
  *     RE-GRANTED ([[subtractPurpose]] — the mask exists purely because
  *     consent lapsed, so its lifecycle is the registry's, not the
  *     sweep's).
  *
  * A serve that declares a purpose ([[load]]/[[maskServing]] with
  * `purpose = Some(p)`) subtracts the global vectors plus p's tree; a
  * serve that declares NO purpose subtracts EVERYTHING — over-masking
  * is the safe direction for an un-scoped read.
  *
  * Semantics served under a pending vector: masked ids are NEVER
  * returned, from the corpus or from any index — but aggregate ranking
  * statistics (BM25 N/avgdl/df, agg-store totals, the sketch profile)
  * still include them until the vector SETTLES through the physical
  * sweep ([[graft.cli.CurateCli.runEraseSettle]] snapshots the pending
  * GLOBAL keys and drives [[graft.cli.CurateCli.runErase]], which is
  * where the stats subtraction and the on-disk purge actually happen).
  * That eventual-consistency window is the documented contract, the
  * same one the sketch profile's staleness ledger already makes
  * explicit — and [[Fsck.dvDebt]] reports the pending debt (vector
  * count, key count, oldest capture stamp) so "without undue delay" is
  * auditable, not assumed.
  *
  * Crash safety is by construction rather than by protocol: a torn
  * vector write has no `_SUCCESS` and is invisible (the replay
  * overwrites the same content-derived directory); masking is a set
  * subtraction, so duplicate or overlapping vectors are harmless; and
  * [[subtract]] retires a settled vector by writing the REMAINDER to a
  * fresh content-addressed directory before deleting the old one — a
  * crash between the two leaves both live, which over-masks only ids
  * the physical sweep already purged.
  *
  * Scale shape of the mask itself: vectors are request-sized by
  * construction, so the anti-join broadcasts — but "by construction"
  * assumes settle runs. Under unbounded unsettled debt (mass
  * withdrawals, settle never scheduled) a FORCED broadcast of the
  * pending union would OOM the driver instead of degrading, so the
  * hint is size-aware ([[hinted]]): applied below
  * `graft.dv.broadcastMaxBytes` (default 64 MiB) of estimated mask
  * bytes, dropped above it — the plan then degrades to a shuffle join
  * and AQE may still pick broadcast from runtime sizes. The
  * Mondrian adaptive-rank convention, applied to the rights layer.
  *
  * Writer discipline: like every maintained store in this engine, the
  * vector tree assumes ONE writer at a time (the CLI/sweep convention);
  * readers are always safe — they see `_SUCCESS`-complete vectors only.
  *
  * Reference frame: tabodino/dbt-gdpr-anonymizer deletes by rebuilding
  * anonymized models in place (the models/marts SQL layer); this module is the
  * incremental-store counterpart those rebuilds don't need but a
  * maintained 100 TB corpus does — and its per-column `legal_basis`
  * metadata (schema.yml) is the same purpose-scoped idea this module's
  * purpose trees serve.
  */
object DeletionVectors {

  /** Vectors live under a dot-directory so sibling parquet scans of the
    * state directory never list them as data files.
    */
  private def dvRoot(outDir: String) = s"${outDir.stripSuffix("/")}/.dv"

  /** Purpose strings become directory names (`purpose=<slug>`), so they
    * must be slugs: non-empty, no '/', '=', or whitespace. Exposed so the
    * REGISTRY can refuse an invalid purpose BEFORE any state mutates —
    * validating only here, at the vector leg, would let the registry
    * record a withdrawal whose mask then throws forever on replay (a
    * permanently poisoned request with serving never masked).
    */
  def requireSlug(purpose: String): Unit =
    require(isSlug(purpose),
      s"deletion vectors: purpose must be a slug (non-empty, no '/', '=' " +
        s"or whitespace), got '$purpose'")

  def isSlug(purpose: String): Boolean =
    purpose.nonEmpty && !purpose.exists(c => c == '/' || c == '=' ||
      Character.isWhitespace(c))

  private def purposeRoot(outDir: String, purpose: String): String = {
    requireSlug(purpose)
    s"${dvRoot(outDir)}/purpose=$purpose"
  }

  private def fsOf(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Order-free content id of a key set — the [[PartitionSwap]] sweep-id
    * recipe (`bit_xor` of per-row xxhash64; `sum` overflows under ANSI):
    * the same request replayed lands in the same directory, so appends
    * are idempotent by construction.
    */
  def contentId(keys: DataFrame, idCol: String): Long =
    keys.select(col(idCol))
      .distinct()
      .agg(coalesce(bit_xor(xxhash64(col(idCol).cast("string"))), lit(0L))
        .as("h"))
      .head().getAs[Long]("h")

  /** Record a logical erasure: the distinct keys land as ONE parquet
    * vector at `dv=<contentId>` with a capture stamp per row (the fsck
    * debt-age signal). `purpose = None` writes a GLOBAL (Art. 17)
    * vector; `Some(p)` a purpose-scoped one under `purpose=<p>/`.
    * Returns the number of masked keys. Re-appending the same key set
    * overwrites the same directory — a no-op at serve, and it KEEPS the
    * original capture stamp: a redelivered request must not make
    * outstanding debt look younger than it is.
    */
  def append(
      spark: SparkSession,
      outDir: String,
      keys: DataFrame,
      idCol: String = "doc_id",
      purpose: Option[String] = None
  ): Long = {
    val root = purpose.fold(dvRoot(outDir))(purposeRoot(outDir, _))
    val ks = keys.select(col(idCol)).distinct()
    // ONE aggregation computes the content id AND the key count (the
    // returned value) — the id job, the separate readback-count job, and
    // contentId's distinct pass used to be three actions over the same
    // request-sized frame
    val agg = ks
      .agg(
        coalesce(bit_xor(xxhash64(col(idCol).cast("string"))), lit(0L))
          .as("h"),
        count(lit(1)).as("n"))
      .head()
    val (id, n) = (agg.getLong(0), agg.getLong(1))
    val dir = s"$root/dv=${java.lang.Long.toHexString(id)}"
    val fs = fsOf(spark, dir)
    val stamp =
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")))
        System.currentTimeMillis()
      else {
        val prior = spark.read.parquet(dir).agg(min(col("_stamp"))).head()
        if (prior.isNullAt(0)) System.currentTimeMillis() else prior.getLong(0)
      }
    // the prior read is materialized into a literal, so overwriting the
    // directory it came from is safe
    ks.withColumn("_stamp", lit(stamp))
      .write.mode("overwrite").parquet(dir)
    n
  }

  /** `_SUCCESS`-complete vector directories under one root (a torn
    * append is invisible until its replay overwrites it). The listing
    * is request-scale — one entry per pending erasure, not per corpus
    * batch.
    */
  private def liveDirsUnder(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else
      fs.listStatus(rootPath)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("dv="))
        .map(_.getPath)
        .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")))
        .map(_.toString).sorted.toSeq
  }

  /** GLOBAL (Art. 17) vector directories — the settle path's scope:
    * purpose-scoped masks never settle physically.
    */
  def liveDirs(spark: SparkSession, outDir: String): Seq[String] =
    liveDirsUnder(spark, dvRoot(outDir))

  /** Purposes that currently have a vector tree (live or not — a tree
    * whose vectors all retired may linger as an empty directory and
    * lists here harmlessly).
    */
  def purposes(spark: SparkSession, outDir: String): Seq[String] = {
    val root = dvRoot(outDir)
    val fs = fsOf(spark, root)
    val rootPath = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else
      fs.listStatus(rootPath)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("purpose="))
        .map(_.getPath.getName.stripPrefix("purpose=")).sorted.toSeq
  }

  /** The vector directories a serve with the given purpose scope must
    * subtract: global always; `Some(p)` adds p's tree; `None` (an
    * un-scoped read) adds EVERY purpose tree — over-masking is the safe
    * direction when the reader does not say what the read is for.
    */
  def liveDirsFor(
      spark: SparkSession,
      outDir: String,
      purpose: Option[String]
  ): Seq[String] = {
    val scoped = purpose match {
      case Some(p) => liveDirsUnder(spark, purposeRoot(outDir, p))
      case None =>
        purposes(spark, outDir)
          .flatMap(p => liveDirsUnder(spark, purposeRoot(outDir, p)))
    }
    liveDirs(spark, outDir) ++ scoped
  }

  /** The union of the serve-scope's pending vectors as one distinct key
    * frame — ONE multi-path read regardless of how many erasures are
    * pending, never a per-directory union reduce. None when nothing is
    * masked, so the serve path can skip the anti-join entirely.
    */
  def load(
      spark: SparkSession,
      outDir: String,
      idCol: String = "doc_id",
      purpose: Option[String] = None
  ): Option[DataFrame] = {
    val dirs = liveDirsFor(spark, outDir, purpose)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).select(col(idCol)).distinct())
  }

  /** ONE purpose tree's pending keys alone — no global vectors: the
    * Art. 15 disclosure answers "which purposes currently exclude this
    * subject" (Art. 7(3) withdrawals in force), and conflating the
    * global (Art. 17) masks — reported separately as pending logical
    * erasure — would over-state every purpose.
    */
  def loadPurposeTree(
      spark: SparkSession,
      outDir: String,
      purpose: String,
      idCol: String = "doc_id"
  ): Option[DataFrame] = {
    val dirs = liveDirsUnder(spark, purposeRoot(outDir, purpose))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).select(col(idCol)).distinct())
  }

  /** GLOBAL vectors only — what [[graft.cli.CurateCli.runEraseSettle]]
    * snapshots: a purpose-scoped mask must never feed the physical
    * sweep (the subject's data is still lawful for the purposes they
    * grant).
    */
  def loadGlobal(
      spark: SparkSession,
      outDir: String,
      idCol: String = "doc_id"
  ): Option[DataFrame] = {
    val dirs = liveDirs(spark, outDir)
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs: _*).select(col(idCol)).distinct())
  }

  /** Size-aware broadcast hint for a mask frame: below
    * `graft.dv.broadcastMaxBytes` (default 64 MiB) of Catalyst-estimated
    * bytes the anti-join build side is hinted broadcast (vectors are
    * request-sized by construction, so this is the steady-state plan);
    * above it the hint is DROPPED — a mass-withdrawal backlog that was
    * never settled must degrade to a shuffle join, not OOM the driver
    * through a forced broadcast. The estimate is plan metadata (parquet
    * file bytes for vector-backed frames) — no job runs to decide.
    */
  def hinted(keys: DataFrame): DataFrame = {
    val max = keys.sparkSession.conf
      .getOption("graft.dv.broadcastMaxBytes")
      .map(_.toLong).getOrElse(64L << 20)
    if (keys.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(max))
      broadcast(keys)
    else keys
  }

  /** Serve-side subtraction: an anti-join on the id column, broadcast
    * when the mask is small ([[hinted]]).
    */
  def mask(df: DataFrame, dv: Option[DataFrame], idCol: String): DataFrame =
    dv match {
      case None => df
      case Some(d) =>
        val keys = d.select(col(d.columns.head).as(idCol)).distinct()
        df.join(hinted(keys), Seq(idCol), "left_anti")
    }

  /** [[load]] + [[mask]] in one call — the serving view of any leg
    * under the state directory's pending vectors, scoped to the serve's
    * purpose (None = subtract everything; see [[liveDirsFor]]).
    */
  def maskServing(
      spark: SparkSession,
      outDir: String,
      df: DataFrame,
      idCol: String = "doc_id",
      purpose: Option[String] = None
  ): DataFrame = mask(df, load(spark, outDir, idCol, purpose), idCol)

  /** Pending GLOBAL debt for the auditor: (vector dirs, distinct keys,
    * oldest capture stamp in epoch millis). Purpose-scoped masks are
    * not settle debt — see [[pendingPurposeMasks]].
    */
  def pending(
      spark: SparkSession,
      outDir: String,
      idCol: String = "doc_id"
  ): (Int, Long, Option[Long]) = {
    val dirs = liveDirs(spark, outDir)
    if (dirs.isEmpty) (0, 0L, None)
    else {
      val all = spark.read.parquet(dirs: _*)
      val row = all
        .agg(countDistinct(col(idCol)).as("n"), min(col("_stamp")).as("s"))
        .head()
      (dirs.size, row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getLong(1)))
    }
  }

  /** Per-purpose mask census for the auditor: (purpose, vector dirs,
    * distinct keys). These are lawful standing masks, not debt — they
    * retire on re-grant, not at settle.
    */
  def pendingPurposeMasks(
      spark: SparkSession,
      outDir: String,
      idCol: String = "doc_id"
  ): Seq[(String, Int, Long)] =
    purposes(spark, outDir).flatMap { p =>
      val dirs = liveDirsUnder(spark, purposeRoot(outDir, p))
      if (dirs.isEmpty) None
      else Some((p, dirs.size,
        spark.read.parquet(dirs: _*).select(col(idCol)).distinct().count()))
    }

  /** Compact one vector tree: merge its many request-sized vectors into
    * ONE vector (per-key MIN stamps preserved — a merge must not make
    * outstanding debt look younger than its oldest capture), promote
    * it, then retire the sources. Returns (dirs before, dirs after).
    *
    * Why: global vectors settle and purpose trees shrink on re-grant,
    * but a long-lived deployment with ongoing withdrawals otherwise
    * grows `dv=*` directories without bound — each serve stays ONE
    * multi-path read, but the listing and file-count overhead grow per
    * request and nothing else merges the tree (the corpus/index legs
    * all have compaction; the vector trees didn't).
    *
    * Protocol, crash-safe in the only direction a mask may err
    * (over-masking): the merged union stages under a dot-path
    * (invisible to [[liveDirsUnder]]), promotes by rename to a
    * content-addressed name — hashed over (key, stamp) with a
    * compact-leg salt, so a replay of the same tree reuses the same
    * name and an append between runs produces a fresh one — and only
    * THEN are the source directories deleted. A crash anywhere leaves
    * the mask a superset of what it must be, and the replay converges:
    * a promoted-but-unretired run finds its own union live
    * (content-verified by two anti-joins — a content-hash collision
    * refuses loudly rather than risking an under-mask window) and just
    * finishes the retirement.
    */
  private def compactUnder(
      spark: SparkSession,
      root: String,
      idCol: String,
      failpoint: String => Unit = _ => ()
  ): (Int, Int) = {
    val fs = fsOf(spark, root)
    val dirs = liveDirsUnder(spark, root)
    if (dirs.size <= 1) return (dirs.size, dirs.size)
    val merged = spark.read.parquet(dirs: _*)
      .groupBy(col(idCol)).agg(min(col("_stamp")).as("_stamp"))
      .select(col(idCol), col("_stamp"))
    val cid = merged
      .agg(coalesce(bit_xor(xxhash64(concat_ws("|",
        col(idCol).cast("string"), col("_stamp"), lit("dvc")))), lit(0L))
        .as("h"))
      .head().getAs[Long]("h")
    val cname = s"dv=${java.lang.Long.toHexString(cid)}"
    val dest = new org.apache.hadoop.fs.Path(s"$root/$cname")
    if (fs.exists(new org.apache.hadoop.fs.Path(dest, "_SUCCESS"))) {
      // a replay after a promote that crashed before retiring the
      // sources: the live dest must BE the merged union
      val existing = spark.read.parquet(dest.toString)
        .select(col(idCol))
      val mergedKeys = merged.select(col(idCol))
      val same =
        existing.join(mergedKeys, Seq(idCol), "left_anti").isEmpty &&
          mergedKeys.join(existing, Seq(idCol), "left_anti").isEmpty
      require(same, s"deletion vectors: compact content-hash collision " +
        s"at $cname under $root — refusing rather than risking an " +
        "under-masking retirement")
    } else {
      val stage = s"$root/.compact-stage"
      merged.write.mode("overwrite").parquet(stage)
      failpoint("staged")
      fs.delete(dest, true) // a torn (_SUCCESS-less) leftover is invisible
      require(fs.rename(new org.apache.hadoop.fs.Path(stage), dest),
        s"deletion vectors: compact promote $stage -> $dest failed")
    }
    failpoint("promoted")
    dirs.map(new org.apache.hadoop.fs.Path(_))
      .filter(_.getName != cname)
      .foreach(p => fs.delete(p, true))
    (dirs.size, 1)
  }

  /** Auto-compaction threshold: a tree whose live vector count reaches
    * `graft.dv.compactAt` (default 16, the [[graft.cli.CurateCli
    * .runIncremental]] `compactAt` convention) is merged in place by the
    * verb that just appended to it.
    */
  def compactAt(spark: SparkSession): Int =
    spark.conf.getOption("graft.dv.compactAt").map(_.toInt).getOrElse(16)

  /** Compaction CADENCE for one tree — the unattended-deployment half
    * of [[compact]]: the manual `compact-vectors` verb merges on demand,
    * but a steady consent stream (or a steady trickle of Art. 17
    * requests between settles) otherwise grows `dv=*` directories until
    * an operator notices the census. Called by the appending verbs
    * (the consent vector sync, `erase-logical`) right after their
    * append, UNDER the state lease they already hold; a tree below the
    * threshold costs one fs listing, nothing else. Returns the
    * (before, after) dir counts when a compaction ran.
    */
  def maybeCompact(
      spark: SparkSession,
      outDir: String,
      purpose: Option[String],
      idCol: String = "doc_id"
  ): Option[(Int, Int)] = {
    val root = purpose.fold(dvRoot(outDir))(purposeRoot(outDir, _))
    val at = compactAt(spark)
    val n = liveDirsUnder(spark, root).size
    if (n < at) None
    else {
      println(s"[dv] auto-compacting the " +
        s"${purpose.fold("global")(p => s"purpose=$p")} vector tree " +
        s"under $outDir ($n live vectors >= graft.dv.compactAt=$at)")
      Some(compactUnder(spark, root, idCol))
    }
  }

  /** Compact the whole tree — the global root and every purpose tree,
    * each independently (a purpose's standing masks never mix with the
    * global settle scope). Census and mask results are byte-identical
    * before and after; only the directory count drops. Returns one
    * (scope, dirs before, dirs after) row per tree touched.
    */
  def compact(
      spark: SparkSession,
      outDir: String,
      idCol: String = "doc_id",
      failpoint: String => Unit = _ => ()
  ): Seq[(String, Int, Int)] = {
    val g = compactUnder(spark, dvRoot(outDir), idCol, failpoint)
    ("global", g._1, g._2) +: purposes(spark, outDir).map { p =>
      val r = compactUnder(spark, purposeRoot(outDir, p), idCol, failpoint)
      (s"purpose=$p", r._1, r._2)
    }
  }

  /** Retire settled keys from every pending vector under one root: a
    * vector fully covered by the settled set is deleted; a partially
    * covered one is rewritten (remainder keys, fresh content-addressed
    * directory, original stamps preserved) BEFORE the old directory
    * goes, so a crash anywhere leaves the mask a superset of what it
    * must be — over-masking only ids the physical sweep already purged
    * (or, for a re-grant, ids the next replay retires again). Replays
    * converge: the remainder write is idempotent and the old directory
    * delete is the last step per vector.
    */
  private def subtractUnder(
      spark: SparkSession,
      root: String,
      keys: DataFrame,
      idCol: String
  ): Unit = {
    val fs = fsOf(spark, root)
    liveDirsUnder(spark, root).foreach { dir =>
      // size-aware like the serve-side mask: a mass settle after a long
      // backlog must degrade to a shuffle join, not force-broadcast a
      // corpus-scale key set through the driver
      val remainder = spark.read.parquet(dir)
        .join(hinted(keys), Seq(idCol), "left_anti")
      // ONE aggregation decides emptiness AND names the remainder vector
      // (vector keys are distinct by construction, so contentId's
      // distinct pass is redundant here) — isEmpty + contentId used to
      // run the anti-join twice before the write ran it a third time
      val agg = remainder
        .agg(
          count(lit(1)).as("n"),
          coalesce(bit_xor(xxhash64(col(idCol).cast("string"))), lit(0L))
            .as("h"))
        .head()
      if (agg.getLong(0) == 0L)
        fs.delete(new org.apache.hadoop.fs.Path(dir), true)
      else {
        // compare by directory NAME — liveDirs returns fs-qualified URIs,
        // so a raw-string compare against the rebuilt path never matches
        // and the "untouched vector" case would overwrite the directory
        // its own source is reading
        val rname = s"dv=${java.lang.Long.toHexString(agg.getLong(1))}"
        if (rname != new org.apache.hadoop.fs.Path(dir).getName) {
          remainder.select(col(idCol), col("_stamp"))
            .write.mode("overwrite").parquet(s"$root/$rname")
          fs.delete(new org.apache.hadoop.fs.Path(dir), true)
        }
      }
    }
  }

  /** Retire PHYSICALLY SETTLED keys from the whole tree — the global
    * vectors and every purpose tree: a purged row needs no mask under
    * any scope. (The settle keys come from the GLOBAL vectors, but a
    * purpose tree may mask the same ids; leaving those would be
    * harmless over-masking of rows that no longer exist — cleaned here
    * for hygiene and so the purpose census stays honest.)
    */
  def subtract(
      spark: SparkSession,
      outDir: String,
      settled: DataFrame,
      idCol: String = "doc_id"
  ): Unit = {
    val keys = settled.select(col(settled.columns.head).as(idCol)).distinct()
    subtractUnder(spark, dvRoot(outDir), keys, idCol)
    purposes(spark, outDir).foreach(p =>
      subtractUnder(spark, purposeRoot(outDir, p), keys, idCol))
  }

  /** Re-grant unmask (Art. 7 both ways): retire keys from ONE purpose's
    * tree — the mask existed because consent for that purpose lapsed,
    * so a new grant ends it, without touching the global vectors or any
    * other purpose's state.
    */
  def subtractPurpose(
      spark: SparkSession,
      outDir: String,
      keys: DataFrame,
      purpose: String,
      idCol: String = "doc_id"
  ): Unit =
    subtractUnder(spark, purposeRoot(outDir, purpose),
      keys.select(col(keys.columns.head).as(idCol)).distinct(), idCol)
}
