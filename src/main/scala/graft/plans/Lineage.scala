package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, BinaryComparison, BRound, CaseWhen, Concat, Crc32, DateDiff, Expression, IsNotNull, IsNull, LessThanOrEqual, Literal, Md5, NamedExpression, Round, Sha1, Sha2, Substring}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, LeafNode, LogicalPlan, Union}

/** Column-level lineage extracted from the ANALYZED Catalyst plan: for
  * every output column, the set of leaf (source-relation) columns whose
  * values can flow into it.
  *
  * This is the compliance artifact the reference's runtime PII tests
  * approximate from the outside: "which source attributes can reach this
  * published column" answered from the plan itself, before any data
  * moves. Together with [[PiiLeakLinter]] (name-level guard) it gives a
  * DPO both views: the linter fails fast on raw names escaping, the
  * lineage report explains WHERE every published value comes from —
  * including through masking expressions, CASE branches, joins and
  * aggregates (an expression's lineage is the union over ALL its
  * referenced inputs, condition branches included: data-flow, not
  * control-flow-pruned).
  *
  * Mechanics: one bottom-up fold over the plan. Leaf relations map each
  * output attribute to itself (qualified `relation.column` when the leaf
  * carries a name, plain column name otherwise); every other node maps
  * its named expressions to the union of their references' lineage.
  * Driver-side and plan-sized — no jobs run.
  */
object Lineage {

  /** An expression node whose output no longer exposes its inputs' raw
    * values — the approved masking vocabulary [[MaskModelShapes]] the
    * masking compiler ([[graft.masking.MaskModel]] /
    * [[graft.masking.Masking]]) emits:
    *
    *   - cryptographic digests (sha2/sha1/md5/crc32): HashSha256 masking
    *     and the dbt-utils surrogate key;
    *   - round/bround: Round2Decimals coordinate coarsening (and the
    *     geohash built on it);
    *   - is [not] null: presence flags and completeness arithmetic —
    *     a one-bit channel, the reference publishes these by design;
    *   - comparisons against a foldable side (`c != ''`, range checks):
    *     the guard conditions inside every masking CASE — also ≤1 bit;
    *   - the partial-phone fingerprint: a concat carrying MaskModel's
    *     literal `" XX XX XX XX"` padding whose every non-literal child
    *     is a bounded-prefix `substring` (literal start/length) — the
    *     FULL compiled shape. The padding literal alone is NOT enough:
    *     `concat(contact_email, ' XX XX XX XX')` keeps the whole raw
    *     value and must stay raw-path, and bare
    *     `substring(contact_email, 1, 3)` under an innocent alias is the
    *     canonical disguised LEAK and must too.
    *
    * Anything else (cast, trim, lower, concat, arithmetic, bare
    * substring) is value-preserving enough to keep the raw-path taint.
    *
    * Honesty bound: this certifies HONEST pipelines, not adversarial
    * ones. The ≤1-bit channels (presence bits, literal comparisons) are
    * sanitizers because the reference publishes them by design, but an
    * adversary could chain many of them (a CASE dictionary over
    * equality probes) into a decoder; mechanically bounding that needs
    * information-flow budgets (the DP layer's territory), not shape
    * matching. The gate's job is catching accidental raw paths, which
    * are shaped like projections — and those it catches structurally.
    */
  private def isSanitizer(e: Expression): Boolean = sanitizerKind(e).isDefined

  /** The sanitizer KIND a node applies — the vocabulary the
    * declared-method reconciliation matches against: `hash` (crypto
    * digests), `round`, `partial` (the compiled partial-mask concat),
    * and the one-bit auxiliary channels `presence` / `compare` that the
    * reference publishes by design and that no declared method claims.
    */
  private def sanitizerKind(e: Expression): Option[String] = e match {
    case _: Sha2 | _: Sha1 | _: Md5 | _: Crc32 => Some("hash")
    case _: Round | _: BRound => Some("round")
    case _: IsNull | _: IsNotNull => Some("presence")
    case cmp: BinaryComparison if cmp.children.exists(_.foldable) => Some("compare")
    case c: Concat
        if c.children.exists {
          case Literal(v, _) => v != null && v.toString == " XX XX XX XX"
          case _ => false
        } &&
          c.children.forall {
            case Literal(_, _) => true
            // the EXACT compiled shape MaskModel emits: a prefix of at
            // most 6 characters from position 1 (Masking.maskPhone's
            // substring(trim(c), 1, keepChars<=6)). A merely-foldable
            // pos/len would also admit substring(c, 1, 100) — a near-shape
            // variant carrying essentially the whole raw value, which must
            // stay raw-path
            case s: Substring =>
              (s.pos, s.len) match {
                case (Literal(p: Int, _), Literal(l: Int, _)) => p == 1 && l <= 6
                case _ => false
              }
            case _ => false
          } => Some("partial")
    case _ => None
  }

  /** The EXACT compiled shape [[graft.policy.ColumnRetention.expire]]
    * emits — `CASE WHEN isnotnull(ts) AND datediff(asOf, ts) <= days
    * THEN value END` with an attribute-free `asOf`, the SAME ts
    * attribute on both conjuncts, and no ELSE — recognized as a
    * retention-window
    * guard of `days` days. Not a sanitizer (inside the window the raw
    * value passes through untouched — a guard must never launder a raw
    * path into a masked one); it contributes only the `retention:<days>`
    * path kind the storage-limitation reconciliation
    * ([[retentionMismatches]]) matches against. Near-shape variants
    * (a different ts in the two conjuncts, a non-foldable asOf, an ELSE
    * branch) stay unrecognized, the same strictness as the partial-mask
    * fingerprint.
    */
  private def retentionGuardDays(e: Expression): Option[Int] = e match {
    case CaseWhen(
        Seq((And(IsNotNull(ts1: Attribute),
          LessThanOrEqual(dd: DateDiff, Literal(days: Int, _))), _)),
        None) =>
      dd.children match {
        // "constant asOf" = references no attribute (foldable would be
        // cleaner but RuntimeReplaceable wrappers like ParseToDate report
        // non-foldable before replacement): the bound must not depend on
        // row data, or "now()-per-row" shapes could masquerade as guards
        case Seq(asOf, ts2: Attribute)
            if asOf.references.isEmpty && ts2.exprId == ts1.exprId =>
          Some(days)
        case _ => None
      }
    case _ => None
  }

  private def retentionKind(days: Int): String = s"retention:$days"

  /** One bottom-up fold computing BOTH lineage maps per attribute id:
    * full data-flow lineage (every leaf column whose value can reach the
    * attribute) and RAW-path lineage (leaf columns reachable via at
    * least one path that never crosses a sanitizer — see
    * [[isSanitizer]]). `raw ⊆ full` by construction; a PII source in
    * `full` but not `raw` flows exclusively through approved masking.
    */
  /** Per source column, the set of PATH SIGNATURES from an attribute back
    * to it: each signature is the set of sanitizer kinds crossed on one
    * distinct path (∅ = a raw path). Bounded: at most 2^5 distinct
    * signatures exist, so the fold stays plan-sized.
    */
  private type PathKinds = Map[String, Set[Set[String]]]

  private def selfRooted(name: String): PathKinds =
    Map(name -> Set(Set.empty[String]))

  private def mergePathKinds(ms: Seq[PathKinds]): PathKinds =
    ms.flatten.groupBy(_._1).map { case (s, vs) => s -> vs.flatMap(_._2).toSet }

  private def foldLineage(
      plan: LogicalPlan
  ): (mutable.Map[Long, Set[String]], mutable.Map[Long, Set[String]],
      mutable.Map[Long, PathKinds]) = {
    val lin = mutable.Map.empty[Long, Set[String]]
    val raw = mutable.Map.empty[Long, Set[String]]
    val knd = mutable.Map.empty[Long, PathKinds]

    def exprRefs(e: Expression): Set[String] =
      e.references.toSeq.flatMap(a => lin.getOrElse(a.exprId.id, Set(a.name))).toSet

    def rawRefs(e: Expression): Set[String] = e match {
      case _ if isSanitizer(e) => Set.empty
      case a: Attribute => raw.getOrElse(a.exprId.id, Set(a.name))
      case other => other.children.flatMap(rawRefs).toSet
    }

    def kindRefs(e: Expression): PathKinds = {
      val base = e match {
        case a: Attribute => knd.getOrElse(a.exprId.id, selfRooted(a.name))
        case other => mergePathKinds(other.children.map(kindRefs))
      }
      val kinds =
        sanitizerKind(e).toSeq ++ retentionGuardDays(e).map(retentionKind)
      kinds.foldLeft(base)((m, k) =>
        m.map { case (s, paths) => s -> paths.map(_ + k) })
    }

    def visit(p: LogicalPlan): Unit = {
      p.children.foreach(visit)
      p match {
        case leaf: LeafNode =>
          // a leaf's own attributes are the lineage roots
          leaf.output.foreach { a =>
            lin(a.exprId.id) = Set(a.name)
            raw(a.exprId.id) = Set(a.name)
            knd(a.exprId.id) = selfRooted(a.name)
          }
        case g: Generate =>
          // the generator's output attributes (explode/posexplode/inline
          // results) derive from the generator expression's inputs — they
          // are plain Attributes, so the NamedExpression walk below would
          // miss them and the pass-through default would self-root them
          val genLin = exprRefs(g.generator)
          val genRaw = rawRefs(g.generator)
          val genKnd = kindRefs(g.generator)
          g.generatorOutput.foreach { a =>
            lin(a.exprId.id) = genLin
            raw(a.exprId.id) = genRaw
            knd(a.exprId.id) = genKnd
          }
          g.output.foreach { a =>
            if (!lin.contains(a.exprId.id)) lin(a.exprId.id) = Set(a.name)
            if (!raw.contains(a.exprId.id)) raw(a.exprId.id) = Set(a.name)
            if (!knd.contains(a.exprId.id)) knd(a.exprId.id) = selfRooted(a.name)
          }
        case u: Union =>
          // each output column merges the positionally-corresponding
          // column of EVERY branch; keying off the first child alone (or
          // the pass-through default) loses the other branches' roots
          u.output.zipWithIndex.foreach { case (a, i) =>
            lin(a.exprId.id) = u.children.flatMap { c =>
              val ca = c.output(i)
              lin.getOrElse(ca.exprId.id, Set(ca.name))
            }.toSet
            raw(a.exprId.id) = u.children.flatMap { c =>
              val ca = c.output(i)
              raw.getOrElse(ca.exprId.id, Set(ca.name))
            }.toSet
            knd(a.exprId.id) = mergePathKinds(u.children.map { c =>
              val ca = c.output(i)
              knd.getOrElse(ca.exprId.id, selfRooted(ca.name))
            })
          }
        case other =>
          // named expressions (projections, aggregates, window outputs)
          // define new attributes from their referenced inputs
          other.expressions.foreach { e =>
            e.foreach {
              case ne: NamedExpression if !ne.isInstanceOf[Attribute] =>
                lin(ne.exprId.id) = exprRefs(ne)
                raw(ne.exprId.id) = rawRefs(ne)
                knd(ne.exprId.id) = kindRefs(ne)
              case _ =>
            }
          }
          // attributes that pass through unchanged keep their lineage
          other.output.foreach { a =>
            if (!lin.contains(a.exprId.id)) lin(a.exprId.id) = Set(a.name)
            if (!raw.contains(a.exprId.id)) raw(a.exprId.id) = Set(a.name)
            if (!knd.contains(a.exprId.id)) knd(a.exprId.id) = selfRooted(a.name)
          }
      }
    }
    visit(plan)
    (lin, raw, knd)
  }

  /** (out_col, src_cols sorted and comma-joined, n_src) per output column. */
  def columnLineage(df: DataFrame): Seq[(String, Seq[String])] = {
    val plan = df.queryExecution.analyzed
    val (lin, _, _) = foldLineage(plan)
    plan.output.map(a =>
      a.name -> lin.getOrElse(a.exprId.id, Set(a.name)).toSeq.sorted)
  }

  /** Per output column: full lineage AND the raw-path subset (sources
    * reachable without crossing an approved masking node).
    */
  def columnLineageWithRaw(df: DataFrame): Seq[(String, Seq[String], Seq[String])] = {
    val plan = df.queryExecution.analyzed
    val (lin, raw, _) = foldLineage(plan)
    plan.output.map { a =>
      (a.name,
        lin.getOrElse(a.exprId.id, Set(a.name)).toSeq.sorted,
        raw.getOrElse(a.exprId.id, Set(a.name)).toSeq.sorted)
    }
  }

  /** PII-exposure audit: for every published column, whether its VALUE
    * structurally depends on any PII-tagged source column — and which.
    * This is strictly stronger than [[PiiLeakLinter]]'s name-level
    * guard: `substring(contact_email, 1, 3) AS region_hint` sails past a
    * name check but is flagged here, because lineage follows data flow,
    * not names. What it cannot judge is whether the dependency passes
    * through an approved masking expression — that is the policy
    * review's call, which is exactly why the output is a REPORT (with
    * the depended-on PII columns spelled out) rather than an exception.
    */
  def piiExposure(df: DataFrame, piiSourceCols: Set[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    columnLineage(df)
      .map { case (out, srcs) =>
        val pii = srcs.filter(piiSourceCols.contains).sorted
        (out, pii.mkString(","), if (pii.nonEmpty) 1 else 0)
      }
      .toDF("out_col", "pii_sources", "derives_from_pii")
  }

  /** Masking-aware PII exposure: [[piiExposure]] plus the raw/masked
    * classification — for every published column, WHICH PII sources it
    * depends on, which of those arrive via a path that never crosses an
    * approved masking node ([[isSanitizer]]), and the per-column verdict
    * `all_pii_masked` (vacuously 1 for PII-free columns). This turns the
    * exposure REPORT into a mechanical GATE: `q_release_cert` publishes
    * only when every column's bit is 1, and a deliberately-injected raw
    * passthrough (`substring(contact_email, 1, 3)`) flips it to 0 while
    * the normal mart certifies.
    */
  def maskedPiiExposure(df: DataFrame, piiSourceCols: Set[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    columnLineageWithRaw(df)
      .map { case (out, srcs, raws) =>
        val pii = srcs.filter(piiSourceCols.contains).sorted
        val rawPii = raws.filter(piiSourceCols.contains).sorted
        (out, pii.mkString(","), if (pii.nonEmpty) 1 else 0,
          rawPii.mkString(","), if (rawPii.isEmpty) 1 else 0)
      }
      .toDF("out_col", "pii_sources", "derives_from_pii",
        "raw_pii_sources", "all_pii_masked")
  }


  /** Value-bearing sanitizer kinds — the ones a declared anonymization
    * method claims. `presence`/`compare` are the reference's one-bit
    * auxiliary channels (flags, completeness, CASE guards) that no
    * method declares and every method tolerates.
    */
  private val ValueKinds = Set("hash", "round", "partial")

  /** Which sanitizer kinds SATISFY a declared method. A cryptographic
    * hash satisfies every method — it is strictly stronger than any
    * partial mask or coarsening (the surrogate key md5-hashes columns
    * whose own method is weaker, and a DPO would never flag strength).
    * The gate exists for the opposite direction: a WEAKER-than-declared
    * sanitizer (round where hash_sha256 was declared) must fail.
    */
  private def allowedKinds(method: String): Option[Set[String]] = method match {
    case "hash_sha256" => Some(Set("hash"))
    case "mask_partial" => Some(Set("partial", "hash"))
    case "round_2_decimals" => Some(Set("round", "hash"))
    // suppress references nothing; aggregate_to_city publishes a
    // presence-gated non-PII value; unknown methods fail open and are
    // caught as RAW paths — none constrains the sanitized-path kinds
    case _ => None
  }

  /** Declared-method reconciliation (the policy's `anonymization_method`
    * against the PLAN): for every output column, the PII sources whose
    * sanitized paths use a kind the declared method does not allow —
    * `round` where `hash_sha256` was declared certifies as masked under
    * [[allPiiMasked]] but is NOT the promised protection, and must fail
    * the release certificate's method bit. Raw paths are excluded here
    * (they are [[allPiiMasked]]'s verdict); auxiliary-only paths
    * (presence bits, CASE guards) pass for every method.
    *
    * Precision note: signatures are per PATH (the fold keeps the set of
    * kind-sets, not their union), so a column mixing a correct-method
    * path with a separate weaker-sanitizer path IS flagged. Plan-sized,
    * zero jobs.
    */
  def methodMismatches(
      df: DataFrame,
      declaredMethods: Map[String, String]
  ): Seq[(String, Seq[String])] = {
    val plan = df.queryExecution.analyzed
    val (_, _, knd) = foldLineage(plan)
    plan.output.map { a =>
      val paths = knd.getOrElse(a.exprId.id, selfRooted(a.name))
      val bad = declaredMethods.toSeq.sorted.collect {
        case (src, method) if {
          val allowed = allowedKinds(method)
          allowed.isDefined && paths.getOrElse(src, Set.empty).exists(p =>
            (p & ValueKinds).nonEmpty && (p & allowed.get).isEmpty)
        } => src
      }
      a.name -> bad
    }
  }

  /** True iff every sanitized PII path uses a kind its declared method
    * allows — the per-method bit the release certificate carries next to
    * [[allPiiMasked]].
    */
  def methodsReconcile(df: DataFrame, declaredMethods: Map[String, String]): Boolean =
    methodMismatches(df, declaredMethods).forall(_._2.isEmpty)

  /** The one-bit auxiliary channels (presence flags, foldable
    * comparisons) the reference publishes by design: a path that crosses
    * one carries at most a bit of the source value, so neither the
    * declared-method gate nor the retention gate constrains it.
    */
  private val AuxKinds = Set("presence", "compare")

  /** Storage-limitation reconciliation (the policy's `retention_days`
    * against the PLAN): for every output column, the governed PII
    * sources with at least one VALUE-BEARING path (raw or sanitized —
    * a hash of an expired email is still derived from data past its
    * window) that never crosses that column's declared retention guard
    * ([[retentionGuardDays]] — the shape
    * [[graft.policy.ColumnRetention.expire]] compiles, with EXACTLY the
    * declared day count: a hand-written `<= 9999` guard does not
    * discharge a 730-day obligation). Auxiliary-only paths (presence
    * bits, CASE guards) pass: they survive expiry by design. Per-path
    * like [[methodMismatches]] — a column mixing a guarded path with an
    * unguarded one IS flagged. Plan-sized, zero jobs.
    */
  def retentionMismatches(
      df: DataFrame,
      declaredWindows: Map[String, Int]
  ): Seq[(String, Seq[String])] = {
    val plan = df.queryExecution.analyzed
    val (_, _, knd) = foldLineage(plan)
    plan.output.map { a =>
      val paths = knd.getOrElse(a.exprId.id, selfRooted(a.name))
      val bad = declaredWindows.toSeq.sorted.collect {
        case (src, days) if paths.getOrElse(src, Set.empty).exists(p =>
          (p & AuxKinds).isEmpty && !p.contains(retentionKind(days))) => src
      }
      a.name -> bad
    }
  }

  /** True iff every value-bearing path from a `retention_days`-governed
    * PII source crosses its declared retention guard — the
    * storage-limitation bit next to [[allPiiMasked]] and
    * [[methodsReconcile]] in the certificate family.
    */
  def retentionEnforced(df: DataFrame, declaredWindows: Map[String, Int]): Boolean =
    retentionMismatches(df, declaredWindows).forall(_._2.isEmpty)

  /** True iff NO published column carries a raw (unmasked) PII path —
    * the one-bit form [[maskedPiiExposure]] feeds the release
    * certificate. Plan-sized, zero jobs.
    */
  def allPiiMasked(df: DataFrame, piiSourceCols: Set[String]): Boolean =
    columnLineageWithRaw(df).forall { case (_, _, raws) =>
      !raws.exists(piiSourceCols.contains)
    }

  /** The lineage as a one-row-per-output-column DataFrame (sorted comma
    * string keeps the compared output array-free for the oracle).
    */
  def report(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    columnLineage(df)
      .map { case (out, srcs) => (out, srcs.mkString(","), srcs.length) }
      .toDF("out_col", "src_cols", "n_src")
  }
}
