package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.policy.PolicyCatalog

/** Catalyst-level PII-leak linter — the "optional hardening" rule from
  * SURVEY.md §4: verifies that no column policy-tagged as PII escapes a
  * query plan under its raw (un-`_anon`-suffixed) name once the plan is
  * marked public.
  *
  * This is additive to the reference's behavior (the reference has no
  * optimizer surface at all); it turns the runtime `assert_no_pii_in_marts`
  * test into a compile-time guarantee, the Spark-native analogue of dbt's
  * `validate_pii_metadata` parse-time guard.
  *
  * Installed via [[GraftSparkExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftSparkExtensions`) or per-session
  * with [[PiiLeakLinter.enable]]. Activation is explicit and scoped: only
  * plans produced while [[PiiLeakLinter.guard]] is active are checked, so
  * the staging/anonymization stages (which legitimately read raw PII) are
  * unaffected.
  */
class PiiLeakLinter(catalog: PolicyCatalog) extends Rule[LogicalPlan] {

  private lazy val piiColumns: Set[String] =
    catalog.models.values.flatMap(_.collect { case (name, p) if p.pii => name }).toSet

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (PiiLeakLinter.guarding.get()) {
      val leaked = plan.output.map(_.name).filter(piiColumns.contains)
      if (leaked.nonEmpty) {
        throw new IllegalStateException(
          s"PII-leak linter: raw PII column(s) ${leaked.mkString(", ")} would " +
            "escape a public plan; route them through maskModel first " +
            "(columns are expected under their *_anon names)."
        )
      }
    }
    plan
  }
}

object PiiLeakLinter {

  private val guarding = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Run `body` with the linter active: any plan optimized inside that
    * exposes a raw PII column name fails fast.
    */
  def guard[T](body: => T): T = {
    guarding.set(true)
    try body
    finally guarding.set(false)
  }

  /** Install on an existing session builder via extensions. */
  def enable(extensions: SparkSessionExtensions, catalog: PolicyCatalog): Unit =
    extensions.injectOptimizerRule(_ => new PiiLeakLinter(catalog))
}

/** `spark.sql.extensions` entry point wiring the linter with the reference
  * policy catalog.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    PiiLeakLinter.enable(extensions, PolicyCatalog.reference)
}
