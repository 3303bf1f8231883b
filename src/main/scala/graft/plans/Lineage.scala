package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, NamedExpression}
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

  /** (out_col, src_cols sorted and comma-joined, n_src) per output column. */
  def columnLineage(df: DataFrame): Seq[(String, Seq[String])] = {
    val plan = df.queryExecution.analyzed
    val lin = mutable.Map.empty[Long, Set[String]]

    def exprRefs(e: Expression): Set[String] =
      e.references.toSeq.flatMap(a => lin.getOrElse(a.exprId.id, Set(a.name))).toSet

    def visit(p: LogicalPlan): Unit = {
      p.children.foreach(visit)
      p match {
        case leaf: LeafNode =>
          // a leaf's own attributes are the lineage roots
          leaf.output.foreach { a =>
            lin(a.exprId.id) = Set(a.name)
          }
        case g: Generate =>
          // the generator's output attributes (explode/posexplode/inline
          // results) derive from the generator expression's inputs — they
          // are plain Attributes, so the NamedExpression walk below would
          // miss them and the pass-through default would self-root them
          val genLin = exprRefs(g.generator)
          g.generatorOutput.foreach(a => lin(a.exprId.id) = genLin)
          g.output.foreach { a =>
            if (!lin.contains(a.exprId.id)) lin(a.exprId.id) = Set(a.name)
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
          }
        case other =>
          // named expressions (projections, aggregates, window outputs)
          // define new attributes from their referenced inputs
          other.expressions.foreach { e =>
            e.foreach {
              case ne: NamedExpression if !ne.isInstanceOf[Attribute] =>
                lin(ne.exprId.id) = exprRefs(ne)
              case _ =>
            }
          }
          // attributes that pass through unchanged keep their lineage
          other.output.foreach { a =>
            if (!lin.contains(a.exprId.id)) lin(a.exprId.id) = Set(a.name)
          }
      }
    }
    visit(plan)
    plan.output.map(a =>
      a.name -> lin.getOrElse(a.exprId.id, Set(a.name)).toSeq.sorted)
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
