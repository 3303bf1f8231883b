package graft

import org.apache.spark.sql.execution.ExplainMode

import graft.queries.Registry

/** Plan-regression guard: every registry query's physical plan must stay
  * scale-safe. The properties proven once in docs/PLANS.md become a gate
  * here so they cannot silently regress:
  *
  *   1. no `CartesianProduct` and no `BroadcastNestedLoopJoin` anywhere —
  *      the two shapes that turn a 100 TB join into an all-pairs explosion.
  *      Exception: the two scalar-subquery-pattern queries that broadcast a
  *      SINGLE-ROW aggregate against the fact side; that cross product is
  *      n*1 by construction and is the idiomatic Spark spelling of
  *      `WHERE x > (SELECT max(...) ...)`.
  *   2. pinned positive pushdown evidence on queries that filter base
  *      tables: the filters must keep reaching the parquet scans as
  *      `PushedFilters` entries. (A universal "every scan has a
  *      PushedFilters section" check is NOT possible — Spark omits the
  *      section entirely for unfiltered scans.)
  *
  * Plans are built (analyzed + planned) against sf0.001 but not executed,
  * except where a query's construction itself runs a bounded driver action
  * (IVF centroid collect, top-k query-vector head — both k×dim sized).
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** single-row broadcast builds: the deliberate scalar-subquery pattern
    * (q_key_skew broadcasts its single-row grand-total against the top-N)
    */
  private val singleRowBroadcast =
    Set("q_scalar_subquery", "q_embed_topk", "q_key_skew")

  Registry.all.foreach { case (name, q) =>
    test(s"plan guard: $name") {
      val df = q.fn(spark, dir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      if (!singleRowBroadcast(name)) {
        assert(
          !plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin — unbounded all-pairs at scale:\n$plan")
        assert(
          !plan.contains("CartesianProduct"),
          s"$name plans a CartesianProduct:\n$plan")
      }
    }
  }

  /** query -> fragment that must appear in a parquet scan's PushedFilters */
  private val pinnedPushdown = Map(
    "q_star_join" -> "PushedFilters: [IsNotNull(c_custkey)",
    "q_embed_topk" -> "EqualTo(vec_id,0)",
    "q_semi_anti_join" -> "PushedFilters: [IsNotNull("
  )

  pinnedPushdown.foreach { case (name, fragment) =>
    test(s"plan guard pin: $name keeps its filter pushed to the parquet scan") {
      val plan = Registry
        .all(name)
        .fn(spark, dir)
        .queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains(fragment), s"expected `$fragment` in:\n$plan")
    }
  }

  test("canon guard: no compared output carries decimal or array columns") {
    // The driver's hasher reads Spark output from parquet (decimal ->
    // python Decimal) but the oracle via duckdb .df() (decimal -> float64):
    // equal values, different hash (docs/ROUND2.md #20). And its pandas
    // sort dies on array columns (round-1 q_multimodal_features). Every
    // decimal-bearing compared column must therefore be listed in
    // Canon.stringCols — after Canon.wrap it comes out as a string — and
    // arrays must be projected to scalars before comparison.
    import org.apache.spark.sql.types.{ArrayType, DecimalType}
    val offenders = Registry.all.flatMap { case (name, q) =>
      q.oracle.toSeq.flatMap { _ =>
        q.fn(spark, dir).schema.fields.collect {
          case f if f.dataType.isInstanceOf[DecimalType] =>
            s"$name.${f.name}: ${f.dataType.simpleString} (add to Canon.stringCols)"
          case f if f.dataType.isInstanceOf[ArrayType] =>
            s"$name.${f.name}: ${f.dataType.simpleString} (driver cannot sort arrays)"
        }
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
