package graft

import org.apache.spark.sql.functions._

import graft.validate.KAnonymity
import graft.validate.KAnonymity.Rung

/** Generalize-to-k enforcement specs. */
class KAnonymitySpec extends SparkSpec {
  import spark.implicits._

  private def ladderOf(zipCol: String) = Seq(
    Rung("zip", col(zipCol)),
    Rung("dept", substring(col(zipCol), 1, 2)),
    Rung("country", lit("FR"))
  )

  test("probe: one grouping-sets pass reports every rung's floor (null = its own group)") {
    // zips: 751xx x6 (two distinct), 920xx x3, null x2
    val zips = Seq("75101", "75101", "75101", "75102", "75102", "75102",
      "92001", "92001", "92001", null, null)
    val df = zips.zipWithIndex.map { case (z, i) => (i.toLong, z) }.toDF("id", "zip")
    val audits = KAnonymity.probe(df, ladderOf("zip"))
    assert(audits.map(_.label) == Seq("zip", "dept", "country"))
    assert(audits(0).nGroups == 4 && audits(0).minGroup == 2) // null group of 2
    assert(audits(1).nGroups == 3 && audits(1).minGroup == 2) // 75 x6, 92 x3, null x2
    assert(audits(2).nGroups == 1 && audits(2).minGroup == 11)
  }

  test("enforce picks the FIRST rung meeting k; rows keep their generalized value") {
    // zip groups of 3 < k=5; dept groups: 75 x6, 92 x6 -> rung 1
    val zips = (1 to 3).map(_ => "75101") ++ (1 to 3).map(_ => "75102") ++
      (1 to 3).map(_ => "92001") ++ (1 to 3).map(_ => "92002")
    val df = zips.zipWithIndex.map { case (z, i) => (i.toLong, z) }.toDF("id", "zip")
    val (rung, out) = KAnonymity.enforce(df, ladderOf("zip"), k = 5)
    assert(rung == 1)
    assert(out.count() == 12) // nothing suppressed
    val vals = out.select("qi_generalized").distinct().as[String].collect().toSet
    assert(vals == Set("75", "92"))
    val minG = out.groupBy("qi_generalized").count().agg(min("count")).as[Long].head()
    assert(minG >= 5)
  }

  test("enforce falls back to coarsest + suppression when no rung reaches k") {
    // 3 rows total: every rung (even 'FR') has a group of 3 < k=5
    val df = Seq((1L, "75101"), (2L, "92001"), (3L, "13001")).toDF("id", "zip")
    val (rung, out) = KAnonymity.enforce(df, ladderOf("zip"), k = 5)
    assert(rung == 2)
    assert(out.count() == 0) // the single FR group of 3 is suppressed
    // with a mixed case, only the small residual groups drop
    val df2 = ((1 to 6).map(i => (i.toLong, "75101")) ++ Seq((7L, null.asInstanceOf[String])))
      .toDF("id", "zip")
    val shortLadder = Seq(Rung("zip", col("zip"))) // no coarser escape
    val (r2, out2) = KAnonymity.enforce(df2, shortLadder, k = 5)
    assert(r2 == 0)
    assert(out2.count() == 6) // the null singleton suppressed, 75101 kept
    val left = out2.select("qi_generalized").distinct().as[String].collect().toSeq
    assert(left == Seq("75101"))
  }

  test("enforce refuses an output-column collision") {
    val df = Seq((1L, "75101")).toDF("id", "qi_generalized")
    val ex = intercept[IllegalArgumentException] {
      KAnonymity.enforce(df, Seq(Rung("z", col("qi_generalized"))), k = 1)
    }
    assert(ex.getMessage.contains("already exists"))
  }
}
