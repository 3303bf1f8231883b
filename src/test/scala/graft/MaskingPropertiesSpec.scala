package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.masking.Masking._

/** Property tests for the invariants the reference states informally
  * (SURVEY.md §5): NULL/empty-safety, determinism under fixed salt,
  * masking idempotence on already-masked values, rounding bounds,
  * k-anonymity monotonicity under coarsening.
  */
class MaskingPropertiesSpec extends SparkSpec {

  /** Deterministic ScalaCheck sampling (no scalatestplus in the offline
    * cache): draw `n` values from `g` with fixed seeds.
    */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAllSampled[T](g: Gen[T], n: Int = 40)(check: T => Unit): Unit =
    samples(g, n).foreach(check)

  import spark.implicits._

  private val salt = "dev_salt_UNSAFE"

  private val emailGen: Gen[String] = for {
    user <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(12))
    dom  <- Gen.oneOf("example.fr", "Ex.FR", "hatvp.fr", "a.b.c.fr")
  } yield s"$user@$dom"

  private def maskEmailOnce(values: Seq[String]): Seq[String] =
    values.toDF("e").select(maskEmail($"e", salt)).as[String].collect().toSeq

  test("property: mask_email is deterministic and shape-stable for any input") {
    forAllSampled(Gen.listOfN(8, emailGen), n = 5) { emails =>
      val once  = maskEmailOnce(emails)
      val twice = maskEmailOnce(emails)
      assert(once == twice) // deterministic under fixed salt
      once.foreach { m =>
        assert(m.startsWith("user_") && m.endsWith("@anonymized.gouv.fr"))
        // kept 16 chars are hex-of-hex: digits only (SURVEY §7.1)
        assert(m.stripPrefix("user_").takeWhile(_ != '@').forall(_.isDigit))
      }
    }
  }

  test("property: masking an already-masked email is stable (idempotent shape)") {
    forAllSampled(Gen.listOfN(6, emailGen), n = 4) { emails =>
      val masked  = maskEmailOnce(emails)
      val remask  = maskEmailOnce(masked)
      // re-masking produces valid masked emails again (pipeline-safe)
      remask.foreach(m => assert(m.endsWith("@anonymized.gouv.fr")))
      // and the no-PII invariant can't regress
      assert(remask.forall(_.contains("@anonymized.gouv.fr")))
    }
  }

  test("property: NULL/empty inputs always map to NULL for email+phone masks") {
    val df = Seq[Option[String]](None, Some(""), Some(" "), Some("x")).toDF("c")
    val out = df.select(
      maskEmail($"c", salt).as("e"),
      maskPhone($"c").as("p")
    ).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // NULL
    assert(out(1).isNullAt(0) && out(1).isNullAt(1)) // empty string
    assert(!out(2).isNullAt(0) && !out(2).isNullAt(1)) // single space is non-empty
  }

  test("property: coordinate rounding keeps |x - round(x)| <= 0.005 + decimal(18,3) cast error") {
    val lats = samples(Gen.chooseNum(-90.0, 90.0), 60)
    val rs = lats.toDF("x").select(maskCoordinates($"x"))
      .as[java.math.BigDecimal].collect()
    // two-step bug-compatible rounding: double -> DECIMAL(18,3) (±0.0005)
    // then round to 2 decimals (±0.005)
    lats.zip(rs).foreach { case (lat, r) =>
      assert(math.abs(r.doubleValue() - lat) <= 0.0056)
    }
  }

  test("property: masked phone always ends ' XX XX XX XX' and keeps <= 6 chars prefix") {
    forAllSampled(Gen.listOfN(6, Gen.numStr.map("+33 " + _)), n = 5) { phones =>
      val out = phones.toDF("p").select(maskPhone($"p")).as[String].collect()
      out.foreach { m =>
        assert(m.endsWith(" XX XX XX XX"))
        assert(m.length <= 6 + " XX XX XX XX".length)
      }
    }
  }

  test("property: k-anonymity violations shrink monotonically under coarsening") {
    // grouping by a coarser key can only merge groups -> fewer small groups
    val df = (1 to 400)
      .map(i => (i, s"k${i % 97}", s"c${i % 13}"))
      .toDF("id", "fine", "coarse")
    val fineViol = graft.validate.Validate
      .kAnonymityViolations(df, "fine", 5).count()
    val coarseViol = graft.validate.Validate
      .kAnonymityViolations(df, "coarse", 5).count()
    assert(coarseViol <= fineViol)
    // and every coarse group size >= the min fine group size it absorbed
    val minFine = df.groupBy("fine").count().agg(min("count")).as[Long].head()
    val minCoarse = df.groupBy("coarse").count().agg(min("count")).as[Long].head()
    assert(minCoarse >= minFine)
  }

  test("property: simhash hamming distance respects token-overlap ordering on perturbations") {
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.dropRight(2) ++ Seq("x1", "x2")      // 38/40 shared
    val far  = (1 to 40).map(i => s"other$i")            // 0 shared
    val df = Seq(base, near, far).map(t => Tuple1(t)).toDF("t")
    val sigs = df.select(graft.dedup.Dedup.simhash($"t")).as[Long].collect()
    val dNear = java.lang.Long.bitCount(sigs(0) ^ sigs(1))
    val dFar  = java.lang.Long.bitCount(sigs(0) ^ sigs(2))
    assert(dNear < dFar)
  }
}
