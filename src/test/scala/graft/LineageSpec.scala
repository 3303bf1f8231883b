package graft

import org.apache.spark.sql.functions._

import graft.plans.Lineage

class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def lin(df: org.apache.spark.sql.DataFrame): Map[String, Seq[String]] =
    Lineage.columnLineage(df).toMap

  /** Re-root a frame as a named leaf (tuple frames otherwise trace to
    * `_1/_2` leaf names — the q_lineage convention).
    */
  private def leaf(df: org.apache.spark.sql.DataFrame) =
    spark.createDataFrame(df.rdd, df.schema)

  test("projections, literals, and pass-through columns") {
    val base = leaf(Seq((1, "a", 2.0)).toDF("x", "y", "z"))
    val df = base.select(
      $"x",
      concat($"y", lit("!")).as("shout"),
      ($"x" + $"z").as("xz"),
      lit("v1").as("version"))
    val m = lin(df)
    assert(m("x") == Seq("x"))
    assert(m("shout") == Seq("y"))
    assert(m("xz") == Seq("x", "z"))
    assert(m("version") == Seq())
  }

  test("CASE branches contribute data-flow lineage from condition and values") {
    val df = leaf(Seq((1, "a", "b")).toDF("flag", "l", "r"))
      .select(when($"flag" === 1, $"l").otherwise($"r").as("pick"))
    assert(lin(df)("pick") == Seq("flag", "l", "r"))
  }

  test("joins and aggregates union lineage across inputs") {
    val a = leaf(Seq((1, "x")).toDF("id", "name"))
    val b = leaf(Seq((1, 5.0)).toDF("id", "score"))
    val joined = a.join(b, "id")
      .groupBy($"name")
      .agg(sum($"score" + $"id").as("total"))
    val m = lin(joined)
    assert(m("name") == Seq("name"))
    assert(m("total") == Seq("id", "score"))
  }

  test("chained derivations accumulate transitively") {
    val df = leaf(Seq((1.0, 2.0)).toDF("lat", "lon"))
      .select((($"lat" * 100).cast("int")).as("lat100"), $"lon")
      .select(concat($"lat100".cast("string"), lit("_"), $"lon".cast("string")).as("geo"))
    assert(lin(df)("geo") == Seq("lat", "lon"))
  }

  test("pii exposure: a disguised PII derivation is flagged, clean columns are not") {
    val base = leaf(Seq(("a@b.fr", "Paris", 3.0)).toDF("email", "city", "x"))
    val published = base.select(
      substring($"email", 1, 3).as("region_hint"), // disguised PII leak
      upper($"city").as("city_label"),
      lit("v1").as("version"))
    val rows = Lineage.piiExposure(published, Set("email"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(rows("region_hint") == ("email", 1),
      "name-level checks miss this; lineage must not")
    assert(rows("city_label") == ("", 0))
    assert(rows("version") == ("", 0))
  }

  test("explode (Generate) traces generator output to the exploded column") {
    val base = leaf(Seq((1, Seq("a@b.fr", "c@d.fr"))).toDF("id", "emails"))
    val df = base.select($"id", explode($"emails").as("e"))
    assert(lin(df)("e") == Seq("emails"),
      "Generate output attrs must inherit the generator's reference lineage")
    // and the PII audit sees through the explode
    val rows = Lineage.piiExposure(df, Set("emails"))
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(rows("e") == 1)
    assert(rows("id") == 0)
  }

  test("posexplode traces both position and value to the source column") {
    val base = leaf(Seq((1, Seq(2.0, 3.0))).toDF("id", "vs"))
    val df = base.select(posexplode($"vs").as(Seq("pos", "v")))
    val m = lin(df)
    assert(m("pos") == Seq("vs"))
    assert(m("v") == Seq("vs"))
  }

  test("union merges lineage across ALL branches positionally") {
    val a = leaf(Seq(("x@y.fr", 1)).toDF("email", "n"))
      .select($"email".as("c"), $"n")
    val b = leaf(Seq(("Lyon", 2)).toDF("city", "n"))
      .select($"city".as("c"), $"n")
    val m = lin(a.unionByName(b))
    assert(m("c").toSet == Set("city", "email"),
      "a union output column derives from its column in EVERY branch")
    // PII flowing in through the SECOND branch only must still be flagged
    val clean = leaf(Seq(("ok", 1)).toDF("c", "n"))
    val dirty = leaf(Seq(("p@q.fr", 2)).toDF("email", "n"))
      .select($"email".as("c"), $"n")
    val rows = Lineage.piiExposure(clean.unionByName(dirty), Set("email"))
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(rows("c") == 1,
      "round-6 advice: union branches beyond the first were lost")
  }

  test("masked-path classification: approved mask shapes sanitize, a bare substring stays raw") {
    import graft.masking.Masking
    val base = leaf(Seq(("a@b.fr", "0612345678", 48.85, 3.0))
      .toDF("email", "phone", "lat", "x"))
    val published = base.select(
      Masking.maskEmail($"email", "s").as("email_anon"),
      Masking.maskPhone($"phone").as("phone_anon"),
      Masking.maskCoordinates($"lat").as("lat_pub"),
      when($"email".isNotNull, 1).otherwise(0).as("has_email"),
      substring($"email", 1, 3).as("region_hint"), // the disguised leak
      ($"x" * 2).as("x2"))
    val pii = Set("email", "phone", "lat")
    val rows = Lineage.maskedPiiExposure(published, pii)
      .collect()
      .map(r => r.getString(0) -> (r.getInt(2), r.getString(3), r.getInt(4)))
      .toMap
    assert(rows("email_anon") == ((1, "", 1)), "sha2 path is masked")
    assert(rows("phone_anon") == ((1, "", 1)), "partial-phone fingerprint is masked")
    assert(rows("lat_pub") == ((1, "", 1)), "round path is masked")
    assert(rows("has_email") == ((1, "", 1)), "presence bit is masked")
    assert(rows("region_hint") == ((1, "email", 0)),
      "a bare substring of PII is a RAW path — the classifier must not " +
        "bless it just because MaskModel also uses substring")
    assert(rows("x2") == ((0, "", 1)), "PII-free columns are vacuously masked")
    assert(!Lineage.allPiiMasked(published, pii))
    assert(Lineage.allPiiMasked(published.drop("region_hint"), pii),
      "dropping the leak certifies the frame")
  }

  test("lookalike partial-mask concat without MaskModel's padding literal stays raw") {
    val base = leaf(Seq(("0612345678", 1)).toDF("phone", "k"))
    val fake = base.select(
      concat(substring(trim($"phone"), 1, 6), lit("-rest")).as("p"))
    assert(!Lineage.allPiiMasked(fake, Set("phone")),
      "only the compiled maskPhone shape (its exact padding literal) sanitizes")
    // ...and the padding literal alone must not bless a raw passthrough:
    // concat(phone, ' XX XX XX XX') carries the WHOLE value
    val padded = base.select(
      concat($"phone", lit(" XX XX XX XX")).as("p"))
    assert(!Lineage.allPiiMasked(padded, Set("phone")),
      "the fingerprint requires bounded-substring children, not just the padding")
    // the genuine compiled shape still certifies
    val real = base.select(graft.masking.Masking.maskPhone($"phone").as("p"))
    assert(Lineage.allPiiMasked(real, Set("phone")))
    // a near-shape variant carrying the padding literal AND a substring —
    // but with an unbounded keep length — must stay raw: substring(c,1,100)
    // under the padding literal is essentially the whole value
    val wide = base.select(
      concat(substring(trim($"phone"), 1, 100), lit(" XX XX XX XX")).as("p"))
    assert(!Lineage.allPiiMasked(wide, Set("phone")),
      "the fingerprint must bound the substring length to MaskModel's " +
        "compiled keepChars, not accept any foldable length")
    val offset = base.select(
      concat(substring(trim($"phone"), 3, 4), lit(" XX XX XX XX")).as("p"))
    assert(!Lineage.allPiiMasked(offset, Set("phone")),
      "the compiled shape starts at position 1")
  }

  test("declared-method reconciliation: a weaker-than-declared sanitizer fails, strength passes") {
    import graft.plans.Lineage
    val base = leaf(Seq(("a@x.fr", 48.85, 52000.0)).toDF("contact_email", "latitude", "salary"))
    val declared = Map(
      "contact_email" -> "hash_sha256",
      "latitude" -> "round_2_decimals",
      "salary" -> "hash_sha256")

    // the genuine compiled masks reconcile with their declared methods
    val good = base.select(
      graft.masking.Masking.maskEmail($"contact_email", "s", "d").as("email_anon"),
      round($"latitude", 2).as("lat_anon"))
    assert(Lineage.methodsReconcile(good, declared))

    // the gap this gate exists for: salary declared hash_sha256 but
    // published through ROUND — sanitized (allPiiMasked holds!) yet NOT
    // the promised protection
    val swapped = base.select(round($"salary", -3).as("salary_anon"))
    assert(Lineage.allPiiMasked(swapped, Set("salary")),
      "the swap is invisible to the any-sanitizer gate — that is the gap")
    assert(!Lineage.methodsReconcile(swapped, declared),
      "round where hash_sha256 was declared must fail the method bit")
    assert(Lineage.methodMismatches(swapped, declared)
      .exists { case (out, bad) => out == "salary_anon" && bad == Seq("salary") })

    // per-PATH precision: a column mixing a correct-method path with a
    // separate weaker-sanitizer path is still flagged
    val mixed = base.select(
      concat(sha2($"salary".cast("string"), 256),
        round($"salary", -3).cast("string")).as("salary_blend"))
    assert(!Lineage.methodsReconcile(mixed, declared))

    // strength passes: a crypto hash satisfies a weaker declared method
    val stronger = base.select(sha2($"latitude".cast("string"), 256).as("lat_anon"))
    assert(Lineage.methodsReconcile(stronger, declared))

    // auxiliary one-bit channels are method-agnostic
    val flags = base.select($"salary".isNotNull.cast("int").as("has_salary"))
    assert(Lineage.methodsReconcile(flags, declared))

    // ...and the REAL mart reconciles against the reference catalog
    import graft.policy.PolicyCatalog
    val cat = PolicyCatalog.reference
    val catDeclared = cat.models.values.flatMap(_.collect {
      case (n, p) if p.pii && p.anonymizationMethod.isDefined =>
        n -> p.anonymizationMethod.get.name
    }).toMap
    val svc = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      graft.queries.Tables.services(spark, "/root/testdata/sf0.001").schema)
    val mart = graft.pipeline.Pipeline.mart(
      graft.pipeline.Pipeline.enrich(
        graft.pipeline.Pipeline.anonymize(
          graft.pipeline.Pipeline.staging(svc), cat)))
    assert(Lineage.methodsReconcile(mart, catDeclared),
      "every published mart column must sanitize via its DECLARED method")
  }

  test("an injected raw passthrough flips the release-cert masking gate; the mart certifies") {
    import graft.pipeline.Pipeline
    import graft.policy.PolicyCatalog
    val cat = PolicyCatalog.reference
    val pii = cat.models.values
      .flatMap(_.collect { case (n, p) if p.pii => n }).toSet
    val svc = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      graft.queries.Tables.services(spark, "/root/testdata/sf0.001").schema)
    val mart = Pipeline.mart(
      Pipeline.enrich(Pipeline.anonymize(Pipeline.staging(svc), cat)))
    assert(Lineage.allPiiMasked(mart, pii),
      "the normal mart must certify: every PII path crosses a masker")
    val leaky = Pipeline.mart(
      Pipeline.enrich(
        Pipeline.anonymize(Pipeline.staging(svc), cat)
          .withColumn("email_hint_anon", substring(col("contact_email_anon"), 1, 3))))
    // contact_email_anon is already masked — the hint stays certified;
    // the REAL leak threads the raw staging column through
    val rawLeak = Pipeline.enrich(
      Pipeline.anonymize(Pipeline.staging(svc), cat))
    val stagedRaw = Pipeline.staging(svc).select(col("service_id"),
      substring(col("contact_email"), 1, 3).as("region_hint"))
    val leakyMart = Pipeline.mart(rawLeak)
      .join(stagedRaw, Seq("service_id"), "left")
    assert(Lineage.allPiiMasked(leaky, pii),
      "a derivation of an already-masked column keeps certifying")
    assert(!Lineage.allPiiMasked(leakyMart, pii),
      "a raw passthrough joined into the published frame must flip the gate to no-go")
  }

  test("window functions carry partition/order/frame references") {
    import org.apache.spark.sql.expressions.Window
    val df = leaf(Seq((1, "g", 2.0)).toDF("id", "grp", "v"))
      .withColumn("rank_v",
        row_number().over(Window.partitionBy($"grp").orderBy($"v")))
    val m = lin(df)
    assert(m("rank_v").toSet.subsetOf(Set("grp", "v")))
    assert(m("rank_v").nonEmpty)
  }
}
