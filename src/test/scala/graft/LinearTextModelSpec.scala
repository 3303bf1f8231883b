package graft

import org.apache.spark.sql.functions._

import graft.text.{LinearTextModel, TextAnalysis}

/** In-engine trained hashed-feature linear model (quality distillation). */
class LinearTextModelSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"),
      TextAnalysis.qualityScore(col("text")).as("y"))

  test("distills the quality heuristic: correlated, beats the constant predictor") {
    val c = corpus().cache()
    val m = LinearTextModel.train(c, "text", "y", d = 256, alpha = 5.0)
    assert(m.weights.size == 256)
    val m2 = LinearTextModel.train(c, "text", "y", d = 256, alpha = 5.0)
    assert(m2 == m, "identical retrain must produce identical weights")

    val scored = c
      .select(col("y"), LinearTextModel.score(col("text"), m).as("p"))
      .cache()
    val st = scored.agg(
      corr(col("p"), col("y")).as("r"),
      avg(col("y")).as("ybar")).head()
    val (r, ybar) = (st.getDouble(0), st.getDouble(1))
    assert(r > 0.4, s"model/target correlation too low: $r")
    // calibration makes the model strictly better than predicting the mean
    val mse = scored.agg(avg(pow(col("p") - col("y"), 2))).head().getDouble(0)
    val mseBase = scored.agg(avg(pow(lit(ybar) - col("y"), 2))).head().getDouble(0)
    assert(mse < mseBase,
      s"calibrated model mse $mse must beat constant-predictor mse $mseBase")

    // persistence round trip: the stored table scores identically
    val dir = java.nio.file.Files.createTempDirectory("linear_model").toString
    LinearTextModel.writeModel(m, dir, spark)
    assert(LinearTextModel.loadModel(spark, dir) == m)
    scored.unpersist(); c.unpersist()
  }

  test("scoring is a pure narrow expression — no shuffle") {
    val c = corpus()
    val m = LinearTextModel.Model(8, Seq.tabulate(8)(_.toDouble), 0.25, 0.5)
    val plan = c.select(LinearTextModel.score(col("text"), m).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("empty and null text take the calibrated prior; both still train the bias row") {
    val df = Seq(
      (1L, "the quick fox", 1.0),
      (2L, "", 0.25),
      (3L, null.asInstanceOf[String], 0.0)
    ).toDF("id", "text", "y")
    val m = LinearTextModel.train(df, "text", "y", d = 16, alpha = 1.0)
    val scores = df.select(col("id"), LinearTextModel.score(col("text"), m).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // empty and null text score identically: the calibrated corpus prior
    assert(scores(2L) == m.emptyScore)
    assert(scores(3L) == m.emptyScore)
    // and the raw prior is the mean over ALL THREE docs (the null-text
    // row was not dropped from training)
    // raw prior ybar = (1.0 + 0.25 + 0.0) / 3
    val ybar = (1.0 + 0.25 + 0.0) / 3.0
    // emptyScore = a*ybar + b; recover a and b from any unseen-feature
    // weight: unseen raw weight is ybar, calibrated = a*ybar
    val unseen = m.weights.find(w => math.abs(w - (m.emptyScore - m.bias)) < 1e-12)
    assert(unseen.isDefined,
      s"some hashed feature unused by 3 tiny docs must carry the calibrated prior a*ybar=${m.emptyScore - m.bias} (ybar=$ybar)")
  }

  test("corpus pipeline modelGate drops low-scoring docs and carries the evidence column") {
    import graft.text.CorpusPipeline
    val c = corpus().cache()
    val m = LinearTextModel.train(c, "text", "y", d = 256, alpha = 5.0)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = CorpusPipeline.prepare(docs)
    // pick a threshold strictly inside the surviving docs' score range so
    // the gate provably removes something without emptying the corpus
    val scores = base.select(LinearTextModel.score(col("text"), m)).as[Double]
      .collect().sorted
    val t = scores(scores.length / 2)
    val gated = CorpusPipeline.prepare(docs,
      cfg = CorpusPipeline.Config(modelGate = Some((m, t)))).cache()
    assert(gated.columns.contains("model_score"))
    val n = gated.count()
    assert(n > 0 && n < base.count(),
      s"median-threshold gate must drop some but not all docs (kept $n)")
    assert(gated.filter(col("model_score") < t).count() == 0)
    // gate off => output schema unchanged (oracle stability)
    assert(!base.columns.contains("model_score"))
    gated.unpersist(); c.unpersist()
  }

  test("train refuses degenerate parameters") {
    val df = Seq((1L, "a", 1.0)).toDF("id", "text", "y")
    intercept[IllegalArgumentException] {
      LinearTextModel.train(df, "text", "y", d = 0)
    }
    intercept[IllegalArgumentException] {
      LinearTextModel.train(df, "text", "y", alpha = -1.0)
    }
  }

  test("null labels are excluded from training, not counted as zeros") {
    val df = Seq(
      (1L, "the fox", Some(1.0)),
      (2L, "the fox", None), // unlabeled: must not deflate the rates
      (3L, "spam spam", Some(0.0))
    ).toDF("id", "text", "y")
    val m = LinearTextModel.train(df, "text", "y", d = 16, alpha = 1.0)
    val labeledOnly = LinearTextModel.train(
      df.filter(col("y").isNotNull), "text", "y", d = 16, alpha = 1.0)
    assert(m == labeledOnly)
    intercept[IllegalArgumentException] {
      LinearTextModel.train(df.filter(col("y").isNull), "text", "y")
    }
  }
}
