package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.StableHash

/** Model-based document scoring: a linear model over hashed bag-of-words
  * features, trained INSIDE the engine — the fastText/CCNet family of
  * tricks (Joulin et al. 2016; Wenzek et al. 2019) production pipelines
  * use to distill an expensive document signal (a quality heuristic, a
  * slow teacher classifier's output, human ratings on a sample) into a
  * model cheap enough to gate 100 TB.
  *
  * Why in-engine instead of exporting to a trainer: at 100 TB the
  * dominant cost is MOVING the text. Training here is exactly TWO
  * distributed passes, each reducing to a bounded driver payload:
  *
  *  1. **Rates pass** — per hashed feature, the smoothed mean label over
  *     its token instances (`(sum_y + alpha*ybar) / (cnt + alpha)`); one
  *     explode + keyed sum, collecting d+1 floats. The corpus-wide label
  *     mean rides along as a bias pseudo-feature, so no separate count
  *     job.
  *  2. **Calibration pass** — the raw score (mean feature rate per doc)
  *     is correlated but compressed toward `ybar` by smoothing; a
  *     closed-form 1-D least-squares fit (`a*raw + b`) restores scale.
  *     One pass collecting five scalars; `a` folds into the weights so
  *     the shipped model is still a flat vector.
  *
  * Scoring is a pure narrow expression (broadcast-literal weights,
  * `aggregate` over the token array, divide by token count), so the
  * trained model applies as a gate inside any pipeline stage with zero
  * extra scans and zero shuffles.
  *
  * Determinism/replayability: features hash through [[StableHash]] (the
  * engine-portable md5 convention every sampler and sharder here uses),
  * tokenization is [[TextAnalysis.tokens]], and both passes are pure
  * add/multiply/divide — no transcendentals whose libm rounding could
  * drift between engines — so a DuckDB twin replays training end to end
  * at the compared rounding grain.
  */
object LinearTextModel {

  /** Trained model. `weights(j)` is the CALIBRATED weight of hashed
    * feature j in [0, d): a document scores
    * `bias + mean(weights(idx(token)))`, and a token-less document
    * scores `emptyScore` (the calibrated corpus prior).
    */
  final case class Model(
      d: Int,
      weights: Seq[Double],
      bias: Double,
      emptyScore: Double) {
    require(weights.size == d, s"model: ${weights.size} weights for d=$d")
  }

  /** Hashed feature index of one token — [[StableHash]] bucket in [0, d). */
  def featureIdx(token: Column, d: Int): Column =
    StableHash.bucket(token, d)

  /** NULL text tokenizes as empty — a NULL must score as the prior (and
    * keep its bias instance in training), not null-propagate into a
    * dropped row the way a raw `split(null)` would.
    */
  private def toks(textCol: Column): Column =
    TextAnalysis.tokens(coalesce(textCol, lit("")))

  /** Model score of a text column: mean weight over token INSTANCES plus
    * bias. Pure narrow codegen'd expression — broadcast-literal weights,
    * no shuffle, no join.
    */
  def score(textCol: Column, m: Model): Column = {
    val w = typedLit(m.weights)
    val t = toks(textCol)
    when(size(t) === 0, lit(m.emptyScore))
      .otherwise(
        aggregate(
          transform(t, tk => element_at(w, featureIdx(tk, m.d) + 1)),
          lit(0.0),
          (acc, v) => acc + v) / size(t) + lit(m.bias))
  }

  /** Persist a trained model: one row per weight, plus the bias and the
    * empty-doc prior as rows `d` and `d+1` — the same tiny
    * self-describing parquet convention as
    * [[graft.similarity.Pq.writeCodebook]]: train once, gate every later
    * pipeline run from the stored table.
    */
  def writeModel(m: Model, dir: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    ((0 until m.d).map(j => (j, m.weights(j), m.d)) ++
      Seq((m.d, m.bias, m.d), (m.d + 1, m.emptyScore, m.d)))
      .toDF("idx", "value", "d")
      .coalesce(1)
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a model written by [[writeModel]]. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val rows = spark.read.parquet(dir).collect()
      .map(r => r.getAs[Int]("idx") -> (r.getAs[Double]("value"), r.getAs[Int]("d")))
    require(rows.nonEmpty, s"model: empty model table at $dir")
    val d = rows.head._2._2
    val byIdx = rows.map { case (i, (v, _)) => i -> v }.toMap
    require(byIdx.size == d + 2, s"model: expected ${d + 2} rows, got ${byIdx.size}")
    Model(d, (0 until d).map(byIdx), byIdx(d), byIdx(d + 1))
  }

  /** Train against a real-valued (or 0/1) label column: smoothed
    * per-feature label rates, then a closed-form linear calibration.
    * Two distributed passes total, independent of corpus size; driver
    * state is d+3 doubles.
    *
    * @param alpha smoothing pseudo-count pulling rare features toward
    *              the corpus label mean
    */
  def train(
      df0: DataFrame,
      textCol: String,
      labelCol: String,
      d: Int = 256,
      alpha: Double = 5.0
  ): Model = {
    require(d > 0, s"model: d must be positive, got $d")
    require(alpha >= 0, s"model: alpha must be non-negative, got $alpha")
    // a NULL label means "unlabeled", not "zero": the row is excluded from
    // BOTH passes (a null would otherwise vanish from the sums but still
    // inflate the bias feature's count, silently deflating every rate)
    val df = df0.filter(col(labelCol).isNotNull)
    val y = col(labelCol).cast("double")

    // pass 1: per-feature (sum label, instance count); the bias
    // pseudo-feature `d` appears once per document, so its row carries
    // (sum y, n) and no separate count job is needed
    val idxs = concat(
      transform(toks(col(textCol)), t => featureIdx(t, d)),
      array(lit(d))).as("_idx")
    val g = df
      .select(y.as("_y"), idxs)
      .select(col("_y"), explode(col("_idx")).as("_j"))
      .groupBy(col("_j"))
      .agg(sum(col("_y")).as("_s"), count(lit(1)).as("_c"))
      .collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    require(g.contains(d), "model: no labeled rows to train on")
    val n = g(d)._2.toDouble
    val ybar = g(d)._1 / n
    // unseen features take the fully-smoothed prior (s=0, c=0) => ybar
    val raw: IndexedSeq[Double] = (0 until d).map { j =>
      g.get(j)
        .map { case (s, c) => (s + alpha * ybar) / (c + alpha) }
        .getOrElse(ybar)
    }

    // pass 2: closed-form least-squares calibration a*rawScore + b
    val rawModel = Model(d, raw, 0.0, ybar)
    val st = df
      .select(score(col(textCol), rawModel).as("_r"), y.as("_y"))
      .agg(
        sum(col("_r")).as("sr"),
        sum(col("_r") * col("_r")).as("srr"),
        sum(col("_r") * col("_y")).as("sry"),
        sum(col("_y")).as("sy"))
      .head()
    val (sr, srr, sry, sy) =
      (st.getDouble(0), st.getDouble(1), st.getDouble(2), st.getDouble(3))
    val varR = srr - sr * sr / n
    val a = if (varR == 0.0) 0.0 else (sry - sr * sy / n) / varR
    val b = (sy - a * sr) / n
    Model(d, raw.map(_ * a), b, a * ybar + b)
  }
}
