package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column (Pearson 1901; the standard
  * covariance-eigendecomposition formulation).
  *
  * Scale shape — the k-means/codebook convention:
  *   - the ONLY corpus-sized work is one moment pass: each row flattens to
  *     `d + d(d+1)/2` indexed moment terms (mean sums + upper-triangle
  *     second moments), posexploded and map-side-combined, so the shuffle
  *     carries ~2k rows per partition for d=64 — never the corpus;
  *   - the 64×64 eigendecomposition runs on the DRIVER (cyclic Jacobi,
  *     deterministic, microseconds — distributing an O(d³) solve for
  *     d≲1k would be pure overhead);
  *   - projection embeds the k components as literal arrays in the plan
  *     (the pagerank embedded-constant technique) and scores with the
  *     codegen'd [[DotProductExpr]] — a narrow pass, no shuffle.
  *
  * Cross-engine parity: the DuckDB twin projects with THE SAME literal
  * component/mean values the Spark plan embeds (both rendered from one
  * driver-side fit), and both engines fold the dot product in ascending
  * index order — so projections hash-match exactly even though the
  * eigensolve itself is float-iterative.
  *
  * Sign convention: each component's largest-|coefficient| entry is made
  * positive (eigenvectors are sign-ambiguous; an unfixed sign would flip
  * projections between runs).
  */
object Pca {

  final case class Model(
      n: Long,
      mean: Array[Double],
      eigenvalues: Array[Double],       // descending, top k
      components: Array[Array[Double]]  // k rows of length d
  )

  /** Per-row flattened moment terms: positions 0..d-1 carry v_i, then the
    * upper triangle v_i·v_j (i <= j) in row-major order.
    */
  private def momentTerms(vec: Column, d: Int): Column = {
    val firsts = transform(sequence(lit(0), lit(d - 1)),
      i => element_at(vec, i + 1).cast("double"))
    val triangle = flatten(
      transform(sequence(lit(0), lit(d - 1)), i =>
        transform(sequence(i, lit(d - 1)), j =>
          element_at(vec, i + 1).cast("double") *
            element_at(vec, j + 1).cast("double"))))
    concat(firsts, triangle)
  }

  /** Fixed-point twin of [[momentTerms]] for the correctness oracle:
    * every term quantizes as `floor(x · 2^30)` BEFORE summation, so the
    * aggregated moments are exact integer sums — order-independent and
    * bit-replayable on any engine (double sums are neither). The layout
    * (position ↔ term) is identical to the double pass, so a green
    * fixed-point query pins the flatten/posexplode/aggregate plumbing
    * the real fit rides on; only the final eigensolve (driver-side,
    * float-iterative) is spec-pinned instead.
    */
  def momentTermsFixed(vec: Column, d: Int, scaleBits: Int = 30): Column = {
    val s = (1L << scaleBits).toDouble
    val firsts = transform(sequence(lit(0), lit(d - 1)),
      i => floor(element_at(vec, i + 1).cast("double") * s).cast("long"))
    val triangle = flatten(
      transform(sequence(lit(0), lit(d - 1)), i =>
        transform(sequence(i, lit(d - 1)), j =>
          floor(element_at(vec, i + 1).cast("double") *
            element_at(vec, j + 1).cast("double") * s).cast("long"))))
    concat(firsts, triangle)
  }

  /** Fixed-point moment sums as a relational artifact: `(pos, s, n_rows)`
    * rows, the [[momentTermsFixed]] aggregation. Because every term
    * quantizes BEFORE summation, sums are exact integers — so per-batch
    * sketches MERGE losslessly (element-wise long addition) and a
    * maintained store equals a one-shot pass bit-for-bit, the
    * ProfileStore property extended to second moments. `2^-30` per-term
    * quantization is the stated, deterministic trade.
    */
  def momentSums(df: DataFrame, vecCol: String, d: Int): DataFrame =
    df.filter(col(vecCol).isNotNull && size(col(vecCol)) === d)
      .select(posexplode(momentTermsFixed(col(vecCol), d)).as(Seq("pos", "t")))
      .groupBy("pos")
      .agg(sum(col("t")).as("s"), count(lit(1)).as("n_rows"))

  /** Merge per-batch moment sketches: exact (integer sums add). */
  def mergeMoments(sketches: DataFrame): DataFrame =
    sketches.groupBy("pos")
      .agg(sum(col("s")).as("s"), sum(col("n_rows")).as("n_rows"))

  /** Fit from a (merged) fixed-point moment sketch: dequantize at 2^-30
    * and run the same covariance + Jacobi as [[fit]]. Deterministic
    * given the sketch — incremental maintenance serves the SAME model a
    * rebuild would (spec-pinned), because the sums are exact.
    */
  def fitFromMoments(moments: DataFrame, d: Int, k: Int): Model = {
    require(k >= 1 && k <= d)
    val rows = moments.collect()
    require(rows.nonEmpty, "pca: empty moment sketch")
    val n = rows.head.getLong(rows.head.fieldIndex("n_rows"))
    val scale = (1L << 30).toDouble
    val sums = new Array[Double](d + d * (d + 1) / 2)
    rows.foreach { r =>
      sums(r.getInt(r.fieldIndex("pos"))) =
        r.getLong(r.fieldIndex("s")).toDouble / scale
    }
    val mean = Array.tabulate(d)(i => sums(i) / n)
    val cov = Array.ofDim[Double](d, d)
    var idx = d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = sums(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    val order = values.zipWithIndex.sortBy { case (v, ix) => (-v, ix) }.map(_._2)
    val top = order.take(k).map { colIx =>
      val comp = Array.tabulate(d)(r => vectors(r)(colIx))
      val m = comp.indices.maxBy(ix => (math.abs(comp(ix)), -ix))
      if (comp(m) < 0) comp.map(x => -x) else comp
    }
    Model(n, mean, order.take(k).map(values), top)
  }

  /** One-pass fit: moment aggregation (bounded collect of d + d(d+1)/2
    * sums) + driver-side Jacobi eigensolve. `d` must match the vector
    * length; rows with null vectors are skipped.
    */
  def fit(df: DataFrame, vecCol: String, d: Int, k: Int): Model = {
    require(d >= 2 && d <= 1024, s"pca: d must be in [2,1024], got $d")
    require(k >= 1 && k <= d, s"pca: k must be in [1,$d], got $k")
    val rows = df.filter(col(vecCol).isNotNull && size(col(vecCol)) === d)
    val agg = rows
      .select(posexplode(momentTerms(col(vecCol), d)).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("c"))
      .collect()
    require(agg.nonEmpty, "pca: no rows to fit")
    val n = agg.head.getLong(2)
    val sums = new Array[Double](d + d * (d + 1) / 2)
    agg.foreach(r => sums(r.getInt(0)) = r.getDouble(1))

    val mean = Array.tabulate(d)(i => sums(i) / n)
    // population covariance: C_ij = E[v_i v_j] - mean_i mean_j
    val cov = Array.ofDim[Double](d, d)
    var idx = d
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = sums(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }

    val (values, vectors) = jacobiEigen(cov)
    // order by eigenvalue desc (index asc on ties), fix signs
    val order = values.zipWithIndex.sortBy { case (v, ix) => (-v, ix) }.map(_._2)
    val top = order.take(k).map { col =>
      val comp = Array.tabulate(d)(r => vectors(r)(col))
      val m = comp.indices.maxBy(ix => (math.abs(comp(ix)), -ix))
      if (comp(m) < 0) comp.map(x => -x) else comp
    }
    Model(n, mean, order.take(k).map(values), top)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues, column
    * eigenvectors). Deterministic (fixed sweep order, fixed iteration
    * cap, convergence on off-diagonal norm).
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = Array.tabulate(d, d)((i, j) => a0(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    while (sweep < 64 && off > 1e-12) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // sign(0) must be +1 here (signum would zero the rotation for
            // equal diagonal entries — exactly the [[2,1],[1,2]] case)
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  /** Centered projections onto the model's components, as `pc_1..pc_k`
    * columns: `pc_m = v·comp_m − mean·comp_m` (codegen'd dot against the
    * literal component; the scalar mean·comp is folded on the driver).
    */
  def project(df: DataFrame, vecCol: String, model: Model): DataFrame =
    model.components.zipWithIndex.foldLeft(df) { case (acc, (comp, m)) =>
      val shift = comp.zip(model.mean).map { case (c, mu) => c * mu }.sum
      acc.withColumn(
        s"pc_${m + 1}",
        DotProductExpr.dot(col(vecCol), typedLit(comp.toSeq)) - lit(shift))
    }
}
