package graft

import org.apache.spark.sql.functions._

import graft.similarity.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen: hand-checkable symmetric matrices") {
    // [[2,1],[1,2]] -> eigenvalues 3 and 1
    val (vals2, vecs2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(vals2.sorted.zip(Seq(1.0, 3.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // eigenvector columns are orthonormal
    val dot01 = vecs2(0)(0) * vecs2(0)(1) + vecs2(1)(0) * vecs2(1)(1)
    assert(math.abs(dot01) < 1e-12)
    // diagonal matrix: eigenvalues are the diagonal
    val (vals3, _) = Pca.jacobiEigen(
      Array(Array(5.0, 0.0, 0.0), Array(0.0, -2.0, 0.0), Array(0.0, 0.0, 7.0)))
    assert(vals3.sorted.zip(Seq(-2.0, 5.0, 7.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("fit recovers a planted principal axis; projections carry the variance") {
    // 4-d points spread along u = (1,1,0,0)/sqrt(2) with small noise on
    // the other axes: PC1 must align with u and carry most variance
    val rnd = new scala.util.Random(5)
    val rows = (0 until 500).map { _ =>
      val t = rnd.nextGaussian() * 10.0
      Array(
        (t / math.sqrt(2) + rnd.nextGaussian() * 0.1).toFloat,
        (t / math.sqrt(2) + rnd.nextGaussian() * 0.1).toFloat,
        (rnd.nextGaussian() * 0.1).toFloat,
        (rnd.nextGaussian() * 0.1).toFloat)
    }
    val df = rows.map(r => Tuple1(r)).toDF("v")
    val model = Pca.fit(df, "v", d = 4, k = 2)
    assert(model.n == 500)
    val u = Array(1.0 / math.sqrt(2), 1.0 / math.sqrt(2), 0.0, 0.0)
    val cos = model.components(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"PC1 misaligned: cos=$cos")
    assert(model.eigenvalues(0) > 50.0 && model.eigenvalues(1) < 1.0,
      s"eigenvalues ${model.eigenvalues.toSeq}")
    // components orthonormal
    val n0 = math.sqrt(model.components(0).map(x => x * x).sum)
    val n1 = math.sqrt(model.components(1).map(x => x * x).sum)
    val d01 = model.components(0).zip(model.components(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(n0 - 1) < 1e-9 && math.abs(n1 - 1) < 1e-9 && math.abs(d01) < 1e-9)
    // sign convention: largest-|coeff| entry positive
    assert(model.components.forall(c => c(c.indices.maxBy(i => (math.abs(c(i)), -i))) > 0))

    // projected variance per component ~= its eigenvalue (population)
    val proj = Pca.project(df, "v", model)
    val stats = proj.agg(
      avg($"pc_1"), avg($"pc_1" * $"pc_1"),
      avg($"pc_2"), avg($"pc_2" * $"pc_2")).head()
    val var1 = stats.getDouble(1) - stats.getDouble(0) * stats.getDouble(0)
    val var2 = stats.getDouble(3) - stats.getDouble(2) * stats.getDouble(2)
    assert(math.abs(var1 - model.eigenvalues(0)) / model.eigenvalues(0) < 1e-6)
    assert(math.abs(var2 - model.eigenvalues(1)) / math.max(model.eigenvalues(1), 1e-9) < 1e-3)
    // centering: projections are mean-zero
    assert(math.abs(stats.getDouble(0)) < 1e-9)
  }

  test("fit matches a brute-force Scala covariance eigensolve") {
    val rnd = new scala.util.Random(9)
    val rows = (0 until 200).map(_ => Array.fill(6)((rnd.nextGaussian() * 3).toFloat))
    val df = rows.map(r => Tuple1(r)).toDF("v")
    val model = Pca.fit(df, "v", d = 6, k = 3)
    // brute force in Scala
    val n = rows.length
    val mean = Array.tabulate(6)(i => rows.map(_(i).toDouble).sum / n)
    val cov = Array.tabulate(6, 6)((i, j) =>
      rows.map(r => r(i).toDouble * r(j).toDouble).sum / n - mean(i) * mean(j))
    val (vals, _) = Pca.jacobiEigen(cov)
    val topVals = vals.sorted.reverse.take(3)
    model.eigenvalues.zip(topVals).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
    model.mean.zip(mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("merged per-batch moment sketches serve the IDENTICAL model") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 300).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextGaussian() * 2).toFloat)))
    val df = rows.toDF("id", "v")
    val oneShot = Pca.fitFromMoments(Pca.momentSums(df, "v", 8), 8, 3)
    val merged = Pca.fitFromMoments(
      Pca.mergeMoments(
        Pca.momentSums(df.filter($"id" % 3 === 0), "v", 8)
          .unionByName(Pca.momentSums(df.filter($"id" % 3 === 1), "v", 8))
          .unionByName(Pca.momentSums(df.filter($"id" % 3 === 2), "v", 8))),
      8, 3)
    // EXACT equality — integer sums make the maintained model bit-equal
    assert(merged.n == oneShot.n)
    assert(merged.mean.toSeq == oneShot.mean.toSeq)
    assert(merged.eigenvalues.toSeq == oneShot.eigenvalues.toSeq)
    assert(merged.components.map(_.toSeq).toSeq ==
      oneShot.components.map(_.toSeq).toSeq)
    // and the quantized fit tracks the double fit closely
    val dbl = Pca.fit(df, "v", 8, 3)
    oneShot.eigenvalues.zip(dbl.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b")
    }
  }

  test("feature hashing: dense equals sparse, signs unbiased, PCA-composable") {
    import graft.text.FeatureHash
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ran"),
      (3L, ""),
      (4L, "cat cat cat")).toDF("doc_id", "text")
    val sparse = FeatureHash.vectorizeSparse(docs, "doc_id", "text", 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val dense = FeatureHash.vectorizeDense(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // dense spreads the sparse rows into 16 lanes, zero-filled
    dense.foreach { case (id, vec) =>
      assert(vec.length == 16)
      vec.zipWithIndex.foreach { case (v, lane) =>
        assert(v == sparse.getOrElse((id, lane), 0L).toDouble, s"doc $id lane $lane")
      }
    }
    // empty doc vectorizes to nothing sparse (and is absent dense — no
    // tokens, no rows; callers left-join if they need explicit zeros)
    assert(!sparse.keys.exists(_._1 == 3L) && !dense.contains(3L))
    // repeated token: |sum| equals the count on its lane
    val catRows = sparse.collect { case ((4L, _), v) => v }
    assert(catRows.map(math.abs).sum == 3L)
    // the dense form feeds Pca.fit without adaptation
    val model = Pca.fit(FeatureHash.vectorizeDense(docs, "doc_id", "text", 16),
      "features", d = 16, k = 2)
    assert(model.n == 3 && model.components.head.length == 16)
  }

  test("momentTermsFixed layout matches the double pass position-for-position") {
    val df = Seq(Tuple1(Array(0.5f, -1.25f, 2.0f))).toDF("v")
    val fixed = df.select(Pca.momentTermsFixed($"v", 3)).head().getSeq[Long](0)
    // layout: [v0,v1,v2, v0v0,v0v1,v0v2, v1v1,v1v2, v2v2] at 2^30 scale
    val s = (1L << 30).toDouble
    val v = Seq(0.5, -1.25, 2.0)
    val want = (v ++ Seq(v(0)*v(0), v(0)*v(1), v(0)*v(2), v(1)*v(1), v(1)*v(2), v(2)*v(2)))
      .map(x => math.floor(x * s).toLong)
    assert(fixed == want)
  }
}
