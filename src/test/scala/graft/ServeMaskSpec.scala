package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.DeletionVectors

/** Default-masked SERVING entry points ([[graft.text.Bm25.searchServing]],
  * [[graft.similarity.Ivf.searchServing]]/searchAllServing): a caller who
  * serves through them gets the pending deletion vectors subtracted
  * WITHOUT passing maskIds — the round-10 ADVICE gap where every
  * existing retrieval API kept returning logically-erased subjects
  * unless the caller remembered to opt in. Purpose scoping and the
  * explicit `unmasked` maintenance opt-out ride along.
  */
class ServeMaskSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"serve_$tag").toString

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), col("text"))

  test("BM25 searchServing subtracts pending vectors by default; unmasked is the explicit opt-out") {
    val state = tmp("bm25")
    graft.text.Bm25.writeSearchIndex(docs, "doc_id", col("text"), s"$state/search")
    val masked = docs.filter(col("doc_id") % 7 === 2).select(col("doc_id"))
    DeletionVectors.append(spark, state, masked)
    val queries = Seq(1 -> "spark", 2 -> "data").toDF("query_id", "term")
    val served = graft.text.Bm25
      .searchServing(spark, s"$state/search", state, queries, topK = 50)
    val servedIds = served.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val maskedIds = masked.collect().map(_.getLong(0)).toSet
    assert(servedIds.intersect(maskedIds).isEmpty,
      "the DEFAULT serve path must never return logically-erased subjects")
    // the maintenance opt-out still sees raw truth
    val raw = graft.text.Bm25
      .searchServing(spark, s"$state/search", state, queries, topK = 50,
        unmasked = true)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(raw.intersect(maskedIds).nonEmpty,
      "unmasked=true must serve the raw index (compaction/fsck path)")
    // purpose scoping: a purpose-scoped vector masks only its purpose
    val pMask = docs.filter(col("doc_id") % 7 === 3).select(col("doc_id"))
    DeletionVectors.append(spark, state, pMask, purpose = Some("training"))
    val pIds = pMask.collect().map(_.getLong(0)).toSet
    val trainServe = graft.text.Bm25
      .searchServing(spark, s"$state/search", state, queries, topK = 50,
        purpose = Some("training"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val analyticsServe = graft.text.Bm25
      .searchServing(spark, s"$state/search", state, queries, topK = 50,
        purpose = Some("analytics"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(trainServe.intersect(pIds).isEmpty &&
      trainServe.intersect(maskedIds).isEmpty,
      "the serving purpose's mask = global + its purpose tree")
    assert(analyticsServe.intersect(pIds).nonEmpty &&
      analyticsServe.intersect(maskedIds).isEmpty,
      "another purpose keeps serving what only 'training' withdrew")
  }

  test("IVF searchServing and searchAllServing subtract by default") {
    val state = tmp("ivf")
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (centroids, assigned) =
      graft.similarity.Ivf.build(emb, "vec_id", "embedding", k = 4, iters = 2)
    graft.similarity.Ivf.writeIndex(centroids, assigned, "vec_id",
      "embedding", s"$state/dense")
    val q = emb.orderBy(col("vec_id")).limit(1)
      .select(col("embedding")).head().getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }
    val top = graft.similarity.Ivf.searchServing(spark, s"$state/dense",
      state, "vec_id", "embedding", q, k = 5, nprobe = 4)
      .collect().map(_.getLong(0))
    // mask the top hit: the default serve must drop it, unmasked keeps it
    DeletionVectors.append(spark, state,
      Seq(top.head).toDF("vec_id"), idCol = "vec_id")
    val after = graft.similarity.Ivf.searchServing(spark, s"$state/dense",
      state, "vec_id", "embedding", q, k = 5, nprobe = 4)
      .collect().map(_.getLong(0))
    assert(!after.contains(top.head) && after.length == 5)
    assert(graft.similarity.Ivf.searchServing(spark, s"$state/dense",
      state, "vec_id", "embedding", q, k = 5, nprobe = 4, unmasked = true)
      .collect().map(_.getLong(0)).contains(top.head))
    val multi = graft.similarity.Ivf.searchAllServing(spark, s"$state/dense",
      state, "vec_id", "embedding", Seq((1, q)).toDF("qid", "qvec"),
      "qid", "qvec", k = 5, nprobe = 4)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(!multi.contains(top.head) && multi.size == 5)
  }
}
