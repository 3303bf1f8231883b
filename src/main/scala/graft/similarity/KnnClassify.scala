package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-nearest-neighbor label classification over an embedding column —
  * majority vote among the approximate kNN graph's neighbors.
  *
  * The expensive part is neighbor search, and that reuses
  * [[Similarity.annTopKGraph]] (SRP-banded candidates + bounded-heap
  * per-source top-k), so the classifier adds only one broadcast-size label
  * join and one (src, label) partial-aggregated vote count on top of the
  * graph — no new all-pairs work, no new shuffle shape. At 100 TB the label
  * side is a projection of the same corpus, co-partitioned by id; the vote
  * count map-side combines to at most k rows per source.
  *
  * Vote tie-break is deterministic: highest vote count, then smallest
  * label, so both engines pick the same winner.
  */
object KnnClassify {

  /** Per-vector prediction: (id, predicted_label, votes, n_neighbors).
    *
    * A vector with no SRP candidates (no bucket collision) gets no row —
    * at production recall settings that means "isolated point", and
    * callers decide the fallback (e.g. assign the global majority).
    */
  def predict(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int = 5,
      bits: Int = 24,
      bands: Int = 2
  ): DataFrame = {
    val graph = Similarity.annTopKGraph(df, idCol, vecCol, k, bits, bands)
    val labels = df.select(col(idCol).as("dst"), col(labelCol).as("_nbr_label"))
    val votes = graph
      .join(labels, "dst")
      .groupBy(col("src").as(idCol), col("_nbr_label").as("predicted_label"))
      .agg(count(lit(1)).as("votes"))
    val totals = graph
      .groupBy(col("src").as(idCol))
      .agg(count(lit(1)).as("n_neighbors"))
    // argmax by (votes desc, label asc) via min over one comparable struct —
    // a partial-aggregating shape (vs the row_number window, which would
    // sort every vote row inside each partition). Negating the COUNT (always
    // numeric) instead of the label keeps the tie-break type-agnostic:
    // string labels order lexicographically, so "smallest label wins" holds
    // for any orderable label type.
    votes
      .groupBy(col(idCol))
      .agg(
        min(
          struct(
            (-col("votes")).as("_neg_votes"),
            col("predicted_label"),
            col("votes")
          )
        ).as("_best")
      )
      .select(
        col(idCol),
        col("_best.predicted_label").as("predicted_label"),
        col("_best.votes").as("votes")
      )
      .join(totals, Seq(idCol))
  }

  /** Prediction joined back against the true label — the self-consistency
    * audit (leave-self-out: the graph never contains self-edges).
    */
  def audit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int = 5,
      bits: Int = 24,
      bands: Int = 2
  ): DataFrame =
    predict(df, idCol, vecCol, labelCol, k, bits, bands)
      .join(df.select(col(idCol), col(labelCol).as("true_label")), Seq(idCol))
      .withColumn("correct", (col("predicted_label") === col("true_label")).cast("int"))
}
