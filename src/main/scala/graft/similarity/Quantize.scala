package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding storage/search —
  * the standard 4x compression step before an ANN index at scale (float32
  * -> int8 with one scale per vector).
  *
  *   scale = max(|v_i|) / 127
  *   q_i   = clamp(round_half_up(v_i / scale), -127, 127)   (0 when scale=0)
  *
  * All shapes are per-row Column expressions (narrow, no shuffle); the
  * round is done in the double domain ([[graft.queries.Parity]] rationale)
  * so the DuckDB oracle reproduces every lane exactly. Reconstruction
  * error `||v - q*scale||` uses the same ascending-index fold as the other
  * similarity kernels.
  */
object Quantize {

  /** max(|v_i|) as a double (order-insensitive fold). */
  def maxAbs(vec: Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Per-vector scale; 0.0 for an all-zero vector. */
  def scaleOf(vec: Column): Column = maxAbs(vec) / lit(127.0)

  /** int8 lanes as array<long> (Spark `floor` yields longs; values are in
    * [-127, 127] by construction).
    */
  def quantize(vec: Column, scale: Column): Column =
    transform(
      vec,
      x =>
        when(scale > 0,
          greatest(
            lit(-127L),
            least(lit(127L), floor(x.cast("double") / scale + lit(0.5))))
        ).otherwise(lit(0L))
    )

  /** sum(q_i^2) — the quantized self-dot (integer arithmetic). */
  def qNorm2(qvec: Column): Column =
    aggregate(qvec, lit(0L), (acc, q) => acc + q * q)

  /** ||v - q*scale||_2 — reconstruction error, ascending-index fold. */
  def reconstructionError(vec: Column, qvec: Column, scale: Column): Column =
    sqrt(
      aggregate(
        zip_with(vec, qvec, (v, q) => {
          val d = v.cast("double") - q.cast("double") * scale
          d * d
        }),
        lit(0.0),
        (acc, e) => acc + e
      ))
}
