package graft.masking

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pseudonym key rotation: move a published dataset from salt A to
  * salt B WITHOUT recomputing it from raw PII.
  *
  * Salted pseudonyms are one-way, so a compromised salt cannot be
  * rotated in place — but the party holding the raw source can derive a
  * `(old_pseudonym → new_pseudonym)` MAPPING and re-key every published
  * artifact with a join-replace, which is the standard GDPR recovery
  * play (publish consumers never see raw values; the raw source is
  * touched exactly once to build the mapping). Rotating by re-running
  * the whole pipeline instead would re-read all raw PII per artifact —
  * this touches each published table once, keyed on the old pseudonym.
  *
  * The contract `rotate(publish(A)) == publish(B)` is exactly what the
  * q_rotate_pseudonyms oracle hash-checks.
  */
object Rotation {

  /** Pseudonym mapping for one raw column under two salts: distinct
    * `(old_pseudo, new_pseudo)` pairs. Build ONCE per rotation from the
    * raw source.
    */
  def mapping(
      raw: DataFrame,
      rawCol: Column,
      pseudo: (Column, String) => Column,
      oldSalt: String,
      newSalt: String
  ): DataFrame =
    raw
      .select(
        pseudo(rawCol, oldSalt).as("old_pseudo"),
        pseudo(rawCol, newSalt).as("new_pseudo"))
      .filter(col("old_pseudo").isNotNull)
      .distinct()

  /** Re-key `published`'s `pseudoCol` through the mapping. Every non-null
    * pseudonym must resolve (a miss means the mapping was built from a
    * different raw snapshot than the publish — fail loudly, a silent
    * null would LOOK anonymized while breaking referential joins).
    *
    * No broadcast hint: the mapping's cardinality is the DISTINCT raw-PII
    * count, which at the store sizes this library targets is far past
    * broadcastable (forcing it would OOM the driver). AQE picks broadcast
    * when the mapping really is small; otherwise a sort-merge join keyed
    * on the old pseudonym is the safe default.
    */
  def rotate(
      published: DataFrame,
      pseudoCol: String,
      mapping: DataFrame
  ): DataFrame = {
    val joined = published
      .join(
        mapping.withColumnRenamed("old_pseudo", pseudoCol),
        Seq(pseudoCol), "left")
      .withColumn(
        pseudoCol,
        when(col(pseudoCol).isNull, lit(null).cast("string"))
          .otherwise(
            when(col("new_pseudo").isNull,
              raise_error(concat(
                lit(s"pseudonym rotation: unmapped value in $pseudoCol: "),
                col(pseudoCol))))
              .otherwise(col("new_pseudo"))))
      .drop("new_pseudo")
    joined
  }
}
