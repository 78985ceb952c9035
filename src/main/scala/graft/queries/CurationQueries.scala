package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables.t

/** Corpus-curation operators beyond dedup: deterministic sampling.
  *
  * Training-data pipelines rebalance a corpus by stratum (language,
  * source) before tokenization. The 100-TB-correct shape is rate-based
  * Bernoulli sampling keyed on a deterministic content hash: a pure
  * map-side filter — ZERO shuffles, no per-stratum window (which would
  * funnel each giant stratum through one partition) — and reproducible
  * across runs/engines because the coin flip is md5-derived, not RNG.
  */
object CurationQueries {

  /** Stratified downsample of `documents`: per-language keep rates in
    * permille (en 500 / zh+es 250 / rest 125), keep iff the doc's
    * 60-bit hash bucket falls under its stratum's rate. The rate table
    * is a literal CASE here; at scale it is a broadcast dim (J2 shape).
    */
  val stratified = Q(
    "sample_stratified",
    """SELECT doc_id, lang,
      |  (('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 1000 AS bucket
      |FROM documents
      |WHERE (('0x' || substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT) % 1000
      |  < CASE WHEN lang = 'en' THEN 500
      |         WHEN lang IN ('zh', 'es') THEN 250 ELSE 125 END
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .withColumn("bucket",
        expr("cast(conv(substring(md5(concat('samp:', cast(doc_id as string))), 1, 15), 16, 10) as bigint) % 1000"))
      .where(col("bucket") <
        when(col("lang") === "en", 500)
          .when(col("lang").isin("zh", "es"), 250).otherwise(125))
      .select("doc_id", "lang", "bucket")
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(stratified)
}
