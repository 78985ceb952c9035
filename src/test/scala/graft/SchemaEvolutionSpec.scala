package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** M9 — schema migration, the engine's answer to the reference's
  * in-place ALTERs (`/root/reference/patches/omniDB.v26-32.patch`
  * family: add-column migrations applied to live Postgres tables).
  * With immutable parquet facts there is no ALTER: new batches simply
  * carry the new column, and readers either merge footers
  * (mergeSchema) or declare the target schema — old files surface NULL
  * for the added column. These tests pin that contract, including the
  * two gotchas that bite in production: schema merge is OFF by default
  * for performance (the scan trusts one footer), and a type CHANGE —
  * unlike an add — is not mergeable and must fail loudly.
  */
class SchemaEvolutionSpec extends SparkTestBase {
  import spark.implicits._

  test("added column merges across file generations; old rows read NULL") {
    val dir = Files.createTempDirectory("graft_schema_evo").toString
    // v1 batch: (id, amount)
    Seq((1L, 100L), (2L, 200L)).toDF("id", "amount")
      .coalesce(1).write.mode("append").parquet(dir)
    // v2 batch adds a column (the v26-32-patch shape): (id, amount, fee)
    Seq((3L, 300L, 7L), (4L, 400L, 9L)).toDF("id", "amount", "fee")
      .coalesce(1).write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("amount", "fee", "id"))
    val rows = merged.orderBy("id")
      .select($"id", $"amount", $"fee")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(rows.toSeq == Seq((1L, 100L, None), (2L, 200L, None),
      (3L, 300L, Some(7L)), (4L, 400L, Some(9L))))
    // aggregates treat pre-migration rows as absent, not zero
    val fees = merged.agg(sum("fee"), count("fee")).head()
    assert(fees.getLong(0) == 16L && fees.getLong(1) == 2L)
  }

  test("an explicit target schema reads both generations without merging") {
    val dir = Files.createTempDirectory("graft_schema_evo2").toString
    Seq((1L, 10L)).toDF("id", "amount")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((2L, 20L, 5L)).toDF("id", "amount", "fee")
      .coalesce(1).write.mode("append").parquet(dir)
    // production readers pin the CURRENT schema instead of paying the
    // footer-merge on every scan; old files surface NULL for new cols
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("amount",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("fee",
        org.apache.spark.sql.types.LongType)))
    val pinned = spark.read.schema(schema).parquet(dir)
    val byId = pinned.orderBy("id").collect()
    assert(byId(0).isNullAt(2) && byId(1).getLong(2) == 5L)
  }

  test("a column TYPE change is rejected, not silently coerced") {
    val dir = Files.createTempDirectory("graft_schema_evo3").toString
    Seq((1L, 10L)).toDF("id", "amount")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((2L, "not a number")).toDF("id", "amount")
      .coalesce(1).write.mode("append").parquet(dir)
    val ex = intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(dir).collect()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).mkString
    assert(msg.toLowerCase.contains("merge") ||
      msg.toLowerCase.contains("incompatible") ||
      msg.toLowerCase.contains("schema"))
  }
}
