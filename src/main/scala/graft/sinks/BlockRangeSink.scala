package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** S8 — the per-block atomic commit (reference omniEngine.py:210: one
  * Postgres transaction per block; rollback on failure :212-220),
  * re-expressed as idempotent partition overwrite:
  *
  * Facts are written partitioned by `blockRange = block div rangeSize`.
  * A batch covering blocks [a, b] rewrites exactly the partitions it
  * owns (dynamic partition overwrite), so a re-run of a failed batch is
  * idempotent — the Spark analog of the reference's per-block
  * transaction, and the unit of reorg truncation (drop partitions >
  * fork, rewrite the fork partition).
  *
  * At 100 TB, blockRange is also the pruning key: incremental runs and
  * reorg checks touch only the tail partitions.
  */
object BlockRangeSink {

  val RangeSize = 1000L

  def write(df: DataFrame, path: String, blockCol: String = "block"): Unit =
    df.withColumn("blockRange", expr(s"$blockCol div $RangeSize"))
      .write
      .partitionBy("blockRange")
      .option("partitionOverwriteMode", "dynamic")
      .mode(SaveMode.Overwrite)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Resume watermark (reference omniEngine.py:61-66: select
    * max(blocknumber)): the high-water mark read from the sink's own
    * partitions — partition pruning makes this a metadata-only scan of
    * the tail.
    */
  def watermark(spark: SparkSession, path: String,
      blockCol: String = "block"): Long = {
    val p = new java.io.File(path)
    if (!p.exists() || p.listFiles() == null ||
      !p.listFiles().exists(_.getName.startsWith("blockRange=")))
      -1L
    else {
      // partition values are re-inferred on read (int), hence the casts
      val maxRange = read(spark, path)
        .agg(max(col("blockRange").cast("long"))).head().getLong(0)
      read(spark, path)
        .where(col("blockRange") === maxRange)
        .agg(max(col(blockCol).cast("long"))).head().getLong(0)
    }
  }

  /** M4 — reorg truncation at the storage layer: keep facts ≤ fork. */
  def truncateTo(spark: SparkSession, path: String, fork: Long,
      blockCol: String = "block"): DataFrame =
    read(spark, path).where(col(blockCol) <= fork)
}
