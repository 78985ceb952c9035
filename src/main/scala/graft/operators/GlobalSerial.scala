package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** W1 — deterministic global total order (the reference's
  * TxDBSerialNum sequence, reference/omniEngine.py:106,
  * reference/sql.py:2502-2504).
  *
  * A naive `row_number() over (order by ...)` collapses the whole
  * dataset onto ONE partition — fatal at 100 TB. Instead: range-partition
  * by the sort key (parallel sampling + shuffle), sort within partitions,
  * then `zipWithIndex` — which runs one lightweight count-per-partition
  * job and assigns contiguous offsets per partition. Total work: one
  * shuffle + one pass, fully parallel, identical result to the global
  * row_number as long as `order` is a total order (pass a unique
  * tiebreaker).
  *
  * Cache lifetime: each call persists its sorted input
  * (MEMORY_AND_DISK) and registers the release with
  * [[graft.CacheScope]]. A long-lived session embedding this operator
  * MUST call `CacheScope.release()` after consuming each query's
  * result, or the pins accumulate for the life of the session
  * (CacheScope warns past 64 outstanding entries).
  */
object GlobalSerial {
  def assign(df: DataFrame, serialCol: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    // Columnar query-scoped pin, same rationale as OmniPipeline.stamp:
    // zipWithIndex's count job and data job share one shuffle lineage
    // (partitioning is pinned regardless), but the pin makes the
    // post-shuffle sort execute once and store compressed batches
    // rather than re-sorting — or worse, object-caching — wide rows.
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CacheScope.defer(() => sorted.unpersist(blocking = false))
    val schema = StructType(
      sorted.schema.fields :+ StructField(serialCol, LongType, nullable = false))
    val withSerial = sorted.rdd.zipWithIndex.map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (idx + 1L))
    }
    spark.createDataFrame(withSerial, schema)
  }
}
