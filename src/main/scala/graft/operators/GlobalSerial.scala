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
    import org.apache.spark.sql.functions.{col, element_at, typedLit}
    // One object pass (same partition-offset mechanism as
    // OmniPipeline.stamp/withSerials, ported r14): tag each sorted row
    // with (partition id, 1-based local index), pin THAT columnar
    // (query-scoped — compressed batches, not wide JVM objects), read
    // the per-partition counts off the cache with a columnar aggregate
    // (which doubles as the eager fill), and assign
    // serial = offsets(pid) + localIdx as codegen arithmetic.
    // zipWithIndex's separate count job and second full deserialize
    // pass are gone; range partitions are key-ordered, so this IS the
    // zipWithIndex assignment (w1_global_serial's oracle — the naive
    // global row_number — pins it end-to-end).
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val base = sorted.schema.fields
    val idxSchema = StructType(base :+
      StructField("__gs_pid", org.apache.spark.sql.types.IntegerType,
        nullable = false) :+
      StructField("__gs_idx", LongType, nullable = false))
    val indexed = spark.createDataFrame(
        sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
          var i = 0L
          it.map { row => i += 1L; Row.fromSeq(row.toSeq :+ pid :+ i) }
        }, idxSchema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.CacheScope.defer(() => indexed.unpersist(blocking = false))
    val counts = indexed.groupBy(col("__gs_pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val nParts = indexed.rdd.getNumPartitions
    val offsets = new Array[Long](nParts)
    var acc = 0L
    (0 until nParts).foreach { p =>
      offsets(p) = acc; acc += counts.getOrElse(p, 0L)
    }
    indexed.select(base.map(f => col("`" + f.name + "`")) :+
      (col("__gs_idx") +
        element_at(typedLit(offsets.toSeq), col("__gs_pid") + 1))
        .as(serialCol): _*)
  }
}
