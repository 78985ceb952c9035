package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
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
  *
  * All metadata operations (watermark probe, stats, partition deletes,
  * the writer lock) go through the Hadoop `FileSystem` API resolved
  * from the path + the session's hadoopConfiguration — the same code
  * path works against `file://`, HDFS, or an S3A table root; nothing
  * here assumes a local filesystem.
  *
  * Mutation concurrency — SINGLE WRITER (reference M10,
  * omniEngine.py:11-36: one lockfile around the whole engine):
  * [[write]], [[compact]] and [[dropAbove]] all rewrite partitions via
  * dynamic-partition overwrite, which is idempotent against a CRASH of
  * the same logical operation but not against a CONCURRENT different
  * one (a cron'd compactor racing a reorg rollback could resurrect a
  * dropped partition from its snapshot). Each therefore takes a
  * sink-level writer lock — an atomic create of `_graft_writer.lock`
  * under the table root — and a second concurrent mutator fails loudly
  * instead of interleaving. Readers never look at the lock (leading
  * `_` names are invisible to Spark's file index). A lock orphaned by
  * a crashed writer must be cleared explicitly with [[forceUnlock]] —
  * loud recovery is the point; silent expiry would re-admit the race.
  */
object BlockRangeSink {

  val RangeSize = 1000L

  val LockName = "_graft_writer.lock"

  /** Hadoop conf for FS resolution: the active session's (carries
    * cluster credentials/filesystem settings) when one exists, else a
    * default conf (specs constructing paths before the session is up).
    */
  private def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsFor(path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(hadoopConf), p)
  }

  /** Sink-level single-writer guard. `fs.create(overwrite = false)` is
    * the atomic primitive (atomic on HDFS and object-store committers;
    * check-then-create on the local RawLocalFileSystem, which is the
    * test stand-in, not the deployment target). Always released on
    * exit — including failure — so only a process CRASH leaves the
    * lock behind, and that case is [[forceUnlock]]'s.
    */
  private def withWriterLock[T](path: String)(body: => T): T = {
    val (fs, root) = fsFor(path)
    if (!fs.exists(root)) fs.mkdirs(root)
    val lock = new Path(root, LockName)
    val out =
      try fs.create(lock, /* overwrite = */ false)
      catch {
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"BlockRangeSink: writer lock $lock is held — a concurrent " +
              "mutation (write/compact/dropAbove) is in flight. The sink " +
              "is single-writer; if the holder crashed, clear it with " +
              "forceUnlock.", e)
      }
    out.close()
    try body finally fs.delete(lock, false)
  }

  /** Clear a writer lock orphaned by a crashed mutator. Deliberate,
    * named recovery — never called implicitly.
    */
  def forceUnlock(path: String): Boolean = {
    val (fs, root) = fsFor(path)
    fs.delete(new Path(root, LockName), false)
  }

  def write(df: DataFrame, path: String, blockCol: String = "block"): Unit =
    withWriterLock(path) {
      df.withColumn("blockRange", expr(s"$blockCol div $RangeSize"))
        .write
        .partitionBy("blockRange")
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite)
        .parquet(path)
    }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Resume watermark (reference omniEngine.py:61-66: select
    * max(blocknumber)): the high-water mark read from the sink's own
    * partitions — partition pruning makes this a metadata-only scan of
    * the tail.
    */
  def watermark(spark: SparkSession, path: String,
      blockCol: String = "block"): Long = {
    val (fs, root) = fsFor(path)
    val hasParts = fs.exists(root) &&
      fs.listStatus(root).exists(_.getPath.getName.startsWith("blockRange="))
    if (!hasParts) -1L
    else {
      // partition values are re-inferred on read (int), hence the casts
      val maxRange = read(spark, path)
        .agg(max(col("blockRange").cast("long"))).head().getLong(0)
      read(spark, path)
        .where(col("blockRange") === maxRange)
        .agg(max(col(blockCol).cast("long"))).head().getLong(0)
    }
  }

  /** Per-partition file statistics — metadata-only (directory listing,
    * no data scan): the observability a long-lived table needs to
    * decide when compaction pays.
    */
  final case class RangeStats(blockRange: Long, nFiles: Int, bytes: Long)

  def stats(path: String): Seq[RangeStats] = {
    val (fs, root) = fsFor(path)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("blockRange="))
      .map { d =>
        val files = fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        RangeStats(d.getPath.getName.stripPrefix("blockRange=").toLong,
          files.length, files.map(_.getLen).sum)
      }.sortBy(_.blockRange)
  }

  /** Small-file compaction: every incremental batch appends files to
    * its tail partitions, and a year of per-block commits leaves
    * thousands of KB-sized files per partition — death by open() at
    * 100 TB. Rewrite each partition whose file count exceeds what its
    * byte size justifies down to ceil(bytes/targetBytes) files, via
    * the same idempotent dynamic-partition overwrite as [[write]] (a
    * crashed compaction re-runs safely). The data is snapshotted
    * through a localCheckpoint first — Spark refuses to overwrite a
    * path it is concurrently reading, and the checkpoint decouples the
    * write from the source files. Returns the compacted ranges.
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Seq[Long] = withWriterLock(path) {
    val todo = stats(path).filter { s =>
      s.nFiles > math.max(1, math.ceil(s.bytes.toDouble / targetBytes).toInt)
    }
    todo.foreach { st =>
      val n = math.max(1, math.ceil(st.bytes.toDouble / targetBytes).toInt)
      val snap = read(spark, path)
        .where(col("blockRange").cast("long") === st.blockRange)
        .coalesce(n)
        .localCheckpoint()
      try
        snap.write
          .partitionBy("blockRange")
          .option("partitionOverwriteMode", "dynamic")
          .mode(SaveMode.Overwrite)
          .parquet(path)
      finally snap.queryExecution.analyzed.collect {
        // free the snapshot blocks immediately (Dataset.unpersist is a
        // no-op for localCheckpoints; drop the RDD under the plan leaf)
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      }.foreach(_.unpersist(blocking = false))
    }
    todo.map(_.blockRange)
  }

  /** M4 — reorg truncation at the storage layer: keep facts ≤ fork. */
  def truncateTo(spark: SparkSession, path: String, fork: Long,
      blockCol: String = "block"): DataFrame =
    read(spark, path).where(col(blockCol) <= fork)

  /** M4 under streaming — PHYSICAL reorg rollback (reference
    * reorgRollback sql.py:85-218: DELETE every derived row with
    * blocknumber > fork inside one transaction). [[truncateTo]] is the
    * read-side filter; a long-lived facts store must also drop the
    * orphaned bytes, or the next [[watermark]] still reads the orphaned
    * tip and [[graft.streaming.IncrementalIngest]] silently REJECTS the
    * winning branch (it admits only blocks > watermark).
    *
    * Partition-pruned by construction: every partition strictly above
    * the fork's range is removed as an `fs.delete(partitionDir)` (no
    * data scan), and only the fork's OWN partition is rewritten — so at
    * 100 TB a reorg costs one tail-partition rewrite plus metadata
    * deletes, never a table pass. Idempotent: a crashed/re-run rollback
    * finds the tail already gone and rewrites the fork partition to the
    * same bytes (same dynamic-overwrite mechanism as
    * [[write]]/[[compact]]).
    */
  def dropAbove(spark: SparkSession, path: String, fork: Long,
      blockCol: String = "block"): Unit = withWriterLock(path) {
    val forkRange = fork / RangeSize
    val all = stats(path)
    // fork's own partition: rewrite only if it actually straddles the
    // fork (rows on both sides); all-orphaned → plain directory drop
    if (all.exists(_.blockRange == forkRange)) {
      val part = read(spark, path)
        .where(col("blockRange").cast("long") === forkRange)
      if (!part.where(col(blockCol) > fork).isEmpty) {
        val keep = part.where(col(blockCol) <= fork)
        if (keep.isEmpty) deletePartitionDir(path, forkRange)
        else {
          // snapshot decouples the overwrite from its own source files
          // (Spark refuses to overwrite a path it is reading) — the
          // same pattern as [[compact]]
          val snap = keep.localCheckpoint()
          try
            snap.write
              .partitionBy("blockRange")
              .option("partitionOverwriteMode", "dynamic")
              .mode(SaveMode.Overwrite)
              .parquet(path)
          finally snap.queryExecution.analyzed.collect {
            case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
          }.foreach(_.unpersist(blocking = false))
        }
      }
    }
    all.filter(_.blockRange > forkRange)
      .foreach(st => deletePartitionDir(path, st.blockRange))
  }

  private def deletePartitionDir(path: String, range: Long): Unit = {
    // A swallowed failed delete here is the silent-rejection failure
    // mode dropAbove exists to prevent: the orphaned tip would keep
    // feeding watermark() and the ingest gate would reject the winning
    // branch forever. Fail loudly instead.
    val (fs, root) = fsFor(path)
    val d = new Path(root, s"blockRange=$range")
    if (fs.exists(d) && !fs.delete(d, /* recursive = */ true)) {
      throw new java.io.IOException(
        s"dropAbove: could not delete $d — aborting rollback so the " +
          "orphaned range is not silently retained above the fork")
    }
  }
}
