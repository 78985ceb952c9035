package graft

import java.nio.file.Files
import graft.sinks.BlockRangeSink

/** S8 — idempotent per-range commit, watermark resume, reorg truncate. */
class BlockRangeSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("partition overwrite is idempotent; watermark resumes; truncate reorgs") {
    val dir = Files.createTempDirectory("graft_sink").toString
    assert(BlockRangeSink.watermark(spark, dir) == -1L)

    val batch1 = (1L to 1500L).map(b => (b, s"tx$b")).toDF("block", "txid")
    BlockRangeSink.write(batch1, dir)
    assert(BlockRangeSink.watermark(spark, dir) == 1500L)
    assert(BlockRangeSink.read(spark, dir).count() == 1500L)

    // re-run of the tail range (simulating a failed batch retry) — only
    // partition blockRange=1 is rewritten; no duplication
    val retry = (1000L to 1500L).map(b => (b, s"tx$b")).toDF("block", "txid")
    BlockRangeSink.write(retry, dir)
    assert(BlockRangeSink.read(spark, dir).count() == 1500L)
    // range 0 (blocks 1..999) untouched by the dynamic overwrite
    assert(BlockRangeSink.read(spark, dir)
      .where($"blockRange" === 0L).count() == 999L)

    assert(BlockRangeSink.truncateTo(spark, dir, 1200L).count() == 1200L)
  }

  test("compaction merges small files, preserves data, and is idempotent") {
    val dir = Files.createTempDirectory("graft_sink_compact").toString
    // 8 writer tasks per range → 8 small files per partition, the
    // incremental-commit fragmentation pattern
    val batch = (1L to 2000L).map(b => (b, s"tx$b")).toDF("block", "txid")
      .repartition(8)
    BlockRangeSink.write(batch, dir)
    val before = BlockRangeSink.stats(dir)
    // full ranges fragment into 8 files; the tail range holds a single
    // block and may produce fewer
    assert(before.count(_.nFiles == 8) >= 2, s"stats: $before")

    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val compacted = BlockRangeSink.compact(spark, dir)
    assert(compacted.toSet ==
      before.filter(_.nFiles > 1).map(_.blockRange).toSet)
    val after = BlockRangeSink.stats(dir)
    assert(after.forall(_.nFiles == 1),
      s"files per range after compact: ${after.map(_.nFiles)}")
    // byte-level content unchanged
    val rows = BlockRangeSink.read(spark, dir)
      .select($"block", $"txid").as[(Long, String)].collect().sorted
    assert(rows.length == 2000 && rows.head == (1L, "tx1") &&
      rows.last == (2000L, "tx2000"))
    assert(BlockRangeSink.watermark(spark, dir) == 2000L)
    // already-compacted table: nothing to do
    assert(BlockRangeSink.compact(spark, dir).isEmpty)
    // compaction released its own snapshots (shared test session may
    // hold other suites' blocks, so compare against the baseline)
    assert(spark.sparkContext.getPersistentRDDs.keySet == cachedBefore)
  }
}
