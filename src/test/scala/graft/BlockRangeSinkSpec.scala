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
}
