package graft

import java.nio.file.Files
import graft.Fixtures._
import graft.streaming.IncrementalIngest

/** End-to-end incremental lifecycle: two overlapping ingest cycles must
  * produce the same facts and derived state as one-shot ingest; re-runs
  * are idempotent; raw JSON round-trips the RawTx schema.
  */
class IncrementalIngestSpec extends SparkTestBase {
  import spark.implicits._

  test("resume from watermark, tail-range rewrite, derived state equal to one-shot") {
    val factsDir = Files.createTempDirectory("graft_facts").toString
    val chain = Seq(
      grant(A, A, BigDecimal("100"), block = 1),
      simpleSend(A, B, BigDecimal("10"), block = 2),
      simpleSend(B, C, BigDecimal("3"), block = 3),
      simpleSend(A, C, BigDecimal("1"), block = 4),
      simpleSend(C, D, BigDecimal("2"), block = 5))

    // cycle 1: blocks 1-3
    val n1 = IncrementalIngest.ingest(spark,
      spark.createDataset(chain.filter(_.block <= 3)), factsDir)
    assert(n1 == 3L)
    // cycle 2: node returns an OVERLAPPING view (blocks 1-5); only new
    // blocks are admitted
    val n2 = IncrementalIngest.ingest(spark,
      spark.createDataset(chain), factsDir)
    assert(n2 == 2L)
    // re-run of the same cycle: nothing new, nothing duplicated
    assert(IncrementalIngest.ingest(spark,
      spark.createDataset(chain), factsDir) == 0L)
    assert(IncrementalIngest.readFacts(spark, factsDir).count() == 5L)

    val incremental = IncrementalIngest.derive(spark, factsDir)
      .balances.collect()
      .map(b => (b.address, b.propertyId) -> b.available).toMap
    val oneShot = graft.operators.OmniPipeline
      .derive(spark.createDataset(chain), 5)
      .balances.collect()
      .map(b => (b.address, b.propertyId) -> b.available).toMap
    assert(incremental == oneShot)
    assert(incremental((D, 31L)) == 200000000L)
  }

  test("raw JSON source round-trips the RawTx schema (S2/S3)") {
    val dir = Files.createTempDirectory("graft_raw").toString
    val txs = Seq(
      simpleSend(A, B, BigDecimal("1.5"), block = 10),
      tx(4, A, Some(B), block = 11).copy(subsends = Seq(
        graft.model.SubSend(7, divisible = false, BigDecimal(3)))))
    spark.createDataset(txs).write.mode("overwrite").json(dir)
    val back = IncrementalIngest.readRawJson(spark, dir)
      .collect().sortBy(_.block)
    assert(back.length == 2)
    assert(back(0).amount == BigDecimal("1.5"))
    assert(back(0).referenceaddress.contains(B))
    assert(back(1).subsends == txs(1).subsends)
  }
}
