package graft

import org.apache.hadoop.fs.Path

import graft.sinks.BlockRangeSink
import graft.streaming.IncrementalIngest

/** The sink's remote arm against REAL object-store semantics (r12
  * verdict "what's missing" #1): every sink operation — write,
  * watermark, stats, lock, compact, dropAbove, re-sync — runs end to
  * end over [[ObjectStoreFileSystem]] (`objfs://`): flat namespace,
  * PUT-on-close visibility, paginated LIST, copy+delete rename,
  * HEAD-then-PUT non-atomic create. Also pins the REQUEST BILL:
  * `stats()` is 1 HEAD + O(pages) LIST flat in partition count, and a
  * clean tail drop is metadata-only (zero PUT/COPY). Crash-prefix
  * recovery of these operations is [[CrashRecoverySpec]]'s subject.
  */
class ObjectStoreSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration

  override def beforeAll(): Unit = {
    super.beforeAll()
    conf.set("fs.objfs.impl", classOf[ObjectStoreFileSystem].getName)
  }

  private def table(bucket: String): String = {
    ObjectStoreFileSystem.resetBucket(bucket)
    s"objfs://$bucket/facts"
  }

  test("full sink lifecycle over S3 semantics: write / retry / stats / " +
      "watermark / compact / dropAbove / branch re-sync") {
    val dir = table("lifecycle")
    val batch = (1L to 3500L).map(b => (b, s"tx$b")).toDF("block", "txid")
      .repartition(4, $"block")
    BlockRangeSink.write(batch, dir)
    assert(BlockRangeSink.watermark(spark, dir) == 3500L)
    assert(BlockRangeSink.read(spark, dir).count() == 3500L)
    assert(BlockRangeSink.stats(dir).map(_.blockRange) == Seq(0L, 1L, 2L, 3L))

    // identical answer to the same write on the local arm (the
    // scheme-dependence ADVICE item, proven across a REAL semantic gap)
    val localDir = java.nio.file.Files
      .createTempDirectory("graft_objfs_ref").toString
    BlockRangeSink.write(batch, localDir)
    assert(BlockRangeSink.stats(dir).map(s => (s.blockRange, s.nFiles)) ==
      BlockRangeSink.stats(localDir).map(s => (s.blockRange, s.nFiles)))

    // failed-batch retry: dynamic overwrite of the owned ranges only,
    // no duplication — the committer's COPY+DELETE renames all ran
    // through the flat namespace
    BlockRangeSink.write(
      (3000L to 3500L).map(b => (b, s"tx$b")).toDF("block", "txid"), dir)
    assert(BlockRangeSink.read(spark, dir).count() == 3500L)
    assert(BlockRangeSink.read(spark, dir)
      .where($"blockRange" === 0L).count() == 999L)

    // fragment the tail (8 writer tasks → 8 small files in range 3,
    // the incremental-commit pattern), then compact, verify content
    BlockRangeSink.write(
      (3000L to 3506L).map(b => (b, s"tx$b")).toDF("block", "txid")
        .repartition(8, $"block"), dir)
    assert(BlockRangeSink.stats(dir).find(_.blockRange == 3L).get.nFiles >= 7)
    val compacted = BlockRangeSink.compact(spark, dir)
    assert(compacted.contains(3L))
    assert(BlockRangeSink.stats(dir).forall(_.nFiles == 1))
    assert(BlockRangeSink.watermark(spark, dir) == 3506L)
    val rows = BlockRangeSink.read(spark, dir)
      .select($"block", $"txid").as[(Long, String)].collect().sorted
    assert(rows.length == 3506 && rows.head == (1L, "tx1") &&
      rows.last == (3506L, "tx3506"))

    // reorg: straddling range rewritten, tail ranges dropped
    BlockRangeSink.dropAbove(spark, dir, 1200L)
    assert(BlockRangeSink.stats(dir).map(_.blockRange) == Seq(0L, 1L))
    assert(BlockRangeSink.watermark(spark, dir) == 1200L)
    assert(BlockRangeSink.read(spark, dir).count() == 1200L)

    // winning branch re-syncs through the ingest gate
    val branch = (1201L to 2100L).map(b => (b, s"alt$b")).toDF("block", "txid")
    assert(IncrementalIngest.ingestFrame(spark, branch, dir) == 900L)
    assert(BlockRangeSink.watermark(spark, dir) == 2100L)
    assert(BlockRangeSink.read(spark, dir)
      .where($"block".between(1000L, 1200L)).count() == 201L)
    // no lock left behind by any of the mutations
    assert(BlockRangeSink.lockOwner(dir).isEmpty)
  }

  test("PUT is visible only on close, and the HEAD-then-PUT window is a " +
      "REAL double-grant: both creators pass, read-back catches the loser") {
    val dir = table("lockrace")
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    fs.mkdirs(root)
    val lock = new Path(root, BlockRangeSink.LockName)

    // visibility: an in-flight create is invisible until close()
    val out = fs.create(lock, false)
    out.write("creatorA".getBytes("UTF-8"))
    assert(!fs.exists(lock), "object visible before close — not S3 semantics")
    // second creator's HEAD ALSO passes while A is unclosed: the real
    // double-grant, no simulation flag needed
    val out2 = fs.create(lock, false)
    out2.write("creatorB".getBytes("UTF-8"))
    out.close() // A's PUT lands
    out2.close() // B's PUT overwrites — last writer wins
    assert(BlockRangeSink.lockOwner(dir).contains("creatorB"))

    // layer 2 catches it: A's read-back names both parties and throws;
    // B survives its own verification
    val e = intercept[IllegalStateException] {
      BlockRangeSink.verifyLockOwner(fs, lock, "creatorA")
    }
    assert(e.getMessage.contains("creatorA") &&
      e.getMessage.contains("creatorB"))
    BlockRangeSink.verifyLockOwner(fs, lock, "creatorB")
    // a third mutator arriving now fails up front naming the holder
    val held = intercept[IllegalStateException] {
      BlockRangeSink.write(Seq((1L, "tx1")).toDF("block", "txid"), dir)
    }
    assert(held.getMessage.contains("creatorB"))
    assert(BlockRangeSink.forceUnlock(dir))
    // and after recovery the sink mutates + releases normally
    BlockRangeSink.write(Seq((1L, "tx1")).toDF("block", "txid"), dir)
    assert(BlockRangeSink.lockOwner(dir).isEmpty)
    assert(BlockRangeSink.watermark(spark, dir) == 1L)
  }

  test("request bill: stats() costs 1 HEAD + O(pages) LIST, flat in " +
      "partition count; pagination changes requests, never the answer; " +
      "a clean tail drop is metadata-only (zero PUT/COPY)") {
    val dir4 = table("bill4")
    BlockRangeSink.write(
      (1L to 3500L).map(b => (b, s"tx$b")).toDF("block", "txid"), dir4)
    val dir12 = table("bill12")
    BlockRangeSink.write(
      (1L to 11500L).map(b => (b, s"tx$b")).toDF("block", "txid"), dir12)

    def bill(dir: String): (Seq[BlockRangeSink.RangeStats], Map[String, Int]) = {
      ObjectStoreFileSystem.Ops.reset()
      val st = BlockRangeSink.stats(dir)
      (st, ObjectStoreFileSystem.Ops.snapshot)
    }
    val (st4, b4) = bill(dir4)
    val (st12, b12) = bill(dir12)
    assert(st4.map(_.blockRange) == (0L to 3L) &&
      st12.map(_.blockRange) == (0L to 11L))
    // THE scale property: one LIST regardless of partition count (the
    // per-dir loop would be 1 + P requests — O(100k) at 100 TB)
    assert(b4("LIST") == 1 && b12("LIST") == 1,
      s"stats LIST bill not flat: 4-part=$b4 12-part=$b12")
    assert(b4("HEAD") == 1 && b12("HEAD") == 1)
    assert(Seq("GET", "PUT", "COPY", "DELETE")
      .forall(k => b4(k) == 0 && b12(k) == 0),
      s"stats() touched data: $b4 / $b12")

    // pagination: shrink the page size — more LIST requests, same rows
    conf.setInt(ObjectStoreFileSystem.PageSizeKey, 3)
    try {
      val (stPaged, bPaged) = bill(dir12)
      assert(stPaged == st12, "pagination changed the stats answer")
      assert(bPaged("LIST") > 1,
        s"page size 3 over ${st12.map(_.nFiles).sum}+ keys should paginate: $bPaged")
    } finally conf.unset(ObjectStoreFileSystem.PageSizeKey)

    // a reorg drop strictly below the fork partition's rows: DELETE +
    // bounded GETs (the straddle check reads the fork partition), but
    // ZERO object writes — at 100 TB a tail drop must never copy data
    BlockRangeSink.dropAbove(spark, dir4, 999L)
    ObjectStoreFileSystem.Ops.reset()
    BlockRangeSink.dropAbove(spark, dir12, 999L)
    val bDrop = ObjectStoreFileSystem.Ops.snapshot
    assert(BlockRangeSink.stats(dir12).map(_.blockRange) == Seq(0L))
    assert(bDrop("PUT") <= 1 && bDrop("COPY") == 0, // ≤1: the lock stamp
      s"tail drop wrote data objects: $bDrop")
  }

  test("a rewrite stages durable parquet on the table's OWN store and " +
      "leaves zero pending/journal residue — with or without the " +
      "reliable-checkpoint session flag (the sink's rewrite protocol " +
      "no longer depends on any checkpoint policy)") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val dir = table("rewrite")
    // the reliable flag must be a no-op for sink mutations now: the
    // staged generation is parquet under _graft_pending, durable on the
    // table's store by construction (executor-loss-safe without any
    // checkpoint round-trip)
    val s = spark.newSession()
    s.conf.set(GraftCheckpoint.EnabledKey, "true")
    val sImp = s.implicits; import sImp._
    BlockRangeSink.write(
      (1L to 900L).map(b => (b, s"tx$b")).toDF("block", "txid")
        .repartition(4, $"block"), dir)
    val compacted = BlockRangeSink.compact(s, dir)
    assert(compacted == Seq(0L))
    assert(BlockRangeSink.stats(dir) ==
      BlockRangeSink.stats(dir).filter(_.nFiles == 1))
    assert(BlockRangeSink.read(s, dir).count() == 900L)
    // no scratch left under the table: no pending generation, no
    // journal, no checkpoint files, no staging dirs
    val fs = new Path(dir).getFileSystem(conf)
    val leaked = fs.listStatus(new Path(dir)).toSeq
      .map(_.getPath.getName)
      .filter(n => !n.startsWith("blockRange=") && n != "_SUCCESS")
    assert(leaked.isEmpty, s"rewrite leaked scratch on objfs: $leaked")
    // and the sink never touched the context's global checkpoint dir
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
  }
}
