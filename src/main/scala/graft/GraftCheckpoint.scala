package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.{Dataset, SparkSession}

/** Snapshot policy for eager mid-query materialization (r11 verdict
  * ask #2).
  *
  * The engine's snapshot sites — the m4 sequential fork schedule
  * (bound peak scratch to one fork serve; the sink's compact/dropAbove
  * stopped snapshotting in round 13, when their rewrite moved to the
  * journaled pending-swap protocol, durable without any checkpoint) —
  * default to `localCheckpoint()`: blocks on
  * executors, no distributed-FS round-trip, the right latency/cost
  * point for a benchmark or a static cluster. But local checkpoint
  * blocks DIE WITH THEIR EXECUTOR, and a localCheckpoint cannot
  * recompute (lineage is truncated by design) — under
  * `spark.dynamicAllocation.enabled` or executor loss, a consumer of
  * the snapshot fails terminally.
  *
  * `spark.graft.reliableCheckpoint=true` swaps every such site to a
  * RELIABLE `checkpoint()`: the snapshot is written to a
  * cluster-visible directory (resolution order:
  * `spark.graft.checkpointDir` → the site's own hint, e.g. the sink
  * table's `_graft_checkpoint/` → an already-set
  * `SparkContext.setCheckpointDir`), so it survives the loss of any —
  * or every — executor (demonstrated by [[MultiJvmDemo]]: an executor
  * JVM is force-killed between snapshot and consume under
  * `local-cluster`). Default off: at bench scale the FS write is pure
  * overhead; on a long-lived or dynamically-allocated cluster, turn it
  * on.
  *
  * When the default (local) path runs under dynamic allocation it
  * WARNS once per session instead of refusing — deallocation is
  * timing-dependent and a hard refuse would break static-executor jobs
  * that merely inherited the conf.
  */
object GraftCheckpoint {

  /** Boolean session conf: reliable `checkpoint()` instead of
    * `localCheckpoint()` at every engine snapshot site.
    */
  val EnabledKey = "spark.graft.reliableCheckpoint"

  /** Cluster-visible checkpoint directory for the reliable mode; wins
    * over per-site hints and any pre-set `SparkContext` checkpoint dir.
    */
  val DirKey = "spark.graft.checkpointDir"

  def reliable(spark: SparkSession): Boolean =
    spark.conf.get(EnabledKey, "false").toBoolean

  private val warnedDynamicAllocation = new AtomicBoolean(false)

  /** `SparkContext.setCheckpointDir` is a GLOBAL sticky mutation, and
    * `Dataset.checkpoint()` reads it back internally — two concurrent
    * reliable snapshots with different `dirHint`s could otherwise land
    * files under each other's directory (correctness would hold —
    * [[free]] deletes by the RDD's own checkpoint path — but table-dir
    * hygiene and the loud no-dir error would blur). The set→checkpoint
    * pair therefore runs under this JVM-wide monitor, and the prior
    * dir is RESTORED afterwards so the engine's per-site hints never
    * leak into the caller's own later `rdd.checkpoint()` calls. (When
    * no dir was set before the first reliable snapshot, the last hint
    * stays — the public API has a setter but no clearer.)
    */
  private val checkpointDirLock = new Object

  /** Eagerly materialize `ds` per the session's checkpoint policy.
    * `dirHint` is the site's natural home for reliable snapshot files
    * (the sink passes its table's `_graft_checkpoint/`); sites with no
    * natural home pass None and the operator supplies [[DirKey]].
    */
  def snapshot[T](ds: Dataset[T], dirHint: Option[String] = None)
      : Dataset[T] = {
    val spark = ds.sparkSession
    if (reliable(spark)) checkpointDirLock.synchronized {
      val sc = spark.sparkContext
      val prior = sc.getCheckpointDir
      spark.conf.getOption(DirKey).orElse(dirHint) match {
        case Some(dir) => sc.setCheckpointDir(dir)
        case None if prior.isDefined => // keep it
        case None => throw new IllegalStateException(
          s"$EnabledKey=true but no checkpoint directory: set $DirKey " +
            "(a cluster-visible path) or SparkContext.setCheckpointDir " +
            "before running snapshot-materializing operators.")
      }
      try ds.checkpoint()
      finally prior.filter(p => !sc.getCheckpointDir.contains(p))
        .foreach(sc.setCheckpointDir)
    } else {
      if (spark.conf.get("spark.dynamicAllocation.enabled", "false")
            .toBoolean &&
          warnedDynamicAllocation.compareAndSet(false, true))
        System.err.println(
          "[graft] WARN: localCheckpoint snapshots under dynamic " +
            "allocation — blocks die with released executors and cannot " +
            s"recompute. Set $EnabledKey=true (and $DirKey) for " +
            "executor-loss-safe snapshots.")
      ds.localCheckpoint()
    }
  }

  /** Free a snapshot produced by [[snapshot]]: drop the block-level
    * cache (local mode) and delete the checkpoint files (reliable
    * mode — Spark only deletes them itself under
    * `spark.cleaner.referenceTracking.cleanCheckpoints`, which
    * defaults false). Safe on either mode: `getCheckpointFile` is None
    * for local checkpoints, `unpersist` is a no-op for reliable ones.
    *
    * Acts ONLY when `ds` IS a snapshot — its analyzed plan is exactly
    * the checkpoint's `LogicalRDD` leaf. Collecting leaves from
    * arbitrary DERIVED plans instead would free any shared upstream
    * snapshot the plan happens to read (a fork-2 serve found its
    * shared stamped prefix unpersisted by fork-1's scoped release
    * exactly that way — CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND, caught by
    * FullReorgSpec before it shipped); a no-op for non-snapshot
    * datasets is the safe contract.
    */
  def free(ds: Dataset[_]): Unit = ds.queryExecution.analyzed match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      val conf = ds.sparkSession.sparkContext.hadoopConfiguration
      l.rdd.unpersist(blocking = false)
      l.rdd.getCheckpointFile.foreach { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        try p.getFileSystem(conf).delete(p, true)
        catch { case _: java.io.IOException => () }
      }
    case _ => ()
  }
}
