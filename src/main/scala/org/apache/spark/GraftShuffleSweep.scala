package org.apache.spark

/** Deterministic shuffle-file cleanup for multi-phase serves.
  *
  * A query that runs several heavyweight phases back-to-back inside ONE
  * evaluation (m4_reorg_flagship's two sequential fork serves) must
  * drop phase N's shuffle files before phase N+1 runs, or the phases'
  * scratch coexists (the 1000×-killing shape). Spark's ContextCleaner
  * does exactly this — but only when a GC happens to collect the
  * ShuffleDependency, and forcing that with `System.gc()` inside a
  * query body is fragile (`-XX:+DisableExplicitGC` silently turns it
  * off) and stalls the driver.
  *
  * This shim does the same cleanup deterministically: snapshot the
  * registered shuffle ids before a phase, and after the phase's output
  * is MATERIALIZED (eager localCheckpoint — its blocks, not its
  * lineage, serve reads) clean every id registered since. Lives in
  * `org.apache.spark` because the two hooks it composes —
  * `SparkContext.cleaner` and `MapOutputTrackerMaster.shuffleStatuses`
  * — are `private[spark]`. `doCleanupShuffle` is the cleaner's own
  * code path (unregisters map output, removes shuffle blocks, drops
  * the push-merge state), so the effect is identical to the GC route,
  * minus the GC.
  *
  * Safety: cleaning a shuffle id does not corrupt anything — if some
  * surviving plan DID still reference it, Spark refetches via lineage
  * (a recompute, not a wrong answer). The m4 call sites only sweep ids
  * created strictly inside a phase whose outputs are checkpointed, so
  * no recompute occurs in practice.
  */
object GraftShuffleSweep {

  /** The currently registered shuffle ids (driver-side metadata read). */
  def snapshot(sc: SparkContext): Set[Int] =
    sc.env.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.keySet.toSet
      case _ => Set.empty // executor-side tracker: nothing to sweep
    }

  /** Clean every shuffle registered since `before` was snapshotted.
    * Returns the number cleaned (0 when the cleaner is disabled via
    * spark.cleaner.referenceTracking=false — the sweep is then a no-op
    * and scratch falls back to end-of-application cleanup).
    */
  def dropSince(sc: SparkContext, before: Set[Int]): Int = {
    val now = snapshot(sc)
    val orphaned = (now -- before).toSeq.sorted
    sc.cleaner match {
      case Some(c) =>
        orphaned.foreach(id => c.doCleanupShuffle(id, blocking = true))
        orphaned.size
      case None => 0
    }
  }
}
