package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Balance derivation (reference sql.py:1320-1418 updateBalance,
  * :1658-1662 finalizeAfterBalances) — the mutate→derive rewrite.
  *
  * Two paths:
  *  - [[derive]]: the fast path — one groupBy(address, propertyId) over
  *    the ledger with four sums, map-side combinable, single shuffle.
  *    Valid whenever no freeze events touch the key.
  *  - [[deriveWithFreezes]]: the exact path with freeze semantics
  *    (sql.py:2344-2356 snapshot + :1408-1414 receive-while-frozen
  *    redirect), which is order-dependent per key → flatMapGroups over
  *    serial-sorted per-key events. Only keys WITH freeze events take
  *    this path (they are rare); everything else stays on the fast path,
  *    so the sequential region touches a vanishing fraction of data at
  *    100 TB.
  */
/** One row of the merged freeze-fold stream: kind 0 = ledger entry,
  * kind 1 = freeze marker — a freeze at serial s applies AFTER the
  * tx's own ledger rows at s (the reference reads the balance as-of
  * the freeze tx's processing point, sql.py:2344-2356), so (serial,
  * kind, idx) is the exact fold order as a SORT KEY. Top-level because
  * whole-stage codegen instantiates it from generated Java.
  */
final case class BalEvent(address: String, propertyId: Long,
    serial: Long, kind: Int, idx: Int, availableDelta: Long,
    reservedDelta: Long, acceptedDelta: Long, frozenDelta: Long,
    freeze: Boolean)

object Balances {

  /** Fast path: final balances = Σ deltas per (address, propertyId). */
  def derive(ledger: Dataset[LedgerEntry]): Dataset[AddressBalance] = {
    val spark = ledger.sparkSession
    import spark.implicits._
    ledger
      .groupBy($"address", $"propertyId")
      .agg(sum($"availableDelta").as("available"),
        sum($"reservedDelta").as("reserved"),
        sum($"acceptedDelta").as("accepted"),
        sum($"frozenDelta").as("frozen"),
        max($"txDbSerialNum").as("lastTxDbSerialNum"))
      .select($"address", $"propertyId", $"available", $"reserved",
        $"accepted", $"frozen", $"lastTxDbSerialNum",
        lit(false).as("frozenFlag"))
      .as[AddressBalance]
  }

  /** Exact path: keys hit by freeze events are folded sequentially;
    * all other keys use the fast aggregate. The union is the complete
    * balance table. The fold is a secondary sort (repartition +
    * sortWithinPartitions + [[GroupRuns]]): per-key state is five
    * longs and a flag — O(1) task memory per key regardless of how
    * long one address's history is.
    */
  def deriveWithFreezes(ledger: Dataset[LedgerEntry],
      freezes: Dataset[FreezeEvent]): Dataset[AddressBalance] = {
    val spark = ledger.sparkSession
    import spark.implicits._

    val frozenKeys = freezes.select($"address", $"propertyId").distinct()
    val hot = ledger.join(frozenKeys, Seq("address", "propertyId"),
      "left_semi").as[LedgerEntry]
    val cold = ledger.join(frozenKeys, Seq("address", "propertyId"),
      "left_anti").as[LedgerEntry]

    val merged = hot.map(e => BalEvent(e.address, e.propertyId,
        e.txDbSerialNum, 0, e.addressTxIndex, e.availableDelta,
        e.reservedDelta, e.acceptedDelta, e.frozenDelta, freeze = false))
      .union(freezes.map(f => BalEvent(f.address, f.propertyId,
        f.txDbSerialNum, 1, 0, 0, 0, 0, 0, f.freeze)))

    val folded =
      if (sys.env.get("GRAFT_BALANCES_BUCKETED").contains("1"))
        foldViaBucketedTable(merged)
      else foldInFlight(merged)
    folded.union(derive(cold))
  }

  /** The default freeze-fold: in-flight repartition + secondary sort +
    * [[GroupRuns]] — one exchange, no materialization. `private[graft]`
    * so the regime probe ([[graft.ProbeBucketedFold]]) can price it
    * against the bucketed variant on identical inputs.
    */
  private[graft] def foldInFlight(
      merged: Dataset[BalEvent]): Dataset[AddressBalance] = {
    val spark = merged.sparkSession
    import spark.implicits._
    merged
      .repartition($"address", $"propertyId")
      .sortWithinPartitions($"address", $"propertyId", $"serial",
        $"kind", $"idx")
      .mapPartitions { it =>
        new GroupRuns(it.map(e => ((e.address, e.propertyId), e)))
          .map { case ((addr, pid), run) => foldRun(addr, pid, run) }
      }
  }

  /** MEASUREMENT VARIANT (env-gated, r10 verdict ask #5): route the
    * freeze-fold stream through a BUCKETED, SORTED on-disk table
    * instead of the in-flight repartition+sort, so the fold reads a
    * pre-clustered scan with no exchange — the "pre-bucket the facts so
    * the windows read shuffle-free" hypothesis, made concrete at the
    * serve's dominant clustering step. Note what the variant can and
    * cannot remove: the bucketed WRITE still performs the same
    * clustering shuffle + sort the in-flight form does (bucket hashing
    * IS HashPartitioning on the same keys), so within a single serve it
    * adds a parquet round-trip; it can only win when one materialized
    * clustering feeds ≥2 clustering-aligned consumers or multiple runs
    * (the long-lived-pipeline shape). The A/B at 100× prices exactly
    * that delta. Correctness is independent of the A/B verdict: the
    * scan keeps one partition per bucket (all rows of a key together)
    * and the residual sortWithinPartitions is exchange-free, so the
    * gates stay hash-green under the flag.
    */
  private def foldViaBucketedTable(
      merged: Dataset[BalEvent]): Dataset[AddressBalance] =
    foldBucketedTable(merged.sparkSession, clusterToBucketedTable(merged))

  /** The variant's MATERIALIZE half: write the event stream as a
    * bucketed+sorted table (the clustering shuffle happens here, once),
    * returning the table name. Split from [[foldBucketedTable]] so the
    * regime the variant claims — one materialized clustering feeding
    * ≥2 aligned consumers — is actually expressible (the fused form
    * re-wrote the table per consumer, which is never a win by
    * construction). Caller-visible for [[graft.ProbeBucketedFold]]'s
    * A/B; the table is dropped at the harness's end-of-query release.
    */
  private[graft] def clusterToBucketedTable(
      merged: Dataset[BalEvent]): String = {
    val spark = merged.sparkSession
    import spark.implicits._
    require(spark.sessionState.conf.bucketingEnabled,
      "GRAFT_BALANCES_BUCKETED needs spark.sql.sources.bucketing.enabled " +
        "(a non-bucketed scan would split keys across partitions)")
    val n = spark.sessionState.conf.numShufflePartitions
    val tbl = "g_balev_" + java.lang.Long.toHexString(System.nanoTime())
    // pre-repartition on the bucket keys with numPartitions == numBuckets
    // (same Murmur3 hash both sides) → one file per bucket
    merged
      .repartition(n, $"address", $"propertyId")
      .write
      .bucketBy(n, "address", "propertyId")
      .sortBy("address", "propertyId", "serial", "kind", "idx")
      .mode("overwrite")
      .saveAsTable(tbl)
    graft.CacheScope.defer { () =>
      try spark.sql(s"DROP TABLE IF EXISTS $tbl")
      catch { case _: Exception => () }
    }
    tbl
  }

  /** The variant's CONSUME half: fold one pre-clustered bucketed table
    * — exchange-free scan, keys never split across partitions.
    */
  private[graft] def foldBucketedTable(spark: SparkSession,
      tbl: String): Dataset[AddressBalance] = {
    import spark.implicits._
    spark.table(tbl).as[BalEvent]
      // exchange-free (the bucketed scan already clusters by key);
      // belt-and-braces ordering in case a bucket ever holds >1 file
      .sortWithinPartitions($"address", $"propertyId", $"serial",
        $"kind", $"idx")
      .mapPartitions { it =>
        new GroupRuns(it.map(e => ((e.address, e.propertyId), e)))
          .map { case ((addr, pid), run) => foldRun(addr, pid, run) }
      }
  }

  /** Sequential fold of one (address, propertyId) event stream —
    * mirrors the reference's row-at-a-time updateBalance with the
    * freeze rules: freeze moves the CURRENT available to frozen
    * (snapshot), credits while frozen land in frozen instead of
    * available, unfreeze returns the frozen pot to available. Single
    * pass over the serial-sorted run; O(1) state.
    */
  private def foldRun(addr: String, pid: Long,
      events: Iterator[BalEvent]): AddressBalance = {
    var available = 0L; var reserved = 0L; var accepted = 0L
    var frozen = 0L; var isFrozen = false; var last = 0L

    events.foreach { e =>
      if (e.kind == 0) {
        if (isFrozen && e.availableDelta > 0) frozen += e.availableDelta
        else available += e.availableDelta
        reserved += e.reservedDelta
        accepted += e.acceptedDelta
        frozen += e.frozenDelta
        last = math.max(last, e.serial)
      } else {
        if (e.freeze && !isFrozen) {
          frozen += available; available = 0; isFrozen = true
        } else if (!e.freeze && isFrozen) {
          available += frozen; frozen = 0; isFrozen = false
        }
        last = math.max(last, e.serial)
      }
    }
    AddressBalance(addr, pid, available, reserved, accepted, frozen,
      last, isFrozen)
  }

  /** M6 — reset-from-node (reference sql.py:1134-1203
    * resetbalancesfromsnapshot: truncate the derived table, reload the
    * node's authoritative rows, resume deriving on top). Append-only
    * form: the snapshot rows become pseudo ledger entries (carrying the
    * snapshot's own serial), unioned with the post-snapshot ledger, and
    * the fast aggregate runs once — result = snapshot ⊕ Σ(later deltas),
    * regardless of what the pre-snapshot facts said. One shuffle, no
    * mutation, trivially idempotent (M7 backfill re-runs reuse it).
    */
  def resumeFromSnapshot(snapshot: Dataset[AddressBalance],
      ledger: Dataset[LedgerEntry]): Dataset[AddressBalance] = {
    val spark = snapshot.sparkSession
    import spark.implicits._
    val snapEntries = snapshot.map(b => LedgerEntry(b.address, b.propertyId,
      "Snapshot", b.lastTxDbSerialNum, 0, "snapshot", b.available,
      b.reserved, b.accepted, b.frozen))
    derive(snapEntries.union(ledger))
  }

  /** A2 — after-balance snapshots: the same cumulative sum evaluated at
    * every ledger row via a window — one shuffle on (address,
    * propertyId), sort by serial within partitions.
    */
  def afterBalances(ledger: Dataset[LedgerEntry]): org.apache.spark.sql.DataFrame = {
    val spark = ledger.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"address", $"propertyId")
      .orderBy($"txDbSerialNum", $"addressTxIndex")
      .rowsBetween(Window.unboundedPreceding, 0)
    ledger
      .withColumn("afterAvailable", sum($"availableDelta").over(w))
      .withColumn("afterReserved", sum($"reservedDelta").over(w))
      .withColumn("afterAccepted", sum($"acceptedDelta").over(w))
      .withColumn("afterFrozen", sum($"frozenDelta").over(w))
  }
}
