package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** End-to-end derivation: raw decoded txs → serial-stamped facts →
  * ledger → every derived table (SURVEY.md §7.1 "facts → derivations →
  * serving views").
  *
  * Reorg (reference sql.py:85-218 reorgRollback, 134 LoC of inverse
  * operators) is [[truncate]] + re-run — the payoff of immutable facts:
  * state(fork) ≡ derive(facts ≤ fork), byte-for-byte (asserted by
  * ReorgSpec).
  */
object OmniPipeline {

  private var lastStamperCache: Option[org.apache.spark.rdd.RDD[_]] = None

  final case class Derived(
      txs: Dataset[(RawTx, Long)],
      ledger: Dataset[LedgerEntry],
      balances: Dataset[AddressBalance],
      offers: Dataset[ActiveOffer],
      accepts: Dataset[OfferAccept],
      trades: Dataset[MatchedTrade],
      properties: Dataset[SmartProperty])

  /** Deterministic serial assignment (W1): total order by
    * (block, positioninblock) via range partition + zipWithIndex —
    * never a single-partition window (SURVEY §7.4.6).
    */
  def withSerials(txs: Dataset[RawTx]): Dataset[(RawTx, Long)] =
    stamp(txs, col("block"), col("positioninblock"), col("txid"))

  /** Generic serial stamper — stamp the NARROWEST dataset available
    * (e.g. key tuples) and join/map the wide rows afterwards: the
    * sample and count passes then move only a few columns.
    */
  def stamp[T](txs: Dataset[T], order: org.apache.spark.sql.Column*): Dataset[(T, Long)] = {
    val spark = txs.sparkSession
    implicit val enc: Encoder[(T, Long)] =
      Encoders.tuple(txs.encoder, Encoders.scalaLong)
    val sorted = txs
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    // zipWithIndex runs a count job before the data pass — cache the
    // sorted RDD so the shuffle+sort executes once, not twice. Only one
    // stamper cache is live at a time (released on the next call), so
    // repeated pipeline runs in one session don't accumulate memory.
    val rdd = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    OmniPipeline.synchronized {
      lastStamperCache.foreach(_.unpersist(blocking = false))
      lastStamperCache = Some(rdd)
    }
    spark.createDataset(
      rdd.zipWithIndex.map { case (tx, i) => (tx, i + 1L) })
  }

  def derive(txs: Dataset[RawTx], tipBlock: Long): Derived = {
    val spark = txs.sparkSession
    import spark.implicits._

    val stamped = withSerials(txs)

    val baseLedger = stamped.flatMap { case (tx, s) =>
      LedgerDecoder.decode(tx, s)
    }
    val dex = DexLifecycle.derive(stamped, tipBlock)
    val dexLedger = dex.flatMap(_.ledger)
    val (trades, metaLedger) = MetaDexOps.derive(stamped)

    val ledger = baseLedger.union(dexLedger).union(metaLedger)
    val freezes = stamped.flatMap { case (tx, s) =>
      LedgerDecoder.freezeEvents(tx, s)
    }
    val balances = Balances.deriveWithFreezes(ledger, freezes)
    val offers = dex.flatMap(_.offers)
    val accepts = dex.flatMap(_.accepts)
    val properties = PropertyRegistry.derive(stamped)

    Derived(stamped, ledger, balances, offers, accepts, trades, properties)
  }

  /** M4 — reorg as re-derivation: drop facts past the fork, re-run. */
  def truncate(txs: Dataset[RawTx], forkBlock: Long): Dataset[RawTx] =
    txs.filter(_.block <= forkBlock)
}

/** FeatureActivations (reference sql.py:2392-2396 + :1094-1132
  * checkPendingActivations): latest state per feature — a latest-per-key
  * view (W4) over activation txs, re-polled state collapses to "the
  * newest row wins".
  */
object FeatureActivations {
  final case class Activation(featureId: Long, activationBlock: Long,
      pending: Boolean, lastTxDbSerialNum: Long)

  def derive(txs: Dataset[(RawTx, Long)], tipBlock: Long): Dataset[Activation] = {
    val spark = txs.sparkSession
    import spark.implicits._
    txs
      .filter { case (tx, _) => tx.type_int == 65534 && tx.valid }
      .groupByKey(_._1.featureid)
      .mapGroups { (fid, it) =>
        val (tx, serial) = it.maxBy(_._2)
        Activation(fid, tx.block, pending = tx.block > tipBlock, serial)
      }
  }
}

/** SmartProperties registry (reference sql.py:1524-1600 insertProperty,
  * :1485-1501 updateProperty): per-property fold over lifecycle txs
  * (50/51/54 create, 70 change-issuer) ordered by serial — tiny groups,
  * one shuffle on propertyid.
  */
object PropertyRegistry {
  def derive(txs: Dataset[(RawTx, Long)]): Dataset[SmartProperty] = {
    val spark = txs.sparkSession
    import spark.implicits._
    txs
      .filter { case (tx, _) =>
        tx.valid && Set(50, 51, 54, 70).contains(tx.type_int)
      }
      .groupByKey(_._1.propertyid)
      .mapGroups { (pid, it) =>
        val events = it.toSeq.sortBy(_._2)
        val create = events.find(e => e._1.type_int != 70)
        val (ctx, cserial) = create.getOrElse(events.head)
        var issuer = ctx.sendingaddress
        events.foreach {
          case (tx, _) if tx.type_int == 70 =>
            issuer = tx.referenceaddress.getOrElse(tx.sendingaddress)
          case _ => ()
        }
        SmartProperty(pid, issuer, ctx.ecosystem, ctx.propertyname,
          ctx.divisible, managed = ctx.type_int == 54, cserial,
          events.map(_._2).max)
      }
  }
}
