package graft.operators

import org.apache.spark.sql.Dataset
import graft.model._
import graft.model.Amounts.toBase
import graft.model.Roles._

/** DEx (coin-for-token) order-book lifecycle — reference
  * sql.py:704-794 (updatedex), :645-702 (offerAccept), :590-643
  * (updateAccept), :537-588 (expireAccepts).
  *
  * An accept binds to the seller's THEN-ACTIVE offer; a replaced offer
  * refunds its unaccepted remainder; accepts expire at
  * `timelimit + acceptBlock`; purchases settle reserved/accepted into
  * the buyer's available — all order-dependent per
  * (seller, propertyIdSelling), so: ONE secondary-sorted stream fold
  * per key (repartition + sortWithinPartitions + [[GroupRuns]],
  * SURVEY §7.4.2). Keys are independent — the fold shuffles once on
  * the seller/pair key and parallelizes across sellers; the per-key
  * input streams through without materializing, so even a pathological
  * seller history is bounded by its OUTPUT size, not by an input
  * buffer + sort copy in task memory.
  *
  * Outputs: final [[ActiveOffer]]/[[OfferAccept]] states plus the
  * SYNTHETIC ledger entries for every balance effect (reserve, refund,
  * accept-hold, purchase settlement, expiry return) — which then flow
  * into [[Balances.derive]] like any other facts.
  */
object DexLifecycle {

  final case class DexResult(offers: Seq[ActiveOffer],
      accepts: Seq[OfferAccept], ledger: Seq[LedgerEntry])

  /** Fold all DEx txs (types 20/22/-22). `tipBlock` drives the final
    * expiry sweep (reference runs expireAccepts per block; processing
    * events in serial order and sweeping at each event's block is
    * equivalent because expiry effects only need to precede the next
    * event that could observe them).
    */
  /** The DEx lifecycle's tx types (20 offer, 22 accept, -22 BTC
    * payment). Shared constant: [[graft.operators.OmniPipeline]]'s
    * columnar pre-filter over the stamped cache MUST select a superset
    * of what [[derive]]'s typed filter keeps, so both reference this
    * one definition — adding a type here widens both in lockstep
    * (r13 ADVICE: the duplicated literals could silently drop rows).
    */
  val EventTypes: Set[Int] = Set(20, 22, -22)

  /** Fold key of one DEx event: 22 accepts and -22 purchases are sent
    * BY the buyer TO the seller — the key is always the seller's
    * address plus the property being sold.
    */
  private def keyOf(tx: RawTx): (String, Long) = {
    val pid = if (tx.type_int == -22)
      tx.purchases.headOption.map(_.propertyid).getOrElse(tx.propertyid)
    else tx.propertyid
    val seller = tx.type_int match {
      case -22 => tx.purchases.headOption.map(_.referenceaddress)
        .getOrElse(tx.sendingaddress)
      case 22 => tx.referenceaddress.getOrElse(tx.sendingaddress)
      case _ => tx.sendingaddress
    }
    (seller, pid)
  }

  def derive(txs: Dataset[(RawTx, Long)], tipBlock: Long): Dataset[DexResult] = {
    val spark = txs.sparkSession
    import spark.implicits._
    val keyed = txs
      .filter(t => EventTypes.contains(t._1.type_int))
      // One BTC payment can settle accepts held by SEVERAL sellers: the
      // reference iterates purchases[] and each purchase names its own
      // referenceaddress/propertyid (sql.py:1966-2030). Explode -22 into
      // one synthetic single-purchase event per purchase so each lands in
      // its own (seller, pid) fold group; the purchase index is the
      // same-serial tiebreaker, preserving the reference's purchase
      // order (sort-after-shuffle is not stable, so order must be in
      // the sort key, not arrival).
      .flatMap { case (tx, serial) =>
        if (tx.type_int == -22)
          tx.purchases.filter(_.valid).zipWithIndex.map { case (p, i) =>
            val (seller, pid) = keyOf(tx.copy(purchases = Seq(p)))
            (seller, pid, tx.copy(purchases = Seq(p)), serial, i)
          }
        else {
          val (seller, pid) = keyOf(tx)
          Seq((seller, pid, tx, serial, 0))
        }
      }
    // Secondary sort instead of groupByKey+toSeq: one shuffle on the
    // (seller, pid) key, serial order established by the partition
    // sort, and each key's run folds as a STREAM — a pathological
    // seller history costs O(fold state + its output), never an
    // O(group)-sized input buffer + sort copy in task memory.
    keyed
      .repartition($"_1", $"_2")
      .sortWithinPartitions($"_1", $"_2", $"_4", $"_5")
      .mapPartitions { it =>
        new GroupRuns(it.map(r => ((r._1, r._2), (r._3, r._4))))
          .map { case ((seller, pid), run) =>
            foldKey(seller, pid, run, tipBlock)
          }
      }
  }

  /** Seq convenience overload (specs build small fixtures). */
  def foldKey(seller: String, pid: Long, events: Seq[(RawTx, Long)],
      tipBlock: Long): DexResult =
    foldKey(seller, pid, events.iterator, tipBlock)

  /** Sequential fold of one (seller, propertyIdSelling) order-book
    * history, consumed as a serial-ordered STREAM (single pass, O(1)
    * input buffering). Mirrors the reference's per-tx handlers exactly;
    * see the per-case citations.
    */
  def foldKey(seller: String, pid: Long, events: Iterator[(RawTx, Long)],
      tipBlock: Long): DexResult = {
    var offer: Option[ActiveOffer] = None
    val doneOffers = Seq.newBuilder[ActiveOffer]
    var accepts = Map.empty[String, OfferAccept] // open, by buyer
    val doneAccepts = Seq.newBuilder[OfferAccept]
    val ledger = Seq.newBuilder[LedgerEntry]
    var idx = Map.empty[Long, Int] // addressTxIndex per serial

    def row(serial: Long, addr: String, role: String, avail: Long = 0,
        reserved: Long = 0, accepted: Long = 0, linked: Long = 0): Unit = {
      val i = idx.getOrElse(serial, 0)
      idx += serial -> (i + 1)
      ledger += LedgerEntry(addr, pid, "Omni", serial, i, role,
        avail, reserved, accepted, 0, linked)
    }

    /** Expiry sweep (sql.py:537-588): unpaid/partial accepts whose
      * expireBlock has passed release their accepted hold back to the
      * offer; if the offer is gone ('replaced'/'cancelled'), the seller
      * gets the reserve back directly.
      */
    def expire(block: Long): Unit = {
      val (dead, live) = accepts.partition(_._2.expireBlock < block)
      accepts = live
      dead.values.foreach { a =>
        // only the un-purchased remainder of the hold returns
        // (sql.py:555-560 credits amountaccepted less what was bought)
        val back = a.amountAccepted - a.amountPurchased
        // the hold returns to the offer it was taken FROM; if that offer
        // is gone (replaced/cancelled), the seller's balance gets it
        // directly (reference branches on the sale's state,
        // sql.py:570-585)
        if (back > 0) offer match {
          case Some(o) if o.createTxDbSerialNum == a.saleTxDbSerialNum =>
            offer = Some(o.copy(amountAccepted = o.amountAccepted - back,
              amountAvailable = o.amountAvailable + back))
            row(a.acceptTxDbSerialNum, seller, Seller, accepted = -back,
              linked = a.saleTxDbSerialNum)
          case _ =>
            row(a.acceptTxDbSerialNum, seller, Seller, avail = back,
              reserved = -back, accepted = -back,
              linked = a.saleTxDbSerialNum)
        }
        doneAccepts += a.copy(dexState =
          if (a.amountPurchased > 0) "paid-partial-expired" else "expired")
      }
    }

    /** Close the open offer, refunding the unaccepted remainder
      * (sql.py:762-772).
      */
    def closeOffer(state: String, serial: Long): Unit = offer.foreach { o =>
      val refund = o.amountAvailable
      if (refund > 0)
        row(serial, seller, Seller, avail = refund, reserved = -refund,
          linked = o.createTxDbSerialNum)
      doneOffers += o.copy(offerState = state, amountAvailable = 0,
        lastTxDbSerialNum = serial)
      offer = None
    }

    events.foreach { case (tx, serial) =>
      expire(tx.block)
      tx.type_int match {
        // New/update/cancel sell offer (sql.py:704-794).
        case 20 if tx.valid =>
          val amt = toBase(tx.amount, tx.divisible)
          tx.subaction match {
            case 3 => closeOffer("cancelled", serial)
            case sub =>
              if (offer.isDefined) closeOffer("replaced", serial)
              if (amt > 0) {
                row(serial, seller, Seller, avail = -amt, reserved = amt)
                val price =
                  if (amt == 0) BigDecimal(0)
                  else (toBase(tx.bitcoindesired, divisible = true) * BigDecimal(100000000) /
                    BigDecimal(amt)).setScale(8, BigDecimal.RoundingMode.HALF_UP)
                offer = Some(ActiveOffer(seller, pid, 0, amt, amt, 0,
                  toBase(tx.bitcoindesired, divisible = true), tx.timelimit,
                  price, "active", serial, serial))
              }
          }

        // Accept (sql.py:645-702): hold amount on the then-active offer,
        // clamped to what's still available; expiry at timelimit+block.
        case 22 =>
          offer match {
            // a buyer with an open accept can't accept again until it
            // settles or expires (duplicate accepts are invalid)
            case Some(o) if tx.valid && !accepts.contains(tx.sendingaddress) =>
              val want = toBase(tx.amount, tx.divisible)
              val got = math.min(want, o.amountAvailable)
              if (got > 0) {
                offer = Some(o.copy(amountAvailable = o.amountAvailable - got,
                  amountAccepted = o.amountAccepted + got,
                  lastTxDbSerialNum = serial))
                row(serial, tx.sendingaddress, Buyer,
                  linked = o.createTxDbSerialNum)
                row(serial, seller, Seller, accepted = got,
                  linked = o.createTxDbSerialNum)
                accepts += tx.sendingaddress -> OfferAccept(
                  tx.sendingaddress, seller, pid, got, 0,
                  o.createTxDbSerialNum, serial, tx.block,
                  o.timeLimit + tx.block, "unpaid")
              } else doneAccepts += OfferAccept(tx.sendingaddress, seller,
                pid, 0, 0, o.createTxDbSerialNum, serial, tx.block,
                tx.block, "invalid")
            case _ =>
              doneAccepts += OfferAccept(tx.sendingaddress, seller, pid,
                0, 0, 0, serial, tx.block, tx.block, "invalid")
          }

        // BTC payment → purchase (sql.py:1966-2030, :590-643): move
        // bought amount seller(reserved+accepted)→buyer(available).
        case -22 =>
          tx.purchases.filter(_.valid).foreach { p =>
            accepts.get(tx.sendingaddress).foreach { a =>
              // scale by the PURCHASED property's divisibility — the
              // payment tx's own flag describes at most one of the
              // (possibly several) properties its purchases settle
              val bought = math.min(toBase(p.amountbought, p.divisible),
                a.amountAccepted - a.amountPurchased)
              if (bought > 0) {
                row(serial, seller, Seller, reserved = -bought,
                  accepted = -bought, linked = a.saleTxDbSerialNum)
                row(serial, tx.sendingaddress, Buyer, avail = bought,
                  linked = a.saleTxDbSerialNum)
                val a2 = a.copy(amountPurchased = a.amountPurchased + bought,
                  dexState = if (a.amountPurchased + bought >= a.amountAccepted)
                    "paid-complete" else "paid-partial")
                // adjust offer bookkeeping only if the accept belongs to
                // the CURRENT offer — a replaced offer's accepts settle
                // from the seller's reserve without touching the new one
                offer = offer.map(o =>
                  if (o.createTxDbSerialNum == a.saleTxDbSerialNum)
                    o.copy(amountAccepted = o.amountAccepted - bought,
                      totalSelling = o.totalSelling - bought,
                      lastTxDbSerialNum = serial)
                  else o)
                if (a2.dexState == "paid-complete") {
                  accepts -= tx.sendingaddress; doneAccepts += a2
                } else accepts += tx.sendingaddress -> a2
                // Offer fully sold when nothing available nor accepted
                // (sql.py:613-619).
                offer.foreach { o =>
                  if (o.amountAvailable == 0 && o.amountAccepted == 0) {
                    doneOffers += o.copy(offerState = "sold",
                      lastTxDbSerialNum = serial)
                    offer = None
                  }
                }
              }
            }
          }
        case _ => ()
      }
    }
    expire(tipBlock + 1)
    offer.foreach(o => doneOffers += o)
    accepts.values.foreach(doneAccepts += _)
    DexResult(doneOffers.result(), doneAccepts.result(), ledger.result())
  }
}
