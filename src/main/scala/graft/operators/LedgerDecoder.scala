package graft.operators

import graft.model._
import graft.model.Amounts.toBase
import graft.model.Roles._

/** The per-tx-type state machine (reference sql.py:1664-2409
  * insertTxAddr, ~745 LoC) re-expressed as ONE pure function
  * `RawTx → Seq[LedgerEntry]` — the UDTF at the heart of the engine
  * (SURVEY.md §2.3). Used as `ds.flatMap(LedgerDecoder.decode)` over the
  * serial-stamped tx facts.
  *
  * Statelessness boundary (SURVEY §7.4): anything whose effect depends
  * on PRIOR state is NOT decided here —
  *  - DEx offer/accept lifecycle (types 20/22/-22) → [[DexLifecycle]]
  *    fold per (seller, pair);
  *  - freeze/unfreeze snapshot semantics (185/186) → [[Balances]]
  *    sequencer via [[freezeEvents]];
  *  - BTC vin linkage (prev-output lookup) → ledger self-join (J5).
  * Everything else — the large majority of volume — decodes
  * row-locally, embarrassingly parallel, no shuffle.
  *
  * Validity gating (sql.py:1785-1786, :2406-2407): invalid txs are still
  * recorded (for display) but with zero balance deltas; DEx purchase
  * validity arrives per-purchase (sql.py:2437-2440).
  */
object LedgerDecoder {

  /** Emit ledger rows for one decoded Omni tx at the given serial. */
  def decode(tx: RawTx, serial: Long): Seq[LedgerEntry] = {
    var idx = -1
    def row(addr: String, pid: Long, role: String, avail: Long = 0,
        reserved: Long = 0, accepted: Long = 0, frozen: Long = 0,
        linked: Long = 0): LedgerEntry = {
      idx += 1
      LedgerEntry(addr, pid, tx.protocol, serial, idx, role,
        if (tx.valid) avail else 0, if (tx.valid) reserved else 0,
        if (tx.valid) accepted else 0, if (tx.valid) frozen else 0, linked)
    }
    def amt: Long = toBase(tx.amount, tx.divisible)

    tx.type_int match {
      // Simple Send (sql.py:1776-1797)
      case 0 =>
        Seq(row(tx.sendingaddress, tx.propertyid, Sender, avail = -amt),
          row(tx.referenceaddress.getOrElse(tx.sendingaddress),
            tx.propertyid, Recipient, avail = amt))

      // Send To Owners (sql.py:1802-1846): sender debit, fee row to the
      // ecosystem's fee property (1 prod / 2 test), recipient credits
      // from the sto list (role payee).
      case 3 =>
        val feePid = if (tx.ecosystem == "Test") 2L else 1L
        val fee = toBase(tx.totalstofee, divisible = true)
        row(tx.sendingaddress, tx.propertyid, Sender, avail = -amt) +:
          row(tx.sendingaddress, feePid, FeePayer, avail = -fee) +:
          tx.recipients.map(r => row(r.address, tx.propertyid, Payee,
            avail = toBase(r.amount, tx.divisible)))

      // Send All (sql.py:1848-1901): explode subsends.
      case 4 =>
        tx.subsends.flatMap { ss =>
          val a = toBase(ss.amount, ss.divisible)
          Seq(row(tx.sendingaddress, ss.propertyid, Sender, avail = -a),
            row(tx.referenceaddress.getOrElse(tx.sendingaddress),
              ss.propertyid, Recipient, avail = a))
        }

      // MetaDEx trade (21/25, sql.py:2032-2127): reserve for-sale amount
      // row-locally; per-match settlement rows are derived by
      // [[MetaDexOps]] (needs the matched tx's serial for the same-block
      // dedup guard sql.py:2063-2069).
      case 21 | 25 =>
        Seq(row(tx.sendingaddress, tx.propertyid, Seller,
          avail = -amt, reserved = amt))

      // MetaDEx cancels (26/27/28, sql.py:2129-2166): explode
      // cancelledtransactions, unreserve.
      case 26 | 27 | 28 =>
        tx.cancelledtransactions.map { c =>
          val a = toBase(c.amountunreserved, tx.divisible)
          row(tx.sendingaddress, c.propertyid, Seller,
            avail = a, reserved = -a)
        }

      // Fixed issuance (50, sql.py:2168-2173): credit issuer in full.
      case 50 =>
        Seq(row(tx.sendingaddress, tx.propertyid, Issuer, avail = amt))

      // Crowdsale create (51): property registry only, no ledger effect.
      case 51 => Seq(row(tx.sendingaddress, tx.propertyid, Issuer))

      // Crowdsale purchase (-51, sql.py:2180-2232): buy-in moves
      // participant→issuer in the funding property; purchased and
      // issuer-bonus tokens are minted in the crowdsale property.
      case -51 =>
        val issuer = tx.referenceaddress.getOrElse(tx.sendingaddress)
        Seq(
          row(tx.sendingaddress, tx.propertyid, Payer, avail = -amt),
          row(issuer, tx.propertyid, Payee, avail = amt),
          row(tx.sendingaddress, tx.purchasedpropertyid, Participant,
            avail = toBase(tx.purchasedtokens, tx.purchaseddivisible)),
          row(issuer, tx.purchasedpropertyid, Issuer,
            avail = toBase(tx.issuertokens, tx.purchaseddivisible)))

      // Close crowdsale (53, sql.py:2237-2244 + :1485-1501): credit
      // addedissuertokens exactly once at close.
      case 53 =>
        val bonus = toBase(tx.addedissuertokens, tx.divisible)
        Seq(row(tx.sendingaddress, tx.propertyid, Issuer, avail = bonus))

      // Managed create / grant / revoke (54/55/56, sql.py:2246-2285).
      case 54 => Seq(row(tx.sendingaddress, tx.propertyid, Issuer))
      case 55 =>
        Seq(row(tx.referenceaddress.getOrElse(tx.sendingaddress),
          tx.propertyid, Recipient, avail = amt),
          row(tx.sendingaddress, tx.propertyid, Issuer))
      case 56 =>
        Seq(row(tx.sendingaddress, tx.propertyid, Issuer, avail = -amt))

      // Change issuer (70, sql.py:2287-2304): metadata rows only.
      case 70 =>
        Seq(row(tx.sendingaddress, tx.propertyid, Issuer),
          row(tx.referenceaddress.getOrElse(tx.sendingaddress),
            tx.propertyid, Recipient))

      // Add/remove delegate (73/74, sql.py:2306-2327): metadata.
      case 73 | 74 =>
        Seq(row(tx.sendingaddress, tx.propertyid, Issuer)) ++
          tx.referenceaddress.map(r => row(r, tx.propertyid, Recipient))

      // Freeze/unfreeze (185/186): ledger effect is state-dependent →
      // emitted by the Balances sequencer from [[freezeEvents]]; here
      // only the metadata row (propertyid decoded from payload, P5).
      case 185 | 186 =>
        Seq(row(tx.referenceaddress.getOrElse(tx.sendingaddress),
          payloadPropertyId(tx.payload), Recipient))

      // Embed any data (200, sql.py:2373-2390): metadata rows.
      case 200 =>
        Seq(row(tx.sendingaddress, tx.propertyid, Sender)) ++
          tx.referenceaddress.map(r => row(r, tx.propertyid, Recipient))

      // Feature activation (65534): FeatureActivations upsert only.
      case 65534 => Nil

      // DEx types are settled by DexLifecycle (see scaladoc above);
      // invalid ones still get their display row here (the fold only
      // processes valid events).
      case 20 | 22 | -22 if !tx.valid =>
        Seq(row(tx.sendingaddress, tx.propertyid,
          if (tx.type_int == 20) Seller else Buyer))
      case 20 | 22 | -22 => Nil

      case other =>
        // Unknown type: record sender metadata row (reference default
        // arm behavior — display without balance effect).
        Seq(row(tx.sendingaddress, tx.propertyid, Sender))
    }
  }

  /** Freeze/unfreeze tx types (185/186) — the only types
    * [[freezeEvents]] emits for. Shared constant:
    * [[graft.operators.OmniPipeline]]'s columnar pre-filter over the
    * stamped cache MUST select a superset of these, so both reference
    * this one definition.
    */
  val FreezeTypes: Set[Int] = Set(185, 186)

  /** Freeze markers for the Balances sequencer (types 185/186). */
  def freezeEvents(tx: RawTx, serial: Long): Seq[FreezeEvent] =
    if (!tx.valid) Nil
    else tx.type_int match {
      case 185 => Seq(FreezeEvent(
        tx.referenceaddress.getOrElse(tx.sendingaddress),
        payloadPropertyId(tx.payload), serial, freeze = true))
      case 186 => Seq(FreezeEvent(
        tx.referenceaddress.getOrElse(tx.sendingaddress),
        payloadPropertyId(tx.payload), serial, freeze = false))
      case _ => Nil
    }

  /** P5 — hex payload decode (sql.py:1626-1641): propertyid =
    * int(payload[8:16], 16).
    */
  def payloadPropertyId(payload: String): Long =
    if (payload.length >= 16)
      java.lang.Long.parseLong(payload.substring(8, 16), 16)
    else 0L
}
