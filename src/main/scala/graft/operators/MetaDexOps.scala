package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import graft.model._
import graft.model.Amounts.toBase

/** MetaDEx (token-for-token) trade settlement — reference
  * sql.py:2032-2127 + updatedex2 :797-861 + insertMatch :872-883 +
  * updatedex2remaining :977-1011.
  *
  * The decoder already reserves the for-sale amount row-locally; this
  * operator settles matches. A match is listed on BOTH sides by the
  * node; the reference's dedup guard (sql.py:2063-2069) applies it only
  * on the later tx — here: join each match's txid to its serial and keep
  * `matchSerial < txSerial`. That's an equi-join on txid + inequality
  * filter — fully relational, one shuffle, no sequential region.
  */
object MetaDexOps {

  /** MetaDEx tx types (21 listing, 25 listing+embedded matches). Shared
    * constant: [[graft.operators.OmniPipeline]]'s columnar pre-filter
    * over the stamped cache MUST select a superset of what the typed
    * filters here keep (both [[derive]] and [[remaining]] additionally
    * require `valid`), so all three reference this one definition.
    */
  val TradeTypes: Set[Int] = Set(21, 25)

  /** Returns (MatchedTrades, settlement ledger entries). Settlement per
    * deduped match (4 rows, sql.py:2078-2101): sold amount moves
    * taker-reserved→maker-available, received amount moves
    * maker-reserved→taker-available (fee recorded on the trade row,
    * deducted from the received leg as in the reference).
    *
    * Join shape — ONE dedup join over full match rows, deliberately
    * NOT the narrow-tuples-then-reattach variant. Round 7 shipped a
    * "send_all treatment" (tx fields re-attached post-dedup on the
    * numeric serial key) on the theory that wide rows through the
    * dedup join caused round 6's measured last-decade bend; round 8's
    * same-session A/B falsified both halves: the bend reproduces with
    * EITHER shape (it is the one-box disk boundary — the r6 build
    * itself reads 33×/decade on the r8 box vs its recorded 14.6×),
    * and the narrow variant was consistently SLOWER (1×: 2.31→2.68 s,
    * 100×: 38.9→41.6 s, 1000×: 1287→1358 s, count-action A/B; wide
    * also wins under the r8 fullEval action, 3.15 vs 3.65 at 1× and
    * 46.8 vs 49.7 at 100×) — the second shuffle join costs more than
    * the thinner dedup rows save, at every scale measured (PERF.md
    * round 8). The maker address is taken from the match object
    * itself — the reference reads it directly as match['address']
    * (sql.py:2070), which is what `m.address` below mirrors; it is
    * definitionally equal to the matched listing's sendingaddress,
    * so the pre-r8 counterpart-lookup source produced the same value.
    */
  def derive(txs: Dataset[(RawTx, Long)]): (Dataset[MatchedTrade], Dataset[LedgerEntry]) = {
    val spark = txs.sparkSession
    import spark.implicits._

    val metaTxs = txs.filter(t =>
      TradeTypes.contains(t._1.type_int) && t._1.valid)

    val serialByTxid = metaTxs
      .map { case (tx, s) => (tx.txid, s) }
      .toDF("mTxid", "mSerial")

    val exploded = metaTxs.flatMap { case (tx, serial) =>
      tx.matches.map { m =>
        MatchRow(serial, tx.txid, tx.sendingaddress, tx.propertyid,
          tx.propertyiddesired, tx.block, m.txid, m.address,
          toBase(m.amountsold, tx.divisible),
          toBase(m.amountreceived, tx.desireddivisible),
          toBase(m.tradingfee, tx.desireddivisible))
      }
    }

    // Dedup guard (sql.py:2063-2069): a match is listed on BOTH sides;
    // apply it only on the later tx (matchSerial < txSerial).
    // NOT pinned, deliberately: both derive outputs (trades, ledger)
    // consume this subtree, so a plan using both evaluates the dedup
    // join twice — but caching here was MEASURED NET-NEGATIVE
    // (metadex_settlement 1.96→3.71 s paying materialization for a
    // stream it consumes once, vs ~1 s saved in the mixed-type
    // flagship; re-measured round 8 on this shape — see PERF.md).
    val deduped = exploded
      .join(serialByTxid, $"matchTxid" === $"mTxid")
      .where($"mSerial" < $"serial")
      .drop("mTxid", "mSerial")
      .as[MatchRow]

    val trades = deduped.map { r =>
      MatchedTrade(r.serial, r.txid, r.pidSold, r.pidRecv, r.amountSold,
        r.amountReceived, r.block, r.fee, r.matchTxid)
    }

    val ledger = deduped.flatMap { r =>
      Seq(
        LedgerEntry(r.taker, r.pidSold, "Omni", r.serial, 0,
          Roles.Seller, 0, -r.amountSold, 0, 0, 0),
        LedgerEntry(r.maker, r.pidSold, "Omni", r.serial, 1,
          Roles.Buyer, r.amountSold, 0, 0, 0, 0),
        LedgerEntry(r.maker, r.pidRecv, "Omni", r.serial, 2,
          Roles.Seller, 0, -r.amountReceived, 0, 0, 0),
        LedgerEntry(r.taker, r.pidRecv, "Omni", r.serial, 3,
          Roles.Buyer, r.amountReceived - r.fee, 0, 0, 0, 0))
    }
    (trades, ledger)
  }

  /** Open remaining per trade offer (updatedex2remaining
    * sql.py:977-1011): reserve − sold-as-taker − delivered-as-maker.
    * Pure aggregation over the deduped matches against the reserve.
    */
  def remaining(txs: Dataset[(RawTx, Long)]): Dataset[MetaRemaining] = {
    val spark = txs.sparkSession
    import spark.implicits._
    val metaTxs = txs.filter(t =>
      TradeTypes.contains(t._1.type_int) && t._1.valid)
    val offers = metaTxs.map { case (tx, s) =>
      (s, tx.txid, tx.sendingaddress, tx.propertyid, tx.propertyiddesired,
        toBase(tx.amount, tx.divisible))
    }.toDF("serial", "txid", "seller", "pidSold", "pidRecv", "reserve")

    val serialByTxid = metaTxs.map { case (tx, s) => (tx.txid, s) }
      .toDF("mTxid", "mSerial")
    val matchesRaw = metaTxs.flatMap { case (tx, serial) =>
      tx.matches.map(m => (serial, m.txid,
        toBase(m.amountsold, tx.divisible),
        toBase(m.amountreceived, tx.desireddivisible)))
    }.toDF("serial", "matchTxid", "sold", "received")
    val deduped = matchesRaw
      .join(serialByTxid, $"matchTxid" === $"mTxid")
      .where($"mSerial" < $"serial")

    // Both deductions fold into ONE keyed aggregate (taker side keyed
    // on serial, maker side on mSerial, unioned) so the big offers
    // stream is shuffled through ONE left join instead of two — at
    // scale each extra join is a full exchange of the offer book. The
    // union's two branches share the deduped subtree, so ReuseExchange
    // computes the dedup shuffle once.
    val contrib = deduped
      .select($"serial".as("dSerial"), $"sold".as("s"), lit(0L).as("r"))
      .unionByName(deduped
        .select($"mSerial".as("dSerial"), lit(0L).as("s"),
          $"received".as("r")))
      .groupBy($"dSerial")
      .agg(sum($"s").as("takerSold"), sum($"r").as("makerSold"))

    offers
      .join(contrib, $"serial" === $"dSerial", "left")
      .select($"serial", $"txid", $"seller", $"pidSold", $"pidRecv",
        $"reserve",
        ($"reserve" - coalesce($"takerSold", lit(0L)) -
          coalesce($"makerSold", lit(0L))).as("remaining"))
      .as[MetaRemaining]
  }

  final case class MatchRow(serial: Long, txid: String, taker: String,
      pidSold: Long, pidRecv: Long, block: Long, matchTxid: String,
      maker: String, amountSold: Long, amountReceived: Long, fee: Long)

  final case class MetaRemaining(serial: Long, txid: String,
      seller: String, pidSold: Long, pidRecv: Long, reserve: Long,
      remaining: Long)
}
