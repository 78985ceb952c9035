package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import graft.model.{LedgerEntry, Roles}

/** BTC value-transfer ledger (reference sql.py:1671-1719): credit each
  * vout address, debit each vin's SOURCE OUTPUT address — which the
  * reference resolves with one `getrawtransaction` RPC per input plus
  * the ToLinkAddressesInTxs staging table (schema :288-309).
  *
  * Spark-first rewrite (SURVEY S4/J5): outputs are facts; inputs join
  * to the outputs they spend on (prevTxid, voutIndex) — ONE distributed
  * equi-join replaces per-row RPC, and `linkedTxDbSerialNum` becomes a
  * computed column on both legs (the UTXO graph is just this self-join).
  */
object BtcLedger {

  /** One tx output: (txid, serial, index, address, satoshis). */
  final case class TxOut(txid: String, serial: Long, n: Int,
      address: String, satoshis: Long)
  /** One tx input: (txid, serial, prevTxid, prevN). */
  final case class TxIn(txid: String, serial: Long, prevTxid: String,
      prevN: Int)

  def derive(outs: Dataset[TxOut], ins: Dataset[TxIn]): Dataset[LedgerEntry] = {
    val spark = outs.sparkSession
    import spark.implicits._

    val credits = outs.map { o =>
      LedgerEntry(o.address, 0L, "Bitcoin", o.serial, o.n,
        Roles.Recipient, o.satoshis, 0, 0, 0, 0L)
    }

    // input → prior output on (prevTxid, prevN); the spent output's
    // serial becomes the input row's linkage (and vice versa at read
    // time via the same join).
    val prev = outs.select($"txid".as("pTxid"), $"n".as("pN"),
      $"serial".as("pSerial"), $"address".as("pAddress"),
      $"satoshis".as("pSat"))
    val debits = ins.toDF()
      .join(prev, $"prevTxid" === $"pTxid" && $"prevN" === $"pN")
      .select($"pAddress".as("address"), lit(0L).as("propertyId"),
        lit("Bitcoin").as("protocol"), $"serial".as("txDbSerialNum"),
        $"prevN".as("addressTxIndex"), lit(Roles.Payer).as("addressRole"),
        (-$"pSat").as("availableDelta"), lit(0L).as("reservedDelta"),
        lit(0L).as("acceptedDelta"), lit(0L).as("frozenDelta"),
        $"pSerial".as("linkedTxDbSerialNum"))
      .as[LedgerEntry]

    credits.union(debits)
  }
}
