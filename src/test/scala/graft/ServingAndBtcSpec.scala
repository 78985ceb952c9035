package graft

import graft.model.{AddressBalance, RawTx}
import graft.operators.{BtcLedger, Pending, RatesEtl}
import graft.serving.WalletViews

class ServingAndBtcSpec extends SparkTestBase {
  import spark.implicits._
  import BtcLedger.{TxIn, TxOut}

  test("BTC ledger: vout credits, vin debits via prev-output join, linkage set") {
    // tx1 pays A(60) and B(40); tx2 spends tx1:0 (A's 60) to C
    val outs = spark.createDataset(Seq(
      TxOut("t1", 1L, 0, "A", 60L), TxOut("t1", 1L, 1, "B", 40L),
      TxOut("t2", 2L, 0, "C", 60L)))
    val ins = spark.createDataset(Seq(TxIn("t2", 2L, "t1", 0)))
    val ledger = BtcLedger.derive(outs, ins).collect()
    val byAddr = ledger.groupBy(_.address)
      .view.mapValues(_.map(_.availableDelta).sum).toMap
    assert(byAddr == Map("A" -> 0L, "B" -> 40L, "C" -> 60L))
    val debit = ledger.find(_.availableDelta < 0).get
    assert(debit.address == "A" && debit.txDbSerialNum == 2L &&
      debit.linkedTxDbSerialNum == 1L) // UTXO linkage both ways
  }

  test("pending reconciliation: confirmed anti-join + 5h expiry (J10)") {
    val now = 100000L
    def p(txid: String, seen: Long) =
      Fixtures.simpleSend("A", "B", BigDecimal(1)).copy(
        txid = txid, blocktime = seen)
    val confirmed = spark.createDataset(Seq(p("c1", now - 100)))
    val pending = spark.createDataset(Seq(
      p("c1", now - 200),                       // confirmed → dropped
      p("p1", now - 100),                       // live
      p("p2", now - Pending.ExpirySeconds - 1))) // expired → dropped
    val live = Pending.reconcile(confirmed, pending, now).collect()
    assert(live.map(_.txid).toSeq == Seq("p1"))
    assert(Pending.unionAtRead(confirmed, pending, now).count() == 2L)
  }

  test("wallet balances view: membership join + broadcast rate projection (J9)") {
    val balances = spark.createDataset(Seq(
      AddressBalance("A", 31L, 100L, 0, 0, 0, 1L),
      AddressBalance("B", 31L, 50L, 0, 0, 0, 1L)))
    val wallet = Seq(("A", "w1")).toDF("address", "walletId")
    val rates = spark.createDataset(Seq(
      RatesEtl.Rate("Omni", 31L, "Fiat", 1L, 2.5, 1000L, "test")))
    val v = WalletViews.walletBalances(balances, wallet, rates).collect()
    assert(v.length == 1)
    assert(v.head.getAs[String]("walletId") == "w1")
    assert(v.head.getAs[Double]("availableValue") == 250.0)
  }

}
