package graft.serving

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.{AddressBalance, LedgerEntry, SmartProperty}
import graft.operators.RatesEtl.Rate

/** The API read path (reference database/SQLstatements.md:4-191 —
  * SURVEY §3.3): wallet balances with fiat values, per-address tx
  * history, point lookups. These are thin join/projection programs over
  * the derived tables; dimensions (rates, properties) broadcast.
  */
object WalletViews {

  /** Balances + values for a wallet (SQLstatements.md:15-86): wallet
    * membership ⋈ balances ⋈ latest rates, `balance × rate`
    * projections. `walletAddresses(address, walletId)`.
    */
  def walletBalances(balances: Dataset[AddressBalance],
      walletAddresses: DataFrame, currentRates: Dataset[Rate]): DataFrame = {
    val rates = currentRates
      .select(col("propertyId1").as("ratePid"), col("rate1for2"))
    balances.toDF()
      .join(walletAddresses, Seq("address"))
      .join(broadcast(rates), col("propertyId") === col("ratePid"), "left")
      .select(col("walletId"), col("address"), col("propertyId"),
        col("available"), col("reserved"),
        (col("available") * coalesce(col("rate1for2"), lit(0.0)))
          .as("availableValue"))
  }

  /** Tx history for an address (SQLstatements.md:87-124, :143-160):
    * ledger rows ⋈ tx dimension, newest first.
    */
  def addressHistory(ledger: Dataset[LedgerEntry], address: String,
      limit: Int = 50): DataFrame =
    ledger.where(col("address") === address)
      .orderBy(col("txDbSerialNum").desc, col("addressTxIndex").asc)
      .limit(limit)
      .toDF()

  /** Point lookup by serial (SQLstatements.md:125-142, :161-182). */
  def bySerial(ledger: Dataset[LedgerEntry], serial: Long): DataFrame =
    ledger.where(col("txDbSerialNum") === serial).toDF()

  /** Property dimension join for display names (J8 shape). */
  def withPropertyNames(df: DataFrame,
      properties: Dataset[SmartProperty]): DataFrame =
    df.join(broadcast(properties.select(col("propertyId"),
      col("propertyName"))), Seq("propertyId"), "left")
}
