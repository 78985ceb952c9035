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
        // Branch, don't multiply by a coalesced zero: IEEE gives
        // negative × 0.0 = −0.0, but the reference's valuation CASE
        // (SQLstatements.md:15-86) yields +0.0 for unrated properties.
        when(col("rate1for2").isNull, lit(0.0))
          .otherwise(col("available") * col("rate1for2"))
          .as("availableValue"))
  }

  /** Tx history for an address (SQLstatements.md:87-124, :143-160):
    * ledger rows ⋈ tx dimension, ordered by submit time as the
    * reference's serving query does, paginated with limit/offset. The
    * (submitTime, serial, index) key is a total order, so every page is
    * deterministic — the pagination contract the wallet UI relies on.
    * The address filter hits the ledger scan (predicate pushdown), so
    * the sort ranks one address's history, not the table.
    *
    * `txDim` columns: txDbSerialNum, submitTime.
    */
  def addressHistory(ledger: Dataset[LedgerEntry], txDim: DataFrame,
      address: String, limit: Int = 50, offset: Int = 0): DataFrame =
    ledger.where(col("address") === address)
      .join(txDim, Seq("txDbSerialNum"))
      .orderBy(col("submitTime").asc, col("txDbSerialNum").asc,
        col("addressTxIndex").asc)
      .offset(offset)
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
