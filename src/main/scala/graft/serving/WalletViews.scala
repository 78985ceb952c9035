package graft.serving

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
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
    *
    * Valuation policy (pinned by the j9_valuation_2p53 gate): the
    * product is computed in EXACT DECIMAL — numeric(19) base units ×
    * the rate quantized to 8 dp — and cast to double once, at the
    * serving edge. The reference stores 19-digit integer base units
    * (omni_db_schema.psql:88-91) and multiplies numeric × numeric in
    * SQL before the API layer floats the result; a double × double
    * product instead would silently diverge in the last bit once
    * balances cross 2^53 (≈9.007e15 base units — reachable for real
    * 1e8-scaled supplies), because double(available) rounds BEFORE the
    * multiply. decimal(19,0) × decimal(18,8) → decimal(38,8) stays
    * within Spark's 38-digit exact range, so no precision-loss rewrite
    * fires and both engines round the same exact value to double.
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
          .otherwise((col("available").cast(DecimalType(19, 0)) *
            col("rate1for2").cast(DecimalType(18, 8)))
            .cast(DoubleType))
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

  /** Property dimension join for display fields (J8 shape): the name by
    * default; callers needing more registry columns (issuer, managed,
    * …) list them — one broadcast either way.
    */
  def withPropertyNames(df: DataFrame, properties: Dataset[SmartProperty],
      cols: Seq[String] = Seq("propertyName")): DataFrame =
    df.join(broadcast(properties.select(col("propertyId") +:
      cols.map(col): _*)), Seq("propertyId"), "left")
}
