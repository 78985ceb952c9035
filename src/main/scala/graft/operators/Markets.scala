package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model._

/** Market ticker + per-block stats — reference sql.py:893-974
  * (updatemarkets) and :238-312 (updateTxStats), re-derived as plain
  * aggregations (A6/A5).
  */
object Markets {

  /** A6 — ticker per trading pair from the offer book: supply = Σ
    * available over active offers, best price = min unit price among
    * untouched offers (reference refines touched offers by effective
    * price — ceil(avail×origPrice) — reproduced here), last activity.
    * One shuffle on the pair key; dimension names join via broadcast at
    * serve time.
    */
  def tickers(offers: Dataset[ActiveOffer]): DataFrame = {
    val active = offers.where(col("offerState") === "active")
    val effective = when(col("amountAccepted") === 0, col("unitPrice"))
      .otherwise(
        ceil(col("amountAvailable").cast("decimal(38,8)") * col("unitPrice")) /
          greatest(col("amountAvailable"), lit(1L)))
    active
      .groupBy(col("propertyIdSelling"), col("propertyIdDesired"))
      .agg(
        sum(col("amountAvailable")).cast("long").as("supply"),
        min(when(col("amountAccepted") === 0, col("unitPrice")))
          .as("bestUntouchedPrice"),
        min(effective).as("bestEffectivePrice"),
        count(lit(1)).as("nOffers"),
        max(col("lastTxDbSerialNum")).as("lastTxDbSerialNum"))
  }

  /** A5 — per-block tx stats with a trailing 24-h window
    * (sql.py:266,276): counts per block + RANGE frame over epoch
    * seconds. At scale the window shuffles once on nothing heavier than
    * one row per block.
    */
  def txStats(txs: Dataset[(RawTx, Long)]): DataFrame = {
    val spark = txs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val perBlock = txs
      .map { case (tx, _) => (tx.block, tx.blocktime, tx.valid) }
      .toDF("block", "blocktime", "valid")
      .groupBy($"block")
      .agg(max($"blocktime").as("blockTime"),
        count(lit(1)).as("txCount"),
        count(when($"valid", 1)).as("validCount"),
        count(when(!$"valid", 1)).as("invalidCount"))
    val w = Window.orderBy($"blockTime").rangeBetween(-86400L, 0)
    perBlock
      .withColumn("txCount24h", sum($"txCount").over(w))
      .withColumn("blockCount24h", count(lit(1)).over(w))
  }
}
