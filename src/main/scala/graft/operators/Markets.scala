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
    * untouched offers, with touched offers refined by effective price —
    * ceil(avail×origPrice)/avail (sql.py:937) — and last activity.
    *
    * Prices are ×1e8-scaled BIGINT throughout: the 8-dp unitPrice scales
    * losslessly, the ceil and the final floor-division are exact integer
    * arithmetic (identical in every engine — no decimal-division rounding
    * to disagree on), and min() commutes with the monotone floor, so
    * min(effE8) = floor(min(eff)·1e8). Intermediates run in
    * DECIMAL(38,0) so avail×priceE8 can't overflow 64 bits at scale.
    * One shuffle on the pair key; dimension names join via broadcast at
    * serve time.
    */
  def tickers(offers: Dataset[ActiveOffer]): DataFrame = {
    val active = offers.where(col("offerState") === "active")
    active
      .withColumn("u_e8",
        (col("unitPrice") * lit(100000000L)).cast("decimal(38,0)"))
      // ceilNumer = ceil(avail × price); effE8 = floor(ceilNumer·1e8/avail)
      .withColumn("eff_e8",
        when(col("amountAccepted") === 0 || col("amountAvailable") === 0,
          col("u_e8").cast("long"))
          .otherwise(expr(
            """CAST((CAST((CAST(amountAvailable AS DECIMAL(38,0)) * u_e8
              |  + 99999999) DIV 100000000 AS DECIMAL(38,0)) * 100000000)
              |DIV amountAvailable AS BIGINT)""".stripMargin)))
      .groupBy(col("propertyIdSelling"), col("propertyIdDesired"))
      .agg(
        sum(col("amountAvailable")).cast("long").as("supply"),
        min(when(col("amountAccepted") === 0, col("u_e8").cast("long")))
          .as("bestUntouchedPriceE8"),
        min(col("eff_e8")).as("bestEffectivePriceE8"),
        count(lit(1)).as("nOffers"),
        max(col("lastTxDbSerialNum")).as("lastTxDbSerialNum"))
  }

  /** Per-block per-property USD valuation (sql.py:276-306
    * updateTxStatsBlock): volume = Σ|delta| over valid rows excluding
    * buyer/recipient roles, value = volume × latest pid→BTC rate ×
    * latest BTC→USD rate (÷1e8 first for divisible properties),
    * emitted as integer micro-USD.
    *
    * `flows` columns: block, propertyId, delta (base units), valid,
    * role, divisible. Rates are the append-only history — the
    * latest-per-pair view (W4) is taken here, then BROADCAST: the rate
    * dimension is tiny, so the only shuffle is the (block, propertyId)
    * aggregation, which combines map-side. Rate scaling is exact
    * integer (rate→e8, USD→cents) with DECIMAL(38,0) intermediates —
    * no float product to disagree across engines.
    */
  def txValueStats(flows: DataFrame,
      rates: Dataset[RatesEtl.Rate]): DataFrame = {
    val cur = RatesEtl.currentRates(rates)
    // aggregate to exactly ONE row even when no fiat rate exists yet —
    // an inner cross-join against an empty dim would drop the volume
    // counts too; valuation degrades to 0 instead (matches the pid-rate
    // left join below)
    val btcUsd = cur.where(col("protocol1") === "Fiat" &&
        col("protocol2") === "Bitcoin" &&
        col("propertyId1") === 0 && col("propertyId2") === 0)
      .agg(coalesce(max(round(col("rate1for2") * 100).cast("long")),
        lit(0L)).as("btc_usd_e2"))
    val pidRates = cur.where(col("protocol1") === "Bitcoin" &&
        col("protocol2") === "Omni")
      .select(col("propertyId2").as("propertyId"),
        round(col("rate1for2") * 100000000L).cast("long").as("rate_e8"))
    flows
      .where(!col("role").isin("buyer", "recipient"))
      .groupBy(col("block"), col("propertyId"), col("divisible"))
      .agg(
        coalesce(sum(when(col("valid"), abs(col("delta")))), lit(0L))
          .cast("long").as("volume"),
        count(when(col("valid"), 1)).as("txCount"),
        count(when(!col("valid"), 1)).as("invalidCount"))
      .join(broadcast(pidRates), Seq("propertyId"), "left")
      .crossJoin(broadcast(btcUsd))
      // value_usd = volume/1e8^div × rate_e8/1e8 × usd_e2/1e2 → micros ×1e6
      .withColumn("valueUsdMicros", expr(
        """CAST(CAST(volume AS DECIMAL(38,0)) * coalesce(rate_e8, 0)
          |  * btc_usd_e2
          |  DIV (CASE WHEN divisible THEN 1000000000000 ELSE 10000 END)
          |AS BIGINT)""".stripMargin))
      .drop("rate_e8", "btc_usd_e2")
  }

  /** A5 — per-block tx stats with a trailing 24-h window
    * (sql.py:266,276): counts per block + RANGE frame over epoch
    * seconds.
    *
    * The trailing window is PARTITIONED by UTC day with a one-day
    * overlap union instead of a global ORDER BY: a row at time T only
    * ever looks back to T−86400 ≥ (day−1)·86400, so copying each
    * per-block row into the NEXT day's partition as frame context
    * (dropped after the window) makes day partitions independent — no
    * single-task serial stage over the whole chain history, 2× tiny
    * rows through the exchange. Each source block contributes exactly
    * once per partition (own copy in its day, context copy in day+1),
    * so counts don't double.
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
      .withColumn("day", expr("blockTime div 86400"))
    val withContext = perBlock.withColumn("isOwn", lit(true))
      .unionByName(perBlock
        .withColumn("day", $"day" + 1)
        .withColumn("isOwn", lit(false)))
    val w = Window.partitionBy($"day").orderBy($"blockTime")
      .rangeBetween(-86400L, 0)
    withContext
      .withColumn("txCount24h", sum($"txCount").over(w))
      .withColumn("blockCount24h", count(lit(1)).over(w))
      .where($"isOwn")
      .drop("day", "isOwn")
  }
}
