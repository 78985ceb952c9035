package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Price/fee pipeline — reference updatePrices.py + updateFees.py
  * (SURVEY §3.2) as a tiny-dimension ETL: sources are fetched
  * driver-side (S6), parsed into small DataFrames, appended to an
  * immutable history; "current rates" is the latest-per-key VIEW (W4) —
  * the reference's upsert+trigger-archival (M1/M8) inverted into
  * append-only form.
  */
object RatesEtl {

  final case class Rate(protocol1: String, propertyId1: Long,
      protocol2: String, propertyId2: Long, rate1for2: Double,
      asOf: Long, source: String)

  /** Parse a bitcoinaverage-style payload ({SYM: rate}) fetched on the
    * driver into rate rows (updatePrices.py:113-125: 2-dp TRUNCATION,
    * not rounding).
    */
  def parseFiatRates(spark: SparkSession, rates: Map[String, Double],
      asOf: Long): Dataset[Rate] = {
    import spark.implicits._
    rates.toSeq.sortBy(_._1).map { case (sym, r) =>
      val truncated = math.floor(r * 100) / 100 // :125 truncate, 2 dp
      Rate("Fiat", fiatPropertyId(sym), "Bitcoin", 0L, truncated, asOf,
        "bitcoinaverage")
    }.toDS()
  }

  /** P10 — fiat symbol → propertyid dimension lookup
    * (updatePrices.py:17-22), deterministic hash in lieu of the DB
    * dimension.
    */
  def fiatPropertyId(symbol: String): Long =
    symbol.toUpperCase.foldLeft(0L)((a, c) => a * 31 + c) % 1000000 + 2000000000L

  /** A8 — VWAP over an exchange trade list (updatePrices.py:215-222). */
  def vwap(trades: DataFrame): DataFrame =
    trades.agg(
      (sum(col("amount") * col("rate")) / sum(col("amount"))).as("vwap"))

  /** A9 — mean fee across sources, int(sum/len) (updateFees.py:85-88). */
  def meanFees(fees: DataFrame): DataFrame =
    fees.groupBy(col("tier"))
      .agg((sum(col("fee").cast("long")) / count(lit(1))).cast("long")
        .as("meanFee"))

  /** History = append-only union (M8: the trigger-archival table is just
    * "all rows ever"); no mutation anywhere.
    */
  def appendHistory(history: Dataset[Rate], batch: Dataset[Rate]): Dataset[Rate] =
    history.unionByName(batch)

  /** W4 — the "current rates" serving view: latest row per pair. */
  def currentRates(history: Dataset[Rate]): Dataset[Rate] = {
    val spark = history.sparkSession
    import spark.implicits._
    val w = Window
      .partitionBy(col("protocol1"), col("propertyId1"),
        col("protocol2"), col("propertyId2"))
      .orderBy(col("asOf").desc, col("source").desc)
    history.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
      .as[Rate]
  }
}

/** Consensus-hash stamping (reference sql.py:221-229
  * updateConsensusHash: the node's omni_getcurrentconsensushash is
  * written onto the block row each cycle): the engine-side analog is a
  * deterministic digest over the derived balance state, so two
  * derivations (or a derivation and a node) can be compared by 24 bytes
  * instead of shipping the state.
  *
  * The digest is ORDER-INDEPENDENT — per-row sha256 of the canonical
  * `address|propertyId|available|reserved` line, combined with xor +
  * modular sum + count aggregates — so it computes with map-side
  * partials in one pass, no global sort: the shape that holds when the
  * state is billions of rows. (A sorted-stream sha would serialize the
  * reduce; equality discrimination is the same.)
  */
object ConsensusHash {
  import graft.model.AddressBalance

  def stateDigest(balances: Dataset[AddressBalance]): DataFrame =
    balances.toDF()
      .select(expr(
        """cast(conv(substring(sha2(concat_ws('|', address, propertyId,
          |  available, reserved), 256), 1, 15), 16, 10) as bigint)"""
          .stripMargin).as("h"))
      .agg(expr("bit_xor(h)").as("xor_digest"),
        sum(col("h") % 1000000007L).cast("long").as("sum_digest"),
        count(lit(1)).as("n_rows"))
}

/** A12/J11 — consensus reconciliation (reference sql.py:1205-1316
  * checkbalances_MP): full outer join of derived balances vs the node's
  * authoritative snapshot; every row classified OK / Missing / Mismatch.
  */
object Reconcile {
  import graft.model.AddressBalance

  final case class Diff(address: String, propertyId: Long, status: String,
      derivedAvailable: Long, oracleAvailable: Long)

  def diff(derived: Dataset[AddressBalance],
      oracle: Dataset[AddressBalance]): Dataset[Diff] = {
    val spark = derived.sparkSession
    import spark.implicits._
    val d = derived.select(col("address"), col("propertyId"),
      col("available").as("dAvail"))
    val o = oracle.select(col("address").as("oAddress"),
      col("propertyId").as("oPid"), col("available").as("oAvail"))
    d.join(o, col("address") === col("oAddress") &&
        col("propertyId") === col("oPid"), "full_outer")
      .select(
        coalesce(col("address"), col("oAddress")).as("address"),
        coalesce(col("propertyId"), col("oPid")).as("propertyId"),
        when(col("address").isNull, "MissingInDerived")
          .when(col("oAddress").isNull, "MissingInOracle")
          .when(col("dAvail") === col("oAvail"), "OK")
          .otherwise("Mismatch").as("status"),
        coalesce(col("dAvail"), lit(0L)).as("derivedAvailable"),
        coalesce(col("oAvail"), lit(0L)).as("oracleAvailable"))
      .as[Diff]
  }
}
