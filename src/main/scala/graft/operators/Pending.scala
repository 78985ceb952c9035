package graft.operators

import org.apache.spark.sql.Dataset
import graft.model.RawTx
import org.apache.spark.sql.functions.col

/** Mempool "pending" tx handling (reference updateAddPending
  * sql.py:361-455, checkPending :314-354, 5-h expiry :322-327).
  *
  * The reference gives pending txs NEGATIVE serials and deletes them on
  * confirmation or expiry. Here pending is a separate low-watermark fact
  * set unioned at read (SURVEY §2.9 "early data"): a pending tx is
  * visible until (a) a confirmed tx with the same txid exists — an
  * anti-join, J10 — or (b) it is older than the expiry horizon.
  */
object Pending {

  val ExpirySeconds = 18000L // 5 h, sql.py:322-327

  /** The serving view: confirmed facts ∪ still-live pendings. */
  def unionAtRead(confirmed: Dataset[RawTx], pending: Dataset[RawTx],
      nowEpoch: Long): Dataset[RawTx] = {
    val live = reconcile(confirmed, pending, nowEpoch)
    confirmed.union(live)
  }

  /** J10 — pendings minus confirmed (anti-join on txid) minus expired. */
  def reconcile(confirmed: Dataset[RawTx], pending: Dataset[RawTx],
      nowEpoch: Long): Dataset[RawTx] = {
    val spark = confirmed.sparkSession
    import spark.implicits._
    val confirmedIds = confirmed.select(col("txid").as("confirmedTxid"))
    pending
      .filter(_.blocktime > nowEpoch - ExpirySeconds)
      .join(confirmedIds, col("txid") === col("confirmedTxid"), "left_anti")
      .as[RawTx]
  }
}
