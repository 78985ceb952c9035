package graft.operators

import org.apache.spark.sql.Dataset
import graft.model.RawTx

/** M3 — time-based crowdsale expiry (reference expireCrowdsales
  * sql.py:1420-1444 + updateProperty :1485-1501): crowdsales whose JSON
  * `deadline` has passed are closed and the issuer is credited
  * `addedissuertokens` exactly once.
  *
  * Re-expressed as the synthetic-event pattern (SURVEY §2.8): instead
  * of mutating the property row, derive a synthetic type-53 close tx at
  * the deadline and let the ordinary decoder/derivation fold it in —
  * expiry is data, not control flow. A crowdsale closed explicitly
  * (a real type-53 tx before the deadline) suppresses the synthetic
  * close via anti-join.
  */
object CrowdsaleExpiry {

  /** `crowdsales`: the create txs (type 51) carrying
    * `addedissuertokens` + a deadline epoch encoded in `blocktime`-like
    * field `deadline`; here passed as (createTx, deadlineEpoch).
    */
  def syntheticCloses(crowdsales: Dataset[(RawTx, Long)],
      explicitCloses: Dataset[RawTx], nowEpoch: Long): Dataset[RawTx] = {
    val spark = crowdsales.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col

    val expired = crowdsales
      .filter { case (tx, deadline) =>
        tx.type_int == 51 && tx.valid && deadline <= nowEpoch
      }
      .map { case (create, deadline) =>
        create.copy(
          txid = create.txid.reverse, // deterministic synthetic id
          type_int = 53,
          blocktime = deadline,
          // place the close at the first block at/after the deadline;
          // callers with a block index can re-map blocktime→height
          block = create.block max deadline / 600,
          positioninblock = Int.MaxValue) // after all real txs there
      }
    val closedIds = explicitCloses
      .filter(t => t.type_int == 53 && t.valid)
      .select(col("propertyid").as("closedPid"))
    expired
      .join(closedIds, col("propertyid") === col("closedPid"), "left_anti")
      .as[RawTx]
  }
}
