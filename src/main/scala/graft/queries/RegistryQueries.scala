package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t
import graft.model._
import graft.operators.PropertyRegistry

/** SmartProperties registry at reference fidelity through the t2 gate
  * (sql.py:1524-1600 insertProperty, :1469-1501 crowdsale tally).
  *
  * Synthesis: orders chain per property (pid = 1 + orderkey % 40). The
  * first order creates the property (51 crowdsale when odd, 54 managed
  * when even) carrying the full name/category/subcategory/url/data
  * payload; later orders are crowdsale purchases (−51, grouped by the
  * PURCHASED pid) or grants/revokes (55/56); the last order closes the
  * crowdsale (53, pid%4=1 — bonus credited once), changes issuer (70,
  * pid%4=2) or appoints a delegate (73, pid%4=0). Every third pid is
  * divisible (×1e8 base units). The oracle re-derives all of it with
  * windows + conditional aggregation.
  *
  * Synthetic tally amounts are bounded SF-INDEPENDENTLY: each
  * purchase/grant contributes `cents // rn` (cents < 1e5, rn the
  * per-property serial rank), so a property's total is a harmonic sum
  * ≤ Σ 99999/rn ≤ 99999·(ln 99999 + 1) ≈ 1.3e6 display units — ×1e8
  * divisible scaling ≈ 1.3e14 base units at ANY scale factor. The two
  * prior bounds both fell to scaled sweeps: the unbounded sum × 1e8
  * crossed INT64 at sf0.1 (round-3 10× sweep), and the round-8
  * flat `cents % 100000` bound crossed it again at the 1000× sweep
  * (sf100: 3.75M purchases/property × ~5e4 × 1e8 ≈ 1.9e19 — DuckDB's
  * exact HUGEINT refused the BIGINT cast while the engine's Long
  * accumulator would have wrapped silently; see the overflow guard in
  * [[graft.operators.PropertyRegistry.foldKey]]). A linear-in-SF bound
  * cannot survive scale sweeps; the harmonic one is flat. In the REAL
  * domain the Omni protocol caps any property's supply below 2^63
  * (node-validated before the reference ever stores it), so bounded
  * tallies are the faithful regime, not a test concession.
  */
object RegistryQueries {

  val registry = Q(
    "property_registry",
    """WITH o AS (SELECT o_orderkey AS k, o_custkey AS c,
      |    1 + o_orderkey % 40 AS pid,
      |    CAST(round(o_totalprice * 100) AS BIGINT) % 100000 AS cents,
      |    o_orderpriority AS pri, o_orderstatus AS st
      |  FROM orders),
      |r AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY k) AS rn,
      |    count(*) OVER (PARTITION BY pid) AS cnt FROM o),
      |agg AS (SELECT pid,
      |    min(CASE WHEN rn = 1 THEN k END) AS create_serial,
      |    max(k) AS last_serial,
      |    min(CASE WHEN rn = 1 THEN 'I' || CAST(c AS VARCHAR) END) AS create_issuer,
      |    min(CASE WHEN rn = 1 THEN pri END) AS category,
      |    min(CASE WHEN rn = 1 THEN st END) AS subcategory,
      |    min(CASE WHEN rn = cnt AND cnt > 1 AND pid % 4 = 2
      |      THEN 'J' || CAST(c AS VARCHAR) END) AS new_issuer,
      |    min(CASE WHEN rn = cnt AND cnt > 1 AND pid % 4 = 0
      |      THEN 'D' || CAST(c AS VARCHAR) END) AS delegate_addr,
      |    max(CASE WHEN rn = cnt AND cnt > 1 AND pid % 4 = 1
      |      THEN 1 ELSE 0 END) AS closed,
      |    sum(CASE WHEN rn = cnt AND cnt > 1 AND pid % 4 = 1
      |      THEN cents % 1000 ELSE 0 END) AS bonus,
      |    count(CASE WHEN pid % 2 = 1 AND rn > 1
      |      AND NOT (rn = cnt AND cnt > 1 AND pid % 4 = 1)
      |      THEN 1 END) AS participants,
      |    sum(CASE WHEN pid % 2 = 1 AND rn > 1
      |      AND NOT (rn = cnt AND cnt > 1 AND pid % 4 = 1)
      |      THEN cents // rn ELSE 0 END) AS purchased,
      |    sum(CASE WHEN pid % 2 = 1 AND rn > 1
      |      AND NOT (rn = cnt AND cnt > 1 AND pid % 4 = 1)
      |      THEN (cents // rn) // 10 ELSE 0 END) AS issuer_base,
      |    sum(CASE WHEN pid % 2 = 0 AND rn > 1
      |      AND NOT (rn = cnt AND cnt > 1)
      |      THEN CASE WHEN rn % 5 = 0 THEN -((cents // rn) // 3)
      |           ELSE cents // rn END ELSE 0 END) AS granted
      |  FROM r GROUP BY pid),
      |s AS (SELECT *,
      |    CASE WHEN pid % 3 = 0 THEN 100000000 ELSE 1 END AS mult
      |  FROM agg)
      |SELECT CAST(pid AS BIGINT) AS property_id,
      |  coalesce(new_issuer, create_issuer) AS issuer,
      |  'P' || CAST(pid AS VARCHAR) AS name,
      |  CAST(CASE WHEN pid % 3 = 0 THEN 2 ELSE 1 END AS INT) AS prop_type,
      |  category, subcategory,
      |  pid % 2 = 1 AS is_crowdsale,
      |  pid % 2 = 1 AND closed = 0 AS crowdsale_active,
      |  CAST(participants AS BIGINT) AS participants,
      |  CAST(purchased * mult AS BIGINT) AS tokens_purchased,
      |  CAST((issuer_base + bonus) * mult AS BIGINT) AS issuer_tokens,
      |  CAST(granted * mult AS BIGINT) AS granted,
      |  coalesce(delegate_addr, '') AS delegate,
      |  CAST(create_serial AS BIGINT) AS create_serial,
      |  CAST(last_serial AS BIGINT) AS last_serial
      |FROM s ORDER BY property_id""".stripMargin) { (s, dir) =>
    PropertyRegistry.derive(lifecycleTxs(s, dir))
      .select(col("propertyId").as("property_id"), col("issuer"),
        col("propertyName").as("name"), col("propertyType").as("prop_type"),
        col("category"), col("subcategory"),
        col("crowdsale").as("is_crowdsale"),
        col("crowdsaleActive").as("crowdsale_active"),
        col("participantCount").as("participants"),
        col("tokensPurchased").as("tokens_purchased"),
        col("issuerTokens").as("issuer_tokens"),
        col("granted"), col("delegate"),
        col("createTxDbSerialNum").as("create_serial"),
        col("lastTxDbSerialNum").as("last_serial"))
      .orderBy("property_id")
  }

  /** The shared order-chain lifecycle synthesis (see [[registry]]). */
  private def lifecycleTxs(s: org.apache.spark.sql.SparkSession,
      dir: String) = {
    import s.implicits._
    val w = Window.partitionBy("pid").orderBy("k")
    val wc = Window.partitionBy("pid")
    t(s, dir, "orders")
      .select($"o_orderkey".as("k"), $"o_custkey".as("c"),
        (lit(1L) + $"o_orderkey" % 40).as("pid"),
        (round($"o_totalprice" * 100).cast(LongType) % 100000).as("cents"),
        $"o_orderpriority".as("pri"), $"o_orderstatus".as("st"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wc))
      .as[(Long, Long, Long, Long, String, String, Int, Long)]
      .map { case (k, c, pid, cents, pri, st, rn, cnt) =>
        val div = pid % 3 == 0
        val base = RawTx(txid = f"$k%016x", protocol = "Omni",
          sendingaddress = s"I$c", referenceaddress = None, type_int = 0,
          version = 0, valid = true, block = k, blocktime = 0,
          positioninblock = 0, propertyid = pid, divisible = div,
          amount = BigDecimal(0))
        val tx =
          if (rn == 1)
            base.copy(type_int = if (pid % 2 == 1) 51 else 54,
              propertyname = s"P$pid", ecosystem = "Production",
              propertycategory = pri, propertysubcategory = st,
              propertyurl = s"u$pid", propertydata = s"d$pid")
          else if (rn == cnt && pid % 4 == 1)
            base.copy(type_int = 53,
              addedissuertokens = BigDecimal(cents % 1000))
          else if (rn == cnt && pid % 4 == 2)
            base.copy(type_int = 70, referenceaddress = Some(s"J$c"))
          else if (rn == cnt && pid % 4 == 0)
            base.copy(type_int = 73, referenceaddress = Some(s"D$c"))
          else if (pid % 2 == 1)
            base.copy(type_int = -51, sendingaddress = s"C$c",
              referenceaddress = Some("IX"), propertyid = 1L,
              divisible = true, purchasedpropertyid = pid,
              purchaseddivisible = div,
              purchasedtokens = BigDecimal(cents / rn),
              issuertokens = BigDecimal(cents / rn / 10))
          else if (rn % 5 == 0)
            base.copy(type_int = 56, amount = BigDecimal(cents / rn / 3))
          else
            base.copy(type_int = 55, amount = BigDecimal(cents / rn),
              referenceaddress = Some(s"R$c"))
        (tx, k)
      }
  }

  /** PropertyHistory (sql.py:1546,1591-1599): one row per lifecycle tx
    * per property, serial-ordered — the audit trail the reference keeps
    * alongside the registry upserts. The oracle replays the synthesis
    * rules as a CASE over the same windows.
    */
  val history = Q(
    "property_history",
    """WITH o AS (SELECT o_orderkey AS k,
      |    1 + o_orderkey % 40 AS pid
      |  FROM orders),
      |r AS (SELECT *, row_number() OVER (PARTITION BY pid ORDER BY k) AS rn,
      |    count(*) OVER (PARTITION BY pid) AS cnt FROM o)
      |SELECT CAST(pid AS BIGINT) AS property_id,
      |  CAST(k AS BIGINT) AS serial,
      |  CAST(CASE WHEN rn = 1 THEN (CASE WHEN pid % 2 = 1 THEN 51 ELSE 54 END)
      |       WHEN rn = cnt AND pid % 4 = 1 THEN 53
      |       WHEN rn = cnt AND pid % 4 = 2 THEN 70
      |       WHEN rn = cnt AND pid % 4 = 0 THEN 73
      |       WHEN pid % 2 = 1 THEN -51
      |       WHEN rn % 5 = 0 THEN 56
      |       ELSE 55 END AS INT) AS tx_type
      |FROM r ORDER BY property_id, serial""".stripMargin) { (s, dir) =>
    PropertyRegistry.history(lifecycleTxs(s, dir))
      .select(col("propertyId").as("property_id"),
        col("txDbSerialNum").as("serial"),
        col("txType").as("tx_type"))
      .orderBy("property_id", "serial")
  }

  /** M3 — time-based crowdsale expiry sweep (expireCrowdsales
    * sql.py:1420-1444): crowdsales past their deadline produce a
    * synthetic type-53 close unless an explicit close already exists
    * (anti-join suppression). Orders become crowdsale creates (deadline
    * = order date), 'F' orders have explicit closes; the oracle is the
    * same filter + anti-join relationally.
    */
  val crowdsaleExpiry = Q(
    "m3_crowdsale_expiry",
    """SELECT o_orderkey AS property_id,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS close_epoch,
      |  CAST(o_orderkey % 500 AS BIGINT) AS bonus
      |FROM orders
      |WHERE epoch(o_orderdate) <= 820454400 AND o_orderstatus <> 'F'
      |ORDER BY property_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.CrowdsaleExpiry
    val orders = t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey",
        unix_timestamp($"o_orderdate").as("deadline"), $"o_orderstatus")
    def create(k: Long, c: Long): RawTx =
      RawTx(txid = f"$k%016x", protocol = "Omni",
        sendingaddress = s"I$c", referenceaddress = None, type_int = 51,
        version = 0, valid = true, block = k, blocktime = 0,
        positioninblock = 0, propertyid = k, divisible = false,
        amount = BigDecimal(0),
        addedissuertokens = BigDecimal(k % 500))
    val creates = orders.as[(Long, Long, Long, String)]
      .map { case (k, c, dl, _) => (create(k, c), dl) }
    val explicit = orders.where($"o_orderstatus" === "F")
      .as[(Long, Long, Long, String)]
      .map { case (k, c, _, _) => create(k, c).copy(type_int = 53) }
    CrowdsaleExpiry.syntheticCloses(creates, explicit,
        nowEpoch = 820454400L)
      .select($"propertyid".as("property_id"),
        $"blocktime".as("close_epoch"),
        $"addedissuertokens".cast(LongType).as("bonus"))
      .orderBy("property_id")
  }

  val all: Seq[Q] = Seq(registry, history, crowdsaleExpiry)
}
