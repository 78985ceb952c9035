package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t
import graft.model._
import graft.operators.{Balances, FeatureActivations, LedgerDecoder, RatesEtl}

/** Gate rows for the pipeline-maintenance operators that were previously
  * spec-only (round-3 verdict item 1): feature activations (65534), the
  * type-200 metadata decode, the S6 price-feed parse, the M8 append-only
  * rate history, and the M6 reset-from-snapshot resume. Each runs the
  * REAL operator over facts mapped from the test tables; the oracle
  * re-derives the identical result relationally in DuckDB.
  */
object PipelineQueries {

  /** Feature activations (65534, reference sql.py:2392-2396 +
    * :1094-1132 checkPendingActivations): latest state per feature with
    * the pending flag evaluated against the chain tip. Events become
    * activation txs (featureid = user_id mod 10, serial = event_id);
    * the tip is the midpoint of the observed block range so BOTH
    * pending branches carry rows. Latest-per-key is a 10-group
    * reduction — nothing here shuffles more than the key tuples.
    */
  val featureActivations = Q(
    "feature_activations",
    """WITH a AS (SELECT user_id % 10 AS fid, event_id,
      |    CAST(epoch_us(ts) // 1000000 AS BIGINT) // 3600 AS block
      |  FROM events WHERE event_type <> 'error'),
      |tip AS (SELECT (min(block) + max(block)) // 2 AS tip FROM a),
      |r AS (SELECT fid, event_id, block,
      |    row_number() OVER (PARTITION BY fid ORDER BY event_id DESC) AS rn
      |  FROM a)
      |SELECT CAST(fid AS BIGINT) AS feature_id,
      |  CAST(block AS BIGINT) AS activation_block,
      |  block > tip AS pending,
      |  CAST(event_id AS BIGINT) AS last_serial
      |FROM r, tip WHERE rn = 1 ORDER BY feature_id""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val base = t(s, dir, "events")
      .where($"event_type" =!= "error")
      .select(($"user_id" % 10).as("fid"), $"event_id",
        expr("unix_timestamp(ts) div 3600").as("block"))
    // Tip is a 2-long scalar read (the reference polls the node's tip);
    // the pruned 3-column scan is cheaper than a cache lifecycle.
    val r = base.agg(min($"block"), max($"block")).head()
    val tip = (r.getLong(0) + r.getLong(1)) / 2
    val txs = base.as[(Long, Long, Long)].map { case (fid, eid, block) =>
      (RawTx(txid = f"$eid%016x", protocol = "Omni", sendingaddress = "X",
        referenceaddress = None, type_int = 65534, version = 0,
        valid = true, block = block, blocktime = 0, positioninblock = 0,
        propertyid = 0, divisible = false, amount = BigDecimal(0),
        featureid = fid), eid)
    }
    FeatureActivations.derive(txs, tip)
      .select($"featureId".as("feature_id"),
        $"activationBlock".as("activation_block"), $"pending",
        $"lastTxDbSerialNum".as("last_serial"))
      .orderBy("feature_id")
  }

  /** Embed-any-data (type 200, reference sql.py:2373-2390): metadata
    * rows for sender and (when present) reference address, ZERO balance
    * deltas — the delta column in the output pins that. Row-local
    * decode, embarrassingly parallel.
    */
  val embed200 = Q(
    "ledger_embed_200",
    """WITH e AS (SELECT event_id, user_id FROM events)
      |SELECT * FROM (
      |  SELECT 'U' || CAST(user_id AS VARCHAR) AS address,
      |    CAST(user_id % 10 + 3 AS BIGINT) AS property_id,
      |    CAST(event_id AS BIGINT) AS serial,
      |    CAST(0 AS BIGINT) AS idx, 'sender' AS role,
      |    CAST(0 AS BIGINT) AS delta
      |  FROM e
      |  UNION ALL
      |  SELECT 'R' || CAST(user_id % 7 AS VARCHAR),
      |    CAST(user_id % 10 + 3 AS BIGINT), CAST(event_id AS BIGINT),
      |    CAST(1 AS BIGINT), 'recipient', CAST(0 AS BIGINT)
      |  FROM e WHERE user_id % 3 = 0)
      |ORDER BY serial, idx""".stripMargin) { (s, dir) =>
    import s.implicits._
    val ledger = t(s, dir, "events")
      .select($"event_id", $"user_id")
      .as[(Long, Long)]
      .flatMap { case (eid, uid) =>
        LedgerDecoder.decode(RawTx(txid = f"$eid%016x", protocol = "Omni",
          sendingaddress = s"U$uid",
          referenceaddress = if (uid % 3 == 0) Some(s"R${uid % 7}") else None,
          type_int = 200, version = 0, valid = true, block = 0,
          blocktime = 0, positioninblock = 0, propertyid = uid % 10 + 3,
          divisible = false, amount = BigDecimal(0)), eid)
      }
    ledger.select($"address", $"propertyId".as("property_id"),
      $"txDbSerialNum".as("serial"),
      $"addressTxIndex".cast(LongType).as("idx"),
      $"addressRole".as("role"), $"availableDelta".as("delta"))
      .orderBy("serial", "idx")
  }

  /** S6 — price-feed parse (reference updatePrices.py:113-125): a
    * driver-fetched {SYMBOL: rate} payload becomes rate rows with the
    * reference's 2-dp TRUNCATION (not rounding) and the symbol→pid
    * dimension hash (updatePrices.py:17-22). The payload is built from
    * the nation table driver-side — exactly the shape of the real
    * operator, whose source IS a driver-side HTTP fetch (25 symbols, so
    * the collect is the operator's contract, not a data-path collect).
    * The oracle reproduces the dimension hash arithmetic digit-by-digit.
    */
  val ratesParse = Q(
    "rates_parse",
    """WITH n AS (SELECT n_nationkey AS k FROM nation),
      |h AS (SELECT k,
      |    CASE WHEN k < 10 THEN (78*31 + 48 + k) % 1000000
      |         ELSE ((78*31 + 48 + k // 10) * 31 + 48 + k % 10) % 1000000
      |    END + 2000000000 AS pid,
      |    CAST(floor((k * 7 + 0.789) * 100) AS BIGINT) AS rate_cents
      |  FROM n)
      |SELECT CAST(pid AS BIGINT) AS property_id1, rate_cents,
      |  CAST(1000 AS BIGINT) AS as_of, 'bitcoinaverage' AS source
      |FROM h ORDER BY property_id1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val keys = t(s, dir, "nation").select($"n_nationkey".cast(LongType))
      .as[Long].collect().sorted
    val payload = keys.map(k => s"N$k" -> (k * 7 + 0.789)).toMap
    RatesEtl.parseFiatRates(s, payload, asOf = 1000L)
      .select($"propertyId1".as("property_id1"),
        round($"rate1for2" * 100).cast(LongType).as("rate_cents"),
        $"asOf".as("as_of"), $"source")
      .orderBy("property_id1")
  }

  /** M8 — rate-history append + current view (reference
    * database/omni_db_triggers.psql:14-22: every rate upsert archives
    * the previous row; append-only history inverts that into "all rows
    * ever"). Two batches are appended, the per-pair history count pins
    * that NOTHING is overwritten, and [[RatesEtl.currentRates]] (W4)
    * must pick exactly the newest row per pair.
    */
  val ratesHistory = Q(
    "rates_history_append",
    """WITH r AS (SELECT user_id % 20 AS pid, event_id AS as_of,
      |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      |c AS (SELECT pid, count(*) AS n_history FROM r GROUP BY 1),
      |l AS (SELECT pid, as_of, cents,
      |    row_number() OVER (PARTITION BY pid ORDER BY as_of DESC) AS rn
      |  FROM r)
      |SELECT CAST(c.pid AS BIGINT) AS property_id2, c.n_history,
      |  CAST(l.as_of AS BIGINT) AS latest_as_of,
      |  l.cents AS latest_rate_cents
      |FROM c JOIN l ON c.pid = l.pid WHERE l.rn = 1
      |ORDER BY property_id2""".stripMargin) { (s, dir) =>
    import s.implicits._
    val rates = t(s, dir, "events")
      .select(($"user_id" % 20).as("pid"), $"event_id",
        $"value".cast(DoubleType).as("v"))
      .as[(Long, Long, Double)]
      .map { case (pid, eid, v) =>
        RatesEtl.Rate("Omni", pid, "Fiat", 1L, v, eid, "feed")
      }
    val history = RatesEtl.appendHistory(
      rates.filter(_.asOf % 2 == 0), rates.filter(_.asOf % 2 == 1))
    val counts = history.groupBy($"propertyId1".as("pid"))
      .agg(count(lit(1)).as("n_history"))
    val latest = RatesEtl.currentRates(history)
      .select($"propertyId1".as("pid"), $"asOf".as("latest_as_of"),
        round($"rate1for2" * 100).cast(LongType).as("latest_rate_cents"))
    counts.join(latest, Seq("pid"))
      .select($"pid".as("property_id2"), $"n_history", $"latest_as_of",
        $"latest_rate_cents")
      .orderBy("property_id2")
  }

  /** M6 — reset-from-snapshot resume ([[Balances.resumeFromSnapshot]],
    * reference sql.py:1134-1203): the authoritative snapshot is
    * DELIBERATELY different from what re-derivation would give
    * (3×Σ + 7), so the gate fails if the engine silently re-derives
    * instead of resuming — result must equal snapshot ⊕ post-cut deltas.
    */
  val resetFromSnapshot = Q(
    "reset_from_snapshot",
    """WITH e AS (SELECT user_id, event_id,
      |    CASE WHEN event_type = 'purchase'
      |      THEN -CAST(round(value * 100) AS BIGINT)
      |      ELSE CAST(round(value * 100) AS BIGINT) END AS d FROM events),
      |cut AS (SELECT (min(event_id) + max(event_id)) // 2 AS c FROM e),
      |snap AS (SELECT user_id, CAST(sum(d) * 3 + 7 AS BIGINT) AS avail,
      |    max(event_id) AS serial
      |  FROM e, cut WHERE event_id <= c GROUP BY 1),
      |flows AS (
      |  SELECT user_id, avail AS d, serial FROM snap
      |  UNION ALL
      |  SELECT user_id, d, event_id FROM e, cut WHERE event_id > c)
      |SELECT 'U' || CAST(user_id AS VARCHAR) AS address,
      |  CAST(sum(d) AS BIGINT) AS available,
      |  CAST(max(serial) AS BIGINT) AS last_serial
      |FROM flows GROUP BY user_id ORDER BY address""".stripMargin) {
    (s, dir) =>
    import s.implicits._
    val e = t(s, dir, "events")
      .select($"user_id", $"event_id", Q.deltaCents.as("d"))
    // Cut is a 2-long scalar read; the snapshot and post-cut legs each
    // re-scan the pruned columns — cheaper than a cache lifecycle.
    val r = e.agg(min($"event_id"), max($"event_id")).head()
    val cut = (r.getLong(0) + r.getLong(1)) / 2
    val snapshot = e.where($"event_id" <= cut)
      .groupBy($"user_id")
      .agg((sum($"d") * 3 + 7).cast(LongType).as("available"),
        max($"event_id").as("serial"))
      .select(concat(lit("U"), $"user_id").as("address"),
        lit(31L).as("propertyId"), $"available", lit(0L).as("reserved"),
        lit(0L).as("accepted"), lit(0L).as("frozen"),
        $"serial".as("lastTxDbSerialNum"), lit(false).as("frozenFlag"))
      .as[AddressBalance]
    val post = e.where($"event_id" > cut)
      .as[(Long, Long, Long)]
      .map { case (uid, eid, d) =>
        LedgerEntry(s"U$uid", 31L, "Omni", eid, 0, "recipient", d, 0, 0, 0)
      }
    Balances.resumeFromSnapshot(snapshot, post)
      .select($"address", $"available",
        $"lastTxDbSerialNum".as("last_serial"))
      .orderBy("address")
  }

  /** End-to-end ingest flagship — the reference's main loop
    * (omniEngine.py:109-232: RPC JSON → serials → decode → balances →
    * serving tables) as ONE declarative derivation: raw tx JSON strings
    * (S2) are schema-parsed with from_json, serial-stamped by the W1
    * range-partition stamper, decoded to double-entry ledger rows by
    * the REAL [[LedgerDecoder]], folded to balances, and joined into
    * the J9 wallet serving view with fiat valuation — source →
    * flatMap → window → join → project in a single plan Catalyst sees
    * whole. The oracle composes the same chain relationally; the
    * last_serial column pins the stamper (a wrong total order flips it
    * even when the sums agree).
    *
    * The JSON strings are built from the orders table as the ingestion
    * stand-in (in production this column arrives from the node's RPC;
    * only that line changes) — the PARSE is the operator under test,
    * exactly as Multimodal synthesizes its PNG/WAV blobs.
    */
  val e2eIngest = Q(
    "e2e_ingest",
    """WITH raw AS (SELECT o_orderkey AS ok,
      |    'C' || CAST(o_custkey AS VARCHAR) AS sender,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS units
      |  FROM orders),
      |ser AS (SELECT ok, sender, units,
      |    row_number() OVER (ORDER BY ok) AS serial FROM raw),
      |flows AS (
      |  SELECT sender AS address, -units AS delta, serial FROM ser
      |  UNION ALL
      |  SELECT 'M', units, serial FROM ser),
      |bal AS (SELECT address, CAST(sum(delta) AS BIGINT) AS available,
      |    CAST(max(serial) AS BIGINT) AS last_serial
      |  FROM flows GROUP BY 1),
      |wallets AS (SELECT 'C' || CAST(c_custkey AS VARCHAR) AS address,
      |    'W' || CAST(c_nationkey AS VARCHAR) AS walletId FROM customer)
      |SELECT w.walletId, b.address, CAST(31 AS BIGINT) AS propertyId,
      |  b.available, CAST(0 AS BIGINT) AS reserved, b.last_serial,
      |  CAST(b.available * 2.5 AS DOUBLE) AS availableValue
      |FROM bal b JOIN wallets w ON b.address = w.address
      |ORDER BY w.walletId, b.address""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.operators.OmniPipeline
    import graft.serving.WalletViews
    // ingestion stand-in: one raw JSON payload per tx
    val raw = t(s, dir, "orders")
      .select(to_json(struct(
        $"o_orderkey".as("txnum"),
        concat(lit("C"), $"o_custkey").as("sendingaddress"),
        round($"o_totalprice" * 100).cast(LongType).as("amount"),
        $"o_orderkey".as("block"))).as("payload"))
    // S2: schema'd parse — one codegen'd JacksonParser pass
    val parsed = raw
      .select(from_json($"payload", StructType(Seq(
        StructField("txnum", LongType),
        StructField("sendingaddress", StringType),
        StructField("amount", LongType),
        StructField("block", LongType)))).as("tx"))
      .select($"tx.txnum", $"tx.sendingaddress", $"tx.amount", $"tx.block")
      .as[(Long, String, Long, Long)]
    // W1: deterministic serials on the narrow parsed tuples
    val stamped = OmniPipeline.stamp(parsed, col("block"))
    // decode → balances via the real state machine
    val ledger = stamped.flatMap { case ((txnum, sender, amount, block), ser) =>
      LedgerDecoder.decode(RawTx(txid = f"$txnum%016x", protocol = "Omni",
        sendingaddress = sender, referenceaddress = Some("M"),
        type_int = 0, version = 0, valid = true, block = block,
        blocktime = 0, positioninblock = 0, propertyid = 31,
        divisible = false, amount = BigDecimal(amount)), ser)
    }
    val balances = Balances.derive(ledger).transform(Q.persistScoped)
    // EAGER: the serving view and the serial pin both consume balances;
    // unpersisted, the stamper + decode chain runs twice.
    balances.count()
    val wallets = t(s, dir, "customer")
      .select(concat(lit("C"), $"c_custkey").as("address"),
        concat(lit("W"), $"c_nationkey").as("walletId"))
    val rates = s.createDataset(Seq(
      RatesEtl.Rate("Omni", 31L, "Fiat", 1L, 2.5, 1000L, "fix")))
    WalletViews.walletBalances(balances, wallets, rates)
      .join(balances.select($"address",
        $"lastTxDbSerialNum".as("last_serial")), Seq("address"))
      .select($"walletId", $"address", $"propertyId", $"available",
        $"reserved", $"last_serial", $"availableValue")
      .orderBy("walletId", "address")
  }

  val all: Seq[Q] = Seq(featureActivations, embed200, ratesParse,
    ratesHistory, resetFromSnapshot, e2eIngest)
}
