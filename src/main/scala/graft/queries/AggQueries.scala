package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t

/** Aggregation + window operators — SURVEY.md §2.4 (A1–A14) and §2.6
  * (W1–W6). The reference maintains these as in-place row mutations
  * (reference/sql.py); here every one is a deterministic window/agg over
  * the immutable fact table — the mutate→derive rewrite of SURVEY §4.2.
  *
  * Signed "ledger delta" convention used throughout: purchases debit
  * (−value), everything else credits (+value) — mirroring the
  * double-entry credit/debit pairs of AddressesInTxs.
  */
object AggQueries {

  // Final projections stay BIGINT — never DECIMAL — so the driver's
  // cross-engine hash is render-stable; the shared signed-cents delta
  // lives on Q.
  import Q.deltaCents

  /** A1+A2 — running balance accumulator and after-balance snapshot
    * (sql.py:1320-1418 updateBalance; :1658-1662 finalizeAfterBalances).
    * One cumulative window gives both the before- and after-images; at
    * scale this shuffles once on user_id and sorts within partitions.
    */
  val a1 = Q(
    "a1_running_balance",
    """SELECT event_id, user_id,
      |  CAST(sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS balance_after_cents,
      |  CAST(coalesce(sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS balance_before_cents
      |FROM (SELECT event_id, user_id, ts,
      |        CASE WHEN event_type = 'purchase' THEN -CAST(round(value * 100) AS BIGINT)
      |             ELSE CAST(round(value * 100) AS BIGINT) END AS delta
      |      FROM events)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        deltaCents.as("delta"))
      .select(col("event_id"), col("user_id"),
        sum("delta").over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast(LongType).as("balance_after_cents"),
        coalesce(
          sum("delta").over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).cast(LongType).as("balance_before_cents"))
      .orderBy("event_id")
  }

  /** A3/A10/W4/O2 — latest-per-key (lastTxDbSerialNum, latest rate:
    * sql.py:282,295; updatePrices.py:67-68): row_number over desc order.
    */
  val a10 = Q(
    "a10_latest_per_key",
    """SELECT event_type, event_id AS last_event_id,
      |  CAST(round(value * 100) AS BIGINT) AS last_value_cents
      |FROM (SELECT event_type, event_id, value,
      |        row_number() OVER (PARTITION BY event_type
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("event_type"), col("event_id").as("last_event_id"),
        round(col("value") * 100).cast(LongType).as("last_value_cents"))
      .orderBy("event_type")
  }

  /** A4 — address stats (sql.py:1644-1656): per-key tx count, last
    * serial, last activity, distinct types.
    */
  val a4 = Q(
    "a4_key_stats",
    """SELECT user_id, count(*) AS tx_count,
      |  CAST(max(event_id) AS BIGINT) AS last_event_id,
      |  max(ts) AS last_ts,
      |  count(DISTINCT event_type) AS n_types
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("tx_count"),
        max("event_id").cast(LongType).as("last_event_id"),
        max("ts").as("last_ts"),
        countDistinct("event_type").as("n_types"))
      .orderBy("user_id")
  }

  /** A5 — per-block tx stats with conditional aggregation
    * (sql.py:238-312): SQL FILTER clauses become sum(when(...)) — still
    * one scan, map-side partial agg.
    */
  val a5 = Q(
    "a5_conditional_agg",
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F'
      |    THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT) AS valid_cents,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS valid_n,
      |  count(CASE WHEN o_orderstatus <> 'F' THEN 1 END) AS invalid_n
      |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin) {
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F",
            round(col("o_totalprice") * 100).cast(LongType)))
            .cast(LongType).as("valid_cents"),
          count(when(col("o_orderstatus") === "F", 1)).as("valid_n"),
          count(when(col("o_orderstatus") =!= "F", 1)).as("invalid_n"))
        .orderBy("o_orderpriority")
  }

  /** A6/O4 — market ticker refresh (sql.py:893-974 updatemarkets):
    * supply = sum over active offers, best price = min over untouched
    * offers — conditional min, one shuffle on the pair key.
    */
  val a6 = Q(
    "a6_market_ticker",
    """SELECT l_partkey,
      |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS supply_units,
      |  CAST(min(CASE WHEN l_discount = 0
      |    THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS best_price_cents,
      |  count(*) AS n_offers
      |FROM lineitem GROUP BY 1 ORDER BY l_partkey""".stripMargin) {
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(round(col("l_quantity") * 100).cast(LongType))
          .cast(LongType).as("supply_units"),
          min(when(col("l_discount") === 0,
            round(col("l_extendedprice") * 100).cast(LongType)))
            .cast(LongType).as("best_price_cents"),
          count(lit(1)).as("n_offers"))
        .orderBy("l_partkey")
  }

  /** A7/W3 — trailing 24-h sliding aggregate (sql.py:266,276): RANGE
    * frame over event-time micros; frame-by-value makes same-timestamp
    * ties deterministic.
    */
  val a7 = Q(
    "a7_trailing_24h",
    """SELECT event_id, n_24h, CAST(sum_24h AS BIGINT) AS sum_24h_cents
      |FROM (SELECT event_id,
      |        count(*) OVER w AS n_24h,
      |        sum(v) OVER w AS sum_24h
      |      FROM (SELECT event_id, user_id, epoch_us(ts) AS us,
      |              CAST(round(value * 100) AS BIGINT) AS v FROM events)
      |      WINDOW w AS (PARTITION BY user_id ORDER BY us
      |        RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-86400000000L, 0)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast(LongType).as("v"))
      .select(col("event_id"),
        count(lit(1)).over(w).as("n_24h"),
        sum("v").over(w).cast(LongType).as("sum_24h_cents"))
      .orderBy("event_id")
  }

  /** A8 — VWAP (updatePrices.py:215-222): Σ(amount×rate)/Σ(amount) in
    * exact integer base units (reference stores amounts ×1e8; we scale
    * qty ×1e4 and price ×1e2) — order-independent, so safe to combine
    * map-side.
    */
  val a8 = Q(
    "a8_vwap",
    """SELECT l_partkey, CAST(num AS BIGINT) AS vwap_num,
      |  CAST(den AS BIGINT) AS vwap_den,
      |  CAST(num // den AS BIGINT) AS vwap_floor
      |FROM (SELECT l_partkey,
      |        sum(CAST(round(l_quantity * 10000) AS BIGINT)
      |          * CAST(round(l_extendedprice * 100) AS BIGINT)) AS num,
      |        sum(CAST(round(l_quantity * 10000) AS BIGINT)) AS den
      |      FROM lineitem GROUP BY 1)
      |ORDER BY l_partkey""".stripMargin) { (s, dir) =>
    val qtyU = round(col("l_quantity") * 10000).cast(LongType)
    val priceU = round(col("l_extendedprice") * 100).cast(LongType)
    t(s, dir, "lineitem")
      .groupBy("l_partkey")
      .agg(sum(qtyU * priceU).cast(LongType).as("num"),
        sum(qtyU).cast(LongType).as("den"))
      .select(col("l_partkey"), col("num").as("vwap_num"),
        col("den").as("vwap_den"),
        expr("num div den").cast(LongType).as("vwap_floor"))
      .orderBy("l_partkey")
  }

  /** A9 — mean fee across sources (updateFees.py:85-88): int(sum/len) —
    * truncating integer mean, reproduced with integer division (never a
    * fractional→int CAST, which rounds in DuckDB but truncates in Spark).
    */
  val a9 = Q(
    "a9_int_mean",
    """SELECT event_type,
      |  CAST(sum(cents) // count(*) AS BIGINT) AS mean_cents,
      |  count(*) AS n
      |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      |      FROM events)
      |GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(col("event_type"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .groupBy("event_type")
      .agg(sum("cents").cast(LongType).as("csum"), count(lit(1)).as("n"))
      .select(col("event_type"),
        expr("csum div n").cast(LongType).as("mean_cents"), col("n"))
      .orderBy("event_type")
  }

  /** A11/W5 — STO proportional distribution (sql.py:470-534
    * sendToOwners): the reference's order-dependent loop — each holder
    * gets ceil(share), later holders absorb the shortfall — re-expressed
    * as its exact closed form: a prefix-sum window + least/greatest
    * clamp. Holders sorted (amount DESC, key ASC) per sortSTO
    * (sql.py:463-468). Integer ceil-division (a*b+t-1) div t keeps it
    * exact in both engines. The global total is computed as an aggregate
    * and broadcast — no single-partition global window on the data path.
    */
  val a11 = Q(
    "a11_sto_distribution",
    """WITH h AS (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS bal
      |           FROM customer WHERE c_acctbal > 0),
      |tot AS (SELECT CAST(sum(bal) AS BIGINT) AS total FROM h),
      |s AS (SELECT c_custkey, bal,
      |        (bal * 1000000 + total - 1) // total AS share
      |      FROM h CROSS JOIN tot),
      |p AS (SELECT c_custkey, bal, share,
      |        coalesce(sum(share) OVER (ORDER BY bal DESC, c_custkey ASC
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      |      FROM s)
      |SELECT c_custkey, CAST(share AS BIGINT) AS share,
      |  CAST(least(share, greatest(1000000 - prior, 0)) AS BIGINT) AS paid
      |FROM p WHERE least(share, greatest(1000000 - prior, 0)) > 0
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val h = t(s, dir, "customer")
      .where(col("c_acctbal") > 0)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast(LongType).as("bal"))
    val tot = h.agg(sum("bal").cast(LongType).as("total"))
    val shares = h.crossJoin(broadcast(tot))
      .withColumn("share", expr("(bal * 1000000 + total - 1) div total"))
    // Ordered prefix sum over the holder set of ONE property — small by
    // construction (the reference iterates it in memory); a global window
    // is acceptable here, unlike W1's global serial.
    val w = Window.orderBy(col("bal").desc, col("c_custkey").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    shares
      .withColumn("prior", coalesce(sum("share").over(w), lit(0L)))
      .withColumn("paid",
        least(col("share"), greatest(lit(1000000L) - col("prior"), lit(0L))))
      .where(col("paid") > 0)
      .select(col("c_custkey"), col("share").cast(LongType).as("share"),
        col("paid").cast(LongType).as("paid"))
      .orderBy("c_custkey")
  }

  /** A12/J11 — consensus reconciliation diff (sql.py:1205-1316
    * checkbalances_MP): full outer join of independently derived state
    * vs the authoritative snapshot, mismatches classified.
    */
  val a12 = Q(
    "a12_consensus_diff",
    """SELECT coalesce(db.custkey, node.custkey) AS custkey,
      |  CASE WHEN db.custkey IS NULL THEN 'MissingDB'
      |       WHEN node.custkey IS NULL THEN 'MissingNode'
      |       ELSE 'OK' END AS status,
      |  CAST(coalesce(db.n_orders, 0) AS BIGINT) AS n_orders,
      |  CAST(coalesce(db.spend, 0) AS BIGINT) AS spend_cents,
      |  CAST(coalesce(node.bal, 0) AS BIGINT) AS bal_cents
      |FROM (SELECT o_custkey AS custkey, count(*) AS n_orders,
      |        sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend
      |      FROM orders GROUP BY 1) db
      |FULL OUTER JOIN
      |     (SELECT c_custkey AS custkey,
      |        CAST(round(c_acctbal * 100) AS BIGINT) AS bal
      |      FROM customer) node
      |ON db.custkey = node.custkey
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val db = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast(LongType)).as("spend"))
    val node = t(s, dir, "customer")
      .select(col("c_custkey").as("custkey"),
        round(col("c_acctbal") * 100).cast(LongType).as("bal"))
    db.join(node, db("custkey") === node("custkey"), "full_outer")
      .select(
        coalesce(db("custkey"), node("custkey")).as("custkey"),
        when(db("custkey").isNull, "MissingDB")
          .when(node("custkey").isNull, "MissingNode")
          .otherwise("OK").as("status"),
        coalesce(col("n_orders"), lit(0L)).cast(LongType).as("n_orders"),
        coalesce(col("spend"), lit(0L)).cast(LongType).as("spend_cents"),
        coalesce(col("bal"), lit(0L)).cast(LongType).as("bal_cents"))
      .orderBy("custkey")
  }

  /** A14 — first/last ordered aggregates
    * (omni_db_create_functions.psql:4-27): built-in first_value /
    * last_value window functions, no custom UDAF.
    */
  val a14 = Q(
    "a14_first_last",
    """SELECT DISTINCT user_id,
      |  first_value(v) OVER w AS f_val_cents,
      |  last_value(v) OVER w AS l_val_cents
      |FROM (SELECT user_id, ts, event_id,
      |        CAST(round(value * 100) AS BIGINT) AS v
      |      FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100).cast(LongType).as("v"))
      .select(col("user_id"),
        first("v").over(w).as("f_val_cents"),
        last("v").over(w).as("l_val_cents"))
      .distinct()
      .orderBy("user_id")
  }

  /** W6 — offer-lifecycle ordering (sql.py:704-794): lag/lead over
    * per-key serial-ordered sequences (which prior offer does an
    * update/cancel refer to).
    */
  val w6 = Q(
    "w6_lifecycle_lag",
    """SELECT event_id, user_id,
      |  lag(event_id) OVER w AS prev_event_id,
      |  lag(event_type) OVER w AS prev_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        lag("event_id", 1).over(w).as("prev_event_id"),
        lag("event_type", 1).over(w).as("prev_type"))
      .orderBy("event_id")
  }

  /** W8 — sessionization: gap-based session assignment (30-min
    * inactivity gap) via lag + running sum of session starts, then
    * per-session stats. ONE shuffle on user_id serves the lag window,
    * the running sum, AND the final groupBy (hashpartitioning(user_id)
    * satisfies the (user_id, session_idx) clustering), so the whole
    * chain is a single exchange — the shape that holds at 100 TB of
    * events.
    */
  val w8 = Q(
    "w8_sessionize",
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
      |gaps AS (SELECT user_id, us, event_id,
      |    CASE WHEN us - lag(us) OVER w > 1800000000
      |           OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |sess AS (SELECT user_id, us,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      |  FROM gaps)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |  CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us,
      |  CAST((max(us) - min(us)) // 1000000 AS BIGINT) AS duration_secs
      |FROM sess GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val run = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag("us", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum("new_sess").over(run).cast(LongType))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("us").cast(LongType).as("start_us"),
        max("us").cast(LongType).as("end_us"),
        expr("(max(us) - min(us)) div 1000000").cast(LongType)
          .as("duration_secs"))
      .orderBy("user_id", "session_idx")
  }

  /** A15 — cohort retention (beyond the reference; standard
    * user-analytics shape): users cohorted by first-seen day, activity
    * counted per (cohort_day, day_offset). The first-seen agg and the
    * activity join share the user_id exchange, and the distinct reuses
    * it too (hashpartitioning(user_id) satisfies clustering on any
    * superset), so only the final (cohort, offset) rollup adds a
    * shuffle.
    */
  val a15 = Q(
    "a15_cohort_retention",
    """WITH e AS (SELECT user_id,
      |    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
      |  FROM events),
      |first AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id),
      |x AS (SELECT DISTINCT e.user_id, f.cohort_day,
      |        e.day - f.cohort_day AS day_offset
      |      FROM e JOIN first f ON e.user_id = f.user_id)
      |SELECT cohort_day, day_offset, count(*) AS n_users
      |FROM x GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "events")
      .select(col("user_id"),
        expr("floor(unix_micros(ts) / 86400000000)").cast(LongType).as("day"))
    val first = e.groupBy("user_id").agg(min("day").as("cohort_day"))
    e.join(first, Seq("user_id"))
      .select(col("user_id"), col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** A16 — funnel conversion (beyond the reference; standard
    * user-analytics shape): users who signed up, and of those, who
    * purchased at-or-after their first signup, plus the total
    * signup→purchase delay. Per-user mins via one conditional agg after
    * a user_id join against first-signup times — the join and both
    * aggregations share the user_id exchange; output is one row.
    */
  val a16 = Q(
    "a16_funnel",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |su AS (SELECT user_id, min(us) AS signup_us FROM e
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |per AS (SELECT e.user_id, su.signup_us,
      |    min(CASE WHEN e.event_type = 'purchase' AND e.us >= su.signup_us
      |             THEN e.us END) AS purchase_us
      |  FROM e JOIN su ON e.user_id = su.user_id
      |  GROUP BY e.user_id, su.signup_us)
      |SELECT count(*) AS n_signup,
      |  count(purchase_us) AS n_converted,
      |  CAST(coalesce(sum(purchase_us - signup_us), 0) AS BIGINT) AS total_delay_us
      |FROM per""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val su = e.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min("us").as("signup_us"))
    e.join(su, Seq("user_id"))
      .groupBy("user_id", "signup_us")
      .agg(min(when(col("event_type") === "purchase" &&
        col("us") >= col("signup_us"), col("us"))).as("purchase_us"))
      .agg(count(lit(1)).as("n_signup"),
        count(col("purchase_us")).as("n_converted"),
        coalesce(sum(col("purchase_us") - col("signup_us")), lit(0L))
          .cast(LongType).as("total_delay_us"))
  }

  /** Skew-safe aggregation: event_type has a handful of values, so a
    * plain groupBy funnels everything into ≤5 reducers; the salted
    * two-stage form ([[graft.operators.SkewedAgg]]) splits each key 16
    * ways first. Identical result, verified against the plain oracle.
    */
  val skew = Q(
    "skew_salted_agg",
    """SELECT event_type AS key,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total,
      |  count(*) AS n
      |FROM events GROUP BY 1 ORDER BY key""".stripMargin) { (s, dir) =>
    graft.operators.SkewedAgg
      .saltedSum(t(s, dir, "events"),
        col("event_type"), col("event_id"),
        round(col("value") * 100).cast(LongType), buckets = 16)
      .select(col("key"), col("total").cast(LongType).as("total"), col("n"))
      .orderBy("key")
  }

  /** Salted skew JOIN — the join-side twin of [[skew]]: a third of the
    * events pile onto one hot entity key; the salted join spreads that
    * key over 16 sub-partitions while the entity side replicates 16×.
    * Values are row-identical to the plain join the oracle runs.
    */
  val skewJoin = Q(
    "skew_salted_join",
    """SELECT c_nationkey, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM (SELECT CASE WHEN event_id % 3 = 0 THEN 7 ELSE user_id END AS k,
      |        value FROM events) e
      |JOIN customer ON c_custkey = e.k
      |GROUP BY 1 ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
      .select(when(col("event_id") % 3 === 0, 7L).otherwise(col("user_id"))
          .as("k"),
        col("event_id"),
        round(col("value") * 100).cast(LongType).as("cents"))
    graft.operators.SkewedAgg
      .saltedJoin(ev, col("k"), col("event_id"),
        t(s, dir, "customer").select("c_custkey", "c_nationkey"),
        col("c_custkey"), buckets = 16)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), sum("cents").cast(LongType).as("cents"))
      .orderBy("c_nationkey")
  }

  /** A17 — hierarchical rollup (GROUPING SETS): one shuffle produces
    * every aggregation level; Spark expands the grouping sets BEFORE
    * the exchange, so partial aggregation still combines map-side. The
    * grouping_id bit-encoding (2·grouping(rf)+grouping(ls)) matches
    * DuckDB's GROUPING() exactly.
    */
  val a17 = Q(
    "a17_rollup",
    """SELECT coalesce(l_returnflag, '(all)') AS rf,
      |  coalesce(l_linestatus, '(all)') AS ls,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS lvl,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY lvl, rf, ls""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .withColumn("cents", round(col("l_extendedprice") * 100).cast(LongType))
      .rollup("l_returnflag", "l_linestatus")
      .agg(grouping_id().cast(LongType).as("lvl"),
        count(lit(1)).as("n"), sum("cents").as("cents"))
      .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
        coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
        col("lvl"), col("n"), col("cents"))
      .orderBy("lvl", "rf", "ls")
  }

  /** A18 — pivot (wide per-category columns from tall facts): Spark's
    * pivot with an EXPLICIT value list stays a single groupBy (one
    * shuffle, map-side partials); without the list it needs an extra
    * distinct pass to discover columns — never do that at scale.
    */
  val a18 = Q(
    "a18_pivot",
    """SELECT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
      |  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
      |    FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS click_cents,
      |  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
      |    FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT) AS purchase_cents,
      |  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
      |    FILTER (WHERE event_type = 'signup'), 0) AS BIGINT) AS signup_cents,
      |  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
      |    FILTER (WHERE event_type = 'view'), 0) AS BIGINT) AS view_cents
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(expr("floor(unix_micros(ts) / 86400000000)").cast(LongType)
          .as("day"),
        col("event_type"),
        round(col("value") * 100).cast(LongType).as("cents"))
      .groupBy("day")
      .pivot("event_type", Seq("click", "purchase", "signup", "view"))
      .agg(sum("cents"))
      .select(col("day"),
        coalesce(col("click"), lit(0L)).as("click_cents"),
        coalesce(col("purchase"), lit(0L)).as("purchase_cents"),
        coalesce(col("signup"), lit(0L)).as("signup_cents"),
        coalesce(col("view"), lit(0L)).as("view_cents"))
      .orderBy("day")
  }

  /** A19 — exact percentiles (type-7 linear interpolation, the
    * definition Spark `percentile` and DuckDB `quantile_cont` share).
    * The probed fractions are DYADIC (k/2^m: .25/.5/.75/.875) on
    * purpose: the interpolation position p·(n−1) then has an exactly
    * representable fractional part, every intermediate (a + frac·(b−a)
    * on integer cents) is exact in a double, and the ×8 scaling floors
    * an exact eighth-integer — so the gate cannot flake on last-ulp
    * differences between the two engines' interpolation orderings
    * (0.90/0.95 would: 9/10 has no finite binary form). Exact
    * percentile sorts per group — fine per bounded group; at 100 TB
    * unbounded groups switch to approx_percentile (t-digest) and the
    * oracle becomes a tolerance check, which is why this gate pins the
    * EXACT variant.
    */
  val a19 = Q(
    "a19_percentiles",
    """SELECT l_returnflag,
      |  count(*) AS n,
      |  CAST(floor(8 * quantile_cont(cents, 0.25)) AS BIGINT) AS p25_8ths,
      |  CAST(floor(8 * quantile_cont(cents, 0.50)) AS BIGINT) AS p50_8ths,
      |  CAST(floor(8 * quantile_cont(cents, 0.75)) AS BIGINT) AS p75_8ths,
      |  CAST(floor(8 * quantile_cont(cents, 0.875)) AS BIGINT) AS p875_8ths
      |FROM (SELECT l_returnflag,
      |        CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |      FROM lineitem)
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
      .groupBy("l_returnflag")
      // ONE percentile buffer for all four quantiles (array form), not
      // four independent exact-percentile aggregates each holding its
      // own value→count map — measured 3.5→~1 s at sf0.1 once the r8
      // fullEval action stopped count() from pruning the buffers away
      .agg(count(lit(1)).as("n"),
        expr("percentile(cents, array(0.25D, 0.50D, 0.75D, 0.875D))")
          .as("ps"))
      .select(col("l_returnflag"), col("n"),
        floor(col("ps").getItem(0) * 8).cast(LongType).as("p25_8ths"),
        floor(col("ps").getItem(1) * 8).cast(LongType).as("p50_8ths"),
        floor(col("ps").getItem(2) * 8).cast(LongType).as("p75_8ths"),
        floor(col("ps").getItem(3) * 8).cast(LongType).as("p875_8ths"))
      .orderBy("l_returnflag")
  }

  /** W9 — distribution ranks (ntile / percent_rank / cume_dist) per
    * order-priority band: one shuffle on the partition key, ordered
    * within; the rank family shares a single sort. percent_rank and
    * cume_dist are (rank−1)/(n−1) and rank/n in identical IEEE doubles
    * both engines, floored after ×1e6.
    */
  val w9 = Q(
    "w9_ntile",
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  CAST(floor(1000000 * percent_rank() OVER w) AS BIGINT) AS pr_micros,
      |  CAST(floor(1000000 * cume_dist() OVER w) AS BIGINT) AS cd_micros
      |FROM (SELECT o_orderkey, o_orderpriority,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |      FROM orders)
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey)
      |ORDER BY o_orderpriority, quartile, pr_micros, o_orderkey""".stripMargin) {
    (s, dir) =>
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("cents"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast(LongType).as("cents"))
        .select(col("o_orderkey"), col("o_orderpriority"),
          ntile(4).over(w).cast(LongType).as("quartile"),
          floor(percent_rank().over(w) * 1000000).cast(LongType)
            .as("pr_micros"),
          floor(cume_dist().over(w) * 1000000).cast(LongType).as("cd_micros"))
        .orderBy(col("o_orderpriority"), col("quartile"), col("pr_micros"),
          col("o_orderkey"))
  }

  /** A20 — multiple DISTINCT aggregates in one pass: Spark expands each
    * row once per distinct clause (Expand) and still partial-aggregates
    * map-side before the single exchange — the alternative (one job per
    * distinct + join) scans the fact table N times. The non-distinct
    * count rides along free.
    */
  val a20 = Q(
    "a20_multi_distinct",
    """SELECT event_type,
      |  count(DISTINCT user_id) AS n_users,
      |  count(DISTINCT CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)) AS n_days,
      |  count(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        expr("floor(unix_micros(ts) / 86400000000)").cast(LongType).as("day"))
      .groupBy("event_type")
      .agg(countDistinct("user_id").as("n_users"),
        countDistinct("day").as("n_days"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** W10 — time-series resampling with forward-fill: each user's event
    * stream lands on an hourly grid carrying the last observation at or
    * before each grid instant (gap-fill for dashboards/feature frames).
    * Shape: grid points UNION the events, ONE window pass per user does
    * the as-of — `max(struct(us, cents))` over the cumulative frame is
    * the fill (max ignores nulls; struct order = event time, then
    * value for same-instant determinism) — then keep grid rows. No
    * join, one shuffle on user_id shared by window and grid generation.
    * Grid cardinality is derived as an explicit 0..cnt index range so
    * Spark's INCLUSIVE sequence() and DuckDB's EXCLUSIVE range() cannot
    * disagree at the endpoint. Grid instants before a user's first
    * event fill with NULL by construction.
    */
  val w10 = Q(
    "w10_resample_ffill",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE user_id < 5),
      |bounds AS (
      |  SELECT user_id, min(us) - (min(us) % 3600000000) AS start,
      |    max(us) AS hi
      |  FROM e GROUP BY 1),
      |grid AS (
      |  SELECT user_id,
      |    start + 3600000000 * unnest(range(0,
      |      (greatest(hi - 1 - start, 0) // 3600000000) + 1)) AS gus
      |  FROM bounds),
      |u AS (
      |  SELECT user_id, us, cents, 0 AS is_grid FROM e
      |  UNION ALL
      |  SELECT user_id, gus, NULL, 1 FROM grid),
      |f AS (
      |  SELECT user_id, us, is_grid,
      |    max(CASE WHEN cents IS NOT NULL
      |      THEN struct_pack(us := us, cents := cents) END)
      |      OVER (PARTITION BY user_id ORDER BY us, is_grid
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lastobs
      |  FROM u)
      |SELECT user_id, us AS grid_us, lastobs.cents AS ffill_cents
      |FROM f WHERE is_grid = 1
      |ORDER BY user_id, grid_us""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "events")
      .where(col("user_id") < 5)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast(LongType).as("cents"))
    val grid = e.groupBy("user_id")
      .agg((min("us") - (min("us") % 3600000000L)).as("start"),
        max("us").as("hi"))
      // greatest(...,0) keeps the operand non-negative by construction:
      // a user whose only distinct us sits exactly on an hour boundary
      // makes hi == start, where Spark's truncating `div` on -1 and
      // DuckDB's flooring `//` would disagree on the grid row count
      .select(col("user_id"), explode(expr(
        """transform(sequence(0L, greatest(hi - 1 - start, 0L) div 3600000000),
          |  k -> start + 3600000000 * k)""".stripMargin)).as("gus"))
    val u = e.withColumn("is_grid", lit(0))
      .unionByName(grid.select(col("user_id"), col("gus").as("us"),
        lit(null).cast(LongType).as("cents"), lit(1).as("is_grid")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("us"), col("is_grid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn("lastobs",
        max(when(col("cents").isNotNull,
          struct(col("us"), col("cents")))).over(w))
      .where(col("is_grid") === 1)
      .select(col("user_id"), col("us").as("grid_us"),
        col("lastobs.cents").as("ffill_cents"))
      .orderBy("user_id", "grid_us")
  }

  /** A21 — z-score outlier detection (the statistical data-quality
    * filter a curation pipeline runs on numeric fields): per-key mean
    * and variance come from EXACT integer sums (Σx, Σx², both ≪ 2^63),
    * so the one floating-point step — forming z and comparing to the
    * threshold — is the identical IEEE expression on identical integer
    * inputs in every engine. The variance is clamped at 0 before the
    * sqrt: a constant-valued group whose exact Σx² exceeds 2^53 can
    * round to a TINY NEGATIVE fp variance, where DuckDB's sqrt throws
    * while Spark yields NaN; clamped, both engines compute 0/0 = NaN,
    * and both order NaN ABOVE every number, so abs(NaN) > threshold is
    * TRUE — a zero-variance group flags ALL of its rows (the engines
    * agree, so the gate holds; callers wanting "no outliers" semantics
    * add a variance > 0 predicate). The stats table is
    * key-cardinality-sized → broadcast back; flagging is map-side.
    */
  val a21 = Q(
    "a21_zscore_outliers",
    """WITH e AS (SELECT event_id, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS c FROM events),
      |st AS (SELECT event_type, count(*) AS n,
      |    CAST(sum(c) AS BIGINT) AS s, CAST(sum(c*c) AS BIGINT) AS ss
      |  FROM e GROUP BY 1)
      |SELECT e.event_type, st.n, count(*) AS n_outliers
      |FROM e JOIN st USING (event_type)
      |WHERE abs(1000000.0 * (e.c - CAST(s AS DOUBLE)/n) /
      |  sqrt(greatest(CAST(ss AS DOUBLE)/n - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n), 0.0))) > 2000000
      |GROUP BY 1, 2 ORDER BY e.event_type""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "events")
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast(LongType).as("c"))
    val st = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").cast(LongType).as("s"),
        sum(col("c") * col("c")).cast(LongType).as("ss"))
    e.join(broadcast(st), "event_type")
      .where(expr(
        """abs(1000000.0 * (c - CAST(s AS DOUBLE)/n) /
          |  sqrt(greatest(CAST(ss AS DOUBLE)/n - (CAST(s AS DOUBLE)/n)*(CAST(s AS DOUBLE)/n), 0.0))) > 2000000""".stripMargin))
      .groupBy("event_type", "n")
      .agg(count(lit(1)).as("n_outliers"))
      .select(col("event_type"), col("n"), col("n_outliers"))
      .orderBy("event_type")
  }

  /** A22 — unpivot/melt + column profiling: wide numeric columns become
    * (column, value) rows in one scan (Spark's built-in unpivot — an
    * Expand, no shuffle until the profile agg), then per-column
    * min/max/sum/distinct — the data-profiling pass run before
    * schema-on-read ingestion at scale.
    */
  val a22 = Q(
    "a22_unpivot_profile",
    """WITH u AS (
      |  SELECT 'quantity' AS col,
      |    CAST(round(l_quantity * 100) AS BIGINT) AS v FROM lineitem
      |  UNION ALL SELECT 'extendedprice',
      |    CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
      |  UNION ALL SELECT 'discount',
      |    CAST(round(l_discount * 100) AS BIGINT) FROM lineitem)
      |SELECT col, count(*) AS n, CAST(min(v) AS BIGINT) AS vmin,
      |  CAST(max(v) AS BIGINT) AS vmax, CAST(sum(v) AS BIGINT) AS vsum,
      |  count(DISTINCT v) AS n_distinct
      |FROM u GROUP BY 1 ORDER BY col""".stripMargin) { (s, dir) =>
    // Audited round 9 (r8 fullEval delta triage): the shape is right,
    // the cost is real. With ONE distinct aggregate Spark already
    // plans the two-phase partial-distinct rewrite (no Expand
    // doubling — that only fires for multiple distincts), so an
    // explicit groupBy(col, v) → fold restaging was measured NEUTRAL
    // (1.15 s → 1.24 s median at sf0.1) and rejected. The remaining
    // cost is intrinsic: a 3x unpivot Expand of the scan plus a
    // distinct shuffle over mostly-unique extendedprice values.
    t(s, dir, "lineitem")
      .select(round(col("l_quantity") * 100).cast(LongType).as("quantity"),
        round(col("l_extendedprice") * 100).cast(LongType)
          .as("extendedprice"),
        round(col("l_discount") * 100).cast(LongType).as("discount"))
      .unpivot(Array.empty, Array(col("quantity"), col("extendedprice"),
        col("discount")), "col", "v")
      .groupBy("col")
      .agg(count(lit(1)).as("n"), min("v").cast(LongType).as("vmin"),
        max("v").cast(LongType).as("vmax"),
        sum("v").cast(LongType).as("vsum"),
        countDistinct("v").as("n_distinct"))
      .orderBy("col")
  }

  /** W11 — centered moving aggregate (ROWS BETWEEN n PRECEDING AND n
    * FOLLOWING): the smoothing frame dashboards use, and the one frame
    * shape the suite didn't yet pin (trailing ROWS: a1; trailing RANGE:
    * a7; cumulative: w10). Sum+count are emitted instead of the mean so
    * the gate stays in exact integers.
    */
  val w11 = Q(
    "w11_centered_window",
    """SELECT event_id,
      |  CAST(sum(v) OVER w AS BIGINT) AS w_sum_cents,
      |  count(*) OVER w AS w_n
      |FROM (SELECT event_id, user_id, ts,
      |        CAST(round(value * 100) AS BIGINT) AS v FROM events)
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(-2, 2)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast(LongType).as("v"))
      .select(col("event_id"),
        sum("v").over(w).cast(LongType).as("w_sum_cents"),
        count(lit(1)).over(w).as("w_n"))
      .orderBy("event_id")
  }

  val all: Seq[Q] =
    Seq(a1, a10, a4, a5, a6, a7, a8, a9, a11, a12, a14, a15, a16, a17, a18,
      a19, a20, a21, a22, w6, w8, w9, w10, w11, skew, skewJoin)
}
