package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables.t
import Q.dec

/** Projection / filter / scalar-computation operators — SURVEY.md §2.2
  * (P1–P11). Each reproduces the *shape* of a reference operator
  * (reference/omniutils.py, reference/sql.py) on the driver test tables,
  * expressed as pure Column expressions so the whole thing stays inside
  * whole-stage codegen — no UDFs.
  */
object ScalarQueries {

  /** P1 — tx-type dispatch (omniutils.py:64-106): closed text→int map as
    * a when/otherwise chain (codegen'd; no UDF, no lookup join).
    */
  val p1 = Q(
    "p1_type_dispatch",
    """SELECT event_type,
      |  CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
      |    WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
      |    WHEN 'error' THEN 5 ELSE -1 END AS type_code,
      |  count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY event_type""".stripMargin) {
    (s, dir) =>
      val code = when(col("event_type") === "click", 1)
        .when(col("event_type") === "view", 2)
        .when(col("event_type") === "purchase", 3)
        .when(col("event_type") === "signup", 4)
        .when(col("event_type") === "error", 5)
        .otherwise(-1)
      t(s, dir, "events")
        .groupBy(col("event_type"), code.as("type_code"))
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type")
  }

  /** P2 — ecosystem classification (omniutils.py:14-22): range predicates
    * over an id column → closed vocabulary.
    */
  val p2 = Q(
    "p2_range_classify",
    """SELECT CASE WHEN p_size < 10 THEN 'small'
      |  WHEN p_size >= 10 AND p_size < 30 THEN 'medium'
      |  ELSE 'large' END AS size_class,
      |  count(*) AS n, CAST(sum(p_size) AS BIGINT) AS total_size
      |FROM part GROUP BY 1 ORDER BY size_class""".stripMargin) {
    (s, dir) =>
      val cls = when(col("p_size") < 10, "small")
        .when(col("p_size") >= 10 && col("p_size") < 30, "medium")
        .otherwise("large")
      t(s, dir, "part")
        .groupBy(cls.as("size_class"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_size").cast(LongType)).cast(LongType).as("total_size"))
        .orderBy("size_class")
  }

  /** P3 — divisibility scaling (omniutils.py:4-12): divisible amounts
    * ×1e8 → integer base units. The 2-dp price scales losslessly via
    * round(×100)×1e6, so the whole computation is exact BIGINT — matching
    * the reference's numeric(19) semantics while staying render-stable
    * across engines (DECIMAL output hashes differ on scale formatting).
    */
  val p3 = Q(
    "p3_divisibility_scaling",
    """SELECT p_partkey,
      |  CAST(CASE WHEN p_size % 2 = 0
      |    THEN CAST(round(p_retailprice * 100) AS BIGINT) * 1000000
      |    ELSE CAST(floor(p_retailprice) AS BIGINT) END
      |    AS BIGINT) AS base_units
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    // Non-divisible amounts are whole tokens: explicit floor, never a
    // fractional→integer cast (Spark HALF_UPs, DuckDB half-evens).
    val units = when(col("p_size") % 2 === 0,
      round(col("p_retailprice") * 100).cast(LongType) * lit(1000000L))
      .otherwise(floor(col("p_retailprice")).cast(LongType))
      .cast(LongType)
    t(s, dir, "part")
      .select(col("p_partkey"), units.as("base_units"))
      .orderBy("p_partkey")
  }

  /** P4 — tx-class decode via array scan (omniutils.py:31-62): the
    * reference scans vout script types; here the same higher-order
    * `exists` over a split-token array (codegen'd, no explode+join).
    */
  val p4 = Q(
    "p4_array_exists",
    """SELECT has_token, count(*) AS n FROM (
      |  SELECT list_contains(string_split(text, ' '), 'spark') AS has_token
      |  FROM documents) GROUP BY 1 ORDER BY has_token""".stripMargin) {
    (s, dir) =>
      t(s, dir, "documents")
        .select(array_contains(split(col("text"), " "), "spark")
          .as("has_token"))
        .groupBy("has_token").agg(count(lit(1)).as("n"))
        .orderBy("has_token")
  }

  /** P5 — hex payload decode (sql.py:1626-1641): propertyid =
    * int(payload[8:16], 16). We synthesize the payload from doc_id so the
    * oracle knows ground truth; Spark must round-trip via conv().
    */
  val p5 = Q(
    "p5_hex_decode",
    // The hex round trip decodes the LOW 32 BITS (payload chars 9-16),
    // so the oracle must say doc_id % 2^32, not doc_id — the bare-id
    // form silently held only while every id fit in 32 bits, and the
    // 10x key-shifted sweep (ids ≥ 10^12) exposed it.
    "SELECT doc_id, doc_id % 4294967296 AS decoded FROM documents ORDER BY doc_id") {
    (s, dir) =>
      val payload = lpad(lower(hex(col("doc_id"))), 16, "0")
      val decoded = conv(substring(payload, 9, 8), 16, 10).cast(LongType)
      t(s, dir, "documents")
        .select(col("doc_id"), decoded.as("decoded"))
        .orderBy("doc_id")
  }

  /** P6 — tx-state classification (omniutils.py:24-29). */
  val p6 = Q(
    "p6_state_classify",
    """SELECT CASE WHEN o_orderstatus = 'F' THEN 'valid'
      |  WHEN o_orderstatus = 'O' THEN 'pending'
      |  ELSE 'not valid' END AS tx_state, count(*) AS n
      |FROM orders GROUP BY 1 ORDER BY tx_state""".stripMargin) { (s, dir) =>
    val st = when(col("o_orderstatus") === "F", "valid")
      .when(col("o_orderstatus") === "O", "pending")
      .otherwise("not valid")
    t(s, dir, "orders")
      .groupBy(st.as("tx_state")).agg(count(lit(1)).as("n"))
      .orderBy("tx_state")
  }

  /** P7 — epoch↔timestamp conversion (sql.py:2417, 2512, :89). */
  val p7 = Q(
    "p7_epoch_convert",
    """SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |  CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .select(col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .orderBy("event_id")
  }

  /** P8 — JSON path extraction + cast in predicates (sql.py:1427-1440;
    * expression indexes omni_db_schema.psql:241-251). Hot JSON paths stay
    * as string columns + get_json_object, exactly the reference's jsonb
    * `->>` pattern.
    */
  val p8 = Q(
    "p8_json_extract",
    """SELECT event_type,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      |  count(*) AS n
      |FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 10
      |GROUP BY 1 ORDER BY event_type""".stripMargin) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    t(s, dir, "events")
      .where(k > 10)
      .groupBy("event_type")
      .agg(sum(k).cast(LongType).as("k_sum"), count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** P9 — case-insensitive LIKE flagging (sql.py:1602-1624 getFlags). */
  val p9 = Q(
    "p9_ilike_flag",
    """SELECT p_brand, count(*) AS flagged
      |FROM part WHERE contains(lower(p_name), 'a')
      |GROUP BY 1 ORDER BY p_brand""".stripMargin) { (s, dir) =>
    t(s, dir, "part")
      .where(lower(col("p_name")).contains("a"))
      .groupBy("p_brand").agg(count(lit(1)).as("flagged"))
      .orderBy("p_brand")
  }

  /** P11 — rounding/clamping scalar math (sql.py:499, :937, :302-303,
    * :785): ceil-share, floor, truncating integer division. NOTE the
    * cross-engine rule: never CAST fractional→int (Spark truncates,
    * DuckDB rounds) — always floor/ceil explicitly first.
    */
  val p11 = Q(
    "p11_rounding_math",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(ceil(CAST(l_quantity AS DECIMAL(20,4)) * 7 / 3) AS BIGINT) AS ceil_share,
      |  CAST(floor(CAST(l_quantity AS DECIMAL(20,4)) / 3) AS BIGINT) AS floor_third,
      |  CAST(CAST(l_quantity AS BIGINT) // 7 AS BIGINT) AS int_div
      |FROM lineitem WHERE l_quantity = floor(l_quantity)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    val q = dec(col("l_quantity"))
    t(s, dir, "lineitem")
      .where(col("l_quantity") === floor(col("l_quantity")))
      .select(col("l_orderkey"), col("l_linenumber"),
        ceil(q * 7 / 3).cast(LongType).as("ceil_share"),
        floor(q / 3).cast(LongType).as("floor_third"),
        expr("CAST(l_quantity AS BIGINT) div 7").cast(LongType).as("int_div"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  val all: Seq[Q] = Seq(p1, p2, p3, p4, p5, p6, p7, p8, p9, p11)
}
