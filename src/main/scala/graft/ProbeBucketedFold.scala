package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MEASUREMENT main (r11 verdict ask #5): price the bucketed balances
  * fold in the ONLY regime its docstring claimed it could win — one
  * materialized clustering feeding N ≥ 2 clustering-aligned consumers
  * — against the default in-flight repartition+sort paying the
  * exchange N times.
  *
  * VERDICT (round 12, 15M events at 100×, interleaved fresh-JVM
  * min-fold): bucketed LOSES its own regime at N=2 — 7.14 s in-flight
  * vs 10.06 s bucketed (+41%) — and only reaches parity at N=4
  * (11.58 vs 11.42 s, within noise). The parquet round-trip costs
  * more than the exchange it amortizes until a consumer count no
  * engine site has. The env-gated engine variant was REMOVED on that
  * measurement; this probe stays as the reproducible instrument, with
  * the bucketed mechanism inlined below (the in-flight leg still
  * prices the REAL production fold,
  * [[graft.operators.Balances.foldInFlight]]).
  *
  *  - PROBE_MODE=inflight: N × (exchange + sort + GroupRuns fold)
  *  - PROBE_MODE=bucketed: 1 × (exchange + sort + parquet write) +
  *    N × (bucketed scan + fold)
  *
  * Prints one JSON line with the leg's seconds and a result checksum
  * (must match across legs — a divergent checksum voids the A/B).
  * Driven interleaved, fresh JVM per leg, by
  * `tools/ab_bucketed_regime.sh`.
  */
object ProbeBucketedFold {

  /** The removed variant's mechanism, preserved for the instrument:
    * write the event stream as a bucketed+sorted table (the clustering
    * shuffle happens here, once), then fold per-bucket scans with the
    * production GroupRuns fold — exchange-free per consumer.
    */
  private def clusterToBucketedTable(
      merged: org.apache.spark.sql.Dataset[graft.operators.BalEvent])
      : String = {
    val spark = merged.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    val tbl = "g_balev_probe_" +
      java.lang.Long.toHexString(System.nanoTime())
    merged
      .repartition(n, $"address", $"propertyId")
      .write
      .bucketBy(n, "address", "propertyId")
      .sortBy("address", "propertyId", "serial", "kind", "idx")
      .mode("overwrite")
      .saveAsTable(tbl)
    CacheScope.defer { () =>
      try spark.sql(s"DROP TABLE IF EXISTS $tbl")
      catch { case _: Exception => () }
    }
    tbl
  }

  private def foldBucketedTable(spark: SparkSession, tbl: String)
      : org.apache.spark.sql.Dataset[graft.model.AddressBalance] = {
    import spark.implicits._
    import graft.operators.{BalEvent, Balances, GroupRuns}
    spark.table(tbl).as[BalEvent]
      .sortWithinPartitions($"address", $"propertyId", $"serial",
        $"kind", $"idx")
      .mapPartitions { it =>
        new GroupRuns(it.map(e => ((e.address, e.propertyId), e)))
          .map { case ((addr, pid), run) =>
            Balances.foldRun(addr, pid, run)
          }
      }
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale100")
    val mode = sys.env.getOrElse("PROBE_MODE", "inflight")
    require(Set("inflight", "bucketed")(mode),
      s"PROBE_MODE must be inflight|bucketed, got '$mode'")
    val consumers = sys.env.getOrElse("PROBE_CONSUMERS", "2").toInt
    val spark = GraftConf(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.{Balances, BalEvent}

    // ~37 events per (address, propertyId) key at 100x: ledger deltas
    // from orders plus one freeze marker per key mid-history, so the
    // fold's order-dependence is exercised, not just the clustering
    val o = Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey".cast("long").as("ok"),
        $"o_custkey".cast("long").as("ck"),
        round($"o_totalprice" * 100).cast("long").as("amt"))
    val deltas = o.select(
      concat(lit("A"), $"ck" % 100000L).as("address"),
      ($"ok" % 4L).as("propertyId"), $"ok".as("serial"),
      lit(0).as("kind"), lit(0).as("idx"), $"amt".as("availableDelta"),
      lit(0L).as("reservedDelta"), lit(0L).as("acceptedDelta"),
      lit(0L).as("frozenDelta"), lit(false).as("freeze")).as[BalEvent]
    val freezes = o.groupBy(
        concat(lit("A"), $"ck" % 100000L).as("address"),
        ($"ok" % 4L).as("propertyId"))
      .agg(floor(avg($"ok")).cast("long").as("serial"))
      .select($"address", $"propertyId", $"serial", lit(1).as("kind"),
        lit(0).as("idx"), lit(0L).as("availableDelta"),
        lit(0L).as("reservedDelta"), lit(0L).as("acceptedDelta"),
        lit(0L).as("frozenDelta"), lit(true).as("freeze")).as[BalEvent]
    val merged = deltas.union(freezes).persist()
    val nEvents = merged.count() // materialize OUTSIDE the timed region

    def consume(folded: org.apache.spark.sql.Dataset[_]): (Long, Long) = {
      val r = folded.agg(
        sum(col("available")).as("a"), sum(col("frozen")).as("f"),
        count(lit(1))).head()
      (r.getLong(0) ^ r.getLong(2), r.getLong(1))
    }

    val t0 = System.nanoTime()
    val sums = mode match {
      case "bucketed" =>
        val tbl = clusterToBucketedTable(merged)
        (1 to consumers).map(_ => consume(foldBucketedTable(spark, tbl)))
      case _ =>
        (1 to consumers).map(_ => consume(Balances.foldInFlight(merged)))
    }
    val sec = (System.nanoTime() - t0) / 1e9
    require(sums.distinct.size == 1,
      s"consumers disagreed within one leg: $sums")
    println(f"""{"metric":"bucketed_regime","mode":"$mode","consumers":$consumers,"sec":$sec%.3f,"events":$nEvents,"checksum":"${sums.head}"}""")
    CacheScope.release()
    spark.stop()
  }
}
