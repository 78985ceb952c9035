package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Salted skew-join: value-equivalence to the plain join, and the hot
  * key genuinely spreads across salt sub-partitions.
  */
class SkewSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("salted join is row-identical to the plain join") {
    val ev = Tables.t(spark, dir, "events")
      .select(when(col("event_id") % 3 === 0, 7L).otherwise(col("user_id"))
          .as("k"),
        col("event_id"),
        round(col("value") * 100).cast(LongType).as("cents"))
    val cust = Tables.t(spark, dir, "customer")
      .select("c_custkey", "c_nationkey")
    val salted = graft.operators.SkewedAgg
      .saltedJoin(ev, col("k"), col("event_id"), cust, col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
    val plain = ev.join(cust, col("k") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
    val a = salted.collect().map(_.toSeq).toSet
    val b = plain.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("the hot key's rows land on many distinct salts") {
    val hot = Tables.t(spark, dir, "events")
      .where(col("event_id") % 3 === 0)
      .select(pmod(hash(col("event_id")), lit(16)).as("salt"))
      .distinct().count()
    assert(hot >= 12, s"hot key used only $hot of 16 salts")
  }

  /** AQE skew-join — the production default: a skewed sort-merge join
    * is split at RUNTIME into sub-joins per oversized partition, no
    * code change. Salting ([[graft.operators.SkewedAgg.saltedJoin]])
    * remains for the plans AQE cannot split: bucketed-table joins and
    * stateful downstreams that pin partitioning, and wherever a
    * deterministic plan is required (the gate). This test runs a
    * deliberately skewed join under AQE with test-scale thresholds and
    * asserts the final adaptive plan actually took the skew path.
    */
  test("AQE skew-join splits the hot partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on one key vs a uniform spread: one shuffle partition
      // dwarfs the rest
      val fact = spark.range(0, 60000L).select(
        when($"id" < 50000L, 7L).otherwise($"id" % 997).as("k"),
        $"id".as("v"))
      val dim = spark.range(0, 1000L)
        .select(($"id" % 997).as("dk"), ($"id" * 3).as("w"))
        .distinct()
      val joined = fact.join(dim, $"k" === $"dk")
      // materialize THIS dataframe so its own adaptive plan finalizes
      // (a count() would execute a different queryExecution)
      val n = joined.collect().length
      // hot key 7 matches one dim row: 50000 rows; the rest match 1:1
      assert(n > 50000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"adaptive plan did not mark a skew join:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
