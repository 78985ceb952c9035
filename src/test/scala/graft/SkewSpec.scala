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
}
