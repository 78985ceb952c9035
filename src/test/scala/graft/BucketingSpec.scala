package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both fact tables on the join
  * key eliminates the per-query shuffle entirely — the plan must show a
  * SortMergeJoin with NO Exchange on either side. This is the
  * "co-locate joins via bucketing" half of the 100 TB design (the other
  * half, broadcast dims, is PlanSpec J2/J9).
  */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("join of two tables bucketed on the key plans without exchanges") {
    val dir = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    Tables.t(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    Tables.t(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    // at test scale Spark would broadcast; disable so the bucketed
    // SortMergeJoin path (the 100 TB fact-fact case) is what's planned
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located join, got:\n$plan")
      // the join itself must not shuffle either bucketed side; the only
      // allowed exchange is the post-join aggregation's
      val joinPart = plan.split("SortMergeJoin|ShuffledHashJoin").last
      assert(!joinPart.contains("Exchange"),
        s"bucketed join sides were shuffled:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
