package graft

import org.apache.spark.sql.functions._

/** The gap audit must recover EXACTLY the planted holes — engine
  * agreement alone (the oracle gate) can't catch a bug that is
  * symmetric in the Spark plan and the oracle SQL.
  */
class GapAuditSpec extends SparkTestBase {

  test("audit output equals the planted hole set") {
    val dir = "/root/testdata/sf0.001"
    val keys = Tables.t(spark, dir, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val surviving = keys.filter(k => k % 97 != 0 || k == 0)
    // expected: for each dropped key, the run of consecutive dropped
    // keys starting at it reports once, anchored at the last surviving
    // predecessor — with 97-spacing all holes are isolated singletons
    val expected = keys.filter(k => k % 97 == 0 && k != 0)
      .filter(k => surviving.contains(k - 1) && surviving.contains(k + 1))
      .map(k => (k - 1, 1L))
    val got = graft.queries.JoinQueries.o8.run(spark, dir)
      .collect().map(r => (r.getAs[Long]("gap_after"),
        r.getAs[Long]("n_missing"))).toSet
    assert(got == expected, s"planted ${expected.size}, got ${got.size}")
    assert(expected.nonEmpty, "corpus planted no holes — test is vacuous")
  }
}
