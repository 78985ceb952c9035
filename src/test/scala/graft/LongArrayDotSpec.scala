package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Native expression vs the composable HOF form — must agree on every
  * input (randomized, fixed seed), and survive codegen + nulls.
  */
class LongArrayDotSpec extends SparkTestBase {
  import spark.implicits._

  test("graft_ldot equals aggregate(zip_with(...)) on random arrays") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(50) {
      (Seq.fill(16)(rnd.nextLong() % 1000000L),
        Seq.fill(16)(rnd.nextLong() % 1000000L))
    }
    val got = cases.toDF("qa", "qb")
      .select(
        expr("graft_ldot(qa, qb)").as("native"),
        expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
          .as("hof"))
      .collect()
    got.zip(cases).foreach { case (row, (a, b)) =>
      assert(row.getLong(0) == row.getLong(1))
      assert(row.getLong(0) == a.zip(b).map { case (x, y) => x * y }.sum)
    }
  }

  test("null input propagates null; mismatched lengths dot the prefix") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Seq(1L, 2L, 3L)), Option.empty[Seq[Long]]),
      (Some(Seq(1L, 2L, 3L)), Some(Seq(10L, 20L))))
      .toDF("qa", "qb")
    val rows = df.select(expr("graft_ldot(qa, qb)")).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getLong(0) == 50L)
  }
}
