package graft

import graft.operators.DedupClusters

class DedupClustersSpec extends SparkTestBase {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupClusters.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain, star, and disjoint components resolve to min-id labels") {
    // chain 1-2-3-4 (diameter 3), star 10-{11,12,13}, pair 20-21
    val got = cc(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L,
      11L -> 10L, 10L -> 12L, 13L -> 10L, 21L -> 20L))
    assert(got === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("duplicate and self edges are harmless; orientation is ignored") {
    val got = cc(Seq(5L -> 6L, 6L -> 5L, 5L -> 6L, 7L -> 7L))
    assert(got === Map(5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("empty edge set yields an empty labeling, not a crash") {
    assert(cc(Seq.empty) === Map.empty)
  }

  test("retention invariants: one keeper per cluster, keeper is the canonical, drops map to keepers") {
    import org.apache.spark.sql.functions._
    val ret = graft.queries.DedupQueries.retention
      .run(spark, "/root/testdata/sf0.001").collect()
    val byCanonical = ret.groupBy(_.getAs[Long]("canonical"))
    byCanonical.foreach { case (canon, members) =>
      val keepers = members.filter(_.getAs[Long]("keep") == 1L)
      assert(keepers.length == 1, s"cluster $canon has ${keepers.length} keepers")
      assert(keepers.head.getAs[Long]("doc_id") == canon,
        s"cluster $canon keeper is not the canonical")
      assert(canon == members.map(_.getAs[Long]("doc_id")).min,
        s"canonical $canon is not the min member id")
    }
    // the mapping covers the whole corpus exactly once
    assert(ret.map(_.getAs[Long]("doc_id")).distinct.length == ret.length)
  }

  test("long chain converges within the iteration bound") {
    val n = 40L
    val edges = (1L until n).map(i => (i + 1) -> i)
    val got = cc(edges)
    assert(got.size === n.toInt && got.values.forall(_ == 1L))
  }
}
