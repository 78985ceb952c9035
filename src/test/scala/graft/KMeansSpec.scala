package graft

import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** Unit coverage for the deterministic Lloyd trainer: objective
  * monotonicity, determinism, and the exact-integer distance identity
  * d2 = ‖q−c‖² that the BIGINT formulation relies on.
  */
class KMeansSpec extends SparkTestBase {

  private lazy val base =
    graft.queries.SimilarityQueries.quantized(spark, "/root/testdata/sf0.001")

  test("Lloyd iterations never increase the k-means objective") {
    def objective(iters: Int): Long =
      KMeans.assign(base, KMeans.centroids(base, 4, iters))
        .agg(sum("d2")).collect()(0).getLong(0)
    val o1 = objective(1)
    val o2 = objective(2)
    val o3 = objective(3)
    assert(o2 <= o1, s"iteration 2 worsened the objective: $o1 -> $o2")
    assert(o3 <= o2, s"iteration 3 worsened the objective: $o2 -> $o3")
  }

  test("training is deterministic across runs") {
    val a = KMeans.centroids(base, 4, 3).sortBy(_.cid)
    val b = KMeans.centroids(base, 4, 3).sortBy(_.cid)
    assert(a.map(_.cid) == b.map(_.cid))
    assert(a.zip(b).forall { case (x, y) => x.c.sameElements(y.c) && x.nc == y.nc })
  }

  test("integer distance identity: nq - 2*dot + nc equals brute-force squared L2") {
    val cs = KMeans.centroids(base, 4, 2)
    val rows = KMeans.assign(base, cs)
      .select("vec_id", "q", "cluster", "d2").limit(50).collect()
    val cmap = cs.map(c => c.cid -> c.c).toMap
    rows.foreach { r =>
      val q = r.getAs[Seq[Long]]("q").toArray
      val c = cmap(r.getAs[Long]("cluster"))
      val d2 = q.indices.map { i => val d = q(i) - c(i); d * d }.sum
      assert(d2 == r.getAs[Long]("d2"), s"vec ${r.get(0)}")
    }
  }

  test("every vector lands on its genuinely nearest centroid (ties to lower cid)") {
    val cs = KMeans.centroids(base, 4, 2)
    val rows = KMeans.assign(base, cs).limit(100).collect()
    rows.foreach { r =>
      val q = r.getAs[Seq[Long]]("q").toArray
      val best = cs.map { c =>
        val d2 = q.indices.map { i => val d = q(i) - c.c(i); d * d }.sum
        (d2, c.cid)
      }.min
      assert(best._2 == r.getAs[Long]("cluster"))
    }
  }
}
