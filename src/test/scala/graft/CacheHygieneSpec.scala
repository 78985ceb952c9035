package graft

import graft.queries.Q

/** Verdict item: a long-lived session running registry queries must not
  * accumulate cache blocks. Every query-scoped persist/localCheckpoint
  * registers with [[CacheScope]]; after the action + release, the
  * session holds ZERO persistent RDDs — asserted here over the most
  * cache-heavy registered queries (minhash banding, connected
  * components' per-round checkpoints, the stamper cache, k-means base,
  * the dex fold, metadex window synthesis).
  */
class CacheHygieneSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private val heavy = Seq("dedup_minhash_lsh", "dedup_clusters",
    "dedup_retention", "curation_pipeline", "metadex_settlement",
    "dex_lifecycle_fold", "ml_kmeans_assign", "ledger_simple_send",
    "dedup_bloom_contain")

  test("cache-heavy queries leave zero persistent RDDs after release") {
    assume(new java.io.File(dir).isDirectory)
    val qmap = SparkEntry.queries
    heavy.foreach { name =>
      qmap(name)(spark, dir).count()
      // one release drops everything, including stamper caches (now
      // CacheScope-deferred, not a global slot)
      Q.releaseScoped()
      val left = spark.sparkContext.getPersistentRDDs
      assert(left.isEmpty,
        s"$name left ${left.size} cached RDDs: " +
          left.values.map(_.name).mkString(", "))
    }
  }
}
