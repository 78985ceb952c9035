package graft
import org.apache.spark.sql.SparkSession

/** Engine-default Spark confs shared by every graft main.
  *
  * zstd for shuffle/spill blocks is UNCONDITIONAL engine policy, not a
  * tuning flag: the round-9 1000x sweep showed lz4 is the difference
  * between spill-dead and complete for text-heavy shuffles
  * (dedup_minhash_lsh's shingle shuffle exceeds 50 GB in lz4 and fits
  * in zstd — PERF.md round 9, "zstd tail phase"). On a 100 TB cluster
  * the same ratio gap decides whether a wide text shuffle fits executor
  * scratch disks; zstd's extra CPU is paid inside otherwise I/O-bound
  * stages. `spark.io.compression.codec` governs shuffle outputs, spill
  * files and broadcast blocks alike (shuffle/spill compression itself
  * is on by default).
  */
object GraftConf {
  def apply(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.io.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
}
