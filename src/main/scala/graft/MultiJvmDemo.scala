package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executor-loss demonstration under a REAL process boundary (r11
  * verdict ask #2, composing with ask #1's multi-JVM run): under
  * `local-cluster[2,...]` — two separately-spawned executor JVMs — take
  * a `spark.graft.reliableCheckpoint` snapshot of a shuffle-bearing
  * result, FORCE-KILL one executor JVM (a hard `destroyForcibly`, the
  * real failure, not a polite decommission), and consume the snapshot:
  * the answer must equal the pre-kill value. With the default
  * localCheckpoint the snapshot's blocks live only in executor memory
  * and are unrecoverable by design (lineage is truncated); with the
  * flag on they are FILES, and the kill costs a re-read.
  *
  * Run via `tools/run_multijvm_demo.sh`; prints `MJVM_DEMO ok ...` and
  * exits 0 on success. Kept out of CI (needs SPARK_HOME + spawned
  * JVMs); the env-gated `MultiJvmSpec` shells out to it.
  */
object MultiJvmDemo {
  def main(args: Array[String]): Unit = {
    val ckDir =
      java.nio.file.Files.createTempDirectory("graft_mjvm_ck").toString
    val spark = GraftConf(SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local-cluster[2,4,2048]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config(GraftCheckpoint.EnabledKey, "true")
      .config(GraftCheckpoint.DirKey, ckDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sc = spark.sparkContext

    // wait until BOTH executors registered (driver + 2 entries)
    val deadline = System.currentTimeMillis() + 90000
    while (sc.getExecutorMemoryStatus.size < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
    require(sc.getExecutorMemoryStatus.size >= 3,
      s"expected 2 executors, saw ${sc.getExecutorMemoryStatus.size - 1}")

    // a shuffle-bearing result whose blocks land on both executors
    val df = spark.range(0L, 1000000L, 1L, 16)
      .select(($"id" % 1000L).as("k"), $"id".as("v"))
      .groupBy($"k").agg(sum($"v").as("s"))
    val expected = df.agg(sum($"s")).head().getLong(0)
    val snap = GraftCheckpoint.snapshot(df) // eager reliable checkpoint

    // hard-kill ONE executor JVM (they are children of this process)
    val executorJvms = ProcessHandle.current().descendants().iterator()
      .asScala
      .filter(_.info().commandLine().map[Boolean](
        _.contains("CoarseGrainedExecutorBackend")).orElse(false))
      .toList
    require(executorJvms.nonEmpty, "no executor JVMs found to kill")
    val victim = executorJvms.head
    victim.destroyForcibly()
    victim.onExit().get(30, java.util.concurrent.TimeUnit.SECONDS)
    Thread.sleep(2000) // let the scheduler register the loss

    // consume THROUGH the snapshot: must survive the dead executor
    val got = snap
      .agg(sum($"s").as("t"), count(lit(1)).as("n")).head()
    require(got.getLong(0) == expected && got.getLong(1) == 1000L,
      s"post-kill answer diverged: sum=${got.getLong(0)} (want $expected) " +
        s"rows=${got.getLong(1)} (want 1000)")
    println(s"MJVM_DEMO ok sum=${got.getLong(0)} rows=${got.getLong(1)} " +
      s"killedPid=${victim.pid()}")
    spark.stop()
  }
}
