package graft

import java.nio.file.Files

import org.apache.spark.sql.Dataset

/** r12 verdict housekeeping item: `SparkContext.setCheckpointDir` is a
  * GLOBAL sticky mutation, and `GraftCheckpoint.snapshot` (reliable
  * mode) used to issue it unguarded per call — two concurrent snapshot
  * sites with different `dirHint`s could land files under each other's
  * directory. The set→checkpoint pair now runs under a JVM-wide
  * monitor and restores the prior dir; this spec pins both halves.
  */
class GraftCheckpointSpec extends SparkTestBase {

  private def checkpointFile(ds: Dataset[_]): Option[String] =
    ds.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.getCheckpointFile
      case _ => None
    }

  /** The public API has a setter but no clearer; the shared test
    * session must end this suite with NO checkpoint dir (FullReorgSpec's
    * loud-no-dir case assumes it), so restore the private var directly.
    * Test-only — main code never does this.
    */
  private def clearCheckpointDir(): Unit = {
    val sc = spark.sparkContext
    sc.getClass.getMethod("checkpointDir_$eq", classOf[Option[_]])
      .invoke(sc, None)
    assert(sc.getCheckpointDir.isEmpty)
  }

  override def afterAll(): Unit = {
    clearCheckpointDir()
    super.afterAll()
  }

  test("concurrent reliable snapshots with different dirHints each land " +
      "under their OWN hint, and free() removes the files") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty)
    val s = spark.newSession() // own conf; shares the SparkContext
    s.conf.set(GraftCheckpoint.EnabledKey, "true")
    import s.implicits._
    val hintA = Files.createTempDirectory("graft_ck_hint_a").toString
    val hintB = Files.createTempDirectory("graft_ck_hint_b").toString
    val misplaced =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def worker(hint: String): Thread = new Thread(() => {
      var i = 0
      while (i < 6) {
        val snap = GraftCheckpoint.snapshot(
          s.range(0L, 1000L).select(($"id" % 7L).as("k"))
            .groupBy($"k").count(),
          Some(hint))
        checkpointFile(snap) match {
          case Some(f) if f.contains(hint) => ()
          case other => misplaced.add(s"hint=$hint got=$other")
        }
        GraftCheckpoint.free(snap)
        i += 1
      }
    })
    val (ta, tb) = (worker(hintA), worker(hintB))
    ta.start(); tb.start(); ta.join(60000); tb.join(60000)
    assert(misplaced.isEmpty,
      s"snapshots landed outside their own hint: $misplaced")
    // free() deleted every rdd-* checkpoint dir under both hints
    def rddDirs(root: String): Seq[String] = {
      val st = Files.walk(java.nio.file.Paths.get(root))
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.toSeq.map(_.getFileName.toString)
          .filter(_.startsWith("rdd-"))
      } finally st.close()
    }
    assert(rddDirs(hintA).isEmpty && rddDirs(hintB).isEmpty,
      "free() leaked reliable checkpoint files")
    clearCheckpointDir()
  }

  test("a caller's pre-set checkpoint dir survives a hinted snapshot " +
      "(restored to the caller's tree, not left on the engine's hint)") {
    val s = spark.newSession()
    s.conf.set(GraftCheckpoint.EnabledKey, "true")
    import s.implicits._
    val userDir = Files.createTempDirectory("graft_ck_user").toString
    val hint = Files.createTempDirectory("graft_ck_site").toString
    spark.sparkContext.setCheckpointDir(userDir)
    val snap = GraftCheckpoint.snapshot(
      s.range(0L, 100L).select(($"id" % 3L).as("k")).groupBy($"k").count(),
      Some(hint))
    try {
      assert(checkpointFile(snap).exists(_.contains(hint)),
        s"snapshot did not honor its dirHint: ${checkpointFile(snap)}")
      // stored form is scheme-qualified (file:/tmp/...), hence contains
      val after = spark.sparkContext.getCheckpointDir
      assert(after.exists(_.contains(userDir)),
        s"checkpoint dir left on the engine's hint: $after")
    } finally {
      GraftCheckpoint.free(snap)
      clearCheckpointDir()
    }
  }
}
