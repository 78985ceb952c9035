package graft

import org.scalatest.funsuite.AnyFunSuite

/** Env-gated multi-JVM slice (r11 verdict asks #1/#2): the real
  * executor boundary — typed-fold serialization, broadcasts, and
  * checkpoint block placement crossing processes — cannot be exercised
  * by the shared local[4] test session, so these shell out to fresh
  * JVMs under `local-cluster`. Canceled (not vacuously green) unless
  * GRAFT_MULTIJVM=1: they need SPARK_HOME, a compiled class snapshot
  * at /tmp/graft_classes, and ~2 spawned executor JVMs each.
  *
  * The full-registry multi-JVM correctness run is
  * `tools/run_multijvm.sh` + `tools/check.py` (145/145 at sf0.01,
  * first run round 12 — see PERF.md).
  */
class MultiJvmSpec extends AnyFunSuite {

  private def gated(): Unit =
    assume(sys.env.get("GRAFT_MULTIJVM").contains("1"),
      "set GRAFT_MULTIJVM=1 (and build /tmp/graft_classes) to run")

  private def run(cmd: String*): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File("/root/repo"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val rc = p.waitFor()
    (rc, out)
  }

  test("reliable checkpoint survives a force-killed executor JVM " +
      "(local-cluster, GRAFT_MULTIJVM)") {
    gated()
    val (rc, out) = run("tools/run_multijvm_demo.sh", "snapshot")
    assert(rc == 0 && out.contains("MJVM_DEMO ok mode=snapshot"),
      s"demo failed rc=$rc tail=${out.takeRight(1500)}")
  }

  test("stage retry re-reads checkpoint files when the executor dies " +
      "MID-STAGE (local-cluster, GRAFT_MULTIJVM)") {
    gated()
    val (rc, out) = run("tools/run_multijvm_demo.sh", "midserve")
    assert(rc == 0 && out.contains("MJVM_DEMO ok mode=midserve"),
      s"demo failed rc=$rc tail=${out.takeRight(1500)}")
  }

  test("the real m4 sequential serve survives an executor killed " +
      "mid-serve (local-cluster, GRAFT_MULTIJVM)") {
    gated()
    val (rc, out) = run("tools/run_multijvm_demo.sh", "m4")
    assert(rc == 0 && out.contains("MJVM_DEMO ok mode=m4"),
      s"demo failed rc=$rc tail=${out.takeRight(1500)}")
  }

  test("a registry sample is hash-green under local-cluster " +
      "(GRAFT_MULTIJVM)") {
    gated()
    // a cross-section, not the full 145 (that is the round tool run):
    // typed ledger fold, window, broadcast join, sink roundtrip, dedup
    val sample = Seq("ledger_simple_send", "a1_running_balance",
      "j2_broadcast_dim", "s8_sink_roundtrip", "dedup_minhash_lsh",
      "m4_reorg_rederive").mkString(",")
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_mjvm_spec").toString
    val pb = new ProcessBuilder("tools/run_multijvm.sh",
      "/root/testdata/sf0.001", outDir)
    pb.directory(new java.io.File("/root/repo"))
    pb.environment().put("SPARK_GRAFT_ONLY", sample)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val vOut = new String(p.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(p.waitFor() == 0, s"verify rc!=0 tail=${vOut.takeRight(1500)}")
    val (rc, out) = run(("python3" +: "tools/check.py" +:
      "/root/testdata/sf0.001" +: outDir +: sample.split(",").toSeq): _*)
    assert(rc == 0 && out.contains("6 ok, 0 fail"),
      s"check failed rc=$rc tail=${out.takeRight(1500)}")
  }
}
