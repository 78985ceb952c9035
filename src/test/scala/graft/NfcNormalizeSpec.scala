package graft

import org.apache.spark.sql.functions._

/** Unit coverage for the native NFC expression: composition of
  * decomposed sequences, idempotence, null propagation, and the
  * codegen path (expressions in a projection run through
  * whole-stage codegen in these plans). All non-ASCII content is
  * written as \\u escapes so precomposed-vs-decomposed is explicit
  * in review, not editor-dependent.
  */
class NfcNormalizeSpec extends SparkTestBase {

  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  private val eAcuteDec = "é"  // decomposed é
  private val eAcute = "\u00e9"      // precomposed U+00E9
  private val oUmlDec = "ö"    // decomposed ö
  private val oUml = "\u00f6"        // precomposed U+00F6

  test("graft_nfc composes decomposed sequences and is idempotent") {
    val s = registered
    import s.implicits._
    val rows = Seq(
      eAcuteDec,
      oUmlDec,
      eAcute,
      "plain ascii",
      s"mix $eAcuteDec and $eAcute ok")
      .toDF("raw")
      .select($"raw", expr("graft_nfc(raw)").as("n"),
        length($"raw").as("lr"), length(expr("graft_nfc(raw)")).as("ln"))
      .collect()
    assert(rows(0).getString(1) == eAcute)
    assert(rows(0).getInt(2) == 2 && rows(0).getInt(3) == 1)
    assert(rows(1).getString(1) == oUml)
    assert(rows(2).getString(1) == eAcute) // idempotent on NFC input
    assert(rows(3).getString(1) == "plain ascii")
    assert(rows(4).getString(1) == s"mix $eAcute and $eAcute ok")
    // double application is a fixpoint
    val twice = Seq(eAcuteDec + oUmlDec).toDF("raw")
      .select(expr("graft_nfc(graft_nfc(raw)) = graft_nfc(raw)").as("fix"))
      .collect()(0).getBoolean(0)
    assert(twice)
  }

  test("graft_nfc propagates null and rejects non-string input") {
    val s = registered
    import s.implicits._
    val n = Seq[Option[String]](None).toDF("raw")
      .select(expr("graft_nfc(raw)").as("n")).collect()(0)
    assert(n.isNullAt(0))
    intercept[Exception] {
      Seq(1L).toDF("v").select(expr("graft_nfc(v)")).collect()
    }
  }

  test("graft_nfc arity errors are analysis-time, not runtime") {
    val s = registered
    import s.implicits._
    val df = Seq(("a", "b")).toDF("x", "y")
    val two = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_nfc(x, y)")).collect()
    }
    assert(two.getMessage.contains("graft_nfc"))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_nfc()")).collect()
    }
  }

  test("graft_hash60 and graft_ldot arity errors are analysis-time too") {
    val s = registered
    import s.implicits._
    val df = Seq(("a", "b")).toDF("x", "y")
    val h = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_hash60(x, y)")).collect()
    }
    assert(h.getMessage.contains("graft_hash60"))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_hash60()")).collect()
    }
    val arr = Seq((Seq(1L, 2L), Seq(3L, 4L))).toDF("a", "b")
    val d1 = intercept[org.apache.spark.sql.AnalysisException] {
      arr.select(expr("graft_ldot(a)")).collect()
    }
    assert(d1.getMessage.contains("graft_ldot"))
    intercept[org.apache.spark.sql.AnalysisException] {
      arr.select(expr("graft_ldot(a, b, a)")).collect()
    }
  }

  test("ASCII fast path returns the input object without allocation") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("pure ascii, no combining marks")
    assert(graft.functions.NfcNormalize.nfc(ascii) eq ascii)
    // non-ASCII but already NFC: quick-check path also returns input
    val nfc = UTF8String.fromString("caf" + eAcute)
    assert(graft.functions.NfcNormalize.nfc(nfc) eq nfc)
    // denormalized input still normalizes (fast path must not skip it)
    val dec = UTF8String.fromString("caf" + eAcuteDec)
    assert(graft.functions.NfcNormalize.nfc(dec).toString == "caf" + eAcute)
    // empty string is ASCII-trivially NFC
    val empty = UTF8String.fromString("")
    assert(graft.functions.NfcNormalize.nfc(empty) eq empty)
  }
}
