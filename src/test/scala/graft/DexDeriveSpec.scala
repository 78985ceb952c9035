package graft

import graft.Fixtures._
import graft.model.DexPurchase
import graft.operators.DexLifecycle

/** Spark-level tests of [[DexLifecycle.derive]]'s grouping — foldKey
  * itself is covered by DexLifecycleSpec; here the question is whether
  * events reach the RIGHT fold group. The reference explodes a BTC
  * payment's purchases[] and each purchase names its own seller
  * (sql.py:1966-2030), so one -22 tx can settle accepts of several
  * sellers at once.
  */
class DexDeriveSpec extends SparkTestBase {

  test("one BTC payment settles accepts held by two different sellers") {
    import spark.implicits._
    val events = Seq[(graft.model.RawTx, Long)](
      (sellOffer(A, BigDecimal("1"), BigDecimal("1"), timeLimit = 50,
        block = 100), 1L),
      (sellOffer(C, BigDecimal("1"), BigDecimal("1"), timeLimit = 50,
        block = 100), 2L),
      (accept(B, A, BigDecimal("0.4"), block = 101), 3L),
      (accept(B, C, BigDecimal("0.6"), block = 101), 4L),
      // ONE payment tx carrying purchases for BOTH sellers
      (tx(-22, B, Some(A), block = 102).copy(purchases = Seq(
        DexPurchase(A, 31, valid = true, BigDecimal("0.4")),
        DexPurchase(C, 31, valid = true, BigDecimal("0.6")))), 5L))

    val results = DexLifecycle.derive(events.toDS(), tipBlock = 110).collect()
    val accepts = results.flatMap(_.accepts)
    val ledger = results.flatMap(_.ledger)

    // both sellers' accepts settle — the head-seller-only bug dropped C's
    assert(accepts.map(a => a.seller -> a.dexState).toMap ==
      Map(A -> "paid-complete", C -> "paid-complete"))
    // buyer receives the full bought amount across both groups
    assert(ledger.filter(_.address == B).map(_.availableDelta).sum ==
      100000000L)
    // each seller's reserve released by exactly their own purchase
    assert(ledger.filter(e => e.address == A && e.txDbSerialNum == 5L)
      .map(_.reservedDelta).sum == -40000000L)
    assert(ledger.filter(e => e.address == C && e.txDbSerialNum == 5L)
      .map(_.reservedDelta).sum == -60000000L)
  }

  test("one payment settles purchases of MIXED divisibility by the purchased property's flag") {
    import spark.implicits._
    val events = Seq[(graft.model.RawTx, Long)](
      // divisible property 31 sold by A, indivisible property 32 by C
      (sellOffer(A, BigDecimal("1"), BigDecimal("1"), timeLimit = 50,
        pid = 31, block = 100), 1L),
      (tx(20, C, None, pid = 32, amount = BigDecimal(10),
        divisible = false, block = 100).copy(subaction = 1,
        bitcoindesired = BigDecimal(1), timelimit = 50), 2L),
      (accept(B, A, BigDecimal("0.4"), pid = 31, block = 101), 3L),
      (tx(22, B, Some(C), pid = 32, amount = BigDecimal(7),
        divisible = false, block = 101), 4L),
      // ONE payment; its own divisible flag (false) describes neither
      // purchase fully — each purchase must scale by its own property
      (tx(-22, B, Some(A), divisible = false, block = 102).copy(
        purchases = Seq(
          DexPurchase(A, 31, valid = true, BigDecimal("0.4"),
            divisible = true),
          DexPurchase(C, 32, valid = true, BigDecimal(7),
            divisible = false))), 5L))

    val results = DexLifecycle.derive(events.toDS(), tipBlock = 110).collect()
    val ledger = results.flatMap(_.ledger)
    // divisible purchase scales x1e8; indivisible stays whole tokens
    assert(ledger.filter(e => e.address == A && e.txDbSerialNum == 5L)
      .map(_.reservedDelta).sum == -40000000L)
    assert(ledger.filter(e => e.address == C && e.txDbSerialNum == 5L)
      .map(_.reservedDelta).sum == -7L)
    val accepts = results.flatMap(_.accepts)
    assert(accepts.map(a => a.seller -> a.dexState).toMap ==
      Map(A -> "paid-complete", C -> "paid-complete"))
  }
}
