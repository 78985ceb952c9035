package graft

import graft.model._
import graft.operators.{Balances, DexLifecycle, GroupRuns}

/** Skew stress for the secondary-sorted sequential folds: ONE key
  * carries a deliberately huge history (the 100×-scale pathological
  * seller), and the stream fold must complete with closed-form-exact
  * output. With the pre-rewrite `groupByKey + it.toSeq.sortBy` shape
  * this is the group that buffers and copies whole in one task; the
  * GroupRuns fold holds only O(state) per key.
  */
class FoldSkewSpec extends SparkTestBase {
  import spark.implicits._

  test("GroupRuns splits a sorted iterator into lazy runs") {
    val it = Iterator((1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"))
    val runs = new GroupRuns(it).map { case (k, vs) => k -> vs.mkString }
      .toList
    assert(runs == List(1 -> "ab", 2 -> "c", 3 -> "de"))
  }

  test("one seller with 50k expiring accepts folds with bounded state") {
    val n = 50000L
    val offer = (RawTx(txid = "off", protocol = "Omni",
      sendingaddress = "S", referenceaddress = None, type_int = 20,
      version = 0, valid = true, block = 0, blocktime = 0,
      positioninblock = 0, propertyid = 31, divisible = false,
      amount = BigDecimal(1000000000L), subaction = 1,
      bitcoindesired = BigDecimal(1), timelimit = 1L), 0L)
    // each accept is at its own block and expires before the next one
    // arrives, so open-accept state stays at one entry throughout
    val accepts = spark.range(1, n + 1).as[Long].map { i =>
      (RawTx(txid = f"$i%016x", protocol = "Omni",
        sendingaddress = s"B$i", referenceaddress = Some("S"),
        type_int = 22, version = 0, valid = true, block = i * 3,
        blocktime = 0, positioninblock = 0, propertyid = 31,
        divisible = false, amount = BigDecimal(2)), i)
    }
    val res = DexLifecycle.derive(
      spark.createDataset(Seq(offer)).union(accepts), tipBlock = n * 3 + 10)
      .collect()
    assert(res.length == 1)
    val r = res.head
    // every hold was taken then returned by expiry
    assert(r.offers.map(_.amountAvailable).sum == 1000000000L)
    assert(r.accepts.length == n)
    assert(r.accepts.forall(_.dexState == "expired"))
  }

  test("one address with 200k entries and a freeze window folds exactly") {
    val n = 200000L
    val ledger = spark.range(1, n + 1).as[Long].map { i =>
      LedgerEntry("X", 31L, "Omni", i, 0, "recipient", 1L, 0, 0, 0)
    }
    val freezes = spark.createDataset(Seq(
      FreezeEvent("X", 31L, 100000L, freeze = true),
      FreezeEvent("X", 31L, 150000L, freeze = false)))
    val out = Balances.deriveWithFreezes(ledger, freezes).collect()
    assert(out.length == 1)
    val b = out.head
    assert(b.available == n)
    assert(b.frozen == 0L)
    assert(!b.frozenFlag)
    assert(b.lastTxDbSerialNum == n)
  }
}
