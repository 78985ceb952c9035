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

  test("one crowdsale with 100k purchases folds with bounded state") {
    import graft.operators.PropertyRegistry
    val n = 100000L
    val create = (RawTx(txid = "c", protocol = "Omni",
      sendingaddress = "ISSUER", referenceaddress = None, type_int = 51,
      version = 0, valid = true, block = 1, blocktime = 0,
      positioninblock = 0, propertyid = 77, divisible = true, amount = BigDecimal(0),
      propertyname = "HotSale", ecosystem = "Production"), 1L)
    // 100k -51 purchases on the same purchased pid — the reference's
    // unbounded per-property history (sql.py:2180-2232); the stream
    // fold must hold O(1) state, never the group
    val purchases = spark.range(2, n + 2).as[Long].map { i =>
      (RawTx(txid = f"$i%016x", protocol = "Omni",
        sendingaddress = s"P$i", referenceaddress = Some("ISSUER"),
        type_int = -51, version = 0, valid = true, block = i,
        blocktime = 0, positioninblock = 0, propertyid = 1,
        divisible = true, amount = BigDecimal(0), purchasedpropertyid = 77,
        purchasedtokens = BigDecimal(2), purchaseddivisible = true,
        issuertokens = BigDecimal(1)), i)
    }
    val close = (RawTx(txid = "x", protocol = "Omni",
      sendingaddress = "ISSUER", referenceaddress = None, type_int = 53,
      version = 0, valid = true, block = n + 5, blocktime = 0,
      positioninblock = 0, propertyid = 77, divisible = true,
      amount = BigDecimal(0), addedissuertokens = BigDecimal(10)), n + 5)
    val out = PropertyRegistry.derive(
      spark.createDataset(Seq(create, close)).union(purchases)).collect()
    assert(out.length == 1)
    val p = out.head
    assert(p.crowdsale && !p.crowdsaleActive)
    assert(p.participantCount == n)
    assert(p.tokensPurchased == 2L * 100000000L * n)
    // per-purchase issuer tokens + the close credit, exactly once
    assert(p.issuerTokens == 1L * 100000000L * n + 10L * 100000000L)
    assert(p.lastTxDbSerialNum == n + 5)
    assert(p.issuer == "ISSUER")
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
