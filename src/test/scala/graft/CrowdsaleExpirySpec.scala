package graft

import graft.Fixtures._
import graft.model.RawTx
import graft.operators.{CrowdsaleExpiry, OmniPipeline}

class CrowdsaleExpirySpec extends SparkTestBase {
  import spark.implicits._

  private def crowdsale(pid: Long, bonus: BigDecimal, block: Long): RawTx =
    tx(51, A, None, pid = pid, amount = BigDecimal(0), block = block)
      .copy(addedissuertokens = bonus, propertyname = s"cs$pid")

  test("expired crowdsales emit one synthetic close; explicit closes suppress it") {
    val cs1 = crowdsale(61, BigDecimal("5"), block = 10) // will expire
    val cs2 = crowdsale(62, BigDecimal("7"), block = 11) // closed explicitly
    val cs3 = crowdsale(63, BigDecimal("9"), block = 12) // deadline in future
    val explicitClose = tx(53, A, None, pid = 62,
      amount = BigDecimal(0), block = 20).copy(addedissuertokens = BigDecimal("7"))

    val now = 100000L
    val closes = CrowdsaleExpiry.syntheticCloses(
      spark.createDataset(Seq((cs1, 50000L), (cs2, 60000L), (cs3, now + 1))),
      spark.createDataset(Seq(explicitClose)), now).collect()

    assert(closes.map(_.propertyid).toSeq == Seq(61L))
    assert(closes.head.type_int == 53)
    assert(closes.head.addedissuertokens == BigDecimal("5"))

    // folding synthetic + real events credits each bonus exactly once
    val all = Seq(cs1, cs2, cs3, explicitClose) ++ closes
    val d = OmniPipeline.derive(spark.createDataset(all), tipBlock = 10000)
    val bal = d.balances.collect()
      .map(b => b.propertyId -> b.available).toMap
    assert(bal(61L) == 500000000L)
    assert(bal(62L) == 700000000L)
    assert(bal.get(63L).forall(_ == 0L))
  }
}
