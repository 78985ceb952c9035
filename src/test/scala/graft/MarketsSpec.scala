package graft

import graft.model.ActiveOffer
import graft.operators.Markets

class MarketsSpec extends SparkTestBase {
  import spark.implicits._

  private def offer(seller: String, avail: Long, accepted: Long,
      price: BigDecimal, state: String, serial: Long): ActiveOffer =
    ActiveOffer(seller, 31L, 0L, avail + accepted, avail, accepted,
      0L, 10L, price, state, serial, serial)

  test("ticker: supply over active, best price among untouched (A6)") {
    val offers = Seq(
      offer(Fixtures.A, 100, 0, BigDecimal("0.50000000"), "active", 1),
      offer(Fixtures.B, 200, 50, BigDecimal("0.40000000"), "active", 2),
      offer(Fixtures.C, 300, 0, BigDecimal("0.60000000"), "cancelled", 3))
    val tk = Markets.tickers(spark.createDataset(offers)).collect()
    assert(tk.length == 1)
    val r = tk.head
    assert(r.getAs[Long]("supply") == 300L) // cancelled excluded
    assert(r.getAs[Long]("bestUntouchedPriceE8") == 50000000L)
    // touched offer: ceil(200×0.4)/200 = 80/200 = 0.4 exactly → 4e7
    assert(r.getAs[Long]("bestEffectivePriceE8") == 40000000L)
    assert(r.getAs[Long]("nOffers") == 2L)
  }

  test("txStats: per-block counts + trailing 24h window (A5)") {
    val txs = Seq(
      (Fixtures.simpleSend(Fixtures.A, Fixtures.B, BigDecimal(1), block = 1)
        .copy(blocktime = 1000L), 1L),
      (Fixtures.simpleSend(Fixtures.A, Fixtures.B, BigDecimal(1), block = 2)
        .copy(blocktime = 2000L), 2L),
      (Fixtures.simpleSend(Fixtures.A, Fixtures.B, BigDecimal(1), block = 3,
        valid = false).copy(blocktime = 90000L + 2000L), 3L))
    val st = Markets.txStats(spark.createDataset(txs))
      .orderBy("block").collect()
    assert(st.map(_.getAs[Long]("txCount")).toSeq == Seq(1L, 1L, 1L))
    assert(st.map(_.getAs[Long]("txCount24h")).toSeq == Seq(1L, 2L, 1L))
    assert(st.last.getAs[Long]("invalidCount") == 1L)
  }
}
