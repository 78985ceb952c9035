package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Fixtures._
import graft.operators.DexLifecycle

/** DEx order-book fold — the reference's strongest order-dependent
  * semantics (sql.py:704-794, :645-702, :590-643, :537-588), checked
  * against hand-computed lifecycles.
  */
class DexLifecycleSpec extends AnyFunSuite {

  private def fold(events: Seq[(graft.model.RawTx, Long)], tip: Long = 1000) =
    DexLifecycle.foldKey(A, 31L, events, tip)

  test("offer → accept → full purchase → offer sold") {
    val r = fold(Seq(
      (sellOffer(A, BigDecimal("1"), BigDecimal("0.5"), timeLimit = 10,
        block = 100), 1L),
      (accept(B, A, BigDecimal("1"), block = 101), 2L),
      (purchase(B, A, BigDecimal("1"), block = 102), 3L)))
    assert(r.offers.map(_.offerState) == Seq("sold"))
    assert(r.accepts.map(_.dexState) == Seq("paid-complete"))
    // reserve, accept-hold, settle: net seller −1e8 available... +0 held
    val bySide = r.ledger.groupBy(_.address)
    assert(bySide(A).map(_.availableDelta).sum == -100000000L)
    assert(bySide(A).map(_.reservedDelta).sum == 0L)
    assert(bySide(A).map(_.acceptedDelta).sum == 0L)
    assert(bySide(B).map(_.availableDelta).sum == 100000000L)
  }

  test("partial purchase leaves accept paid-partial and offer active") {
    val r = fold(Seq(
      (sellOffer(A, BigDecimal("2"), BigDecimal("1"), timeLimit = 50,
        block = 100), 1L),
      (accept(B, A, BigDecimal("2"), block = 101), 2L),
      (purchase(B, A, BigDecimal("0.5"), block = 102), 3L)),
      tip = 110) // before the accept's expireBlock (101+50)
    assert(r.accepts.map(_.dexState) == Seq("paid-partial"))
    assert(r.offers.map(_.offerState) == Seq("active"))
    val o = r.offers.head
    assert(o.amountAccepted == 150000000L && o.amountAvailable == 0L)
  }

  test("replace refunds the unaccepted remainder (sql.py:762-772)") {
    val r = fold(Seq(
      (sellOffer(A, BigDecimal("2"), BigDecimal("1"), timeLimit = 50,
        block = 100), 1L),
      (accept(B, A, BigDecimal("0.5"), block = 101), 2L),
      (sellOffer(A, BigDecimal("3"), BigDecimal("2"), timeLimit = 50,
        block = 103), 3L)), tip = 103)
    assert(r.offers.map(_.offerState).sorted == Seq("active", "replaced"))
    // refund = 1.5 unaccepted of the replaced offer
    val refund = r.ledger.filter(e => e.txDbSerialNum == 3L &&
      e.reservedDelta < 0)
    assert(refund.map(_.availableDelta).sum == 150000000L)
  }

  test("cancel returns the full available remainder") {
    val r = fold(Seq(
      (sellOffer(A, BigDecimal("2"), BigDecimal("1"), timeLimit = 50,
        block = 100), 1L),
      (sellOffer(A, BigDecimal("0"), BigDecimal("0"), timeLimit = 0,
        block = 101, subaction = 3), 2L)))
    assert(r.offers.map(_.offerState) == Seq("cancelled"))
    assert(r.ledger.map(_.availableDelta).sum == 0L)
    assert(r.ledger.map(_.reservedDelta).sum == 0L)
  }

  test("accept clamps to remaining availability (sql.py:676-681)") {
    val r = fold(Seq(
      (sellOffer(A, BigDecimal("1"), BigDecimal("1"), timeLimit = 50,
        block = 100), 1L),
      (accept(B, A, BigDecimal("0.8"), block = 101), 2L),
      (accept(C, A, BigDecimal("0.8"), block = 101), 3L)))
    val byBuyer = r.accepts.map(a => a.buyer -> a.amountAccepted).toMap
    assert(byBuyer(B) == 80000000L)
    assert(byBuyer(C) == 20000000L)
  }

  test("unpaid accept expires at timelimit+block, hold returns to offer") {
    val r = fold(Seq(
      (sellOffer(A, BigDecimal("1"), BigDecimal("1"), timeLimit = 5,
        block = 100), 1L),
      (accept(B, A, BigDecimal("1"), block = 101), 2L)), tip = 200)
    assert(r.accepts.map(_.dexState) == Seq("expired"))
    assert(r.offers.map(_.offerState) == Seq("active"))
    assert(r.offers.head.amountAvailable == 100000000L)
    assert(r.offers.head.amountAccepted == 0L)
  }

  test("accept on a replaced offer settles/expires against its own offer, not the new one") {
    // offer1 → accept(0.4) → replace with offer2 → purchase(0.4): the
    // settlement must come from the replaced offer's held reserve and
    // leave offer2's book untouched
    val settled = fold(Seq(
      (sellOffer(A, BigDecimal("1"), BigDecimal("1"), timeLimit = 50,
        block = 100), 1L),
      (accept(B, A, BigDecimal("0.4"), block = 101), 2L),
      (sellOffer(A, BigDecimal("3"), BigDecimal("2"), timeLimit = 50,
        block = 102), 3L),
      (purchase(B, A, BigDecimal("0.4"), block = 103), 4L)), tip = 110)
    val o2 = settled.offers.find(_.offerState == "active").get
    assert(o2.amountAvailable == 300000000L && o2.amountAccepted == 0L)
    assert(settled.accepts.map(_.dexState) == Seq("paid-complete"))
    // every avail/reserved movement pairs (reserve, settle, refund)
    assert(settled.ledger.map(e => e.availableDelta + e.reservedDelta).sum
      == 0L)
    // B received exactly the purchased amount
    assert(settled.ledger.filter(_.address == B)
      .map(_.availableDelta).sum == 40000000L)

    // same shape but the accept EXPIRES after the replace: hold returns
    // to the seller's balance (avail+, res-), offer2 untouched
    val expired = fold(Seq(
      (sellOffer(A, BigDecimal("1"), BigDecimal("1"), timeLimit = 5,
        block = 100), 1L),
      (accept(B, A, BigDecimal("0.4"), block = 101), 2L),
      (sellOffer(A, BigDecimal("3"), BigDecimal("2"), timeLimit = 500,
        block = 102), 3L)), tip = 400)
    val o2b = expired.offers.find(_.offerState == "active").get
    assert(o2b.amountAvailable == 300000000L && o2b.amountAccepted == 0L)
    assert(expired.accepts.map(_.dexState).sorted == Seq("expired"))
    assert(expired.ledger.map(_.acceptedDelta).sum == 0L)
  }

  test("expiry after offer cancelled returns reserve to seller directly") {
    val r = fold(Seq(
      (sellOffer(A, BigDecimal("1"), BigDecimal("1"), timeLimit = 5,
        block = 100), 1L),
      (accept(B, A, BigDecimal("0.4"), block = 101), 2L),
      (sellOffer(A, BigDecimal("0"), BigDecimal("0"), timeLimit = 0,
        block = 102, subaction = 3), 3L)), tip = 300)
    // cancel refunds 0.6; expiry of the 0.4 hold refunds the rest
    assert(r.ledger.map(_.availableDelta).sum == 0L)
    assert(r.ledger.map(_.reservedDelta).sum == 0L)
    assert(r.ledger.map(_.acceptedDelta).sum == 0L)
  }
}
