package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.Fixtures._
import graft.model._
import graft.operators.LedgerDecoder

/** Pure decoder tests — hand-computed expected ledger rows per
  * FIXTURES.md §B.3 (mirrors reference sql.py:1664-2409 semantics).
  */
class LedgerDecoderSpec extends AnyFunSuite {

  private def decode(t: RawTx) = LedgerDecoder.decode(t, serial = 7L)

  test("simple send: debit sender, credit recipient, ×1e8 for divisible") {
    val rows = decode(simpleSend(A, B, BigDecimal("1.5")))
    assert(rows.map(r => (r.address, r.availableDelta, r.addressRole)) ==
      Seq((A, -150000000L, "sender"), (B, 150000000L, "recipient")))
    assert(rows.forall(_.txDbSerialNum == 7L))
    assert(rows.map(_.addressTxIndex) == Seq(0, 1))
  }

  test("indivisible amounts are whole tokens, not scaled") {
    val rows = decode(simpleSend(A, B, BigDecimal(42), pid = 77)
      .copy(divisible = false))
    assert(rows.head.availableDelta == -42L)
  }

  test("invalid tx recorded with zero deltas (display-only)") {
    val rows = decode(simpleSend(A, B, BigDecimal(1), valid = false))
    assert(rows.size == 2)
    assert(rows.forall(r => r.availableDelta == 0 && r.reservedDelta == 0))
  }

  test("STO: sender debit, ecosystem fee row, payee credits") {
    val t = tx(3, A, None, pid = 31, amount = BigDecimal("10"))
      .copy(totalstofee = BigDecimal("0.00000002"),
        recipients = Seq(StoRecipient(B, BigDecimal("6")),
          StoRecipient(C, BigDecimal("4"))))
    val rows = decode(t)
    assert(rows.map(r => (r.address, r.propertyId, r.availableDelta, r.addressRole)) == Seq(
      (A, 31L, -1000000000L, "sender"),
      (A, 1L, -2L, "feepayer"),
      (B, 31L, 600000000L, "payee"),
      (C, 31L, 400000000L, "payee")))
  }

  test("send all: one debit/credit pair per subsend") {
    val t = tx(4, A, Some(B)).copy(subsends = Seq(
      SubSend(1, divisible = true, BigDecimal("0.1")),
      SubSend(9, divisible = false, BigDecimal(3))))
    val rows = decode(t)
    assert(rows.map(r => (r.address, r.propertyId, r.availableDelta)) == Seq(
      (A, 1L, -10000000L), (B, 1L, 10000000L),
      (A, 9L, -3L), (B, 9L, 3L)))
  }

  test("crowdsale purchase: buy-in transfer + minted tokens") {
    val t = tx(-51, A, Some(B), pid = 1, amount = BigDecimal("2"))
      .copy(purchasedpropertyid = 55, purchaseddivisible = true,
        purchasedtokens = BigDecimal("200"), issuertokens = BigDecimal("20"))
    val rows = decode(t)
    assert(rows.map(r => (r.address, r.propertyId, r.availableDelta)) == Seq(
      (A, 1L, -200000000L), (B, 1L, 200000000L),
      (A, 55L, 20000000000L), (B, 55L, 2000000000L)))
  }

  test("grant credits receiver; revoke debits issuer") {
    val g = decode(grant(A, B, BigDecimal(5), pid = 9).copy(divisible = false))
    assert(g.map(r => (r.address, r.availableDelta)).take(1) == Seq((B, 5L)))
    val r = decode(tx(56, A, None, pid = 9, amount = BigDecimal(2))
      .copy(divisible = false))
    assert(r.head.availableDelta == -2L)
  }

  test("conservation: per (tx, property) credits+debits sum to zero for transfer types") {
    val transfers = Seq(
      simpleSend(A, B, BigDecimal("3.75")),
      tx(4, A, Some(B)).copy(subsends = Seq(
        SubSend(2, divisible = true, BigDecimal("1.25")))))
    transfers.foreach { t =>
      val byPid = decode(t).groupBy(_.propertyId)
      byPid.foreach { case (_, rows) =>
        assert(rows.map(_.availableDelta).sum == 0L)
      }
    }
  }

  test("MetaDEx trade (21/25) reserves the for-sale amount row-locally") {
    val t25 = tx(25, A, None, pid = 31, amount = BigDecimal("2.5"))
      .copy(propertyiddesired = 32, amountdesired = BigDecimal("5"))
    val rows = decode(t25)
    assert(rows.map(r => (r.address, r.availableDelta, r.reservedDelta)) ==
      Seq((A, -250000000L, 250000000L)))
  }

  test("MetaDEx cancels (26/27/28) unreserve per cancelled tx") {
    val t26 = tx(26, A, None, pid = 31, amount = BigDecimal(0))
      .copy(cancelledtransactions = Seq(
        CancelledTx("aa", 31, BigDecimal("1")),
        CancelledTx("bb", 31, BigDecimal("0.5"))))
    val rows = decode(t26)
    assert(rows.map(r => (r.availableDelta, r.reservedDelta)) ==
      Seq((100000000L, -100000000L), (50000000L, -50000000L)))
  }

  test("metadata-only types (70/73/74/200) emit zero-delta display rows") {
    Seq(70, 73, 74, 200).foreach { ti =>
      val rows = decode(tx(ti, A, Some(B)))
      assert(rows.nonEmpty, s"type $ti")
      assert(rows.forall(r => r.availableDelta == 0 && r.reservedDelta == 0
        && r.acceptedDelta == 0 && r.frozenDelta == 0), s"type $ti")
    }
    // feature activation has no ledger surface at all
    assert(decode(tx(65534, A, None).copy(featureid = 3)).isEmpty)
    // DEx types defer entirely to the lifecycle fold
    Seq(20, 22, -22).foreach(ti => assert(decode(tx(ti, A, Some(B))).isEmpty))
  }

  test("close-crowdsale (53) credits addedissuertokens once") {
    val rows = decode(tx(53, A, None, pid = 55, amount = BigDecimal(0))
      .copy(addedissuertokens = BigDecimal("12")))
    assert(rows.map(r => (r.address, r.availableDelta)) ==
      Seq((A, 1200000000L)))
  }

  test("payload propertyid decode (P5): chars 9..16 as hex") {
    assert(LedgerDecoder.payloadPropertyId("000000c8" + "0000001f") == 31L)
    assert(LedgerDecoder.payloadPropertyId("deadbeef" + "80000003") ==
      2147483651L)
  }

  test("freeze events only from valid 185/186 with payload pid") {
    val f = tx(185, A, Some(B)).copy(payload = "000000b9" + "0000001f")
    val ev = LedgerDecoder.freezeEvents(f, 3L)
    assert(ev == Seq(FreezeEvent(B, 31L, 3L, freeze = true)))
    assert(LedgerDecoder.freezeEvents(f.copy(valid = false), 3L).isEmpty)
  }
}
