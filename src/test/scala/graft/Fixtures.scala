package graft

import graft.model._

/** Omni-shaped fixtures per FIXTURES.md §B.1 — shapes mirror the golden
  * per-type vectors of reference tx.example.
  */
object Fixtures {
  val A = "1AliceAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
  val B = "1BobBBBBBBBBBBBBBBBBBBBBBBBBBBBBBB"
  val C = "1CarolCCCCCCCCCCCCCCCCCCCCCCCCCCCC"
  val D = "1DaveDDDDDDDDDDDDDDDDDDDDDDDDDDDDD"

  private var txCounter = 0
  def nextTxid(): String = {
    txCounter += 1
    f"$txCounter%064x"
  }

  def tx(typeInt: Int, from: String, to: Option[String] = None,
      pid: Long = 31, amount: BigDecimal = 0, divisible: Boolean = true,
      block: Long = 100, pos: Int = 0, valid: Boolean = true): RawTx =
    RawTx(txid = nextTxid(), protocol = "Omni", sendingaddress = from,
      referenceaddress = to, type_int = typeInt, version = 0,
      valid = valid, block = block, blocktime = 1377994675L + block * 600,
      positioninblock = pos, propertyid = pid, divisible = divisible,
      amount = amount)

  def simpleSend(from: String, to: String, amount: BigDecimal,
      pid: Long = 31, block: Long = 100, pos: Int = 0,
      valid: Boolean = true): RawTx =
    tx(0, from, Some(to), pid, amount, block = block, pos = pos,
      valid = valid)

  def grant(issuer: String, to: String, amount: BigDecimal,
      pid: Long = 31, block: Long = 100, pos: Int = 0): RawTx =
    tx(55, issuer, Some(to), pid, amount, block = block, pos = pos)

  def sellOffer(seller: String, amount: BigDecimal, btcDesired: BigDecimal,
      timeLimit: Long, pid: Long = 31, block: Long = 100, pos: Int = 0,
      subaction: Int = 1): RawTx =
    tx(20, seller, None, pid, amount, block = block, pos = pos)
      .copy(subaction = subaction, bitcoindesired = btcDesired,
        timelimit = timeLimit)

  def accept(buyer: String, seller: String, amount: BigDecimal,
      pid: Long = 31, block: Long = 100, pos: Int = 0): RawTx =
    tx(22, buyer, Some(seller), pid, amount, block = block, pos = pos)

  def purchase(buyer: String, seller: String, amount: BigDecimal,
      pid: Long = 31, block: Long = 100, pos: Int = 0): RawTx =
    tx(-22, buyer, Some(seller), pid, BigDecimal(0), block = block,
      pos = pos)
      .copy(purchases = Seq(DexPurchase(seller, pid, valid = true, amount)))
}
