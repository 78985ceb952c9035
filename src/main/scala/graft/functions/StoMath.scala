package graft.functions

/** A11/W5 — the STO proportional-distribution algebra (reference
  * sendToOwners sql.py:470-534): holders sorted (balance DESC, address
  * ASC, sortSTO :463-468), each receives ceil(bal/total × amount)
  * clamped by what's left; later holders absorb the shortfall.
  *
  * [[closedForm]] is the window formulation used by the distributed
  * query (a11_sto_distribution): prefix-sum of UNCLAMPED shares +
  * least/greatest. [[referenceLoop]] is a faithful port of the
  * reference's sequential loop (clamps by remaining PAID). The two are
  * equal on every input — proven by StoMathProperties, which is what
  * licenses running the loop as a shuffle-once window at scale.
  */
object StoMath {

  /** Exact integer ceil-division (a·b may not overflow Long — callers
    * keep balances and amount within 2^31 each, as the base-unit model
    * guarantees for realistic supplies).
    */
  private def ceilDiv(n: Long, d: Long): Long = (n + d - 1) / d

  def closedForm(holders: Seq[(String, Long)], amount: Long): Seq[(String, Long)] = {
    val sorted = holders.filter(_._2 > 0).sortBy { case (a, b) => (-b, a) }
    val total = sorted.map(_._2).sum
    if (total <= 0 || amount <= 0) return Nil
    var priorShare = 0L
    sorted.flatMap { case (addr, bal) =>
      val share = ceilDiv(bal * amount, total)
      val paid = math.min(share, math.max(amount - priorShare, 0L))
      priorShare += share
      if (paid > 0) Some(addr -> paid) else None
    }
  }

  def referenceLoop(holders: Seq[(String, Long)], amount: Long): Seq[(String, Long)] = {
    val sorted = holders.filter(_._2 > 0).sortBy { case (a, b) => (-b, a) }
    val total = sorted.map(_._2).sum
    if (total <= 0 || amount <= 0) return Nil
    var remaining = amount
    val out = Seq.newBuilder[(String, Long)]
    val it = sorted.iterator
    while (it.hasNext && remaining > 0) {
      val (addr, bal) = it.next()
      val share = ceilDiv(bal * amount, total)
      val paid = math.min(share, remaining)
      remaining -= paid
      if (paid > 0) out += (addr -> paid)
    }
    out.result()
  }
}
