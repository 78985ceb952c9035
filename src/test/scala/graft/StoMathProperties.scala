package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.StoMath
import graft.operators.LedgerDecoder
import graft.model.Amounts

/** ScalaCheck properties for the pure algebra (SURVEY §5.2):
  * closed-form STO ≡ sequential reference loop, conservation,
  * scaling/payload round-trips.
  */
object StoMathProperties extends Properties("StoMath") {

  private val holdersGen: Gen[Seq[(String, Long)]] =
    Gen.listOf(Gen.zip(
      Gen.chooseNum(0, 9999).map(i => s"addr$i"),
      Gen.chooseNum(0L, 1000000L)))
      .map(_.groupBy(_._1).map { case (a, xs) => a -> xs.map(_._2).sum }.toSeq)

  private val amountGen: Gen[Long] = Gen.chooseNum(1L, 2000000L)

  property("closedForm == referenceLoop on any holder set") =
    Prop.forAll(holdersGen, amountGen) { (holders, amount) =>
      StoMath.closedForm(holders, amount) ==
        StoMath.referenceLoop(holders, amount)
    }

  property("distributes exactly min(amount, needed) — never more, nothing lost") =
    Prop.forAll(holdersGen, amountGen) { (holders, amount) =>
      val out = StoMath.closedForm(holders, amount)
      val total = holders.filter(_._2 > 0).map(_._2).sum
      val paid = out.map(_._2).sum
      if (total <= 0) out.isEmpty
      // ceil-shares cover the whole amount whenever anyone holds > 0
      else paid == amount && out.forall(_._2 > 0)
    }

  property("base-unit scaling round-trips for divisible amounts") =
    Prop.forAll(Gen.chooseNum(0L, 92000000000L)) { units =>
      val display = BigDecimal(units) / BigDecimal(100000000L)
      Amounts.toBase(display, divisible = true) == units
    }

  property("payload propertyid decode inverts hex encoding") =
    Prop.forAll(Gen.chooseNum(0L, 4294967295L)) { pid =>
      val payload = "00000000" + f"$pid%08x"
      LedgerDecoder.payloadPropertyId(payload) == pid
    }
}
