package graft

import graft.model.AddressBalance
import graft.operators.{Reconcile, RatesEtl}

class RatesEtlSpec extends SparkTestBase {
  import spark.implicits._

  test("fiat parse truncates to 2dp; history+latest view (W4/M1/M8)") {
    val b1 = RatesEtl.parseFiatRates(spark,
      Map("USD" -> 61234.5678, "EUR" -> 56789.999), asOf = 1000L)
    assert(b1.collect().map(_.rate1for2).sorted.toSeq ==
      Seq(56789.99, 61234.56)) // truncated, never rounded up
    val b2 = RatesEtl.parseFiatRates(spark,
      Map("USD" -> 62000.0), asOf = 2000L)
    val hist = RatesEtl.appendHistory(b1, b2)
    assert(hist.count() == 3L)
    val cur = RatesEtl.currentRates(hist).collect()
      .map(r => r.propertyId1 -> r).toMap
    assert(cur(RatesEtl.fiatPropertyId("USD")).rate1for2 == 62000.0)
    assert(cur(RatesEtl.fiatPropertyId("USD")).asOf == 2000L)
    assert(cur(RatesEtl.fiatPropertyId("EUR")).asOf == 1000L)
  }

  test("vwap and integer mean fee (A8/A9)") {
    val v = RatesEtl.vwap(Seq((2.0, 10.0), (6.0, 20.0))
      .toDF("amount", "rate")).head().getDouble(0)
    assert(v == 17.5)
    val f = RatesEtl.meanFees(Seq(("fast", 10L), ("fast", 15L))
      .toDF("tier", "fee")).head().getLong(1)
    assert(f == 12L) // int(sum/len) truncates
  }

  test("reconciliation classifies OK/Mismatch/Missing (A12/J11)") {
    def bal(a: String, avail: Long) =
      AddressBalance(a, 31L, avail, 0, 0, 0, 1L)
    val derived = spark.createDataset(Seq(bal("A", 10), bal("B", 5),
      bal("C", 1)))
    val oracle = spark.createDataset(Seq(bal("A", 10), bal("B", 7),
      bal("D", 3)))
    val d = Reconcile.diff(derived, oracle).collect()
      .map(x => x.address -> x.status).toMap
    assert(d == Map("A" -> "OK", "B" -> "Mismatch",
      "C" -> "MissingInOracle", "D" -> "MissingInDerived"))
  }
}
