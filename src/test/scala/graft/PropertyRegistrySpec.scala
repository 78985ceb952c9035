package graft

import graft.Fixtures._
import graft.operators.PropertyRegistry

/** SmartProperties registry fidelity (sql.py:1524-1600, :1469-1501):
  * payload fields, crowdsale participant tally, close-bonus
  * exactly-once, issuer change and delegate state.
  */
class PropertyRegistrySpec extends SparkTestBase {
  import spark.implicits._

  private def crowdsale(serialFrom: Long = 1L) = Seq(
    (tx(51, A, pid = 7, divisible = false).copy(propertyname = "Cool",
      ecosystem = "Production", propertycategory = "cat",
      propertysubcategory = "sub", propertyurl = "u", propertydata = "d"),
      serialFrom),
    (tx(-51, B, Some(A), pid = 1).copy(purchasedpropertyid = 7,
      purchaseddivisible = false, purchasedtokens = BigDecimal(100),
      issuertokens = BigDecimal(10)), serialFrom + 1),
    (tx(-51, C, Some(A), pid = 1).copy(purchasedpropertyid = 7,
      purchaseddivisible = false, purchasedtokens = BigDecimal(50),
      issuertokens = BigDecimal(5)), serialFrom + 2),
    (tx(53, A, pid = 7, divisible = false)
      .copy(addedissuertokens = BigDecimal(25)), serialFrom + 3))

  test("crowdsale tally + close bonus + issuer change + delegate") {
    val events = crowdsale() ++ Seq(
      (tx(70, A, Some(B), pid = 7), 5L),
      (tx(73, B, Some(C), pid = 7), 6L))
    val p = PropertyRegistry.derive(spark.createDataset(events))
      .collect().head
    assert(p.propertyId == 7 && p.crowdsale && !p.crowdsaleActive)
    assert(p.participantCount == 2)
    assert(p.tokensPurchased == 150)
    assert(p.issuerTokens == 15 + 25) // purchases bonus + close bonus
    assert(p.issuer == B) // changed by the 70
    assert(p.delegate == C)
    assert(p.category == "cat" && p.subcategory == "sub" && p.url == "u")
    assert(p.propertyDataJson.contains("\"category\":\"cat\"") &&
      p.propertyDataJson.contains("\"divisible\":false"))
    assert(p.createTxDbSerialNum == 1 && p.lastTxDbSerialNum == 6)
  }

  test("a second close does not double-credit the bonus") {
    val events = crowdsale() ++ Seq(
      (tx(53, A, pid = 7, divisible = false)
        .copy(addedissuertokens = BigDecimal(999)), 5L))
    val p = PropertyRegistry.derive(spark.createDataset(events))
      .collect().head
    assert(p.issuerTokens == 40) // the 999 of the dead close is ignored
  }

  test("foldKey Seq overload sorts by serial before the stream fold") {
    // hand the fixture in REVERSE serial order: the overload must sort
    // (the iterator form requires serial order) and match derive()
    val events = crowdsale().map { case (t, s) => (t.copy(propertyid =
      if (t.type_int == -51) t.propertyid else 7), s) }
    val fromSeq = PropertyRegistry.foldKey(7L, events.reverse)
    val fromDerive = PropertyRegistry.derive(spark.createDataset(events))
      .collect().head
    assert(fromSeq == fromDerive)
  }

  test("managed property: grant/revoke net + open crowdsale stays active") {
    val events = Seq(
      (tx(54, A, pid = 8, divisible = false).copy(propertyname = "Mgd"), 1L),
      (tx(55, A, Some(B), pid = 8, amount = BigDecimal(100),
        divisible = false), 2L),
      (tx(56, A, pid = 8, amount = BigDecimal(30), divisible = false), 3L),
      (tx(51, A, pid = 9, divisible = false).copy(propertyname = "Open"), 4L),
      (tx(74, A, pid = 8), 5L))
    val byPid = PropertyRegistry.derive(spark.createDataset(events))
      .collect().map(p => p.propertyId -> p).toMap
    assert(byPid(8).managed && byPid(8).granted == 70)
    assert(byPid(8).delegate == "")
    assert(byPid(9).crowdsale && byPid(9).crowdsaleActive)
  }
}
