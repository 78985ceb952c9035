package graft.model

/** Typed data model of the engine — the §1.3 core tables of SURVEY.md,
  * re-expressed as immutable case classes for Dataset[T] pipelines.
  * Citations are into /root/reference/.
  *
  * Amounts are integer BASE UNITS (divisible amounts ×1e8 on ingest,
  * reference omniutils.py:4-12, stored numeric(19) per
  * omni_db_schema.psql:14-15). Long covers ±9.2e18; the reference's
  * numeric(19) ceiling is 1e19−1 — the overflow band is unreachable for
  * real token supplies and asserted against in the decoder.
  */
object Roles {
  val Sender = "sender"; val Recipient = "recipient"; val Seller = "seller"
  val Buyer = "buyer"; val Issuer = "issuer"; val Participant = "participant"
  val Payee = "payee"; val Payer = "payer"; val FeePayer = "feepayer"
}

/** Raw decoded Omni transaction — the union of the per-type JSON shapes
  * consumed by insertTxAddr (reference sql.py:1664-2409); field names
  * follow the RPC JSON (FIXTURES.md B.1).
  */
final case class RawTx(
    txid: String,
    protocol: String, // "Omni" | "Bitcoin"
    sendingaddress: String,
    referenceaddress: Option[String],
    type_int: Int,
    version: Int,
    valid: Boolean,
    block: Long,
    blocktime: Long,
    positioninblock: Int,
    propertyid: Long,
    divisible: Boolean,
    amount: BigDecimal,
    // type 3 STO (sql.py:1802-1846)
    totalstofee: BigDecimal = 0,
    recipients: Seq[StoRecipient] = Nil,
    // type 4 Send All (sql.py:1848-1901)
    subsends: Seq[SubSend] = Nil,
    // type 20 DEx sell (sql.py:704-794): 1=new 2=update 3=cancel
    subaction: Int = 0,
    bitcoindesired: BigDecimal = 0,
    timelimit: Long = 0,
    // type -22 DEx purchase (sql.py:1966-2030)
    purchases: Seq[DexPurchase] = Nil,
    // types 21/25 MetaDEx (sql.py:2032-2127)
    propertyiddesired: Long = 0,
    desireddivisible: Boolean = false,
    amountdesired: BigDecimal = 0,
    matches: Seq[TradeMatch] = Nil,
    // types 26/27/28 cancels (sql.py:2129-2166)
    cancelledtransactions: Seq[CancelledTx] = Nil,
    // types 50/51/53/54 property lifecycle (sql.py:2168-2244); the
    // category/subcategory/url/data payload fields feed the registry's
    // PropertyData fidelity (sql.py:1565-1575)
    propertyname: String = "",
    ecosystem: String = "",
    propertycategory: String = "",
    propertysubcategory: String = "",
    propertyurl: String = "",
    propertydata: String = "",
    // type -51 crowdsale purchase (sql.py:2180-2232)
    purchasedpropertyid: Long = 0,
    purchaseddivisible: Boolean = false,
    purchasedtokens: BigDecimal = 0,
    issuertokens: BigDecimal = 0,
    // type 53 close-crowdsale credit (sql.py:1485-1501)
    addedissuertokens: BigDecimal = 0,
    // types 185/186 freeze (sql.py:2329-2372): pid decoded from payload
    payload: String = "",
    // type 65534 (sql.py:2392-2396)
    featureid: Long = 0)

final case class StoRecipient(address: String, amount: BigDecimal)
final case class SubSend(propertyid: Long, divisible: Boolean,
    amount: BigDecimal)
/** One purchase inside a -22 BTC payment (sql.py:1971-2027). Each
  * purchase names its own seller, property AND that property's
  * divisibility — one payment can settle mixed-divisibility accepts, so
  * scaling by the payment tx's flag would zero or 1e8-inflate amounts.
  */
final case class DexPurchase(referenceaddress: String, propertyid: Long,
    valid: Boolean, amountbought: BigDecimal, divisible: Boolean = true)
final case class TradeMatch(txid: String, address: String, block: Long,
    amountsold: BigDecimal, amountreceived: BigDecimal,
    tradingfee: BigDecimal)
final case class CancelledTx(txid: String, propertyid: Long,
    amountunreserved: BigDecimal)

/** Block header (reference getblock → insertBlock sql.py:2507-2528). */
final case class BlockHeader(height: Long, time: Long, version: Long,
    hash: String, previousblockhash: String, merkleroot: String,
    bits: String, nonce: Long, size: Long, txcount: Long)

/** One double-entry ledger row — AddressesInTxs
  * (omni_db_schema.psql:256-284). The fact table everything derives from.
  */
final case class LedgerEntry(
    address: String,
    propertyId: Long,
    protocol: String,
    txDbSerialNum: Long,
    addressTxIndex: Int,
    addressRole: String,
    availableDelta: Long,
    reservedDelta: Long,
    acceptedDelta: Long,
    frozenDelta: Long,
    linkedTxDbSerialNum: Long = 0L)

/** Freeze/unfreeze marker — order-dependent semantics resolved by the
  * balance sequencer, not the decoder (sql.py:2329-2372, :1408-1414).
  */
final case class FreezeEvent(address: String, propertyId: Long,
    txDbSerialNum: Long, freeze: Boolean)

/** AddressBalances (omni_db_schema.psql:83-98). */
final case class AddressBalance(address: String, propertyId: Long,
    available: Long, reserved: Long, accepted: Long, frozen: Long,
    lastTxDbSerialNum: Long, frozenFlag: Boolean = false)

/** ActiveOffers (omni_db_schema.psql:421-446). */
final case class ActiveOffer(seller: String, propertyIdSelling: Long,
    propertyIdDesired: Long, totalSelling: Long, amountAvailable: Long,
    amountAccepted: Long, amountDesired: Long, timeLimit: Long,
    unitPrice: BigDecimal, offerState: String, // active|cancelled|replaced|sold
    createTxDbSerialNum: Long, lastTxDbSerialNum: Long)

/** OfferAccepts (omni_db_schema.psql:449-466). */
final case class OfferAccept(buyer: String, seller: String,
    propertyIdSelling: Long, amountAccepted: Long, amountPurchased: Long,
    saleTxDbSerialNum: Long, acceptTxDbSerialNum: Long, block: Long,
    expireBlock: Long, dexState: String) // invalid|unpaid|paid-partial|paid-complete|expired

/** MatchedTrades (omni_db_schema.psql:404-418). */
final case class MatchedTrade(txDbSerialNum: Long, txHash: String,
    propertyIdSold: Long, propertyIdReceived: Long, amountSold: Long,
    amountReceived: Long, block: Long, tradingFee: Long,
    matchedTxHash: String)

/** SmartProperties (omni_db_schema.psql:312-343) at reference payload
  * fidelity (sql.py:1524-1600 insertProperty): name/category/
  * subcategory/url/data, PropertyType (1=indivisible, 2=divisible), the
  * crowdsale participant tally (+issuer bonus credited once at close,
  * sql.py:1485-1501), the managed grant/revoke net, and delegate state
  * (73/74, sql.py:2306-2327). `propertyDataJson` is the assembled
  * PropertyData payload the wallet's property pages read.
  */
final case class SmartProperty(propertyId: Long, issuer: String,
    ecosystem: String, propertyName: String, divisible: Boolean,
    managed: Boolean, createTxDbSerialNum: Long, lastTxDbSerialNum: Long,
    propertyType: Int = 1,
    category: String = "",
    subcategory: String = "",
    url: String = "",
    data: String = "",
    propertyDataJson: String = "",
    crowdsale: Boolean = false,
    crowdsaleActive: Boolean = false,
    participantCount: Long = 0,
    tokensPurchased: Long = 0,
    issuerTokens: Long = 0,
    granted: Long = 0,
    delegate: String = "")

object Amounts {
  private val Sat = BigDecimal(100000000L)
  /** Divisibility scaling (reference omniutils.py:4-12): divisible
    * display amounts ×1e8 → integer base units; indivisible amounts are
    * already whole tokens.
    */
  def toBase(amount: BigDecimal, divisible: Boolean): Long = {
    val units = if (divisible) amount * Sat else amount
    require(units.isWhole, s"non-integral base amount: $amount")
    units.toLongExact
  }
}
