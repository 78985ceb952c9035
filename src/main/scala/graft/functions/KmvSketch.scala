package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** K-minimum-values distinct sketch: a native aggregate that keeps the
  * k SMALLEST DISTINCT values of a LongType column (in practice 60-bit
  * hashes from [[Hash60]]) and evaluates to them as a sorted array.
  * The classic KMV estimator then reads cardinality off the k-th
  * minimum: if the k minima of a uniform hash space [0, 2⁶⁰) end at
  * m_k, the space is ~(k−1)·2⁶⁰/m_k distinct values wide.
  *
  * This is the aggregation shape approximate-distinct needs at 100 TB:
  * a BOUNDED (k longs) buffer that is map-side combinable and
  * order-insensitively mergeable — the exchange carries one ≤k-element
  * array per group per partition, never the value stream, and unlike
  * HLL the result is exactly deterministic (the k minima are a set
  * function of the input, independent of partitioning or order), so a
  * DuckDB oracle can pin it bit-for-bit.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT argument, got ${child.dataType.simpleString}")
    else if (k < 1 || k > (1 << 20))
      TypeCheckResult.TypeCheckFailure(s"$prettyName k out of range: $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.pollLast(); () } }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvSketch {
  /** Build from SQL argument expressions: graft_kmv(hash, k) with a
    * foldable integer k.
    */
  def fromExprs(exprs: Seq[Expression]): KmvSketch = {
    def fail(msg: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" -> s"graft_kmv: $msg"))
    if (exprs.length != 2) fail("graft_kmv(value, k) takes two arguments")
    if (!exprs(1).foldable) fail("k must be a literal")
    // Range-check BEFORE narrowing: a Long like 4294967300 would
    // truncate to 4, pass checkInputDataTypes, and silently run with
    // the wrong k.
    val k = exprs(1).eval() match {
      case i: Int => i
      case l: Long if l >= 1L && l <= (1L << 20) => l.toInt
      case l: Long => fail(s"k out of range: $l (must be in [1, 2^20])")
      case other => fail(s"k must be integral, got $other")
    }
    KmvSketch(exprs.head, k)
  }
}
