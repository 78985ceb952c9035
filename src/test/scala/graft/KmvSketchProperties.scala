package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.LongType
import org.scalacheck.{Gen, Prop, Properties}

import graft.functions.KmvSketch

/** ScalaCheck properties for the KMV aggregate's buffer algebra, driven
  * through the real TypedImperativeAggregate surface (update / serialize
  * / deserialize / merge / eval) exactly as an exchange would drive it.
  * The k sweep covers the boundaries the gate's fixed k=64 never
  * exercises: k=1 (the `add` fast path where buf.last IS the only
  * element), k=2, the 63/64 straddle, and a k far above any input size.
  */
object KmvSketchProperties extends Properties("KmvSketch") {

  /** Feed `parts` as independent partials (with a serde round-trip on
    * each, like a real shuffle), merge, and evaluate.
    */
  private def sketch(k: Int, parts: Seq[Seq[Long]]): Seq[Long] = {
    val agg = KmvSketch(BoundReference(0, LongType, nullable = true), k)
    val bufs = parts.map { p =>
      val b = agg.createAggregationBuffer()
      p.foreach(v => agg.update(b, new GenericInternalRow(Array[Any](v))))
      agg.deserialize(agg.serialize(b))
    }
    val merged = bufs.foldLeft(agg.createAggregationBuffer())(agg.merge)
    agg.eval(merged).asInstanceOf[ArrayData].toLongArray().toSeq
  }

  private val ks = Seq(1, 2, 63, 64, 1024)

  // heavy duplicates (tiny domain), full-range values, and the signed
  // extremes — duplicates OF the current maximum are the adversarial
  // case for the `add` replace path (add must not evict on a non-insert)
  private val valsGen: Gen[List[Long]] = Gen.listOf(Gen.frequency(
    4 -> Gen.chooseNum(-5L, 5L),
    2 -> Gen.chooseNum(Long.MinValue, Long.MaxValue),
    1 -> Gen.const(Long.MaxValue),
    1 -> Gen.const(Long.MinValue)))

  property("= k smallest distinct values, any k, any partitioning, with serde") =
    Prop.forAll(valsGen, Gen.chooseNum(1, 7)) { (vals, nParts) =>
      val parts =
        if (vals.isEmpty) Seq(Seq.empty[Long])
        else vals.zipWithIndex.groupBy(_._2 % nParts)
          .values.map(_.map(_._1)).toSeq
      ks.forall(k => sketch(k, parts) == vals.distinct.sorted.take(k))
    }

  property("n <= k is exact: the sketch IS the distinct set") =
    Prop.forAll(Gen.listOfN(40, Gen.chooseNum(-100L, 100L))) { vals =>
      // 40 draws from a 201-value domain: distinct count <= 40 < 63
      ks.filter(_ >= 63).forall(k =>
        sketch(k, Seq(vals)) == vals.distinct.sorted)
    }

  property("merge is order-insensitive and idempotent on overlap") =
    Prop.forAll(valsGen, valsGen) { (a, b) =>
      ks.forall { k =>
        sketch(k, Seq(a, b)) == sketch(k, Seq(b, a)) &&
        sketch(k, Seq(a, b, a)) == sketch(k, Seq(a, b))
      }
    }

  property("estimator error bound over a uniform 60-bit hash space (k=64)") = {
    // deterministic: n distinct values through the splitmix64 finalizer,
    // masked to 60 bits — the estimator (k-1)*2^60/m_k must land within
    // 4/sqrt(k-2) relative error (~4 sigma for KMV)
    def splitmix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      (x ^ (x >>> 31)) & ((1L << 60) - 1)
    }
    Prop.forAll(Gen.chooseNum(10000, 200000), Gen.chooseNum(1L, 1000L)) {
      (n, seed) =>
        val k = 64
        val hashes = (0 until n).map(i => splitmix(seed * 1000003L + i))
        val mk = sketch(k, Seq(hashes)).last
        val est = (k - 1).toDouble * math.pow(2, 60) / mk.toDouble
        val err = math.abs(est - n) / n
        err < 4.0 / math.sqrt(k - 2.0)
    }
  }
}
