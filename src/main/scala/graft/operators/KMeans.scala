package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic Lloyd k-means over integer-quantized embeddings — the
  * trainer for an IVF coarse quantizer (the scale path for similarity
  * search; cf. the reference's ANN surface, /root/reference README
  * "similarity" ops, and SURVEY.md §2's LLM-pipeline extensions).
  *
  * Determinism contract (what makes the DuckDB oracle byte-exact):
  *  - init: centroid c := quantized embedding of vec_id c, c < k;
  *  - distance: d2 = ‖q‖² − 2·q·c + ‖c‖², all exact BIGINT math on
  *    micro-unit vectors (magnitudes ≪ 2^53);
  *  - argmin ties break on the smaller centroid id;
  *  - update: element-wise floor(sum/count) — the one double division
  *    is identical IEEE math on identical integer inputs in any engine.
  *
  * Scale shape: ASSIGNMENT IS ZERO-SHUFFLE. Centroids travel as a
  * literal array column (k·dim longs), so assigning 100 TB of vectors
  * is a map-side projection inside whole-stage codegen — argmin is
  * `array_min` over (d2, cid) structs, no join, no exchange. Only the
  * update step aggregates: k·dim grouped sums with map-side partial
  * aggregation. Per-iteration centroids are collected to the driver —
  * k·dim values, the same thing Spark MLlib's KMeans does, NOT data.
  */
object KMeans {

  final case class Centroid(cid: Long, c: Array[Long], nc: Long)

  private def dot(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var s = 0L
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Centroid set as a literal array<struct<cid,c,nc>> column. */
  def centroidArray(cents: Seq[Centroid]): Column =
    array(cents.sortBy(_.cid).map { ct =>
      struct(lit(ct.cid).as("cid"), typedLit(ct.c.toSeq).as("c"),
        lit(ct.nc).as("nc"))
    }: _*)

  /** Per-vector struct array of (d2, cid) against every centroid —
    * shared by assignment (array_min) and IVF probing (sort+slice).
    * Requires `base` columns (q: array<bigint>, nq: bigint) and
    * graft_ldot registered (callers go through SimilarityQueries'
    * quantized(), which registers it).
    */
  def distances(cents: Seq[Centroid]): Column =
    transform(centroidArray(cents), s =>
      struct(
        (col("nq") - lit(2L) * call_function("graft_ldot", col("q"),
          s.getField("c")) + s.getField("nc")).as("d2"),
        s.getField("cid").as("cid")))

  /** Zero-shuffle assignment: (vec_id, q, nq) → + (cluster, d2). */
  def assign(base: DataFrame, cents: Seq[Centroid]): DataFrame =
    base.withColumn("m", array_min(distances(cents)))
      .select(col("vec_id"), col("q"), col("nq"),
        col("m.cid").as("cluster"), col("m.d2").as("d2"))

  /** Lloyd update: element-wise floor-mean per cluster. Shuffles only
    * (cluster, idx) partial sums; result is k rows, collected.
    */
  def update(assigned: DataFrame): Seq[Centroid] = {
    val rows = assigned
      .select(col("cluster"), posexplode(col("q")).as(Seq("idx", "v")))
      .groupBy("cluster", "idx")
      .agg(floor(sum("v") / count(lit(1))).cast(LongType).as("mv"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("idx"), col("mv")))),
        x => x.getField("mv")).as("c"))
      .collect()
    rows.map { r =>
      val c = r.getAs[Seq[Long]]("c").toArray
      Centroid(r.getAs[Long]("cluster"), c, dot(c, c))
    }
  }

  /** Centroids after `iters` assignment rounds (iters−1 updates):
    * iters=2 ≡ init → assign → update → (final assign by caller).
    */
  def centroids(base: DataFrame, k: Int, iters: Int): Seq[Centroid] = {
    var cs = base.where(col("vec_id") < k)
      .select(col("vec_id"), col("q")).collect()
      .map { r =>
        val c = r.getAs[Seq[Long]]("q").toArray
        Centroid(r.getAs[Long]("vec_id"), c, dot(c, c))
      }.toSeq
    (1 until iters).foreach(_ => cs = update(assign(base, cs)))
    cs
  }
}
