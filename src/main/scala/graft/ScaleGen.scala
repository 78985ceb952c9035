package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-sweep data generator: manufactures an N× copy of an sf
  * directory by unioning key-shifted copies of the volume tables, so
  * the heavy queries can be swept one decade PAST the driver's largest
  * SF (the r3 sweep practice that caught a real INT64 overflow).
  *
  * Shape choices, per table:
  *  - events: event_id shifted per copy; user_id KEPT — per-key
  *    histories grow ×N, stressing exactly the sequential folds and
  *    windows whose scale story is per-key.
  *  - documents: doc_id shifted; every TOKEN is suffixed with a
  *    per-copy marker (w → w_zcN), so the token count and the whole
  *    shingle structure map 1:1 onto the original (intra-copy near-dup
  *    pairs are exactly the original pairs) while cross-copy shingles
  *    are disjoint — corpus and candidate pairs both scale ×N.
  *    (Inserting marker TOKENS instead would halve every shingle's
  *    information to word pairs/singletons and explode similarity;
  *    identical copies would make each dup pair an N-clique: O(N²)
  *    candidates by construction. Both are workload changes, not
  *    scale-ups.)
  *  - lineitem/orders: orderkey shifted per copy — the UTXO linkage
  *    (okey-1) and the order⋈lineitem joins stay internally consistent
  *    within each copy.
  *  - dimensions (region..part, embeddings): copied once, as at any
  *    real scale-up.
  *
  * Usage: runMain graft.ScaleGen SRC_DIR DEST_DIR FACTOR
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(src, dest, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftConf(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Shift = 1000000000000L // key offset per copy, far above any id

    def copies(df: DataFrame)(shifted: (DataFrame, Long) => DataFrame): DataFrame =
      (0 until factor).map(i => shifted(df, i.toLong)).reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$dest/$name.parquet").count()} rows")
    }

    // events: ts arrives as nanos-long (Tables.t handles both); write a
    // real micros timestamp so DuckDB reads the generated file directly
    val ev = Tables.t(spark, src, "events")
    write(copies(ev) { (df, i) =>
      df.select((col("event_id") + lit(i * Shift)).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value"),
        col("props"))
    }, "events")

    val docs = Tables.t(spark, src, "documents")
    write(copies(docs) { (df, i) =>
      df.select((Seq(
        (col("doc_id") + lit(i * Shift)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1zc$i").as("text")) ++
        df.columns.filterNot(Set("doc_id", "text")).map(col)): _*)
    }, "documents")

    Seq("lineitem" -> "l_orderkey", "orders" -> "o_orderkey").foreach {
      case (name, key) =>
        val df = Tables.t(spark, src, name)
        write(copies(df) { (d, i) =>
          d.withColumn(key, col(key) + lit(i * Shift))
        }, name)
    }

    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => write(Tables.t(spark, src, n), n))

    // embeddings is a dimension at gate scales (copied once, like any
    // real scale-up of a fixed query/codebook set) — but the ANN-family
    // 1000× probes need the CORPUS to scale. Opt-in: vec_id shifted per
    // copy so the fixed query set (vec_id < 8, copy 0 only) ranks an
    // N× candidate set; vectors are kept identical (copies land in the
    // same LSH/IVF buckets — the worst case for bucket fan-out, which
    // is exactly what the probe should stress) and ties break on cid.
    val emb = Tables.t(spark, src, "embeddings")
    write(
      if (sys.env.get("SPARK_GRAFT_SCALE_EMBEDDINGS").contains("1"))
        copies(emb)((d, i) =>
          d.withColumn("vec_id", col("vec_id") + lit(i * Shift)))
      else emb,
      "embeddings")

    spark.stop()
  }
}
