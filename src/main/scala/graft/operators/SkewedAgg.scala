package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-stage aggregation for skewed keys.
  *
  * A groupBy on a low-cardinality/skewed key sends each key's entire
  * volume to one reducer. Salting splits every key into `buckets`
  * sub-keys for a map-side-combinable partial aggregate, then reduces
  * the tiny partial set to finals — the classic 100-TB skew pattern.
  * The salt derives from a unique column (never rand()): deterministic
  * → retry-safe, reorg-safe, and identical across engines.
  */
object SkewedAgg {

  def saltedSum(df: DataFrame, key: Column, unique: Column,
      value: Column, buckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(hash(unique), lit(buckets)))
      .groupBy(key.as("key"), col("_salt"))
      .agg(sum(value).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col("key"))
      .agg(sum(col("_partial")).as("total"), sum(col("_n")).as("n"))
}
