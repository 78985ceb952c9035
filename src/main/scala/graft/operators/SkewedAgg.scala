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

  /** Salted shuffle join for a skewed fact key: the fact side splits
    * each key across `buckets` sub-partitions (salt from a unique
    * column — deterministic, never rand()), the other side replicates
    * once per bucket, and the equi-join runs on (key, salt). A hot key
    * that would pin one reducer at 100 TB spreads over `buckets` tasks;
    * result is row-identical to the unsalted join. This is the manual
    * form of what AQE skew-join does for sort-merge plans — needed when
    * the skewed side feeds a join AQE can't split (e.g. bucketed tables
    * or a stateful downstream that pins partitioning).
    *
    * `right` is scanned once and exploded `buckets`× — it must be the
    * SMALL side (dimension-sized but above broadcast threshold; if it
    * fits a broadcast, broadcast instead and skew is moot).
    */
  def saltedJoin(fact: DataFrame, factKey: Column, unique: Column,
      right: DataFrame, rightKey: Column, buckets: Int = 16): DataFrame = {
    val salted = fact.withColumn("_salt", pmod(hash(unique), lit(buckets)))
    val replicated = right
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated,
      factKey === rightKey && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
