package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components over a pair graph — turns near-duplicate PAIRS
  * (the output of LSH/Jaccard detection, reference analogue: the
  * `getFlags` duplicate scan in sql.py) into duplicate CLUSTERS, the
  * form a training-data pipeline actually consumes ("keep one doc per
  * component").
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with itself; each round a node takes the min of its
  * own, its neighbors', and its label's label (path halving). The
  * neighbor step alone needs O(diameter) rounds; the label-of-label
  * shortcut makes it O(log n), so a 25-round cap covers any realistic
  * graph (dup clusters are near-cliques; even a pathological chain of
  * millions converges in ~21 rounds).
  *
  * Scale shape per round: one shuffle on `dst` (neighbor labels), one
  * map-side-combinable min-agg on the node key, one self-join on the
  * label key — no global operation, no driver-side data. Each round's
  * result is `localCheckpoint`ed to truncate lineage (without it the
  * logical plan grows per iteration and Catalyst re-analysis dominates);
  * on a fault-tolerant cluster run, swap for reliable `checkpoint` with
  * a checkpoint dir. Convergence is detected with sum(label), which
  * decreases monotonically under min-propagation, so one scalar agg per
  * round instead of a changed-rows join.
  */
object DedupClusters {

  /** edges: two BIGINT columns (src, dst), undirected (either
    * orientation). Returns (node, component) for every node incident to
    * an edge, component = min node id in its connected component.
    */
  def connectedComponents(edges: DataFrame, maxIters: Int = 25): DataFrame = {
    val Seq(srcC, dstC) = edges.columns.toSeq.take(2)
    val e = edges.select(col(srcC).as("src"), col(dstC).as("dst"))
    val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    // convergence metric: Σlabel in decimal(38,0) — 60-bit ids × 10^9
    // nodes stays far under 38 digits, where a Long sum would overflow
    // (and throw under ANSI mode) after a handful of hash-derived ids
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val v = df.agg(sum(col("label").cast(DecimalType(38, 0)))).head.get(0)
      if (v == null) java.math.BigDecimal.ZERO
      else v.asInstanceOf[java.math.BigDecimal]
    }
    var prevSum = labelSum(labels)
    var converged = prevSum.signum == 0 && labels.isEmpty
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = sym
        .join(labels, sym("dst") === labels("node"))
        .groupBy(col("src").as("n2"))
        .agg(min("label").as("nlabel"))
      // materialized: stepped sits on both sides of the pointer-jump
      // self-join below — without this the neighbor join runs twice per
      // round (same recompute pattern as the minhash band table)
      val stepped = labels
        .join(neighborMin, col("node") === col("n2"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("label"))
        .localCheckpoint()
      // pointer jumping: follow my label to ITS label (labels only ever
      // shrink, so the looked-up label is ≤ mine) — turns O(diameter)
      // propagation into O(log n)
      val jumped = stepped
        .join(stepped.select(col("node").as("ln"), col("label").as("llabel")),
          col("label") === col("ln"), "left")
        .select(col("node"),
          coalesce(col("llabel"), col("label")).as("label"))
        .localCheckpoint()
      val nextSum = labelSum(jumped)
      // labelSum materialized jumped's checkpoint, so the previous
      // round's labels and this round's stepped are now dead weight —
      // release them HERE rather than letting checkpoints accumulate
      // one per round until the harness sweep. (Checkpoint blocks are
      // RDD-level: Dataset.unpersist would be a no-op.)
      dropCheckpoint(labels)
      dropCheckpoint(stepped)
      labels = jumped
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    sym.unpersist(blocking = false)
    // the FINAL labels stay cached for the consumer's action; scope
    // them so the runner's post-query release reclaims the blocks
    graft.CacheScope.register(labels)
    require(converged || iter < maxIters,
      s"connected components did not converge within $maxIters rounds — " +
        "partial labels would split duplicate clusters; raise maxIters")
    labels.withColumnRenamed("label", "component")
  }

  /** Unpersist the checkpoint RDD under a localCheckpoint'ed dataset
    * (its data is already consumed by the next round's checkpoint).
    */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.foreach(_.unpersist(blocking = false))
}
