package graft.operators

/** Lazily split a KEY-SORTED iterator into (key, run) pairs — the
  * secondary-sort idiom: `repartition(key) + sortWithinPartitions(key,
  * order) + mapPartitions(new GroupRuns(_))` folds each key's run
  * without materializing it, so one pathological key costs O(fold
  * state), not O(group), of task memory (contrast `groupByKey.mapGroups
  * + it.toSeq.sortBy`, which buffers and copies the whole group).
  *
  * Contract: each run must be exhausted before `next()` is called
  * again (true for any single-pass fold); runs are non-empty.
  */
final class GroupRuns[K, V](underlying: Iterator[(K, V)])
    extends Iterator[(K, Iterator[V])] {
  private val it = underlying.buffered

  override def hasNext: Boolean = it.hasNext

  override def next(): (K, Iterator[V]) = {
    val k = it.head._1
    val run = new Iterator[V] {
      override def hasNext: Boolean = it.hasNext && it.head._1 == k
      override def next(): V = it.next()._2
    }
    (k, run)
  }
}
