package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming KMV distinct sketch — the streaming counterpart of the
  * batch `graft_kmv` aggregate ([[graft.functions.KmvSketch]]): as
  * hashed values arrive per key, keep the k smallest DISTINCT ones in
  * `mapGroupsWithState` state and emit the refreshed sketch each
  * micro-batch.
  *
  * The state per key is a sorted ≤k-long array — BOUNDED by
  * construction, independent of stream volume, never evicted and never
  * needing a watermark: the sketch of an unbounded stream is still k
  * longs. Because the k minima are an order- and batch-independent set
  * function of the values seen, the final emitted sketch is EXACTLY
  * the batch aggregate over the same rows — which is what the
  * `streaming_kmv_equiv` gate pins against the batch oracle.
  */
object StreamingKmv {

  /** (key, nBatchesSeen, sketch) after each micro-batch touching key. */
  final case class KmvUpdate(key: String, n: Long, mins: Array[Long])

  def sketches(rows: Dataset[(String, Long)], k: Int): Dataset[KmvUpdate] = {
    implicit val enc = Encoders.product[KmvUpdate]
    rows
      .groupByKey(_._1)(Encoders.STRING)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long)], state: GroupState[KmvUpdate]) =>
          val set = new java.util.TreeSet[java.lang.Long]()
          var n = 0L
          if (state.exists) {
            n = state.get.n
            state.get.mins.foreach(v => set.add(v))
          }
          it.foreach { case (_, v) =>
            if (set.size < k) { set.add(v); () }
            else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
          }
          val out = new Array[Long](set.size)
          val sit = set.iterator()
          var i = 0
          while (sit.hasNext) { out(i) = sit.next(); i += 1 }
          val next = KmvUpdate(key, n + 1, out)
          state.update(next)
          next
      }
  }
}
