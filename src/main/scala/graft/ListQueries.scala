package graft

/** Dev tool: print every registered query name, one per line — the
  * registry enumeration tools/capture_plans.sh and sweep scripts key
  * on. No Spark session: the registry is pure construction.
  */
object ListQueries {
  def main(args: Array[String]): Unit =
    SparkEntry.registry.map(_.name).sorted.foreach(println)
}
