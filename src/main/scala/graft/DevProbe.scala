package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe main for scale investigations (not part of the driver
  * contract; queries stay the source of truth).
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale1000e")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = graft.queries.SimilarityQueries.semanticDedup.run(spark, dir)
    val n = df.count()
    println(s"[devprobe] rows=$n secs=${(System.nanoTime() - t0) / 1e9}")
    val t1 = System.nanoTime()
    val dropped = df.where("keep = 0").count()
    println(s"[devprobe] dropped=$dropped secs2=${(System.nanoTime() - t1) / 1e9}")
    spark.stop()
  }
}
