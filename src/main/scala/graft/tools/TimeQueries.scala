package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev timing harness: run named registry queries against an SF dir and
  * print per-query wall time — for queries outside the stable Bench
  * headline set. Usage:
  *   tools/run.sh graft.tools.TimeQueries <sfDir> <query> [query ...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val t0 = System.nanoTime()
      // noop write, not count(): count() lets Catalyst prune projections,
      // so a throwing or regressed projection would be invisible to the
      // very instrument used to adjudicate regressions (same class of fix
      // as the QueriesSpec smoke).
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      graft.analytics.Caches.clear()
      println(f"$q%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    spark.stop()
  }
}
