package graft.analytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BpeScaleExp {
  def main(args: Array[String]): Unit = {
    val merges = if (args.nonEmpty) args(0).toInt else 1000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val t0 = System.nanoTime()
    val (df, rounds) = TextAnalysis.bpeTrainBatchedWithRounds(docs, col("text"), merges)
    val n = df.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"merges=$n rounds=$rounds sec=$sec%.1f width=${n.toDouble / rounds}%.1f")
    spark.stop()
  }
}
