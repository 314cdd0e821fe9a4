package graft

import org.apache.spark.sql.functions._


/** Bucketing: the co-located-join strategy for keys joined repeatedly at
  * scale — both sides pre-hashed into the same bucket layout join with NO
  * exchange at all (SURVEY §4 / brief: "bucketing for co-located joins"). */
class BucketingSpec extends SparkSuite {

  test("bucketed fact and dim join without any shuffle exchange") {
    // disable broadcast so the join strategy (not the data size) is tested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // default spark-warehouse dir; clear any leftovers from aborted runs
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(s"spark-warehouse/$t")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val li = Tables.load(spark, sf0001, "lineitem")
    val o = Tables.load(spark, sf0001, "orders")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(round(sum(col("l_quantity")), 2).as("qty"))
    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not reshuffle either side
    val joinSection = plan.substring(0, plan.length)
    assert(joinSection.contains("SortMergeJoin") ||
      joinSection.contains("ShuffledHashJoin"), plan)
    val exchangesBeforeAgg = "Exchange hashpartitioning\\(l_orderkey".r
      .findAllIn(plan).length +
      "Exchange hashpartitioning\\(o_orderkey".r.findAllIn(plan).length
    assert(exchangesBeforeAgg == 0,
      s"bucketed join should not exchange on the join keys\n$plan")
    // and the result is correct
    assert(joined.collect().length >= 1)
    spark.sql("DROP TABLE li_b"); spark.sql("DROP TABLE o_b")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
