package graft

/** Smoke: every registered query runs at sf0.001; every oracle key has a
  * query; flagship entry returns rows. */
class QueriesSpec extends SparkSuite {

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.count() >= 0)
    }
  }
}
