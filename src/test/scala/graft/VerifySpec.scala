package graft

import java.nio.file.Files

/** Pins the round-8 lesson: a query that throws during the correctness
  * dump must leave a loud footprint, never vanish. `Verify.dump` writes a
  * one-row `__verify_error` marker parquet in the failed query's slot (the
  * driver's DuckDB compare then records a schema/hash mismatch carrying
  * the message) and returns the failed names for main's non-zero exit. */
class VerifySpec extends SparkSuite {

  test("a throwing query yields an error-marker parquet + a failed name; " +
    "healthy queries around it still dump") {
    val out = Files.createTempDirectory("verify_spec").toString
    val failed = Verify.dump(spark, sf0001, out, Map(
      "ok_query" -> ((s, d) => Tables.load(s, d, "region")),
      "boom_query" -> ((_, _) =>
        throw new IllegalStateException("synthetic failure")),
      "ok_query2" -> ((s, d) => Tables.load(s, d, "nation"))))
    assert(failed == Seq("boom_query"), s"failed list: $failed")
    // healthy results landed
    assert(spark.read.parquet(s"$out/ok_query").count() > 0)
    assert(spark.read.parquet(s"$out/ok_query2").count() > 0)
    // the failed slot exists, is schema-marked, and carries the message
    val marker = spark.read.parquet(s"$out/boom_query")
    assert(marker.columns.toSeq == Seq("__verify_error"), marker.schema)
    val msg = marker.collect().map(_.getString(0)).mkString
    assert(msg.contains("IllegalStateException") &&
      msg.contains("synthetic failure"), msg)
  }

  test("dynamic oracles materialize after the producing query runs " +
    "(Verify's run-then-dump ordering): quality_lr_refresh's oracle " +
    "carries the fitted coefficients as double literals") {
    // run the producing query the way Verify.dump would
    graft.queries.ContentQueries.queries("quality_lr_refresh")(
      spark, sf0001).collect()
    val o = SparkEntry.oracleSql
    assert(o.contains("quality_lr_refresh"),
      "dynamic oracle missing after the query ran")
    val sql = o("quality_lr_refresh")
    // literal coefficients, not placeholders: at least two distinct
    // double literals and the keep threshold comparison
    assert(sql.contains("round(") && sql.contains(">=") &&
      "[-0-9]\\d*\\.\\d+".r.findAllIn(sql).size >= 3, sql)
  }
}
