package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Pins the Jaro-Winkler expression to the engine-portable reference
  * semantics the oracle (DuckDB `jaro_winkler_similarity`) implements —
  * each convention below was probed against DuckDB directly, and
  * er_jaro_blocked's oracle row re-checks them on every candidate pair
  * at every verify run. */
class StringSimilaritySpec extends SparkSuite {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(a, b)

  test("textbook record-linkage values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
  }

  test("boost applies only above jaro 0.7, prefix capped at 4") {
    // jaro = 0.5556 with a 2-char common prefix: NO boost below 0.7
    assert(math.abs(jw("abcdef", "abzzzz") - 0.5555555555555555) < 1e-12)
    // jaro > 0.7 with no common prefix: boost is a no-op
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-12)
    // 4+ shared prefix chars: l caps at 4
    assert(math.abs(jw("aaaa", "aaaaaaaaaaaa") - 0.8666666666666666)
      < 1e-12)
  }

  test("rapidfuzz edge conventions: empties are 0, a 0-width window " +
    "matches nothing") {
    assert(jw("", "") === 0.0)
    assert(jw("", "a") === 0.0)
    assert(jw("a", "a") === 1.0)
    // window = max(2,2)/2 - 1 = 0: adjacent transposition can't match
    assert(jw("ab", "ba") === 0.0)
  }

  test("expression evaluates identically under codegen and matches the " +
    "Scala reference") {
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("DIXON", "DICKSONX"),
      ("ab", "ba"), ("", "x"), ("same", "same"),
      ("linen powder blush", "linen powdr blush"))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), JaroWinkler(col("a"), col("b")).as("jw"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) === jw(r.getString(0), r.getString(1)))
    }
  }

  test("SQL registration: jaro_winkler(a, b) is callable from spark.sql") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS s").collect().head
    assert(math.abs(v.getDouble(0) - 0.9611111111111111) < 1e-12)
  }

  test("jaroMatch recovers planted single-deletion typos through the " +
    "blocked candidate set") {
    val part = graft.Tables.load(spark, sf0001, "part")
    val dirty = part.select(col("p_partkey"), expr(
      "concat(substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))," +
        " substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2," +
        " 200))").as("dname"))
    val m = graft.analytics.Entity.jaroMatch(dirty, col("p_partkey"),
      col("dname"), part, col("p_name"))
    val joined = m.join(part, m("id") === part("p_partkey"))
    val total = part.count()
    val matched = m.count()
    val correct = joined
      .filter(col("matched_name") === col("p_name")).count()
    // the 0.93 jw floor prunes deletions in SHORT names (a 1-char hit on
    // a 20-char name costs more than on a 35-char one) — deterministic,
    // threshold-driven recall, same trade the Levenshtein variant pins
    assert(correct >= (total * 78 / 100),
      s"only $correct/$total planted typos recovered")
    assert(correct >= (matched * 90 / 100),
      s"precision $correct/$matched below 90%")
    // scores are 6-rounded and above the threshold by construction
    assert(m.filter(col("jw") < 0.93).count() === 0)
  }
}
