package graft.analytics

import graft.SparkSuite
import org.apache.spark.sql.functions._

class EntitySpec extends SparkSuite {
  import spark.implicits._

  private def matchAll(dirty: Seq[(Long, String)], cat: Seq[String],
                       maxDist: Int = 2, maxDf: Int = 32) =
    Entity.fuzzyMatch(dirty.toDF("id", "n"), col("id"), col("n"),
      cat.toDF("name"), col("name"), maxDist, maxDf)
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3)))
      .toMap

  test("fuzzyMatch verifies with exact levenshtein inside the token " +
    "block and keeps the best (min dist, min name) match") {
    val cat = Seq("small ring", "small wing", "large ring")
    // one substitution from BOTH 'small ring' and 'small wing' (shared
    // token 'small') -> dist 1 ties -> lexicographically smaller name
    val r = matchAll(Seq((1L, "small sing"), (2L, "large rinng"),
      (3L, "small ring")), cat)
    assert(r(1L) == ("small ring", 1L), s"tie must break on name: $r")
    assert(r(2L) == ("large ring", 1L), s"insertion typo: $r")
    assert(r(3L) == ("small ring", 0L), s"exact match at dist 0: $r")
  }

  test("fuzzyMatch blocking is honest: no shared token means no match " +
    "even when the edit distance is within budget") {
    // 'smallring' is dist 1 from 'small ring' but shares NO whitespace
    // token with it -> blocked out, the documented recall trade-off
    val r = matchAll(Seq((1L, "smallring")), Seq("small ring"))
    assert(r.isEmpty, s"space-deletion must stay unmatched: $r")
  }

  test("fuzzyMatch drops stop tokens past the df cap: a token shared " +
    "by every catalog row blocks nothing") {
    val cat = Seq("acme bolt", "acme gear", "acme ring")
    // a typo in the hot token still matches through the intact rare
    // token 'bolt' (df 1) even though 'acme' (df 3) is capped out; a
    // dirty row whose only INTACT token is the hot one finds no
    // candidates (blocking needs one uncorrupted sub-cap token)
    val r = matchAll(Seq((1L, "acmee bolt"), (2L, "acme xyzzy")), cat,
      maxDist = 2, maxDf = 2)
    assert(r(1L) == ("acme bolt", 1L), s"rare-token block must match: $r")
    assert(!r.contains(2L), s"hot-token-only row must stay unmatched: $r")
  }

  test("fuzzyMatch length filter prunes before verify: candidates " +
    "beyond maxDist in pure length never match") {
    val r = matchAll(Seq((1L, "ring")), Seq("ring around the rosie"))
    assert(r.isEmpty, "17-char length gap cannot be within 2 edits")
  }

  test("planted-typo fixture: >=85% of rows match and >=90% of matches " +
    "recover the true name (old/cold-style collisions are the rest — " +
    "measured .948 at sf0.001, .982 at sf0.01)") {
    val part = graft.Tables.load(spark, sf0001, "part")
    val dirty = part.select(col("p_partkey"), expr(
      "concat(substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))," +
        " substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2," +
        " 200))").as("dname"))
    val m = Entity.fuzzyMatch(dirty, col("p_partkey"), col("dname"),
      part, col("p_name"))
    val total = part.count()
    val joined = m.join(part, m("id") === part("p_partkey"))
      .select((col("matched_name") === col("p_name")).as("ok"))
      .collect()
    val matched = joined.length.toDouble
    val correct = joined.count(_.getBoolean(0)).toDouble
    assert(matched / total >= 0.85,
      s"matched ${matched / total} of $total — blocking recall regressed")
    assert(correct / matched >= 0.90,
      s"recovery accuracy ${correct / matched} regressed")
  }
}
