package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification risk profiling for training-data release — the
  * privacy gate a pipeline runs before user-derived records enter a
  * training corpus or leave the trust boundary:
  *
  *  - k-anonymity (Sweeney, IJUFKS 2002): a record is re-identifiable
  *    when its QUASI-IDENTIFIER combination (the attributes an attacker
  *    can link from outside — region, segment, coarse account bands) is
  *    shared by fewer than k records. The profile reports how much of
  *    the table sits in small equivalence classes.
  *  - l-diversity (Machanavajjhala et al., TKDD 2007): k alone is not
  *    enough — a class whose SENSITIVE attribute is constant leaks it
  *    to everyone who can place a record in the class (the homogeneity
  *    attack). Reported as the minimum distinct-sensitive count over
  *    classes.
  *
  * Everything here is hash-aggregate shaped: one groupBy on the QI
  * tuple (the only corpus-scale shuffle, partial-aggregatable), then
  * folds over the CLASS table, which is bounded by the QI domain, not
  * the row count — the profile of a 100 TB table is the same few
  * windowless aggregates. Risk fractions are integer micro-units
  * (`div`), the house oracle-portable discipline.
  */
object Privacy {

  /** Equivalence classes over the QI tuple: one row per class with
    * `k` = class size and `l` = distinct sensitive values in the class.
    * The exact `countDistinct` is the second (class-keyed) shuffle;
    * swap the sensitive column for an HLL sketch when the sensitive
    * domain per class is itself huge. */
  def equivalenceClasses(df: DataFrame, qis: Seq[(String, Column)],
                         sensitive: Column): DataFrame =
    df.groupBy(qis.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("k"),
        countDistinct(sensitive).cast("long").as("l"))

  /** One-row risk summary over the class table: class/row counts, the
    * worst class (`k_min`), rows in classes below the standard k=2/5/10
    * release thresholds, their micro-unit fractions, and the
    * l-diversity floor. `rows_k_lt2` counts the SINGLED-OUT records —
    * unique QI combinations, each one a direct re-identification. */
  def kAnonymityProfile(df: DataFrame, qis: Seq[(String, Column)],
                        sensitive: Column): DataFrame = {
    def below(t: Int) =
      sum(when(col("k") < t, col("k")).otherwise(lit(0L)))
    equivalenceClasses(df, qis, sensitive)
      .agg(count(lit(1)).cast("long").as("n_classes"),
        sum(col("k")).cast("long").as("n_rows"),
        min(col("k")).cast("long").as("k_min"),
        below(2).cast("long").as("rows_k_lt2"),
        below(5).cast("long").as("rows_k_lt5"),
        below(10).cast("long").as("rows_k_lt10"),
        min(col("l")).cast("long").as("l_min"))
      .select(col("n_classes"), col("n_rows"), col("k_min"),
        col("rows_k_lt2"), col("rows_k_lt5"), col("rows_k_lt10"),
        expr("(rows_k_lt2 * 1000000L) div n_rows").as("risk_lt2_micro"),
        expr("(rows_k_lt10 * 1000000L) div n_rows").as("risk_lt10_micro"),
        col("l_min"))
  }

  /** Class-size histogram: how many equivalence classes exist at each
    * size k — the anonymity-set distribution whose left tail is the
    * risk mass. Bounded by the distinct class sizes, never the rows. */
  def classSizeHistogram(df: DataFrame, qis: Seq[(String, Column)],
                         sensitive: Column): DataFrame =
    equivalenceClasses(df, qis, sensitive)
      .groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("n_classes"),
        min(col("l")).cast("long").as("l_min"))

  /** t-closeness per equivalence class (Li, Li & Venkatasubramanian,
    * ICDE 2007) with the categorical (total-variation) distance: a
    * class leaks when its sensitive-value distribution sits far from
    * the GLOBAL one — l-diversity counts values, t-closeness compares
    * shapes (a class that over-represents one diagnosis fails even
    * with all values present). Per class: tv = ½·Σ_v |c_v/k − g_v/N|
    * over the global sensitive domain (absent values contribute their
    * global mass), compared 6-rounded against `t`. Scale: one
    * (QI, sensitive) aggregate, one |domain|-row global table
    * broadcast, class-keyed folds — the k-anon shape plus a broadcast.
    */
  def tCloseness(df: DataFrame, qis: Seq[(String, Column)],
                 sensitive: Column, t: Double): DataFrame = {
    val qiCols = qis.map { case (n, _) => col(n) }
    val cells = df
      .groupBy(qis.map { case (n, c) => c.as(n) } :+
        sensitive.as("sv"): _*)
      .agg(count(lit(1)).as("c"))
    val global = cells.groupBy(col("sv"))
      .agg(sum(col("c")).cast("long").as("g"))
    val nAll = global.agg(sum(col("g")).cast("long").as("n_all"))
    // dense (class × domain) grid so absent values contribute |0 - g/N|
    val classes = cells.groupBy(qiCols: _*)
      .agg(sum(col("c")).cast("long").as("k"))
    val grid = classes.crossJoin(broadcast(global))
      .join(cells, qis.map(_._1) :+ "sv", "left")
      .na.fill(0L, Seq("c"))
    grid.crossJoin(broadcast(nAll))
      .groupBy(qiCols :+ col("k"): _*)
      .agg((sum(abs(col("c").cast("double") / col("k").cast("double") -
        col("g").cast("double") / col("n_all").cast("double"))) / 2.0)
        .as("tv"))
      .select(qiCols :+ col("k") :+ round(col("tv"), 6).as("tv_dist") :+
        when(round(col("tv"), 6) <= lit(t), lit(1L)).otherwise(lit(0L))
          .as("meets_t"): _*)
  }

  /** Entropy l-diversity per equivalence class (Machanavajjhala 2007
    * §3): distinct-l says a class has l sensitive values, entropy-l
    * says none of them DOMINATES — a class that is 98% one diagnosis
    * and 2% another passes distinct-2 but fails entropy-2. Per class:
    * H = ln k − (Σ c·ln c)/k over the sensitive value counts c, and
    * the class meets entropy-l iff H ≥ ln l. Both sides of that
    * comparison are 6-rounded so the oracle's flag agrees exactly.
    * Scale: one (QI, sensitive) aggregate over the corpus, then
    * class-keyed folds — the same two-shuffle shape as
    * equivalenceClasses. */
  def entropyLDiversity(df: DataFrame, qis: Seq[(String, Column)],
                        sensitive: Column, l: Int): DataFrame = {
    val qiCols = qis.map { case (n, _) => col(n) }
    val cells = df
      .groupBy(qis.map { case (n, c) => c.as(n) } :+
        sensitive.as("sv"): _*)
      .agg(count(lit(1)).as("c"))
    val lnL = math.log(l.toDouble)
    cells.groupBy(qiCols: _*)
      .agg(sum(col("c")).cast("long").as("k"),
        count(lit(1)).cast("long").as("l_distinct"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("clnc"))
      .select(qiCols :+ col("k") :+ col("l_distinct") :+
        round(log(col("k").cast("double")) -
          col("clnc") / col("k").cast("double"), 6).as("entropy") :+
        when(round(log(col("k").cast("double")) -
            col("clnc") / col("k").cast("double"), 6) >=
            lit(BigDecimal(lnL).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble), lit(1L))
          .otherwise(lit(0L)).as(s"meets_entropy_$l"): _*)
  }

  /** Randomized-response frequency release (Warner, JASA 1965; the
    * RAPPOR-style local-DP telemetry mechanism): each record reports its
    * TRUE category with probability p = num/den, otherwise a uniformly
    * drawn category (true one included) — so no single report reveals
    * anything, yet the aggregate debiases exactly:
    * `E[c_j] = N·(p·π_j + (1−p)/k)  ⇒  π̂_j = (c_j/N − (1−p)/k)/p`.
    *
    * The "coin flips" are salted md5 buckets of `id` — deterministic, so
    * the release is replayable and the oracle can re-derive every report
    * (the engine contract is the MECHANISM + the exact-rational debias;
    * production swaps the salt per release). The category dictionary is
    * the ordered distinct category set, indexed 0..k−1; the uniform
    * branch reports index `h₂ mod k`. Satisfies ε-local-DP with
    * ε = ln((p + (1−p)/k)/((1−p)/k)).
    *
    * Everything integer: p is the single constant pair `RrNum/RrDen`
    * (= 3/4), threaded through BOTH the coin threshold and the debias
    * so they cannot drift apart; the debiased estimate in micros is
    * `(1e6·(den·k·c_j − (den−num)·N)) div (num·k·N)` — exact floor
    * arithmetic both engines replay bit-identically (with 3/4 this is
    * the oracle's `(4·k·c_j − N) // (3·k·N)` form exactly). Scale: one
    * category aggregate over
    * the corpus (category-keyed, partial-aggregatable) + a broadcast of
    * the category dictionary (|categories| rows); the dictionary
    * row_number window runs on that tiny frame, never the corpus.
    *
    * Output: one row per category — true count, reported count, true and
    * debiased frequency in micros, and the absolute debias error. */
  // p = RrNum/RrDen — the ONE place the truth probability lives; the
  // coin threshold (100·num/den over a mod-100 bucket) and the debias
  // rational are both derived from it below
  private val RrNum = 3L
  private val RrDen = 4L

  def randomizedResponse(df: DataFrame, id: Column, category: Column,
                         salt: String = "rr"): DataFrame = {
    require(100L * RrNum % RrDen == 0,
      "RrNum/RrDen must yield an exact percent for the mod-100 coin")
    val coinThreshold = 100L * RrNum / RrDen
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(id.cast("string").as("id"),
      category.cast("string").as("cat"))
    // ONE category-keyed aggregate yields the dictionary, k, N, and the
    // true counts together (|categories| rows — a model-scale driver
    // fold, the centroid-collect discipline); the corpus is then
    // scanned exactly once more for the report pass — no separate
    // distinct job, no separate count() job
    val truthRows = base.groupBy(col("cat"))
      .agg(count(lit(1)).cast("long").as("c_true"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val k = truthRows.length.toLong
    require(k >= 1, "randomizedResponse needs a non-empty category domain")
    val n = truthRows.map(_._2).sum
    val cats = truthRows.zipWithIndex
      .map { case ((c, t), i) => (c, i.toLong, t) }
      .toSeq.toDF("cat", "idx", "c_true")
    def bucket(s: String, mod: Long): Column =
      pmod(conv(substring(md5(concat(lit(s + ":"), col("id"))), 1, 15),
        16, 10).cast("long"), lit(mod))
    val reported = base
      .join(broadcast(cats.select(col("cat"), col("idx"))), Seq("cat"))
      .withColumn("rep_idx",
        when(bucket(salt + "1", 100L) < lit(coinThreshold), col("idx"))
          .otherwise(bucket(salt + "2", k)))
      .groupBy(col("rep_idx")).agg(count(lit(1)).cast("long").as("c_rep"))
    cats
      .join(reported.withColumnRenamed("rep_idx", "idx"), Seq("idx"), "left")
      .select(col("cat"),
        coalesce(col("c_true"), lit(0L)).as("n_true"),
        coalesce(col("c_rep"), lit(0L)).as("n_reported"),
        expr(s"(coalesce(c_true, 0L) * 1000000L) div ${n}L")
          .as("true_micro"),
        // clamp the debiased numerator at 0 (an RR estimate below zero is
        // truncated, standard practice) — non-negative operands, where
        // Spark `div` and DuckDB `//` agree exactly. The whole debias
        // runs in decimal(38,0): 1e6·4·k·c_rep would blow int64 at
        // k·N > ~2.3e12 (a day of telemetry at k=1000), and Spark would
        // wrap where DuckDB throws — the decimal form is exact to 1e38
        // (the q67 overflow discipline), mirrored as HUGEINT in the
        // oracle
        expr(s"CAST((1000000 * greatest($RrDen" +
          s" * CAST(${k} AS DECIMAL(38,0))" +
          s" * coalesce(c_rep, 0L) - ${RrDen - RrNum} * ${n}L, 0))" +
          s" div ($RrNum * CAST(${k} AS DECIMAL(38,0)) * ${n}L)" +
          " AS BIGINT)")
          .as("est_micro"))
      .withColumn("err_micro", abs(col("est_micro") - col("true_micro")))
  }
}
