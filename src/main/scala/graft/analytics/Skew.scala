package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins (SURVEY scale notes; complements AQE's
  * runtime skew-join splitting with a declarative tool for *known* skew).
  *
  * `saltedJoin` replicates the small side `saltFactor` times and spreads
  * each hot key of the large side across `saltFactor` sub-keys, turning one
  * straggler partition into `saltFactor` even ones. Use when one key holds
  * an outsized share of rows (the "null key" / "default tenant" pattern) —
  * at 100 TB a single hot key otherwise serializes the whole stage.
  */
object Skew {

  /** The salt derives from a stable hash of the large side's whole row —
    * deterministic across replays and task retries (a
    * `monotonically_increasing_id` salt re-deals rows on every retry,
    * breaking replay determinism), while still spreading a hot key evenly
    * as long as its rows differ in any other column. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 1)
    val salted = large.withColumn("_salt",
      pmod(xxhash64(struct(large.columns.map(col).toIndexedSeq: _*)),
        lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
