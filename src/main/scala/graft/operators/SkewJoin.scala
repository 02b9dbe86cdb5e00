package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join: salt the skewed (fact) side, replicate the small
  * side across salts.
  *
  * AQE's skew-join handling splits oversized *post-shuffle* partitions and
  * covers most cases; explicit salting remains the tool when a single join
  * key is so hot that even a split partition is dominated by one key (every
  * row of the key still meets every matching build row), or when AQE is
  * unavailable (e.g. inside a cached subplan). Salting rewrites the key
  * space: fact keys get a deterministic salt in [0, salts), the small side
  * is exploded `salts`× , and the join key becomes (key, salt) — spreading
  * one hot key over `salts` reducers at the cost of replicating the small
  * side.
  */
object SkewJoin {

  /** Inner equi-join `fact ⋈ small` on `key`, salted `salts` ways. The salt
    * is derived from `saltSource` (any fact-side column(s) with spread, e.g.
    * a row id) via xxhash64 — deterministic, no RNG state.
    */
  def saltedInnerJoin(fact: DataFrame, small: DataFrame, key: String,
                      salts: Int, saltSource: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
