package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus shaping — the "take 30% of
  * the English, 100% of the low-resource languages" step of a training-data
  * mix. Spark's `sample`/`sampleBy` draw from per-partition RNG streams, so
  * the selected *rows* change with partitioning and retries; these instead
  * hash a stable id into a uniform and compare against the stratum's rate —
  * the same rows are kept on any cluster, any partitioning, any rerun, and
  * the filter is a scan-local projection (no shuffle, no state).
  */
object Sampling {

  /** md5-derived uniform in [0, 1): the top 60 bits of the id's md5 as a
    * fraction. Stable across engines (DuckDB mirror:
    * `('0x' || substr(md5(x), 1, 15))::BIGINT / 2^60`).
    */
  def hashUniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long") /
      lit(1152921504606846976.0) // 2^60

  /** Deterministic n-way split assignment: each row lands in the first
    * split whose cumulative fraction exceeds its stable uniform hash —
    * train/val/test carving as one codegen'd projection, reproducible
    * across runs, partitionings, and engines, and stable under corpus
    * growth (a doc's split never changes when other docs are added).
    * `splits` maps name → fraction; fractions must sum to ≤ 1, with any
    * remainder falling into the last split.
    */
  def splitAssign(id: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "splitAssign needs at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions exceed 1")
    val u = hashUniform(id)
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    splits.init.zip(cum.init).foldRight(lit(splits.last._1): Column) {
      case (((name, _), bound), acc) => when(u < bound, lit(name)).otherwise(acc)
    }
  }

  /** Keep each row iff hashUniform(id) < rate(stratum). `rates` maps
    * stratum value → sampling rate; absent strata fall back to
    * `defaultRate`. One codegen'd projection, no shuffle.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.filter(hashUniform(col(idCol)) < rate)
  }

  /** Weighted sampling: keep each row with probability proportional to its
    * weight, capped at 1 — `keep iff u < weight / maxWeight * rate`. Same
    * stable-hash mechanics; the caller supplies the normalizing constant so
    * the filter stays a single scan-local predicate (no global max pass).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     rate: Double, maxWeight: Double): DataFrame =
    df.filter(hashUniform(col(idCol)) < least(weight / maxWeight * rate, lit(1.0)))

  /** Downsample-only rebalance toward target corpus shares — the
    * mixture-weighting step that turns "the crawl is 44% English" into
    * "the training mix is 40/30/30". Given target shares per stratum, the
    * achievable corpus is capped by the most-underrepresented stratum:
    * feasible = min over strata of n_g / share_g; each stratum then keeps
    * rate_g = share_g · feasible / n_g of its rows (the binding stratum
    * keeps 100%). Strata absent from `targetShares` are dropped; target
    * strata absent from the data are ignored.
    *
    * Cost: one keyed count aggregate collected to the driver (one row per
    * stratum — control-plane, like the shard offsets), then the
    * deterministic [[stratifiedSample]] filter: scan-local, no shuffle of
    * the data itself, same rows kept on any partitioning or rerun.
    */
  def rebalanceToMix(df: DataFrame, idCol: String, strataCol: String,
                     targetShares: Map[String, Double]): DataFrame = {
    require(targetShares.nonEmpty, "rebalanceToMix needs target shares")
    require(targetShares.values.forall(_ > 0), "target shares must be > 0")
    require(targetShares.values.sum <= 1.0 + 1e-9, "target shares exceed 1")
    val counts = df.groupBy(strataCol).count().collect()
      .flatMap(r => Option(r.get(0)).map(v => v.toString -> r.getLong(1)))
      .toMap
    val present = targetShares.filter { case (g, _) => counts.contains(g) }
    require(present.nonEmpty, "no target stratum present in the data")
    // expression shapes mirror the SQL oracle exactly (min(n / share),
    // (share * feasible) / n) so the IEEE results are bit-identical
    val feasible = present.map { case (g, sh) => counts(g) / sh }.min
    val rates = present.map { case (g, sh) =>
      g -> math.min(1.0, sh * feasible / counts(g)) }
    stratifiedSample(df, strataCol, idCol, rates, defaultRate = 0.0)
  }
}
