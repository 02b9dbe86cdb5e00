package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budgeted shard planning: assign documents (in stable id order) to
  * output shards of ≈ `budget` tokens each — the packing step before a
  * tokenized corpus is written as fixed-size training shards.
  *
  * shard(doc) = floor(prior_tokens / budget), where prior_tokens is the
  * exclusive running token sum in doc order. The running sum is computed
  * WITHOUT a global single-partition window: sort, pin the partitioning
  * (eager localCheckpoint — per-partition facts applied across jobs are
  * otherwise unsound under AQE re-coalescing), per-partition token totals
  * → exclusive offsets (one tiny collect, #partitions rows), then a
  * within-partition window. Each partition's window state is independent,
  * so the plan scales with partition count, not corpus size.
  */
object Sharding {

  def shardByTokenBudget(docs: DataFrame, idCol: String, tokenExpr: Column,
                         budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val sorted = docs
      // null-yielding token expressions (null text, legacy size(null)=-1)
      // would NPE the offset collect or corrupt every later prior — clamp
      // to a well-defined 0-token document instead.
      .select(col(idCol).as("doc_id"),
        greatest(lit(0L), coalesce(tokenExpr.cast("long"), lit(0L)))
          .as("n_tokens"))
      .orderBy("doc_id")
    val pinned = sorted.localCheckpoint(eager = true)
    val withMid = pinned.withColumn("__mid", monotonically_increasing_id())
    val pidOf = shiftright(col("__mid"), 33)
    val sums = withMid.groupBy(pidOf.as("__pid"))
      .agg(sum("n_tokens").as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, t) => val o = (pid, acc); acc += t; o }
    val spark = docs.sparkSession
    import spark.implicits._
    // broadcast-join the offsets rather than element_at on a literal map —
    // a literal-map lookup is a linear scan per row and the partition count
    // is unbounded at scale.
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(pidOf).orderBy("__mid")
      .rowsBetween(Window.unboundedPreceding, -1)
    withMid
      .join(broadcast(offDf), pidOf === col("__pid"))
      .withColumn("__prior",
        col("__off") + coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        floor(col("__prior") / lit(budget)).cast("int").as("shard"))
  }
}
