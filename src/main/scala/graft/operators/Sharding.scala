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

  /** Deterministic global training-order shuffle. Epoch dataloaders need
    * the corpus in a reproducible pseudo-random order; `ORDER BY rand()`
    * is neither reproducible (retries reroll) nor scalable (one total
    * sort through a global range partitioner). Here every doc gets a
    * stable md5 key from (seed, id); the key mod `nShards` picks a shard
    * and a window PARTITIONED BY shard orders within it — nShards
    * independent window states, never a single-partition global sort.
    * Training order is (shard, pos): readers consume shards in order or
    * round-robin, and a fresh epoch order is just a new seed — two small
    * columns change, no data moves at rest. The assignment is also
    * growth-stable: adding docs never changes an existing doc's key or
    * shard, only its pos within the shard.
    *
    * Output: (id, shard, pos) with pos = 1-based rank of the md5 key
    * (id tiebreak) inside the shard.
    */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Long,
                   nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val key = conv(substring(md5(concat(lit(s"$seed:"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    df.select(col(idCol), key.as("__skey"))
      .select(col(idCol),
        pmod(col("__skey"), lit(nShards)).cast("int").as("shard"),
        row_number().over(Window.partitionBy(pmod(col("__skey"), lit(nShards)))
          .orderBy(col("__skey"), col(idCol))).as("pos"))
  }

  /** Sequence packing, concat-and-chunk style: within each group
    * (language, source — whatever keys the output shards), documents in
    * stable id order are conceptually concatenated and cut every `budget`
    * tokens, the way LLM pretraining fills fixed-size context windows. A
    * document may span chunk boundaries; the output tells the writer
    * exactly where each document lands:
    * (doc_id, group, n_tokens, start_chunk, end_chunk, offset_in_chunk).
    *
    * The running sum is a window PARTITIONED by the group key — every
    * group's packing state is independent, so this scales with group
    * count and never funnels the corpus through one task (unlike a global
    * packing order, which is also meaningless operationally: shards are
    * written per group). Zero-token documents occupy no tokens: they
    * "land" at their neighbor's boundary with end_chunk = start_chunk.
    */
  def packContextWindows(docs: DataFrame, idCol: String, groupCol: String,
                         tokenExpr: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(groupCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol).as("doc_id"), col(groupCol),
        greatest(lit(0L), coalesce(tokenExpr.cast("long"), lit(0L)))
          .as("n_tokens"))
      .withColumn("__prior", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col(groupCol), col("n_tokens"),
        expr(s"__prior div $budget").as("start_chunk"),
        when(col("n_tokens") > 0,
          expr(s"(__prior + n_tokens - 1) div $budget"))
          .otherwise(expr(s"__prior div $budget")).as("end_chunk"),
        expr(s"__prior % $budget").as("offset_in_chunk"))
  }

  /** Sequence packing, greedy no-split style: within each group, documents
    * in id order go WHOLE into the current bin while they fit; the first
    * doc that would overflow `budget` starts the next bin. An oversize
    * document (n_tokens > budget) gets a bin alone. This is the packing
    * used when documents must not cross example boundaries (SFT,
    * contrastive pairs), complementing [[packContextWindows]]'s
    * concat-and-chunk.
    *
    * The bin decision is sequential per group — a running sum *with reset*
    * that no window function expresses — so this is the one operator in
    * the pipeline family implemented with the secondary-sort idiom:
    * repartition on the group key, sort within partitions by (group,
    * packing order), then a single streaming pass per partition carrying
    * O(1) state. Groups are hash-partitioned, so the plan scales with
    * group count and the pass never buffers a group.
    *
    * `orderBy` is the packing order WITHIN a group (default: id order).
    * Curriculum packing — fill early bins with the highest-priority
    * documents — is the same pass over a (priority desc, id) order; the
    * caller must supply a total order or tied documents pack
    * nondeterministically.
    */
  def packGreedy(docs: DataFrame, idCol: String, groupCol: String,
                 tokenExpr: Column, budget: Long,
                 orderBy: Seq[Column] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val ord = if (orderBy.nonEmpty) orderBy else Seq(col("__docid"))
    val prepared = docs
      // computed columns ride ALONGSIDE the originals so caller-supplied
      // order expressions (e.g. col("n_chars").desc) still resolve; the
      // narrow projection after the sort preserves per-partition order
      .withColumn("__grp", col(groupCol).cast("string"))
      .withColumn("__docid", col(idCol).cast("long"))
      .withColumn("__n",
        greatest(lit(0L), coalesce(tokenExpr.cast("long"), lit(0L))))
      .repartition(col("__grp"))
      .sortWithinPartitions(col("__grp") +: ord: _*)
      .select(col("__grp"), col("__docid"), col("__n"))
      .as[(String, Long, Long)]
    prepared.mapPartitions { it =>
      var curGrp: String = null
      var bin = 0L
      var acc = 0L
      it.map { case (g, id, n) =>
        if (g != curGrp) { curGrp = g; bin = 0L; acc = 0L }
        if (acc > 0 && acc + n > budget) { bin += 1; acc = 0L }
        acc += n
        (id, g, n, bin)
      }
    }.toDF("doc_id", groupCol, "n_tokens", "bin")
  }

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
