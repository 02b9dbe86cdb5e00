package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Distributed BPE vocabulary learning (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", 2016): iteratively count
  * adjacent symbol pairs across the corpus vocabulary and merge the most
  * frequent pair — the classic subword-tokenizer training loop, run where
  * the corpus lives.
  *
  * Scale shape: everything operates on the WORD VOCABULARY (word, freq) —
  * corpus size only enters through the one word-count aggregate, after
  * which each merge round is a pair-explode → hash-aggregate over the
  * vocabulary plus a distributed top-1 (`TakeOrderedAndProject`). Driver
  * state is the merge table itself (T rows), the same
  * bounded-driver-state shape as [[Clustering]] and [[QualityModel]].
  *
  * Words are carried as sentinel-delimited symbol strings (`" h e l l o "`)
  * and a merge (a, b) is applied as `replace(" a b " → " ab ")` iterated
  * [[replacePasses]] times. replace() scans left-to-right without
  * rescanning replacements in BOTH Spark and DuckDB, so application is
  * engine-identical and oracle-replayable. Dialect note, documented
  * deliberately: within a run of ≥3 repeatedly-mergeable symbols
  * (`a a a` under merge (a,a)) the consumed sentinel makes the pass skip
  * the middle pair where canonical greedy BPE pairs leftmost-first —
  * merge COUNTS match canonical BPE, positions inside such runs may not.
  */
object BpeVocab {

  /** Fixed replace-to-fixpoint passes per merge round: each pass halves
    * the pairs a consumed delimiter hid, so 4 passes cover runs up to ~32
    * repeated symbols — far past natural-language word length.
    */
  val replacePasses = 4

  /** One merge step: (left, right, weighted pair count). */
  final case class Merge(step: Int, left: String, right: String, cnt: Long)

  /** (word, freq) vocabulary of the corpus — the only corpus-sized pass. */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol string: chars joined and wrapped with the sentinel. */
  private def initRep: Column =
    concat(lit(" "), array_join(split(col("word"), ""), " "), lit(" "))

  private def applyMerge(rep: Column, a: String, b: String): Column = {
    val pat = lit(s" $a $b "); val rpl = lit(s" $a$b ")
    (1 to replacePasses).foldLeft(rep)((r, _) =>
      call_function("replace", r, pat, rpl))
  }

  /** Candidate-pool multiplier for batched rounds: each round ranks the
    * top `poolFactor * batch` pairs and selects conflict-free merges from
    * that pool. The pool is what bounds the per-round driver collect AND
    * what the SQL oracle replays, so it is part of the operator contract,
    * not a tuning knob.
    */
  val poolFactor = 8

  /** Learn `steps` merges, up to `batch` per round. Returns the merge
    * table and the final symbolized vocabulary (word, rep, freq).
    *
    * Batching rule (the standard non-overlapping-merges trick, expressed
    * so a SQL oracle can replay it exactly): rank the round's top
    * `poolFactor·batch` pairs by (count desc, a, b); a candidate is kept
    * iff it shares NO symbol with ANY higher-ranked candidate in the pool
    * — higher-ranked, not higher-ranked-AND-KEPT, so keep/drop decisions
    * are independent (one anti-join in SQL) rather than sequentially
    * dependent like greedy maximal matching. The first
    * min(batch, steps−done) kept pairs merge this round; rank 1 is always
    * kept, so every round makes progress. Kept pairs are pairwise
    * symbol-disjoint, so their replace patterns cannot interact and the
    * recorded counts are exactly what sequential BPE would have recorded
    * had it picked the same pairs.
    *
    * batch=1 degenerates to classic one-merge-per-round BPE. A 32k-merge
    * vocabulary at batch=64 needs ~500s of driver-synchronous rounds
    * instead of 32k — the difference between a lunch break and a wall.
    * Measured (sf0.01 documents, 32 merges, local[8]): batch=8 runs
    * 4.7× faster wall-clock than batch=1 (1.3 s vs 5.9 s) — the win is
    * round-count, so it grows with the merge budget.
    *
    * Each round is one vocabulary-sized aggregate job; the vocabulary
    * plan is re-pinned per round (localCheckpoint) so round `i` never
    * recomputes rounds 1..i−1.
    */
  def learn(docs: DataFrame, textCol: String, steps: Int,
            batch: Int = 1): (Seq[Merge], DataFrame) = {
    require(steps > 0, "steps must be positive")
    require(batch > 0, "batch must be positive")
    var words = vocabulary(docs, textCol)
      .select(col("word"), initRep.as("rep"), col("freq"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    while (merges.size < steps && !exhausted) {
      // adjacent pairs of the symbol list; 1-symbol words emit none (the
      // guard matters: Spark's sequence(0, -1) COUNTS DOWN, it is not
      // empty like DuckDB's generate_series(1, 0))
      val s = split(trim(col("rep")), " ")
      val pairs = when(size(s) >= 2,
        transform(sequence(lit(0), size(s) - 2), k =>
          struct(element_at(s, k + 1).as("a"), element_at(s, k + 2).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))
      val pool = words
        .select(explode(pairs).as("p"), col("freq"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(poolFactor * batch).collect()
      if (pool.isEmpty) exhausted = true
      else {
        val selected = pool.zipWithIndex.filter { case (r, idx) =>
          val (a, b) = (r.getString(0), r.getString(1))
          pool.take(idx).forall { p =>
            val (c, d) = (p.getString(0), p.getString(1))
            a != c && a != d && b != c && b != d
          }
        }.map(_._1).take(math.min(batch, steps - merges.size))
        selected.foreach { r =>
          merges += Merge(merges.size + 1, r.getString(0), r.getString(1),
            r.getLong(2))
        }
        words = words
          .select(col("word"),
            selected.foldLeft(col("rep"))((rep, r) =>
              applyMerge(rep, r.getString(0), r.getString(1))).as("rep"),
            col("freq"))
          .localCheckpoint(true)
      }
    }
    (merges.toSeq, words)
  }

  /** The learned merge table as a relation: (step, left, right, cnt). */
  def mergeTable(docs: DataFrame, textCol: String, steps: Int,
                 batch: Int = 1): DataFrame = {
    val (merges, _) = learn(docs, textCol, steps, batch)
    val spark = docs.sparkSession
    import spark.implicits._
    merges.toDF("step", "left", "right", "cnt")
  }

  /** Encode every doc with the learned vocabulary: (id, n_tokens,
    * n_pieces) — the real "how many subword tokens is my corpus" count,
    * replacing whitespace/regex proxies. One explode + one join against
    * the (vocabulary-sized) piece-count map + one per-doc aggregate.
    */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
                   steps: Int): DataFrame = {
    val (_, words) = learn(docs, textCol, steps)
    val pieces = words.select(col("word"),
      size(split(trim(col("rep")), " ")).cast("long").as("n_p"))
    val tok = docs.select(col(idCol).as("__id"),
      explode(TextFunctions.tokens(col(textCol))).as("word"))
    val perDoc = tok.join(pieces, Seq("word"))
      .groupBy("__id").agg(count(lit(1)).as("n_tokens"),
        sum(col("n_p")).as("n_pieces"))
    docs.select(col(idCol))
      .join(perDoc, docs(idCol) === perDoc("__id"), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
  }
}
