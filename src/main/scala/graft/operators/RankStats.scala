package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-based distribution statistics that never materialize a rank: each
  * one collapses the data to a value-level histogram first (one hash
  * aggregate) and computes the statistic from prefix sums over that
  * bounded relation — the counts-of-counts discipline of e_power_users,
  * applied to Gini concentration, ROC AUC, and the two-sample KS test.
  *
  * Why this matters at 100 TB: the textbook form of all three sorts the
  * sample (a global `row_number()` — one task, data-sized). Here the only
  * data-sized operation is the initial aggregate; the walk runs over
  *  - Gini: one row per distinct value (bounded by the largest count),
  *  - AUC: one row per distinct 6dp score (≤ 10^6 + 1, fixed domain),
  *  - KS: one row per histogram bin (fixed by construction),
  * so the unpartitioned windows below are control-plane-sized at any
  * corpus scale. All three stay in exact integer arithmetic until one
  * final division, which is what lets them hash-match a SQL oracle.
  */
object RankStats {

  private val one = Window.partitionBy(lit(1))

  private def below(order: Column) = Window.partitionBy(lit(1))
    .orderBy(order).rowsBetween(Window.unboundedPreceding, -1)

  /** Gini coefficient of a non-negative integer column: 1 row
    * (n, total, gini 6dp) with gini = Σ_{i,j}|x_i−x_j| / (2n²μ) = W/(n·S),
    * W = Σ over distinct values v ascending of m_v·(v·Cm − Cs) using
    * exclusive prefix sums Cm (rows below) and Cs (mass below). BIGINT
    * until the final division; 0/0 (all-zero mass) yields NULL.
    */
  def gini(df: DataFrame, valueCol: String,
           nName: String = "n", totalName: String = "total"): DataFrame = {
    val dist = df.groupBy(col(valueCol).as("__x"))
      .agg(count(lit(1)).as("__m"))
    val w = dist.select(col("__x"), col("__m"),
      (col("__m") * (col("__x") * coalesce(sum(col("__m"))
          .over(below(col("__x"))), lit(0L)) -
        coalesce(sum(col("__m") * col("__x"))
          .over(below(col("__x"))), lit(0L)))).as("__w"))
    w.groupBy()
      .agg(sum("__m").as(nName), sum(col("__m") * col("__x")).as(totalName),
        sum("__w").as("__ww"))
      .select(col(nName), col(totalName),
        round(col("__ww").cast("double") / (col(nName).cast("double") *
          col(totalName).cast("double")), 6).as("gini"))
  }

  /** ROC AUC (Mann–Whitney with ½-credit for ties) of `scoreCol` against
    * a 0/1 long `labelCol`: 1 row (n_pos, n_neg, auc 6dp). Callers ensure
    * the score column has a bounded domain (e.g. rounded to 6dp);
    * 2·P·N·AUC = Σ_s np_s·(2·negBelow(s) + nn_s) stays BIGINT.
    */
  def auc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val h = df.groupBy(col(scoreCol).as("__s"))
      .agg(sum(col(labelCol)).as("__np"),
        sum(lit(1L) - col(labelCol)).as("__nn"))
    val r = h.select(
      (col("__np") * (lit(2L) * coalesce(sum(col("__nn"))
          .over(below(col("__s"))), lit(0L)) + col("__nn"))).as("__numer2"),
      sum(col("__np")).over(one).as("__p"),
      sum(col("__nn")).over(one).as("__n"))
    r.groupBy("__p", "__n").agg(sum("__numer2").as("__num2"))
      .select(col("__p").as("n_pos"), col("__n").as("n_neg"),
        round(col("__num2").cast("double") /
          (lit(2.0) * col("__p").cast("double") * col("__n").cast("double")),
          6).as("auc"))
  }

  /** Mann–Whitney U two-sample test, EXACT and distributed — the
    * nonparametric "did the distribution shift" test (a24's t-test without
    * the normality assumption). No rank is ever materialized: the sample
    * collapses to a per-value (a_s, b_s) histogram (one hash aggregate —
    * the only data-sized work), and the doubled U statistic
    * 2U_A = Σ_s a_s·(2·bBelow(s) + b_s) plus the tie term Σ(t³−t) come
    * from prefix sums over that bounded relation. Decimal factors before
    * every multiply (the a33/a34 discipline), so nothing wraps at any row
    * count; the normal-approximation z (tie-corrected variance) is the
    * only double, computed once from exact integers.
    *
    * Output: 1 row (n_a, n_b, u_a 4dp, z 6dp).
    */
  def mannWhitney(df: DataFrame, valueCol: String,
                  isA: Column, isB: Column): DataFrame = {
    val dec: Column => Column = _.cast("decimal(19,0)")
    val cells = df.filter(isA || isB)
      .groupBy(col(valueCol).as("__v"))
      .agg(sum(when(isA, 1L).otherwise(0L)).as("a"),
        sum(when(isB, 1L).otherwise(0L)).as("b"))
    val walked = cells.select(col("a"), col("b"),
      coalesce(sum("b").over(below(col("__v"))), lit(0L)).as("bb"))
    val m = walked.groupBy().agg(
      sum("a").as("na"), sum("b").as("nb"),
      sum(dec(col("a")) * (lit(2L) * col("bb") + col("b")))
        .cast("decimal(38,0)").as("u2"),
      sum(dec(col("a") + col("b")) * (col("a") + col("b")) *
          (col("a") + col("b")) - (col("a") + col("b")))
        .cast("decimal(38,0)").as("st"))
    def d(c: Column) = c.cast("double")
    val n = col("na") + col("nb")
    // tie-corrected variance; 0 when every observation ties (z undefined
    // — NULL, not an ANSI divide-by-zero)
    val variance = (d(col("na")) * d(col("nb")) / 12) *
      (d(n + 1) - d(col("st")) / (d(n) * d(n - 1)))
    m.select(col("na").as("n_a"), col("nb").as("n_b"),
      round(d(col("u2")) / 2, 4).as("u_a"),
      when(variance > 0,
        round((d(col("u2")) - d(col("na")) * d(col("nb"))) /
          (lit(2.0) * sqrt(variance)), 6))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** Kruskal–Wallis H across any number of groups — the k-sample
    * extension of [[mannWhitney]], same counts-of-counts discipline: the
    * pooled per-value histogram yields doubled integer mid-ranks
    * 2r_s = 2·cumBelow(s) + m_s + 1, each group's doubled rank-sum 2R_g is
    * a decimal dot product over the (value × group) cell relation, and
    * H = 3/(n(n+1))·Σ_g (2R_g)²/n_g − 3(n+1), divided by the tie factor
    * 1 − Σ(t³−t)/(n³−n). The per-group double terms fold in group-key
    * order (sort_array → aggregate) so the ≤|groups| float additions are
    * order-pinned cross-engine.
    *
    * Output: 1 row (n, n_groups, h 6dp).
    */
  def kruskalWallis(df: DataFrame, valueCol: String,
                    groupCol: String): DataFrame = {
    val dec: Column => Column = _.cast("decimal(19,0)")
    val cells = df.groupBy(col(valueCol).as("__v"), col(groupCol).as("__g"))
      .agg(count(lit(1)).as("c"))
    val pooled = cells.groupBy("__v").agg(sum("c").as("m"))
    val r2 = pooled.select(col("__v"),
      (lit(2L) * coalesce(sum("m").over(below(col("__v"))), lit(0L)) +
        col("m") + 1L).as("r2"))
    val perGroup = cells.join(broadcast(r2), "__v")
      .groupBy("__g")
      .agg(sum("c").as("ng"),
        sum(dec(col("c")) * dec(col("r2"))).cast("decimal(38,0)").as("rg2"))
      // square in DOUBLE: a decimal(38)×decimal(38) product overflows the
      // 38-digit cap in both engines; the double square is IEEE-identical
      // cross-engine from the exact decimal 2R_g
      .select(col("__g"), col("ng"),
        (col("rg2").cast("double") * col("rg2").cast("double") /
          col("ng").cast("double")).as("term"))
    val ties = pooled.groupBy().agg(
      sum("m").as("n"),
      sum(dec(col("m")) * (col("m")) * (col("m")) - col("m"))
        .cast("decimal(38,0)").as("st"))
    def d(c: Column) = c.cast("double")
    perGroup
      .groupBy()
      .agg(count(lit(1)).as("n_groups"),
        sort_array(collect_list(struct(col("__g"), col("term")))).as("ts"))
      .crossJoin(broadcast(ties))
      .select(col("n"), col("n_groups"),
        // tie factor 1 − Σ(t³−t)/(n³−n) is 0 when EVERY observation ties
        // (one distinct value): H is undefined — NULL, not a divide-by-
        // zero inf/NaN (the mannWhitney z guard, applied to the k-sample
        // form; the oracle SQL carries the same CASE)
        when(lit(1.0) - d(col("st")) /
            (d(col("n")) * d(col("n")) * d(col("n")) - d(col("n"))) > 0,
          round((lit(3.0) / (d(col("n")) * d(col("n") + 1)) *
            aggregate(col("ts"), lit(0.0),
              (acc, x) => acc + x.getField("term")) -
            lit(3.0) * d(col("n") + 1)) /
            (lit(1.0) - d(col("st")) /
              (d(col("n")) * d(col("n")) * d(col("n")) - d(col("n")))), 6))
          .otherwise(lit(null).cast("double")).as("h"))
  }

  /** Brown–Forsythe test (Levene's test centered on MEDIANS — robust where
    * the mean-centered classic is outlier-dragged): one-way ANOVA F over
    * the absolute deviations from each group's median. "Are the spreads
    * equal" is the precondition check before a24's pooled-variance t-test
    * is trusted.
    *
    * No sort, no global rank: group medians come from a per-group
    * cumulative walk over the per-value histogram (the exact
    * position-based median — lower/upper order statistics averaged, so
    * ties and even counts match every textbook engine), deviations are
    * computed per CELL (value-domain sized), and the F statistic folds
    * from per-group decimal moments. Per-group double terms fold in
    * group-key order. Output: 1 row (n, n_groups, f 6dp); NULL F when the
    * within-group deviation mass is zero (degenerate, would divide by 0).
    */
  def brownForsythe(df: DataFrame, valueCol: String,
                    groupCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).as("__g"), col(valueCol).as("__x"))
      .agg(count(lit(1)).as("c"))
    val wg = Window.partitionBy("__g").orderBy("__x")
      .rowsBetween(Window.unboundedPreceding, 0)
    val gAll = Window.partitionBy("__g")
    val walked = cells.select(col("__g"), col("__x"), col("c"),
      (sum("c").over(wg) - col("c")).as("cumBelow"),
      sum("c").over(wg).as("cum"), sum("c").over(gAll).as("ng"))
    // doubled median = lower + upper order statistic (0-based positions
    // (n-1) div 2 and n div 2) — one row matches each condition per group
    val lo = ((col("ng") - 1) / 2).cast("long")
    val up = (col("ng") / 2).cast("long")
    val med2 = walked.groupBy("__g")
      .agg(sum(when(col("cumBelow") <= lo && lo < col("cum"), col("__x"))
          .otherwise(lit(0.0)) +
        when(col("cumBelow") <= up && up < col("cum"), col("__x"))
          .otherwise(lit(0.0))).as("med2"))
    // per-cell |2x - 2·median|, rounded to 6dp decimal so the moment sums
    // are addition-order-free on both engines
    val dz = round(abs(lit(2.0) * col("__x") - col("med2")), 6)
      .cast("decimal(28,6)")
    val dz2 = round(abs(lit(2.0) * col("__x") - col("med2")) *
      abs(lit(2.0) * col("__x") - col("med2")), 6).cast("decimal(28,6)")
    val perGroup = cells.join(broadcast(med2), "__g")
      .groupBy("__g")
      .agg(sum("c").as("ng"),
        sum(col("c").cast("decimal(19,0)") * dz).cast("decimal(38,6)")
          .as("s1"),
        sum(col("c").cast("decimal(19,0)") * dz2).cast("decimal(38,6)")
          .as("s2"))
      // squares in DOUBLE (the kruskalWallis discipline — decimal²
      // overflows the 38-digit cap) from the exact decimal moments
      .select(col("__g"), col("ng"), col("s1"), col("s2"),
        (col("s1").cast("double") * col("s1").cast("double") /
          col("ng").cast("double")).as("t1"))
    def d(c: Column) = c.cast("double")
    perGroup.groupBy()
      .agg(count(lit(1)).as("n_groups"), sum("ng").as("n"),
        sum("s1").cast("double").as("s1t"), sum("s2").cast("double").as("s2t"),
        sort_array(collect_list(struct(col("__g"), col("t1")))).as("ts"))
      .select(col("n"), col("n_groups"),
        aggregate(col("ts"), lit(0.0),
          (acc, x) => acc + x.getField("t1")).as("__t1s"),
        col("s1t"), col("s2t"))
      .select(col("n"), col("n_groups"),
        when(col("n_groups") > 1 && col("s2t") - col("__t1s") > 0,
          round(((d(col("n")) - d(col("n_groups"))) /
            (d(col("n_groups")) - 1)) *
            (col("__t1s") - col("s1t") * col("s1t") / d(col("n"))) /
            (col("s2t") - col("__t1s")), 6))
          .otherwise(lit(null).cast("double")).as("f"))
  }

  /** Exact interpolated percentiles WITHOUT Spark's `Percentile`
    * aggregate — the counts-of-counts crossing walk applied to the one
    * shape `percentile()` can't survive at scale. Spark's built-in is a
    * TypedImperativeAggregate whose partial buffers are value→count
    * OpenHashMaps merged on ONE final task; memory there is O(distinct
    * values), which on a continuous domain (prices, durations, scores)
    * grows with the data — ~10^9 entries at the 100 TB target. Here the
    * same answer comes from
    *   1. `groupBy(value).count()` — a distributed partial+final hash
    *      aggregate, the only data-sized work;
    *   2. a cumulative window over the DISTINCT-VALUE relation (sort-based,
    *      spillable — never an in-memory map) locating, for each probe p,
    *      the order statistics at 0-based positions floor/ceil of
    *      pos = p·(n−1);
    *   3. Spark's own interpolation `(hi−pos)·x_lo + (pos−lo)·x_hi`,
    *      replayed as Column arithmetic — each step is the identical IEEE
    *      double op `Percentile.getPercentile` performs, so results are
    *      bit-for-bit what the built-in returned and every existing DuckDB
    *      oracle keeps matching.
    * When the two bracketing order statistics are the SAME distinct value,
    * the value is returned directly (no interpolation round-trip) —
    * mirroring the built-in's lowerIndex == higherIndex early return.
    *
    * Output: one row per key combination (one row total when `keys` is
    * empty), columns `keys ++ probes.map(_._1)` (percentiles as unrounded
    * doubles — callers round/alias) ++ the optional extras. `histAggs`
    * are extra aggregates evaluated at the per-value histogram stage
    * (over the raw rows of each (keys, value) cell — alias them);
    * `finalAggs` are (outputName, aggregate) pairs run at the final
    * per-key fold, where `__v` (distinct value), `__m` (its count) and
    * any histAgg output are in scope — they let a caller fold side
    * statistics (count, max, a second column's sum) out of the same
    * single pass instead of re-scanning the input.
    */
  def exactPercentiles(df: DataFrame, value: Column, keys: Seq[String],
                       probes: Seq[(String, Double)],
                       histAggs: Seq[Column] = Nil,
                       finalAggs: Seq[(String, Column)] = Nil): DataFrame = {
    // NULL values stay in the histogram as their own cell (so a key whose
    // values are ALL null still yields an output row — with NULL
    // percentiles, exactly like the built-in and like SQL GROUP BY — and
    // extras like sum(__m) still count every row the way count(*) did),
    // but they are excluded from the cumulative walk: nulls sort first
    // under orderBy(__v) and contribute 0 to __cum/__n, so the non-null
    // order statistics are unmoved and an all-null key probes nothing.
    val histFull = df
      .groupBy(keys.map(col) :+ value.as("__v"): _*)
      .agg(count(lit(1)).as("__m"), histAggs: _*)
    percentilesOfHist(histFull, keys, probes, finalAggs)
  }

  /** The walk-and-interpolate stage of [[exactPercentiles]] over a
    * PRE-BUILT value-level histogram: `hist` has one row per (keys…,
    * `__v` distinct value, `__m` its count) cell, plus any extra columns
    * `finalAggs` want in scope. This is the serving path for an at-rest
    * counted layout (a cube whose group columns include the value
    * column): the data-sized aggregate that built the histogram happened
    * ONCE at layout-build time, so a quantile probe at 100 TB reads and
    * walks only the stored cells — identical math, identical nulls
    * (null `__v` cells pass through the walk contributing 0), identical
    * interpolation, so layout-served and live answers are bit-equal.
    */
  def percentilesOfHist(hist: DataFrame, keys: Seq[String],
                        probes: Seq[(String, Double)],
                        finalAggs: Seq[(String, Column)] = Nil): DataFrame = {
    require(probes.nonEmpty, "percentilesOfHist needs at least one probe")
    val keyCols = keys.map(col)
    val histFull = hist // the walk below reads one (keys, __v, __m) cell per row
    val part =
      if (keys.isEmpty) Window.partitionBy(lit(1))
      else Window.partitionBy(keyCols: _*)
    val cumW = part.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val nonNullM = when(col("__v").isNotNull, col("__m")).otherwise(lit(0L))
    val walked = histFull
      .withColumn("__cum", sum(nonNullM).over(cumW))
      .withColumn("__n", sum(nonNullM).over(
        part.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val cumBelow = col("__cum") - nonNullM
    // per probe: the rows holding the floor/ceil order statistics (exactly
    // one row matches each condition per key — max() just extracts it)
    def pos(p: Double) = lit(p) * (col("__n") - 1).cast("double")
    val probeAggs = probes.flatMap { case (name, p) =>
      val lo = floor(pos(p))
      val hi = ceil(pos(p))
      Seq(
        max(when(cumBelow <= lo && lo < col("__cum"), col("__v")))
          .as(s"__lo_$name"),
        max(when(cumBelow <= hi && hi < col("__cum"), col("__v")))
          .as(s"__hi_$name"))
    }
    val aggs = (max("__n").as("__n") +: probeAggs) ++
      finalAggs.map { case (n, c) => c.as(n) }
    val folded =
      if (keys.isEmpty) walked.groupBy().agg(aggs.head, aggs.tail: _*)
      else walked.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val outProbes = probes.map { case (name, p) =>
      val pp = lit(p) * (col("__n") - 1).cast("double")
      val lo = floor(pp)
      val hi = ceil(pp)
      val xlo = col(s"__lo_$name").cast("double")
      val xhi = col(s"__hi_$name").cast("double")
      when(hi === lo || col(s"__lo_$name") === col(s"__hi_$name"), xlo)
        .otherwise((hi.cast("double") - pp) * xlo +
          (pp - lo.cast("double")) * xhi)
        .as(name)
    }
    folded.select(keyCols ++ outProbes ++
      finalAggs.map { case (n, _) => col(n) }: _*)
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic on a fixed dyadic
    * histogram: D = max over present bin edges of |F_A − F_B|, computed
    * from ONE ≤`bins`-cell aggregate (the a21 sketch shape). Exact for
    * the binned distributions; within one bin's mass of the raw-sample D.
    * Output: 1 row (n_a, n_b, d_stat 6dp, at_edge = first achieving edge).
    * `w` must be a dyadic rational (hi/bins with hi a power of two) so
    * every float op is exact and the gap arithmetic replays engine-free.
    */
  def ksBinned(df: DataFrame, valueCol: String, isA: Column, isB: Column,
               w: Double, bins: Int): DataFrame = {
    require(bins > 0 && w > 0, s"bad KS histogram shape $bins x $w")
    val cells = df.filter(isA || isB).select(
        least(lit(bins - 1), greatest(lit(0),
          floor(col(valueCol) / w).cast("int"))).as("bin"),
        when(isA, lit("A")).otherwise(lit("B")).as("__side"))
      .groupBy("bin")
      .agg(sum(when(col("__side") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("__side") === "B", 1L).otherwise(0L)).as("cb"))
    val walk = Window.partitionBy(lit(1)).orderBy(col("bin"))
    // gaps at 9dp: the max and the edge-equality join below then compare
    // doubles produced by one identical arithmetic path in both engines
    val walked = cells.select(col("bin"),
      sum("ca").over(one).as("na"), sum("cb").over(one).as("nb"),
      round(abs(sum("ca").over(walk).cast("double") /
          sum("ca").over(one).cast("double") -
        sum("cb").over(walk).cast("double") /
          sum("cb").over(one).cast("double")), 9).as("gap"))
    val top = walked.groupBy().agg(max("gap").as("d9"))
    walked.join(broadcast(top), walked("gap") === top("d9"))
      .groupBy("na", "nb", "d9")
      .agg(min((col("bin") + 1).cast("double") * w).as("at_edge"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round(col("d9"), 6).as("d_stat"), col("at_edge"))
  }
}
