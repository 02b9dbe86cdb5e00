package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable summary sketches whose state is exactly determined by the
  * data — the property that lets a sketch column be stored per shard,
  * re-aggregated later, and still hash-match a SQL oracle (the same
  * discipline as the KMV rollup in AnalyticsQueries `a20_sketch_rollup`).
  *
  * Why sketches at 100 TB: the exact forms of these answers (`percentile`,
  * `groupBy(token).count()`) need a full sort or a vocabulary-sized
  * shuffle. Both sketches here reduce to ONE fixed-width hash aggregate —
  * histogram: ≤ `bins` rows per group; count-min: depth·width rows total —
  * and both merge by simple addition, so per-shard sketch columns roll up
  * without re-reading data. Estimates carry known error bounds
  * (histogram: ±binWidth; CMS: overestimate ≤ εN with ε = e/width at the
  * standard depth = ln(1/δ) sizing, Cormode & Muthukrishnan 2005).
  */
object Sketches {

  /** Fixed-bin histogram quantile estimate, per group: one hash aggregate
    * over (groups × ≤bins) cells, then a bounded per-group cumulative walk
    * (window over ≤ `bins` rows per group — never data-sized). The
    * estimate for quantile q is the UPPER EDGE of the first bin whose
    * cumulative count reaches ceil(q·n): a deterministic, distribution-free
    * bound that is exact to within one bin width. Values outside [lo, hi)
    * clamp into the edge bins (their mass is counted, their position is
    * saturated — the standard fixed-range histogram contract).
    *
    * Everything is integer/binary-exact arithmetic when (hi-lo)/bins is a
    * dyadic rational (e.g. 120000/256 = 468.75), so the output
    * hash-matches a SQL oracle replaying the same floor/clamp/cumsum.
    *
    * @return one row per group per q: (groupCols..., q, est, n)
    */
  def histogramQuantiles(df: DataFrame, valueCol: String, lo: Double,
      hi: Double, bins: Int, qs: Seq[Double],
      groupCols: Seq[String]): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    val w = (hi - lo) / bins
    val g = groupCols.map(col)
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol) - lo) / w).cast("int"))).as("__bin")
    val cells = df.select(g :+ bin: _*)
      .groupBy(groupCols.head, groupCols.tail :+ "__bin": _*)
      .agg(count(lit(1)).as("__c"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("__bin"))
    val cum = cells
      .withColumn("__cum", sum("__c").over(win))
      .withColumn("__n", sum("__c").over(
        org.apache.spark.sql.expressions.Window.partitionBy(g: _*)))
    // per q: first bin whose cumulative reaches ceil(q*n); estimate = the
    // bin's upper edge. min() implements "first" because __bin orders cum.
    // One explode + one aggregate covers every q (the cell relation is
    // sketch-sized, so the |qs|-way fan-out is bins·|qs| rows per group).
    val gq = groupCols :+ "q"
    val qdf = cum
      .select(g ++ Seq(col("__bin"), col("__cum"), col("__n"),
        explode(array(qs.map(lit(_)): _*)).as("q")): _*)
      .filter(col("__cum") >= ceil(col("q") * col("__n")))
      .groupBy(gq.head, gq.tail: _*)
      .agg(min("__bin").as("__qb"), max("__n").as("n"))
      .select(g ++ Seq(col("q"),
        (lit(lo) + (col("__qb") + 1) * w).as("est"), col("n")): _*)
    qdf.orderBy(g :+ col("q"): _*)
  }

  /** Count-min sketch cells for a token relation: `depth` independent
    * md5-derived hash rows × `width` columns, each cell the exact sum of
    * occurrences hashing into it. The sketch is the ENTIRE aggregate —
    * depth·width rows regardless of vocabulary size — and two sketches
    * over disjoint data merge by adding cells.
    *
    * Hashing is `md5(token ++ "#" ++ row)` truncated to 60 bits then mod
    * width: fully replayable in any engine with md5 (the same twin-oracle
    * idiom as OracleIdioms.md5Long), no engine-private hash involved.
    *
    * @param toks relation with one row per token OCCURRENCE in `tokCol`
    * @return (row, cell, c) — depth·width rows max
    */
  def countMinCells(toks: DataFrame, tokCol: String, depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape $depth x $width")
    toks.select(col(tokCol).as("__t"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"), cmsCell(col("__t"), col("row"), width).as("cell"))
      .groupBy("row", "cell").agg(count(lit(1)).as("c"))
  }

  /** The CMS cell index of a token under hash row `row`. */
  def cmsCell(tok: Column, row: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(tok, lit("#"), row.cast("string"))),
      1, 15), 16, 10).cast("long"), lit(width))

  /** Point-estimate token frequencies from a cell relation: est(t) =
    * min over rows of cell(row, h_row(t)) — never underestimates, and
    * overestimates only by colliding mass. `probes` is any relation with
    * a distinct token column (bounded — e.g. exact heavy hitters to
    * audit, a watchlist); the lookup joins depth cells per probe against
    * the depth·width sketch, broadcast-sized by construction.
    *
    * @return (token, cms_est)
    */
  def countMinEstimate(cells: DataFrame, probes: DataFrame,
      tokCol: String, depth: Int, width: Int): DataFrame = {
    val keys = probes.select(col(tokCol).as("token")).distinct()
      .select(col("token"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("token"), col("row"),
        cmsCell(col("token"), col("row"), width).as("cell"))
    // missing cell = 0 count is impossible for a probed token that occurs,
    // but a watchlist token absent from the data has NO cells — coalesce
    // keeps the estimate total (0), preserving the never-underestimate bound
    keys.join(broadcast(cells), Seq("row", "cell"), "left")
      .groupBy("token").agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }
}
