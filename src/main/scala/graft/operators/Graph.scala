package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames. Beyond-parity
  * (the reference has no graph surface): the canonical use here is ranking
  * the states of the event-transition graph that
  * [[graft.queries.BehaviorQueries]]'s Markov query builds, but the
  * operator is generic over any weighted integer-id/string-id edge list.
  *
  * Scale shape: each power-iteration step is one equi-join of the rank
  * vector against the (cached) out-weighted edge list plus one hash
  * aggregate keyed on the destination — the same shuffle pattern as
  * large-scale PageRank on Pregel-style systems, with no driver-side
  * collect of anything data-sized. Lineage is cut per iteration
  * (`localCheckpoint`), the same guard [[Dedup.connectedComponents]] uses
  * against plan-depth blowup.
  */
object Graph {

  /** PageRank by power iteration in *scaled integer* arithmetic: ranks are
    * BIGINT multiples of 1/`scale`, every division is an integral floor,
    * and all additions are exact — so the result is bit-identical on any
    * engine and any partitioning/accumulation order (double-based PageRank
    * is not: float sums reorder across runs). The deliberate floor-rounding
    * mass leak per step is bounded by (out-degree · damping)/scale and is
    * part of the operator's contract, not noise.
    *
    * Teleport uses the standard uniform 1/N; nodes without in-edges keep
    * exactly the teleport mass; dangling-node out-mass is dropped (the
    * common simplification — documents, not redistributes).
    *
    * @param edges    (src, dst, weight) rows; weight must be a positive
    *                 integral count (e.g. observed transitions)
    * @param iterations power-iteration steps (diameter-ish; 10 is plenty
    *                 for the small-world graphs this targets)
    * @param dampingPct damping factor as an integer percentage (85 = 0.85)
    * @param scale    fixed-point denominator for rank units
    * @return (node, rank_scaled) — rank_scaled/scale ≈ PageRank, exact
    *         BIGINT, one row per distinct node, not ordered
    */
  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") — the
    * at-scale alternative to [[Dedup.connectedComponents]]'s min-label
    * propagation. Label propagation needs O(diameter) rounds and keeps the
    * full edge list live in every one; the star rounds *rewrite* the edge
    * list toward a forest of depth-1 stars in O(log² n) rounds (≈log n in
    * practice), and each round shrinks the relation it shuffles — on a
    * 100 TB pair list that difference is the job finishing or not.
    *
    * Round anatomy (3 shuffles, 0 joins — per-neighborhood minima are
    * whole-partition window aggregates over the node-keyed exchange, never
    * a global window):
    *  - large-star(u): every neighbor v > u re-links to
    *    m = min(N(u) ∪ {u}) — emitted pairs are always (bigger, smaller);
    *  - small-star(u): over the (big, small)-oriented list, every smaller
    *    neighbor and u itself re-link to the minimum neighbor — both
    *    output legs emitted in one explode pass, so each round's relations
    *    are consumed exactly once (no recompute, no ReusedExchange bet).
    * Fixpoint is detected *exactly* (count + anti-join set containment),
    * not by a heuristic hash — a false fixpoint would silently split
    * components. Same strict/convergence contract as
    * [[Dedup.connectedComponents]]; output is identical: (node, cluster)
    * with cluster = min node id of the component, so the two
    * implementations are interchangeable and cross-checkable.
    */
  def starConnectedComponents(pairs: DataFrame, iCol: String, jCol: String,
                              maxIter: Int = 25,
                              strict: Boolean = true): DataFrame = {
    Seq(iCol, jCol).foreach { c =>
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val dt = pairs.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"starConnectedComponents needs integral node ids; '$c' is $dt — " +
          "map ids to longs first (e.g. zipWithIndex or a dense id join)")
    }
    // canonical (big, small) orientation; self-loops carry no connectivity
    var e = pairs.select(col(iCol).cast("long").as("__i"),
        col(jCol).cast("long").as("__j"))
      .filter(col("__i") =!= col("__j"))
      .select(greatest(col("__i"), col("__j")).as("a"),
        least(col("__i"), col("__j")).as("b"))
      .distinct().localCheckpoint(eager = true)
    var eCount = e.count()
    var iter = 0
    var done = eCount == 0L
    while (!done && iter < maxIter) {
      val next = starRound(e).localCheckpoint(eager = true)
      val nextCount = next.count()
      // exact set equality: equal cardinality + next ⊆ e (both are distinct)
      done = nextCount == eCount &&
        next.join(e, Seq("a", "b"), "left_anti").isEmpty
      e = next
      eCount = nextCount
      iter += 1
    }
    if (!done) {
      val msg = s"starConnectedComponents did not converge in $maxIter " +
        "rounds — edge list is not yet a star forest"
      if (strict) throw new IllegalStateException(msg)
      else System.err.println(s"[graft] WARNING: $msg")
    }
    // star forest: every a points at its component min b; roots only ever
    // appear on the b side, so they label themselves
    e.select(col("a").as("node"), col("b").as("cluster"))
      .unionByName(
        e.select(col("b").as("node"), col("b").as("cluster")).distinct())
  }

  /** One fused large-star + small-star contraction round over a distinct
    * (a > b)-oriented edge set — exactly 3 shuffles, 0 joins (shape pinned
    * by PlanShapeSpec): each per-neighborhood minimum is a whole-partition
    * window aggregate over the node-keyed exchange, consumed once — no
    * second raw-edge exchange for a join probe, no ReusedExchange bet —
    * and the small-star step emits both output legs ((b, m) for b ≠ m,
    * and (a, m)) from ONE explode pass over the same windowed row.
    * Duplicates are tolerated until the round-final distinct (window min
    * and explode legs are insensitive to them). Hub nodes buffer in the
    * window sorter, which spills — the same skew behavior the former
    * sort-merge join had, minus its build side.
    */
  private[graft] def starRound(e: DataFrame): DataFrame = {
    val byA = org.apache.spark.sql.expressions.Window.partitionBy("a")
    // large-star: min over the full neighborhood (∪ {u} via least), then
    // every strictly-larger neighbor adopts it. Output keeps a > b.
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val large = sym.withColumn("__mn", min("b").over(byA))
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), least(col("a"), col("__mn")).as("b"))
    // small-star on the oriented list: all neighbors are < a, so the
    // neighborhood minimum needs no ∪{u}; a itself re-links too.
    large.withColumn("__m", min("b").over(byA))
      .select(explode(when(col("b") =!= col("__m"),
          array(struct(col("b").as("a"), col("__m").as("b")),
            struct(col("a"), col("__m").as("b"))))
        .otherwise(array(struct(col("a"), col("__m").as("b")))))
        .as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
      .distinct()
  }

  /** k-core decomposition membership: iteratively peel nodes of degree
    * < k (each removal can drop a neighbor under k, so peeling repeats
    * until stable) — the standard densest-region filter: on a near-dup
    * graph the 2-core keeps documents embedded in duplication CLIQUES and
    * sheds tree-like appendages that a single spurious pair can create.
    *
    * Round anatomy: one degree aggregate + two node-keyed left-semi joins
    * (the keep-set is node-sized, exchanged once per side). Peeling is
    * monotone — each round's edge set is a subset of the last — so the
    * exact fixpoint check is a plain count equality, no anti-join needed.
    * Rounds are bounded by the peel depth (≤ longest chain of cascading
    * removals, log-ish on real graphs), each cut by localCheckpoint.
    *
    * @return (node, deg) — surviving k-core nodes with their core degree
    */
  def kCore(pairs: DataFrame, iCol: String, jCol: String, k: Int,
            maxIter: Int = 20, strict: Boolean = true): DataFrame = {
    require(k >= 1, s"kCore needs k >= 1, got $k")
    var e = pairs.select(col(iCol).cast("long").as("__i"),
        col(jCol).cast("long").as("__j"))
      .filter(col("__i") =!= col("__j"))
      .select(greatest(col("__i"), col("__j")).as("a"),
        least(col("__i"), col("__j")).as("b"))
      .distinct().localCheckpoint(eager = true)
    var eCount = e.count()
    var iter = 0
    var done = eCount == 0L
    def degrees(edges: DataFrame): DataFrame =
      edges.select(col("a").as("node"))
        .unionByName(edges.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
    while (!done && iter < maxIter) {
      val keep = degrees(e).filter(col("deg") >= k).select("node")
      val next = e
        .join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(eager = true)
      val nextCount = next.count()
      done = nextCount == eCount // next ⊆ e: equal count ⇒ equal set
      e = next
      eCount = nextCount
      iter += 1
    }
    if (!done) {
      val msg = s"kCore(k=$k) did not stabilize in $maxIter peel rounds"
      if (strict) throw new IllegalStateException(msg)
      else System.err.println(s"[graft] WARNING: $msg")
    }
    degrees(e)
  }

  /** PageRank restricted to connected components: same scaled-integer
    * power iteration as [[pageRankScaled]], but the teleport mass and the
    * initial rank divide by the node's COMPONENT size, not the global node
    * count — each component's ranks are exactly what [[pageRankScaled]]
    * would produce run on that component alone, computed for all
    * components in one distributed iteration (no per-component driver
    * loop). The natural composition partner of
    * [[starConnectedComponents]]: cluster a similarity/pair graph, then
    * rank centrality within each cluster — e.g. picking the most-connected
    * document of every near-dup cluster as its canonical representative.
    *
    * `components` must be a (node, cluster) relation covering every edge
    * endpoint — which is automatic when it comes from a CC pass over the
    * same edge list. A missing node would silently lose rank mass, so the
    * cover is checked up front (one anti-join count) and violations throw.
    *
    * Output: (node, cluster, rank_scaled) — BIGINT ranks, bit-identical on
    * any engine/partitioning, so the whole pipeline hash-matches a layered
    * recursive-CTE + unrolled-iteration SQL oracle.
    */
  def pageRankScaledPerComponent(edges: DataFrame, srcCol: String,
      dstCol: String, weightCol: String, components: DataFrame,
      iterations: Int = 10, dampingPct: Long = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "pageRankScaledPerComponent needs >= 1 iteration")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be a percentage, got $dampingPct")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(weightCol).cast("long").as("__w"))
    val ew = e.join(e.groupBy("__src").agg(sum("__w").as("__out")), "__src")
      .localCheckpoint(eager = true)
    val maxWRow = ew.agg(max("__w")).head()
    val maxW = if (maxWRow.isNullAt(0)) 0L else maxWRow.getLong(0)
    require(maxW <= Long.MaxValue / scale,
      s"edge weight $maxW would overflow rank*weight at scale=$scale; " +
        s"max supported is ${Long.MaxValue / scale} — rescale the weights " +
        "or pass a smaller scale")
    val uncovered = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
      .join(components.select(col("node")), Seq("node"), "left_anti").count()
    require(uncovered == 0L,
      s"$uncovered edge node(s) missing from the components relation — " +
        "pass the CC output computed over the same edge list")
    val sizes = components.groupBy("cluster").agg(count(lit(1)).as("__n"))
    // per-node exact integers: component-sized teleport and initial rank
    val base = components.join(sizes, "cluster")
      .select(col("node"), col("cluster"),
        expr(s"${scale * (100L - dampingPct)} div (100 * __n)").as("__tp"),
        expr(s"$scale div __n").as("__r0"))
      .localCheckpoint(eager = true)
    var ranks = base.select(col("node"), col("__r0").as("__r"))
    (1 to iterations).foreach { _ =>
      val contrib = ew.join(ranks, col("__src") === col("node"))
        .select(col("__dst").as("node"),
          expr("__r * __w div __out").as("__c"))
        .groupBy("node").agg(sum("__c").as("__contrib"))
      ranks = base.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("__tp") +
            expr(s"$dampingPct * coalesce(__contrib, 0L) div 100")).as("__r"))
        .localCheckpoint(eager = true)
    }
    base.select(col("node"), col("cluster")).join(ranks, Seq("node"))
      .select(col("node"), col("cluster"), col("__r").as("rank_scaled"))
  }

  def pageRankScaled(edges: DataFrame, srcCol: String, dstCol: String,
                     weightCol: String, iterations: Int = 10,
                     dampingPct: Long = 85,
                     scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1, "pageRankScaled needs at least one iteration")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be a percentage, got $dampingPct")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(weightCol).cast("long").as("__w"))
    // out-weight per source riding along on every edge: the per-edge floor
    // division (r*w) div out happens map-side inside the join projection
    val ew = e.join(e.groupBy("__src").agg(sum("__w").as("__out")), "__src")
      .localCheckpoint(eager = true)
    // a rank can hold up to the full `scale` mass, so the per-edge product
    // r*w overflows 64 bits once any weight exceeds Long.MaxValue/scale
    // (~9.2e6 at the default scale) — Spark's non-ANSI multiply would wrap
    // silently; fail loudly instead (the check reads the tiny pinned edge
    // relation, one cheap job). Heavier graphs: pre-normalize the weights
    // or lower `scale`.
    val maxWRow = ew.agg(max("__w")).head()
    val maxW = if (maxWRow.isNullAt(0)) 0L else maxWRow.getLong(0)
    require(maxW <= Long.MaxValue / scale,
      s"edge weight $maxW would overflow rank*weight at scale=$scale; " +
        s"max supported is ${Long.MaxValue / scale} — rescale the weights " +
        "or pass a smaller scale")
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node")))
      .distinct().localCheckpoint(eager = true)
    val n = nodes.count()
    require(n > 0, "pageRankScaled on an empty edge list")
    // exact driver-side integers: teleport mass per node and r0
    val teleport = (scale * (100L - dampingPct)) / (100L * n)
    var ranks = nodes.withColumn("__r", lit(scale / n))
    (1 to iterations).foreach { _ =>
      val contrib = ew.join(ranks, col("__src") === col("node"))
        .select(col("__dst").as("node"),
          expr("__r * __w div __out").as("__c"))
        .groupBy("node").agg(sum("__c").as("__contrib"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"$dampingPct * coalesce(__contrib, 0L) div 100")).as("__r"))
        .localCheckpoint(eager = true)
    }
    ranks.select(col("node"), col("__r").as("rank_scaled"))
  }
}
