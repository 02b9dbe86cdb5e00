package graft

import org.apache.spark.sql.Row
import graft.operators.{Behavior, Graph}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val SCALE = 1000000000000L

  test("pageRankScaled: symmetric cycle keeps the uniform distribution") {
    // a -> b -> c -> a, equal weights: uniform is the exact fixed point,
    // and scaled-integer iteration must hold it exactly (no drift).
    val edges = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRankScaled(edges, "src", "dst", "w", iterations = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val uniform = SCALE / 3
    // teleport (1e12*15)//300 + 85%*(contrib of uniform) reproduces uniform
    // up to the floor in each term; all nodes must agree exactly.
    assert(got.values.toSet.size === 1)
    assert(math.abs(got("a") - uniform) <= 2)
  }

  test("pageRankScaled: a sink-favored hub outranks its spokes") {
    // star: three spokes each pointing at hub, hub points back to one spoke
    val edges = Seq(("s1", "h", 1L), ("s2", "h", 1L), ("s3", "h", 1L),
      ("h", "s1", 1L)).toDF("src", "dst", "w")
    // the h <-> s1 2-cycle damps at 0.85^2 per period, so this graph needs
    // ~30 iterations before the oscillation falls under the equilibrium
    // gap (h* = 0.4796 vs s1* = 0.4452)
    val got = Graph.pageRankScaled(edges, "src", "dst", "w", iterations = 30)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("h") > got("s1"))
    assert(got("s1") > got("s2")) // s1 gets the hub's mass back
    assert(got("s2") === got("s3"))
    // spokes with no in-edges beyond teleport/hub: total mass stays
    // bounded by scale (floor-leak only shrinks it)
    assert(got.values.sum <= SCALE)
  }

  test("pageRankScaled: weights shift rank toward the heavier edge") {
    val edges = Seq(("a", "b", 9L), ("a", "c", 1L),
      ("b", "a", 1L), ("c", "a", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRankScaled(edges, "src", "dst", "w", iterations = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("b") > got("c"))
  }

  test("pageRankScaled is partitioning-invariant (exact integer replay)") {
    val e = Seq(("a", "b", 3L), ("b", "c", 2L), ("c", "a", 5L),
      ("a", "c", 1L)).toDF("src", "dst", "w")
    val r1 = Graph.pageRankScaled(e, "src", "dst", "w", iterations = 6)
      .orderBy("node").collect().toSeq
    val r2 = Graph.pageRankScaled(e.repartition(7), "src", "dst", "w",
      iterations = 6).orderBy("node").collect().toSeq
    assert(r1 === r2)
  }

  test("pageRankScaledPerComponent == pageRankScaled run per component") {
    // two disjoint integer-id components: a 3-cycle and a weighted 2-cycle
    val c1 = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    val c2 = Seq((10L, 11L, 3L), (11L, 10L, 1L))
    val edges = (c1 ++ c2).toDF("src", "dst", "w")
    val pairs = edges.select($"src".as("i"), $"dst".as("j"))
    val comps = Graph.starConnectedComponents(pairs, "i", "j")
    val got = Graph.pageRankScaledPerComponent(
      edges, "src", "dst", "w", comps, iterations = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: the single-graph operator on each component alone
    val exp1 = Graph.pageRankScaled(c1.toDF("src", "dst", "w"),
      "src", "dst", "w", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp2 = Graph.pageRankScaled(c2.toDF("src", "dst", "w"),
      "src", "dst", "w", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { case (node, cluster, rank) =>
      val exp = if (node < 10) exp1 else exp2
      assert(rank === exp(node), s"node $node")
      assert(cluster === (if (node < 10) 1L else 10L))
    }
    assert(got.length === 5)
  }

  test("pageRankScaledPerComponent refuses a components relation with holes") {
    val edges = Seq((1L, 2L, 1L), (2L, 1L, 1L), (3L, 4L, 1L), (4L, 3L, 1L))
      .toDF("src", "dst", "w")
    val partial = Seq((1L, 1L), (2L, 1L)).toDF("node", "cluster")
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankScaledPerComponent(edges, "src", "dst", "w", partial)
    }
    assert(e.getMessage.contains("missing from the components relation"))
  }

  test("starConnectedComponents equals label propagation on a random pair soup") {
    val rnd = new scala.util.Random(20260813L)
    // 3 planted components over disjoint id ranges + random intra-edges
    val pairs = (0 until 3).flatMap { c =>
      val base = c * 100L
      (0 until 40).map { _ =>
        (base + rnd.nextInt(30), base + rnd.nextInt(30))
      }
    }.filter { case (a, b) => a != b }.toDF("i", "j")
    val star = graft.operators.Graph
      .starConnectedComponents(pairs, "i", "j")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = graft.operators.Dedup.connectedComponents(pairs, "i", "j")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star === prop)
    // labels really are component minima, components really are separated
    assert(star.values.toSet.subsetOf(star.keySet))
    assert(star.filter(_._1 < 100L).values.toSet.size === 1)
  }

  test("starConnectedComponents collapses a deep path in few rounds") {
    // path 0-1-2-...-63: diameter 63 would defeat maxIter=25 under label
    // propagation semantics, but star rounds halve depth ~exponentially —
    // converging here is the algorithm's whole point
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("i", "j")
    val got = graft.operators.Graph
      .starConnectedComponents(pairs, "i", "j", maxIter = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 64)
    assert(got.values.toSet === Set(0L))
  }

  test("starConnectedComponents: empty and self-loop-only inputs yield no rows") {
    val selfOnly = Seq((5L, 5L), (7L, 7L)).toDF("i", "j")
    assert(graft.operators.Graph
      .starConnectedComponents(selfOnly, "i", "j").isEmpty)
  }

  test("kCore peels cascading low-degree nodes, keeps the clique") {
    // triangle {1,2,3} with a pendant chain 3-4-5: node 5 peels first
    // (deg 1), which drops 4 to deg 1 so it peels in round TWO — the
    // cascade is what distinguishes k-core from a one-shot degree filter
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("i", "j")
    val got = Graph.kCore(e, "i", "j", k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore with k above the densest core yields no rows") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("i", "j")
    assert(Graph.kCore(e, "i", "j", k = 3).isEmpty)
    // duplicate and reversed pairs must not inflate degrees past the bar
    val dup = Seq((1L, 2L), (2L, 1L), (1L, 2L)).toDF("i", "j")
    assert(Graph.kCore(dup, "i", "j", k = 2).isEmpty)
  }
}

class RollingActivesSpec extends SparkSpec {
  import spark.implicits._

  test("rollingDistinctUsers counts trailing-window distinct actives per observed day") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2026-03-01 09:00:00")), (1L, ts("2026-03-01 10:00:00")),
      (2L, ts("2026-03-02 09:00:00")),
      (1L, ts("2026-03-05 09:00:00")),
      (3L, ts("2026-03-09 09:00:00")))
      .toDF("user_id", "ts")
    val got = Behavior.rollingDistinctUsers(events, "user_id", "ts", days = 3)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    // windows: d1:{1}, d2:{1,2} (d1..d2), d5:{1} (d3..d5 → only d5 active,
    // d2 too old), d9:{3}; days 3,4,6,7,8 unobserved → no rows
    assert(got.toSeq === Seq(
      ("2026-03-01", 1L), ("2026-03-02", 2L),
      ("2026-03-05", 1L), ("2026-03-09", 1L)))
  }

  test("rollingDistinctUsers window covers exactly `days` trailing days") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      (1L, ts("2026-03-01 09:00:00")),
      (2L, ts("2026-03-03 09:00:00")))
      .toDF("user_id", "ts")
    val got = Behavior.rollingDistinctUsers(events, "user_id", "ts", days = 3)
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toSeq
    // day 3 window = days 1..3 → users {1,2}
    assert(got === Seq(("2026-03-01", 1L), ("2026-03-03", 2L)))
  }
}

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  test("firstTouchAttribution credits the first event and ignores self-conversion") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val events = Seq(
      // u1: ad first, converts later
      (1L, ts("2026-01-01 10:00:00"), 1L, "ad"),
      (2L, ts("2026-01-01 11:00:00"), 1L, "purchase"),
      // u2: search first, never converts
      (3L, ts("2026-01-01 10:00:00"), 2L, "search"),
      // u3: purchase IS the first event — no later purchase, not converted
      (4L, ts("2026-01-01 10:00:00"), 3L, "purchase"),
      // u4: tie on ts — event_id breaks it: 5 (ad) before 6 (purchase)
      (5L, ts("2026-01-01 10:00:00"), 4L, "ad"),
      (6L, ts("2026-01-01 10:00:00"), 4L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Behavior.firstTouchAttribution(events, "user_id", "ts",
      "event_id", "event_type", "purchase")
      .orderBy("channel").collect()
    assert(got(0) === Row("ad", 2L, 2L, 1.0))
    assert(got(1) === Row("purchase", 1L, 0L, 0.0))
    assert(got(2) === Row("search", 1L, 0L, 0.0))
  }
}
