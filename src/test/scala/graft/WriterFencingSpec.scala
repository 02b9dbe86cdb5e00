package graft

import graft.core.{Catalog, LayoutStore}

/** Writer fencing (r11 verdict task #4): single-writer-per-warehouse is
  * now EXPLICIT. A catalog stamps `<warehouse>/_writer` with an
  * incremented epoch before its first manifest persist and re-checks the
  * token before every later one — a second writer takes over by
  * stamping the next epoch, and the stale writer's next persist throws
  * instead of silently clobbering the manifest with its outdated
  * in-memory view. Read paths (attach, serve, vacuum, pins) never touch
  * the token.
  */
class WriterFencingSpec extends SparkSpec {

  private def newWarehouse(): String =
    java.nio.file.Files.createTempDirectory("graft_whf_").toString

  test("takeover fences the stale writer; the manifest never interleaves") {
    val wh = newWarehouse()
    val a = new Catalog(spark, Some(wh))
    a.open("wa", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    a.buildRangedLayout("wa", "o_totalprice", files = 4) // acquires epoch 1
    a.buildRangedLayout("wa", "o_custkey", files = 4)    // same token, fine

    // B takes over the warehouse: next epoch, fresh manifest view
    val b = new Catalog(spark, Some(wh))
    b.open("wb", s"$sf/customer.parquet", orderCols = Seq("c_custkey"))
    b.buildRangedLayout("wb", "c_acctbal", files = 4)

    // the STALE writer's next persist fails fast — before touching
    // anything (a fenced writer must not half-apply)
    val e = intercept[IllegalStateException] {
      a.buildRangedLayout("wa", "o_orderkey", files = 4)
    }
    assert(e.getMessage.contains("fenced"))

    // the on-disk manifest holds BOTH writers' pre-takeover entries —
    // B loaded A's entries at construction, so nothing was clobbered —
    // and NOT the fenced attempt
    val slots = LayoutStore.load(spark, wh).map(x => (x.session, x.slot)).toSet
    assert(slots.contains(("wa", "range:o_totalprice")))
    assert(slots.contains(("wa", "range:o_custkey")))
    assert(slots.contains(("wb", "range:c_acctbal")))
    assert(!slots.contains(("wa", "range:o_orderkey")),
      "the fenced persist must not have landed")

    // B (the current writer) keeps persisting freely
    b.buildRangedLayout("wb", "c_custkey", files = 4)

    // a FRESH catalog can take over again — then B is the stale one
    val a2 = new Catalog(spark, Some(wh))
    a2.open("wa2", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    a2.buildRangedLayout("wa2", "r_regionkey", files = 2)
    intercept[IllegalStateException] {
      b.buildRangedLayout("wb", "c_nationkey", files = 4)
    }
    val after = LayoutStore.load(spark, wh).map(x => (x.session, x.slot)).toSet
    assert(after.contains(("wb", "range:c_custkey")) &&
      after.contains(("wa2", "range:r_regionkey")),
      "every pre-fence entry survives every takeover")
  }

  test("fenced-READER law: a superseded catalog's routed reads serve its own consistent state (r12 task #7)") {
    // The chosen law, pinned: fencing stops a stale catalog's WRITES;
    // its READS keep serving the state it last validated — its own
    // sessions and the layouts it built from them (snapshot isolation
    // for the stale process, never an error and never a silent mix of
    // the new writer's state). Cross-process durability of that served
    // state is the PIN lease's job: the other writer's vacuum honors
    // leases and the grace window, so an unpinned stale reader is
    // guaranteed only grace-window continuity — exactly the contract
    // every long-running reader already has.
    val wh = newWarehouse()
    val a = new Catalog(spark, Some(wh))
    a.open("wfr", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    a.buildRangedLayout("wfr", "o_totalprice", files = 4,
      idCol = Some("o_orderkey"))
    val aAnswer = a.rangeScan("wfr", "o_totalprice", 0.0, 1e9).count()

    // B takes over the SAME warehouse, re-opens the SAME table name,
    // mutates it and refreshes — B's manifest now describes a different
    // reality under the name A still serves
    val b = new Catalog(spark, Some(wh))
    b.open("wfr", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    b.sql("DELETE FROM wfr WHERE o_orderkey % 2 = 0")
    assert(b.refreshStale("wfr").nonEmpty) // persists → takes the token
    val bAnswer = b.rangeScan("wfr", "o_totalprice", 0.0, 1e9).count()
    assert(bAnswer < aAnswer)

    // A is now fenced for writes...
    assert(a.get("wfr").get.setCell(0L, "o_totalprice", "1.23"))
    intercept[IllegalStateException] { a.refreshStale("wfr") }
    // ...but A's ROUTED read still serves A's own pre-takeover state:
    // no fencing error, no bleed-through of B's delete. (The session
    // was just edited, so the ranged route correctly steps aside to
    // A's live plan — still A's state: the edited pre-takeover table.)
    assert(a.rangeScan("wfr", "o_totalprice", 0.0, 1e9).count() == aAnswer)

    // and a catalog that attached at open keeps serving ITS OWN
    // validated state after being fenced: c opens the ORIGINAL parquet
    // (not B's post-delete reality), so the diverged-attach machinery
    // patches B's refreshed layout back to c's table — c's answer is
    // c's table, through the layout, before AND after d fences c
    val c = new Catalog(spark, Some(wh))
    c.open("wfr", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    val d = new Catalog(spark, Some(wh))
    d.open("wfd", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    d.buildRangedLayout("wfd", "r_regionkey", files = 2) // fences c
    val cAnswer = c.rangeScan("wfr", "o_totalprice", 0.0, 1e9)
    assert(cAnswer.count() == aAnswer,
      "an attached catalog serves the state it validated at open — its " +
        "own table, never the other writer's")
    assert(c.recentRoutes.exists(r =>
      r.slot == "range:o_totalprice" && r.decision == "layout"),
      s"the fenced reader must still route through its attached " +
        s"layout; routes: ${c.recentRoutes}")
  }

  test("refresh persists are fenced too; reads and vacuum are not") {
    val wh = newWarehouse()
    val a = new Catalog(spark, Some(wh))
    a.open("wr", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    a.buildRangedLayout("wr", "o_totalprice", files = 4,
      idCol = Some("o_orderkey"))

    val b = new Catalog(spark, Some(wh)) // takes over on first persist
    b.open("wr2", s"$sf/region.parquet", orderCols = Seq("r_regionkey"))
    b.buildRangedLayout("wr2", "r_regionkey", files = 2)

    // A's delta refresh would persist the patch → fenced
    assert(a.get("wr").get.setCell(0L, "o_totalprice", "123.45"))
    intercept[IllegalStateException] { a.refreshStale("wr") }

    // but A can still READ (live fallback — the session is mutated, so
    // the stale layout correctly steps aside) and VACUUM (marks merge
    // across processes by design; B's layout survives)
    assert(a.rangeScan("wr", "o_totalprice", 0.0, 1e9).count() > 0)
    a.vacuum(graceMs = 0L)
    assert(b.rangeScan("wr2", "r_regionkey", 0L, 100L).count() == 5L)
  }
}
