package graft

import org.apache.spark.sql.functions._
import graft.core.{Catalog, LayoutStore, Tables}

/** Crash-recovery matrix (r11 verdict task #3): each test constructs the
  * exact on-disk state a kill would leave at one interruption point of
  * the durable write path — data dir written but manifest not yet;
  * manifest mid-rename (target deleted, complete tmp behind); manifest
  * truncated; patch dir stranded before its manifest update; stale
  * vacuum clocks — and asserts the three laws: a reopen serves a
  * CONSISTENT epoch (old or new, never mixed), `refreshStale`
  * self-heals, and vacuum never deletes the recoverable side.
  */
class CrashMatrixSpec extends SparkSpec {

  private def newWarehouse(): String =
    java.nio.file.Files.createTempDirectory("graft_whc_").toString

  private def topDirs(wh: String): Set[String] =
    new java.io.File(wh).listFiles().map(_.getName).toSet

  private def builtCatalog(wh: String): Catalog = {
    val c = new Catalog(spark, Some(wh))
    c.open("cm", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    c.buildRangedLayout("cm", "o_totalprice", files = 4,
      idCol = Some("o_orderkey"))
    c
  }

  private def servesExactly(c: Catalog): Unit = {
    val got = c.rangeScan("cm", "o_totalprice", 1000.0, 50000.0).count()
    val want = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice").between(1000.0, 50000.0)).count()
    assert(got == want, s"serving must stay exact ($got vs $want)")
  }

  test("kill AFTER data dir, BEFORE manifest: old epoch serves; the orphan collects after grace") {
    val wh = newWarehouse()
    builtCatalog(wh)
    // the state a kill inside a second build leaves: a complete data dir
    // the manifest never learned about
    val orphan = s"$wh/catalog_ranged_999_1"
    Tables.load(spark, sf, "region").write.parquet(s"$orphan/ranged")

    val c2 = new Catalog(spark, Some(wh))
    c2.open("cm", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    assert(c2.explainRoute("cm", "range:o_totalprice").reason == "routed",
      "the committed (old) epoch must re-attach — never a mix")
    servesExactly(c2)
    // the orphan is unreferenced but RECOVERABLE-side-adjacent: grace
    // protects it on the first pass, an expired window collects it
    assert(!c2.vacuum(graceMs = 3600000L).contains("catalog_ranged_999_1"))
    assert(topDirs(wh).contains("catalog_ranged_999_1"))
    assert(c2.vacuum(graceMs = 0L).contains("catalog_ranged_999_1"))
    servesExactly(c2)
  }

  test("kill INSIDE the manifest rename window: the complete tmp rolls FORWARD on reopen") {
    val wh = newWarehouse()
    builtCatalog(wh)
    // stagedWrite's window: target deleted, complete tmp not yet renamed
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(s"$wh/_manifest")
    val tmp = new org.apache.hadoop.fs.Path(s"$wh/_manifest_tmp")
    assert(fs.rename(target, tmp), "fixture: reconstruct the crash window")

    // vacuum on the crashed state deletes NOTHING (the dirs the tmp
    // names are the recoverable side)
    val cold = new Catalog(spark, Some(wh))
    assert(cold.vacuum(graceMs = 0L).isEmpty ||
      topDirs(wh).exists(_.startsWith("catalog_ranged_")),
      "vacuum must never delete the recoverable side")

    // reopen completes the rename (read-repair) and serves the NEW epoch
    val c2 = new Catalog(spark, Some(wh))
    c2.open("cm", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    assert(c2.explainRoute("cm", "range:o_totalprice").reason == "routed",
      "the rolled-forward manifest must re-attach the layout")
    servesExactly(c2)
    assert(fs.exists(target) && !fs.exists(tmp),
      "recovery must leave a committed manifest, no tmp")
  }

  test("kill mid-write of the manifest tmp: the half-written tmp never rolls forward") {
    val wh = newWarehouse()
    builtCatalog(wh)
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new org.apache.hadoop.fs.Path(s"$wh/_manifest")
    // the kill happened EARLIER: target already deleted, tmp only half
    // written (a torn json part file)
    fs.delete(target, true)
    val tmpDir = new java.io.File(s"$wh/_manifest_tmp")
    assert(tmpDir.mkdirs())
    val torn = new java.io.File(tmpDir, "part-00000.json")
    val w = new java.io.FileWriter(torn)
    w.write("{\"session\":\"cm\",\"slot\":\"range:o_to") // truncated
    w.close()

    // reopen degrades to live serving — consistent (just slower), and
    // NOTHING is deleted by a vacuum pass on this state
    val c2 = new Catalog(spark, Some(wh))
    c2.open("cm", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    assert(c2.explainRoute("cm", "range:o_totalprice").reason == "no-layout")
    servesExactly(c2) // live fallback answers are exact by construction
    assert(c2.vacuum(graceMs = 0L).isEmpty,
      "an unreadable manifest state must abort the vacuum pass")
    assert(topDirs(wh).exists(_.startsWith("catalog_ranged_")),
      "the recoverable data dirs must survive")
    // self-heal: the next build rewrites a clean manifest and a THIRD
    // catalog attaches it
    c2.buildRangedLayout("cm", "o_totalprice", files = 4,
      idCol = Some("o_orderkey"))
    val c3 = new Catalog(spark, Some(wh))
    c3.open("cm", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    assert(c3.explainRoute("cm", "range:o_totalprice").reason == "routed")
    servesExactly(c3)
  }

  test("TRUNCATED committed manifest: attach degrades, vacuum aborts, rebuild self-heals") {
    val wh = newWarehouse()
    builtCatalog(wh)
    // corrupt the committed manifest's part file in place
    val part = new java.io.File(s"$wh/_manifest").listFiles()
      .filter(_.getName.endsWith(".json")).head
    val bytes = java.nio.file.Files.readAllBytes(part.toPath)
    java.nio.file.Files.write(part.toPath,
      java.util.Arrays.copyOf(bytes, math.max(4, bytes.length / 3)))

    val c2 = new Catalog(spark, Some(wh))
    c2.open("cm", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    assert(c2.explainRoute("cm", "range:o_totalprice").reason == "no-layout",
      "a corrupt manifest must degrade to live, not half-attach")
    servesExactly(c2)
    assert(c2.vacuum(graceMs = 0L).isEmpty,
      "an unreadable manifest must abort the pass — the dirs it names " +
        "are recoverable")
    c2.buildRangedLayout("cm", "o_totalprice", files = 4,
      idCol = Some("o_orderkey"))
    assert(c2.explainRoute("cm", "range:o_totalprice").reason == "routed")
    servesExactly(c2)
  }

  test("kill AFTER a patch dir, BEFORE its manifest update: old epoch serves; refresh self-heals") {
    val wh = newWarehouse()
    val c = builtCatalog(wh)
    // the committed manifest knows the BUILD; a refresh wrote its patch
    // dir and died before persisting the patched entry
    val stray = s"$wh/catalog_patch_999_7"
    Tables.load(spark, sf, "region").write.parquet(s"$stray/add")
    Tables.load(spark, sf, "region").limit(0).write.parquet(s"$stray/removed")

    val c2 = new Catalog(spark, Some(wh))
    c2.open("cm", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    assert(c2.explainRoute("cm", "range:o_totalprice").reason == "routed",
      "the pre-refresh (old) epoch must serve — never the half patch")
    servesExactly(c2)
    // the session edit replays and refreshStale self-heals with a CLEAN
    // patch under the new writer
    assert(c2.get("cm").get.setCell(0L, "o_totalprice", "42424.42"))
    assert(c2.refreshStale("cm").nonEmpty)
    assert(c2.rangeScan("cm", "o_totalprice", 42000.0, 43000.0)
      .filter(col("o_totalprice") === 42424.42).count() == 1L)
    // the stray patch dir is garbage: grace-protected, then collected
    assert(!c2.vacuum(graceMs = 3600000L).contains("catalog_patch_999_7"))
    assert(c2.vacuum(graceMs = 0L).contains("catalog_patch_999_7"))
  }

  test("kill mid-vacuum: stale observation clocks never doom a REFERENCED dir") {
    val wh = newWarehouse()
    val c = builtCatalog(wh)
    val layoutDir = topDirs(wh).find(_.startsWith("catalog_ranged_")).get
    // the state a kill mid-pass leaves: persisted clocks claiming the
    // (now referenced) layout dir has sat unreferenced for an hour
    LayoutStore.saveMarks(spark, wh,
      Map(layoutDir -> (System.currentTimeMillis() - 3600000L)))

    val c2 = new Catalog(spark, Some(wh))
    c2.open("cm", s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    assert(!c2.vacuum(graceMs = 60000L).contains(layoutDir),
      "a referenced dir must survive no matter what stale clocks say")
    assert(topDirs(wh).contains(layoutDir))
    servesExactly(c2)
  }
}
