package graft

import org.apache.spark.sql.functions._
import graft.core.{Catalog, Positional, Tables}
import graft.core.Catalog.{LshIndexLayout, PqCodesLayout}
import graft.operators.{Dedup, Similarity}

/** Incremental layout maintenance (r8 verdict task #3): refreshStale must
  * not re-encode the corpus after every edit. Three regimes, decided from
  * the session's mutation log:
  *   - edits to columns a keyed layout doesn't use → REVALIDATE (zero IO);
  *   - bounded cell edits on its columns → DELTA PATCH (re-encode/re-sign
  *     only the dirty rows; base files untouched);
  *   - structural gestures / oversized deltas / full-row layouts → the
  *     old full rebuild.
  * Answers must be identical to a full rebuild with the same frozen
  * quantizer in every regime.
  */
class IncrementalRefreshSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def queryVec(): Seq[Float] =
    Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") === 0L)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq

  private def pqLayout(cat: Catalog, name: String): PqCodesLayout =
    cat.layoutsOf(name).collectFirst { case (_, p: PqCodesLayout) => p }.get

  test("edit to an unrelated column revalidates the ANN layout with zero IO") {
    val cat = new Catalog(spark)
    cat.open("inc1", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    cat.buildPqLayout("inc1", "vec_id", "embedding")
    val before = pqLayout(cat, "inc1")
    assert(cat.get("inc1").get.setCell(0L, "label", "42"))
    assert(cat.explainRoute("inc1", "ann:embedding").reason == "stale-epoch")
    assert(cat.refreshStale("inc1") == Seq("ann:embedding"))
    val after = pqLayout(cat, "inc1")
    // same stored bytes, no patch, no rebuild — only the epoch moved
    assert(after.path == before.path, "revalidate must not rebuild")
    assert(after.patch.isEmpty, "revalidate must not patch")
    assert(cat.explainRoute("inc1", "ann:embedding").reason == "routed")
  }

  test("id rename delta-patches the PQ layout: 1 add row, base untouched, exact answers") {
    val cat = new Catalog(spark)
    cat.open("inc2", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    cat.buildPqLayout("inc2", "vec_id", "embedding")
    val before = pqLayout(cat, "inc2")
    // rename one id: the stored row for the old id must vanish from the
    // served view, the new id must appear with the SAME codes
    assert(cat.get("inc2").get.setCell(0L, "vec_id", "999999"))
    assert(cat.refreshStale("inc2") == Seq("ann:embedding"))
    val after = pqLayout(cat, "inc2")
    assert(after.path == before.path, "delta must not rewrite the base")
    val patch = after.patch.get
    assert(patch.add.count() == 1,
      "a 1-row edit must re-encode exactly 1 row")
    assert(patch.removed.count() == 2,
      "shadow set = the renamed-away id + the re-encoded id")
    // the routed search equals a full re-encode with the SAME codebook
    val edited = Positional.strip(cat.get("inc2").get.current)
    val expect = Similarity.pqTopKFromCodes(
      Similarity.pqCodes(edited, "vec_id", "embedding", before.seeds),
      before.seeds, queryVec(), k = 10).collect().map(_.toSeq).toSeq
    val routed = cat.topK("inc2", "vec_id", "embedding", queryVec(), 10)
    assert(!plan(routed).contains("embedding"),
      s"patched serving must not re-encode the corpus; plan:\n${plan(routed)}")
    assert(routed.collect().map(_.toSeq).toSeq == expect)
    // a second edit merges into ONE patch (adds accumulate, still tiny)
    assert(cat.get("inc2").get.setCell(1L, "vec_id", "888888"))
    assert(cat.refreshStale("inc2") == Seq("ann:embedding"))
    val p2 = pqLayout(cat, "inc2").patch.get
    assert(p2.add.count() == 2 && pqLayout(cat, "inc2").path == before.path)
    val expect2 = Similarity.pqTopKFromCodes(
      Similarity.pqCodes(Positional.strip(cat.get("inc2").get.current),
        "vec_id", "embedding", before.seeds),
      before.seeds, queryVec(), k = 10).collect().map(_.toSeq).toSeq
    assert(cat.topK("inc2", "vec_id", "embedding", queryVec(), 10)
      .collect().map(_.toSeq).toSeq == expect2)
  }

  test("text edit delta-patches the LSH index: 1 doc re-signed, probe exact") {
    val cat = new Catalog(spark)
    val d = Tables.load(spark, sf, "documents")
    cat.openFrom("inc3", d.filter(col("doc_id") % 5 =!= 0),
      orderCols = Seq("doc_id"))
    cat.buildLshLayout("inc3", "doc_id", "text", n = 3, numHashes = 32,
      bands = 16)
    assert(cat.get("inc3").get.setCell(3L, "text",
      "an entirely rewritten document body"))
    assert(cat.refreshStale("inc3") == Seq("lsh:text"))
    val l = cat.layoutsOf("inc3").collectFirst {
      case (_, p: LshIndexLayout) => p
    }.get
    val patch = l.patch.get
    assert(patch.add.count() == 1, "one edited doc must re-sign alone")
    assert(patch.removed.count() == 1, "ids untouched: shadow only the re-signed id")
    // probing the patched index equals probing a fresh index of the
    // edited corpus built with the same parameters
    val batch = d.filter(col("doc_id") % 5 === 0)
    val probed = cat.nearDups("inc3", batch, "doc_id", "text",
      threshold = 0.4, n = 3, numHashes = 32, bands = 16)
    val direct = Dedup.incrementalLshMatches(
      Dedup.lshIndex(Positional.strip(cat.get("inc3").get.current),
        "doc_id", "text", 3, 32, 16),
      batch, "doc_id", "text", 3, 0.4, 32, 16)
    assert(probed.orderBy("batch_id", "corpus_id").collect().toSeq ==
      direct.orderBy("batch_id", "corpus_id").collect().toSeq)
  }

  test("a pure row delete shadow-patches: no re-encode, deleted id gone from search") {
    val cat = new Catalog(spark)
    cat.open("inc4", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    cat.buildPqLayout("inc4", "vec_id", "embedding")
    val before = pqLayout(cat, "inc4")
    val s = cat.get("inc4").get
    val deletedId = s.current.filter(col("__pos") === 0L)
      .select("vec_id").head().getLong(0)
    assert(s.deleteRow(0L))
    assert(cat.refreshStale("inc4") == Seq("ann:embedding"))
    val after = pqLayout(cat, "inc4")
    assert(after.path == before.path,
      "a delete must shadow-patch, never rebuild the codes")
    assert(after.patch.isDefined &&
      after.patch.get.add.count() == 0L,
      "nothing re-encodes on a pure delete")
    assert(after.patch.get.removed.collect().map(_.get(0))
      .contains(deletedId), "the deleted id must be shadowed")
    val got = cat.topK("inc4", "vec_id", "embedding", queryVec(), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(!got.contains(deletedId),
      "a routed search must never return a deleted row")

    // a gesture that MOVES rows (cut + paste = delete + insert of the
    // same id) is a recoverable delta too (r9 task #2): the moved row
    // re-encodes alone, the base still never rewrites
    assert(s.cut(Seq(1L)) && s.paste(0L))
    assert(cat.refreshStale("inc4") == Seq("ann:embedding"))
    val moved = pqLayout(cat, "inc4")
    assert(moved.path == before.path,
      "a cut+paste must delta-patch, never rebuild the codes")
    assert(moved.patch.get.add.count() == 1,
      "exactly the moved row re-encodes")
    // a genuinely structural gesture (undo) still rebuilds
    assert(s.undo())
    assert(cat.refreshStale("inc4") == Seq("ann:embedding"))
    val rebuilt = pqLayout(cat, "inc4")
    assert(rebuilt.path != before.path,
      "a structural gesture must rebuild into fresh storage")
    assert(rebuilt.patch.isEmpty)
  }

  test("paste of k rows re-encodes exactly k; routed answers digit-equal to rebuild") {
    val cat = new Catalog(spark)
    cat.open("inc6", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    cat.buildPqLayout("inc6", "vec_id", "embedding")
    val before = pqLayout(cat, "inc6")
    val s = cat.get("inc6").get
    // move a 3-row block to the front: one delete gesture + one insert
    // gesture over the same ids
    assert(s.cut(Seq(10L, 11L, 12L)) && s.paste(0L))
    assert(cat.refreshStale("inc6") == Seq("ann:embedding"))
    val after = pqLayout(cat, "inc6")
    assert(after.path == before.path, "insert delta must not rebuild")
    assert(after.patch.get.add.count() == 3,
      "exactly the k inserted rows re-encode")
    val expect = Similarity.pqTopKFromCodes(
      Similarity.pqCodes(Positional.strip(s.current), "vec_id",
        "embedding", before.seeds),
      before.seeds, queryVec(), k = 10).collect().map(_.toSeq).toSeq
    assert(cat.topK("inc6", "vec_id", "embedding", queryVec(), 10)
      .collect().map(_.toSeq).toSeq == expect)
  }

  test("a delete past deltaMaxRows rebuilds; one within it stays patch-only (r9 finding #1)") {
    // tiny bound so the spec exercises the guard without a 4096-literal
    // delete plan
    val cat = new Catalog(spark, None, deltaMaxRowsOverride = Some(4))
    cat.open("inc7", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    cat.buildPqLayout("inc7", "vec_id", "embedding")
    val before = pqLayout(cat, "inc7")
    val s = cat.get("inc7").get
    // within the bound: shadow-patch, base untouched
    assert(s.deleteRows(Seq(0L, 1L, 2L)))
    assert(cat.refreshStale("inc7") == Seq("ann:embedding"))
    val patched = pqLayout(cat, "inc7")
    assert(patched.path == before.path && patched.patch.isDefined,
      "a bounded delete must shadow-patch")
    assert(patched.patch.get.add.count() == 0)
    // past the bound: the except-leg would collect more ids than the
    // patch invariant allows — rebuild instead
    assert(s.deleteRows(Seq(0L, 1L, 2L, 3L, 4L)))
    assert(cat.refreshStale("inc7") == Seq("ann:embedding"))
    val rebuilt = pqLayout(cat, "inc7")
    assert(rebuilt.path != before.path,
      "a mass delete must rebuild, never collect unbounded ids")
    assert(rebuilt.patch.isEmpty)
  }

  test("accumulated patch legs past the bound MERGE-COMPACT: codes copy, codebook preserved") {
    // tiny bound: compaction fires at 8x deltaMaxRows = 8 accumulated
    // patch rows, reachable in a handful of 1-cell rename cycles
    val cat = new Catalog(spark, None, deltaMaxRowsOverride = Some(1))
    cat.open("cmp", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    cat.buildPqLayout("cmp", "vec_id", "embedding")
    val built = pqLayout(cat, "cmp")
    val builtPath = built.path
    val s = cat.get("cmp").get
    var rebuilt = false
    var i = 0
    while (!rebuilt && i < 16) {
      assert(s.setCell(i.toLong, "vec_id", (9000000L + i).toString))
      cat.refreshStale("cmp")
      rebuilt = pqLayout(cat, "cmp").path != builtPath
      i += 1
    }
    assert(rebuilt,
      "ever-growing merged patch legs must compact into a fresh base")
    assert(pqLayout(cat, "cmp").patch.isEmpty,
      "the compacted layout starts with no patch")
    // r11: compaction is a MERGE (stored codes copied, patch folded in),
    // never a corpus re-encode — the original codebook survives it
    assert(pqLayout(cat, "cmp").seeds.toSeq == built.seeds.toSeq,
      "merge-compaction must preserve the build-time codebook")
    // and the compacted layout still answers exactly
    val edited = Positional.strip(s.current)
    val after = pqLayout(cat, "cmp")
    val expect = Similarity.pqTopKFromCodes(
      Similarity.pqCodes(edited, "vec_id", "embedding", after.seeds),
      after.seeds, queryVec(), k = 5).collect().map(_.toSeq).toSeq
    assert(cat.topK("cmp", "vec_id", "embedding", queryVec(), 5)
      .collect().map(_.toSeq).toSeq == expect)
  }

  test("a delta-patched durable layout reloads patched in a new catalog") {
    val wh = java.nio.file.Files.createTempDirectory("graft_whp_").toString
    val a = new Catalog(spark, Some(wh))
    a.open("incd", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    a.buildPqLayout("incd", "vec_id", "embedding")
    val seeds = pqLayout(a, "incd").seeds
    assert(a.get("incd").get.setCell(0L, "vec_id", "777777"))
    assert(a.refreshStale("incd") == Seq("ann:embedding"))
    val edited = Positional.strip(a.get("incd").get.current)
      .localCheckpoint(true)
    val expect = Similarity.pqTopKFromCodes(
      Similarity.pqCodes(edited, "vec_id", "embedding", seeds), seeds,
      queryVec(), k = 10).collect().map(_.toSeq).toSeq

    val b = new Catalog(spark, Some(wh))
    b.openFrom("incd", edited, orderCols = Seq("vec_id"))
    assert(b.explainRoute("incd", "ann:embedding").reason == "routed",
      "the patched layout's digest must describe the edited table")
    assert(pqLayout(b, "incd").patch.isDefined, "patch must reload")
    assert(b.topK("incd", "vec_id", "embedding", queryVec(), 10)
      .collect().map(_.toSeq).toSeq == expect)
  }
}
