package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.core.{Catalog, Tables}
import graft.operators.Retrieval

/** Bucketed-by-term postings layout (r8 verdict task #6): a term lookup
  * must be a partition-pruned read of the stored inverted index — never
  * a corpus re-tokenize, never an O(corpus) posting-list string cell —
  * with the answer identical to the live postings plan. Edits
  * invalidate; refreshStale re-routes.
  */
class PostingsLayoutSpec extends SparkSpec {

  private val probes = Seq("join", "vector", "dup")

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    // partition pruning is plan-time, but AQE hides the scan behind the
    // adaptive root — look through it
    val root = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    root.collectFirst { case f: FileSourceScanExec => f }.get
  }

  test("termPostings routes through the bucketed index: partitions pruned, exact answer") {
    val cat = new Catalog(spark)
    cat.open("docs_p", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    cat.buildPostingsLayout("docs_p", "doc_id", "text", buckets = 8)
    val routed = cat.termPostings("docs_p", "doc_id", "text", probes)
    // plan pin 1: the scan reads the stored layout, not the corpus
    val p = routed.queryExecution.executedPlan.toString
    assert(p.contains("catalog_postings"),
      s"routed lookup must read the postings layout; plan:\n$p")
    assert(!p.toLowerCase.contains("explode"),
      s"routed lookup must never re-tokenize the corpus; plan:\n$p")
    // plan pin 2: directory pruning — only the probe terms' hash buckets
    // are selected (3 probes can cover at most 3 of the 8 buckets)
    val scan = scanOf(routed)
    assert(scan.selectedPartitions.partitionCount <= probes.size,
      s"expected <= ${probes.size} of 8 partitions, " +
        s"got ${scan.selectedPartitions.partitionCount}")
    // answer identical to the live tokenize-and-aggregate plan
    val live = Retrieval.postingsFor(
      Tables.load(spark, sf, "documents"), "doc_id", "text", probes)
    assert(routed.orderBy("term").collect().map(_.toSeq).toSeq ==
      live.orderBy("term").collect().map(_.toSeq).toSeq)
  }

  test("edit invalidates; refreshStale delta-patches; unrelated edit revalidates") {
    val cat = new Catalog(spark)
    cat.open("docs_p2", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    cat.buildPostingsLayout("docs_p2", "doc_id", "text", buckets = 8)
    val built = cat.layoutsOf("docs_p2").collectFirst {
      case (_, l: Catalog.PostingsLayout) => l
    }.get
    // a text edit makes the stored index stale: live fallback
    assert(cat.get("docs_p2").get.setCell(0L, "text", "join vector"))
    assert(cat.explainRoute("docs_p2", "postings:text").reason == "stale-epoch")
    val fallback = cat.termPostings("docs_p2", "doc_id", "text", probes)
    assert(!fallback.queryExecution.executedPlan.toString
      .contains("catalog_postings"))
    // refresh DELTA-PATCHES: only the dirty doc re-tokenizes (its 2 new
    // terms are the add rows, its doc id the shadow), base untouched
    assert(cat.refreshStale("docs_p2") == Seq("postings:text"))
    val patched = cat.layoutsOf("docs_p2").collectFirst {
      case (_, l: Catalog.PostingsLayout) => l
    }.get
    assert(patched.path == built.path, "delta must not rewrite the base")
    val pt = patched.patch.get
    assert(pt.add.count() == 2,
      "a 1-doc text edit must re-sign exactly that doc's terms")
    assert(pt.removed.count() == 1, "shadow set = the edited doc id")
    val routed = cat.termPostings("docs_p2", "doc_id", "text", probes)
    assert(routed.queryExecution.executedPlan.toString
      .contains("catalog_postings"))
    // the bucket predicate still prunes THROUGH the patch composition
    // (anti-join + union): Catalyst pushes it to the base scan
    assert(scanOf(routed).selectedPartitions.partitionCount <= probes.size,
      "partition pruning must survive the patch composition")
    assert(routed.orderBy("term").collect().map(_.toSeq).toSeq ==
      fallback.orderBy("term").collect().map(_.toSeq).toSeq)
    // an edit to a column the index doesn't read: revalidate, zero IO
    assert(cat.get("docs_p2").get.setCell(1L, "lang", "xx"))
    assert(cat.refreshStale("docs_p2") == Seq("postings:text"))
    val after = cat.layoutsOf("docs_p2").collectFirst {
      case (_, l: Catalog.PostingsLayout) => l
    }.get
    assert(after.path == built.path, "revalidate must not rebuild")
    // a row DELETE is the cheapest delta of all: the vanished doc id is
    // shadowed out (servedIds EXCEPT currentIds), nothing re-tokenizes,
    // the base files stay untouched
    val s2 = cat.get("docs_p2").get
    val deletedId = s2.current.filter(col("__pos") === 2L)
      .select("doc_id").head().getLong(0)
    assert(s2.deleteRow(2L))
    assert(cat.refreshStale("docs_p2") == Seq("postings:text"))
    val afterDelete = cat.layoutsOf("docs_p2").collectFirst {
      case (_, l: Catalog.PostingsLayout) => l
    }.get
    assert(afterDelete.path == built.path,
      "a delete must shadow-patch, never rewrite the base")
    assert(afterDelete.patch.get.removed.collect().map(_.get(0))
      .contains(deletedId), "the deleted doc id must be in the shadow set")
    val afterDeleteLookup = cat.termPostings("docs_p2", "doc_id", "text",
      probes)
    assert(afterDeleteLookup.orderBy("term").collect().map(_.toSeq).toSeq ==
      Retrieval.postingsFor(
        graft.core.Positional.strip(s2.current), "doc_id", "text", probes)
        .orderBy("term").collect().map(_.toSeq).toSeq,
      "the shadow-patched index must serve the post-delete corpus")
    // a row MOVE (cut + paste) is now a recoverable delta too (r9 task
    // #2): the moved doc re-signs into the patch, the base still stands
    assert(s2.cut(Seq(3L)))
    assert(s2.paste(0L))
    assert(cat.refreshStale("docs_p2") == Seq("postings:text"))
    val moved = cat.layoutsOf("docs_p2").collectFirst {
      case (_, l: Catalog.PostingsLayout) => l
    }.get
    assert(moved.path == built.path, "an insert delta must not rebuild")
    assert(moved.patch.isDefined)
    // a genuinely structural gesture (undo) still rebuilds
    assert(s2.undo())
    assert(cat.refreshStale("docs_p2") == Seq("postings:text"))
    val rebuilt = cat.layoutsOf("docs_p2").collectFirst {
      case (_, l: Catalog.PostingsLayout) => l
    }.get
    assert(rebuilt.path != built.path, "structural gesture must rebuild")
    assert(rebuilt.patch.isEmpty)
  }

  private val bm25Terms = Seq("merge", "vector", "spark")

  private def postingsLayoutOf(cat: Catalog,
                               name: String): Catalog.PostingsLayout =
    cat.layoutsOf(name).collectFirst {
      case (_, l: Catalog.PostingsLayout) => l
    }.get

  test("searchBm25 serves from the index: pruned buckets, no re-tokenize, digits equal live") {
    val cat = new Catalog(spark)
    cat.open("docs_b", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    cat.buildPostingsLayout("docs_b", "doc_id", "text", buckets = 8)
    val routed = cat.searchBm25("docs_b", "doc_id", "text", bm25Terms)
    val p = routed.queryExecution.executedPlan.toString
    assert(p.contains("catalog_postings"),
      s"routed BM25 must read the postings layout; plan:\n$p")
    assert(!p.toLowerCase.contains("explode"),
      s"routed BM25 must never re-tokenize the corpus; plan:\n$p")
    assert(scanOf(routed).selectedPartitions.partitionCount <= bm25Terms.size,
      "only the query terms' hash buckets may open")
    // digit equality with the live corpus-pass BM25: the shared scoring
    // tail over identical (tf, dl, df, stats) inputs
    val live = Retrieval.bm25(Tables.load(spark, sf, "documents"),
      "doc_id", "text", bm25Terms)
    assert(routed.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      live.orderBy("doc_id").collect().map(_.toSeq).toSeq,
      "index-served BM25 must reproduce the live digits")
  }

  test("a text edit re-measures the corpus scalars: patched BM25 equals live post-edit") {
    val cat = new Catalog(spark)
    cat.open("docs_b2", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    cat.buildPostingsLayout("docs_b2", "doc_id", "text", buckets = 8)
    val before = postingsLayoutOf(cat, "docs_b2")
    // the edit changes doc 0's length: dl, tf, avgdl all move
    assert(cat.get("docs_b2").get.setCell(0L, "text",
      "merge merge spark benchmark"))
    assert(cat.refreshStale("docs_b2") == Seq("postings:text"))
    val after = postingsLayoutOf(cat, "docs_b2")
    assert(after.nDocs == before.nDocs, "a cell edit never changes nDocs")
    assert(after.avgdl != before.avgdl,
      "a length-changing text edit must move the stored avgdl")
    val routed = cat.searchBm25("docs_b2", "doc_id", "text", bm25Terms)
    assert(routed.queryExecution.executedPlan.toString
      .contains("catalog_postings"))
    val live = Retrieval.bm25(
      graft.core.Positional.strip(cat.get("docs_b2").get.current),
      "doc_id", "text", bm25Terms)
    assert(routed.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      live.orderBy("doc_id").collect().map(_.toSeq).toSeq,
      "patched index + re-measured scalars must reproduce live digits")
  }

  test("a paste (row insert) delta-patches the postings: moved doc re-tokenizes alone, BM25 exact") {
    val cat = new Catalog(spark)
    cat.open("docs_b3", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    cat.buildPostingsLayout("docs_b3", "doc_id", "text", buckets = 8)
    val before = postingsLayoutOf(cat, "docs_b3")
    val s = cat.get("docs_b3").get
    // cut + paste = one delete gesture + one insert gesture (r9 task #2)
    assert(s.cut(Seq(2L)) && s.paste(0L))
    assert(cat.refreshStale("docs_b3") == Seq("postings:text"))
    val after = postingsLayoutOf(cat, "docs_b3")
    assert(after.path == before.path,
      "an insert delta must never rewrite the bucketed base")
    val addDocs = after.patch.get.add.select("id").distinct().count()
    assert(addDocs == 1L, s"exactly the moved doc re-tokenizes, got $addDocs")
    assert(after.nDocs == before.nDocs && after.avgdl == before.avgdl,
      "moving a doc changes no corpus scalar")
    val routed = cat.searchBm25("docs_b3", "doc_id", "text", bm25Terms)
    assert(routed.queryExecution.executedPlan.toString
      .contains("catalog_postings"))
    val live = Retrieval.bm25(
      graft.core.Positional.strip(s.current), "doc_id", "text", bm25Terms)
    assert(routed.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
      live.orderBy("doc_id").collect().map(_.toSeq).toSeq,
      "patched index must reproduce live digits after a paste")
  }

  test("a manifest entry without BM25 scalars backfills on attach; schema drift declines the route") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_bf_")
      .toString
    val a = new Catalog(spark, Some(wh))
    a.open("docs_bf", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    a.buildPostingsLayout("docs_bf", "doc_id", "text", buckets = 8)
    val live = Retrieval.bm25(Tables.load(spark, sf, "documents"),
      "doc_id", "text", bm25Terms).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    // simulate a pre-scalar manifest (ADVICE r9): strip nDocs/avgdl
    val entries = graft.core.LayoutStore.load(spark, wh)
      .map(e => e.copy(nDocs = None, avgdl = None))
    graft.core.LayoutStore.save(spark, wh, entries)

    val b = new Catalog(spark, Some(wh))
    b.open("docs_bf", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    assert(b.explainRoute("docs_bf", "postings:text").reason == "routed")
    val routed = b.searchBm25("docs_bf", "doc_id", "text", bm25Terms)
    assert(routed.queryExecution.executedPlan.toString
      .contains("catalog_postings"))
    assert(routed.orderBy("doc_id").collect().map(_.toSeq).toSeq == live,
      "backfilled scalars must reproduce the live BM25 digits")
    // the backfill must persist: a third open reads real scalars
    assert(graft.core.LayoutStore.load(spark, wh)
      .forall(e => e.nDocs.isDefined && e.avgdl.isDefined))

    // schema drift: a stored index lacking tf/dl must never route —
    // overwrite the postings files with a two-column shape
    val pl = postingsLayoutOf(b, "docs_bf")
    val drifted = spark.read.parquet(pl.path).select("term", "doc")
      .localCheckpoint(true) // pin blocks: the overwrite targets the source dir
    drifted.write.mode("overwrite").parquet(pl.path)
    val c = new Catalog(spark, Some(wh))
    c.open("docs_bf", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    assert(c.explainRoute("docs_bf", "postings:text").reason != "routed",
      "an index without BM25 columns must decline the route")
    assert(c.searchBm25("docs_bf", "doc_id", "text", bm25Terms)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq == live,
      "the declined route must fall back to live BM25")
  }

  test("postings layout survives a catalog restart over the same warehouse") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh_post_")
      .toString
    val cat = new Catalog(spark, Some(wh))
    cat.open("docs_p3", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    cat.buildPostingsLayout("docs_p3", "doc_id", "text", buckets = 8)
    val expect = cat.termPostings("docs_p3", "doc_id", "text", probes)
      .orderBy("term").collect().map(_.toSeq).toSeq
    val cat2 = new Catalog(spark, Some(wh))
    cat2.open("docs_p3", s"$sf/documents.parquet", orderCols = Seq("doc_id"))
    assert(cat2.explainRoute("docs_p3", "postings:text").reason == "routed")
    val served = cat2.termPostings("docs_p3", "doc_id", "text", probes)
    assert(served.queryExecution.executedPlan.toString
      .contains("catalog_postings"))
    assert(served.orderBy("term").collect().map(_.toSeq).toSeq == expect)
  }

  test("stream-maintained postings: arrival-order invariant, BM25 digit-equal to one-shot") {
    import graft.streaming.EventStreams
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "text")
    val terms = Seq("merge", "vector", "spark")
    val expected = graft.operators.Retrieval
      .bm25(docs, "doc_id", "text", terms)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq

    def slices(reverse: Boolean): String = {
      val scratch = java.nio.file.Files
        .createTempDirectory("st_post_spec_").toString + "/src"
      val order = if (reverse) 2 to 0 by -1 else 0 to 2
      order.foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(scratch)
        Thread.sleep(20)
      }
      scratch
    }
    def servedFrom(src: String, qn: String): Seq[Seq[Any]] = {
      val (postings, n, avgdl) = EventStreams.postingsMaintain(
        spark, src, "doc_id", "text", buckets = 8, qn)
      // the sidecar scalars replay postingsStats exactly
      val (n0, a0) = graft.operators.Retrieval.postingsStats(docs, "text")
      assert(n == n0 && avgdl == a0,
        "maintained corpus scalars must equal the one-shot stats")
      graft.operators.Retrieval.bm25FromPostings(spark, postings, 8,
          n, avgdl, "doc_id", terms)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    }
    assert(servedFrom(slices(reverse = false), "st_post_fwd") == expected,
      "3 merged micro-batches must reproduce the one-shot BM25 digits")
    assert(servedFrom(slices(reverse = true), "st_post_rev") == expected,
      "arrival order must not move a digit — postings unions commute")
  }

  test("a re-delivered doc UPSERTS in the maintained postings — last writer wins") {
    import graft.streaming.EventStreams
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 50)
    val updated = docs.filter(col("doc_id") === 7L)
      .withColumn("text", lit("merge vector spark merge"))
    val scratch = java.nio.file.Files
      .createTempDirectory("st_post_upsert_").toString + "/src"
    docs.coalesce(1).write.mode("append").parquet(scratch)
    Thread.sleep(20)
    updated.coalesce(1).write.mode("append").parquet(scratch) // replay/update
    val (postings, n, avgdl) = EventStreams.postingsMaintain(
      spark, scratch, "doc_id", "text", buckets = 8, "st_post_upsert")
    // exactly one generation per doc: nDocs is the DISTINCT doc count
    assert(n == 50L, s"re-delivery must not double-count docs (n=$n)")
    val latest = docs.filter(col("doc_id") =!= 7L).unionByName(updated)
    val (n0, a0) = graft.operators.Retrieval.postingsStats(latest, "text")
    assert(n == n0 && avgdl == a0,
      "scalars must reflect the LATEST generation of the updated doc")
    val served = graft.operators.Retrieval.bm25FromPostings(spark,
        postings, 8, n, avgdl, "doc_id", Seq("merge", "vector", "spark"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(served == graft.operators.Retrieval
      .bm25(latest, "doc_id", "text", Seq("merge", "vector", "spark"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq,
      "scores must be digit-equal to a one-shot build over the latest docs")
  }

  test("a doc re-delivered WITHIN one micro-batch upserts too — no double count") {
    import graft.streaming.EventStreams
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") < 50)
    val updated = docs.filter(col("doc_id") === 7L)
      .withColumn("text", lit("merge vector spark merge"))
    val scratch = java.nio.file.Files
      .createTempDirectory("st_post_inb_").toString + "/src"
    // BOTH generations of doc 7 in ONE file → one micro-batch; the
    // later row in the file must win and nDocs must not double-count
    docs.unionByName(updated).coalesce(1).write.mode("append")
      .parquet(scratch)
    val (postings, n, avgdl) = EventStreams.postingsMaintain(
      spark, scratch, "doc_id", "text", buckets = 8, "st_post_inbatch")
    assert(n == 50L,
      s"within-batch re-delivery must not double-count docs (n=$n)")
    val latest = docs.filter(col("doc_id") =!= 7L).unionByName(updated)
    val (n0, a0) = graft.operators.Retrieval.postingsStats(latest, "text")
    assert(n == n0 && avgdl == a0,
      "scalars must reflect the LATEST generation from within the batch")
    val served = graft.operators.Retrieval.bm25FromPostings(spark,
        postings, 8, n, avgdl, "doc_id", Seq("merge", "vector", "spark"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(served == graft.operators.Retrieval
      .bm25(latest, "doc_id", "text", Seq("merge", "vector", "spark"))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq,
      "scores must be digit-equal to a one-shot build over the latest docs")
  }
}
