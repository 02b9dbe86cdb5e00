package graft

import org.apache.spark.sql.functions._
import graft.core.{Catalog, Tables}

/** Durable-warehouse catalog (r8 verdict task #2): layouts built under a
  * warehouse root must survive the catalog object — a NEW Catalog over
  * the same warehouse re-attaches them when the session reopens, routes
  * queries through the stored files (plan-pinned: no re-encode), and
  * refuses to re-attach when the reopened data is not the data the
  * layout was built from (digest gate).
  */
class DurableCatalogSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def newWarehouse(): String =
    java.nio.file.Files.createTempDirectory("graft_wh_").toString

  private def queryVec(): Seq[Float] =
    Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") === 0L)
      .head().getAs[scala.collection.Seq[Float]]("embedding").toSeq

  test("PQ layout built once serves a NEW catalog over the same warehouse: no re-encode") {
    val wh = newWarehouse()
    val a = new Catalog(spark, Some(wh))
    a.open("demb", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    a.buildPqLayout("demb", "vec_id", "embedding")
    val fromA = a.topK("demb", "vec_id", "embedding", queryVec(), 5)
      .collect().map(_.toSeq).toSeq
    a.close("demb")

    // a fresh catalog object — the in-memory layout map starts empty, so
    // everything it knows comes from the warehouse manifest
    val b = new Catalog(spark, Some(wh))
    b.open("demb", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    assert(b.explainRoute("demb", "ann:embedding").reason == "routed",
      "reloaded layout must be valid at the reopened session's epoch")
    val routed = b.topK("demb", "vec_id", "embedding", queryVec(), 5)
    val p = plan(routed)
    assert(!p.contains("embedding"),
      s"reloaded layout must serve without re-encoding; plan:\n$p")
    assert(p.contains("codes"),
      s"reloaded layout must scan the stored codes; plan:\n$p")
    assert(routed.collect().map(_.toSeq).toSeq == fromA,
      "the reloaded layout must return the builder catalog's answer")
    // storage census agrees
    assert(b.layoutsOf("demb").map(_._1) == Seq("ann:embedding"))
  }

  test("digest gate: different data under a reused session name never routes") {
    val wh = newWarehouse()
    val a = new Catalog(spark, Some(wh))
    a.open("gated", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    a.buildPqLayout("gated", "vec_id", "embedding")

    // the tiny bound keeps the half-table divergence below OUT of the
    // diverged-attach delta path, so this test still pins the dormant
    // fallback (at production bounds a ≤4096-key divergence would
    // attach PATCHED — see the durable-delta test)
    val c = new Catalog(spark, Some(wh), deltaMaxRowsOverride = Some(8))
    // same name, DIFFERENT table content: the stored codes describe rows
    // this session does not have
    c.openFrom("gated",
      Tables.load(spark, sf, "embeddings").filter(col("vec_id") % 2 === 0),
      orderCols = Seq("vec_id"))
    assert(c.explainRoute("gated", "ann:embedding").reason == "no-layout",
      "a digest mismatch must leave the manifest entry dormant")
    assert(c.recentRoutes.contains(
      Catalog.RouteReport("ann:embedding", "live", "digest-mismatch")),
      s"the refusal must be observable; log: ${c.recentRoutes}")
    val p = plan(c.topK("gated", "vec_id", "embedding", queryVec(), 5))
    assert(p.contains("embedding"),
      s"mismatched data must fall back to the live plan; plan:\n$p")
  }

  test("ranged + LSH layouts reload; an edit goes stale and refreshStale re-persists") {
    val wh = newWarehouse()
    val a = new Catalog(spark, Some(wh))
    a.open("dli", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    a.buildRangedLayout("dli", "l_extendedprice", files = 8)
    val d = Tables.load(spark, sf, "documents")
    a.openFrom("dcorp", d.filter(col("doc_id") % 5 =!= 0),
      orderCols = Seq("doc_id"))
    a.buildLshLayout("dcorp", "doc_id", "text", n = 3, numHashes = 32,
      bands = 16)

    val b = new Catalog(spark, Some(wh))
    b.open("dli", s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    b.openFrom("dcorp", d.filter(col("doc_id") % 5 =!= 0),
      orderCols = Seq("doc_id"))
    // ranged: routed through the warehouse files, answer exact
    assert(b.explainRoute("dli", "range:l_extendedprice").reason == "routed")
    val scan = b.rangeScan("dli", "l_extendedprice", 1000.0, 5000.0)
    assert(plan(scan).contains("catalog_ranged"),
      s"reloaded ranged layout must serve the scan; plan:\n${plan(scan)}")
    val live = Tables.load(spark, sf, "lineitem")
      .filter(col("l_extendedprice").between(1000.0, 5000.0))
    assert(scan.count() == live.count())
    // lsh: routed probe equals an index built directly from the corpus
    assert(b.explainRoute("dcorp", "lsh:text").reason == "routed")
    val batch = d.filter(col("doc_id") % 5 === 0)
    val probed = b.nearDups("dcorp", batch, "doc_id", "text",
      threshold = 0.4, n = 3, numHashes = 32, bands = 16)
    val direct = graft.operators.Dedup.incrementalLshMatches(
      graft.operators.Dedup.lshIndex(d.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "text", 3, 32, 16),
      batch, "doc_id", "text", 3, 0.4, 32, 16)
    assert(probed.orderBy("batch_id", "corpus_id").collect().toSeq ==
      direct.orderBy("batch_id", "corpus_id").collect().toSeq)
    // an edit in the NEW catalog invalidates, refreshStale rebuilds into
    // the warehouse, and a THIRD catalog sees the refreshed layout
    assert(b.get("dli").get.setCell(0L, "l_quantity", "42"))
    assert(b.explainRoute("dli", "range:l_extendedprice").reason ==
      "stale-epoch")
    assert(b.refreshStale("dli") == Seq("range:l_extendedprice"))
    assert(b.explainRoute("dli", "range:l_extendedprice").reason == "routed")
    val c3 = new Catalog(spark, Some(wh))
    c3.openFrom("dli",
      graft.core.Positional.strip(b.get("dli").get.current),
      orderCols = Seq("l_orderkey", "l_linenumber"))
    assert(c3.explainRoute("dli", "range:l_extendedprice").reason == "routed",
      "the refreshed layout's manifest entry must describe the EDITED table")
  }

  test("durable delta: a diverged reopen delta-patches from the row-sig sidecar (r9 task #4)") {
    import graft.operators.Similarity
    val wh = newWarehouse()
    val a = new Catalog(spark, Some(wh))
    a.open("ddelta", s"$sf/embeddings.parquet", orderCols = Seq("vec_id"))
    a.buildPqLayout("ddelta", "vec_id", "embedding")
    val built = a.layoutsOf("ddelta").collectFirst {
      case (_, p: Catalog.PqCodesLayout) => p
    }.get

    // out-of-process divergence: the next catalog opens an EDITED
    // version of the source (one id renamed, one row deleted) — the old
    // session's mutation log died with it, so only the persisted
    // signatures can recover the delta
    val edited = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") =!= 7L)
      .withColumn("vec_id",
        when(col("vec_id") === 3L, lit(999999L)).otherwise(col("vec_id")))
      .localCheckpoint(true)
    val b = new Catalog(spark, Some(wh))
    b.openFrom("ddelta", edited, orderCols = Seq("vec_id"))
    assert(b.explainRoute("ddelta", "ann:embedding").reason == "routed",
      "a bounded divergence must attach PATCHED, not dormant")
    val l = b.layoutsOf("ddelta").collectFirst {
      case (_, p: Catalog.PqCodesLayout) => p
    }.get
    assert(l.path == built.path,
      "the diverged attach must reuse the stored base, never rebuild")
    assert(l.patch.isDefined && l.patch.get.add.count() == 1,
      "exactly the renamed id re-encodes")
    val routed = b.topK("ddelta", "vec_id", "embedding", queryVec(), 10)
    assert(!plan(routed).contains("embedding"),
      s"diverged serving must not re-encode the corpus; plan:\n" +
        plan(routed))
    val expect = Similarity.pqTopKFromCodes(
      Similarity.pqCodes(edited, "vec_id", "embedding", built.seeds),
      built.seeds, queryVec(), k = 10).collect().map(_.toSeq).toSeq
    assert(routed.collect().map(_.toSeq).toSeq == expect,
      "the patched attach must equal a full re-encode of the edited table")

    // the manifest re-recorded the new digest: a THIRD open over the
    // same edited table attaches through the fast digest path
    val c2 = new Catalog(spark, Some(wh))
    c2.openFrom("ddelta", edited, orderCols = Seq("vec_id"))
    assert(c2.explainRoute("ddelta", "ann:embedding").reason == "routed")
    assert(c2.topK("ddelta", "vec_id", "embedding", queryVec(), 10)
      .collect().map(_.toSeq).toSeq == expect)
  }
}
