package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.streaming.EventStreams

class DedupSpec extends SparkSpec {
  private lazy val docs = Tables.load(spark, sf, "documents")

  test("exact dedup keeps every distinct fingerprint once") {
    val d = Dedup.exact(docs, "doc_id", "text")
    assert(d.count() == d.select("fp").distinct().count())
    assert(d.agg(sum("n_dupes")).head.getLong(0) == docs.count())
  }

  test("LSH candidates reproduce the exact jaccard join (recall 1.0 here)") {
    val exact = Dedup.shingleJaccardPairs(docs, "doc_id", "text", 3, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 0.4, 32, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "expected planted near-dup pairs in documents")
    assert(lsh == exact, s"LSH missed ${exact -- lsh}, extra ${lsh -- exact}")
  }

  test("incremental LSH against a persisted index == exact cross-split pairs") {
    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val exactPairs: Set[(Long, Long)] =
      Dedup.shingleJaccardPairs(docs, "doc_id", "text", 3, 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactCross = exactPairs
      .collect { case (i, j) if (i % 5 == 0) != (j % 5 == 0) =>
        if (i % 5 == 0) (i, j) else (j, i) }
    assert(exactCross.nonEmpty, "expected planted cross-split near-dup pairs")
    // the index is a plain relation: round-trip it through parquet to prove
    // the persisted artifact (not the in-session plan) drives the probe
    val dir = java.nio.file.Files.createTempDirectory("graft-lshidx").toString
    Dedup.lshIndex(corpus, "doc_id", "text", 3, 32, 16)
      .write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val got = Dedup.incrementalLshMatches(stored, batch, "doc_id", "text",
        3, 0.4, 32, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exactCross,
      s"incremental missed ${exactCross -- got}, extra ${got -- exactCross}")
  }

  test("prefix-filtered join == brute-force jaccard join, row for row") {
    val exact = Dedup.shingleJaccardPairs(docs, "doc_id", "text", 3, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pf = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
        3, tNum = 2, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "expected planted near-dup pairs in documents")
    assert(pf == exact, s"prefix join missed ${exact -- pf}, extra ${pf -- exact}")
  }

  test("prefix filter finds a pair sitting exactly at the threshold") {
    import spark.implicits._
    // 5 distinct 3-shingles each, sharing exactly 2: J = 2/(5+5-2) = 0.25
    val d = Seq(
      (1L, "a b c d e f g"), // shingles: abc bcd cde def efg
      (2L, "a b c d x y z w")) // shingles: abc bcd cdx dxy xyz yzw -> 6 sets
      .toDF("doc_id", "text")
    // shared prefix shingles exist, J(1,2) = |{abc,bcd}| / (5+6-2) = 2/9
    val at = Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
      3, tNum = 2, tDen = 9)
    assert(at.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L)))
    val above = Dedup.prefixFilterJaccardPairs(d, "doc_id", "text",
      3, tNum = 1, tDen = 4) // 2/9 < 1/4: must be rejected
    assert(above.count() == 0)
  }

  test("stop-shingle cap drops hot shingles but keeps near-dup pairs") {
    val capped = Dedup.shingleJaccardPairs(docs, "doc_id", "text", 3, 0.4,
      maxShingleDf = Some(50))
    val exact = Dedup.shingleJaccardPairs(docs, "doc_id", "text", 3, 0.4)
    // jaccard values change (shingles removed) but the high-sim pairs survive
    assert(capped.count() >= exact.count() / 2)
  }

  test("simhash pairs include the strongest jaccard near-dups") {
    val top = Dedup.shingleJaccardPairs(docs, "doc_id", "text", 3, 0.4)
      .orderBy(col("jaccard").desc).limit(3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top.subsetOf(sim),
      s"simhash (ham<=8) missed strong near-dups: ${top -- sim}")
  }
}

class SimilaritySpec extends SparkSpec {
  private lazy val embs = Tables.load(spark, sf, "embeddings")
  private lazy val query: Seq[Float] = embs.filter(col("vec_id") === 0L)
    .head.getAs[scala.collection.Seq[Float]]("embedding").toSeq

  test("brute-force topK is ordered desc and self-similarity is 1") {
    val self = Similarity.topK(embs, "vec_id", "embedding", query, 1)
    assert(self.head.getLong(0) == 0L && self.head.getDouble(1) == 1.0)
    val sims = Similarity.topK(embs, "vec_id", "embedding", query, 10)
      .collect().map(_.getDouble(1))
    assert(sims.sameElements(sims.sortBy(-_)))
  }

  test("pqTopK: codebook members score their exact distance; order stable") {
    val corpus = embs.filter(col("vec_id") =!= 0L)
    val out = Similarity.pqTopK(corpus, "vec_id", "embedding", query,
        k = corpus.count().toInt)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.values.forall(_ >= 0.0), "squared distances are non-negative")
    // a codebook seed IS its own codeword in every subspace, so its ADC
    // distance is the exact squared L2 to the query — zero quantization loss
    val seeds = corpus.orderBy("vec_id").limit(16).collect()
      .map(r => (r.getLong(0),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble)))
    seeds.foreach { case (id, v) =>
      val exact = v.zip(query.map(_.toDouble))
        .map { case (a, b) => (a - b) * (a - b) }.sum
      assert(math.abs(out(id) - exact) < 1e-4,
        s"seed $id adist ${out(id)} != exact $exact")
    }
    // deterministic under repartitioning (argmin tiebreaks + literal table)
    val again = Similarity.pqTopK(corpus.repartition(7), "vec_id",
        "embedding", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val ten = Similarity.pqTopK(corpus, "vec_id", "embedding", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(again == ten)
  }

  test("ivfPqTopK prunes cells yet agrees with flat PQ on shared survivors") {
    val corpus = embs.filter(col("vec_id") =!= 0L)
    val flat = Similarity.pqTopK(corpus, "vec_id", "embedding", query,
        k = corpus.count().toInt)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivfpq = Similarity.ivfPqTopK(corpus, "vec_id", "embedding", query,
        k = 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivfpq.nonEmpty && ivfpq.length <= 10)
    // same codebook, same ADC table: any vector the composite returns must
    // carry exactly its flat-PQ distance (pruning changes the candidate
    // set, never the scoring)
    ivfpq.foreach { case (id, d) =>
      assert(flat(id) == d, s"vec $id: ivfpq $d != flat ${flat(id)}")
    }
    assert(ivfpq.map(_._2).toSeq == ivfpq.map(_._2).sorted.toSeq)
  }

  test("lshPairs finds every pair a full cross-product would at threshold") {
    val exact = Similarity.topKPairs(embs, "vec_id", "embedding", k = 5)
      .filter(col("sim") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = Similarity.lshPairs(embs, "vec_id", "embedding",
        threshold = 0.4, tables = 16, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(bucketed) || exact.isEmpty,
      s"bucketed pairs missed ${exact -- bucketed}")
  }

  test("userActivity windows cover all events") {
    val ua = EventStreams.userActivity(
      graft.core.Tables.loadEvents(spark, sf), "1 hour")
    assert(ua.agg(sum("n_events")).head.getLong(0) ==
      graft.core.Tables.loadEvents(spark, sf).count())
  }

  test("IVF layout partitioned by centroid prunes non-probed partitions") {
    val base = embs.filter(col("vec_id") =!= 0L)
    val (assigned, cents) = Similarity.ivfAssign(base, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivf_layout_").toString + "/t"
    graft.io.Formats.writePartitioned(assigned, dir, Seq("__ivf_cid"))
    val reloaded = spark.read.parquet(dir)
    val probe = Seq(0, 1, 2)
    val pruned = reloaded.filter(col("__ivf_cid").isInCollection(probe))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().mkString
    // partition pruning is plan-time: the scan itself lists the filter
    assert(scan.contains("PartitionFilters") && scan.contains("__ivf_cid"),
      s"no partition filter in scan: $scan")
    // and the probed subset still serves exact re-ranking correctly
    val probedIds = pruned.select("vec_id").collect().map(_.getLong(0)).toSet
    val allIds = assigned.filter(col("__ivf_cid").isInCollection(probe))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(probedIds == allIds)
    // search against the at-rest layout == search against the in-memory one
    val fromLayout = Similarity.ivfTopKFromLayout(spark, dir, cents,
      "vec_id", "embedding", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val inMemory = Similarity.ivfTopK(assigned, cents, "vec_id", "embedding",
      query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromLayout == inMemory)
  }

  test("LSH ANN recall@10 >= 0.5 vs brute force on this data") {
    val base = embs.filter(col("vec_id") =!= 0L)
    val exact = Similarity.topK(base, "vec_id", "embedding", query, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(base, "vec_id", "embedding", query, 10,
      tables = 16, bits = 4).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall too low; exact=$exact approx=$approx")
  }

  test("mergeTopK is idempotent under overlapping/re-delivered states") {
    val base = embs.filter(col("vec_id") =!= 0L)
    val full = Similarity.topK(base, "vec_id", "embedding", query, 10)
    val expected = full.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // same state twice, plus a merged state re-merged with a constituent:
    // dedup-by-id must keep the result identical to the single state
    val twice = Similarity.mergeTopK(Seq(full, full), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(twice == expected, s"dup states changed top-k: $twice")
    val half = Similarity.topK(base.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", query, 10)
    val remerged = Similarity.mergeTopK(Seq(full, half), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(remerged == expected, s"re-merge changed top-k: $remerged")
  }
}

class MultimodalSpec extends SparkSpec {
  private lazy val bin = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("decodeMeta matches the stub codec row-by-row") {
    val row = bin.orderBy("doc_id").limit(1).collect()(0)
    val expected = Multimodal.StubCodec.decodeMeta(row.getAs[Array[Byte]](1))
    val got = Multimodal.decodeMeta(bin.orderBy("doc_id").limit(1), "payload")
      .select("media.*").collect()(0)
    assert(got.getInt(0) == expected.width && got.getInt(1) == expected.height)
    assert(got.getString(3) == expected.format)
  }

  test("fixture corpus is ASCII (m_features oracle byte==codepoint premise)") {
    val nonAscii = Tables.load(spark, sf, "documents")
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(nonAscii == 0, s"$nonAscii non-ASCII docs break the byte mirror")
  }

  test("feature extraction emits fixed-dim vectors consumable by ANN") {
    val feats = Multimodal.extractFeatures(bin.limit(20), "payload", dim = 8)
    assert(feats.select(size(col("features"))).distinct().head.getInt(0) == 8)
    val pairs = Similarity.topKPairs(feats, "doc_id", "features", 3)
    assert(pairs.count() == 3)
  }

  test("frame sampling explodes rows with bounded frame count") {
    val frames = Multimodal.sampleFrames(bin.limit(10), "payload", frames = 4)
    assert(frames.count() <= 40 && frames.count() >= 10)
  }

  test("dHash: single-byte edit stays within Hamming 2; empty payload is 0") {
    def ham(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val texts = Tables.load(spark, sf, "documents").orderBy("doc_id")
      .limit(10).collect().map(_.getAs[String]("text"))
    texts.foreach { t =>
      val orig = Multimodal.StubCodec.dHashBands(t.getBytes)
      val edit = Multimodal.StubCodec.dHashBands(("x" + t.drop(1)).getBytes)
      // one byte moves at most the two chunk means straddling the edit:
      // at most 2 of the 64 adjacent comparisons can flip
      assert(ham(orig, edit) <= 2, s"edit moved ${ham(orig, edit)} bits")
    }
    val empty = Multimodal.StubCodec.dHashBands(Array.emptyByteArray)
    assert(empty == Seq(0, 0, 0, 0))
    assert(Multimodal.StubCodec.dHashBands(null) == Seq(0, 0, 0, 0))
  }

  test("perceptualHash is partitioning-invariant (pure per-row codec)") {
    val one = Multimodal.perceptualHash(bin.coalesce(1), "payload")
      .select("doc_id", "b0", "b1", "b2", "b3").collect().toSet
    val many = Multimodal.perceptualHash(bin.repartition(7), "payload")
      .select("doc_id", "b0", "b1", "b2", "b3").collect().toSet
    assert(one == many)
  }

  test("audioWindows: overlap, truncation, and exact byte-sum energies") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](10)(i => (i + 1).toByte) // 1..10
    val d = Seq((1L, payload), (2L, Array.emptyByteArray))
      .toDF("doc_id", "payload")
    val got = Multimodal.audioWindows(d, "payload", win = 6, stride = 4)
      .select("doc_id", "win_idx", "n_bytes", "energy")
      .orderBy("doc_id", "win_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // windows at 0,4,8: [1..6]=21, [5..10]=45, [9,10]=19 (truncated)
    assert(got.toSeq === Seq((1L, 0, 6, 21L), (1L, 1, 6, 45L), (1L, 2, 2, 19L)))
    // empty payload emits no windows
    assert(!got.exists(_._1 == 2L))
  }

  test("patchGrid reconstructs the payload prefix in row-major order") {
    import spark.implicits._
    val d = Seq((1L, "abcdefghij"), (2L, "xyz"), (3L, ""))
      .toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("payload"))
    val got = Multimodal.patchGrid(d, "payload", grid = 2)
      .orderBy("doc_id", "patch_row", "patch_col")
      .select(col("doc_id"), col("patch_row"), col("patch_col"),
        col("patch").cast("string").as("p"))
      .collect()
    // doc 1: len 10, c = 10/4 = 2 → patches ab cd ef gh (ij dropped)
    val d1 = got.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getString(3)).toSeq === Seq("ab", "cd", "ef", "gh"))
    assert(d1.map(r => (r.getInt(1), r.getInt(2))).toSeq ===
      Seq((0, 0), (0, 1), (1, 0), (1, 1)))
    // doc 2: len 3, c = 1 → x y z, fourth patch (idx 3) out of range
    assert(got.filter(_.getLong(0) == 2L).map(_.getString(3)).toSeq ===
      Seq("x", "y", "z"))
    // doc 3: empty payload emits no patches
    assert(!got.exists(_.getLong(0) == 3L))
  }
}

class StreamingSpec extends SparkSpec {
  test("flatMapGroupsWithState sessionization equals session_window") {
    val events = Tables.loadEvents(spark, sf)
    val viaWindow = EventStreams.sessionize(events, "30 minutes")
      .orderBy("user_id", "sess_start").collect()
    val viaState = EventStreams.sessionizeStateful(events, 30)
      .select(
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("sess_start"),
          "yyyy-MM-dd HH:mm:ss").as("sess_start"),
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("sess_end"),
          "yyyy-MM-dd HH:mm:ss").as("sess_end"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("n_events"),
        org.apache.spark.sql.functions.col("sum_value"))
      .orderBy("user_id", "sess_start").collect()
    assert(viaState.length == viaWindow.length)
    viaState.zip(viaWindow).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0), s"start $a vs $b")
      assert(a.getString(1) == b.getString(1), s"end $a vs $b")
      assert(a.getLong(3) == b.getLong(3), s"n $a vs $b")
      assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-9, s"sum $a vs $b")
    }
  }

  test("stateful sessionization merges a session spanning micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = EventStreams.sessionizeStateful(
      mem.toDF.toDF("user_id", "ts", "value"), gapMinutes = 30)
    val q = sessions.writeStream.outputMode("append").format("memory")
      .queryName("spec_stateful_sess").start()
    try {
      // user 1's session spans three micro-batches (gaps of 10 min < 30)
      mem.addData((1L, ts(0), 1.0)); q.processAllAvailable()
      mem.addData((1L, ts(10), 2.0)); q.processAllAvailable()
      mem.addData((1L, ts(20), 4.0)); q.processAllAvailable()
      // another user far in the future advances the watermark (1h delay)
      // past user 1's session end...
      mem.addData((2L, ts(600), 1.0)); q.processAllAvailable()
      // ...and the timeout fires while processing the following batch
      mem.addData((2L, ts(610), 1.0)); q.processAllAvailable()
      val got = spark.table("spec_stateful_sess")
        .filter(col("user_id") === 1L).collect()
      assert(got.length == 1,
        s"session split across micro-batches: ${got.mkString(", ")}")
      assert(got(0).getAs[Long]("n_events") == 3L)
      assert(math.abs(got(0).getAs[Double]("sum_value") - 7.0) < 1e-9)
      assert(got(0).getAs[java.sql.Timestamp]("sess_start") == ts(0))
      assert(got(0).getAs[java.sql.Timestamp]("sess_end") == ts(50))
    } finally q.stop()
  }

  test("streaming exact-dedup drops duplicate fingerprints incrementally") {
    import graft.functions.TextFunctions
    // duplicate the corpus by unioning it with itself, stream it, dedup on
    // the canonical-text fingerprint — streaming state keeps one per fp
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("stream_dedup_").toString
    docs.unionByName(docs).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .dropDuplicates("fp")
    val q = stream.writeStream.outputMode("append").format("memory")
      .queryName("spec_stream_dedup")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(300000) finally q.stop()
    val streamed = spark.table("spec_stream_dedup").count()
    assert(streamed == docs.select(TextFunctions.fingerprint(col("text")))
      .distinct().count())
  }

  test("streamToParquet lands append output exactly-once via checkpoint") {
    val base = java.nio.file.Files.createTempDirectory("stream_sink_").toString
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    EventStreams.streamToParquet(spark, s"$sf/events.parquet", out, ckpt,
      _.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "value"))
    val batch = Tables.loadEvents(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(spark.read.parquet(out).count() == batch)
    // re-running with the same checkpoint must not duplicate output
    EventStreams.streamToParquet(spark, s"$sf/events.parquet", out, ckpt,
      _.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "value"))
    assert(spark.read.parquet(out).count() == batch)
  }

  test("positional paging pushes __pos range to the parquet scan") {
    val sess = graft.core.EditorSession.fromDataFrame(
      Tables.load(spark, sf, "orders"), Seq("o_orderkey"))
    val dir = java.nio.file.Files.createTempDirectory("pos_layout_").toString + "/t"
    // persist WITH positions, sorted, so row groups carry tight __pos stats
    sess.current.orderBy("__pos").write.parquet(dir)
    val page = graft.core.Positional.page(spark.read.parquet(dir), 100L, 120L)
    val scan = page.queryExecution.executedPlan.collectLeaves().mkString
    assert(scan.contains("GreaterThanOrEqual(__pos,100)") &&
      scan.contains("LessThan(__pos,120)"),
      s"__pos range not pushed to scan: $scan")
    assert(page.count() == 20)
  }

  test("dropDuplicatesWithinWatermark dedups with bounded state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    // watermark-bounded dedup state: duplicates arriving within the delay
    // are dropped, and keys older than the watermark are evicted instead of
    // accumulating forever — the streaming-scale exact-dedup shape
    val deduped = mem.toDF.toDF("k", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("spec_wm_dedup").start()
    try {
      mem.addData((1L, ts(0)), (1L, ts(1))); q.processAllAvailable()
      mem.addData((1L, ts(2))); q.processAllAvailable()      // still duplicate
      assert(spark.table("spec_wm_dedup").count() == 1)
      mem.addData((2L, ts(60))); q.processAllAvailable()      // advances wm
      mem.addData((1L, ts(61))); q.processAllAvailable()      // state evicted
      val k1 = spark.table("spec_wm_dedup").filter(col("k") === 1L).count()
      assert(k1 == 2, s"expected re-admission after watermark eviction, got $k1")
    } finally q.stop()
  }

  test("streaming windowed counts equal the batch-bound transform") {
    val batch = EventStreams.windowedCounts(Tables.loadEvents(spark, sf))
      .orderBy("win_start", "event_type").collect()
    val streamed = EventStreams.runAvailableNow(spark, s"$sf/events.parquet",
      EventStreams.windowedCounts(_, "1 hour"), "spec_window_counts")
      .orderBy("win_start", "event_type").collect()
    assert(streamed.length == batch.length)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }

  test("streamed incremental LSH probe equals the batch probe pair for pair") {
    val docs = Tables.load(spark, sf, "documents")
    val idx = Dedup.lshIndex(docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", 3, 32, 16).localCheckpoint(eager = true)
    val batch = Dedup.incrementalLshMatches(idx,
        docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", 3, 0.4, 32, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = EventStreams.runAvailableNow(spark, s"$sf/documents.parquet",
      st => Dedup.incrementalLshMatchesStream(idx,
        st.filter(col("doc_id") % 5 === 0), "doc_id", "text", 3, 0.4, 32, 16),
      "spec_incr_lsh", outputMode = "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "expected cross-split near-dup pairs")
    assert(streamed == batch,
      s"stream missed ${batch -- streamed}, extra ${streamed -- batch}")
  }
}

class TextFunctionsSpec extends SparkSpec {
  test("tokens/shingles handle short and empty strings") {
    import spark.implicits._
    val df = Seq("", "one", "a b", "a b c d").toDF("text")
    val rows = df.select(TextFunctions.tokenCount(col("text")),
      size(TextFunctions.shingles(col("text"), 3))).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 4))
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 0, 0, 2))
  }

  test("quality score is in [0,1] and langId falls back to und") {
    import spark.implicits._
    val df = Seq("the cat sat on the mat and that is that",
      "zzz qqq xxx", "!!!???...").toDF("text")
    val rows = df.select(TextFunctions.qualityScore(col("text")),
      TextFunctions.langId(col("text"))).collect()
    rows.foreach(r => assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0))
    assert(rows(0).getString(1) == "en")
    assert(rows(1).getString(1) == "und")
  }
}
