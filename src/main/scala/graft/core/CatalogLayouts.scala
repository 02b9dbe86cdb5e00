package graft.core

import scala.collection.mutable
import scala.util.{Failure, Success, Try}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Catalog._

/** At-rest layout builds and their serving routes: PQ / IVF-PQ / LSH / postings / bucketed / ranged / z-ordered builds, rangeScan, topK, BM25 serving, and the bucket-co-located join.
  *
  * An internal implementation seam of [[Catalog]] (split out of the
  * single-file class, r11 verdict task #7): every member here is
  * Catalog implementation detail with zero behavior change — the trait
  * exists so the file stays navigable, not as user API.
  */
trait CatalogLayouts { self: Catalog =>
  /** Encode `vecCol` ONCE into an at-rest PQ codes parquet (8 small ints
    * where 64 floats were) and register it; [[topK]] on this session then
    * searches stored codes — m table lookups per row, no re-encode, no
    * raw vector touched — until the session mutates.
    */
  def buildPqLayout(name: String, idCol: String, vecCol: String,
                    m: Int = 8): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val seeds = graft.operators.Similarity.pqCodebook(base, idCol, vecCol)
    val (dir, rel) = layoutRoot("catalog_pq_")
    val path = dir + "/codes"
    graft.operators.Similarity.pqCodes(base, idCol, vecCol, seeds, m)
      .write.parquet(path)
    layouts((name, s"ann:$vecCol")) =
      PqCodesLayout(idCol, vecCol, path, seeds, m, s.epoch)
    rel.foreach { r =>
      writeRowSig(base, dir, col(idCol), Seq(idCol, vecCol))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"ann:$vecCol", kind = "pq",
        digest = contentDigest(base, Seq(idCol, vecCol)), path = Some(r),
        idCol = Some(idCol), valueCol = Some(vecCol), m = Some(m),
        seeds = Some(seeds.map(_.toSeq).toSeq)))
    }
    path
  }

  /** IVF-PQ at-rest layout: codes written once PARTITIONED BY coarse cell,
    * so a routed [[topK]] probe prunes cell partitions at plan time and
    * ranks survivors from stored codes (the FAISS inverted-file shape).
    * Registers over the same `ann:vecCol` slot — last build wins.
    */
  def buildIvfPqLayout(name: String, idCol: String, vecCol: String,
                       nCentroids: Int = 8, m: Int = 8,
                       nProbe: Int = 4): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (codes, cents, seeds) = graft.operators.Similarity.ivfPqCodes(
      base, idCol, vecCol, nCentroids, m)
    val (dir, rel) = layoutRoot("catalog_ivfpq_")
    val path = dir + "/codes"
    graft.io.Formats.writePartitioned(codes, path, Seq("__ivf_cid"))
    layouts((name, s"ann:$vecCol")) =
      IvfPqCellLayout(idCol, vecCol, path, cents, seeds, m, nProbe, s.epoch)
    rel.foreach { r =>
      writeRowSig(base, dir, col(idCol), Seq(idCol, vecCol))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"ann:$vecCol", kind = "ivfpq",
        digest = contentDigest(base, Seq(idCol, vecCol)), path = Some(r),
        idCol = Some(idCol), valueCol = Some(vecCol), m = Some(m),
        nProbe = Some(nProbe),
        seeds = Some(seeds.map(_.toSeq).toSeq),
        cents = Some(cents.map { case (cid, v) => CentEntry(cid, v) })))
    }
    path
  }

  /** Write the session bucketed+sorted on `key` as a managed table and
    * register it; [[join]] on this key then plans exchange-free while the
    * session stays unedited.
    */
  def buildBucketedLayout(name: String, key: String, buckets: Int): String = {
    val s = sessionOf(name)
    // the managed-table name carries this Catalog's instance id: two
    // catalogs in one JVM (e.g. per-sfDir memoized ones) reusing the same
    // session names must not clobber each other's bucketed tables — the
    // first catalog's layout would stay epoch-valid and silently route
    // the second catalog's data
    val tbl = s"graft_c${catalogId}_${name}_by_$key".toLowerCase
    val base = Positional.strip(s.current)
    graft.io.Bucketing.writeBucketed(base, tbl, key, buckets)
    layouts((name, s"bucket:$key")) = BucketedLayout(key, tbl, buckets, s.epoch)
    persistEntry(LayoutManifestEntry(
      session = name, slot = s"bucket:$key", kind = "bucket",
      digest = contentDigest(base, Seq.empty), table = Some(tbl),
      valueCol = Some(key), buckets = Some(buckets)))
    tbl
  }

  /** MinHash-LSH index the session's text column once
    * ([[graft.operators.Dedup.lshIndex]]: per-doc signatures + banded
    * buckets, localCheckpoint-pinned so probes never re-shingle the
    * corpus) and register it; [[nearDups]] then probes arriving batches
    * against the stored index — the nightly-ingest dedup hop.
    */
  def buildLshLayout(name: String, idCol: String, textCol: String,
                     n: Int = 3, numHashes: Int = 128,
                     bands: Int = 64): Unit = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val idx0 = graft.operators.Dedup.lshIndex(base, idCol, textCol, n,
      numHashes, bands)
    // durable: the index parquet IS the at-rest pin (probes read files,
    // never re-shingle); process-local: localCheckpoint pins the blocks
    val idx =
      if (warehouse.isDefined) {
        val (dir, rel) = layoutRoot("catalog_lsh_")
        idx0.write.parquet(dir + "/index")
        rel.foreach { r =>
          writeRowSig(base, dir, col(idCol), Seq(idCol, textCol))
          persistEntry(LayoutManifestEntry(
            session = name, slot = s"lsh:$textCol", kind = "lsh",
            digest = contentDigest(base, Seq(idCol, textCol)), path = Some(r),
            idCol = Some(idCol), valueCol = Some(textCol), n = Some(n),
            numHashes = Some(numHashes), bands = Some(bands)))
        }
        spark.read.parquet(dir + "/index")
      } else idx0.localCheckpoint(true)
    layouts((name, s"lsh:$textCol")) =
      LshIndexLayout(idCol, textCol, n, numHashes, bands, idx, s.epoch)
  }

  /** Near-duplicate probe of `batch` against an open session,
    * layout-routed: a valid LSH layout serves the probe from the stored
    * index (batch-sized signature work + band equi-join — the corpus is
    * never re-shingled); without one, the index is built from the live
    * session plan for this call (same answer, corpus-sized work). The
    * batch must carry the same id/text column names the layout indexed.
    * The layout is used only when the caller's (idCol, n, numHashes,
    * bands) MATCH what it was built with — routing changes the plan,
    * never the answer, so a parameter mismatch falls back to a live
    * index built with the caller's parameters rather than silently
    * serving a differently-banded pair set.
    */
  def nearDups(name: String, batch: DataFrame, idCol: String,
               textCol: String, threshold: Double = 0.4,
               n: Int = 3, numHashes: Int = 128,
               bands: Int = 64): DataFrame = {
    val (lay, rep) = decide(name, s"lsh:$textCol", {
      case l: LshIndexLayout => l.idCol == idCol && l.n == n &&
        l.numHashes == numHashes && l.bands == bands
      case _ => false
    })
    recordRoute(rep)
    lay match {
      case Some(l: LshIndexLayout) =>
        graft.operators.Dedup.incrementalLshMatches(
          patchedCodes(l.index, l.patch), batch,
          l.idCol, l.textCol, l.n, threshold, l.numHashes, l.bands)
      case _ =>
        val idx = graft.operators.Dedup.lshIndex(
          Positional.strip(sessionOf(name).current), idCol, textCol, n,
          numHashes, bands)
        graft.operators.Dedup.incrementalLshMatches(idx, batch, idCol,
          textCol, n, threshold, numHashes, bands)
    }
  }

  /** Write the session's inverted index bucketed by term hash
    * ([[graft.operators.Retrieval.writePostingsBucketed]]: one (term,
    * doc) row per distinct per-doc term, directory-partitioned on the
    * term's hash bucket) and register it; [[termPostings]] then serves a
    * term lookup from a partition-pruned read of ~|terms|/buckets of the
    * index — the at-scale retrieval side of BM25, replacing the
    * O(corpus) posting-list string a stop-word-grade term costs in the
    * report-shaped [[graft.operators.Retrieval.postings]].
    */
  def buildPostingsLayout(name: String, idCol: String, textCol: String,
                          buckets: Int = 64): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_postings_")
    val path = dir + "/postings"
    graft.operators.Retrieval.writePostingsBucketed(base, idCol, textCol,
      path, buckets)
    val (nDocs, avgdl) =
      graft.operators.Retrieval.postingsStats(base, textCol)
    layouts((name, s"postings:$textCol")) =
      PostingsLayout(idCol, textCol, buckets, path, s.epoch,
        nDocs = nDocs, avgdl = avgdl)
    rel.foreach { r =>
      writeRowSig(base, dir, col(idCol), Seq(idCol, textCol))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"postings:$textCol", kind = "postings",
        digest = contentDigest(base, Seq(idCol, textCol)), path = Some(r),
        idCol = Some(idCol), valueCol = Some(textCol), n = Some(buckets),
        nDocs = Some(nDocs), avgdl = Some(avgdl)))
    }
    path
  }

  /** Lexical BM25 retrieval, layout-routed: a valid postings layout on
    * (session, textCol) built with the caller's idCol scores the query
    * terms from stored (tf, dl) rows in the terms' pruned hash buckets
    * plus the layout's two corpus scalars — the corpus is never
    * re-tokenized, and the digits equal the live
    * [[graft.operators.Retrieval.bm25]] (shared scoring tail, exact
    * global df from the term-complete buckets). Without a valid layout
    * the live corpus-pass BM25 runs. Output: (idCol, score).
    */
  def searchBm25(name: String, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    val (lay, rep) = decide(name, s"postings:$textCol", {
      case l: PostingsLayout => l.idCol == idCol
      case _ => false
    })
    recordRoute(rep)
    lay match {
      case Some(l: PostingsLayout) =>
        graft.operators.Retrieval.bm25FromPostings(spark,
          patchedPostings(l), l.buckets, l.nDocs, l.avgdl, idCol, terms,
          k1, b)
      case _ =>
        graft.operators.Retrieval.bm25(
          Positional.strip(sessionOf(name).current), idCol, textCol,
          terms, k1, b)
    }
  }

  /** Posting lists for a probe term set, layout-routed: a valid postings
    * layout on (session, textCol) built with the caller's idCol serves
    * the lookup from the bucketed index (plan-time directory pruning —
    * non-probed buckets never open); otherwise the corpus re-tokenizes
    * under the live session plan. Output (term, df, plist) either way.
    */
  def termPostings(name: String, idCol: String, textCol: String,
                   terms: Seq[String]): DataFrame = {
    val (lay, rep) = decide(name, s"postings:$textCol", {
      case l: PostingsLayout => l.idCol == idCol
      case _ => false
    })
    recordRoute(rep)
    lay match {
      case Some(l: PostingsLayout) =>
        graft.operators.Retrieval.termLookupFrom(spark, patchedPostings(l),
          terms, l.buckets)
      case _ =>
        graft.operators.Retrieval.postingsFor(
          Positional.strip(sessionOf(name).current), idCol, textCol, terms)
    }
  }

  /** Range-cluster the session on a numeric column (range repartition →
    * sorted part files) with a min/max file-skipping index
    * ([[graft.io.SkippingIndex]] — the Delta/Iceberg data-skipping shape)
    * and register it; [[rangeScan]] on this column then opens only the
    * part files whose value range intersects the predicate. Passing an
    * `idCol` makes the layout DML-PATCHABLE (see [[Catalog
    * .RangedLayout]]): bounded edits/inserts/deletes refresh without
    * re-clustering.
    */
  /** Range-cluster `df` on `column` into `files` sorted part files. */
  private[core] def writeRangedData(df: DataFrame, column: String, files: Int,
                              path: String): Unit =
    df.repartitionByRange(files, col(column))
      .sortWithinPartitions(column)
      .write.parquet(path)

  def buildRangedLayout(name: String, column: String, files: Int = 8,
                        idCol: Option[String] = None): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_ranged_")
    val path = dir + "/ranged"
    writeRangedData(base, column, files, path)
    val stats = graft.io.SkippingIndex.build(spark, path, column)
      .localCheckpoint(true) // manifest-sized; pin so probes don't rescan
    layouts((name, s"range:$column")) = RangedLayout(column, path, stats,
      files, s.epoch, idCol = idCol)
    rel.foreach { r =>
      stats.write.parquet(dir + "/stats") // file-count-sized sidecar
      idCol.foreach(id => writeRowSig(base, dir, col(id), Seq.empty))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"range:$column", kind = "range",
        digest = contentDigest(base, Seq.empty), path = Some(r),
        valueCol = Some(column), files = Some(files), idCol = idCol))
    }
    path
  }

  /** Serving view of a full-row layout's (possibly patched) pruned
    * read: base files minus the shadowed ids (broadcast anti-join on
    * the layout's OWN id column) plus the unclustered add-leg — the
    * caller's exact predicate on top keeps answers byte-identical, and
    * the skipping stats stay truthful because base files never change.
    */
  private[core] def patchedFullRows(base: DataFrame, idCol: Option[String],
                              patch: Option[LayoutPatch]): DataFrame =
    (idCol, patch) match {
      case (Some(id), Some(pt)) =>
        base.join(broadcast(pt.removed), base(id) === pt.removed("id"),
            "left_anti")
          .unionByName(pt.add)
      case _ => base
    }

  /** Z-order the session on two numeric columns: each is min/max-scaled
    * to a 16-bit bucket, the Morton interleave becomes the range-
    * partitioning key, and a per-file min/max index over BOTH columns is
    * built in one scan ([[graft.io.SkippingIndex.build2d]]); a routed
    * [[rangeScan2d]] then opens only the part files whose (x, y)
    * rectangle intersects the predicate — pruning on EITHER dimension,
    * which a single-column clustering cannot give.
    */
  /** Morton-cluster `df` on (colX, colY) into `files` part files. Each
    * dimension bucketizes in ITS OWN type's monotone double image (r10
    * verdict task #7: the events-table time × numeric rectangle needs a
    * timestamp dimension) — the image only orders rows for the
    * interleave; stats and predicates stay in the column's type.
    */
  private[core] def writeZOrderedData(df: DataFrame, colX: String, colY: String,
                                files: Int, path: String): Unit = {
    def dimd(c: String): org.apache.spark.sql.Column = {
      import org.apache.spark.sql.types._
      df.schema(c).dataType match {
        case _: NumericType => col(c).cast("double")
        case TimestampType | TimestampNTZType | DateType =>
          col(c).cast("timestamp").cast("double") // epoch seconds
        case other => throw new IllegalArgumentException(
          s"z-order needs numeric/timestamp/date columns; '$c' is $other")
      }
    }
    val b = df.agg(min(dimd(colX)), max(dimd(colX)),
      min(dimd(colY)), max(dimd(colY))).head()
    def bucket(c: String, lo: Double, hi: Double) = {
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      ((dimd(c) - lo) / span * ((1 << 16) - 1)).cast("long")
    }
    val z = graft.operators.ZOrder.zValue(
      bucket(colX, b.getDouble(0), b.getDouble(1)),
      bucket(colY, b.getDouble(2), b.getDouble(3)), bitsPer = 16)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.parquet(path)
  }

  def buildZOrderedLayout(name: String, colX: String, colY: String,
                          files: Int = 16,
                          idCol: Option[String] = None): String = {
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_zorder_")
    val path = dir + "/zordered"
    writeZOrderedData(base, colX, colY, files, path)
    val stats = graft.io.SkippingIndex.build2d(spark, path, colX, colY)
      .localCheckpoint(true) // manifest-sized; pin so probes don't rescan
    layouts((name, s"zorder:$colX,$colY")) =
      ZOrderedLayout(colX, colY, path, stats, files, s.epoch,
        idCol = idCol)
    rel.foreach { r =>
      stats.write.parquet(dir + "/stats") // file-count-sized sidecar
      idCol.foreach(id => writeRowSig(base, dir, col(id), Seq.empty))
      persistEntry(LayoutManifestEntry(
        session = name, slot = s"zorder:$colX,$colY", kind = "zorder",
        digest = contentDigest(base, Seq.empty), path = Some(r),
        valueCol = Some(colX), idCol = Some(colY), files = Some(files),
        keyCol = idCol))
    }
    path
  }

  /** Morton-cluster `df` on THREE dimensions (r11 verdict task #8).
    * Numeric/timestamp/date dimensions bucketize through their monotone
    * double image exactly like the 2-D form; a STRING dimension (the
    * events `event_type` axis) bucketizes through an ORDER-PRESERVING
    * dictionary — distinct values ranked lexicographically (dictionary-
    * sized: one distinct + one window over the dictionary, broadcast
    * back), so per-file min/max string stats stay tight and a string
    * range/equality predicate prunes files like any other type. Hashing
    * would be cheaper but destroys ordering — every file would span the
    * whole string domain and nothing would ever prune.
    */
  private[core] def writeZOrdered3Data(df: DataFrame, dims: Seq[String],
                                       files: Int, path: String): Unit = {
    import org.apache.spark.sql.types._
    def kind(c: String): Char = df.schema(c).dataType match {
      case _: NumericType => 'n'
      case TimestampType | TimestampNTZType | DateType => 't'
      case StringType => 's'
      case other => throw new IllegalArgumentException(
        s"z-order needs numeric/timestamp/date/string columns; '$c' is $other")
    }
    def dimd(c: String): org.apache.spark.sql.Column =
      if (kind(c) == 'n') col(c).cast("double")
      else col(c).cast("timestamp").cast("double") // epoch seconds
    val scaled = dims.filter(kind(_) != 's')
    val mm: Map[String, (Double, Double)] =
      if (scaled.isEmpty) Map.empty
      else {
        val r = df.agg(min(dimd(scaled.head)), (max(dimd(scaled.head)) +:
          scaled.tail.flatMap(c => Seq(min(dimd(c)), max(dimd(c))))): _*)
          .head()
        scaled.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(2 * i)) (0.0, 0.0)
                else (r.getDouble(2 * i), r.getDouble(2 * i + 1)))
        }.toMap
      }
    var prep = df
    val strRank = dims.filter(kind(_) == 's').map { c =>
      val dict = df.select(col(c)).na.drop().distinct()
      val n = dict.count()
      require(n <= (1L << 16),
        s"string z-dimension '$c' has $n distinct values (max 65536); " +
          "pre-bucket it or use a numeric surrogate")
      // dictionary-sized global window — this IS a dictionary build.
      // The rank SCALES across the full 16-bit domain (monotone, so
      // order-preserving): a low-cardinality dictionary left at ranks
      // 0..n would occupy only the interleave's LOW bits and never
      // separate files, exactly like an unscaled narrow numeric range.
      val scale = 65535L / math.max(n - 1L, 1L)
      val ranked = dict.withColumn(s"__zr_$c",
        ((org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col(c)))
          .cast("long")) - 1L) * scale)
      prep = prep.join(broadcast(ranked), Seq(c), "left")
      c -> s"__zr_$c"
    }.toMap
    def bucket(c: String): org.apache.spark.sql.Column =
      if (strRank.contains(c)) coalesce(col(strRank(c)), lit(0L))
      else {
        val (lo, hi) = mm(c)
        val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
        ((dimd(c) - lo) / span * ((1 << 16) - 1)).cast("long")
      }
    val z = graft.operators.ZOrder.zValue3(
      bucket(dims(0)), bucket(dims(1)), bucket(dims(2)), bitsPer = 16)
    prep.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      // restore the ORIGINAL column order (the dictionary join moves its
      // key to the front) — the stored schema must equal the session's
      .select(df.columns.map(col).toSeq: _*)
      .write.parquet(path)
  }

  /** One layout per DIMENSION SET: the slot key sorts the names, so any
    * permutation of the caller's box finds it.
    */
  private[core] def zorder3Slot(dims: Seq[String]): String =
    "zorder3:" + dims.sorted.mkString(",")

  /** Z-order the session on three columns (time × entity × type is the
    * canonical events box) and register the layout + its 3-D skipping
    * index; [[rangeScan3d]] then prunes part files on ALL THREE
    * dimensions. Durable like the 2-D form (manifest kind "zorder3",
    * stats sidecar, digest-gated reopen). With an `idCol` the layout is
    * DML-patchable like its 1-D/2-D siblings (id-shadow + add-leg,
    * file-local partial compaction past the bound, diverged-reopen
    * patching from the row-sig sidecar); without one it rebuilds on any
    * mutation.
    */
  def buildZOrdered3Layout(name: String, dims: Seq[String],
                           files: Int = 16,
                           idCol: Option[String] = None): String = {
    require(dims.length == 3 && dims.distinct.length == 3,
      s"need exactly three distinct dimensions, got $dims")
    val s = sessionOf(name)
    val base = Positional.strip(s.current)
    val (dir, rel) = layoutRoot("catalog_zorder3_")
    val path = dir + "/zordered3"
    writeZOrdered3Data(base, dims, files, path)
    val stats = graft.io.SkippingIndex
      .build3d(spark, path, dims(0), dims(1), dims(2))
      .localCheckpoint(true) // manifest-sized; pin so probes don't rescan
    layouts((name, zorder3Slot(dims))) =
      ZOrdered3Layout(dims, path, stats, files, s.epoch, idCol = idCol)
    rel.foreach { r =>
      stats.write.parquet(dir + "/stats") // file-count-sized sidecar
      idCol.foreach(id => writeRowSig(base, dir, col(id), Seq.empty))
      persistEntry(LayoutManifestEntry(
        session = name, slot = zorder3Slot(dims), kind = "zorder3",
        digest = contentDigest(base, Seq.empty), path = Some(r),
        groupCols = Some(dims), files = Some(files), keyCol = idCol))
    }
    path
  }

  /** Box predicate scan, layout-routed: a valid 3-D z-ordered layout on
    * the caller's dimension set (ANY order) serves the conjunctive box
    * from the Morton-clustered files via the 3-D skipping index — every
    * dimension prunes; the exact predicate re-applies after pruning, so
    * answers are byte-identical. An equality predicate is the degenerate
    * box `lo == hi`. No valid layout → plain filter over the live plan.
    */
  def rangeScan3d(name: String, boxes: Seq[(String, Any, Any)]): DataFrame = {
    require(boxes.length == 3 && boxes.map(_._1).distinct.length == 3,
      s"need bounds on exactly three distinct columns, got ${boxes.map(_._1)}")
    val (lay, rep) = decide(name, zorder3Slot(boxes.map(_._1)),
      _.isInstanceOf[ZOrdered3Layout])
    recordRoute(rep)
    def exact(df: DataFrame): DataFrame =
      boxes.foldLeft(df) { case (d, (c, lo, hi)) =>
        d.filter(col(c) >= lit(lo) && col(c) <= lit(hi))
      }
    lay match {
      case Some(l: ZOrdered3Layout) =>
        val byCol = boxes.map(b => b._1 -> (b._2, b._3)).toMap
        val Seq(cx, cy, cz) = l.cols
        val files = graft.io.SkippingIndex.candidateFiles3dOpt(l.stats,
          Some(byCol(cx)._1), Some(byCol(cx)._2),
          Some(byCol(cy)._1), Some(byCol(cy)._2),
          Some(byCol(cz)._1), Some(byCol(cz)._2))
        val base =
          if (files.isEmpty) spark.read.parquet(l.path).limit(0)
          else spark.read.parquet(files: _*)
        // DML patch composes before the exact box predicate: the
        // add-leg is never pruned, shadowed base rows never serve
        exact(patchedFullRows(base, l.idCol, l.patch))
      case _ => exact(Positional.strip(sessionOf(name).current))
    }
  }

  /** Rectangle predicate scan, layout-routed: a valid z-ordered layout
    * on (session, colX, colY) serves `colX ∈ [loX, hiX] ∧ colY ∈ [loY,
    * hiY]` from the Morton-clustered files via the 2-D skipping index
    * (the exact predicate re-applies after pruning — byte-identical
    * answers); otherwise a plain conjunctive filter over the live
    * session plan. Column ORDER is routing-irrelevant: (x, y) and
    * (y, x) requests serve from the same layout.
    */
  def rangeScan2d(name: String, colX: String, loX: Any, hiX: Any,
                  colY: String, loY: Any, hiY: Any): DataFrame = {
    val (lay, rep) = decide(name, s"zorder:$colX,$colY", {
      case l: ZOrderedLayout => l.colX == colX && l.colY == colY
      case _ => false
    })
    // the transposed slot serves the same rectangle — try it on a miss
    val (lay2, rep2) =
      if (lay.isDefined) (lay, rep)
      else decide(name, s"zorder:$colY,$colX", {
        case l: ZOrderedLayout => l.colX == colY && l.colY == colX
        case _ => false
      })
    recordRoute(if (lay2.isDefined || rep2.reason != "no-layout") rep2
      else rep)
    def servePatched(l: ZOrderedLayout, lX: Any, hX: Any,
                     lY: Any, hY: Any): DataFrame = {
      val files = graft.io.SkippingIndex.candidateFiles2d(l.stats,
        lX, hX, lY, hY)
      val base =
        if (files.isEmpty) spark.read.parquet(l.path).limit(0)
        else spark.read.parquet(files: _*)
      // DML patch composes before the exact rectangle predicate: the
      // add-leg is never pruned, shadowed base rows never serve
      patchedFullRows(base, l.idCol, l.patch)
        .filter(col(l.colX) >= lit(lX) && col(l.colX) <= lit(hX) &&
          col(l.colY) >= lit(lY) && col(l.colY) <= lit(hY))
    }
    lay2 match {
      case Some(l: ZOrderedLayout) if l.colX == colX =>
        servePatched(l, loX, hiX, loY, hiY)
      case Some(l: ZOrderedLayout) =>
        servePatched(l, loY, hiY, loX, hiX)
      case _ =>
        Positional.strip(sessionOf(name).current)
          .filter(col(colX) >= lit(loX) && col(colX) <= lit(hiX) &&
            col(colY) >= lit(loY) && col(colY) <= lit(hiY))
    }
  }

  /** Range predicate scan, layout-routed: a valid ranged layout on
    * (session, column) serves `column ∈ [lo, hi]` from the clustered
    * files via the skipping index (most part files never open — the
    * exact predicate re-applies after pruning, so the answer is
    * byte-identical); otherwise a plain filter over the live session
    * plan. The catalog picks — callers state the predicate, never the
    * layout.
    */
  def rangeScan(name: String, column: String, lo: Any,
                hi: Any): DataFrame = {
    val (lay, rep) = decide(name, s"range:$column",
      _.isInstanceOf[RangedLayout])
    recordRoute(rep)
    lay match {
      case Some(l: RangedLayout) => serveRangedScan(l, column, lo, hi)
      case _ =>
        val c = org.apache.spark.sql.functions.col(column)
        Positional.strip(sessionOf(name).current)
          .filter(c >= lit(lo) && c <= lit(hi))
    }
  }

  /** The routed range-scan plan over a (possibly patched) ranged layout:
    * skipping-pruned base files, the DML patch composed BEFORE the exact
    * predicate (the add-leg is never pruned, shadowed base rows never
    * serve), the caller's exact predicate on top. Shared by [[rangeScan]]
    * and the pinned [[rangeScanAsOf]].
    */
  private[core] def serveRangedScan(l: RangedLayout, column: String, lo: Any,
                              hi: Any): DataFrame = {
    val files = graft.io.SkippingIndex.candidateFiles(l.stats, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(l.path).limit(0)
      else spark.read.parquet(files: _*)
    patchedFullRows(base, l.idCol, l.patch)
      .filter(col(column) >= lit(lo) && col(column) <= lit(hi))
  }

  /** ANN top-k, layout-routed: a valid stored ANN layout on (session,
    * vecCol) serves the search from codes at rest (PQ: compressed-domain
    * scan; IVF-PQ: plan-time cell pruning first); otherwise the exact
    * brute-force cosine over the live session plan. Same output shape
    * (id, sim) either way — the caller never names a layout. The layout
    * routes only when its idCol equals the caller's (the [[nearDups]]
    * guard, ADVICE r8): stored codes are keyed by the ids the layout was
    * built with, and serving those under a different caller-named id
    * column would change the answer, not just the plan.
    */
  def topK(name: String, idCol: String, vecCol: String, query: Seq[Float],
           k: Int): DataFrame = {
    val (lay, rep) = decide(name, s"ann:$vecCol", {
      case l: PqCodesLayout => l.idCol == idCol
      case l: IvfPqCellLayout => l.idCol == idCol
      case _ => false
    })
    recordRoute(rep)
    lay.flatMap(serveAnnTopK(_, idCol, query, k)).getOrElse(
      graft.operators.Similarity.topK(
        Positional.strip(sessionOf(name).current), idCol, vecCol, query, k))
  }

  /** The routed ANN serving plan of a stored-codes layout built with the
    * caller's idCol (None otherwise) — shared by [[topK]] and
    * [[topKAsOf]] so the two can never drift.
    */
  private[core] def serveAnnTopK(l: TableLayout, idCol: String,
                           query: Seq[Float], k: Int): Option[DataFrame] =
    l match {
      case pq: PqCodesLayout if pq.idCol == idCol =>
        Some(graft.operators.Similarity.pqTopKFromCodes(
          patchedCodes(spark.read.parquet(pq.path), pq.patch), pq.seeds,
          query, k, pq.m))
      case iv: IvfPqCellLayout if iv.idCol == idCol =>
        Some(graft.operators.Similarity.ivfPqTopKFromCodes(
          patchedCodes(spark.read.parquet(iv.path), iv.patch), iv.cents,
          iv.seeds, query, k, iv.nProbe, iv.m))
      case _ => None
    }

  /** Equi-join of two open sessions, layout-routed: when BOTH sides hold
    * valid bucketed layouts on their join keys with matching bucket
    * counts, the join reads the bucketed tables and plans with NO
    * exchange (co-located by storage); otherwise the live session plans
    * join and Catalyst shuffles as usual. The catalog picks — callers
    * never mention buckets.
    */
  def join(left: String, leftKey: String, right: String,
           rightKey: String): DataFrame = {
    val (ld, lrep) = decide(left, s"bucket:$leftKey",
      _.isInstanceOf[BucketedLayout])
    val (rd, rrep) = decide(right, s"bucket:$rightKey",
      _.isInstanceOf[BucketedLayout])
    val routed = for {
      ll <- ld.collect { case b: BucketedLayout => b }
      rl <- rd.collect { case b: BucketedLayout => b }
      if ll.buckets == rl.buckets
    } yield (spark.table(ll.table), spark.table(rl.table))
    // both sides valid but bucket counts differ = a parameter mismatch
    // of the PAIR: each side alone would route, the join cannot
    if (ld.isDefined && rd.isDefined && routed.isEmpty) {
      recordRoute(lrep.copy(decision = "live", reason = "param-mismatch"))
      recordRoute(rrep.copy(decision = "live", reason = "param-mismatch"))
    } else { recordRoute(lrep); recordRoute(rrep) }
    val (lf, rf) = routed.getOrElse(
      (Positional.strip(sessionOf(left).current),
        Positional.strip(sessionOf(right).current)))
    lf.join(rf, lf(leftKey) === rf(rightKey))
  }

  /** Catalog-routed as-of join (r11 verdict task #2): the left side (a
    * query batch — the feature-store probe set) as-of joins a SESSION
    * whose time column carries a ranged layout, and the right-side scan
    * is PRUNED to the left side's time envelope through the layout's
    * skipping stats before the merge-and-carry shuffle. At 100 TB the
    * un-pruned right-side scan dominates the PIT/as-of family; the
    * envelope turns it into "read the files the probe window can reach".
    *
    * The envelope is EXACT, not heuristic — answers are byte-identical
    * to [[graft.operators.AsOfJoin]] over the full right side:
    *  - backward: right rows with `ts > max(left.ts)` can never be the
    *    at-or-before match of any left row → the upper side always
    *    prunes. The lower side prunes only under a TOLERANCE bound:
    *    a match staler than the bound is voided to null by the operator
    *    itself, so right rows below `min(left.ts) − tolerance` either
    *    are not carried or are carried-then-voided — exactly what the
    *    pruned plan produces for them too (files straddling the bound
    *    keep their rows; voiding re-applies per row).
    *  - forward: mirror image (`lo = min(left.ts)`,
    *    `hi = max(left.ts) + tolerance`).
    * Without a tolerance the stale-side file set stays un-pruned — the
    * nearest predecessor per key can be arbitrarily old, and guessing
    * would change answers.
    *
    * Cost of the envelope: one min/max aggregate over the (batch-sized)
    * left side, driver-resolved before planning. The DML patch composes
    * on the pruned base (add rows are never pruned; shadowed base rows
    * never serve) exactly as in [[serveRangedScan]]. No valid layout →
    * the live session plan, same operator, same answer.
    */
  def asofJoin(left: DataFrame, rightName: String, keyCol: String,
               tsCol: String, carry: Seq[String],
               carryPrefix: String = "asof_",
               tiebreak: Option[String] = None,
               toleranceUs: Option[Long] = None,
               forward: Boolean = false): DataFrame = {
    val (lay, rep) = decide(rightName, s"range:$tsCol",
      _.isInstanceOf[RangedLayout])
    val needed = (Seq(keyCol, tsCol) ++ carry).distinct
    def run(right: DataFrame): DataFrame = {
      val r = right.select(needed.map(col): _*)
      if (forward)
        graft.operators.AsOfJoin.asofForward(left, r, keyCol, tsCol,
          carry, carryPrefix, tiebreak, toleranceUs)
      else
        graft.operators.AsOfJoin.asofBackward(left, r, keyCol, tsCol,
          carry, carryPrefix, tiebreak, toleranceUs)
    }
    lay match {
      case Some(l: RangedLayout) =>
        val mm = left.agg(min(col(tsCol)), max(col(tsCol))).head()
        if (mm.isNullAt(0)) { // empty probe side: nothing can match
          recordRoute(rep.copy(reason = "asof-empty-left"))
          return run(Positional.strip(sessionOf(rightName).current).limit(0))
        }
        val (minL, maxL) = (mm.get(0), mm.get(1))
        def widen(v: Any, us: Long): Option[Any] = v match {
          case t: java.sql.Timestamp =>
            Some(java.sql.Timestamp.from(t.toInstant.plusNanos(us * 1000L)))
          case i: java.time.Instant => Some(i.plusNanos(us * 1000L))
          case _ => None // non-timestamp axis: skip the stale-side prune
        }
        val (lo, hi) =
          if (forward)
            (Some(minL), toleranceUs.flatMap(t => widen(maxL, t)))
          else
            (toleranceUs.flatMap(t => widen(minL, -t)), Some(maxL))
        val files = graft.io.SkippingIndex.candidateFilesOpt(l.stats, lo, hi)
        val base =
          if (files.isEmpty) spark.read.parquet(l.path).limit(0)
          else spark.read.parquet(files: _*)
        recordRoute(rep.copy(reason = "asof-pruned"))
        run(patchedFullRows(base, l.idCol, l.patch))
      case _ =>
        recordRoute(rep)
        run(Positional.strip(sessionOf(rightName).current))
    }
  }

}
