package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over `array<float>` columns.
  *
  * Two tiers, per the standard ANN playbook:
  *  - [[topK]] / [[topKPairs]]: brute-force cosine — the exactness baseline.
  *    A single narrow pass (no shuffle for the query-vector case: the query
  *    is broadcast as a literal); top-k via one partial `limit` per
  *    partition folded into a final sort of k·partitions rows.
  *  - [[lshTopK]]: random-hyperplane LSH — signature bits from
  *    deterministic hash-derived planes, candidates from matching buckets
  *    across L tables, re-ranked exactly. At 100 TB the bucket join touches
  *    only (bucket, id) pairs and the exact re-rank reads just the candidate
  *    vectors; brute force would read every vector for every query.
  *
  * Dot products use `zip_with` + `aggregate` left-folds over doubles —
  * sequential, deterministic accumulation (reproducible across partitionings,
  * and matching an oracle that folds in the same order).
  */
object Similarity {

  /** Sequential left-fold sum of an array<double> column. */
  private def fsum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** dot(a, b) over array<float/double> columns, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    fsum(transform(a, x => x.cast("double") * x.cast("double")))

  /** cosine(a, b) = dot / sqrt(|a|^2 * |b|^2); null-safe for zero vectors.
    * Session-free HOF composition (interpreted); the operators below prefer
    * the codegen'd [[graft.functions.CosineSim]] — both accumulate in the
    * same sequential order, so results are bit-identical.
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(norm2(a) * norm2(b))
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Codegen'd cosine via the registered native expression. */
  private def fastCosine(df: DataFrame, a: Column, b: Column): Column = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    call_function(graft.functions.VectorExpressions.COSINE_FN, a, b)
  }

  /** Literal column from a driver-side query vector (broadcast as a
    * constant into codegen — no join, no shuffle).
    */
  def vectorLit(v: Seq[Float]): Column =
    array(v.map(x => lit(x)): _*)

  /** Brute-force top-k neighbors of a literal query vector.
    * Output: (id, sim) — sim rounded to `roundTo` decimals so ranking is
    * stable under float-accumulation jitter; ties break on id.
    */
  def topK(df: DataFrame, idCol: String, vecCol: String, query: Seq[Float],
           k: Int, roundTo: Int = 6): DataFrame =
    df.select(col(idCol).as("id"),
        round(fastCosine(df, col(vecCol), vectorLit(query)), roundTo).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)

  /** Incremental top-k maintenance: top-k(A ∪ B) = top-k(top-k(A) ∪
    * top-k(B)) under the (sim desc, id) total order, so an interactive
    * session keeps a k-row state per query and folds in each arriving
    * batch by scanning only the batch — never re-scanning the base corpus
    * (the incremental-session pattern of the EDBT 2020 top-k similarity
    * framework in PAPERS.md). The merge itself is a k·|states|-row
    * re-rank — driver-trivial, exact, and associative, so states compose
    * across any batch arrival order.
    */
  def mergeTopK(states: Seq[DataFrame], k: Int): DataFrame = {
    require(states.nonEmpty, "mergeTopK needs at least one state")
    // dedup by id first: states may overlap (at-least-once delivery, a
    // merged state re-merged with a constituent) and a duplicated id would
    // crowd out a legitimate kth neighbor — the dedup is what makes the
    // merge idempotent, not just associative. Same id ⇒ same sim (one
    // query), so max is a no-op tie-break.
    states.reduce(_ unionByName _)
      .groupBy("id").agg(max(col("sim")).as("sim"))
      .orderBy(col("sim").desc, col("id")).limit(k)
  }

  /** Brute-force top-k most-similar *pairs* (the near-dup-by-embedding
    * surface). O(n²/2) — correctness baseline and small-n path; the scale
    * path is [[lshTopK]] buckets or a vector index outside this engine.
    */
  def topKPairs(df: DataFrame, idCol: String, vecCol: String, k: Int,
                roundTo: Int = 6): DataFrame = {
    val a = df.select(col(idCol).as("id_i"), col(vecCol).as("v_i"))
    val b = df.select(col(idCol).as("id_j"), col(vecCol).as("v_j"))
    a.crossJoin(b).filter(col("id_i") < col("id_j"))
      .select(col("id_i"), col("id_j"),
        round(fastCosine(df, col("v_i"), col("v_j")), roundTo).as("sim"))
      .orderBy(col("sim").desc, col("id_i"), col("id_j"))
      .limit(k)
  }

  /** Deterministic ±1 entry of the random projection matrix at (out-dim j,
    * in-dim d): xxhash64 parity. No RNG state — the "matrix" is a hash
    * function, so projecting never ships or stores a matrix and every
    * executor (or engine) derives the same one.
    */
  private def signComponent(j: Column, d: Column): Column =
    when(pmod(xxhash64(lit("rp"), j, d), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** md5-parity twin of [[signComponent]] — cross-engine reproducible, so
    * the projected vectors are oracle-checkable (same split as
    * [[planeComponent]] / [[md5Planes]]).
    */
  val md5Signs: (Column, Column) => Column = (j, d) =>
    when(pmod(conv(substring(md5(concat_ws("|", j, d)), 1, 15), 16, 10)
      .cast("long"), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Johnson–Lindenstrauss sign random projection (Achlioptas ±1): reduce
    * a vector to `outDim` dims via y_j = Σ_i x_i·sign(j,i) / √outDim —
    * the cheap-embedding step before brute-force rerank, clustering, or
    * storage-bounded ANN. Distances are preserved in expectation with
    * relative variance 2/outDim.
    *
    * Scan-local projection (no shuffle, no state); the fold accumulates
    * sequentially in index order, so results are bit-reproducible across
    * partitionings and replayable by an oracle folding in the same order.
    */
  def randomProject(vecCol: Column, outDim: Int,
                    signs: (Column, Column) => Column = signComponent): Column = {
    require(outDim > 0, "outDim must be positive")
    val scale = math.sqrt(outDim.toDouble)
    transform(sequence(lit(0), lit(outDim - 1)), j =>
      aggregate(
        zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
          (x, d) => x.cast("double") * signs(j, d)),
        lit(0.0), (acc, x) => acc + x) / lit(scale))
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): xxhash64 → uniform in [-1, 1]. No RNG state, reproducible on any
    * cluster.
    */
  private def planeComponent(table: Int, plane: Column, d: Column): Column =
    (pmod(xxhash64(lit(table), plane, d), lit(1000003L)).cast("double")
      / 1000003.0) * 2.0 - 1.0

  /** md5-derived plane component — same construction but from a hash both
    * Spark and SQL engines compute identically, so LSH buckets (and thus
    * the whole ANN result) become oracle-checkable cross-engine. Slower
    * than xxhash64 (md5 of a string per component); use for verification,
    * not the hot path.
    */
  val md5Planes: (Int, Column, Column) => Column = (table, plane, d) =>
    (pmod(conv(substring(md5(concat_ws("|", lit(table), plane, d)), 1, 15), 16, 10)
      .cast("long"), lit(1000003L)).cast("double") / 1000003.0) * 2.0 - 1.0

  /** LSH signature for one table: `bits` sign-bits packed into a long.
    * `planes` selects the plane-component family (xxhash64 default).
    */
  def lshBucket(vecCol: Column, table: Int, bits: Int,
                planes: (Int, Column, Column) => Column = planeComponent): Column =
    aggregate(sequence(lit(0), lit(bits - 1)), lit(0L), (acc, p) => {
      val proj = aggregate(
        zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
          (x, d) => x.cast("double") * planes(table, p, d)),
        lit(0.0), (s, x) => s + x)
      acc.bitwiseOR(when(proj > 0.0, call_function("shiftleft", lit(1L), p))
        .otherwise(lit(0L)))
    })

  /** ANN top-k for a literal query via L hyperplane tables of `bits` bits:
    * candidates = vectors sharing a bucket with the query in any table,
    * re-ranked by exact cosine. Recall tunes with (tables, bits).
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, query: Seq[Float],
              k: Int, tables: Int = 8, bits: Int = 8, roundTo: Int = 6,
              planes: (Int, Column, Column) => Column = planeComponent): DataFrame = {
    val spark = df.sparkSession
    val qdf = spark.range(1).select(vectorLit(query).as("qv"))
    val qBuckets: Map[Int, Long] = (0 until tables).map { t =>
      t -> qdf.select(lshBucket(col("qv"), t, bits, planes)).head().getLong(0)
    }.toMap
    val candidate = (0 until tables).map { t =>
      lshBucket(col(vecCol), t, bits, planes) === qBuckets(t)
    }.reduce(_ || _)
    df.filter(candidate)
      .select(col(idCol).as("id"),
        round(fastCosine(df, col(vecCol), vectorLit(query)), roundTo).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** IVF (inverted-file) ANN: deterministic k-means-lite over cosine space.
    * Centroids init from the `nCentroids` lowest-id vectors, a few Lloyd
    * iterations (assign by max cosine, recompute per-dim means), and the
    * assignment column partitions the corpus. Search probes the query's
    * `nProbe` best centroids and exact-ranks only those partitions' rows.
    *
    * Scale: the index build is iters× (one narrow assignment pass + one
    * shuffle of (cid, dim, value) for means); centroids live on the driver
    * (nCentroids × dim floats). Search reads ~nProbe/nCentroids of the data
    * — and if the corpus is *written* partitioned by `__ivf_cid`, partition
    * pruning skips the rest at the file level.
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                nCentroids: Int = 16, iters: Int = 2): (DataFrame, Seq[(Int, Seq[Float])]) = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    var centroids: Seq[(Int, Seq[Float])] =
      df.orderBy(col(idCol)).limit(nCentroids)
        .select(col(vecCol)).collect().zipWithIndex
        .map { case (r, i) => i -> r.getAs[scala.collection.Seq[Float]](0).toSeq }.toSeq

    def assignCol: Column = array_min(array(centroids.map { case (cid, v) =>
      struct((lit(0.0) - fastCosine(df, col(vecCol), vectorLit(v))).as("d"),
        lit(cid).as("cid"))
    }: _*)).getField("cid")

    var it = 0
    while (it < iters) {
      val means = df.select(assignCol.as("cid"), posexplode(col(vecCol)).as(Seq("p", "x")))
        .groupBy("cid", "p").agg(avg(col("x")).as("m"))
        .collect().groupBy(_.getInt(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(r =>
            // round so shuffle-order float jitter can't flip assignments
            math.rint(r.getDouble(2) * 1e6).toFloat / 1e6f).toSeq
        }
      centroids = centroids.map { case (cid, old) => cid -> means.getOrElse(cid, old) }
      it += 1
    }
    (df.withColumn("__ivf_cid", assignCol), centroids)
  }

  /** ANN top-k through an IVF assignment: probe the best `nProbe` centroids
    * for the query, exact-rank candidates only.
    */
  def ivfTopK(assigned: DataFrame, centroids: Seq[(Int, Seq[Float])],
              idCol: String, vecCol: String, query: Seq[Float], k: Int,
              nProbe: Int = 4, roundTo: Int = 6): DataFrame = {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
      }
      val d = math.sqrt(na * nb); if (d == 0.0) 0.0 else dot / d
    }
    val probe = centroids.sortBy { case (cid, v) => (-cos(query, v), cid) }
      .take(nProbe).map(_._1)
    assigned.filter(col("__ivf_cid").isInCollection(probe))
      .select(col(idCol).as("id"),
        round(fastCosine(assigned, col(vecCol), vectorLit(query)), roundTo).as("sim"))
      .orderBy(col("sim").desc, col("id"))
      .limit(k)
  }

  /** Embedding-cosine near-dup pairs: all (i<j) with
    * round(cosine, roundTo) >= threshold. Brute force O(n²/2) — the
    * exactness baseline the oracle can check; [[lshPairs]] is the bucketed
    * scale path (spec-checked to contain every pair this finds).
    * The filter applies to the *rounded* similarity so the threshold
    * boundary is identical across engines.
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
                  threshold: Double, roundTo: Int = 6): DataFrame = {
    val a = df.select(col(idCol).as("id_i"), col(vecCol).as("v_i"))
    val b = df.select(col(idCol).as("id_j"), col(vecCol).as("v_j"))
    a.crossJoin(b).filter(col("id_i") < col("id_j"))
      .select(col("id_i"), col("id_j"),
        round(fastCosine(df, col("v_i"), col("v_j")), roundTo).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** ANN top-k against a *persisted* IVF layout: the corpus written
    * `partitionBy("__ivf_cid")` (see [[graft.io.Formats.writePartitioned]])
    * is probed by reading only the `nProbe` best centroids' partitions —
    * the isin filter is a plan-time PartitionFilter, so non-probed
    * partitions cost zero I/O (spec-verified). This is the at-rest form of
    * [[ivfTopK]]: build once, search many, never rescan the full corpus.
    */
  def ivfTopKFromLayout(spark: org.apache.spark.sql.SparkSession, path: String,
                        centroids: Seq[(Int, Seq[Float])],
                        idCol: String, vecCol: String, query: Seq[Float],
                        k: Int, nProbe: Int = 4, roundTo: Int = 6): DataFrame = {
    val assigned = spark.read.parquet(path)
    ivfTopK(assigned, centroids, idCol, vecCol, query, k, nProbe, roundTo)
  }

  /** Product-quantization ANN (Jégou et al., TPAMI 2011): the vector is
    * cut into `m` subspaces, each subvector replaced by the id of its
    * nearest codeword from a per-subspace codebook, and search runs
    * entirely in the compressed domain — the query precomputes an
    * m × codebookSize table of subspace distances (driver-side, it is
    * query-sized) and every corpus vector's approximate distance is m
    * table lookups. This is the memory-bound 100 TB ANN shape: 64 float32
    * dims (256 B) compress to m = 8 code bytes, so a billion vectors fit
    * where 32 M raw ones did, and the scan is a map-only projection over
    * stored codes — no shuffle; the top-k is TakeOrderedAndProject.
    *
    * Everything is deterministic and cross-engine replayable: codebooks
    * seed from the `codebookSize` smallest-id vectors (the [[Clustering]]
    * seeding discipline — a production build would run Lloyd rounds per
    * subspace via [[Clustering.step]] first), encoding argmins compare
    * round-6 squared L2 with codeword-id tiebreak, and the ADC sum folds
    * the m lookups in subspace order from 0.0.
    *
    * Output: (id, adist) — the k smallest approximate squared distances,
    * ascending, id tiebreak.
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String, query: Seq[Float],
             k: Int, m: Int = 8, codebookSize: Int = 16,
             roundTo: Int = 6): DataFrame = {
    val seeds = codebookSeeds(df, idCol, vecCol, codebookSize)
    val adist = pqAdistCol(df, seeds, query, m, roundTo)
    df.select(col(idCol).as("id"), col(vecCol).as("__x"))
      .select(col("id"), round(adist, roundTo).as("adist"))
      .orderBy(col("adist"), col("id"))
      .limit(k)
  }

  /** The `codebookSize` smallest-id vectors — the deterministic PQ
    * codebook seeding (the PQ twin of [[Clustering.seedCentroids]]).
    */
  private def codebookSeeds(df: DataFrame, idCol: String, vecCol: String,
                            codebookSize: Int): Array[scala.collection.Seq[Float]] = {
    val seeds = df.select(col(idCol), col(vecCol)).orderBy(idCol)
      .limit(codebookSize).collect()
      .map(_.getAs[scala.collection.Seq[Float]](1))
    require(seeds.length == codebookSize, "not enough vectors for the codebook")
    seeds
  }

  /** codebook[j][c] = subvector j of the c-th seed. */
  private def pqSlices(seeds: Array[scala.collection.Seq[Float]],
                       m: Int, sub: Int): Array[Array[Array[Float]]] =
    Array.tabulate(m)(j => seeds.map(v => v.slice(j * sub, (j + 1) * sub).toArray))

  /** ADC table: squared L2 from the query's subvector j to codeword c,
    * folded in dim order — query-sized driver work, shipped as literals.
    */
  private def pqAdcTable(seeds: Array[scala.collection.Seq[Float]],
                         query: Seq[Float], m: Int): Array[Array[Double]] = {
    val dim = query.length
    require(dim % m == 0, "m must divide the vector dimension")
    val sub = dim / m
    val codebook = pqSlices(seeds, m, sub)
    Array.tabulate(m)(j =>
      codebook(j).map { cw =>
        var acc = 0.0
        var d = 0
        while (d < sub) {
          val diff = query(j * sub + d).toDouble - cw(d).toDouble
          acc = acc + diff * diff
          d += 1
        }
        acc
      })
  }

  /** The PQ codes array (one int per subspace) over a vector column bound
    * as `__x`, via the native [[graft.functions.PqEncode]] expression: the
    * argmin over codewords of round-`roundTo` squared L2 (codeword-index
    * tiebreak) as ONE compiled-loop expression node — bit-identical to the
    * original higher-order-function formulation (same fold order, same
    * `round`, same argmin/null laws; see PqExpressions' scaladoc), but
    * neither interpreted per-lambda (the HOF cost: the encode Project ran
    * outside every codegen span) nor an 8k-node unrolled tree (whose
    * analyzer/optimizer cost exceeded the runtime win — measured 1.9 s →
    * 3.3 s at sf0.1).
    */
  private def pqCodesCol(df: DataFrame,
                         seeds: Array[scala.collection.Seq[Float]],
                         m: Int, roundTo: Int): Column = {
    val dim = seeds.headOption.map(_.length)
      .getOrElse(throw new IllegalArgumentException("empty codebook"))
    require(dim % m == 0, "m must divide the vector dimension")
    graft.functions.PqExpressions.register(df.sparkSession)
    call_function(graft.functions.PqExpressions.ENCODE_FN, col("__x"),
      graft.functions.PqExpressions.codebookLit(seeds, m), lit(roundTo))
  }

  /** The query's approximate squared distance from per-subspace code
    * columns: m literal-table lookups folded in subspace order from 0.0 —
    * the compressed-domain scan body. Unrounded; callers round once at
    * the output boundary.
    */
  private def pqLookupCol(table: Array[Array[Double]],
                          codes: IndexedSeq[Column]): Column =
    // unrolled left-assoc sum (not aggregate-over-array): the HOF fold
    // evaluates interpreted, and at m=8 terms the unrolled tree is tiny;
    // identical fold order from 0.0
    table.indices.foldLeft(lit(0.0)) { (acc, j) =>
      acc + element_at(array(table(j).toIndexedSeq.map(lit): _*),
        codes(j) + 1)
    }

  /** Approximate-squared-distance column over a vector column bound as
    * `__x`, via the native [[graft.functions.PqAdist]] expression (encode
    * + ADC lookup in one compiled loop; bit-identical to the composed
    * form — see [[pqCodesCol]]). Unrounded — callers round once at the
    * output boundary.
    */
  private def pqAdistCol(df: DataFrame,
                         seeds: Array[scala.collection.Seq[Float]],
                         query: Seq[Float], m: Int, roundTo: Int): Column = {
    graft.functions.PqExpressions.register(df.sparkSession)
    call_function(graft.functions.PqExpressions.ADIST_FN, col("__x"),
      graft.functions.PqExpressions.codebookLit(seeds, m), lit(roundTo),
      graft.functions.PqExpressions.tableLit(pqAdcTable(seeds, query, m)))
  }

  /** The deterministic PQ codebook for a corpus — the `codebookSize`
    * smallest-id vectors (see [[pqTopK]]'s scaladoc for why seeding is
    * id-ordered). Build it ONCE per corpus and pass it to both the encode
    * ([[pqCodes]]) and every search ([[pqTopKFromCodes]] /
    * [[pqTopKFromLayout]]) so index and queries share one codebook.
    */
  def pqCodebook(df: DataFrame, idCol: String, vecCol: String,
                 codebookSize: Int = 16): Array[scala.collection.Seq[Float]] =
    codebookSeeds(df, idCol, vecCol, codebookSize)

  /** PQ encode the corpus ONCE: (id, codes array<int> of length m) — the
    * at-rest form [[pqTopK]]'s scaladoc promises. 64 float32 dims (256 B)
    * become m = 8 small ints; write this to parquet and every subsequent
    * query scans codes (m table lookups/row via [[pqTopKFromCodes]])
    * instead of re-encoding the corpus per query. Map-only, no shuffle.
    */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
              seeds: Array[scala.collection.Seq[Float]], m: Int = 8,
              roundTo: Int = 6): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("__x"))
      .select(col("id"), pqCodesCol(df, seeds, m, roundTo).as("codes"))

  /** ANN top-k over an ALREADY-ENCODED corpus (the output of [[pqCodes]],
    * in memory or re-read from parquet): the query builds its m ×
    * codebookSize ADC table driver-side and the scan is m literal-table
    * lookups per row into a TakeOrdered top-k — no per-query re-encode,
    * no higher-order array math over raw vectors, no shuffle. Identical
    * output to [[pqTopK]] on the same corpus/codebook (same argmin codes,
    * same fold order).
    */
  def pqTopKFromCodes(codes: DataFrame,
                      seeds: Array[scala.collection.Seq[Float]],
                      query: Seq[Float], k: Int, m: Int = 8,
                      roundTo: Int = 6): DataFrame = {
    val table = pqAdcTable(seeds, query, m)
    // element_at over the STORED array is a plain read per subspace —
    // cheap, unlike element_at over a computed codes expression
    val stored = (0 until m).map(j => element_at(col("codes"), j + 1))
    codes.select(col("id"),
        round(pqLookupCol(table, stored), roundTo).as("adist"))
      .orderBy(col("adist"), col("id"))
      .limit(k)
  }

  /** ANN top-k against a *persisted* PQ layout (parquet written from
    * [[pqCodes]]) — the PQ twin of [[ivfTopKFromLayout]]: build once,
    * search many, the search never touches a raw vector.
    */
  def pqTopKFromLayout(spark: org.apache.spark.sql.SparkSession, path: String,
                       seeds: Array[scala.collection.Seq[Float]],
                       query: Seq[Float], k: Int, m: Int = 8,
                       roundTo: Int = 6): DataFrame =
    pqTopKFromCodes(spark.read.parquet(path), seeds, query, k, m, roundTo)

  /** Total PQ quantization error: 1 row (n, total_sqerr) where total_sqerr
    * sums every vector's per-subspace minimum squared L2 to its codebook —
    * the Lloyd objective. The diagnostic that prices a codebook before a
    * corpus is committed to it (and the monotone quantity
    * [[pqCodebookRefined]] improves).
    */
  def pqQuantizationError(df: DataFrame, idCol: String, vecCol: String,
                          seeds: Array[scala.collection.Seq[Float]],
                          m: Int = 8, roundTo: Int = 6): DataFrame = {
    val dim = seeds.head.length
    require(dim % m == 0, "m must divide the vector dimension")
    // native compiled loop, same fold/round/argmin laws — see [[pqCodesCol]]
    graft.functions.PqExpressions.register(df.sparkSession)
    val err = call_function(graft.functions.PqExpressions.MIN_DIST_FN,
      col("__x"), graft.functions.PqExpressions.codebookLit(seeds, m),
      lit(roundTo))
    df.select(col(idCol).as("id"), col(vecCol).as("__x"))
      .select(col("id"), err.as("__e"))
      .agg(count(lit(1)).as("n"), round(sum(col("__e")), roundTo)
        .as("total_sqerr"))
  }

  /** Lloyd-refined PQ codebook (the production build [[pqTopK]]'s scaladoc
    * promises): starting from the deterministic id-ordered seeds, each
    * iteration re-encodes the corpus (per-subspace L2 argmin — the same
    * metric the codes use, NOT the cosine of [[Clustering]]) and replaces
    * every codeword with the element-wise mean of its assigned subvectors.
    * One pass per iteration: encode + posexplode + (subspace, code, dim)
    * hash aggregate; the collected OUTPUT is codebook-sized (m ×
    * codebookSize × sub = one codebook). Per-dimension means are
    * order-free fixed-point decimal partial sums over `roundTo`-rounded
    * components (the [[Clustering.step]] discipline): decimal addition is
    * associative and commutative, so refinement is partitioning-invariant
    * with ONE decimal + one count of aggregation state per (code, dim)
    * group — never a struct per assigned vector — which means this build
    * is safe to point at a full corpus, not just a training sample
    * (though sampling first remains the standard FAISS practice purely
    * for build cost). Empty codewords keep their previous value.
    *
    * The refined codebook is returned in the same synthetic-seed form the
    * whole PQ surface consumes (full-length vectors whose j-th slice is
    * subspace j's codeword), so it drops into [[pqCodes]] /
    * [[pqTopKFromCodes]] / [[pqTopK]]-equivalent search unchanged.
    */
  /** One refinement round's (j, code, dim, mean) relation — factored so
    * the plan-shape suite can pin the aggregate's bounded state (decimal
    * partial sums, no `sort_array(collect_list(...))` row-sized buffer).
    */
  private[graft] def pqRefineMeans(df: DataFrame, idCol: String,
      vecCol: String, seeds: Array[scala.collection.Seq[Float]], m: Int,
      sub: Int, roundTo: Int): DataFrame = {
    df.select(col(idCol).as("id"), col(vecCol).as("__x"))
      // codes in their OWN projection, the explode in the next: the m
      // argmins run ONCE per row before the ×dim explode
      .select(col("__x"), pqCodesCol(df, seeds, m, roundTo).as("__codes"))
      .select(col("__codes"), posexplode(col("__x")).as(Seq("dim", "x")))
      .select(col("dim"), col("x"),
        (col("dim") / sub).cast("int").as("j"),
        element_at(col("__codes"),
          (col("dim") / sub).cast("int") + 1).as("code"))
      .groupBy(col("j"), col("code"), col("dim"))
      .agg(sum(round(col("x").cast("double"), roundTo)
          .cast(s"decimal(18,$roundTo)")).as("__sum"),
        count(lit(1)).as("__n"))
      .select(col("j"), col("code"), col("dim"),
        round(col("__sum").cast("double") / col("__n"), roundTo).as("mean"))
  }

  def pqCodebookRefined(df: DataFrame, idCol: String, vecCol: String,
                        m: Int = 8, codebookSize: Int = 16, iters: Int = 2,
                        roundTo: Int = 6): Array[scala.collection.Seq[Float]] = {
    var seeds = codebookSeeds(df, idCol, vecCol, codebookSize)
    val dim = seeds.head.length
    require(dim % m == 0, "m must divide the vector dimension")
    val sub = dim / m
    var it = 0
    while (it < iters) {
      val means = pqRefineMeans(df, idCol, vecCol, seeds, m, sub, roundTo)
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
          r.getDouble(3).toFloat)).toMap
      seeds = seeds.zipWithIndex.map { case (old, c) =>
        (0 until dim).map(d =>
          means.getOrElse(((d / sub), c, d), old(d))): scala.collection.Seq[Float]
      }
      it += 1
    }
    seeds
  }

  /** IVF-PQ composite — the FAISS-at-scale shape: the coarse IVF quantizer
    * prunes the corpus to `nProbe` cells and PQ ranks only the survivors
    * in the compressed domain. At rest the corpus stores one byte-array of
    * codes per vector partitioned by cell: a probe reads nProbe/nCentroids
    * of the files (partition pruning, like [[ivfTopKFromLayout]]) and
    * scans codes, never raw vectors. The codebook trains on the corpus-wide
    * seed set — independent of which cells a query probes, so one codebook
    * serves every query.
    *
    * Deterministic end to end (seeded coarse centroids, round-6 argmins,
    * literal ADC table), so the composite is oracle-replayable like its
    * two constituents. Output: (id, adist) ascending, id tiebreak.
    */
  /** The `nProbe` coarse cells nearest the query by cosine (centroid-id
    * tiebreak) — the driver-side probe selection every IVF search shares.
    */
  private def probeCells(cents: Seq[(Int, Seq[Float])], query: Seq[Float],
                         nProbe: Int): Seq[Int] = {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      val d = math.sqrt(na * nb); if (d == 0.0) 0.0 else dot / d
    }
    cents.sortBy { case (cid, v) => (-cos(query, v), cid) }
      .take(nProbe).map(_._1)
  }

  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
                query: Seq[Float], k: Int, nCentroids: Int = 8,
                nProbe: Int = 4, m: Int = 8, codebookSize: Int = 16,
                roundTo: Int = 6): DataFrame = {
    val (assigned, cents) = ivfAssign(df, idCol, vecCol, nCentroids, iters = 0)
    val probe = probeCells(cents, query, nProbe)
    val seeds = codebookSeeds(df, idCol, vecCol, codebookSize)
    val adist = pqAdistCol(df, seeds, query, m, roundTo)
    assigned.filter(col("__ivf_cid").isInCollection(probe))
      .select(col(idCol).as("id"), col(vecCol).as("__x"))
      .select(col("id"), round(adist, roundTo).as("adist"))
      .orderBy(col("adist"), col("id"))
      .limit(k)
  }

  /** Build the IVF-PQ at-rest index in one pass: every vector's coarse
    * cell plus its m PQ codes — the table that, written
    * `partitionBy("__ivf_cid")` (see [[graft.io.Formats.writePartitioned]]),
    * IS the FAISS-style inverted file. Returns (codes relation, coarse
    * centroids, codebook) — the two driver-sized sidecars a searcher
    * needs alongside the parquet.
    */
  def ivfPqCodes(df: DataFrame, idCol: String, vecCol: String,
                 nCentroids: Int = 8, m: Int = 8, codebookSize: Int = 16,
                 roundTo: Int = 6):
      (DataFrame, Seq[(Int, Seq[Float])], Array[scala.collection.Seq[Float]]) = {
    val (assigned, cents) = ivfAssign(df, idCol, vecCol, nCentroids, iters = 0)
    val seeds = codebookSeeds(df, idCol, vecCol, codebookSize)
    val codes = assigned
      .select(col(idCol).as("id"), col("__ivf_cid"), col(vecCol).as("__x"))
      .select(col("id"), col("__ivf_cid"),
        pqCodesCol(df, seeds, m, roundTo).as("codes"))
    (codes, cents, seeds)
  }

  /** Encode a batch of NEW or EDITED vectors against an EXISTING IVF-PQ
    * quantizer (frozen coarse cents + codebook) — the delta-maintenance
    * path: a patch row must land in exactly the cell and codes a full
    * build with this quantizer would produce, and retraining on a patch
    * would silently shift every stored code's meaning. Same assignment
    * expression as [[ivfAssign]], same code expressions as
    * [[ivfPqCodes]]; output (id, __ivf_cid, codes).
    */
  def ivfPqEncodeWith(df: DataFrame, idCol: String, vecCol: String,
                      cents: Seq[(Int, Seq[Float])],
                      seeds: Array[scala.collection.Seq[Float]],
                      m: Int = 8, roundTo: Int = 6): DataFrame = {
    val cid = array_min(array(cents.map { case (c, v) =>
      struct((lit(0.0) - fastCosine(df, col(vecCol), vectorLit(v))).as("d"),
        lit(c).as("cid"))
    }: _*)).getField("cid")
    df.select(col(idCol).as("id"), cid.as("__ivf_cid"),
        col(vecCol).as("__x"))
      .select(col("id"), col("__ivf_cid"),
        pqCodesCol(df, seeds, m, roundTo).as("codes"))
  }

  /** IVF-PQ search over an already-built codes relation (the output of
    * [[ivfPqCodes]], in memory or re-read from its partitioned layout):
    * probe selection is driver-side, the cell filter prunes partitions at
    * plan time when the layout is cell-partitioned, and the survivors are
    * ranked by m stored-code table lookups per row — no re-assign, no
    * re-encode, no raw vectors. Identical output to [[ivfPqTopK]] on the
    * same corpus (same centroids, codebook, argmin codes, fold order).
    */
  def ivfPqTopKFromCodes(codes: DataFrame, cents: Seq[(Int, Seq[Float])],
                         seeds: Array[scala.collection.Seq[Float]],
                         query: Seq[Float], k: Int, nProbe: Int = 4,
                         m: Int = 8, roundTo: Int = 6): DataFrame = {
    val probe = probeCells(cents, query, nProbe)
    val table = pqAdcTable(seeds, query, m)
    val stored = (0 until m).map(j => element_at(col("codes"), j + 1))
    codes.filter(col("__ivf_cid").isInCollection(probe))
      .select(col("id"), round(pqLookupCol(table, stored), roundTo).as("adist"))
      .orderBy(col("adist"), col("id"))
      .limit(k)
  }

  /** IVF-PQ search against the *persisted* cell-partitioned codes layout —
    * the at-rest twin of [[ivfPqTopK]], mirroring [[ivfTopKFromLayout]] /
    * [[pqTopKFromLayout]]: a probe reads nProbe/nCentroids of the files
    * (the isin filter is a plan-time PartitionFilter) and scans only code
    * arrays.
    */
  def ivfPqTopKFromLayout(spark: org.apache.spark.sql.SparkSession,
                          path: String, cents: Seq[(Int, Seq[Float])],
                          seeds: Array[scala.collection.Seq[Float]],
                          query: Seq[Float], k: Int, nProbe: Int = 4,
                          m: Int = 8, roundTo: Int = 6): DataFrame =
    ivfPqTopKFromCodes(spark.read.parquet(path), cents, seeds, query, k,
      nProbe, m, roundTo)

  /** Bucketed all-pairs near-dup by embedding: pairs sharing an LSH bucket
    * in any table, exact-cosine filtered to `threshold`. The scale path for
    * [[topKPairs]].
    */
  def lshPairs(df: DataFrame, idCol: String, vecCol: String,
               threshold: Double, tables: Int = 8, bits: Int = 8): DataFrame = {
    val buckets = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(array((0 until tables).map(t =>
        lshBucket(col(vecCol), t, bits)): _*)).as(Seq("t", "b")))
    val x = buckets.select(col("t"), col("b"), col("id").as("id_i"), col("v").as("v_i"))
    val y = buckets.select(col("t"), col("b"), col("id").as("id_j"), col("v").as("v_j"))
    x.join(y, Seq("t", "b")).filter(col("id_i") < col("id_j"))
      .select(col("id_i"), col("id_j"), fastCosine(df, col("v_i"), col("v_j")).as("sim"))
      .distinct()
      .filter(col("sim") >= threshold)
  }

  /** Matryoshka truncation audit: how much ANN quality survives keeping
    * only the first `d` dimensions of each embedding (the
    * Matryoshka-representation deployment question — truncated vectors are
    * d/D the storage and bandwidth; arXiv:2205.13147 trains embeddings for
    * exactly this cut). For each candidate prefix length, the top-k
    * neighbor set of `query` under truncated cosine is compared against
    * the full-dimension top-k; recall@k is the fraction retained.
    *
    * One scan computes every prefix's similarity (slice + cosine are
    * per-row, scan-local; no shuffle until the k-row TakeOrdered per
    * prefix), so auditing 4 prefix lengths costs one pass, not 4.
    *
    * @return (trunc_dim, recall_at_k) — one row per prefix length
    */
  def matryoshkaRecall(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, dims: Seq[Int],
      roundTo: Int = 6): DataFrame = {
    require(dims.nonEmpty && dims.forall(d => d > 0 && d <= query.length),
      s"prefix dims must be in 1..${query.length}")
    val q = vectorLit(query)
    def top(d: Int): DataFrame =
      df.select(col(idCol).as("id"),
          round(fastCosine(df, slice(col(vecCol), 1, d), slice(q, 1, d)),
            roundTo).as("sim"))
        .orderBy(col("sim").desc, col("id")).limit(k)
    val full = top(query.length).select(col("id"))
    dims.map { d =>
      top(d).join(full, Seq("id"), "left_semi")
        .agg((count(lit(1)).cast("double") / k).as("recall_at_k"))
        .select(lit(d).as("trunc_dim"), col("recall_at_k"))
    }.reduce(_ unionByName _).orderBy("trunc_dim")
  }

  /** Maximal-marginal-relevance top-k (Carbonell & Goldstein 1998): greedy
    * diversity-aware selection — each step takes the candidate maximizing
    * λ·sim(query, d) − (1−λ)·max over already-selected s of sim(d, s).
    * The canonical fix for a near-dup-heavy ANN result page: plain top-k
    * returns k copies of the same document; MMR returns one per cluster.
    *
    * Greedy is inherently sequential in k, so the operator runs k
    * driver-synchronous rounds — but each round is ONE map-only scan +
    * TakeOrdered(1): the selected set lives as literal vectors inside the
    * scoring expression (vectors are driver-sized, k·dim floats), never a
    * join. k is interactive-small (a result page); the corpus side stays
    * arbitrarily large.
    *
    * λ and sims round to `roundTo` before the arg-max compare, ties break
    * on id — fully deterministic, SQL-replayable round by round.
    *
    * @return (rank, id, score) in selection order
    */
  def mmrSelect(df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, lambdaPct: Int = 70,
      roundTo: Int = 6): DataFrame = {
    require(k >= 1, "mmrSelect needs k >= 1")
    require(lambdaPct >= 0 && lambdaPct <= 100, "lambdaPct is a percentage")
    // both weights divide by 100.0 independently: `1.0 - 0.7` is NOT the
    // double an oracle's literal `0.3` parses to (it's 0.30000000000000004)
    val lam = lambdaPct / 100.0
    val mu = (100 - lambdaPct) / 100.0
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"),
        round(fastCosine(df, col(vecCol), vectorLit(query)), roundTo)
          .as("__qs"))
      .localCheckpoint(eager = true) // one corpus pass; rounds re-scan this
    var picked = Vector.empty[(Long, Seq[Float], Double)] // (id, vec, score)
    (1 to k).foreach { _ =>
      val sims = picked.map { case (_, v, _) =>
        round(fastCosine(base, col("v"), vectorLit(v)), roundTo) }
      val divCol = sims.size match {
        case 0 => lit(0.0)
        case 1 => sims.head // greatest() requires >= 2 args
        case _ => greatest(sims: _*)
      }
      val score = round(lit(lam) * col("__qs") - lit(mu) * divCol, roundTo)
      val remaining =
        if (picked.isEmpty) base
        else base.filter(!col("id").isInCollection(picked.map(_._1)))
      val next = remaining
        .select(col("id"), col("v"), score.as("__mmr"))
        .orderBy(col("__mmr").desc, col("id")).limit(1).head()
      picked :+= ((next.getLong(0),
        next.getSeq[Float](1).toSeq, next.getDouble(2)))
    }
    val spark = df.sparkSession
    import spark.implicits._
    picked.zipWithIndex
      .map { case ((id, _, s), i) => (i + 1L, id, s) }
      .toDF("rank", "id", "score")
  }
}
