package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic k-means building blocks over `array<float>` embedding
  * columns — the clustering step a curation pipeline runs before IVF
  * indexing ([[Similarity.ivfTopK]]) or per-cluster sampling. The reference
  * has no vector surface at all (SURVEY.md §7.5 extension family); this is
  * the Lloyd iteration expressed as two declarative Spark stages.
  *
  * Determinism contract (same discipline as the IVF-flat path): centroids
  * seed from the k smallest ids — never a random init, which no
  * cross-engine oracle could reproduce — and every distance is a
  * sequential-fold cosine rounded to 6 decimals with the centroid id as
  * tiebreak, so assignment is bit-stable under any partitioning.
  *
  * Scale shape: the centroid set is k rows, collected once and compiled
  * into the plan as literal vectors — [[assign]] is then a map-only
  * projection (scan → argmax-over-k-expressions), no join, no shuffle, no
  * window. That is the right shape for k up to a few thousand; beyond
  * that, swap in a broadcast-join + `max_by` aggregation. [[step]] reuses
  * the same projection and shuffles only (centroid, dim) decimal
  * partials: per-dimension sums are order-free fixed-point decimal sums
  * (exact, mergeable, map-side-combinable), so aggregation state per
  * group is one decimal + one count — never a row-sized buffer — and the
  * DuckDB oracle replays the same decimal arithmetic bit-for-bit.
  */
object Clustering {

  /** The k vectors with the smallest ids, as (centroid_id, centroid).
    * Deterministic stand-in for k-means|| seeding.
    */
  def seedCentroids(df: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(col(idCol).as("centroid_id"), col(vecCol).as("centroid"))
      .orderBy("centroid_id").limit(k)
  }

  /** `(sim, -centroid_id)` struct of the winning centroid for `vecCol`:
    * array_max over one codegen'd cosine expression per centroid — struct
    * ordering compares sim first, then the negated id, so ties go to the
    * smallest centroid id. Collecting the k-row centroid set to the driver
    * is the vector twin of [[Similarity.vectorLit]]'s broadcast-as-literal
    * query vector.
    */
  private def best(df: DataFrame, vecCol: String, centroids: DataFrame,
                   roundTo: Int): Column = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val cents = centroids.collect().map { r =>
      (r.getLong(0), r.getAs[scala.collection.Seq[Float]](1).toSeq)
    }
    require(cents.nonEmpty, "empty centroid set")
    array_max(array(cents.toIndexedSeq.map { case (cid, v) =>
      struct(
        round(call_function(graft.functions.VectorExpressions.COSINE_FN,
          col(vecCol), Similarity.vectorLit(v)), roundTo).as("sim"),
        lit(-cid).as("negcid"))
    }: _*))
  }

  /** Nearest-centroid assignment by cosine similarity, as a map-only pass
    * over the vectors. Output: (id, centroid_id, sim), one row per input
    * vector.
    */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, roundTo: Int = 6): DataFrame =
    df.select(col(idCol).as("id"),
        best(df, vecCol, centroids, roundTo).as("__b"))
      .select(col("id"), (-col("__b.negcid")).as("centroid_id"),
        col("__b.sim").as("sim"))

  /** One Lloyd update: the element-wise mean of each centroid's assigned
    * vectors. Output: (centroid_id, dim, mean_val, n_members) — long form
    * so the result is a plain relation (and oracle-comparable).
    *
    * Assignment is inlined into the same projection (no self-join), so the
    * only exchange is the (centroid, dim) hash aggregate. The
    * per-dimension sum is an order-free fixed-point decimal sum over
    * `roundTo`-rounded components (the v_embed_drift idiom): exact —
    * decimal addition is associative and commutative, so any partition
    * order and any partial/final merge tree produce the same digits the
    * DuckDB oracle's decimal sum does — and each aggregation buffer holds
    * ONE decimal + one count, not one struct per assigned vector. `idCol`
    * stays in the signature for call-site symmetry with [[assign]] but no
    * longer orders anything.
    */
  def step(df: DataFrame, idCol: String, vecCol: String,
           centroids: DataFrame, roundTo: Int = 6): DataFrame =
    df.select(
        (-best(df, vecCol, centroids, roundTo)("negcid")).as("centroid_id"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy(col("centroid_id"), col("dim"))
      .agg(
        sum(round(col("__x").cast("double"), roundTo)
          .cast(s"decimal(18,$roundTo)")).as("__sum"),
        count(lit(1)).as("n_members"))
      .select(col("centroid_id"), col("dim"),
        round(col("__sum").cast("double") / col("n_members"), roundTo)
          .as("mean_val"),
        col("n_members"))

  /** Distributed power iteration for the top right-singular direction of
    * the embedding matrix (the first PCA axis of the uncentered data) —
    * the one-vector spectral summary a curation pipeline uses to spot a
    * dominant direction (a template, a watermark, one source's boilerplate)
    * before whitening or balancing.
    *
    * Each round is ONE aggregate job: every row's projection s = ⟨x, v⟩ is
    * computed in the same scan that explodes x, the (dim) hash-aggregate
    * sums s·x[d] as an order-free fixed-point decimal (9dp-rounded
    * contributions — exact AND mergeable, see [[step]]; the DuckDB oracle
    * replays the same decimal sum, so bit-parity holds without pinning
    * any fold order), and the driver holds only the dim-sized w —
    * normalize, re-embed as a literal, repeat. Driver state = dim
    * doubles; shuffle = (dim) decimal partials with map-side combine;
    * aggregation state = one decimal per dim group, never a row-sized
    * buffer.
    *
    * v0 = uniform 1/√dim (never random — cross-engine replayable); with
    * a positive v0 the sign of the result is deterministic. Output:
    * (dim, comp, sigma) where comp is the round-`roundTo` final unit
    * vector and sigma = ‖Aᵀ(Av)‖ of the last round (the eigenvalue of
    * AᵀA at convergence).
    */
  /** One power-iteration round as a plan: Aᵀ(Av) per dimension, the
    * per-dim decimal partial sum described on [[powerIteration]].
    * Factored out so the plan-shape suite can pin the aggregate's state
    * shape (no `sort_array(collect_list(...))` row-sized buffer).
    */
  private[graft] def powerRound(df: DataFrame, vecCol: String,
                                v: Array[Double]): DataFrame = {
    val vlit = array(v.toIndexedSeq.map(lit): _*)
    df.select(col(vecCol).as("x"))
      .withColumn("sc", aggregate(
        zip_with(col("x"), vlit, (a, b) => a.cast("double") * b),
        lit(0.0), (acc, y) => acc + y))
      .select(col("sc"), posexplode(col("x")).as(Seq("dim", "xv")))
      .groupBy("dim")
      .agg(sum(round(col("sc") * col("xv").cast("double"), 9)
        .cast("decimal(18,9)")).cast("double").as("w"))
  }

  def powerIteration(df: DataFrame, idCol: String, vecCol: String,
                     rounds: Int = 4, roundTo: Int = 6): DataFrame = {
    require(rounds > 0, "rounds must be positive")
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var nrm = 0.0
    for (_ <- 0 until rounds) {
      val w = powerRound(df, vecCol, v)
        .collect().map(r => (r.getInt(0), r.getDouble(1)))
        .sortBy(_._1).map(_._2)
      nrm = math.sqrt(w.foldLeft(0.0)((acc, x) => acc + x * x))
      v = w.map(_ / nrm)
    }
    val sp = df.sparkSession
    import sp.implicits._
    v.toIndexedSeq.zipWithIndex.map { case (c, d) => (d, c) }
      .toDF("dim", "comp")
      .select(col("dim"), round(col("comp"), roundTo).as("comp"),
        round(lit(nrm), roundTo).as("sigma"))
      .orderBy("dim")
  }
}
