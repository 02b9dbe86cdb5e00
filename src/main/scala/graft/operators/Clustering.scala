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
  * the same projection and shuffles only (centroid, dim, value) partials;
  * its exact ordered-fold mean is the oracle-matched form — at 100 TB you
  * would relax it to decimal partial sums (order-free, mergeable) at the
  * cost of bit-parity with a sequential oracle.
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
    * per-dimension sum is a sequential left-fold in assignment-id order
    * (sort_array of (id, x) structs → aggregate), matching the DuckDB
    * `list(x ORDER BY id)` fold bit-for-bit.
    */
  def step(df: DataFrame, idCol: String, vecCol: String,
           centroids: DataFrame, roundTo: Int = 6): DataFrame =
    df.select(col(idCol).as("id"),
        (-best(df, vecCol, centroids, roundTo)("negcid")).as("centroid_id"),
        posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .groupBy(col("centroid_id"), col("dim"))
      .agg(
        aggregate(
          transform(sort_array(collect_list(struct(col("id"),
            col("__x").cast("double").as("x")))), s => s("x")),
          lit(0.0), (acc, x) => acc + x).as("__sum"),
        count(lit(1)).as("n_members"))
      .select(col("centroid_id"), col("dim"),
        round(col("__sum") / col("n_members"), roundTo).as("mean_val"),
        col("n_members"))
}
