package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * Scale shape: the centroid set is k rows — always broadcast, so
  * [[assign]] is a map-only pass over the vectors (no shuffle, no
  * candidate join). [[step]] shuffles (centroid, dim) partial rows, never
  * whole vectors; its exact ordered-fold mean is the oracle-matched form —
  * at 100 TB you would relax it to decimal partial sums (order-free,
  * mergeable) at the cost of bit-parity with a sequential oracle.
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

  /** Nearest-centroid assignment by cosine similarity: one broadcast
    * cross join (k rows per vector, map-side) and a per-vector argmax via
    * a window over the tiny k-row groups. Output: (id, centroid_id, sim),
    * one row per input vector.
    */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame, roundTo: Int = 6): DataFrame = {
    graft.functions.VectorExpressions.register(df.sparkSession)
    val sim = round(call_function(graft.functions.VectorExpressions.COSINE_FN,
      col(vecCol), col("centroid")), roundTo)
    val best = Window.partitionBy(col(idCol))
      .orderBy(col("sim").desc, col("centroid_id").asc)
    df.crossJoin(broadcast(centroids))
      .select(col(idCol).as("id"), col("centroid_id"), sim.as("sim"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("id").orderBy(col("sim").desc,
          col("centroid_id").asc)))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** One Lloyd update: the element-wise mean of each centroid's assigned
    * vectors. Output: (centroid_id, dim, mean_val, n_members) — long form
    * so the result is a plain relation (and oracle-comparable).
    *
    * The per-dimension sum is a sequential left-fold in assignment-id
    * order (sort_array of (id, x) structs → aggregate), matching the
    * DuckDB `list(x ORDER BY id)` fold bit-for-bit. Rows entering the
    * aggregate are (centroid, dim) pairs — k·dim groups, each holding one
    * double per member vector.
    */
  def step(df: DataFrame, idCol: String, vecCol: String,
           centroids: DataFrame, roundTo: Int = 6): DataFrame = {
    val assigned = assign(df, idCol, vecCol, centroids, roundTo)
      .select(col("id"), col("centroid_id"))
    df.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .join(assigned, "id")
      .select(col("id"), col("centroid_id"),
        posexplode(col("__v")).as(Seq("dim", "__x")))
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
}
