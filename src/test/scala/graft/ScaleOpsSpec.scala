package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Similarity, SkewJoin}

class IvfSpec extends SparkSpec {
  test("IVF assignment covers all rows; probing all centroids = brute force") {
    val embs = Tables.load(spark, sf, "embeddings")
    val (assigned, centroids) = Similarity.ivfAssign(embs, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    assert(assigned.filter(col("__ivf_cid").isNull).count() == 0)
    assert(centroids.size == 8)

    val q = embs.filter(col("vec_id") === 0L).head
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val exact = Similarity.topK(embs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    val allProbe = Similarity.ivfTopK(assigned, centroids, "vec_id", "embedding",
      q, 10, nProbe = 8).collect().map(_.getLong(0)).toSeq
    assert(allProbe == exact, "nProbe = nCentroids must equal brute force")
  }

  test("IVF partial probe keeps decent recall at a fraction of the scan") {
    val embs = Tables.load(spark, sf, "embeddings")
    val (assigned, centroids) = Similarity.ivfAssign(embs, "vec_id", "embedding",
      nCentroids = 8, iters = 2)
    val q = embs.filter(col("vec_id") === 7L).head
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val exact = Similarity.topK(embs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val probed = Similarity.ivfTopK(assigned, centroids, "vec_id", "embedding",
      q, 10, nProbe = 4).collect().map(_.getLong(0)).toSet
    val recall = (exact & probed).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall; exact=$exact probed=$probed")
  }
}

class SkewJoinSpec extends SparkSpec {
  test("salted join equals the plain join, row for row") {
    val orders = Tables.load(spark, sf, "orders")
    val cust = Tables.load(spark, sf, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(cust, "o_custkey")
      .groupBy("c_mktsegment").count()
      .orderBy("c_mktsegment").collect().toSeq
    val salted = SkewJoin.saltedInnerJoin(orders, cust, "o_custkey",
        salts = 7, saltSource = col("o_orderkey"))
      .groupBy("c_mktsegment").count()
      .orderBy("c_mktsegment").collect().toSeq
    assert(salted == plain)
  }
}

class RandomProjectSpec extends SparkSpec {
  test("JL sign projection roughly preserves norms and neighbor structure") {
    val embs = Tables.load(spark, sf, "embeddings").limit(200)
    val proj = embs.select(col("vec_id"),
      Similarity.norm2(col("embedding")).as("n2"),
      Similarity.norm2(Similarity.randomProject(col("embedding"), 16)).as("p2"))
    // E[|y|^2] = |x|^2 with relative variance 2/16; the MEAN ratio over 200
    // vectors concentrates hard around 1
    val ratio = proj.agg(avg(col("p2") / col("n2"))).head.getDouble(0)
    assert(ratio > 0.8 && ratio < 1.2, s"mean norm ratio $ratio")
    // cosines computed in the projected space track the original space:
    // against a fixed probe vector, the sign of agreement dominates
    val probe = embs.filter(col("vec_id") === 0L)
      .select(col("embedding").as("pv"),
        Similarity.randomProject(col("embedding"), 16).as("pp"))
    val both = embs.crossJoin(broadcast(probe))
      .filter(col("vec_id") =!= 0L)
      .select(
        Similarity.cosine(col("embedding"), col("pv")).as("c0"),
        Similarity.cosine(Similarity.randomProject(col("embedding"), 16),
          col("pp")).as("c1"))
    val corr = both.agg(org.apache.spark.sql.functions.corr("c0", "c1"))
      .head.getDouble(0)
    assert(corr > 0.6, s"projected-space cosine should correlate, got $corr")
  }

  test("projection is deterministic and family-stable") {
    val embs = Tables.load(spark, sf, "embeddings").limit(20)
    def run() = embs.select(col("vec_id"),
      Similarity.randomProject(col("embedding"), 8, Similarity.md5Signs)
        .as("p")).collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(run() == run())
  }
}
