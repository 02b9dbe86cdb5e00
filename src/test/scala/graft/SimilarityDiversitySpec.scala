package graft

import org.apache.spark.sql.functions._
import graft.operators.{Behavior, Similarity}

class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (3L, Seq(1.0f, 0.0f)),   // full-dim best
    (5L, Seq(0.9f, 0.44f)),  // full-dim second
    (1L, Seq(0.5f, 0.87f))   // full-dim third, but dim-1 tie winner by id
  ).toDF("id", "v")

  test("full-length prefix has recall 1; lossy prefix drops a neighbor") {
    val q = Seq(1.0f, 0.0f)
    val got = Similarity.matryoshkaRecall(docs, "id", "v", q, k = 2,
      dims = Seq(1, 2)).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // dim 2 (full): top-2 = {3, 5} vs itself -> recall 1.
    // dim 1: every 1-d cosine is 1.0 -> ties break by id -> top-2 = {1, 3},
    // only id 3 is in the true top-2 -> recall 0.5.
    assert(got(2) === 1.0)
    assert(got(1) === 0.5)
  }

  test("prefix dims must fit the query vector") {
    intercept[IllegalArgumentException] {
      Similarity.matryoshkaRecall(docs, "id", "v", Seq(1.0f, 0.0f), 2,
        dims = Seq(3))
    }
  }
}

class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("MMR suppresses the near-duplicate that plain top-k would keep") {
    // b is a near-copy of a; c is genuinely different. Plain top-2 by
    // query similarity is (a, b); at lambda=0.4 the redundancy penalty
    // outweighs b's tiny relevance edge and MMR picks (a, c).
    val docs = Seq(
      (1L, Seq(1.0f, 0.95f)), // a: closest to q
      (2L, Seq(1.0f, 0.94f)), // b: near-dup of a
      (3L, Seq(1.0f, 0.0f))   // c: diverse
    ).toDF("id", "v")
    val q = Seq(1.0f, 1.0f)
    val mmr = Similarity.mmrSelect(docs, "id", "v", q, k = 2, lambdaPct = 40)
      .collect().map(_.getLong(1)).toSeq
    assert(mmr === Seq(1L, 3L))
    val plain = Similarity.topK(docs, "id", "v", q, k = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(plain === Seq(1L, 2L))
  }

  test("rank 1 is always the plain argmax of query similarity") {
    val docs = Seq((7L, Seq(0.1f, 0.9f)), (8L, Seq(0.9f, 0.1f)))
      .toDF("id", "v")
    val got = Similarity.mmrSelect(docs, "id", "v", Seq(1.0f, 0.0f), k = 1)
      .collect()
    assert(got.length === 1 && got(0).getLong(1) === 8L)
  }
}

class EwmaSpec extends SparkSpec {
  import spark.implicits._

  test("ewmaDaily folds s_i = (v_i + 3*s_prev) div 4 in day order") {
    val e = Seq(
      ("k", "2024-01-01 10:00:00", 1.0),
      ("k", "2024-01-02 10:00:00", 2.0),
      ("k", "2024-01-02 11:00:00", 0.0), // same day, sums with the 2.0
      ("k", "2024-01-03 10:00:00", 3.0))
      .toDF("k", "t", "value")
      .select(col("k"), to_timestamp(col("t")).as("ts"), col("value"))
    val got = Behavior.ewmaDaily(e, "k", "ts", "value").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    // daily v (1e-4 units): 10000, 20000, 30000
    // e1 = 10000; e2 = (20000 + 30000) div 4 = 12500
    // e3 = (30000 + 37500) div 4 = 16875
    assert(got.toSeq === Seq((10000L, 10000L), (20000L, 12500L),
      (30000L, 16875L)))
  }

  test("keys smooth independently") {
    val e = Seq(("a", "2024-01-01 00:00:00", 4.0),
      ("b", "2024-01-01 00:00:00", 8.0))
      .toDF("k", "t", "value")
      .select(col("k"), to_timestamp(col("t")).as("ts"), col("value"))
    val got = Behavior.ewmaDaily(e, "k", "ts", "value").collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(got === Map("a" -> 40000L, "b" -> 80000L))
  }
}
