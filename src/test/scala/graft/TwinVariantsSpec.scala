package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Similarity

/** The engine-native variants the driver gate cannot hash (xxhash64 hash
  * families, HLL/t-digest sketches, Lloyd-refined IVF) are deliberately NOT
  * in the Verify registry — each has an oracle-green md5/flat twin there
  * instead. This suite is the other half of that contract: the un-replayable
  * variants' own invariants, pinned here so dropping them from the registry
  * never drops their coverage. (simhashPairs, lshTopK and ivfAssign(iters>0)
  * already have dedicated ExtensionSpec/ScaleOpsSpec tests.)
  */
class TwinVariantsSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")
  private lazy val li = Tables.load(spark, sf, "lineitem")

  test("every registered query has an oracle — the gate can never record no_oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q.subsetOf(o), s"queries without oracles: ${q -- o}")
  }

  test("built-in sketch surface (a5's twin base): approx answers track exact ones") {
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median"))
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("median"))
    val j = approx.join(exact, "l_returnflag").collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      val (ap, ep) = (r.getAs[Long]("approx_parts").toDouble,
        r.getAs[Long]("parts").toDouble)
      assert(math.abs(ap - ep) / ep < 0.1,
        s"HLL off by >10%: $ap vs $ep (${r.getString(0)})")
      val (am, em) = (r.getAs[Double]("approx_median"),
        r.getAs[Double]("median"))
      assert(math.abs(am - em) / em < 0.1,
        s"approx median off by >10%: $am vs $em (${r.getString(0)})")
    }
  }

  test("xxhash64 rolling hash: deterministic, order-sensitive, non-degenerate") {
    val h = docs.select(col("doc_id"),
      TextFunctions.rollingHash(col("text")).as("rhash"))
    val again = docs.select(col("doc_id"),
      TextFunctions.rollingHash(col("text")).as("rhash"))
    assert(h.exceptAll(again).isEmpty, "rolling hash is not deterministic")
    // order sensitivity: a reversed token stream must not collide (the
    // property a commutative bag-hash would fail)
    val probe = spark.createDataFrame(Seq(
      (1L, "alpha beta gamma"), (2L, "gamma beta alpha"))).toDF("id", "t")
    val hv = probe.select(TextFunctions.rollingHash(col("t")).as("rh"))
      .collect().map(_.getLong(0))
    assert(hv(0) != hv(1), "rolling hash ignored token order")
    // non-degenerate: distinct texts should hash apart
    val n = docs.select(countDistinct(col("text"))).head.getLong(0)
    val nh = h.select(countDistinct(col("rhash"))).head.getLong(0)
    assert(nh == n, s"rolling hash collides: $nh hashes for $n texts")
  }

  test("PQ at-rest layout: stored codes reproduce the re-encode path exactly") {
    val embs = Tables.load(spark, sf, "embeddings")
    val query = embs.filter(col("vec_id") === 0L).head()
      .getAs[scala.collection.Seq[Float]]("embedding").toSeq
    val base = embs.filter(col("vec_id") =!= 0L)
    val seeds = Similarity.pqCodebook(base, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("pq_layout_")
      .toString + "/codes"
    Similarity.pqCodes(base, "vec_id", "embedding", seeds).write.parquet(dir)
    val fromLayout = Similarity.pqTopKFromLayout(spark, dir, seeds, query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val reEncode = Similarity.pqTopK(base, "vec_id", "embedding", query, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromLayout == reEncode,
      s"layout path diverged:\n$fromLayout\nvs\n$reEncode")
    // and the layout really is compressed: m ints per row, no vectors
    val schema = spark.read.parquet(dir).schema
    assert(schema.fieldNames.toSet == Set("id", "codes"))
  }
}
