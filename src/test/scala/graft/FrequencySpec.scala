package graft

import org.apache.spark.sql.functions._
import graft.functions.FrequencyAggregates
import graft.operators.Frequency

class FrequencySpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: item i (1..200) appears ~2000/i times — a long tail
    * far wider than the summary capacity, so eviction actually runs.
    */
  private def skewed = (1 to 200).flatMap(i =>
    Seq.fill(2000 / i)(f"item$i%03d")).toDF("term")

  test("exactHeavyHitters equals the brute-force count filter under eviction") {
    val n = skewed.count()
    val minFrac = 0.01
    val got = Frequency.exactHeavyHitters(skewed, "term", minFrac)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val brute = skewed.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= math.ceil(minFrac * n))
      .orderBy(col("cnt").desc, col("term"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty && got.length < 200, "threshold should be selective")
    assert(got.toSeq === brute.toSeq)
  }

  test("exactHeavyHitters is partitioning-invariant") {
    val a = Frequency.exactHeavyHitters(skewed, "term", 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val b = Frequency.exactHeavyHitters(skewed.repartition(17), "term", 0.02)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(a === b)
  }

  test("SpaceSaving single-stream bounds: cnt overestimates by at most err") {
    FrequencyAggregates.register(spark)
    val truth = skewed.groupBy("term").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the per-item cnt/err bound is a SINGLE-STREAM guarantee (see
    // SpaceSavingSummary scaladoc): after multi-partition merges an item
    // evicted from some partition's summary loses that mass, so the bound
    // is partitioning-dependent. coalesce(1) pins the scope the doc claims.
    val summary = skewed.coalesce(1)
      .agg(call_function(FrequencyAggregates.SPACESAVING_FN,
        col("term"), lit(50)).as("ss"))
      .select(explode(col("ss")).as("e"))
      .select("e.item", "e.cnt", "e.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(summary.length <= 50)
    summary.foreach { case (item, cnt, err) =>
      val t = truth(item)
      assert(t <= cnt, s"$item: summary $cnt must overestimate true $t")
      assert(cnt - err <= t, s"$item: cnt-err ${cnt - err} exceeds true $t")
    }
  }

  test("summary retains every item above the n/capacity guarantee line") {
    FrequencyAggregates.register(spark)
    val n = skewed.count()
    val cap = 50
    val kept = skewed
      .agg(call_function(FrequencyAggregates.SPACESAVING_FN,
        col("term"), lit(cap)).as("ss"))
      .select(explode(col("ss")).as("e")).select("e.item")
      .collect().map(_.getString(0)).toSet
    val mustKeep = skewed.groupBy("term").agg(count(lit(1)).as("c"))
      // 2n/cap: the merged (partial -> final) bound, not the single-stream
      // n/cap one
      .filter(col("c") > lit(2.0 * n / cap))
      .collect().map(_.getString(0)).toSet
    assert(mustKeep.nonEmpty)
    assert(mustKeep.subsetOf(kept),
      s"missing guaranteed items: ${mustKeep -- kept}")
  }
}
