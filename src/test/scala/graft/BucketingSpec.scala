package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.io.Bucketing

class BucketingSpec extends SparkSpec {
  test("bucketed fact-fact join plans with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a real sort-merge join so the assertion is about bucketing,
      // not about one side being broadcastable at test scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(Tables.load(spark, sf, "lineitem"),
        "b_lineitem", "l_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.load(spark, sf, "orders")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders", "l_orderkey", 4)

      val joined = Bucketing.readTable(spark, "b_lineitem")
        .join(Bucketing.readTable(spark, "b_orders"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan:\n$plan")
      // and it still computes the right thing
      val expected = Tables.load(spark, sf, "lineitem").join(
        Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("partitioned layout prunes non-matching partitions at plan time") {
    val out = java.nio.file.Files.createTempDirectory("part_").toString + "/docs"
    graft.io.Formats.writePartitioned(
      Tables.load(spark, sf, "documents"), out, Seq("lang"))
    // directory-per-value layout exists
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.nonEmpty && dirs.contains("lang=en"))
    // filter on the partition column shows PartitionFilters, and the scan
    // reads only the matching directory
    val q = spark.read.parquet(out).filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"expected partition pruning in plan:\n$plan")
    val expected = Tables.load(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(q.count() == expected)
  }

  test("aggregation on the bucket key also avoids the exchange") {
    try {
      Bucketing.writeBucketed(Tables.load(spark, sf, "lineitem"),
        "b_li_agg", "l_orderkey", 4)
      val agg = Bucketing.readTable(spark, "b_li_agg")
        .groupBy("l_orderkey").agg(sum("l_quantity"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed agg must not shuffle; plan:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_li_agg")
    }
  }
}
