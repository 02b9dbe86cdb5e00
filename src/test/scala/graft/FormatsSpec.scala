package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.io.Formats
import graft.core.Tables

class FormatsSpec extends SparkSpec {
  private def tmp(suffix: String): String =
    Files.createTempDirectory("graft_fmt_").toString + "/out" + suffix

  test("S9: extension dispatch routes and rejects") {
    assert(Formats.detect("a/b.parquet") == Formats.ParquetF)
    assert(Formats.detect("a/b.CSV") == Formats.CsvF)
    assert(Formats.detect("b.json") == Formats.JsonF)
    assert(Formats.detect("b.xlsx") == Formats.ExcelF)
    assert(Formats.detect("b.txt") == Formats.TextF)
    intercept[IllegalArgumentException](Formats.detect("b.avro"))
    // legacy BIFF gets a specific, actionable error — not a ZipException
    val e = intercept[IllegalArgumentException](Formats.detect("old.xls"))
    assert(e.getMessage.contains(".xls"))
  }

  test("compaction rewrites a fragmented dataset without changing its rows") {
    val dir = Files.createTempDirectory("graft_compact_").toString + "/t"
    val orders = Tables.load(spark, sf, "orders")
    orders.repartition(64).write.parquet(dir)   // deliberately fragmented
    val before = spark.read.parquet(dir)
    val beforeSum = before.agg(sum(col("o_orderkey"))).head.getLong(0)
    val stats = graft.io.Compaction.compact(spark, dir, targetFileMB = 512,
      clusterBy = Seq("o_orderkey"))
    assert(stats.filesBefore == 64 && stats.filesAfter < 8,
      s"expected big file-count drop, got $stats")
    val after = spark.read.parquet(dir)
    assert(after.count() == orders.count())
    assert(after.agg(sum(col("o_orderkey"))).head.getLong(0) == beforeSum)
  }

  test("partitioned compaction preserves layout and rows per partition") {
    val dir = Files.createTempDirectory("graft_pcompact_").toString + "/t"
    val orders = Tables.load(spark, sf, "orders")
    orders.repartition(16).write.partitionBy("o_orderpriority").parquet(dir)
    val before = spark.read.parquet(dir)
    val n0 = before.count()
    // flat compact must refuse the partitioned layout...
    intercept[IllegalArgumentException](
      graft.io.Compaction.compact(spark, dir))
    // ...per-partition compact handles it
    val stats = graft.io.Compaction.compactPartitioned(spark, dir)
    assert(stats.nonEmpty && stats.values.forall(s => s.filesAfter <= s.filesBefore))
    val after = spark.read.parquet(dir)
    assert(after.count() == n0)
    // the partition column survives and still prunes
    assert(after.select("o_orderpriority").distinct().count() ==
      orders.select("o_orderpriority").distinct().count())
  }

  test("partitioned compaction refuses nested layouts before touching anything") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ncompact_").toString + "/t"
    Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "k1", "k2")
      .write.partitionBy("k1", "k2").parquet(dir)
    val filesBefore = spark.read.parquet(dir).inputFiles.toSet
    intercept[IllegalArgumentException](
      graft.io.Compaction.compactPartitioned(spark, dir))
    // refused up front: no partition was rewritten
    assert(spark.read.parquet(dir).inputFiles.toSet == filesBefore)
  }

  test("schema evolution: mergeSchema unions old and new parquet schemas") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evo_").toString
    // v1 writer: (id, a) — v2 adds column b; both live in one dataset dir
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "z", 7.5)).toDF("id", "a", "b")
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "b", "batch"))
    assert(merged.count() == 3)
    // rows written before the column existed read as null, not garbage
    assert(merged.filter(col("b").isNull).count() == 2)
    assert(merged.filter(col("b") === 7.5).select("id").head.getLong(0) == 3L)
  }

  test("S1/S5: parquet round-trip preserves schema and rows") {
    val n = Tables.load(spark, sf, "nation")
    val path = tmp(".parquet")
    Formats.write(n, path)
    val back = Formats.read(spark, path)
    assert(back.count() == n.count())
    assert(back.schema == n.schema)
  }

  test("S2/S6: csv round-trip preserves rows (types re-inferred)") {
    val r = Tables.load(spark, sf, "region")
    val path = tmp(".csv")
    Formats.write(r, path)
    val back = Formats.read(spark, path)
    assert(back.count() == r.count())
    assert(back.columns.toSeq == r.columns.toSeq)
  }

  test("S2 schema-reuse: explicit schema matches the written frame exactly") {
    val o = Tables.load(spark, sf, "orders")
    val path = tmp(".csv")
    Formats.write(o, path)
    val back = Formats.read(spark, path, o.schema)
    // inference can only approximate the writer's types; the explicit
    // schema reproduces them exactly — and reads the file once, not twice
    assert(back.schema == o.schema)
    assert(back.count() == o.count())
    val key = o.columns.head
    val a = o.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.col(key))).head().get(0)
    val b = back.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.col(key))).head().get(0)
    assert(a == b, s"checksum drifted over the schema-reuse round-trip")
  }

  test("schema-reuse read conforms driver-side codecs by cast") {
    import org.apache.spark.sql.types._
    val df = spark.createDataFrame(Seq((1L, "x", 1.5), (2L, "y", -0.25)))
      .toDF("id", "name", "score")
    val path = tmp(".xlsx")
    Formats.write(df, path)
    val target = StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("score", DoubleType)))
    val back = Formats.read(spark, path, target)
    assert(back.schema == target)
    assert(back.count() == 2)
  }

  test("S4/S8: json round-trip (records orientation) preserves rows") {
    val n = Tables.load(spark, sf, "nation")
    val path = tmp(".json")
    Formats.write(n, path)
    val back = Formats.read(spark, path)
    assert(back.count() == n.count())
    assert(back.columns.sorted.toSeq == n.columns.sorted.toSeq)
  }

  test("S5 single-file sink writes exactly one file at the given path") {
    val n = Tables.load(spark, sf, "nation")
    val path = tmp(".parquet")
    Formats.writeSingleFile(n, path)
    val f = new java.io.File(path)
    assert(f.isFile)
    val back = spark.read.parquet(path)
    assert(back.count() == n.count())
  }

  test("S5 single-file text sink round-trips the one-string-column contract") {
    val n = Tables.load(spark, sf, "nation")
      .select(org.apache.spark.sql.functions.col("n_name"))
    val path = tmp(".txt")
    Formats.writeSingleFile(n, path)
    assert(new java.io.File(path).isFile)
    val back = spark.read.text(path)
    assert(back.count() == n.count())
  }

  test("S3/S7: xlsx round-trip preserves rows, names, and primitive types") {
    val n = Tables.load(spark, sf, "nation")
    val path = tmp(".xlsx")
    Formats.write(n, path)
    assert(new java.io.File(path).isFile)
    val back = Formats.read(spark, path)
    assert(back.count() == n.count())
    assert(back.columns.toSeq == n.columns.toSeq)
    // values survive: compare the full sorted contents
    val a = n.orderBy("n_nationkey").collect().map(_.toSeq.map(String.valueOf))
    val b = back.orderBy("n_nationkey").collect().map(_.toSeq.map(String.valueOf))
    assert(a.map(_.mkString("|")).toSeq == b.map(_.mkString("|")).toSeq)
  }

  test("S3/S7: xlsx handles nulls, booleans, doubles and special chars") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(1.5), Some(true), Some("a<b&c>\"d\"")),
      (2L, None, Some(false), None),
      (3L, Some(45.0), None, Some("plain"))
    ).toDF("id", "x", "ok", "s")
    val path = tmp(".xlsx")
    Formats.write(df, path)
    val back = Formats.read(spark, path).orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getDouble(1) == 1.5 && back(0).getBoolean(2))
    assert(back(1).isNullAt(1) && !back(1).getBoolean(2) && back(1).isNullAt(3))
    assert(back(0).getString(3) == "a<b&c>\"d\"")
    // integral doubles must stay doubles (45.0, not long 45)
    assert(back(2).getDouble(1) == 45.0)
  }

  test("S10: empty table has zero rows and zero columns") {
    val e = Formats.emptyTable(spark)
    assert(e.columns.isEmpty && e.count() == 0)
  }
}

class QueriesSmokeSpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  // e_anomaly legitimately returns zero rows at sf0.001: its n >= 30
  // window floor can never fill there (max trailing-24h window is 16
  // events), and "no anomalies" is a correct detector output. Its exact
  // row set (171 rows) is pinned by the sf0.01 oracle instead.
  private val mayBeEmptyAtTinySf = Set("e_anomaly")

  test("every registered query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      // exempted queries are only required to execute without error
      val n = fn(spark, sf).count()
      if (!mayBeEmptyAtTinySf(name)) assert(n > 0, s"$name returned no rows")
    }
  }
  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }
}
