package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.io.{Formats, PandasJson}

class PandasJsonSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_pjson_").toString + "/" + name

  test("columns-orient round-trip preserves values, types, and nulls") {
    val df = Seq(
      (1L, Some("alpha"), Some(1.5), Some(true)),
      (2L, None, Some(-0.25), Some(false)),
      (3L, Some("gamma"), None, None)
    ).toDF("id", "name", "score", "flag")
    val path = tmp("t.json")
    PandasJson.write(df, path)

    // the written file is the pandas shape: one object, column -> {row -> v}
    val raw = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    assert(raw.startsWith("{\"id\":{\"0\":1"), raw.take(40))

    val back = Formats.read(spark, path) // sniffed as columnar
    assert(back.columns.toSeq == Seq("id", "name", "score", "flag"))
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(1).isNullAt(1) && rows(2).isNullAt(2) && rows(2).isNullAt(3))
    assert(rows(0).getString(1) == "alpha" && rows(0).getDouble(2) == 1.5
      && rows(0).getBoolean(3))
  }

  test("row keys order numerically, not lexicographically") {
    // 12 rows: lexicographic key order would put "10","11" before "2"
    val df = (0 until 12).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val path = tmp("order.json")
    PandasJson.write(df.orderBy("id"), path)
    val back = PandasJson.read(spark, path)
    assert(back.select("id").as[Long].collect().toSeq == (0L until 12L))
  }

  test("sniff routes JSON-lines to the native reader, not the shim") {
    val path = tmp("lines.json")
    Files.write(Paths.get(path),
      "{\"a\":1,\"b\":\"x\"}\n{\"a\":2,\"b\":\"y\"}\n".getBytes(StandardCharsets.UTF_8))
    assert(!PandasJson.looksColumnar(path))
    assert(Formats.read(spark, path).count() == 2)
  }

  test("sniff rejects records whose struct fields have non-integer keys") {
    val path = tmp("nested.json")
    Files.write(Paths.get(path),
      "{\"a\":{\"x\":1},\"b\":{\"x\":2}}".getBytes(StandardCharsets.UTF_8))
    assert(!PandasJson.looksColumnar(path)) // keys not all digits
  }

  test("empty frame round-trips as pandas' bare object") {
    val path = tmp("empty.json")
    PandasJson.write(spark.emptyDataFrame, path)
    assert(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8) == "{}")
    assert(PandasJson.looksColumnar(path))
    assert(Formats.read(spark, path).count() == 0)
  }

  test("write refuses above the row cap with a typed, actionable error") {
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      PandasJson.write(df, tmp("over.json"), maxRows = 99)
    }
    assert(e.getMessage.contains("capped at 99 rows"))
    assert(e.getMessage.contains("records-orient"), e.getMessage)
    // at the bound it writes fine
    PandasJson.write(df, tmp("at.json"), maxRows = 100)
    // default cap mirrors the xlsx sheet limit
    assert(PandasJson.MaxRows == graft.io.ExcelIO.MaxRows)
  }

  test("testdata table survives the interchange loop losslessly") {
    val supplier = spark.read.parquet(s"$sf/supplier.parquet").orderBy("s_suppkey")
    val path = tmp("supplier.json")
    PandasJson.write(supplier, path)
    val back = Formats.read(spark, path)
      .select("s_suppkey", "s_name", "s_acctbal").orderBy("s_suppkey")
    val exp = supplier.select("s_suppkey", "s_name", "s_acctbal").collect()
    val got = back.collect()
    assert(got.length == exp.length)
    exp.zip(got).foreach { case (e, g) =>
      assert(e.getLong(0) == g.getLong(0))
      assert(e.getString(1) == g.getString(1))
      assert(e.getDouble(2) == g.getDouble(2), s"acctbal drifted at ${e.getLong(0)}")
    }
  }
}
