package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{Catalog, EditorSession}

/** SURVEY §5.4 scenario replays: the reference's three lifecycles (§3)
  * executed end-to-end through the public session surface.
  */
class LifecycleSpec extends SparkSpec {

  test("E1/E2: load → page → edit → save → reload round-trip") {
    val sess = EditorSession.open(spark, s"$sf/nation.parquet",
      orderCols = Seq("n_nationkey"))
    // first page served like the UI would
    val page = sess.page(0, 10).collect()
    assert(page.length == 10 && page.head.getAs[Long]("__pos") == 0L)
    // edit a cell, reject a bad one
    assert(sess.setCell(3L, "n_name", "GRAFTLAND"))
    assert(!sess.setCell(3L, "n_regionkey", "not-an-int"))
    // save single-file parquet (reference S5 semantics), reload, check
    val out = Files.createTempDirectory("lifecycle_").toString + "/nation_out.parquet"
    sess.save(out)
    val back = spark.read.parquet(out)
    assert(back.count() == 25)
    assert(!back.columns.contains("__pos"))
    assert(back.filter(col("n_name") === "GRAFTLAND").count() == 1)
  }

  test("E3: load → pivot → save replaces the table like the reference") {
    val sess = EditorSession.open(spark, s"$sf/lineitem.parquet",
      orderCols = Seq("l_orderkey", "l_linenumber"))
    val before = sess.rowCount
    sess.pivot("l_returnflag", "l_linestatus", "l_extendedprice", "mean")
    assert(sess.rowCount == 3 && before > 3)
    val out = Files.createTempDirectory("lifecycle_").toString + "/pivot.parquet"
    sess.save(out)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("v1 MDI parity: independent named sessions in a catalog") {
    val cat = new Catalog(spark)
    cat.open("a", s"$sf/region.parquet", Seq("r_regionkey"))
    cat.open("b", s"$sf/nation.parquet", Seq("n_nationkey"))
    assert(cat.names == Seq("a", "b"))
    cat.get("a").get.deleteRow(0L)
    assert(cat.get("a").get.rowCount == 4)
    assert(cat.get("b").get.rowCount == 25) // untouched
    cat.close("a")
    assert(cat.names == Seq("b"))
  }

  test("empty session supports schema build-up then rows paging") {
    val sess = EditorSession.empty(spark)
    assert(sess.rowCount == 0)
    sess.insertColumnAt(0, "name string")
    sess.insertColumnAt(1, "score double")
    assert(sess.current.schema.fieldNames.toSeq.take(2) == Seq("name", "score"))
  }
}
