package graft

import org.apache.spark.sql.functions._
import graft.core.{Catalog, Positional}

/** CDC between epochs (r14): [[graft.core.CatalogSnapshots.changes]] and
  * its `DESCRIBE CHANGES` SQL form. The laws:
  *  - a recoverable span serves CLASSIFIED changes (insert / delete /
  *    update pre+post images) from bounded position filters over the two
  *    endpoint plans — no content diff, no victim plans;
  *  - in-span churn nets out (insert-then-delete vanishes, edit-then-
  *    delete is a delete, edit-of-an-insert stays an insert);
  *  - coordinate shifts between the endpoints pair each update's images
  *    correctly even when deletes moved the row;
  *  - a structural gesture degrades to the EXCEPT ALL content diff
  *    (updates become delete+insert pairs) — never an error;
  *  - a schema change inside the span fails fast.
  */
class ChangeFeedSpec extends SparkSpec {

  private def openOrders(cat: Catalog, name: String) = {
    cat.open(name, s"$sf/orders.parquet", orderCols = Seq("o_orderkey"))
    cat.get(name).get
  }

  test("a recoverable span serves classified changes with both update images, log-served") {
    val cat = new Catalog(spark)
    val s = openOrders(cat, "cdc1")
    val e0 = s.epoch
    // o_orderkey is dense 0..1499 under the open order: position p holds
    // orderkey p until a shift
    val preStatus = Positional.strip(s.current)
      .filter(col("o_orderkey").isin(2L, 6L))
      .select("o_orderkey", "o_orderstatus").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    assert(s.setCells("o_orderstatus", Seq(2L -> "X", 6L -> "X")))
    val extra = Positional.strip(s.current).filter(col("o_orderkey") < 2)
      .withColumn("o_orderkey", col("o_orderkey") + 100000L)
    val n0 = s.rowCount
    s.appendRows(extra)
    assert(s.deleteRows(Seq(10L, 11L)))

    val ch = cat.changes("cdc1", e0)
    assert(!ch.queryExecution.executedPlan.toString.contains("replicaterows"),
      "a recoverable span must be log-served, not a content diff")
    val byType = ch.collect().groupBy(_.getAs[String]("_change_type"))
    assert(byType("insert").length == 2)
    assert(byType("delete").length == 2)
    assert(byType("update_preimage").length == 2)
    assert(byType("update_postimage").length == 2)
    // post-images carry the edit, pre-images the original value
    assert(byType("update_postimage")
      .forall(_.getAs[String]("o_orderstatus") == "X"))
    byType("update_preimage").foreach { r =>
      assert(r.getAs[String]("o_orderstatus") ==
        preStatus(r.getAs[Long]("o_orderkey")))
    }
    // inserts are the appended rows; deletes the removed orderkeys
    assert(byType("insert").map(_.getAs[Long]("o_orderkey")).toSet ==
      Set(100000L, 100001L))
    assert(byType("delete").map(_.getAs[Long]("o_orderkey")).toSet ==
      Set(10L, 11L))
    assert(s.rowCount == n0) // +2 appended, -2 deleted
  }

  test("in-span churn nets out: insert-then-delete vanishes, edit-then-delete is a delete") {
    val cat = new Catalog(spark)
    val s = openOrders(cat, "cdc2")
    val e0 = s.epoch
    val n0 = s.rowCount
    val extra = Positional.strip(s.current).limit(1)
      .withColumn("o_orderkey", lit(999999L))
    s.appendRows(extra)
    assert(s.setCell(5L, "o_orderstatus", "Z")) // edit …
    assert(s.deleteRows(Seq(5L, n0)))           // … then delete it + the insert

    val ch = cat.changes("cdc2", e0).collect()
    val byType = ch.groupBy(_.getAs[String]("_change_type"))
    assert(!byType.contains("insert"), "insert-then-delete must cancel")
    assert(!byType.contains("update_preimage") &&
      !byType.contains("update_postimage"),
      "edit-then-delete is owned by the delete")
    assert(byType("delete").length == 1)
    // the delete's pre-image is the ORIGINAL row, not the in-span edit
    assert(byType("delete").head.getAs[String]("o_orderstatus") != "Z")
  }

  test("deletes below an edited row still pair the update's images across the shift") {
    val cat = new Catalog(spark)
    val s = openOrders(cat, "cdc3")
    val e0 = s.epoch
    val want = Positional.strip(s.current)
      .filter(col("o_orderkey") === 10L) // position 10 under orderkey order
      .select("o_totalprice").head().getDouble(0)
    assert(s.setCell(10L, "o_orderstatus", "Y"))
    assert(s.deleteRows(Seq(0L, 3L))) // shifts the edited row down to 8
    val ch = cat.changes("cdc3", e0).collect()
    val byType = ch.groupBy(_.getAs[String]("_change_type"))
    assert(byType("delete").map(_.getAs[Long]("o_orderkey")).toSet ==
      Set(0L, 3L))
    val pre = byType("update_preimage").head
    val post = byType("update_postimage").head
    assert(pre.getAs[Long]("o_orderkey") == 10L)
    assert(post.getAs[Long]("o_orderkey") == 10L)
    assert(pre.getAs[String]("o_orderstatus") != "Y")
    assert(post.getAs[String]("o_orderstatus") == "Y")
    assert(pre.getAs[Double]("o_totalprice") == want)
  }

  test("a structural gesture degrades to the EXCEPT ALL content diff") {
    val cat = new Catalog(spark)
    val s = openOrders(cat, "cdc4")
    val e0 = s.epoch
    assert(s.setCell(0L, "o_orderstatus", "Q"))
    s.replace(s.current) // structural: log can't recover the span
    val ch = cat.changes("cdc4", e0)
    assert(ch.queryExecution.executedPlan.toString.contains("replicaterows"),
      "a structural span must fall back to the content diff")
    val byType = ch.collect().groupBy(_.getAs[String]("_change_type"))
    // the update surfaces as a delete+insert pair — no row identity left
    assert(byType("insert").length == 1 &&
      byType("insert").head.getAs[String]("o_orderstatus") == "Q")
    assert(byType("delete").length == 1 &&
      byType("delete").head.getAs[String]("o_orderstatus") != "Q")
  }

  test("DESCRIBE CHANGES serves the feed from SQL; TO VERSION bounds the span") {
    val cat = new Catalog(spark)
    val s = openOrders(cat, "cdc5")
    val e0 = s.epoch
    cat.sql("UPDATE cdc5 SET o_orderstatus = 'A' WHERE o_orderkey = 5")
    val e1 = s.epoch
    cat.sql("UPDATE cdc5 SET o_orderstatus = 'B' WHERE o_orderkey = 9")

    val full = cat.sql(s"DESCRIBE CHANGES cdc5 FROM VERSION $e0").collect()
    assert(full.count(_.getAs[String]("_change_type") ==
      "update_postimage") == 2)
    val bounded = cat
      .sql(s"DESCRIBE CHANGES cdc5 FROM VERSION $e0 TO VERSION $e1")
      .collect()
    val post = bounded.filter(_.getAs[String]("_change_type") ==
      "update_postimage")
    assert(post.length == 1 && post.head.getAs[Long]("o_orderkey") == 5L,
      "TO VERSION must exclude gestures after the bound")
    // an empty span is an empty feed with the contract schema
    val none = cat.sql(s"DESCRIBE CHANGES cdc5 FROM VERSION $e1 TO VERSION $e1")
    assert(none.isEmpty && none.columns.contains("_change_type"))
  }

  test("DESCRIBE CHANGES FROM TIMESTAMP resolves endpoints via the time-travel law") {
    val cat = new Catalog(spark)
    val s = openOrders(cat, "cdc8")
    def micros(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000L
    var now = micros("2027-01-01T00:00:00Z")
    s.epochClock = () => now
    cat.sql("UPDATE cdc8 SET o_orderstatus = 'A' WHERE o_orderkey = 3")
    now = micros("2027-02-01T00:00:00Z")
    cat.sql("UPDATE cdc8 SET o_orderstatus = 'B' WHERE o_orderkey = 8")
    // FROM a mid-January instant → the first update's epoch is the
    // floor, so only the SECOND update is in the span
    val ch = cat.sql(
      "DESCRIBE CHANGES cdc8 FROM TIMESTAMP '2027-01-15 00:00:00+00:00'")
      .collect()
    val post = ch.filter(_.getAs[String]("_change_type") ==
      "update_postimage")
    assert(post.length == 1 && post.head.getAs[Long]("o_orderkey") == 8L,
      s"a timestamp endpoint must resolve like TIMESTAMP AS OF; got " +
        s"${ch.map(_.toSeq).mkString(", ")}")
    // TO a mid-January instant → empty span (both endpoints resolve to
    // the first update's epoch)
    assert(cat.sql(
      """DESCRIBE CHANGES cdc8
        |FROM TIMESTAMP '2027-01-10 00:00:00+00:00'
        |TO TIMESTAMP '2027-01-20 00:00:00+00:00'""".stripMargin).isEmpty)
    // an instant before any retained epoch fails fast, same contract as
    // TIMESTAMP AS OF
    intercept[NoSuchElementException] {
      cat.sql(
        "DESCRIBE CHANGES cdc8 FROM TIMESTAMP '1990-01-01 00:00:00+00:00'")
    }
  }

  test("a schema change inside the span fails fast; a reversed span is rejected") {
    val cat = new Catalog(spark)
    val s = openOrders(cat, "cdc6")
    val e0 = s.epoch
    cat.sql("ALTER TABLE cdc6 ADD COLUMN note STRING DEFAULT ''")
    val err = intercept[IllegalStateException](cat.changes("cdc6", e0))
    assert(err.getMessage.contains("schema change"))
    intercept[IllegalArgumentException](cat.changes("cdc6", s.epoch, e0))
  }
}
