package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Sharding

/** Invariants of the two sequence-packing operators that the row-level
  * oracle can't state directly: budget respect, bin contiguity, and
  * partitioning-invariance (the packing must be a pure function of the
  * data, not of the cluster layout that computed it).
  */
class PackingSpec extends SparkSpec {

  private val budget = 512L

  private def docs = Tables.load(spark, sf, "documents")

  test("packGreedy: no bin exceeds the budget except single oversize docs") {
    val packed = Sharding.packGreedy(docs, "doc_id", "lang",
      TextFunctions.tokenCount(col("text")), budget)
    val bins = packed.groupBy("lang", "bin")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n_docs"))
      .collect()
    assert(bins.nonEmpty)
    bins.foreach { r =>
      val (t, n) = (r.getLong(2), r.getLong(3))
      assert(t <= budget || n == 1,
        s"bin ${r.get(0)}/${r.get(1)} holds $t tokens across $n docs")
    }
  }

  test("packGreedy: bins are contiguous and non-decreasing in doc order") {
    val packed = Sharding.packGreedy(docs, "doc_id", "lang",
      TextFunctions.tokenCount(col("text")), budget)
      .orderBy("lang", "doc_id").collect()
    packed.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      val bins = rows.map(_.getLong(3)).toSeq
      assert(bins.head == 0L, s"$lang must start at bin 0")
      bins.sliding(2).foreach { case Seq(a, b) =>
        assert(b == a || b == a + 1, s"$lang bins jump: $a -> $b")
      case _ => ()
      }
    }
  }

  test("packGreedy is partitioning-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sharding.packGreedy(df, "doc_id", "lang",
        TextFunctions.tokenCount(col("text")), budget)
        .orderBy("doc_id").collect().map(r =>
          (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("packContextWindows: offsets stay under budget and chunks advance consistently") {
    val packed = Sharding.packContextWindows(docs, "doc_id", "lang",
      TextFunctions.tokenCount(col("text")), budget)
      .orderBy("lang", "doc_id").collect()
    packed.groupBy(_.getString(1)).foreach { case (lang, rows) =>
      var prior = 0L
      rows.foreach { r =>
        val (n, start, end, off) =
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(off == prior % budget, s"$lang: offset drifted")
        assert(start == prior / budget, s"$lang: start_chunk drifted")
        if (n > 0) assert(end == (prior + n - 1) / budget)
        else assert(end == start)
        assert(off < budget)
        prior += n
      }
    }
  }
}
