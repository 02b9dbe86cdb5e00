package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModel

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  // a corpus the gate can separate: clean 30-word docs vs a 3-word doc,
  // a repetitive doc, and an empty doc
  private def corpus = {
    // words of length 4-5 keep mean_wl inside the gate's [3.8, 5.2] band
    val clean = (1L to 6L).map(i =>
      (i, (1 to 30).map(j => s"wo${(i * 31 + j) % 97}x").mkString(" ")))
    val junk = Seq(
      (7L, "tiny doc here"),
      (8L, Seq.fill(40)("spam").mkString(" ")),
      (9L, ""))
    (clean ++ junk).toDF("doc_id", "text")
  }

  test("training separates gate-kept docs from rejected ones") {
    val out = QualityModel.scored(corpus, "doc_id", "text").cache()
    assert(out.count() === 9)
    val byLabel = out.groupBy("label").agg(avg("lr_score").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byLabel.keySet === Set(0L, 1L))
    assert(byLabel(1L) > byLabel(0L),
      s"kept docs should score higher: $byLabel")
    out.unpersist()
  }

  test("gradient descent moves the weights and is deterministic") {
    val w1 = QualityModel.weights(corpus, "doc_id", "text").collect().head
    val w2 = QualityModel.weights(corpus, "doc_id", "text").collect().head
    assert(w1 === w2)
    assert((0 until 4).exists(j => math.abs(w1.getDouble(j)) > 1e-6),
      "5 GD rounds from w=0 must move at least one weight")
  }

  test("tokenless docs come back with label 0 and score 0") {
    val r = QualityModel.scored(corpus, "doc_id", "text")
      .filter(col("doc_id") === 9L).collect().head
    assert(r.getLong(1) === 0L && r.getDouble(2) === 0.0)
  }
}
