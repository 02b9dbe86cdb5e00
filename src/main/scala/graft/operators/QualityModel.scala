package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** In-engine quality classifier: full-batch logistic regression over the
  * [[CorpusSignals.qualityGate]] signals — the "distill the hand-written
  * filter rules into a calibrated score" step of a curation pipeline (a
  * fasttext-style linear quality model, trained where the data lives
  * instead of exporting features to a separate trainer).
  *
  * Training is T rounds of exact full-batch gradient descent: each round is
  * ONE distributed aggregate (4 gradient sums + a count, map-side partial)
  * and an O(1) driver update — the same driver-held-state shape as
  * [[Clustering]]'s k-means step. Nothing driver-side scales with the
  * corpus: the model is 4 numbers.
  *
  * Determinism (oracle-replayable): per-doc gradient contributions are
  * rounded to 9dp and summed as DECIMAL(20,9) so the gradient is
  * independent of addition order; weights are re-rounded to 9dp doubles
  * after each update, so every engine walks the identical weight sequence.
  * The only transcendentals (exp) act on bit-identical inputs, and the
  * 9dp/6dp roundings absorb any sub-ulp libm drift.
  */
object QualityModel {

  /** Feature rows: intercept, scaled word count, uniqueness ratio, scaled
    * mean word length, and the gate decision as the training label.
    * 0-token docs carry no signal (NULL features) and are excluded here;
    * [[scored]] re-attaches them with score 0.
    */
  def features(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    CorpusSignals.qualityGate(docs, idCol, textCol)
      .filter(col("n_words") > 0)
      .select(col("doc_id"),
        lit(1.0).as("x0"),
        (col("n_words") / lit(100.0)).as("x1"),
        col("uniq_ratio").as("x2"),
        (col("mean_wl") / lit(10.0)).as("x3"),
        col("kept").cast("double").as("y"))

  private def zOf(w: Seq[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
      lit(w(3)) * col("x3")

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** T rounds of full-batch GD from w = 0. The new weights are computed by
    * Spark expressions (not driver arithmetic) so the rounding semantics
    * are the engine's own `round`, identical to the oracle's.
    */
  def trainLogReg(feats: DataFrame, iters: Int = 5,
                  learnRate: Double = 0.5): Seq[Double] = {
    require(iters > 0, "iters must be positive")
    var w = Seq(0.0, 0.0, 0.0, 0.0)
    val xs = Seq(col("x0"), col("x1"), col("x2"), col("x3"))
    (1 to iters).foreach { _ =>
      val p = sigmoid(zOf(w))
      val grads = xs.zipWithIndex.map { case (x, j) =>
        sum(round((p - col("y")) * x, 9).cast(DecimalType(20, 9))).as(s"g$j")
      }
      val row = feats
        .agg(grads.head, grads.tail :+ count(lit(1)).as("n"): _*)
        .select((0 until 4).map { j =>
          round(lit(w(j)) - lit(learnRate) *
            (col(s"g$j").cast("double") / col("n").cast("double")), 9)
            .as(s"w$j")
        }: _*)
        .head()
      w = (0 until 4).map(row.getDouble)
    }
    w
  }

  /** Train on the corpus, then score every doc: (id, label, lr_score) with
    * lr_score = sigmoid of the learned linear signal, rounded to 6dp.
    * Docs the gate saw as 0-token (no features) come back with label 0 and
    * score 0 so the output covers the whole corpus.
    */
  def scored(docs: DataFrame, idCol: String, textCol: String,
             iters: Int = 5, learnRate: Double = 0.5): DataFrame = {
    val feats = features(docs, idCol, textCol)
    val w = trainLogReg(feats, iters, learnRate)
    val s = feats.select(col("doc_id"),
      col("y").cast("long").as("label"),
      round(sigmoid(zOf(w)), 6).as("lr_score"))
    docs.select(col(idCol).as("doc_id"))
      .join(s, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), lit(0L)).as("label"),
        coalesce(col("lr_score"), lit(0.0)).as("lr_score"))
  }

  /** The learned weights as a 1-row relation (w0..w3) — the trained model
    * itself, checkable against an oracle that replays the same T rounds.
    */
  def weights(docs: DataFrame, idCol: String, textCol: String,
              iters: Int = 5, learnRate: Double = 0.5): DataFrame = {
    val w = trainLogReg(features(docs, idCol, textCol), iters, learnRate)
    docs.sparkSession.range(1).select(
      lit(w(0)).as("w0"), lit(w(1)).as("w1"),
      lit(w(2)).as("w2"), lit(w(3)).as("w3"))
  }
}
