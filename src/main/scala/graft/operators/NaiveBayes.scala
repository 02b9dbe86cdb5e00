package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Multinomial Naive Bayes over the token stream — the classic learned
  * text classifier (language, source, topic) a curation pipeline trains in
  * one pass when the n-gram-marker heuristic ([[TextFunctions.langId]])
  * needs labels it doesn't know. Reference surface: the same corpus
  * analytics family as the logistic quality model
  * ([[QualityModel]]); trained from label columns the data already has.
  *
  * Scale shape (the reason NB fits 100 TB where fancier models don't):
  *  - TRAIN is two explode → hash-aggregate passes (class-token counts,
  *    class priors); model state is vocabulary-sized, never corpus-sized.
  *  - PREDICT broadcasts the model (vocab × classes rows of one decimal
  *    each) and scores each document with a per-doc aggregate — a map-side
  *    join plus one exchange on doc_id, independent of corpus count.
  *
  * Determinism (oracle-replayable like everything registered): every log
  * term is rounded to 9dp and carried as DECIMAL(28,9) — the t_zipf
  * discipline — so per-class scores are exact decimal sums, comparable
  * bit-for-bit on any engine; argmax ties break to the smaller class
  * label. Add-1 (Laplace) smoothing; unseen test tokens score the class's
  * log(1/(tot_c + V)).
  */
object NaiveBayes {

  private def decLog(c: org.apache.spark.sql.Column) =
    round(c, 9).cast("decimal(28,9)")

  /** Train from (id, text, label): returns the model relation
    * (term, label, log_lik) and the class sidecar
    * (label, log_prior, log_unseen).
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
            labelCol: String): (DataFrame, DataFrame) = {
    val tok = docs.select(col(labelCol).as("label"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val ct = tok.groupBy("label", "term").agg(count(lit(1)).as("c"))
    val tot = ct.groupBy("label").agg(sum("c").as("tot"))
    val voc = ct.select("term").distinct().agg(count(lit(1)).as("v"))
    val model = ct.join(broadcast(tot), "label").crossJoin(broadcast(voc))
      .select(col("term"), col("label"),
        decLog(log((col("c") + 1).cast("double") /
          (col("tot") + col("v")).cast("double"))).as("log_lik"))
    val nd = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("ndc"))
    val nda = docs.agg(count(lit(1)).as("ndall"))
    val classes = nd.crossJoin(broadcast(nda))
      .join(broadcast(tot), "label").crossJoin(broadcast(voc))
      .select(col("label"),
        decLog(log(col("ndc").cast("double") / col("ndall").cast("double")))
          .as("log_prior"),
        decLog(log(lit(1.0) / (col("tot") + col("v")).cast("double")))
          .as("log_unseen"))
    (model, classes)
  }

  /** Score and classify: (doc_id, pred, score) — one row per document
    * with at least one token. The model and class sidecar broadcast; the
    * per-(doc, class) score is an exact decimal sum, argmax ties to the
    * smaller label.
    */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, classes: DataFrame): DataFrame = {
    val dt = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tc"))
    val scored = dt.crossJoin(broadcast(classes))
      .join(broadcast(model), Seq("term", "label"), "left")
      .groupBy("doc_id", "label", "log_prior")
      // tc as DECIMAL(9,0): 9+28 digits stays inside both engines'
      // 38-digit product cap (a bare BIGINT factor overflows DuckDB's)
      .agg((col("log_prior") +
        sum(col("tc").cast("decimal(9,0)") *
          coalesce(col("log_lik"), col("log_unseen"))))
        .as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("label").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("label").as("pred"), col("score"))
  }
}
