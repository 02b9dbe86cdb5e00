package graft

import org.apache.spark.sql.functions._
import graft.operators.NaiveBayes

/** Closed-form pins for the multinomial NB classifier: hand-computed
  * posteriors on a two-class toy corpus, plus the holdout invariants of
  * the registered queries.
  */
class NaiveBayesSpec extends SparkSpec {

  private lazy val toy = spark.createDataFrame(Seq(
    (0L, "a a b", "A"),
    (1L, "b b", "B"))).toDF("doc_id", "text", "lang")

  test("train: add-1 likelihoods and priors match the hand computation") {
    val (model, classes) = NaiveBayes.train(toy, "doc_id", "text", "lang")
    val m = model.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getDecimal(2).doubleValue()).toMap
    // V = 2; class A: a:2 b:1 tot 3; class B: b:2 tot 2. The model holds
    // OBSERVED (term, class) pairs only — (a, B) never occurs and routes
    // through the class's log_unseen instead.
    assert(m.keySet == Set(("a", "A"), ("b", "A"), ("b", "B")))
    assert(math.abs(m(("a", "A")) - math.log(3.0 / 5)) < 1e-8)
    assert(math.abs(m(("b", "A")) - math.log(2.0 / 5)) < 1e-8)
    assert(math.abs(m(("b", "B")) - math.log(3.0 / 4)) < 1e-8)
    val c = classes.collect()
      .map(r => r.getString(0) ->
        (r.getDecimal(1).doubleValue(), r.getDecimal(2).doubleValue())).toMap
    assert(math.abs(c("A")._1 - math.log(0.5)) < 1e-8)
    assert(math.abs(c("B")._2 - math.log(1.0 / 4)) < 1e-8)
  }

  test("predict: argmax posteriors match the hand computation, unseen tokens smoothed") {
    val (model, classes) = NaiveBayes.train(toy, "doc_id", "text", "lang")
    val test = spark.createDataFrame(Seq(
      (10L, "a"),          // P(A)*3/5 = .3  > P(B)*1/4 = .125  -> A
      (11L, "b b b"),      // .5*(2/5)^3 = .032 < .5*(3/4)^3 = .211 -> B
      (12L, "zzz a")       // unseen token hits both log_unseens; 'a' decides -> A
    )).toDF("doc_id", "text")
    val got = NaiveBayes.predict(test, "doc_id", "text", model, classes)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "A", 11L -> "B", 12L -> "A"), got.toString)
  }

  test("registered NB holdout: disjoint halves, predictions from training labels, chance-beating accuracy") {
    val pred = SparkEntry.queries("t_nb_predict")(spark, sf).collect()
    assert(pred.nonEmpty)
    // every scored doc is from the odd (held-out) half
    assert(pred.forall(_.getLong(0) % 2 == 1))
    // predicted classes come from the training label set
    val langs = graft.core.Tables.load(spark, sf, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(pred.map(_.getString(1)).toSet.subsetOf(langs))
    val eval = SparkEntry.queries("t_nb_eval")(spark, sf).head()
    val acc = eval.getAs[Double]("accuracy")
    // the synthetic corpus's lang label is (by construction) barely
    // text-correlated — all langs share one 31-token vocabulary at nearly
    // identical rates — so chance (1/5) is the honest floor here; the
    // closed-form toy tests above pin correctness
    assert(acc > 0.2, s"NB accuracy $acc at or below 5-class chance")
    assert(eval.getAs[Long]("n_test") == pred.length)
  }
}
