package graft

import org.apache.spark.sql.functions._
import graft.operators.ImportanceWeights

class ImportanceWeightsSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: target docs speak "alpha beta gamma",
  // raw-only docs speak "delta epsilon zeta"
  private def corpus = Seq(
    (1L, "en", "alpha beta gamma alpha beta"),
    (2L, "en", "beta gamma alpha gamma"),
    (3L, "de", "delta epsilon zeta delta"),
    (4L, "de", "epsilon zeta delta zeta epsilon"),
    (5L, "de", "alpha beta gamma beta"), // raw doc in target vocabulary
    (6L, "de", "")).toDF("doc_id", "lang", "text")

  test("target-vocabulary docs outscore raw-vocabulary docs") {
    val scores = ImportanceWeights.score(corpus, "doc_id", "text",
        targetPred = col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every target-vocab doc (1, 2, and raw doc 5 that looks target-like)
    // must outscore every pure raw-vocab doc (3, 4)
    Seq(1L, 2L, 5L).foreach { t =>
      Seq(3L, 4L).foreach { r =>
        assert(scores(t) > scores(r), s"doc $t should outscore doc $r")
      }
    }
    // the whole point of DSIR: doc 5 ranks on CONTENT, not label — it
    // scores with the target-vocab docs, far above the raw-vocab ones.
    // (Absolute sign is smoothing-dependent at toy corpus size: alpha*B
    // dwarfs the token counts, so only orderings are meaningful here.)
    assert(scores(5L) - scores(3L) > 1.0)
    assert(scores(3L) < 0.0) // unseen-in-target vocabulary is penalized
  }

  test("tokenless docs score 0 and still appear in the output") {
    val out = ImportanceWeights.score(corpus, "doc_id", "text",
      targetPred = col("lang") === "en")
    assert(out.count() === 6)
    val row6 = out.filter(col("doc_id") === 6L).collect().head
    assert(row6.getLong(1) === 0L && row6.getDouble(2) === 0.0)
  }

  test("resample returns exactly k distinct input ids, deterministically") {
    val a = ImportanceWeights.resample(corpus, "doc_id", "text",
      targetPred = col("lang") === "en", k = 3).collect()
    val b = ImportanceWeights.resample(corpus, "doc_id", "text",
      targetPred = col("lang") === "en", k = 3).collect()
    assert(a.length === 3 && a.map(_.getLong(0)).distinct.length === 3)
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    assert(a.map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L, 3L, 4L, 5L, 6L)))
  }
}
