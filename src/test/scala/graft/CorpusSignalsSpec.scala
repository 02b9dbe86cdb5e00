package graft

import org.apache.spark.sql.Row
import graft.operators.{CorpusSignals, Dedup}

class CorpusSignalsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionSignals measures duplicate word and bigram mass") {
    val d = Seq((1L, "a a a b"), (2L, "w x y z"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = CorpusSignals.repetitionSignals(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: 4 words, 2 uniq (0.5), top word 3/4, bigrams [a a, a a, a b]
    // → 2 uniq of 3; doc 3 has no bigrams at all → null fraction.
    assert(got(0) === Row(1L, 4L, 0.5, 0.75, 0.666667))
    assert(got(1) === Row(2L, 4L, 1.0, 0.25, 1.0))
    assert(got(2) === Row(3L, 1L, 1.0, 1.0, null))
  }

  test("qualityGate flags length, repetition, and word-shape violations") {
    val short = "one two three"                          // 3 words → length
    val repetitive = ("spam " * 30).trim                 // uniq 1/30
    val ok = (1 to 30).map(i => f"wrd$i%02d").mkString(" ") // 30 x 5 chars
    val d = Seq((1L, short), (2L, repetitive), (3L, ok)).toDF("doc_id", "text")
    val got = CorpusSignals.qualityGate(d, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "flag_length", "flag_repetitive", "kept").collect()
    assert(got(0) === Row(1L, 1, 0, 0))
    assert(got(1) === Row(2L, 0, 1, 0))
    assert(got(2) === Row(3L, 0, 0, 1))
  }

  test("qualityGate rejects null and token-free docs with NULL signals, not NaN") {
    val d = Seq((1L, Option.empty[String]), (2L, Some("!!! ???")),
      (3L, Some(("ok " * 25).trim)))
      .toDF("doc_id", "text")
    val got = CorpusSignals.qualityGate(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    // null text and punct-only text: 0 words, NULL ratios, rejected.
    for (r <- got.take(2)) {
      assert(r.getInt(1) === 0)
      assert(r.isNullAt(2) && r.isNullAt(3))
      assert(r.getInt(4) === 1)         // flag_length
      assert(r.getInt(7) === 0)         // kept
    }
    assert(got(2).getInt(7) === 0)      // "ok" repeated: uniq_ratio fails
    assert(got(2).getInt(5) === 1)
  }

  test("duplicateSpanStats: cross-doc spans count, same-doc repeats and short docs don't") {
    val a40 = "A" * 40
    val b40 = "B" * 40
    val d = Seq(
      (1L, a40 + a40),          // 80 chars: 3 anchored spans, all "AAAA..." — shared with doc 2
      (2L, a40),                // 1 span, shared with doc 1
      (3L, b40 + b40 + b40),    // same-doc repetition only — NOT duplicated
      (4L, "tiny")              // under spanLen: zero spans, NULL frac
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpanStats(d, "doc_id", "text",
        spanLen = 40, stride = 20)
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 3L), (2L, 1L, 1L), (3L, 5L, 0L), (4L, 0L, 0L)))
    assert(got(3).isNullAt(3), "span-free doc reports NULL dup_frac")
    assert(got(0).getDouble(3) == 1.0)
  }

  test("decontaminate flags n-gram overlap with the eval set, not self-matches") {
    val d = Seq(
      (1L, "the quick brown fox jumps"),   // shares "quick brown fox" with eval
      (2L, "totally different words here"),
      (10L, "quick brown fox trails")      // eval doc itself
    ).toDF("doc_id", "text")
    val eval_ = d.filter($"doc_id" === 10L)
    val got = CorpusSignals.decontaminate(d, eval_, "doc_id", "text", n = 3)
      .collect()
    assert(got.toSeq === Seq(Row(1L, 1L, 10L)))
  }
}

class EntropyFuzzySpec extends SparkSpec {
  import spark.implicits._

  test("unigramEntropy: uniform text maxes out, constant text scores zero") {
    val d = Seq((1L, "a b c d"), (2L, "x x x x"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    val got = CorpusSignals.unigramEntropy(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getDouble(1) === 2.0) // 4 equiprobable tokens
    assert(got(1).getDouble(1) === -0.0 || got(1).getDouble(1) === 0.0)
    assert(got(2).getDouble(1) === 1.0) // two 0.5 outcomes
  }

  test("passageDedup keeps the first occurrence of each passage and rebuilds docs") {
    // window=2: doc1 = [a b][c d], doc2 repeats doc1's first chunk then new,
    // doc3 is chunk-identical to doc1, doc4 empty.
    val d = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "a b c d"),
      (4L, ""))
      .toDF("doc_id", "text")
    val got = CorpusSignals.passageDedup(d, "doc_id", "text", window = 2)
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 2L, 2L, "a b c d"))  // first owner keeps all
    assert(got(1) === Row(2L, 2L, 1L, "x y"))      // shared [a b] removed
    assert(got(2) === Row(3L, 2L, 0L, ""))         // exact clone vanishes
    assert(got(3) === Row(4L, 0L, 0L, ""))         // empty doc still present
  }

  test("passageDedup short tail chunk dedups independently of full chunks") {
    val d = Seq((1L, "p q r"), (2L, "r")).toDF("doc_id", "text")
    // window=2: doc1 = [p q][r], doc2 = [r] — doc2's only chunk equals
    // doc1's tail chunk and must be deduped against it.
    val got = CorpusSignals.passageDedup(d, "doc_id", "text", window = 2)
      .orderBy("doc_id").collect()
    assert(got(0) === Row(1L, 2L, 2L, "p q r"))
    assert(got(1) === Row(2L, 1L, 0L, ""))
  }

  test("fuzzyVerifyPairs reports edit distance only for jaccard candidates") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (1L, base),
      (2L, base.replace("lazy", "hazy")),   // near-dup of 1
      (3L, "completely unrelated text with nothing shared at all here"))
      .toDF("doc_id", "text")
    val got = Dedup.fuzzyVerifyPairs(d, "doc_id", "text", n = 3,
      threshold = 0.3, prefixLen = 60).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1)) === (1L, 2L))
    assert(r.getInt(3) === 1) // lazy → hazy inside the 60-char prefix
  }
}

class PerplexitySpec extends SparkSpec {
  import spark.implicits._

  test("repetitive text is more predictable than varied text") {
    val d = Seq(
      (1L, Seq.fill(15)("the cat sat").mkString(" ")), // one loop, low nll
      (2L, "quick brown foxes jump over seven lazy dogs while rain " +
        "falls on ancient stone bridges near quiet mountain villages"),
      (3L, "single")) // < 2 tokens: no evidence
      .toDF("doc_id", "text")
    val got = graft.operators.CorpusSignals.perplexity(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .toMap
    assert(got(1L)._2 < got(2L)._2,
      s"looped text must score lower nll: $got")
    assert(got(3L)._1 === 0L && got(3L)._2.isNaN)
  }

  test("perplexity is deterministic across partitionings") {
    val base = (1L to 40L).map(i =>
      (i, s"alpha beta gamma delta w$i epsilon zeta"))
    val a = graft.operators.CorpusSignals.perplexity(
      base.toDF("doc_id", "text").repartition(13), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = graft.operators.CorpusSignals.perplexity(
      base.toDF("doc_id", "text").repartition(2), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === b)
  }
}
